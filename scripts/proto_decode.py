"""Prototype: Matryoshka decode+MSE variants, fwd+bwd at the bench shape.

The r1 ablation showed 10-prefix Matryoshka adds ~45 ms/step over a single
full decode — dominated by (B, G, D)/(B, J, D) HBM traffic and batched-matmul
relayouts, not FLOPs. Candidates:

V0 current: grouped partial einsum -> mask-einsum base -> 10 remainder
   matmuls -> stack x_hats (B, J, D) -> scale-stabilized MSE.
V1 gram: expand sum_j ||xhat_j - x||^2 in the per-group partials:
   S = A A^T over d (B, G, G), T = A c^T (B, G, J), plus ||c_j||^2, where
   c_j = rem_j + b_dec - x. Never materializes x_hats or base.
V2 cumsum: running sum over groups, gather boundaries.

Run on the real chip: python scripts/proto_decode.py
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from saev_tpu.nn import modeling, objectives

B, D, S, J, G = 16384, 1024, 16384, 10, 16
g = S // G
PREC = jax.lax.Precision.DEFAULT


def timeit(fn, w_dec, *args, n=10, warmup=3):
    """Chain iterations through w_dec so the axon tunnel can't dedup identical
    in-flight dispatches (NOTES.md measurement gotcha)."""
    val = fn(w_dec, *args)
    scalar = val if getattr(val, "ndim", 1) == 0 else jax.tree.leaves(val)[0].ravel()[0]
    for _ in range(warmup):
        w_dec = w_dec + 0e-30 * scalar
        val = fn(w_dec, *args)
        scalar = val if getattr(val, "ndim", 1) == 0 else jax.tree.leaves(val)[0].ravel()[0]
    float(jnp.sum(scalar))  # host readback: the only true sync on the tunnel
    t0 = time.perf_counter()
    for _ in range(n):
        w_dec = w_dec + 1e-30 * scalar
        val = fn(w_dec, *args)
        scalar = val if getattr(val, "ndim", 1) == 0 else jax.tree.leaves(val)[0].ravel()[0]
    float(jnp.sum(scalar))
    return (time.perf_counter() - t0) / n * 1000


def mse_v0(w_dec, b_dec, f_x, x, prefixes):
    cfg = modeling.SparseAutoencoderConfig(d_model=D, d_sae=S, activation=modeling.TopK(top_k=32))
    params = {"W_dec": w_dec, "b_dec": b_dec, "W_enc": w_dec.T, "b_enc": b_dec[:1]}
    x_hats = modeling.decode(cfg, params, f_x, prefixes, precision=PREC)
    return objectives.scale_stabilized_mse(
        x_hats, jnp.broadcast_to(x[:, None, :], (B, J, D))
    ).mean()


def mse_v1(w_dec, b_dec, f_x, x, prefixes):
    """Gram-expansion: no (B, J, D) materialization."""
    p32 = prefixes.astype(jnp.int32)
    m = p32 // g
    r = p32 - m * g
    mask = (jnp.arange(G, dtype=jnp.int32)[None, :] < m[:, None]).astype(jnp.float32)  # (J, G)

    A = jnp.einsum(
        "bGg,Ggd->bGd",
        f_x.reshape(B, G, g),
        w_dec.reshape(G, g, D),
        preferred_element_type=jnp.float32,
        precision=PREC,
    )
    lane = jnp.arange(g, dtype=jnp.int32)
    cs = []
    for j in range(J):
        f_m = jax.lax.dynamic_slice(f_x, (0, m[j] * g), (B, g))
        w_m = jax.lax.dynamic_slice(w_dec, (m[j] * g, 0), (g, D))
        rem = jnp.dot(
            jnp.where(lane < r[j], f_m, jnp.zeros((), f_m.dtype)), w_m,
            preferred_element_type=jnp.float32, precision=PREC,
        )
        cs.append(rem + b_dec - x)
    c = jnp.stack(cs, axis=1)  # (B, J, D)

    upper = jnp.maximum(jnp.max(jnp.abs(x)), 1e-12)
    # sum_j ||A^T mask_j + c_j||^2 = sum_GH (sum_j M_jG M_jH) S_GH + 2 sum_Gj M_jG T_bGj + sum_j ||c_j||^2
    Sgram = jnp.einsum("bGd,bHd->bGH", A, A, preferred_element_type=jnp.float32, precision=PREC)
    MM = mask.T @ mask  # (G, G)
    term1 = jnp.einsum("bGH,GH->", Sgram, MM, precision=jax.lax.Precision.HIGHEST)
    T = jnp.einsum("bGd,bjd->bGj", A, c, preferred_element_type=jnp.float32, precision=PREC)
    term2 = 2.0 * jnp.einsum("bGj,jG->", T, mask, precision=jax.lax.Precision.HIGHEST)
    term3 = jnp.sum(c * c)
    total = term1 + term2 + term3
    return total / (B * J * D) / (upper * upper) * (upper * upper)


def mse_v2(w_dec, b_dec, f_x, x, prefixes):
    """Cumsum over groups then boundary gather."""
    p32 = prefixes.astype(jnp.int32)
    m = p32 // g
    r = p32 - m * g
    A = jnp.einsum(
        "bGg,Ggd->bGd", f_x.reshape(B, G, g), w_dec.reshape(G, g, D),
        preferred_element_type=jnp.float32, precision=PREC,
    )
    csum = jnp.concatenate([jnp.zeros((B, 1, D), A.dtype), jnp.cumsum(A, axis=1)], axis=1)
    base = csum[:, m, :]  # (B, J, D)
    lane = jnp.arange(g, dtype=jnp.int32)
    outs = []
    for j in range(J):
        f_m = jax.lax.dynamic_slice(f_x, (0, m[j] * g), (B, g))
        w_m = jax.lax.dynamic_slice(w_dec, (m[j] * g, 0), (g, D))
        rem = jnp.dot(
            jnp.where(lane < r[j], f_m, 0.0), w_m,
            preferred_element_type=jnp.float32, precision=PREC,
        )
        outs.append(base[:, j, :] + rem + b_dec)
    x_hats = jnp.stack(outs, axis=1)
    return objectives.scale_stabilized_mse(
        x_hats, jnp.broadcast_to(x[:, None, :], (B, J, D))
    ).mean()


def main():
    rng = np.random.default_rng(0)
    w_dec = jnp.asarray(rng.normal(size=(S, D)).astype(np.float32) / 32)
    b_dec = jnp.asarray(rng.normal(size=(D,)).astype(np.float32) * 0.01)
    x = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    h = rng.normal(size=(B, S)).astype(np.float32)
    thresh = np.partition(h, -32, axis=1)[:, -32][:, None]
    f_x = jnp.asarray(np.where(h >= thresh, h, 0.0))
    prefixes = jnp.asarray(objectives.sample_prefixes(S, J, rng=rng))

    fns = {"v0_current": mse_v0, "v1_gram": mse_v1, "v2_cumsum": mse_v2}
    vals = {}
    for name, fn in fns.items():
        fwd = jax.jit(fn)
        grad = jax.jit(jax.value_and_grad(fn, argnums=(0, 1, 2)))
        t_f = timeit(fwd, w_dec, b_dec, f_x, x, prefixes)
        v, gr = grad(w_dec, b_dec, f_x, x, prefixes)
        t_g = timeit(lambda *a: grad(*a)[1][0], w_dec, b_dec, f_x, x, prefixes)
        t_g = max(t_g, t_f)
        vals[name] = (float(v), jax.tree.map(lambda t: np.asarray(t), gr))
        print(f"{name:12s} fwd {t_f:6.1f} ms   fwd+bwd {t_g:6.1f} ms   loss={float(v):.6f}")

    ref_v, ref_g = vals["v0_current"]
    for name, (v, gr) in vals.items():
        if name == "v0_current":
            continue
        dv = abs(v - ref_v) / abs(ref_v)
        dg = max(
            float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-30))
            for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(ref_g))
        )
        print(f"{name:12s} rel dloss={dv:.2e}  max rel dgrad={dg:.2e}")


if __name__ == "__main__":
    main()
