"""A/B the Matryoshka kernels' GROUP-BLOCK size (the W tile's d_sae extent).

The kernel group size is a pure blocking parameter: base_j is the exact
prefix product for ANY g (the lane-masked remainder pass handles cuts
anywhere inside a block), so g is free to diverge from the objective's
semantic group_size. Larger g = fewer grid steps (amortizes per-step
bookkeeping + snapshot predication) at the cost of bigger VMEM windows.
Round 3 measured g=2048 slower, but that predates the deferred snapshot
DMA (2dda07d) and the error-fused forward — re-measure with the profiler
(wall clocks on the dev tunnel lie; NOTES.md "Microbench traps").

Usage: python scripts/proto_groupblock.py [n_iters]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np

from kprof import device_profile, total_device_ms


def main():
    from saev_tpu.ops import pallas_matryoshka as pk

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    B, S, D, J = 16384, 16384, 1024, 10
    rng = np.random.default_rng(0)
    f = rng.normal(size=(B, S)).astype(np.float32)
    f[f < 1.5] = 0.0
    f = jnp.asarray(f, jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(S, D)).astype(np.float32) * 0.02, jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    b_dec = jnp.asarray(rng.normal(size=(D,)).astype(np.float32) * 0.01)
    inv_upper = jnp.float32(0.2)
    e = jnp.asarray(rng.normal(size=(J, B, D)).astype(np.float32), jnp.bfloat16)
    scale = jnp.float32(0.37)
    prefixes = np.sort(rng.choice(np.arange(1, S), size=J, replace=False))

    for g in (1024, 2048, 4096):
        m = jnp.asarray(prefixes // g, jnp.int32)
        r = jnp.asarray(prefixes - (prefixes // g) * g, jnp.int32)
        da = jnp.asarray(
            rng.normal(size=(B, S // g, D)).astype(np.float32), jnp.bfloat16
        )

        for name, fn, args in (
            ("err", pk.grouped_prefix_err, (f, w, x, b_dec, inv_upper, m, r)),
            ("dgrad", pk.grouped_matmul_dgrad, (w, e, m, r, scale)),
            ("wgrad", pk.grouped_matmul_wgrad, (f, da, e, m, r, scale)),
        ):

            @jax.jit
            def step(c, *a, _fn=fn, _g=g):
                a = (a[0] * (1 + jnp.asarray(1e-12 * c, a[0].dtype)),) + a[1:]
                out = _fn(*a, group_size=_g)
                first = jax.tree.leaves(out)[0]
                return first.reshape(-1)[0].astype(jnp.float32)

            try:
                rows = device_profile(step, args, n=n)
            except Exception as exc:
                print(f"{name:6s} g={g:5d}: FAIL {str(exc)[:110]}")
                continue
            ms = total_device_ms(
                rows, lambda nm: "custom" in nm or "fusion" in nm or "pallas" in nm
            )
            top = max(rows, key=lambda rr: rr[1])
            print(f"{name:6s} g={g:5d}: {ms:7.3f} ms  (top op {top[1]:.3f} {top[0][:40]})")


if __name__ == "__main__":
    main()
