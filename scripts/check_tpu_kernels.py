"""On-TPU Pallas-kernel vs XLA-fallback numeric parity check.

The pytest suite runs on CPU, where every `_use_pallas()` gate is False — the
Pallas kernels themselves are never executed by the hermetic tests. This script
closes that hole: on the live TPU it runs every Pallas kernel (k-th-value
bisection, mask-aware AuxK threshold, fused Matryoshka prefix-MSE forward +
custom-VJP backward, including under the vmapped sweep axis) against the XLA
fallback path and asserts numeric agreement:

- k-th-value kernels: bit-identical to lax.top_k (f32, exact selection).
- fused prefix-MSE: bf16-matmul-noise tolerance vs the f32 XLA custom-VJP path
  (the kernels consume bf16 operands by design; docs/performance.md).

`bench.py` runs this before timing and embeds the verdict in the bench JSON, so
a wrong-on-TPU-only kernel regression can no longer ship with a green CPU suite
and a plausible-looking headline number (round-2 VERDICT weak #2).

Exit code 0 and a JSON line on success; nonzero with the failing check named
otherwise. Usage: python scripts/check_tpu_kernels.py [--quick]
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def _rel_err(a, b) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    denom = max(float(np.linalg.norm(b)), 1e-30)
    return float(np.linalg.norm(a - b) / denom)


def run_checks(quick: bool = False) -> dict:
    import jax
    import jax.numpy as jnp

    from saev_tpu.ops import matryoshka, topk
    from saev_tpu.nn import objectives

    if jax.default_backend() != "tpu":
        return {"ok": False, "error": f"not a TPU backend: {jax.default_backend()}"}

    checks: dict[str, dict] = {}
    rng = np.random.default_rng(0)

    # --- k-th value: Pallas bitwise bisection vs lax.top_k (bit-identical) ---
    shapes = [(512, 2048, 32), (1000, 4096, 7)]  # odd row count exercises padding
    if not quick:
        shapes.append((16384, 16384, 32))
    for b, s, k in shapes:
        # Post-ReLU-like data with heavy ties at zero (the hard case).
        h = np.maximum(rng.normal(size=(b, s)), 0).astype(np.float32)
        h[:, : s // 3] = 0.0
        hj = jnp.asarray(h)
        got = np.asarray(jax.jit(lambda a: topk.exact_kth_value(a, k))(hj))
        want = np.asarray(jax.lax.top_k(hj, k)[0][:, -1:])
        checks[f"kth_value_{b}x{s}_k{k}"] = {
            "max_abs_err": float(np.max(np.abs(got - want))),
            "tol": 0.0,
            "ok": bool(np.array_equal(got, want)),
        }

    # --- masked k-th (AuxK dead-latent threshold) ---
    # Two regimes: alive-count > k (FINITE thresholds — the real AuxK case
    # once many latents die) and alive-count < k (the -inf keep-all branch).
    b, s, k = 512, 4096, 512
    h = rng.normal(size=(b, s)).astype(np.float32)
    for name, alive_frac in (("finite", 0.5), ("allkept", 0.03)):
        mask = rng.random(s) < alive_frac
        mask[:7] = True  # never fully empty
        hj, mj = jnp.asarray(h), jnp.asarray(mask)
        got = np.asarray(
            jax.jit(lambda a, m: topk.exact_kth_value_masked(a, m, k))(hj, mj)
        )
        masked = np.where(mask[None, :], h, -np.inf).astype(np.float32)
        want = np.asarray(jax.lax.top_k(jnp.asarray(masked), k)[0][:, -1:])
        if name == "finite":
            assert np.isfinite(want).all(), "finite regime must have >k alive"
        with np.errstate(invalid="ignore"):
            finite_err = np.max(
                np.abs(np.where(np.isfinite(want), got - want, 0.0))
            )
        checks[f"kth_value_masked_{name}"] = {
            "max_abs_err": float(finite_err),
            "tol": 0.0,
            "ok": bool(np.array_equal(got, want)),
        }

    # --- fused TopK-stats kernel (the production TopK train path) vs XLA ---
    # One Pallas pass emits kth + bf16 f + live + L0/L1; the train loop's
    # dead-latent routing reads live/L0, so silent corruption here ships wrong
    # training, not just wrong speed. FORCE_LAX carves out the true XLA
    # reference (plain _topk_stats_xla's kth would itself dispatch to Pallas).
    stats_shapes = [(512, 2048, 32), (992, 4096, 7)]  # non-tile-multiple rows
    if not quick:
        stats_shapes.append((16384, 16384, 32))
    for b, s, k in stats_shapes:
        h = rng.normal(size=(b, s)).astype(np.float32)
        h[:, : s // 4] = 0.0  # heavy ties at zero (the hard case)
        hj = jnp.asarray(h)
        c1 = jnp.asarray(rng.normal(size=(b, s)).astype(np.float32))
        c2 = jnp.asarray(rng.normal(size=(b, 1)).astype(np.float32))

        def stats_loss(a, c1_, c2_, k=k):
            out = topk.topk_stats(a, k)
            # Touch both differentiable outputs so the custom VJP runs whole.
            return (
                jnp.sum(out.f.astype(jnp.float32) * c1_) + jnp.sum(out.l1 * c2_),
                out,
            )

        dh_p, out_p = jax.jit(jax.grad(stats_loss, has_aux=True))(hj, c1, c2)
        orig_lax = topk.FORCE_LAX
        try:
            topk.FORCE_LAX = True
            dh_x, out_x = jax.jit(jax.grad(stats_loss, has_aux=True))(hj, c1, c2)
        finally:
            topk.FORCE_LAX = orig_lax
        l1_err = _rel_err(out_p.l1, out_x.l1)  # f32 reduction-order noise only
        checks[f"topk_stats_{b}x{s}_k{k}"] = {
            "l1_rel_err": l1_err,
            "tol": 1e-6,
            "ok": bool(
                np.array_equal(np.asarray(out_p.kth), np.asarray(out_x.kth))
                and np.array_equal(np.asarray(out_p.f), np.asarray(out_x.f))
                and np.array_equal(np.asarray(out_p.live), np.asarray(out_x.live))
                and np.array_equal(np.asarray(out_p.l0), np.asarray(out_x.l0))
                and np.array_equal(np.asarray(dh_p), np.asarray(dh_x))
                and l1_err < 1e-6
            ),
        }

    # --- fused Matryoshka prefix-MSE: Pallas vs XLA custom-VJP path ---
    def prefix_case(b, d_model, d_sae, name, f_dtype=np.float32):
        f = np.maximum(rng.normal(size=(b, d_sae)), 0).astype(np.float32)
        f *= rng.random((b, d_sae)) < 0.01  # realistic sparsity
        x = rng.normal(size=(b, d_model)).astype(np.float32)
        w = rng.normal(size=(d_sae, d_model)).astype(np.float32) / np.sqrt(d_model)
        bd = rng.normal(size=(d_model,)).astype(np.float32) * 0.01
        prefixes = jnp.asarray(
            objectives.sample_prefixes(d_sae, 10, rng=np.random.default_rng(1))
        )
        # Big operands passed as arguments, not closures: jit closures ship
        # their captures inside the compile request on the dev tunnel (NOTES.md).
        # f_dtype=bfloat16 exercises the bf16-latent path the TopK stats
        # kernel feeds in the train step (dgrad then emits df in bf16).
        args = (
            jnp.asarray(w), jnp.asarray(bd),
            jnp.asarray(f).astype(f_dtype), jnp.asarray(x),
        )

        def loss_fn(w_, bd_, f_, x_):
            loss, _ = matryoshka.prefix_mse(w_, bd_, f_, x_, prefixes)
            return loss

        grad_fn = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1, 2)))

        loss_p, grads_p = grad_fn(*args)
        orig = matryoshka._use_pallas
        try:
            matryoshka._use_pallas = lambda *a, **k: False
            loss_x, grads_x = jax.jit(
                jax.value_and_grad(loss_fn, argnums=(0, 1, 2))
            )(*args)
        finally:
            matryoshka._use_pallas = orig

        errs = {
            "loss": _rel_err(loss_p, loss_x),
            "dw": _rel_err(grads_p[0], grads_x[0]),
            "db": _rel_err(grads_p[1], grads_x[1]),
            "df": _rel_err(grads_p[2], grads_x[2]),
        }
        # bf16 matmul noise: ~1e-3 observed; 1e-2 headroom bound.
        tol = 1e-2
        checks[name] = {
            "rel_err": errs,
            "tol": tol,
            "ok": bool(all(v < tol for v in errs.values())),
        }

    prefix_case(512, 256, 4096, "prefix_mse_small")
    prefix_case(512, 256, 4096, "prefix_mse_bf16_latents", f_dtype=jnp.bfloat16)
    if not quick:
        prefix_case(16384, 1024, 16384, "prefix_mse_production")

    # --- dead-subspace AuxK vs dense AuxK (the steady-state train step) ---
    # bench.py times the subspace variant; this check pins it to the dense
    # reference path on-chip: same loss and same parameter gradients whenever
    # n_dead <= cap (the train loop's routing guarantee).
    from saev_tpu.nn import modeling

    b, d_model, d_sae = (2048, 256, 4096) if quick else (4096, 512, 8192)
    cap = d_sae // 4
    sae_cfg = modeling.SparseAutoencoderConfig(
        d_model=d_model, d_sae=d_sae, activation=modeling.TopK(top_k=32)
    )
    obj_cfg = objectives.Matryoshka(n_prefixes=10, dead_threshold_tokens=1000)
    params, state = modeling.init(sae_cfg, jax.random.key(0))
    n_dead = d_sae // 20
    dead_cols = rng.choice(d_sae, size=n_dead, replace=False)
    b_enc = np.asarray(params["b_enc"]).copy()
    b_enc[dead_cols] = -1e6
    params = {**params, "b_enc": jnp.asarray(b_enc)}
    toks = np.zeros(d_sae, np.int32)
    toks[dead_cols] = 1 << 20
    obj_state = {"toks_since_active": jnp.asarray(toks)}
    x = jnp.asarray(rng.normal(size=(b, d_model)).astype(np.float32))
    prefixes = jnp.asarray(
        objectives.sample_prefixes(d_sae, 10, rng=np.random.default_rng(2))
    )

    def aux_loss(p, cap_, precision):
        loss, _, _, _ = objectives.matryoshka_loss(
            obj_cfg, sae_cfg, p, state, obj_state, x, prefixes,
            training=True, aux_subspace_cap=cap_, precision=precision,
        )
        return loss.aux

    # Two regimes: HIGHEST (f32 matmuls) isolates the subspace math — a
    # selection or gather bug shows up as O(1) error, so the tolerance is
    # sharp; DEFAULT (bf16 matmul passes, the timed bench path) only bounds
    # the recompute-vs-shared-matmul noise, same 1e-2 headroom as the
    # prefix-MSE checks (the -1e6 dead-pinning bias amplifies bf16 noise
    # through the quadratic loss).
    for pname, precision, tol in (
        ("highest", jax.lax.Precision.HIGHEST, 1e-4),
        ("default", None, 1e-2),
    ):
        (l_sub, g_sub) = jax.jit(
            jax.value_and_grad(lambda p: aux_loss(p, cap, precision))
        )(params)
        (l_dense, g_dense) = jax.jit(
            jax.value_and_grad(lambda p: aux_loss(p, None, precision))
        )(params)
        errs = {"loss": _rel_err(l_sub, l_dense)}
        for key in g_dense:
            errs[key] = _rel_err(g_sub[key], g_dense[key])
        checks[f"auxk_subspace_vs_dense_{pname}"] = {
            "rel_err": errs,
            "tol": tol,
            "ok": bool(all(v < tol for v in errs.values())),
        }

    # --- sweep composition: the same kernels under vmap over stacked SAEs ---
    b, d_model, d_sae, n_sae = 512, 256, 2048, 3
    f = np.maximum(rng.normal(size=(n_sae, b, d_sae)), 0).astype(np.float32)
    x = rng.normal(size=(b, d_model)).astype(np.float32)
    w = rng.normal(size=(n_sae, d_sae, d_model)).astype(np.float32) / 16.0
    bd = rng.normal(size=(n_sae, d_model)).astype(np.float32) * 0.01
    prefixes = jnp.asarray(
        np.stack([
            objectives.sample_prefixes(d_sae, 10, rng=np.random.default_rng(i))
            for i in range(n_sae)
        ])
    )
    xj = jnp.asarray(x)

    def one(w_, bd_, f_, p_):
        loss, _ = matryoshka.prefix_mse(w_, bd_, f_, xj, p_)
        return loss

    v_losses, v_grads = jax.jit(
        lambda *a: jax.vmap(jax.value_and_grad(one, argnums=(0, 2)))(*a)
    )(jnp.asarray(w), jnp.asarray(bd), jnp.asarray(f), prefixes)
    errs = []
    for i in range(n_sae):
        li, gi = jax.jit(jax.value_and_grad(one, argnums=(0, 2)))(
            jnp.asarray(w[i]), jnp.asarray(bd[i]), jnp.asarray(f[i]), prefixes[i]
        )
        errs.append(_rel_err(v_losses[i], li))
        errs.append(_rel_err(v_grads[0][i], gi[0]))
        errs.append(_rel_err(v_grads[1][i], gi[1]))
    tol = 1e-2
    checks["prefix_mse_vmap_sweep"] = {
        "max_rel_err": float(max(errs)),
        "tol": tol,
        "ok": bool(max(errs) < tol),
    }

    ok = all(c["ok"] for c in checks.values())
    return {"ok": ok, "backend": jax.default_backend(), "checks": checks}


def main() -> int:
    quick = "--quick" in sys.argv
    result = run_checks(quick=quick)
    print(json.dumps(result))
    return 0 if result["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
