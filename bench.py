"""Benchmark: SAE training throughput (patches/sec/chip) on the local accelerator.

COMPUTE-ONLY HEADLINE: the `value` (and its vs_baseline ratio) times the
jitted train step on HBM-resident batches, isolating chip compute from host
I/O; the reference's 3,500 patches/s baseline is its *loader-bound*
end-to-end rate, so vs_baseline compares our compute ceiling to its pipeline
rate. The JSON therefore also embeds the OTHER side of the pipeline: a live
host-loader microbench (`loader`: descriptor-sampling shuffled loader over
synthetic page-cache-warm shards on THIS host) and `e2e_bound` =
min(step, loader) patches/s — the honest end-to-end ceiling for this
host+chip pair. On the dev VM the h2d tunnel artifact (NOTES.md) prevents a
true coupled measurement; on production hosts scripts/bench_e2e.py measures
the coupled pipeline directly.

Times the full jitted train step at the reference's production defaults
(reference framework/train.py:61, shuffled.py:45, modeling.py:265-268):
batch 16384, d_model 1024, d_sae 16384, TopK k=32 + AuxK, Matryoshka 10
prefixes, Adam + warmup-cosine + grad clip + decoder constraints — the whole
step in one jit, batches resident in HBM (isolates compute from host I/O).

Baseline: the reference's end-to-end training rate is bounded by its shuffled
dataloader at ~3,500 patches/s on its cluster (BASELINE.md; reference
docs/internal/archive/experiments/throughput.md:775-5004). `vs_baseline` is
ours / 3500.

Before timing, the Pallas kernels are numerically checked against the XLA
fallback on the live chip (scripts/check_tpu_kernels.py) and the verdict is
embedded in the output as `kernel_parity` — a kernel regression cannot ship
behind a green CPU suite and a plausible headline number.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline",
"headline_scope", "kernel_parity", "sweep", "loader",
"e2e_bound_patches_per_s"}. The sweep dict times the signature multi-SAE path
(n_sae SAEs sharing one batch via the chunked vmap sweep axis; reference
train.py:339-343) and reports ms/step and the per-SAE cost ratio vs n_sae=1.

Usage: python bench.py [--n-sae N] [--no-sweep] [--no-kernel-check]
       [--no-loader]
"""

import json
import sys
import time

import numpy as np

BASELINE_PATCHES_PER_S = 3500.0

BATCH, D_MODEL, D_SAE = 16384, 1024, 16384


def build_state(n_sae: int, *, dead_frac: float = 0.05):
    """Stacked sweep state at production shape with `dead_frac` of latents
    pinned dead (encoder bias at -1e6 + saturated staleness counters) so every
    timed step takes the AuxK-active steady-state path."""
    import jax
    import jax.numpy as jnp

    from saev_tpu.framework import train as train_mod
    from saev_tpu.nn import modeling, objectives

    sae_cfg = modeling.SparseAutoencoderConfig(
        d_model=D_MODEL, d_sae=D_SAE, activation=modeling.TopK(top_k=32)
    )
    obj_cfg = objectives.Matryoshka(n_prefixes=10)

    keys = jax.random.split(jax.random.key(0), n_sae)
    inits = [modeling.init(sae_cfg, k) for k in keys]
    stack = lambda trees: jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
    params = stack([p for p, _ in inits])
    n_dead = int(D_SAE * dead_frac)
    if n_dead:
        b_enc = np.asarray(params["b_enc"]).copy()
        b_enc[:, :n_dead] = -1e6
        params = {**params, "b_enc": jnp.asarray(b_enc)}
    obj_state = stack([objectives.init_state(sae_cfg) for _ in range(n_sae)])
    if n_dead:
        toks = np.asarray(obj_state["toks_since_active"]).copy()
        toks[:, :n_dead] = 1 << 30
        obj_state = {**obj_state, "toks_since_active": jnp.asarray(toks)}
    ts = train_mod.SweepState(
        params=params,
        sae_state=stack([s for _, s in inits]),
        obj_state=obj_state,
        opt_state=train_mod._adam_init(params),
        step=jnp.zeros((), jnp.int32),
    )
    hp = {
        "lr": jnp.full((n_sae,), 4e-4, jnp.float32),
        "n_lr_warmup": jnp.full((n_sae,), 500.0, jnp.float32),
        "grad_clip": jnp.ones((n_sae,), jnp.float32),
        "sparsity_coeff": jnp.zeros((n_sae,), jnp.float32),
        "aux_alpha": jnp.full((n_sae,), 1 / 32, jnp.float32),
        "momentum": jnp.zeros((n_sae,), jnp.float32),
    }
    rng = np.random.default_rng(0)
    # A few distinct batches so the compiler can't fold the input.
    xs = [
        jnp.asarray(rng.normal(size=(BATCH, D_MODEL)).astype(np.float32))
        for _ in range(4)
    ]
    prefixes = jnp.asarray(
        np.stack([objectives.sample_prefixes(D_SAE, 10, rng=rng) for _ in range(n_sae)])
    )
    return sae_cfg, obj_cfg, ts, hp, xs, prefixes


def time_step(n_sae: int, *, n_iters: int = 20, sweep_vmap_width: int = 1):
    """Seconds per step of the full train step for an n_sae sweep (timing via
    the data-dependency chain through the carried state; NOTES.md gotchas).

    Times the dead-subspace AuxK variant at the tight rung — the step the
    train loop runs at steady state (5% dead fits the d_sae/16 cap; the loop
    proves that per-step via stats["aux_risk"] and routes to a wider rung or
    the dense variant otherwise, framework/train.py step_fn_at)."""
    import jax

    from saev_tpu.framework import train as train_mod
    from saev_tpu.nn import objectives as obj_mod

    sae_cfg, obj_cfg, ts, hp, xs, prefixes = build_state(n_sae)
    cap = obj_mod.subspace_cap_ladder(D_SAE, sae_cfg.activation.aux.k_aux)[0]
    assert int(D_SAE * 0.05) <= cap, "bench dead set must fit the timed cap"
    step_fn = train_mod.make_train_step(
        sae_cfg, obj_cfg, n_steps=6000, optim="adam",
        sweep_vmap_width=sweep_vmap_width,
        aux_subspace_cap=cap,
    )
    for _ in range(3):
        ts, stats = step_fn(ts, xs[0], prefixes, hp)
    jax.block_until_ready(ts.params)

    t0 = time.perf_counter()
    for i in range(n_iters):
        ts, stats = step_fn(ts, xs[i % len(xs)], prefixes, hp)
    jax.block_until_ready(ts.params)
    return (time.perf_counter() - t0) / n_iters


def measure_loader(total_gb: float = 1.0) -> dict:
    """Host-loader microbench: descriptor-sampling shuffled loader over
    freshly written (page-cache-warm) synthetic shards at the production row
    width. Returns {mb_per_s, patches_per_s} for this host; {} on failure
    (the bench must still print its JSON line without a working loader)."""
    import pathlib
    import shutil
    import tempfile

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent / "scripts"))
    try:
        import bench_loader_threads as blt

        tmp = pathlib.Path(tempfile.mkdtemp(prefix="benchloader_"))
        try:
            root = tmp / "saev" / "shards"
            root.mkdir(parents=True)
            shards_dir = blt.write_shards(root, total_gb)
            best = {}
            for _ in range(2):
                r = blt.measure(shards_dir, 1, False, descriptors=True)
                if not best or r["mb_per_s"] > best["mb_per_s"]:
                    best = r
            return {
                "mb_per_s": best["mb_per_s"],
                "patches_per_s": best["patches_per_s"],
                "mode": "descriptor_sampling",
            }
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    except Exception as err:  # pragma: no cover - environment-specific
        return {"error": str(err)[:120]}


def _acquire_backend(timeout_s: float = 600.0):
    """jax.devices() with a watchdog: the axon tunnel can hang indefinitely
    when down, which would stall an unattended bench run forever. On timeout,
    print a well-formed JSON line recording the failure and exit non-zero."""
    import threading

    result: dict = {}

    def probe():
        try:
            import jax

            result["devices"] = jax.devices()
        except Exception as err:  # pragma: no cover - backend-specific
            result["error"] = str(err)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive() or "error" in result:
        why = result.get("error", f"backend init hung >{timeout_s:.0f}s")
        print(
            json.dumps({
                "metric": "sae_train_patches_per_sec_per_chip",
                "value": 0.0,
                "unit": "patches/s",
                "vs_baseline": 0.0,
                "kernel_parity": f"no-backend: {why[:120]}",
                "sweep": {},
            })
        )
        raise SystemExit(1)


def main():
    argv = sys.argv[1:]
    n_sae = 1
    if "--n-sae" in argv:
        n_sae = int(argv[argv.index("--n-sae") + 1])
    do_sweep = "--no-sweep" not in argv
    do_kernel_check = "--no-kernel-check" not in argv

    _acquire_backend()
    import jax

    kernel_parity = "skipped"
    if do_kernel_check and jax.default_backend() == "tpu":
        import pathlib

        sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent / "scripts"))
        from check_tpu_kernels import run_checks

        result = run_checks(quick=True)
        if result["ok"]:
            kernel_parity = "ok"
        else:
            failed = [k for k, v in result.get("checks", {}).items() if not v["ok"]]
            kernel_parity = "FAIL:" + ",".join(failed or [result.get("error", "?")])

    dt1 = time_step(n_sae)
    # With --n-sae > 1 the throughput is SAE-patches/s (N SAEs amortizing one
    # batch); scale the baseline by N too so vs_baseline stays an
    # apples-to-apples per-SAE comparison under the same metric name.
    patches_per_s = BATCH * n_sae / dt1
    baseline = BASELINE_PATCHES_PER_S * n_sae

    loader = {} if "--no-loader" in argv else measure_loader()
    # Loader bound in the SAME unit as the headline: one loaded patch feeds
    # all n_sae SAEs, so the loader-side ceiling is n_sae x its raw rate.
    e2e_bound = (
        round(min(patches_per_s, loader["patches_per_s"] * n_sae), 1)
        if loader.get("patches_per_s")
        else None
    )

    sweep = {}
    if do_sweep:
        # The signature feature: N SAEs amortizing one batch. Per-SAE cost must
        # stay ~flat as the sweep grows (chunked lax.map over the sweep axis).
        base_ms = dt1 * 1e3 if n_sae == 1 else time_step(1) * 1e3
        sweep["1"] = {"ms_per_step": round(base_ms, 1), "per_sae_vs_single": 1.0}
        for n in (4,):
            dt = time_step(n) * 1e3
            sweep[str(n)] = {
                "ms_per_step": round(dt, 1),
                "per_sae_vs_single": round(dt / n / base_ms, 3),
            }

    print(
        json.dumps({
            "metric": "sae_train_patches_per_sec_per_chip",
            "value": round(patches_per_s, 1),
            "unit": "patches/s",
            "vs_baseline": round(patches_per_s / baseline, 2),
            "headline_scope": "compute-only (HBM-resident batches)",
            "kernel_parity": kernel_parity,
            "sweep": sweep,
            "loader": loader,
            "e2e_bound_patches_per_s": e2e_bound,
        })
    )


if __name__ == "__main__":
    main()
