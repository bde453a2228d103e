"""Benchmark: SAE training throughput (patches/sec/chip) on the local accelerator.

Times the full jitted train step at the reference's production defaults
(reference framework/train.py:61, shuffled.py:45, modeling.py:265-268):
batch 16384, d_model 1024, d_sae 16384, TopK k=32 + AuxK, Matryoshka 10
prefixes, Adam + warmup-cosine + grad clip + decoder constraints — the whole
step in one jit, batches resident in HBM (isolates compute from host I/O).

Baseline: the reference's end-to-end training rate is bounded by its shuffled
dataloader at ~3,500 patches/s on its cluster (BASELINE.md; reference
docs/internal/archive/experiments/throughput.md:775-5004). `vs_baseline` is
ours / 3500.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

BASELINE_PATCHES_PER_S = 3500.0


def main():
    import jax
    import jax.numpy as jnp

    from saev_tpu.framework import train as train_mod
    from saev_tpu.nn import modeling, objectives

    batch, d_model, d_sae, n_sae = 16384, 1024, 16384, 1
    sae_cfg = modeling.SparseAutoencoderConfig(
        d_model=d_model, d_sae=d_sae, activation=modeling.TopK(top_k=32)
    )
    obj_cfg = objectives.Matryoshka(n_prefixes=10)

    keys = jax.random.split(jax.random.key(0), n_sae)
    inits = [modeling.init(sae_cfg, k) for k in keys]
    stack = lambda trees: jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
    params = stack([p for p, _ in inits])
    # Make 5% of latents genuinely dead (encoder bias pinned far negative so
    # they can never win the top-k and reset their counters) so every timed
    # step takes the AuxK-active path: the train step skips ALL AuxK work via
    # lax.cond when nothing is dead (the reference's k_use == 0 early return),
    # and the headline number should represent the steady state where dead
    # latents exist, not the cheaper warm-up phase.
    n_dead = d_sae // 20
    b_enc = np.asarray(params["b_enc"]).copy()
    b_enc[:, :n_dead] = -1e6
    params = {**params, "b_enc": jnp.asarray(b_enc)}
    obj_state = stack([objectives.init_state(sae_cfg) for _ in range(n_sae)])
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
    step_fn = train_mod.make_train_step(sae_cfg, obj_cfg, n_steps=6000, optim="adam")

    rng = np.random.default_rng(0)
    # A few distinct batches so the compiler can't fold the input.
    xs = [
        jnp.asarray(rng.normal(size=(batch, d_model)).astype(np.float32))
        for _ in range(4)
    ]
    prefixes = jnp.asarray(
        np.stack([objectives.sample_prefixes(d_sae, 10, rng=rng) for _ in range(n_sae)])
    )

    # Warmup / compile.
    for _ in range(3):
        ts, stats = step_fn(ts, xs[0], prefixes, hp)
    jax.block_until_ready(ts.params)

    n_iters = 20
    t0 = time.perf_counter()
    for i in range(n_iters):
        ts, stats = step_fn(ts, xs[i % len(xs)], prefixes, hp)
    jax.block_until_ready(ts.params)
    dt = time.perf_counter() - t0

    patches_per_s = batch * n_iters / dt
    print(
        json.dumps({
            "metric": "sae_train_patches_per_sec_per_chip",
            "value": round(patches_per_s, 1),
            "unit": "patches/s",
            "vs_baseline": round(patches_per_s / BASELINE_PATCHES_PER_S, 2),
        })
    )


if __name__ == "__main__":
    main()
