"""Ablation benchmark: the real train step under component knock-outs, to
attribute step time (same harness as bench.py; batches resident in HBM)."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def run(activation, aux, n_prefixes):
    import jax
    import jax.numpy as jnp

    from saev_tpu.framework import train as train_mod
    from saev_tpu.nn import modeling, objectives

    batch, d_model, d_sae, n_sae = 16384, 1024, 16384, 1
    sae_cfg = modeling.SparseAutoencoderConfig(
        d_model=d_model, d_sae=d_sae, activation=activation
    )
    obj_cfg = objectives.Matryoshka(n_prefixes=n_prefixes)

    keys = jax.random.split(jax.random.key(0), n_sae)
    inits = [modeling.init(sae_cfg, k) for k in keys]
    stack = lambda trees: jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
    params = stack([p for p, _ in inits])
    ts = train_mod.SweepState(
        params=params,
        sae_state=stack([s for _, s in inits]),
        obj_state=stack([objectives.init_state(sae_cfg) for _ in range(n_sae)]),
        opt_state=train_mod._adam_init(params),
        step=jnp.zeros((), jnp.int32),
    )
    hp = {
        "lr": jnp.full((n_sae,), 4e-4, jnp.float32),
        "n_lr_warmup": jnp.full((n_sae,), 500.0, jnp.float32),
        "grad_clip": jnp.ones((n_sae,), jnp.float32),
        "sparsity_coeff": jnp.zeros((n_sae,), jnp.float32),
        "aux_alpha": jnp.full((n_sae,), 1 / 32 if aux else 0.0, jnp.float32),
        "momentum": jnp.zeros((n_sae,), jnp.float32),
    }
    step_fn = train_mod.make_train_step(sae_cfg, obj_cfg, n_steps=6000, optim="adam")

    rng = np.random.default_rng(0)
    xs = [
        jnp.asarray(rng.normal(size=(batch, d_model)).astype(np.float32))
        for _ in range(4)
    ]
    prefixes = jnp.asarray(
        np.stack([
            objectives.sample_prefixes(d_sae, n_prefixes, rng=rng)
            for _ in range(n_sae)
        ])
    )

    for _ in range(3):
        ts, stats = step_fn(ts, xs[0], prefixes, hp)
    jax.block_until_ready(ts.params)

    n_iters = 20
    t0 = time.perf_counter()
    for i in range(n_iters):
        ts, stats = step_fn(ts, xs[i % len(xs)], prefixes, hp)
    jax.block_until_ready(ts.params)
    dt = time.perf_counter() - t0
    return dt / n_iters * 1e3


def main():
    from saev_tpu.nn import modeling

    topk_aux = modeling.TopK(top_k=32)
    topk_noaux = modeling.TopK(top_k=32, aux=modeling.NoAux())
    relu = modeling.Relu(sparsity=modeling.NoSparsity(), aux=modeling.NoAux())

    cases = [
        ("full (TopK+AuxK, 10 pfx)", topk_aux, True, 10),
        ("no AuxK (TopK, 10 pfx)", topk_noaux, False, 10),
        ("1 prefix (TopK+AuxK)", topk_aux, True, 1),
        ("ReLU no aux, 10 pfx", relu, False, 10),
        ("floor (ReLU, 1 pfx)", relu, False, 1),
    ]
    for name, act, aux, j in cases:
        ms = run(act, aux, j)
        print(f"{name:28s}: {ms:7.2f} ms  ({16384/ms*1e3:9.0f} patches/s)", flush=True)


if __name__ == "__main__":
    main()
