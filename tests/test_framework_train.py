"""End-to-end training framework tests (mirror of reference
tests/test_framework_train.py: train+evaluate through the real entry points on
fake shards; plus cohort splitting and optimizer variants)."""

import dataclasses

import numpy as np
import pytest

from conftest import _Helpers as helpers


def _base_cfg(shards_dir, runs_root, **kw):
    from saev_tpu.data import ShuffledConfig, fake_vit
    from saev_tpu.framework import train as train_mod
    from saev_tpu.nn import modeling, objectives

    data_cfg = ShuffledConfig(
        shards=shards_dir, layer=0, batch_size=32, n_threads=2, seed=7
    )
    defaults = dict(
        train_data=data_cfg,
        val_data=data_cfg,
        n_train=256,
        n_val=64,
        sae=modeling.SparseAutoencoderConfig(
            d_model=fake_vit.D_MODEL, d_sae=32, activation=modeling.TopK(top_k=4)
        ),
        objective=objectives.Matryoshka(n_prefixes=3),
        lr=1e-3,
        n_lr_warmup=2,
        log_every=4,
        track=False,
        runs_root=runs_root,
        device="cpu",
        seed=1,
    )
    defaults.update(kw)
    return train_mod.Config(**defaults)


def test_worker_fn_trains_and_checkpoints_sweep(tmp_path):
    """A 2-SAE sweep (different lr) trains on one stream; each SAE gets a run
    dir with a loadable checkpoint."""
    import jax

    from saev_tpu import nn
    from saev_tpu.framework import train as train_mod
    from saev_tpu.nn import modeling

    shards_dir = helpers.write_shards(tmp_path, n_examples=16, layers=(0,))
    runs_root = helpers.tmp_runs_root(tmp_path)
    base = _base_cfg(shards_dir, runs_root)
    cfgs = [base, dataclasses.replace(base, lr=3e-3, seed=2)]

    ids = train_mod.worker_fn(cfgs)
    assert len(ids) == 2
    for rid in ids:
        cfg2, params2, state2 = nn.load(runs_root / rid / "checkpoint" / "sae.pt")
        assert cfg2.d_sae == 32
        out, _ = modeling.forward(
            cfg2, params2, state2,
            jax.numpy.asarray(np.random.default_rng(0).normal(size=(4, 128)).astype(np.float32)),
        )
        assert np.isfinite(np.asarray(out.f_x)).all()
        assert (runs_root / rid / "checkpoint" / "config.json").exists()
        assert (runs_root / rid / "links" / "train-shards").exists()


def test_cohorts_split_by_static_structure(tmp_path):
    from saev_tpu.framework import train as train_mod
    from saev_tpu.nn import modeling

    shards = tmp_path  # unused paths
    base = _base_cfg(shards, shards)
    relu = dataclasses.replace(
        base,
        sae=dataclasses.replace(base.sae, activation=modeling.Relu()),
    )
    lr_variant = dataclasses.replace(base, lr=9e-3)
    prec_variant = dataclasses.replace(base, matmul_precision="highest")

    cohorts = train_mod.make_cohorts([base, relu, lr_variant, prec_variant])
    # base and lr_variant share a compiled step; relu and precision split.
    sizes = sorted(len(c.cfgs) for c in cohorts)
    assert sizes == [1, 1, 2]


def test_split_cfgs_groups_shared_data(tmp_path):
    from saev_tpu.framework import train as train_mod

    base = _base_cfg(tmp_path, tmp_path)
    same_stream = dataclasses.replace(base, lr=5e-3, seed=9)
    other_stream = dataclasses.replace(base, n_train=512)
    groups = train_mod.split_cfgs([base, same_stream, other_stream])
    assert sorted(len(g) for g in groups) == [1, 2]


def test_muon_optimizer_trains(tmp_path):
    from saev_tpu.framework import train as train_mod

    shards_dir = helpers.write_shards(tmp_path, n_examples=16, layers=(0,))
    runs_root = helpers.tmp_runs_root(tmp_path)
    cfg = _base_cfg(shards_dir, runs_root, optim="muon")
    runtimes, run, steps = train_mod.train([cfg])
    run.finish()
    assert steps > 0
    w = np.asarray(runtimes[0].ts.params["W_dec"][0])
    assert np.isfinite(w).all()


def test_matmul_precision_highest_parity_mode(tmp_path):
    """'highest' runs and produces finite, decreasing-ish loss like the default."""
    from saev_tpu.framework import train as train_mod

    shards_dir = helpers.write_shards(tmp_path, n_examples=16, layers=(0,))
    runs_root = helpers.tmp_runs_root(tmp_path)
    cfg = _base_cfg(shards_dir, runs_root, matmul_precision="highest")
    runtimes, run, steps = train_mod.train([cfg])
    run.finish()
    assert int(runtimes[0].ts.step) == steps


def test_non_parallelizable_raises(tmp_path):
    from saev_tpu.framework import train as train_mod

    base = _base_cfg(tmp_path, tmp_path)
    other = dataclasses.replace(base, n_train=999)
    with pytest.raises(ValueError, match="not parallelizeable"):
        train_mod.train([base, other])


def _tiny_sweep_state(train_mod, modeling, n_sae=1):
    import jax
    import jax.numpy as jnp

    cfg = modeling.SparseAutoencoderConfig(
        d_model=8, d_sae=32, activation=modeling.TopK(top_k=4)
    )
    stack = lambda trees: jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
    inits = [modeling.init(cfg, jax.random.key(i)) for i in range(n_sae)]
    params = stack([p for p, _ in inits])
    ts = train_mod.SweepState(
        params=params,
        sae_state=stack([s for _, s in inits]),
        obj_state=stack([
            {"toks_since_active": jnp.zeros((32,), jnp.int32)}
            for _ in range(n_sae)
        ]),
        opt_state=train_mod._adam_init(params),
        step=jnp.zeros((), jnp.int32),
    )
    hp = {
        "lr": jnp.full((n_sae,), 1e-3, jnp.float32),
        "n_lr_warmup": jnp.full((n_sae,), 2.0, jnp.float32),
        "grad_clip": jnp.ones((n_sae,), jnp.float32),
        "sparsity_coeff": jnp.zeros((n_sae,), jnp.float32),
        "aux_alpha": jnp.full((n_sae,), 1 / 32, jnp.float32),
        "momentum": jnp.zeros((n_sae,), jnp.float32),
    }
    pfx = jnp.tile(jnp.asarray([[5, 17, 32]], jnp.int32), (n_sae, 1))
    return cfg, ts, hp, pfx


def test_auto_layout_step_handles_shape_changes_and_matches_plain_jit():
    """`_auto_layout_jit` AOT-compiles per shape (a Compiled is
    shape-specialized, unlike plain jit, so a new batch size must re-lower
    rather than error) and its trajectory is identical to the default-layout
    jit of the same step."""
    import jax
    import jax.numpy as jnp

    from saev_tpu.framework import train as train_mod
    from saev_tpu.nn import modeling, objectives

    obj_cfg = objectives.Matryoshka(n_prefixes=3, dead_threshold_tokens=100)
    cfg, ts, hp, pfx = _tiny_sweep_state(train_mod, modeling)
    ts_plain = jax.tree.map(jnp.copy, ts)  # both steps donate their state

    step_auto = train_mod.make_train_step(cfg, obj_cfg, n_steps=10, optim="adam")
    x16 = np.asarray(
        jax.random.normal(jax.random.key(3), (16, 8)), np.float32
    )
    x24 = np.asarray(
        jax.random.normal(jax.random.key(4), (24, 8)), np.float32
    )

    # Reference trajectory: the same inner step under a default-layout jit.
    orig = train_mod._auto_layout_jit
    try:
        train_mod._auto_layout_jit = lambda step: jax.jit(
            step, donate_argnums=(0,)
        )
        step_plain = train_mod.make_train_step(
            cfg, obj_cfg, n_steps=10, optim="adam"
        )
    finally:
        train_mod._auto_layout_jit = orig

    for x in (x16, x24, x16):  # shape change mid-stream must re-lower, not raise
        xb = jnp.asarray(x)
        ts, stats_a = step_auto(ts, xb, pfx, hp)
        ts_plain, stats_p = step_plain(ts_plain, xb, pfx, hp)
        np.testing.assert_allclose(
            np.asarray(stats_a["loss"]), np.asarray(stats_p["loss"]),
            rtol=1e-6, atol=0,
        )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        ),
        ts.params, ts_plain.params,
    )
