"""Mesh/sharding tests on the 8-virtual-device CPU mesh (the hermetic analog of
a pod slice — SURVEY.md §4 'fake cluster')."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from saev_tpu import parallel
from conftest import _Helpers as helpers


def test_make_mesh_shapes():
    mesh = parallel.make_mesh()
    assert mesh.shape[parallel.DATA_AXIS] == 8
    assert mesh.shape[parallel.SWEEP_AXIS] == 1

    mesh = parallel.make_mesh(sweep=2)
    assert mesh.shape[parallel.DATA_AXIS] == 4
    assert mesh.shape[parallel.SWEEP_AXIS] == 2

    with pytest.raises(AssertionError):
        parallel.make_mesh(n_devices=6, sweep=4)


def test_shard_batch_and_sweep_placement():
    mesh = parallel.make_mesh(sweep=2)
    x = parallel.shard_batch(mesh, np.zeros((16, 4), np.float32))
    assert x.sharding.spec == jax.sharding.PartitionSpec(parallel.DATA_AXIS)

    tree = {"w": jnp.zeros((4, 3, 2)), "scalar": jnp.zeros(())}
    placed = parallel.shard_sweep(mesh, tree)
    assert placed["w"].sharding.spec == jax.sharding.PartitionSpec(parallel.SWEEP_AXIS)
    # Scalars replicate.
    assert placed["scalar"].sharding.spec == jax.sharding.PartitionSpec()

    # Leading axis not divisible by sweep -> replicated.
    odd = parallel.shard_sweep(mesh, {"w": jnp.zeros((3, 2))})
    assert odd["w"].sharding.spec == jax.sharding.PartitionSpec()


def test_place_like_restores_template_shardings():
    """place_like (checkpoint restore) puts host values back onto the
    template's exact shardings — including a device-sharded sweep axis."""
    mesh = parallel.make_mesh(sweep=2)
    template = parallel.shard_sweep(
        mesh,
        {"w": jnp.zeros((4, 3), jnp.float32), "s": jnp.zeros((), jnp.int32)},
    )
    host = {
        "w": np.arange(12, dtype=np.float32).reshape(4, 3),
        "s": np.int32(7),
    }
    placed = parallel.place_like(template, host)
    assert placed["w"].sharding == template["w"].sharding
    assert placed["s"].sharding == template["s"].sharding
    np.testing.assert_array_equal(np.asarray(placed["w"]), host["w"])
    assert int(placed["s"]) == 7


def test_data_parallel_equals_single_device():
    """The sharded train step produces the same numbers as a 1-device run."""
    from saev_tpu.framework import train as T
    from saev_tpu.nn import modeling, objectives

    n_sae, d_model, d_sae, batch = 4, 16, 32, 32
    sae_cfg = modeling.SparseAutoencoderConfig(
        d_model=d_model, d_sae=d_sae, activation=modeling.TopK(top_k=4)
    )
    obj_cfg = objectives.Matryoshka(n_prefixes=2)

    def build(mesh):
        keys = jax.random.split(jax.random.key(0), n_sae)
        inits = [modeling.init(sae_cfg, k) for k in keys]
        stack = lambda trees: jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
        params = parallel.shard_sweep(mesh, stack([p for p, _ in inits]))
        ts = T.SweepState(
            params=params,
            sae_state=parallel.shard_sweep(mesh, stack([s for _, s in inits])),
            obj_state=parallel.shard_sweep(
                mesh, stack([objectives.init_state(sae_cfg)] * n_sae)
            ),
            opt_state=parallel.shard_sweep(mesh, T._adam_init(params)),
            step=jnp.zeros((), jnp.int32),
        )
        return ts

    hp = {
        "lr": jnp.asarray([1e-3, 3e-3, 1e-3, 3e-3], jnp.float32),
        "n_lr_warmup": jnp.full((n_sae,), 2.0, jnp.float32),
        "grad_clip": jnp.ones((n_sae,), jnp.float32),
        "sparsity_coeff": jnp.zeros(n_sae, jnp.float32),
        "aux_alpha": jnp.full((n_sae,), 1 / 32, jnp.float32),
        "momentum": jnp.zeros(n_sae, jnp.float32),
    }
    # "highest" precision so 1-device and 8-device runs agree tightly. Paths
    # exercised: chunked lax.map (width 1, unsharded sweep), full vmap over a
    # sharded sweep, and the composed chunked+sharded path (width 1 WITH
    # sweep_parallel=2 — _sweep_map's unsharded-scan rearrangement).
    sweep2_mesh = parallel.make_mesh(sweep=2)
    step_fns = {
        "mapped": T.make_train_step(
            sae_cfg, obj_cfg, n_steps=10, matmul_precision="highest",
            sweep_vmap_width=1,
        ),
        "vmapped": T.make_train_step(
            sae_cfg, obj_cfg, n_steps=10, matmul_precision="highest",
            sweep_vmap_width=n_sae,
        ),
        "sharded_chunked": T.make_train_step(
            sae_cfg, obj_cfg, n_steps=10, matmul_precision="highest",
            sweep_vmap_width=1, sweep_parallel=2, mesh=sweep2_mesh,
        ),
    }
    rng = np.random.default_rng(0)
    x_np = rng.normal(size=(batch, d_model)).astype(np.float32)
    prefixes = jnp.asarray(
        np.stack([objectives.sample_prefixes(d_sae, 2, rng=rng) for _ in range(n_sae)])
    )

    results = {}
    for name, mesh, step_fn in [
        ("single", parallel.make_mesh(n_devices=1), step_fns["mapped"]),
        ("dp8", parallel.make_mesh(), step_fns["mapped"]),
        ("dp4xsweep2", sweep2_mesh, step_fns["vmapped"]),
        # Composed: device-sharded sweep axis + per-device width-1 chunking.
        ("dp4xsweep2_w1", sweep2_mesh, step_fns["sharded_chunked"]),
    ]:
        ts = build(mesh)
        x = parallel.shard_batch(mesh, x_np)
        for _ in range(3):
            ts, stats = step_fn(ts, x, prefixes, hp)
        results[name] = (
            np.asarray(stats["loss"]),
            np.asarray(jax.device_get(ts.params["W_dec"])),
        )

    for name in ("dp8", "dp4xsweep2", "dp4xsweep2_w1"):
        np.testing.assert_allclose(
            results[name][0], results["single"][0], rtol=1e-5, atol=1e-6
        )
        # atol covers f32 reduction-order noise across layouts (observed
        # max ~1.6e-5 on W_dec after 3 adam steps at highest precision).
        np.testing.assert_allclose(
            results[name][1], results["single"][1], rtol=1e-4, atol=5e-5
        )


def test_train_with_sweep_parallel(tmp_path):
    """End-to-end train() with sweep_parallel=2 over the virtual mesh."""
    from saev_tpu.data import ShuffledConfig, fake_vit
    from saev_tpu.framework import train as train_mod
    from saev_tpu.nn import modeling, objectives

    shards_dir = helpers.write_shards(tmp_path, n_examples=16, layers=(0,))
    runs_root = helpers.tmp_runs_root(tmp_path)
    data_cfg = ShuffledConfig(
        shards=shards_dir, layer=0, batch_size=32, n_threads=2, seed=7
    )
    base = train_mod.Config(
        train_data=data_cfg, val_data=data_cfg, n_train=128, n_val=64,
        sae=modeling.SparseAutoencoderConfig(
            d_model=fake_vit.D_MODEL, d_sae=32, activation=modeling.TopK(top_k=4)
        ),
        objective=objectives.Matryoshka(n_prefixes=2),
        lr=1e-3, n_lr_warmup=2, log_every=2, track=False,
        runs_root=runs_root, device="cpu", seed=1, sweep_parallel=2,
        sweep_vmap_width=1,
    )
    # 4 SAEs over sweep_parallel=2 with width 1: 2 per device, chunked —
    # the composed path production sweeps use (VERDICT r1 #5).
    cfgs = [
        base,
        dataclasses.replace(base, lr=3e-3, seed=2),
        dataclasses.replace(base, lr=1e-4, seed=3),
        dataclasses.replace(base, lr=3e-4, seed=4),
    ]
    runtimes, run, steps = train_mod.train(cfgs)
    run.finish()
    assert steps > 0
    w = np.asarray(jax.device_get(runtimes[0].ts.params["W_dec"]))
    assert np.isfinite(w).all()


def test_batch_topk_global_semantics_under_dp():
    """BatchTopK's batch-global top-(k*B) must span the WHOLE batch under data
    sharding, not each shard separately (SURVEY.md §7.4 'hard parts'; the
    parallel module docstring claims exact global semantics — this pins it).
    The input concentrates all large values in rows living on one device, so
    shard-local top-k would give a very different mask."""
    from saev_tpu.nn import modeling

    batch, d_sae, k = 32, 64, 4
    rng = np.random.default_rng(0)
    h_np = rng.normal(size=(batch, d_sae)).astype(np.float32)
    # Rows 0-3 (first device's shard under dp8) get huge values: the global
    # budget k*B = 128 should mostly select from these rows.
    h_np[:4] += 100.0

    def run(mesh):
        h = parallel.shard_batch(mesh, h_np)

        @jax.jit
        def step(h):
            return modeling.batch_topk_train(h, k, 0.1, jnp.asarray(0.0))

        f, thresh = step(h)
        return np.asarray(jax.device_get(f)), float(thresh)

    f1, t1 = run(parallel.make_mesh(n_devices=1))
    f8, t8 = run(parallel.make_mesh())

    np.testing.assert_array_equal(f8 != 0, f1 != 0)
    np.testing.assert_allclose(f8, f1, rtol=1e-6)
    assert t8 == pytest.approx(t1, rel=1e-6)
    # Sanity: the mask is batch-global (concentrated rows dominate the budget).
    assert (f1[:4] != 0).sum() > (f1[4:] != 0).sum()


def test_feature_parallel_guards():
    """Indivisible latent dims must fail loudly, not silently replicate; and
    the feature-parallel step's FORCE_LAX switch must not leak process-wide."""
    from saev_tpu.framework import train as T
    from saev_tpu.nn import modeling, objectives
    from saev_tpu.ops import topk as ops_topk

    sae_cfg = modeling.SparseAutoencoderConfig(
        d_model=16, d_sae=63, activation=modeling.TopK(top_k=4)
    )
    with pytest.raises(AssertionError, match="divide"):
        T.make_train_step(
            sae_cfg, objectives.Matryoshka(n_prefixes=2), n_steps=4,
            feature_parallel=2,
        )
    mesh = parallel.make_mesh(n_devices=8, feature=2)
    with pytest.raises(AssertionError, match="divisible"):
        parallel.shard_features(mesh, {"w": jnp.zeros((1, 63))}, 63)

    # A feature-parallel step run must restore FORCE_LAX afterwards.
    sae_cfg = modeling.SparseAutoencoderConfig(
        d_model=16, d_sae=64, activation=modeling.TopK(top_k=4)
    )
    obj_cfg = objectives.Matryoshka(n_prefixes=2)
    step_fn = T.make_train_step(sae_cfg, obj_cfg, n_steps=4, feature_parallel=2)
    assert ops_topk.FORCE_LAX is False
    params, state = modeling.init(sae_cfg, jax.random.key(0))
    stack = lambda tree: jax.tree.map(lambda x: x[None], tree)
    ts = T.SweepState(
        params=stack(params), sae_state=stack(state),
        obj_state=stack(objectives.init_state(sae_cfg)),
        opt_state=T._adam_init(stack(params)), step=jnp.zeros((), jnp.int32),
    )
    hp = {
        "lr": jnp.asarray([1e-3], jnp.float32),
        "n_lr_warmup": jnp.ones((1,), jnp.float32),
        "grad_clip": jnp.ones((1,), jnp.float32),
        "sparsity_coeff": jnp.zeros(1, jnp.float32),
        "aux_alpha": jnp.full((1,), 1 / 32, jnp.float32),
        "momentum": jnp.zeros(1, jnp.float32),
    }
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 16)), jnp.float32)
    prefixes = jnp.asarray(
        np.stack([objectives.sample_prefixes(64, 2, rng=np.random.default_rng(0))])
    )
    ts, _ = step_fn(ts, x, prefixes, hp)
    assert ops_topk.FORCE_LAX is False, "feature-parallel step leaked FORCE_LAX"


def test_feature_parallel_equals_single_device():
    """Latent-sharded (feature axis) training must reproduce the single-device
    trajectory — GSPMD slices d_sae, the numbers don't change."""
    from saev_tpu.framework import train as T
    from saev_tpu.nn import modeling, objectives

    n_sae, d_model, d_sae, batch = 2, 16, 64, 32
    sae_cfg = modeling.SparseAutoencoderConfig(
        d_model=d_model, d_sae=d_sae, activation=modeling.TopK(top_k=4)
    )
    obj_cfg = objectives.Matryoshka(n_prefixes=2)

    def build(mesh):
        keys = jax.random.split(jax.random.key(0), n_sae)
        inits = [modeling.init(sae_cfg, k) for k in keys]
        stack = lambda trees: jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
        params = parallel.shard_features(mesh, stack([p for p, _ in inits]), d_sae)
        return T.SweepState(
            params=params,
            sae_state=parallel.shard_features(
                mesh, stack([s for _, s in inits]), d_sae
            ),
            obj_state=parallel.shard_features(
                mesh, stack([objectives.init_state(sae_cfg)] * n_sae), d_sae
            ),
            opt_state=parallel.shard_features(mesh, T._adam_init(params), d_sae),
            step=jnp.zeros((), jnp.int32),
        )

    hp = {
        "lr": jnp.asarray([1e-3, 3e-3], jnp.float32),
        "n_lr_warmup": jnp.full((n_sae,), 2.0, jnp.float32),
        "grad_clip": jnp.ones((n_sae,), jnp.float32),
        "sparsity_coeff": jnp.zeros(n_sae, jnp.float32),
        "aux_alpha": jnp.full((n_sae,), 1 / 32, jnp.float32),
        "momentum": jnp.zeros(n_sae, jnp.float32),
    }
    step_fn = T.make_train_step(
        sae_cfg, obj_cfg, n_steps=10, matmul_precision="highest",
        sweep_vmap_width=n_sae, feature_parallel=4,
    )
    rng = np.random.default_rng(0)
    x_np = rng.normal(size=(batch, d_model)).astype(np.float32)
    prefixes = jnp.asarray(np.stack(
        [objectives.sample_prefixes(d_sae, 2, rng=rng) for _ in range(n_sae)]
    ))

    results = {}
    for name, mesh in [
        ("single", parallel.make_mesh(n_devices=1)),
        ("data2_feat4", parallel.make_mesh(n_devices=8, feature=4)),
    ]:
        ts = build(mesh)
        x = parallel.shard_batch(mesh, x_np)
        for _ in range(3):
            ts, stats = step_fn(ts, x, prefixes, hp)
        results[name] = (
            np.asarray(stats["loss"]),
            np.asarray(jax.device_get(ts.params["W_dec"])),
        )
    np.testing.assert_allclose(
        results["data2_feat4"][0], results["single"][0], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        results["data2_feat4"][1], results["single"][1], rtol=1e-4, atol=5e-5
    )


def test_shard_features_placement():
    mesh = parallel.make_mesh(n_devices=8, sweep=2, feature=2)
    d_sae = 32
    tree = {
        "W_enc": jnp.zeros((4, 16, d_sae)),
        "W_dec": jnp.zeros((4, d_sae, 16)),
        "b_enc": jnp.zeros((4, d_sae)),
        "b_dec": jnp.zeros((4, 16)),
        "scalar": jnp.zeros(()),
    }
    placed = parallel.shard_features(mesh, tree, d_sae)
    P = jax.sharding.PartitionSpec
    sw, ft = parallel.SWEEP_AXIS, parallel.FEATURE_AXIS
    assert placed["W_enc"].sharding.spec == P(sw, None, ft)
    assert placed["W_dec"].sharding.spec == P(sw, ft)  # trailing None trimmed
    assert placed["b_enc"].sharding.spec == P(sw, ft)
    assert placed["b_dec"].sharding.spec == P(sw)
    assert placed["scalar"].sharding.spec == P()


def test_train_with_feature_parallel(tmp_path):
    """End-to-end train() with feature_parallel=2 over the virtual mesh."""
    from saev_tpu.data import ShuffledConfig, fake_vit
    from saev_tpu.framework import train as train_mod
    from saev_tpu.nn import modeling, objectives
    from saev_tpu.ops import topk as ops_topk

    shards_dir = helpers.write_shards(tmp_path, n_examples=16, layers=(0,))
    runs_root = helpers.tmp_runs_root(tmp_path)
    data_cfg = ShuffledConfig(
        shards=shards_dir, layer=0, batch_size=32, n_threads=2, seed=7
    )
    base = train_mod.Config(
        train_data=data_cfg, val_data=data_cfg, n_train=128, n_val=64,
        sae=modeling.SparseAutoencoderConfig(
            d_model=fake_vit.D_MODEL, d_sae=32, activation=modeling.TopK(top_k=4)
        ),
        objective=objectives.Matryoshka(n_prefixes=2),
        lr=1e-3, n_lr_warmup=2, log_every=2, track=False,
        runs_root=runs_root, device="cpu", seed=1, feature_parallel=2,
        sweep_vmap_width=2,
    )
    cfgs = [base, dataclasses.replace(base, lr=3e-3, seed=2)]
    try:
        runtimes, run, steps = train_mod.train(cfgs)
    finally:
        ops_topk.FORCE_LAX = False  # module-global set by make_train_step
    run.finish()
    assert steps > 0
    w = runtimes[0].ts.params["W_dec"]
    # The latent dim actually sharded over the feature axis.
    assert w.sharding.spec[1] == parallel.FEATURE_AXIS
    assert np.isfinite(np.asarray(jax.device_get(w))).all()
