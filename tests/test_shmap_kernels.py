"""shard_map'd Pallas kernels under data sharding (ops/shmap.py).

GSPMD cannot partition `tpu_custom_call`, so a data-sharded train step keeps
its Mosaic kernels only through explicit shard_map regions at the kernel
dispatch sites. These tests run the kernels in interpret mode on the 8-CPU
mesh (`shmap.INTERPRET`) — the same dispatch decisions and shard_map wiring
the TPU path takes, minus Mosaic lowering — and assert (a) numerical equality
between the sharded and unsharded runs, (b) the shard_map region really wraps
a pallas_call in the jaxpr (i.e. the kernels did NOT silently fall back to
XLA), and (c) the full train step agrees across the data axis end to end.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from saev_tpu import parallel
from saev_tpu.ops import matryoshka, shmap, topk


@pytest.fixture
def interpret(monkeypatch):
    monkeypatch.setattr(shmap, "INTERPRET", True)
    yield


def _as_jaxpr(v):
    """Unwrap Jaxpr/ClosedJaxpr param values; None otherwise."""
    if hasattr(v, "eqns"):
        return v
    inner = getattr(v, "jaxpr", None)
    return inner if hasattr(inner, "eqns") else None


def _subtree_has(jaxpr, primitive: str) -> bool:
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == primitive:
            return True
        for v in eqn.params.values():
            sub = _as_jaxpr(v)
            if sub is not None and _subtree_has(sub, primitive):
                return True
    return False


def _jaxpr_has_shard_mapped_pallas(jaxpr) -> bool:
    """True if some shard_map eqn in `jaxpr` (recursively) contains a
    pallas_call anywhere in its body."""
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "shard_map":
            body = _as_jaxpr(eqn.params["jaxpr"])
            if body is not None and _subtree_has(body, "pallas_call"):
                return True
        for v in eqn.params.values():
            sub = _as_jaxpr(v)
            if sub is not None and _jaxpr_has_shard_mapped_pallas(sub):
                return True
    return False


def test_topk_stats_sharded_equals_unsharded(interpret):
    mesh = parallel.make_mesh()  # data=8
    rng = np.random.default_rng(0)
    b, s, k = 64, 256, 8
    h_np = rng.normal(size=(b, s)).astype(np.float32)
    h_np[:, :3] = 0.0
    h = jax.device_put(
        jnp.asarray(h_np),
        jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(parallel.DATA_AXIS)
        ),
    )

    want = topk._topk_stats_xla(jnp.asarray(h_np), k)
    with shmap.batch_sharded(mesh, (parallel.DATA_AXIS,)):
        assert shmap.n_shards() == 8
        got = jax.jit(lambda hh: topk.topk_stats(hh, k))(h)
        jaxpr = jax.make_jaxpr(lambda hh: topk.topk_stats(hh, k))(h)
    assert _jaxpr_has_shard_mapped_pallas(jaxpr.jaxpr)
    np.testing.assert_array_equal(np.asarray(got.kth), np.asarray(want.kth))
    np.testing.assert_array_equal(np.asarray(got.f), np.asarray(want.f))
    np.testing.assert_array_equal(np.asarray(got.live), np.asarray(want.live))
    np.testing.assert_array_equal(np.asarray(got.l0), np.asarray(want.l0))
    np.testing.assert_allclose(np.asarray(got.l1), np.asarray(want.l1), rtol=1e-6)


def test_kth_sharded_pads_to_shard_tiles(interpret):
    """Batch not divisible by shards x TILE_ROWS still slices back exactly."""
    mesh = parallel.make_mesh()
    rng = np.random.default_rng(1)
    h = jnp.asarray(rng.normal(size=(48, 128)).astype(np.float32))
    with shmap.batch_sharded(mesh, (parallel.DATA_AXIS,)):
        got = topk.exact_kth_value(h, 5)
    want = jax.lax.top_k(h, 5)[0][..., -1:]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_prefix_mse_sharded_grads_equal_unsharded(interpret):
    """Fused prefix-MSE fwd+bwd (all three Pallas kernels incl. the psum'd
    wgrad) matches the unsharded interpret run bitwise."""
    mesh = parallel.make_mesh()
    rng = np.random.default_rng(2)
    b, d_sae, d_model, g = 64, 64, 32, 32
    w = jnp.asarray(rng.normal(size=(d_sae, d_model)).astype(np.float32) * 0.1)
    b_dec = jnp.asarray(rng.normal(size=(d_model,)).astype(np.float32) * 0.1)
    f = jnp.asarray(
        (rng.normal(size=(b, d_sae)) * (rng.random((b, d_sae)) < 0.2)).astype(
            np.float32
        )
    )
    x = jnp.asarray(rng.normal(size=(b, d_model)).astype(np.float32))
    prefixes = jnp.asarray([32, 64], jnp.int32)

    def loss(wp, bp, fp):
        mse, _ = matryoshka.prefix_mse(wp, bp, fp, x, prefixes, g, None)
        return mse

    def run(sharded):
        if not sharded:
            return jax.value_and_grad(loss, argnums=(0, 1, 2))(w, b_dec, f)
        with shmap.batch_sharded(mesh, (parallel.DATA_AXIS,)):
            xs = jax.device_put(
                x,
                jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec(parallel.DATA_AXIS)
                ),
            )

            def loss_s(wp, bp, fp):
                mse, _ = matryoshka.prefix_mse(wp, bp, fp, xs, prefixes, g, None)
                return mse

            return jax.jit(jax.value_and_grad(loss_s, argnums=(0, 1, 2)))(
                w, b_dec, f
            )

    (v0, g0), (v1, g1) = run(False), run(True)
    assert matryoshka._use_pallas(b)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-6)
    for a, e in zip(g1, g0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), rtol=1e-5, atol=1e-6)


def test_metrics_fn_dp8_with_pallas_equals_single_device(interpret):
    """The heavy-metrics jit reaches the Pallas kth kernels with a sharded x
    too — it must get the same SPMD wrapping as the train step (a sharded
    tpu_custom_call outside shard_map would not partition)."""
    from saev_tpu.framework import train as T
    from saev_tpu.nn import modeling

    n_sae, d_model, d_sae, batch = 2, 16, 32, 64
    sae_cfg = modeling.SparseAutoencoderConfig(
        d_model=d_model, d_sae=d_sae, activation=modeling.TopK(top_k=4)
    )
    keys = jax.random.split(jax.random.key(0), n_sae)
    inits = [modeling.init(sae_cfg, k) for k in keys]
    stack = lambda trees: jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
    params = stack([p for p, _ in inits])
    sae_state = stack([s for _, s in inits])
    rng = np.random.default_rng(3)
    x_np = rng.normal(size=(batch, d_model)).astype(np.float32)
    prefixes = jnp.asarray([[16, 32], [16, 32]], jnp.int32)

    results = {}
    for name, mesh in [
        ("single", parallel.make_mesh(n_devices=1)),
        ("dp8", parallel.make_mesh()),
    ]:
        fn = T.make_metrics_fn(sae_cfg, mesh=mesh)
        x = parallel.shard_batch(mesh, x_np)
        ts = T.SweepState(
            params=params, sae_state=sae_state, obj_state={},
            opt_state={}, step=jnp.zeros((), jnp.int32),
        )
        results[name] = jax.tree.map(np.asarray, fn(ts, x, prefixes))

    for key in results["single"]:
        np.testing.assert_allclose(
            results["dp8"][key], results["single"][key], rtol=1e-5, atol=1e-6
        )


def test_spmd_wrap_forces_lax_for_sweep_sharded_traces(interpret):
    """sweep_parallel>1 traces must not contain Pallas custom calls at all
    (the sweep-sharded vmap dim cannot cross a shard_map boundary)."""
    from saev_tpu.framework import train as T
    from saev_tpu.ops import topk as topk_mod

    mesh = parallel.make_mesh(sweep=2)
    seen = {}

    def probe(x):
        seen["force_lax"] = topk_mod.FORCE_LAX
        return x

    wrapped = T._spmd_wrap(probe, mesh=mesh, sweep_parallel=2)
    wrapped(jnp.zeros(1))
    assert seen["force_lax"] is True
    assert topk_mod.FORCE_LAX is False  # restored after the call


def test_train_step_dp8_with_pallas_equals_single_device(interpret):
    """Full jitted train step (stats kernel + fused decode + masked AuxK kth,
    all shard_map'd) over data=8 equals the unsharded interpret run."""
    from saev_tpu.framework import train as T
    from saev_tpu.nn import modeling, objectives

    n_sae, d_model, d_sae, batch = 2, 16, 32, 64
    sae_cfg = modeling.SparseAutoencoderConfig(
        d_model=d_model, d_sae=d_sae, activation=modeling.TopK(top_k=4)
    )
    obj_cfg = objectives.Matryoshka(n_prefixes=2)

    def build(mesh):
        keys = jax.random.split(jax.random.key(0), n_sae)
        inits = [modeling.init(sae_cfg, k) for k in keys]
        stack = lambda trees: jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
        params = parallel.shard_sweep(mesh, stack([p for p, _ in inits]))
        return T.SweepState(
            params=params,
            sae_state=parallel.shard_sweep(mesh, stack([s for _, s in inits])),
            obj_state=parallel.shard_sweep(
                mesh, stack([objectives.init_state(sae_cfg)] * n_sae)
            ),
            opt_state=parallel.shard_sweep(mesh, T._adam_init(params)),
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
    rng = np.random.default_rng(0)
    x_np = rng.normal(size=(batch, d_model)).astype(np.float32)
    prefixes = jnp.asarray(
        np.stack(
            [objectives.sample_prefixes(d_sae, 2, rng=rng) for _ in range(n_sae)]
        )
    )

    results = {}
    for name, mesh in [
        ("single", parallel.make_mesh(n_devices=1)),
        ("dp8", parallel.make_mesh()),
    ]:
        step_fn = T.make_train_step(
            sae_cfg, obj_cfg, n_steps=10, sweep_vmap_width=1, mesh=mesh
        )
        ts = build(mesh)
        x = parallel.shard_batch(mesh, x_np)
        for _ in range(3):
            ts, stats = step_fn(ts, x, prefixes, hp)
        results[name] = (
            np.asarray(stats["loss"]),
            np.asarray(jax.device_get(ts.params["W_dec"])),
            np.asarray(jax.device_get(ts.obj_state["toks_since_active"])),
        )

    # Interpret-mode kernels run identical math either way; the only
    # reduction-order difference is the wgrad psum (8 partials vs one pass).
    np.testing.assert_allclose(
        results["dp8"][0], results["single"][0], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        results["dp8"][1], results["single"][1], rtol=1e-4, atol=5e-5
    )
    np.testing.assert_array_equal(results["dp8"][2], results["single"][2])
