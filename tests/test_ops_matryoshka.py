"""Interpret-mode tests for the Pallas grouped Matryoshka kernels
(ops/pallas_matryoshka.py) against dense numpy references. The fused
custom-VJP op itself is covered by tests/test_nn_objectives.py
(test_fused_training_matches_decode, XLA path) and the reference-parity
suite; these pin the kernel algebra including the folded sub-group
remainder terms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from saev_tpu.ops import pallas_matryoshka as pk

B, S, D, G = 128, 2048, 128, 512  # 4 groups
J = 4


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    f = rng.normal(size=(B, S)).astype(np.float32)
    w = (rng.normal(size=(S, D)) / 32).astype(np.float32)
    e = rng.normal(size=(J, B, D)).astype(np.float32)
    da = rng.normal(size=(S // G, B, D)).astype(np.float32)
    p = np.asarray([300, 512, 1100, S], np.int32)  # mid-group, boundary, mid, full
    return f, w, e, da, p


def _cast(x):
    return jnp.asarray(x, jnp.bfloat16)


def test_grouped_prefix_base(data):
    f, w, _, _, p = data
    m, r = p // G, p % G
    base, xhat = pk.grouped_prefix_base(
        _cast(f), _cast(w), jnp.asarray(m), jnp.asarray(r),
        group_size=G, block_rows=64, interpret=True,
    )
    f32 = np.asarray(_cast(f), np.float32)
    w32 = np.asarray(_cast(w), np.float32)
    for j, pj in enumerate(p):
        ref = f32[:, :pj] @ w32[:pj]
        np.testing.assert_allclose(np.asarray(base)[j], ref, rtol=2e-2, atol=1e-3)
    np.testing.assert_allclose(np.asarray(xhat), f32 @ w32, rtol=2e-2, atol=1e-3)


def test_grouped_matmul_dgrad(data):
    f, w, e, da, p = data
    m, r = p // G, p % G
    scale = 0.37
    df = pk.grouped_matmul_dgrad(
        _cast(da), _cast(w), _cast(e), jnp.asarray(m), jnp.asarray(r),
        jnp.asarray(scale), group_size=G, block_rows=64, interpret=True,
    )
    w32 = np.asarray(_cast(w), np.float32)
    da32 = np.asarray(_cast(da), np.float32)
    e32 = np.asarray(_cast(e), np.float32)
    ref = np.zeros((B, S), np.float32)
    for gi in range(S // G):
        ref[:, gi * G : (gi + 1) * G] = da32[gi] @ w32[gi * G : (gi + 1) * G].T
    for j, pj in enumerate(p):
        mj, rj = pj // G, pj % G
        if rj == 0:
            continue
        block = (e32[j] @ w32[mj * G : (mj + 1) * G].T) * scale
        block[:, rj:] = 0.0
        ref[:, mj * G : (mj + 1) * G] += block
    np.testing.assert_allclose(np.asarray(df), ref, rtol=3e-2, atol=2e-2)


def test_grouped_matmul_wgrad(data):
    f, w, e, da, p = data
    m, r = p // G, p % G
    scale = 0.21
    dw = pk.grouped_matmul_wgrad(
        _cast(f), _cast(da), _cast(e), jnp.asarray(m), jnp.asarray(r),
        jnp.asarray(scale), group_size=G, block_rows=64, interpret=True,
    )
    f32 = np.asarray(_cast(f), np.float32)
    da32 = np.asarray(_cast(da), np.float32)
    e32 = np.asarray(_cast(e), np.float32)
    ref = np.zeros((S, D), np.float32)
    for gi in range(S // G):
        ref[gi * G : (gi + 1) * G] = f32[:, gi * G : (gi + 1) * G].T @ da32[gi]
    for j, pj in enumerate(p):
        mj, rj = pj // G, pj % G
        if rj == 0:
            continue
        fm = f32[:, mj * G : (mj + 1) * G].copy()
        fm[:, rj:] = 0.0
        ref[mj * G : (mj + 1) * G] += (fm.T @ e32[j]) * scale
    np.testing.assert_allclose(np.asarray(dw), ref, rtol=3e-2, atol=2e-2)


def test_two_prefixes_same_group():
    """Two cuts inside one group must each snapshot their own masked
    remainder (the snap scratch is reused within a grid step)."""
    rng = np.random.default_rng(3)
    f = rng.normal(size=(64, 1024)).astype(np.float32)
    w = (rng.normal(size=(1024, 128)) / 32).astype(np.float32)
    p = np.asarray([100, 200, 1024], np.int32)  # two cuts in group 0 (G=512)
    m, r = p // 512, p % 512
    base, _ = pk.grouped_prefix_base(
        _cast(f), _cast(w), jnp.asarray(m), jnp.asarray(r),
        group_size=512, block_rows=64, interpret=True,
    )
    f32 = np.asarray(_cast(f), np.float32)
    w32 = np.asarray(_cast(w), np.float32)
    for j, pj in enumerate(p):
        np.testing.assert_allclose(
            np.asarray(base)[j], f32[:, :pj] @ w32[:pj], rtol=2e-2, atol=1e-3
        )
