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
    # Batch-major (B, G, D): the layout the backward's dA einsum
    # materializes natively (see ops/matryoshka.py::_bwd).
    da = rng.normal(size=(B, S // G, D)).astype(np.float32)
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


def test_grouped_prefix_err(data):
    """The fused-error variant: E_j = bf16(base_j + b_dec - x), xhat, and the
    per-row-tile scale-stabilized squared-error partials, against the same
    dense reference algebra."""
    f, w, _, _, p = data
    rng = np.random.default_rng(7)
    x = rng.normal(size=(B, D)).astype(np.float32)
    b_dec = (rng.normal(size=(D,)) * 0.1).astype(np.float32)
    upper = max(float(np.max(np.abs(x))), 1e-12)
    m, r = p // G, p % G
    bm = 64
    e, xhat, loss_p = pk.grouped_prefix_err(
        _cast(f), _cast(w), jnp.asarray(x), jnp.asarray(b_dec),
        jnp.asarray(1.0 / upper, jnp.float32),
        jnp.asarray(m), jnp.asarray(r),
        group_size=G, block_rows=bm, interpret=True,
    )
    assert e.dtype == jnp.bfloat16 and loss_p.shape == (8 * (B // bm), 128)
    f32 = np.asarray(_cast(f), np.float32)
    w32 = np.asarray(_cast(w), np.float32)
    e_ref = np.stack([
        (f32[:, :pj] @ w32[:pj] + b_dec - x) for pj in p
    ])
    np.testing.assert_allclose(
        np.asarray(e, np.float32), e_ref, rtol=2e-2, atol=2e-3
    )
    np.testing.assert_allclose(np.asarray(xhat), f32 @ w32, rtol=2e-2, atol=1e-3)
    # Loss partials: per-tile sums of (bf16(e)/upper)^2 at [::8, 0].
    e_bf = np.asarray(e, np.float32)  # the bf16-rounded values
    total = float(((e_bf / upper) ** 2).sum())
    got = float(np.asarray(loss_p)[::8, 0].sum())
    np.testing.assert_allclose(got, total, rtol=1e-4)
    # Per-tile partial j: rows [i*bm:(i+1)*bm] across all prefixes.
    for i in range(B // bm):
        want_i = ((e_bf[:, i * bm:(i + 1) * bm] / upper) ** 2).sum()
        np.testing.assert_allclose(
            float(np.asarray(loss_p)[8 * i, 0]), want_i, rtol=1e-4
        )


def test_grouped_matmul_dgrad(data):
    f, w, e, da_unused, p = data
    m, r = p // G, p % G
    scale = 0.37
    df, da = pk.grouped_matmul_dgrad(
        _cast(w), _cast(e), jnp.asarray(m), jnp.asarray(r),
        jnp.asarray(scale), group_size=G, block_rows=64, interpret=True,
    )
    w32 = np.asarray(_cast(w), np.float32)
    e32 = np.asarray(_cast(e), np.float32)
    # dA_G = scale * sum_j [G < m_j] E_j, built in-kernel (descending-G
    # suffix) and emitted batch-major (B, G, D) for the wgrad kernel.
    da_ref = np.zeros((B, S // G, D), np.float32)
    for gi in range(S // G):
        for j, pj in enumerate(p):
            if gi < pj // G:
                da_ref[:, gi] += e32[j] * scale
    np.testing.assert_allclose(
        np.asarray(da, np.float32), da_ref, rtol=3e-2, atol=2e-2
    )
    da32 = np.asarray(jnp.asarray(da), np.float32)
    ref = np.zeros((B, S), np.float32)
    for gi in range(S // G):
        ref[:, gi * G : (gi + 1) * G] = da32[:, gi] @ w32[gi * G : (gi + 1) * G].T
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
        ref[gi * G : (gi + 1) * G] = f32[:, gi * G : (gi + 1) * G].T @ da32[:, gi]
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


@pytest.mark.parametrize(
    "b,s,d,j,g",
    [
        (16, 64, 8, 3, 1024),    # d_sae < group -> g = d_sae
        (32, 2048, 16, 5, 1024),
        (8, 1024, 32, 1, 512),   # single prefix
        (24, 3072, 8, 4, 1024),  # d_sae = 3 groups
    ],
)
def test_prefix_mse_matches_decode_across_shapes(b, s, d, j, g):
    """The fused op's XLA path (the same algebra the Pallas kernels implement)
    must match autodiff-through-decode for loss AND gradients across layouts:
    sub-group cuts, boundary cuts, single-group d_sae, single prefix."""
    import jax

    from saev_tpu.nn import modeling
    from saev_tpu.ops import matryoshka as fused

    rng = np.random.default_rng(b + s + j)
    w = jnp.asarray(rng.normal(size=(s, d)) / np.sqrt(s), jnp.float32)
    b_dec = jnp.asarray(rng.normal(size=(d,)) * 0.1, jnp.float32)
    f = jnp.asarray(
        rng.normal(size=(b, s)) * (rng.random((b, s)) < 0.1), jnp.float32
    )
    x = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
    if j == 1:
        p = np.array([s], np.int32)
    else:
        p = np.sort(rng.choice(np.arange(1, s), size=j - 1, replace=False))
        p = np.concatenate([p, [s]]).astype(np.int32)
    pj = jnp.asarray(p)

    cfg = modeling.SparseAutoencoderConfig(
        d_model=d, d_sae=s, activation=modeling.Relu()
    )

    def fused_loss(w_, b_, f_):
        loss, _ = fused.prefix_mse(w_, b_, f_, x, pj, g, None)
        return loss

    def decode_loss(w_, b_, f_):
        params = {"W_dec": w_, "b_dec": b_, "W_enc": w_.T, "b_enc": jnp.zeros(s)}
        xh = modeling.decode(cfg, params, f_, pj)
        from saev_tpu.nn.objectives import scale_stabilized_mse

        return scale_stabilized_mse(
            xh, jnp.broadcast_to(x[:, None, :], xh.shape)
        ).mean()

    lf, gf = jax.value_and_grad(fused_loss, argnums=(0, 1, 2))(w, b_dec, f)
    ld, gd = jax.value_and_grad(decode_loss, argnums=(0, 1, 2))(w, b_dec, f)
    np.testing.assert_allclose(float(lf), float(ld), rtol=1e-5)
    for a, bb in zip(gf, gd):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=1e-4, atol=1e-6
        )
