"""Tests for the TPU top-k threshold primitives (exactness and error-direction
guarantees; on CPU ApproxTopK falls back to exact, so these are deterministic)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from saev_tpu import ops


def _rand(b=64, s=2048, seed=0):
    return np.random.default_rng(seed).normal(size=(b, s)).astype(np.float32)


def _exact_kth(h, k):
    return np.sort(h, axis=-1)[:, ::-1][:, k - 1 : k]


@pytest.mark.parametrize("k", [1, 7, 32, 200])
def test_exact_kth_value(k):
    h = _rand()
    out = np.asarray(ops.exact_kth_value(jnp.asarray(h), k))
    np.testing.assert_array_equal(out, _exact_kth(h, k))


@pytest.mark.parametrize("k,chunk", [(32, 256), (32, 128), (7, 64), (512, 1024)])
def test_hier_kth_value_exact(k, chunk):
    h = _rand(b=32, s=8192, seed=1)
    out = np.asarray(ops.hier_kth_value(jnp.asarray(h), k, chunk=chunk))
    np.testing.assert_array_equal(out, _exact_kth(h, k))


def test_hier_kth_value_nondivisible_chunk():
    h = _rand(b=8, s=5000, seed=2)  # 5000 not divisible by 256
    out = np.asarray(ops.hier_kth_value(jnp.asarray(h), 32, chunk=256))
    np.testing.assert_array_equal(out, _exact_kth(h, 32))


@pytest.mark.parametrize("k", [32, 512])
def test_two_stage_never_exceeds_exact(k):
    """The two-stage threshold is <= the true k-th value (mask keeps >= k)."""
    h = _rand(b=32, s=4096, seed=3)
    out = np.asarray(ops.two_stage_kth_value(jnp.asarray(h), k))
    exact = _exact_kth(h, k)
    assert (out <= exact).all()
    # On CPU the fallback is exact.
    np.testing.assert_array_equal(out, exact)


def test_approx_kth_value_bound():
    h = _rand(b=16, s=4096, seed=4)
    out = np.asarray(ops.approx_kth_value(jnp.asarray(h), 64))
    assert (out <= _exact_kth(h, 64)).all()


def test_batch_global_kth_value():
    h = _rand(b=32, s=512, seed=5)
    k_total = 32 * 16
    got = float(ops.batch_global_kth_value(jnp.asarray(h), k_total))
    exact = float(np.sort(h.ravel())[::-1][k_total - 1])
    # Fast path is <= exact; on CPU (exact fallback candidates) it matches
    # unless one row holds > 4*16 of the global winners.
    assert got <= exact or np.isclose(got, exact)
    exact_mode = float(
        ops.batch_global_kth_value(jnp.asarray(h), k_total, exact=True)
    )
    assert exact_mode == exact


def test_batch_global_concentrated_row():
    """When one row holds all winners, the fast threshold errs low (keeps more)."""
    h = np.full((16, 256), -1.0, dtype=np.float32)
    h[3] = np.linspace(10, 20, 256)
    got = float(ops.batch_global_kth_value(jnp.asarray(h), 64))
    exact = float(np.sort(h.ravel())[::-1][63])
    assert got <= exact


def test_topk_activation_fast_keeps_at_least_k():
    from saev_tpu.nn import modeling

    h = jnp.asarray(_rand(b=16, s=512, seed=6))
    f = modeling.topk_activation(h, 8, fast=True)
    nnz = np.count_nonzero(np.asarray(f), axis=1)
    assert (nnz >= 8).all()
    # CPU: exact fallback -> exactly k.
    assert (nnz == 8).all()


def test_grad_does_not_flow_through_threshold():
    from saev_tpu.nn import modeling

    h = jnp.asarray(_rand(b=4, s=64, seed=7))

    def loss(h):
        return jnp.sum(modeling.topk_activation(h, 4, fast=True))

    g = np.asarray(jax.grad(loss)(h))
    # Gradient is exactly the selection mask.
    f = np.asarray(modeling.topk_activation(h, 4, fast=True))
    np.testing.assert_array_equal(g, (f != 0).astype(np.float32))


def test_sampled_kth_value_statistics():
    h = _rand(b=64, s=8192, seed=8)
    out = np.asarray(ops.sampled_kth_value(jnp.asarray(h), 256, n_sample=2048))
    kept = (h >= out).sum(axis=1)
    # Statistical estimate: within ~25% of the target count on Gaussian rows.
    assert abs(kept.mean() - 256) < 64, kept.mean()
    # Small arrays take the exact path.
    h_small = _rand(b=8, s=512, seed=9)
    out = np.asarray(ops.sampled_kth_value(jnp.asarray(h_small), 32))
    np.testing.assert_array_equal(out, _exact_kth(h_small, 32))


def test_sampled_kth_value_few_finite_rows():
    """Rows with fewer finite entries than the sampled rank threshold at -inf
    (AuxK keeps all dead latents when n_dead < k_aux)."""
    h = np.full((4, 8192), -np.inf, dtype=np.float32)
    h[:, :10] = 1.0  # only 10 finite entries
    out = np.asarray(ops.sampled_kth_value(jnp.asarray(h), 512, n_sample=2048))
    assert np.isneginf(out).all()


# ---------------------------------------------------------------------------
# Pallas bisection kernel: property tests in interpret mode (CPU) against
# numpy order statistics, incl. ties, +-inf, subnormals, negatives.
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

from saev_tpu.ops import pallas_topk


@st.composite
def adversarial_rows(draw):
    s = draw(st.sampled_from([8, 64, 257]))
    kind = draw(st.sampled_from(["gauss", "ties", "mixed", "inf"]))
    seed = draw(st.integers(0, 2**31 - 1))
    rows = pallas_topk.TILE_ROWS
    rng = np.random.default_rng(seed)
    if kind == "gauss":
        h = rng.normal(size=(rows, s))
    elif kind == "ties":
        h = rng.integers(-3, 3, size=(rows, s)).astype(np.float64)
    elif kind == "mixed":
        h = rng.choice(
            [0.0, -0.0, 1e-40, -1e-40, 1.0, -1.0, 3.14], size=(rows, s)
        )
    else:
        h = rng.normal(size=(rows, s))
        h[rng.random(size=h.shape) < 0.2] = -np.inf
        h[rng.random(size=h.shape) < 0.05] = np.inf
    k = draw(st.integers(1, s))
    return h.astype(np.float32), k


@given(adversarial_rows())
@settings(max_examples=40, deadline=None)
def test_pallas_kth_matches_numpy(case):
    h, k = case
    got = np.asarray(
        pallas_topk.exact_kth_value_pallas(jnp.asarray(h), k, True)
    ).reshape(-1)
    want = np.sort(h, axis=-1)[:, ::-1][:, k - 1]
    np.testing.assert_array_equal(got, want)


def test_pallas_kth_row_padding():
    """Non-multiple-of-tile row counts go through kth_value's padding path."""
    h = np.random.default_rng(0).normal(size=(13, 128)).astype(np.float32)
    # kth_value dispatches to lax.top_k off-TPU; call the padded kernel
    # directly in interpret mode instead.
    pad = (-13) % pallas_topk.TILE_ROWS
    h_padded = np.pad(h, ((0, pad), (0, 0)))
    got = np.asarray(
        pallas_topk.exact_kth_value_pallas(jnp.asarray(h_padded), 5, True)
    )[:13].reshape(-1)
    want = np.sort(h, axis=-1)[:, ::-1][:, 4]
    np.testing.assert_array_equal(got, want)


def test_masked_kth_interpret_matches_materialized():
    """Mask-aware kernel vs kth over the materialized -inf-masked tensor:
    bit-identical, incl. rows where fewer than k columns are unmasked
    (threshold -inf) and an all-masked mask (threshold -inf)."""
    import jax.numpy as jnp

    from saev_tpu.ops import pallas_topk

    rng = np.random.default_rng(0)
    b, s, k = 64, 512, 16
    h = rng.normal(size=(b, s)).astype(np.float32)

    for mask in (
        rng.random(s) < 0.5,          # plenty of unmasked columns
        np.arange(s) < k - 3,         # fewer than k unmasked -> -inf
        np.zeros(s, dtype=bool),      # all masked -> -inf
    ):
        got = pallas_topk.exact_kth_value_masked_pallas(
            jnp.asarray(h), jnp.asarray(mask[None, :], jnp.int32), k,
            True,
        )
        masked = np.where(mask[None, :], h, -np.inf)
        want = np.sort(masked, axis=1)[:, ::-1][:, k - 1 : k]
        np.testing.assert_array_equal(np.asarray(got), want)


def test_masked_kth_cpu_fallback():
    from saev_tpu import ops

    rng = np.random.default_rng(1)
    h = rng.normal(size=(8, 64)).astype(np.float32)
    mask = rng.random(64) < 0.3
    got = np.asarray(ops.exact_kth_value_masked(jnp.asarray(h), jnp.asarray(mask), 4))
    masked = np.where(mask[None, :], h, -np.inf)
    want = np.sort(masked, axis=1)[:, ::-1][:, 3:4]
    np.testing.assert_array_equal(got, want)




# ---------------------------------------------------------------------------
# topk_stats: the fused TopK-epilogue kernel (round 5)
# ---------------------------------------------------------------------------


def test_topk_stats_kernel_interpret_matches_xla_composition():
    """The Pallas stats kernel (kth + f_bf16 + liveness + L0/L1 in one pass)
    must match the separate XLA formulations it replaces — exactly, except L1
    which may differ in f32 reduction order."""
    from saev_tpu.ops import topk as tk

    rng = np.random.default_rng(0)
    b, s, k = 64, 512, 32
    h = rng.normal(size=(b, s)).astype(np.float32)
    h[:, :5] = 0.0  # exact zeros exercise the l0 "f != 0" semantics
    h[3] = -np.abs(h[3])  # an all-negative row puts kth < 0
    hj = jnp.asarray(h)

    kth, f, live_p, l0, l1 = pallas_topk.topk_stats_pallas(hj, k, 32, True)
    ref = tk._topk_stats_xla(hj, k)
    np.testing.assert_array_equal(np.asarray(kth), np.asarray(ref.kth))
    np.testing.assert_array_equal(np.asarray(f), np.asarray(ref.f))
    np.testing.assert_array_equal(
        np.asarray(live_p).sum(axis=0) > 0, np.asarray(ref.live)
    )
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(ref.l0))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(ref.l1), rtol=1e-6)


def test_topk_stats_grad_matches_composition():
    """The custom VJP (dh = (t_f + t_l1 sign(h)) * mask) must equal autodiff
    through the explicit where/abs composition."""
    from saev_tpu import ops

    rng = np.random.default_rng(1)
    b, s, k = 16, 128, 8
    h = jnp.asarray(rng.normal(size=(b, s)).astype(np.float32))

    def loss_stats(hh):
        st = ops.topk_stats(hh, k)
        return (st.f.astype(jnp.float32) ** 2).sum() * 0.5 + 3.0 * st.l1.mean()

    def loss_ref(hh):
        kth = jax.lax.stop_gradient(ops.exact_kth_value(hh, k))
        ff = jnp.where(hh >= kth, hh, 0.0)
        fb = ff.astype(jnp.bfloat16)
        l1 = jnp.abs(ff).sum(axis=1, keepdims=True)
        return (fb.astype(jnp.float32) ** 2).sum() * 0.5 + 3.0 * l1.mean()

    g1 = jax.grad(loss_stats)(h)
    g2 = jax.grad(loss_ref)(h)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_topk_stats_row_padding():
    """Row counts that need TILE_ROWS padding slice back exactly."""
    from saev_tpu import ops

    rng = np.random.default_rng(2)
    h = jnp.asarray(rng.normal(size=(13, 256)).astype(np.float32))
    st = ops.topk_stats(h, 16)
    ref = ops.topk.__dict__["_topk_stats_xla"](h, 16)
    np.testing.assert_array_equal(np.asarray(st.kth), np.asarray(ref.kth))
    np.testing.assert_array_equal(np.asarray(st.f), np.asarray(ref.f))
    np.testing.assert_array_equal(np.asarray(st.live), np.asarray(ref.live))
    np.testing.assert_array_equal(np.asarray(st.l0), np.asarray(ref.l0))
    np.testing.assert_allclose(np.asarray(st.l1), np.asarray(ref.l1), rtol=1e-6)
