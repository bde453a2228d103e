"""Tests for the JAX sparse 1-D logistic probes (mirror of reference
contrib/trait_discovery tests for probe1d: sparse-vs-reference agreement,
loss-matrix sanity, separable-data recovery)."""

import sys
import pathlib

import numpy as np
import pytest
import scipy.sparse

sys.path.insert(
    0, str(pathlib.Path(__file__).parent.parent / "contrib" / "trait_discovery" / "src")
)

from tdiscovery import probe1d


def _make_data(n=512, n_latents=6, n_classes=3, density=0.3, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, n_latents)).astype(np.float32)
    x = np.where(rng.uniform(size=x.shape) < density, np.abs(x), 0.0)
    y = np.zeros((n, n_classes), dtype=np.float32)
    # Class c correlates with latent c firing strongly.
    for c in range(n_classes):
        logits = 2.0 * x[:, c] - 0.5
        y[:, c] = (rng.uniform(size=n) < probe1d.sigmoid(logits)).astype(np.float32)
    return scipy.sparse.csr_matrix(x), y


def test_sparse_matches_reference():
    """Every (latent, class) coefficient from the vectorized JAX solver matches
    the dense per-pair reference implementation."""
    x_sp, y = _make_data(n=256, n_latents=4, n_classes=2, seed=1)
    x = np.asarray(x_sp.todense())

    probe = probe1d.Sparse1DProbe(
        n_latents=4, n_classes=2, class_slab_size=2, max_iter=100
    )
    probe.fit(x_sp, y)

    for latent in range(4):
        for c in range(2):
            ref = probe1d.Reference1DProbe(max_iter=100)
            ref.fit(x[:, latent], y[:, c])
            np.testing.assert_allclose(
                probe.intercept_[latent, c], ref.intercept_, rtol=1e-3, atol=1e-4
            )
            np.testing.assert_allclose(
                probe.coef_[latent, c], ref.coef_, rtol=1e-3, atol=1e-4
            )


def test_recovers_separable_signal():
    rng = np.random.default_rng(2)
    n, n_latents = 1024, 5
    x = np.zeros((n, n_latents), dtype=np.float32)
    fire = rng.uniform(size=n) < 0.4
    x[fire, 0] = rng.uniform(1.0, 2.0, size=fire.sum())
    y = fire.astype(np.float32)[:, None]
    # Noise latents.
    for j in range(1, n_latents):
        mask = rng.uniform(size=n) < 0.3
        x[mask, j] = rng.uniform(0.1, 2.0, size=mask.sum())

    probe = probe1d.Sparse1DProbe(n_latents=n_latents, n_classes=1)
    probe.fit(scipy.sparse.csr_matrix(x), y)

    losses = probe.loss_matrix(scipy.sparse.csr_matrix(x), y)
    assert losses.shape == (n_latents, 1)
    # The informative latent has (much) lower loss than the noise latents.
    assert losses[0, 0] == losses.min()
    assert losses[0, 0] < 0.5 * losses[1:, 0].min()
    # Its coefficient is strongly positive.
    assert probe.coef_[0, 0] > 1.0


def test_loss_matrix_matches_dense_bce():
    x_sp, y = _make_data(n=128, n_latents=3, n_classes=2, seed=3)
    probe = probe1d.Sparse1DProbe(n_latents=3, n_classes=2)
    probe.fit(x_sp, y)
    losses = probe.loss_matrix(x_sp, y)

    x = np.asarray(x_sp.todense(), dtype=np.float64)
    for latent in range(3):
        for c in range(2):
            z = probe.intercept_[latent, c] + probe.coef_[latent, c] * x[:, latent]
            mu = probe1d.sigmoid(z)
            bce = -(y[:, c] * np.log(mu) + (1 - y[:, c]) * np.log(1 - mu)).mean()
            np.testing.assert_allclose(losses[latent, c], bce, rtol=1e-3, atol=1e-5)


def test_empty_latent_gets_base_rate():
    x_sp, y = _make_data(n=128, n_latents=3, n_classes=1, seed=4)
    x = np.asarray(x_sp.todense())
    x[:, 2] = 0.0  # latent 2 never fires
    probe = probe1d.Sparse1DProbe(n_latents=3, n_classes=1)
    probe.fit(scipy.sparse.csr_matrix(x), y)
    pi = np.clip(y.mean(), probe.hp.eps, 1 - probe.hp.eps)
    base = np.log(pi / (1 - pi))
    np.testing.assert_allclose(probe.intercept_[2, 0], base, rtol=1e-5)
    assert probe.coef_[2, 0] == 0.0


def test_predict_proba_shape():
    x_sp, y = _make_data(n=64, n_latents=3, n_classes=2, seed=5)
    probe = probe1d.Sparse1DProbe(n_latents=3, n_classes=2)
    probe.fit(x_sp, y)
    p = probe.predict_proba(x_sp, latent=0)
    assert p.shape == (64, 2)
    assert ((p > 0) & (p < 1)).all()


def test_plan_memory_production_shape_fits_budget():
    """16k latents × 2000 classes × 10^8 events plans under 4 GiB (VERDICT r1
    #7: production-scale memory planning)."""
    plan = probe1d.plan_memory(
        n_latents=16384, n_classes=2000, nnz=100_000_000, n_samples=3_000_000,
        budget_bytes=4 << 30,
    )
    assert plan.total_bytes <= 4 << 30
    assert plan.class_slab_size >= 1
    # Events dominate: 1.2 GB resident.
    assert plan.event_bytes == 12 * 100_000_000


def test_plan_memory_shrinks_slab_under_tight_budget():
    roomy = probe1d.plan_memory(
        n_latents=16384, n_classes=256, nnz=1_000_000, n_samples=100_000,
        budget_bytes=8 << 30,
    )
    tight = probe1d.plan_memory(
        n_latents=16384, n_classes=256, nnz=1_000_000, n_samples=100_000,
        budget_bytes=64 << 20,
    )
    assert tight.class_slab_size < roomy.class_slab_size
    assert tight.total_bytes <= 64 << 20


def test_plan_memory_rejects_oversized_event_stream():
    with pytest.raises(AssertionError, match="Event stream"):
        probe1d.plan_memory(
            n_latents=16, n_classes=4, nnz=10_000_000_000, n_samples=100,
            budget_bytes=1 << 30,
        )


def test_fit_results_invariant_to_slab_size():
    """Slab decomposition must not change the numerics: slab=1 vs slab=all
    agree (classes are independent problems)."""
    x, y = _make_data(n=256, n_latents=5, n_classes=4, seed=3)
    probes = []
    for slab in (1, 4):
        p = probe1d.Sparse1DProbe(
            n_latents=5, n_classes=4, class_slab_size=slab, max_iter=25
        )
        p.fit(x, y)
        probes.append(p)
    np.testing.assert_allclose(
        probes[0].intercept_, probes[1].intercept_, rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(probes[0].coef_, probes[1].coef_, rtol=1e-5, atol=1e-6)
    # Loss paths slab-invariant too.
    l0 = probes[0].loss_matrix(x, y)
    l1 = probes[1].loss_matrix(x, y)
    np.testing.assert_allclose(l0, l1, rtol=1e-5, atol=1e-7)
