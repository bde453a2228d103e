"""Grad-CAM baseline tests: saliency math + forward_from consistency."""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "scripts"))

import gradcam  # noqa: E402
from saev_tpu.models import vit  # noqa: E402


def test_compute_cam_methods():
    rng = np.random.default_rng(0)
    acts = rng.normal(size=(16, 8)).astype(np.float64)
    grads = rng.normal(size=(16, 8)).astype(np.float64)
    for method in ("gradcam", "gradcam++", "eigencam"):
        cam = gradcam.compute_cam(acts, grads, method)
        assert cam.shape == (16,)
        assert (cam >= 0).all() and cam.max() <= 1.0 + 1e-9


def test_forward_from_matches_full_forward():
    """Running blocks [l+1:] from the layer-l tap reproduces the full output."""
    import jax
    import jax.numpy as jnp

    spec = vit.Spec(d_model=32, n_layers=3, n_heads=4, patch_size=4, pos_kind="learned")
    n_patches = 16
    params = vit.init(spec, jax.random.key(0), n_pos=n_patches + 1)
    tokens = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, n_patches, 48)).astype(np.float32)
    )
    out_full, taps = vit.forward(spec, params, tokens, (1,), grid=(4, 4))
    out_resumed = vit.forward_from(spec, params, taps[:, 0], 1, grid=(4, 4))
    np.testing.assert_allclose(
        np.asarray(out_resumed), np.asarray(out_full), rtol=1e-5, atol=1e-6
    )


def test_gradcam_gradients_flow_through_tail():
    """d(final score)/d(tap) is nonzero on patch tokens (the thing gradcam needs)."""
    import jax
    import jax.numpy as jnp

    spec = vit.Spec(d_model=32, n_layers=3, n_heads=4, patch_size=4, pos_kind="learned")
    n_patches = 16
    params = vit.init(spec, jax.random.key(2), n_pos=n_patches + 1)
    tokens = jnp.asarray(
        np.random.default_rng(3).normal(size=(1, n_patches, 48)).astype(np.float32)
    )
    _, taps = vit.forward(spec, params, tokens, (0,), grid=(4, 4))

    def score(tap):
        out = vit.forward_from(spec, params, tap[:, 0], 0, grid=(4, 4))
        return jnp.linalg.norm(out[0, 0])  # CLS of the FINAL layer

    g = np.asarray(jax.grad(score)(taps))
    patch_grads = g[0, 0, 1:, :]
    assert np.abs(patch_grads).max() > 0  # attention mixes patches into CLS
