"""Standalone Grad-CAM baseline over the JAX ViT zoo.

Capability mirror of reference scripts/gradcam.py (which wraps pytorch_grad_cam
over timm models): a saliency baseline to compare SAE heatmaps against. The
grad-cam family reduces to "gradient-weighted activations at a chosen layer";
with the functional JAX ViT we get the layer activations AND their gradients
from one jax.grad of a scalar score w.r.t. the residual tap.

Methods:
- gradcam: ReLU( mean_d(grad) . act ) per patch
- eigencam: first principal component of the patch-activation matrix
- gradcam++ : alpha-weighted positive gradients

Usage:
    python scripts/gradcam.py run --family dinov2 --ckpt dinov2_vitb14 \\
        --image img.jpg --layer -2 --method gradcam --out cam.png
"""

import dataclasses
import logging
import pathlib
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

logger = logging.getLogger("gradcam")


@dataclasses.dataclass(frozen=True)
class Args:
    family: str = "dinov2"
    ckpt: str = "dinov2_vitb14"
    image_path: pathlib.Path = pathlib.Path("./examples/both.png")
    layer: int = -2
    content_tokens: int = 256
    method: str = "gradcam"
    """gradcam | gradcam++ | eigencam"""
    target: int = -1
    """Output dim to explain; -1 = L2 norm of the pooled output."""
    out: pathlib.Path = pathlib.Path("./cam.png")


def compute_cam(
    acts_nd: np.ndarray, grads_nd: np.ndarray, method: str
) -> np.ndarray:
    """(N_patches,) saliency from patch activations + their gradients."""
    if method == "eigencam":
        centered = acts_nd - acts_nd.mean(axis=0, keepdims=True)
        _, _, vt = np.linalg.svd(centered, full_matrices=False)
        cam = centered @ vt[0]
    elif method == "gradcam++":
        g = grads_nd
        alpha = g**2 / (2 * g**2 + (acts_nd * g**3).sum(axis=0, keepdims=True) + 1e-9)
        weights = (alpha * np.maximum(g, 0)).sum(axis=0)
        cam = acts_nd @ weights
    else:  # gradcam
        weights = grads_nd.mean(axis=0)
        cam = acts_nd @ weights
    cam = np.maximum(cam, 0)
    return cam / max(cam.max(), 1e-9)


def run(args: Args) -> None:
    import jax
    import jax.numpy as jnp

    from saev_tpu import viz
    from saev_tpu.data import models as base
    from saev_tpu.models import vit as vit_mod

    logging.basicConfig(level=logging.INFO)
    model_cls = base.load_model_cls(args.family)
    model = model_cls(args.ckpt)
    img_tr, _ = model_cls.make_transforms(args.ckpt, args.content_tokens)
    img = Image.open(args.image_path)
    tokens = np.asarray(img_tr(img))[None]

    layer = args.layer % model.n_layers
    spec, params = model.spec, model.params
    grid = model.preset.grid if hasattr(model, "preset") else (
        int(np.sqrt(args.content_tokens)),
    ) * 2

    def score_fn(tap):
        # Continue the network from the tap; score the FINAL pooled output so
        # gradients at the tap reflect downstream use (classic Grad-CAM shape).
        out = vit_mod.forward_from(spec, params, tap[:, 0], layer, grid=grid)
        pooled = out[0, 0, :] if spec.cls_token else out[0].mean(axis=0)
        if args.target >= 0:
            return pooled[args.target]
        return jnp.linalg.norm(pooled)

    _, taps = vit_mod.forward(spec, params, jnp.asarray(tokens), (layer,), grid=grid)
    # Grad-CAM needs d(final score)/d(activations at the tap).
    score, tap_grads = jax.value_and_grad(score_fn)(taps)

    n_prefix = spec.n_prefix_tokens
    acts_nd = np.asarray(taps)[0, 0, n_prefix:, :]
    grads_nd = np.asarray(tap_grads)[0, 0, n_prefix:, :]
    cam = compute_cam(acts_nd, grads_nd, args.method)

    disp = model_cls.make_resize(args.ckpt, args.content_tokens)(img.convert("RGB"))
    heat = viz.add_highlights(
        disp, cam.astype(np.float64), model.patch_size, upper=1.0
    )
    heat.save(args.out)
    logger.info("Saved %s (%s, score %.4f)", args.out, args.method, float(score))


if __name__ == "__main__":
    from saev_tpu.utils import cli as cli_mod

    cli_mod.run({"run": run})
