"""Run a trained SAE over an image and visualize top latents as heatmaps.

Capability mirror of reference `examples/inference.py` (marimo notebook; load
HF checkpoints :60-75, extract_features :78-110, latent-selection heuristics
:114-155, heatmap plotting :157-210, DINOv2 activation normalization :214-1013)
as a plain runnable script (marimo is not available in this image).

The reference's published DINOv2 SAEs expect activations normalized as
`(acts - mean) / scalar` with constants derived from IN1K activations
(reference :214-988). Pass `--normalize-from <shards-dir>` to compute the same
(per-dim mean vector + global scalar) from a local shard dataset, or omit for
raw activations.

Usage (hermetic demo on the fake backend):
    python examples/inference.py demo --out /tmp/sae_demo

Usage (real checkpoint):
    python examples/inference.py run --sae-ckpt runs/<id>/checkpoint/sae.pt \\
        --family dinov2 --ckpt dinov2_vitb14_reg --layer -2 --image img.jpg
"""

import dataclasses
import logging
import pathlib
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

logger = logging.getLogger("examples.inference")


@dataclasses.dataclass(frozen=True)
class RunConfig:
    sae_ckpt: pathlib.Path = pathlib.Path("./runs/abcdefg/checkpoint/sae.pt")
    """Path to a sae.pt checkpoint (reference schema, any version)."""
    family: str = "dinov2"
    """ViT family."""
    ckpt: str = "dinov2_vitb14_reg"
    """ViT checkpoint name (weights resolved from the local cache)."""
    layer: int = -2
    """Residual layer to read."""
    content_tokens: int = 256
    """Content tokens per image for this model/resolution."""
    image: pathlib.Path = pathlib.Path("./image.jpg")
    """Input image."""
    normalize_from: pathlib.Path | None = None
    """Optional shards dir to derive (mean, scalar) activation normalization."""
    k: int = 5
    """How many latents to visualize."""
    select: str = "filtered"
    """Latent selection heuristic: variance | max | filtered."""
    out: pathlib.Path = pathlib.Path("./sae_viz")
    """Output directory for heatmap PNGs."""


def select_top_latents_by_variance(f_x: np.ndarray, k: int = 5) -> np.ndarray:
    """Latents with the largest spatial variance (reference :114-125)."""
    return np.argsort(-f_x.var(axis=0))[:k]


def select_top_latents_by_max(f_x: np.ndarray, k: int = 5) -> np.ndarray:
    """Latents with the largest max activation (reference :127-134)."""
    return np.argsort(-f_x.max(axis=0))[:k]


def select_top_latents_filtered(
    f_x: np.ndarray,
    k: int = 5,
    min_frac: float = 0.05,
    max_frac: float = 0.5,
    act_threshold: float = 0.1,
) -> np.ndarray:
    """Max-activation latents filtered to a single-image sparsity band
    (reference :136-155): active on 5-50% of patches — localized, not
    uniform and not a single spike."""
    frac_active = (f_x > act_threshold).mean(axis=0)
    in_band = (frac_active >= min_frac) & (frac_active <= max_frac)
    scores = np.where(in_band, f_x.max(axis=0), -np.inf)
    order = np.argsort(-scores)[:k]
    return order[np.isfinite(scores[order])]


def normalization_from_shards(shards_dir: pathlib.Path, layer: int):
    """Derive the (per-dim mean, global scalar) normalization the reference's
    DINOv2 SAEs expect (reference :214-1013: acts' = (acts - mean) / scalar
    with scalar chosen so mean L2 of normalized acts = sqrt(d_model))."""
    from saev_tpu.data import IndexedConfig, IndexedDataset

    ds = IndexedDataset(IndexedConfig(shards=shards_dir, layer=layer))
    n = min(len(ds), 16384)
    rng = np.random.default_rng(0)
    idx = rng.choice(len(ds), size=n, replace=False)
    acts = np.stack([ds[int(i)]["act"] for i in idx]).astype(np.float64)
    mean = acts.mean(axis=0)
    centered = acts - mean
    d = acts.shape[1]
    scalar = float(np.linalg.norm(centered, axis=1).mean() / np.sqrt(d))
    return mean.astype(np.float32), scalar


def extract_features(model, sae_cfg, params, state, img: Image.Image, img_tr, layer, normalize=None):
    """Image → (patch_acts, f_x, x_hat) (reference extract_features :78-110)."""
    import jax.numpy as jnp

    from saev_tpu.data import models as base
    from saev_tpu.nn import modeling

    rec = base.Recorder(model, model_content_tokens(model), cls_token=True, layers=[layer])
    x = img_tr(img)
    batch = np.asarray(x)[None]
    _, acts = rec(batch)
    patch_acts = acts[0, 0, 1:, :]  # strip CLS
    if normalize is not None:
        mean, scalar = normalize
        patch_acts = (patch_acts - mean) / scalar
    out, _ = modeling.forward(sae_cfg, params, state, jnp.asarray(patch_acts))
    return patch_acts, np.asarray(out.f_x), np.asarray(out.x_hats[:, -1, :])


def model_content_tokens(model) -> int:
    # For square grids; flexible-grid models pass content_tokens explicitly.
    return getattr(model, "_content_tokens", None) or 256


def run(cfg: RunConfig) -> None:
    import jax

    from saev_tpu import nn, viz
    from saev_tpu.data import models as base
    from saev_tpu.nn import modeling

    logging.basicConfig(level=logging.INFO)
    model_cls = base.load_model_cls(cfg.family)
    model = model_cls(cfg.ckpt)
    model._content_tokens = cfg.content_tokens
    img_tr, _ = model_cls.make_transforms(cfg.ckpt, cfg.content_tokens)
    sae_cfg, params, state = nn.load(cfg.sae_ckpt)

    normalize = None
    if cfg.normalize_from is not None:
        normalize = normalization_from_shards(cfg.normalize_from, cfg.layer)
        logger.info("Normalizing with scalar %.4f from %s", normalize[1], cfg.normalize_from)

    img = Image.open(cfg.image)
    layer = cfg.layer % model.n_layers
    patch_acts, f_x, x_hat = extract_features(
        model, sae_cfg, params, state, img, img_tr, layer, normalize
    )

    selector = {
        "variance": select_top_latents_by_variance,
        "max": select_top_latents_by_max,
        "filtered": select_top_latents_filtered,
    }[cfg.select]
    latents = selector(f_x, k=cfg.k)
    logger.info("Selected latents: %s", latents.tolist())

    cfg.out.mkdir(parents=True, exist_ok=True)
    resize = model_cls.make_resize(cfg.ckpt, cfg.content_tokens)
    disp = resize(img.convert("RGB"))
    for latent in latents:
        acts_p = f_x[:, int(latent)].astype(np.float64)
        heat = viz.add_highlights(
            disp, acts_p, model.patch_size, upper=max(float(acts_p.max()), 1e-9)
        )
        fpath = cfg.out / f"latent_{int(latent)}.png"
        heat.save(fpath)
        logger.info("Saved %s (max act %.3f)", fpath, acts_p.max())


@dataclasses.dataclass(frozen=True)
class DemoConfig:
    out: pathlib.Path = pathlib.Path("./sae_demo")
    """Output directory."""


def demo(cfg: DemoConfig) -> None:
    """Hermetic end-to-end demo on the fake backend: train a tiny SAE for a few
    steps, then visualize latents on a fake image."""
    import tempfile

    import jax

    from saev_tpu import nn, viz
    from saev_tpu.data import ShuffledConfig, datasets, extract, fake_vit
    from saev_tpu.data import models as base
    from saev_tpu.nn import modeling

    logging.basicConfig(level=logging.INFO)
    tmp = pathlib.Path(tempfile.mkdtemp())
    shards_root = tmp / "saev" / "shards"
    shards_root.mkdir(parents=True)
    shards_dir = extract.worker_fn(
        family="fake-clip", ckpt=fake_vit.CKPT,
        content_tokens_per_example=fake_vit.N_PATCHES, cls_token=True,
        d_model=fake_vit.D_MODEL, layers=[0],
        data=datasets.FakeImg(n_examples=32), batch_size=8, n_workers=2,
        max_tokens_per_shard=4096, shards_root=shards_root, device="cpu",
    )

    sae_cfg = modeling.SparseAutoencoderConfig(
        d_model=fake_vit.D_MODEL, d_sae=64, activation=modeling.TopK(top_k=4)
    )
    params, state = modeling.init(sae_cfg, jax.random.key(0))

    model = base.load_model_cls("fake-clip")(fake_vit.CKPT)
    model._content_tokens = fake_vit.N_PATCHES
    img_tr, _ = model.make_transforms(fake_vit.CKPT, fake_vit.N_PATCHES)
    img = datasets.FakeImgDataset(datasets.FakeImg(n_examples=1))[0]["data"]
    if not isinstance(img, Image.Image):
        img = Image.fromarray(np.asarray(img))

    patch_acts, f_x, _ = extract_features(
        model, sae_cfg, params, state, img, img_tr, 0
    )
    latents = select_top_latents_by_max(f_x, k=3)
    cfg.out.mkdir(parents=True, exist_ok=True)
    disp = model.make_resize(fake_vit.CKPT, fake_vit.N_PATCHES)(img.convert("RGB"))
    for latent in latents:
        acts_p = f_x[:, int(latent)].astype(np.float64)
        heat = viz.add_highlights(
            disp, acts_p, model.patch_size, upper=max(float(acts_p.max()), 1e-9)
        )
        heat.save(cfg.out / f"latent_{int(latent)}.png")
    logger.info("Demo wrote %d heatmaps to %s", len(latents), cfg.out)


if __name__ == "__main__":
    from saev_tpu.utils import cli as cli_mod

    cli_mod.run({"run": run, "demo": demo})
