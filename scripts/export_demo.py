"""Export a static web demo bundle from a trained run.

Capability mirror of reference scripts/deploy.py + the Elm/Gradio web demos
(reference src/web/): instead of a live Gradio backend, activations for a
sample of images and latents are precomputed into `demo.json`, and the
static app in src/web/semseg renders them interactively in any browser.

Usage:
    python scripts/export_demo.py export --run runs/<id> --shards <dir> \\
        --out ./demo_site
    python -m http.server -d ./demo_site   # then open http://localhost:8000
"""

import base64
import dataclasses
import io
import json
import logging
import pathlib
import shutil
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

logger = logging.getLogger("export_demo")


@dataclasses.dataclass(frozen=True)
class Args:
    run: pathlib.Path = pathlib.Path("./runs/abcdefg")
    shards: pathlib.Path = pathlib.Path("./shards/abcdef01")
    n_images: int = 16
    n_latents: int = 24
    """Most-frequent in-band latents exported."""
    img_scale: float = 1.0
    out: pathlib.Path = pathlib.Path("./demo_site")


def export(args: Args) -> pathlib.Path:
    import scipy.sparse
    from PIL import Image

    import saev_tpu.disk
    from saev_tpu.data import Metadata, datasets, models

    run = saev_tpu.disk.Run(args.run)
    art = run.inference / args.shards.name
    token_acts = scipy.sparse.load_npz(art / "token_acts.npz").tocsr()
    md = Metadata.load(args.shards)
    ctpe = md.content_tokens_per_example
    d_sae = token_acts.shape[1]

    model_cls = models.load_model_cls(md.family)
    model = model_cls(md.ckpt)
    resize_tr = model_cls.make_resize(md.ckpt, ctpe, scale=args.img_scale)
    ds = datasets.get_dataset(md.make_data_cfg(), data_transform=resize_tr)

    n_images = min(args.n_images, md.n_examples)
    # Pick latents by firing frequency over the sampled images.
    sub = token_acts[: n_images * ctpe]
    freq = np.asarray((sub > 0).sum(axis=0)).reshape(-1)
    latents = np.argsort(-freq)[: args.n_latents]
    latents = [int(l) for l in latents if freq[l] > 0]

    patch_size = int(model.patch_size * args.img_scale)
    images, grid_hw = [], None
    for i in range(n_images):
        img = ds[i]["data"]
        if not isinstance(img, Image.Image):
            img = Image.fromarray(np.asarray(img))
        if grid_hw is None:
            grid_hw = (img.height // patch_size, img.width // patch_size)
        buf = io.BytesIO()
        img.convert("RGB").save(buf, format="PNG")
        images.append("data:image/png;base64," + base64.b64encode(buf.getvalue()).decode())

    activations = {}
    for latent in latents:
        col = np.asarray(sub[:, latent].todense()).reshape(n_images, ctpe)
        activations[str(latent)] = [row.round(4).tolist() for row in col]

    args.out.mkdir(parents=True, exist_ok=True)
    template = pathlib.Path(__file__).parent.parent / "src" / "web" / "semseg"
    for fname in ("index.html", "app.js"):
        shutil.copy(template / fname, args.out / fname)
    with open(args.out / "demo.json", "w") as fd:
        json.dump(
            {
                "run_id": run.run_id,
                "grid_h": grid_hw[0],
                "grid_w": grid_hw[1],
                "patch_size": patch_size,
                "images": images,
                "latents": latents,
                "activations": activations,
            },
            fd,
        )
    logger.info(
        "Exported %d images x %d latents to %s.", n_images, len(latents), args.out
    )
    return args.out


if __name__ == "__main__":
    from saev_tpu.utils import cli as cli_mod

    logging.basicConfig(level=logging.INFO)
    cli_mod.run({"export": export})
