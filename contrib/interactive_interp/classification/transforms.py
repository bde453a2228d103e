"""Image transforms shared by training, figures, and the web app.

Capability mirror of reference contrib/interactive_interp/classification/
transforms.py (:19 for_training, :25 for_figures, :37 for_webapp). The
contract: every surface sees the same object-centric crop — resize so the
shortest side is 512 px, then take the centered 448x448 window — so patch
coordinates computed in one place (e.g. the web app) line up with
activations extracted in another. The reference builds these from
torchvision; here they are PIL + numpy so the demo layer stays torch-free.
"""

import numpy as np
from PIL import Image

SHORT_SIDE = 512
CROP = 448


def for_training(family: str, ckpt: str):
    """The model family's own data transform (what extraction uses)."""
    from saev_tpu.data import models

    data_tr, _ = models.load_model_cls(family).make_transforms(
        ckpt, content_tokens_per_example=196
    )
    return data_tr


def resize_shortest(img: Image.Image, short: int = SHORT_SIDE) -> Image.Image:
    """Resize so min(w, h) == short, preserving aspect ratio (bicubic)."""
    w, h = img.size
    if w > h:
        size = (round(w * short / h), short)
    else:
        size = (short, round(h * short / w))
    return img.resize(size, resample=Image.Resampling.BICUBIC)


def center_crop(img: Image.Image, crop: int = CROP) -> Image.Image:
    w, h = img.size
    left = (w - crop) / 2
    top = (h - crop) / 2
    return img.crop((left, top, left + crop, top + crop))


def for_webapp(img: Image.Image) -> Image.Image:
    """Resize-512 + center-crop-448, returning a PIL image for the browser."""
    return center_crop(resize_shortest(img))


def for_figures(img: Image.Image) -> np.ndarray:
    """Same geometry as the web app, as an (448, 448, 3) uint8 array for
    matplotlib compositing."""
    return np.asarray(for_webapp(img.convert("RGB")))
