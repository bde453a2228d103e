"""Patch-heatmap overlays and color utilities (mirror of reference src/saev/viz.py)."""

import colorsys
import pathlib
import re

import numpy as np
from PIL import Image, ImageDraw

try:
    import matplotlib

    colormap = matplotlib.colormaps.get_cmap("plasma")
except ImportError:  # pragma: no cover - matplotlib is present in this image
    colormap = None


def add_highlights(
    img: Image.Image,
    patches: np.ndarray,
    patch_size: int,
    *,
    upper: float | None = None,
    opacity: float = 0.9,
) -> Image.Image:
    """Overlay per-patch activation heat (plasma colormap, alpha ∝ activation)
    onto a PIL image (reference viz.py:14-50)."""
    if not len(patches):
        return img
    assert upper is not None
    iw_px, ih_px = img.size
    assert ih_px % patch_size == 0
    assert iw_px % patch_size == 0
    ih_np, iw_np = ih_px // patch_size, iw_px // patch_size
    assert iw_np * ih_np == len(patches)

    overlay = Image.new("RGBA", img.size, (0, 0, 0, 0))
    draw = ImageDraw.Draw(overlay)

    patches = np.asarray(patches, dtype=np.float64)
    colors = (colormap(patches / (upper + 1e-9))[:, :3] * 255).astype(np.uint8)

    for p, (val, color) in enumerate(zip(patches, colors)):
        val /= upper + 1e-9
        x_np, y_np = p % iw_np, p // iw_np
        draw.rectangle(
            [
                (x_np * patch_size, y_np * patch_size),
                (x_np * patch_size + patch_size, y_np * patch_size + patch_size),
            ],
            fill=(*color, int(opacity * val * 255)),
        )

    return Image.alpha_composite(img.convert("RGBA"), overlay)


HEX_RE = re.compile(r"^#([0-9a-fA-F]{6})$")
RGB_RE = re.compile(r"^rgb\s*\((.+)\)$", re.IGNORECASE)


def parse_color(line: str) -> tuple[float, float, float]:
    """Parse '#rrggbb' or 'rgb(r, g, b)' (0-1 or 0-255) into float RGB
    (reference viz.py:58-93)."""
    msg = f"Invalid color: '{line}'"
    stripped = line.strip()
    assert stripped, msg

    hex_match = HEX_RE.match(stripped)
    if hex_match is not None:
        hex_val = hex_match.group(1)
        color = tuple(int(hex_val[i : i + 2], 16) / 255.0 for i in range(0, 6, 2))
    else:
        rgb_match = RGB_RE.match(stripped)
        assert rgb_match is not None, msg
        channels = tuple(
            float(part.strip())
            for part in rgb_match.group(1).split(",")
            if part.strip()
        )
        assert len(channels) == 3, msg
        max_chan, min_chan = max(channels), min(channels)
        assert min_chan >= 0.0, msg
        if max_chan <= 1.0:
            color = channels
        else:
            assert max_chan <= 255.0, msg
            color = tuple(chan / 255.0 for chan in channels)

    msg = f"Invalid color: {color}"
    assert all(0 <= chan <= 1 for chan in color), msg
    return tuple(float(chan) for chan in color)


def _distinct_colors(n: int, seed: list[tuple[float, float, float]]) -> list:
    """Perceptually-spread fill colors; replaces the reference's glasbey
    dependency (viz.py:96-129) with golden-ratio hue stepping away from the
    seed palette."""
    out = []
    h = 0.11
    golden = 0.6180339887498949
    for i in range(n):
        h = (h + golden) % 1.0
        s = 0.65 if i % 2 == 0 else 0.85
        v = 0.85 if i % 3 else 0.6
        out.append(colorsys.hsv_to_rgb(h, s, v))
    return out


def load_palette(path: pathlib.Path) -> list[tuple[float, float, float]]:
    """Load a palette file (one color per line); blank lines are filled with
    generated distinct colors (reference viz.py:96-129)."""
    palette: list[tuple[float, float, float] | None] = []
    for line in path.read_text().split("\n"):
        line = line.strip()
        if not line:
            palette.append(None)
            continue
        palette.append(parse_color(line))

    n_missing = sum(color is None for color in palette)
    if n_missing:
        seed_palette = [color for color in palette if color is not None]
        fill_iter = iter(_distinct_colors(n_missing, seed_palette))
        for i, color in enumerate(palette):
            if color is None:
                palette[i] = tuple(float(c) for c in next(fill_iter))

    for i, color in enumerate(palette):
        assert color is not None
        msg = f"Color {i} is invalid: {color}"
        assert all(0 <= chan <= 1 and isinstance(chan, float) for chan in color), msg

    return palette  # type: ignore[return-value]
