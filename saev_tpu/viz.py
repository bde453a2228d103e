"""Patch-heatmap overlays and color utilities.

Capability mirror of reference src/saev/viz.py (same public surface:
`add_highlights`, `parse_color`, `load_palette`), implemented as vectorized
numpy compositing rather than per-patch PIL draws.
"""

import colorsys
import pathlib

import numpy as np
from PIL import Image

try:
    import matplotlib

    colormap = matplotlib.colormaps.get_cmap("plasma")
except ImportError:  # pragma: no cover - matplotlib is present in this image
    colormap = None

_HEX_DIGITS = frozenset("0123456789abcdefABCDEF")


def add_highlights(
    img: Image.Image,
    patches: np.ndarray,
    patch_size: int,
    *,
    upper: float | None = None,
    opacity: float = 0.9,
) -> Image.Image:
    """Overlay per-patch activation heat (plasma colormap, alpha ∝ activation)
    onto a PIL image (same semantics as reference viz.py:14-50).

    One vectorized source-over composite: the (grid_h, grid_w) activation map
    expands to per-pixel color/alpha planes with `np.repeat`, then blends into
    the image in a single numpy expression — no per-patch draw loop.
    """
    if not len(patches):
        return img
    assert upper is not None
    w_px, h_px = img.size
    assert h_px % patch_size == 0
    assert w_px % patch_size == 0
    grid_h, grid_w = h_px // patch_size, w_px // patch_size
    assert grid_h * grid_w == len(patches)

    # Normalized activation per patch, expanded to per-pixel planes. Clamp to
    # [0, 1] BEFORE quantizing: PIL's draw path saturates out-of-range alpha,
    # while a raw uint8 cast would wrap modulo 256 (values above `upper` would
    # render nearly transparent, negatives would render hot).
    t = np.clip(np.asarray(patches, dtype=np.float64) / (upper + 1e-9), 0.0, 1.0)
    rgb_u8 = (colormap(t)[:, :3] * 255).astype(np.uint8).astype(np.float64)
    alpha = np.clip(opacity * t * 255, 0, 255).astype(np.uint8).astype(np.float64) / 255.0

    def expand(plane):  # (N, ...) patch values -> (H, W, ...) pixel values
        plane = plane.reshape(grid_h, grid_w, *plane.shape[1:])
        return plane.repeat(patch_size, axis=0).repeat(patch_size, axis=1)

    src_rgb = expand(rgb_u8)  # (H, W, 3)
    src_a = expand(alpha)[..., None]  # (H, W, 1)

    # Proper source-over (matches Image.alpha_composite for any base alpha):
    # out_a = src_a + dst_a*(1-src_a); out_rgb premultiplied then unmultiplied.
    base = np.asarray(img.convert("RGBA"), dtype=np.float64)
    dst_a = base[..., 3:4] / 255.0
    out_a = src_a + dst_a * (1.0 - src_a)
    out = np.empty_like(base)
    num = src_rgb * src_a + base[..., :3] * dst_a * (1.0 - src_a)
    out[..., :3] = np.divide(
        num, out_a, out=np.zeros_like(num), where=out_a > 0
    )
    out[..., 3] = out_a[..., 0] * 255.0
    return Image.fromarray(out.round().astype(np.uint8), "RGBA")


def parse_color(line: str) -> tuple[float, float, float]:
    """Parse '#rrggbb' or 'rgb(r, g, b)' (0-1 or 0-255 channels) into a float
    RGB triple in [0, 1]. Raises AssertionError on anything else."""
    text = line.strip()
    assert text, f"Invalid color: '{line}'"

    if text.startswith("#"):
        body = text[1:]
        assert len(body) == 6 and set(body) <= _HEX_DIGITS, f"Invalid color: '{line}'"
        return tuple(int(body[i : i + 2], 16) / 255.0 for i in (0, 2, 4))

    lowered = text.lower()
    assert lowered.startswith("rgb") and text.endswith(")"), f"Invalid color: '{line}'"
    inner = text[text.index("(") + 1 : -1] if "(" in text else ""
    assert lowered[3:].lstrip().startswith("("), f"Invalid color: '{line}'"
    try:
        channels = tuple(float(p) for p in inner.split(",") if p.strip())
    except ValueError:
        raise AssertionError(f"Invalid color: '{line}'") from None
    assert len(channels) == 3, f"Invalid color: '{line}'"
    assert min(channels) >= 0.0, f"Invalid color: '{line}'"
    # Heuristic from the reference: all-small values are 0-1 floats, anything
    # bigger is 0-255 byte channels.
    if max(channels) > 1.0:
        assert max(channels) <= 255.0, f"Invalid color: '{line}'"
        channels = tuple(c / 255.0 for c in channels)
    return tuple(float(c) for c in channels)


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
