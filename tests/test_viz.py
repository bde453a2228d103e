"""Viz tests (mirror of reference tests/test_viz.py color parsing coverage)."""

import numpy as np
import pytest
from PIL import Image

from saev_tpu import viz


def test_add_highlights_shapes():
    img = Image.new("RGB", (32, 32), (255, 255, 255))
    patches = np.linspace(0, 1, 16).astype(np.float64)
    out = viz.add_highlights(img, patches, patch_size=8, upper=1.0)
    assert out.size == (32, 32)
    assert out.mode == "RGBA"
    arr = np.asarray(out)
    # Patch 0 has activation 0 -> untouched white; last patch is colored.
    assert (arr[0, 0, :3] == 255).all()
    assert not (arr[-1, -1, :3] == 255).all()


def test_add_highlights_empty():
    img = Image.new("RGB", (16, 16))
    out = viz.add_highlights(img, np.zeros(0), patch_size=8)
    assert out is img


@pytest.mark.parametrize(
    "line,expected",
    [
        ("#ff0000", (1.0, 0.0, 0.0)),
        ("#00ff00", (0.0, 1.0, 0.0)),
        ("rgb(255, 0, 0)", (1.0, 0.0, 0.0)),
        ("rgb(0.5, 0.5, 0.5)", (0.5, 0.5, 0.5)),
        ("  #0000ff  ", (0.0, 0.0, 1.0)),
        ("RGB(128, 64, 32)", (128 / 255, 64 / 255, 32 / 255)),
    ],
)
def test_parse_color_valid(line, expected):
    got = viz.parse_color(line)
    np.testing.assert_allclose(got, expected, atol=1e-9)


@pytest.mark.parametrize(
    "line", ["", "#ff00", "notacolor", "rgb(1,2)", "rgb(-1, 0, 0)", "rgb(300, 0, 0)"]
)
def test_parse_color_invalid(line):
    with pytest.raises(AssertionError):
        viz.parse_color(line)


def test_load_palette_with_gaps(tmp_path):
    f = tmp_path / "palette.txt"
    f.write_text("#ff0000\n\n#0000ff\n")  # 4 lines: color, gap, color, gap
    palette = viz.load_palette(f)
    assert len(palette) == 4
    assert palette[0] == (1.0, 0.0, 0.0)
    assert palette[2] == (0.0, 0.0, 1.0)
    for color in palette:
        assert all(0 <= c <= 1 for c in color)
    # Generated fills are distinct from each other.
    assert palette[1] != palette[3]


def test_colors_module():
    from saev_tpu import colors

    assert len(colors.ALL_HEX) == 10
    assert len(colors.ALL_RGB01) == 10
    for rgb in colors.ALL_RGB01:
        assert all(0 <= c < 1 for c in rgb)


def test_add_highlights_matches_pil_oracle():
    """The vectorized composite must match a straightforward PIL oracle
    (draw each patch as an RGBA rectangle, alpha_composite) to within 1 LSB
    of integer rounding."""
    from PIL import ImageDraw

    rng = np.random.default_rng(3)
    img = Image.fromarray(rng.integers(0, 256, (24, 40, 3), dtype=np.uint8))
    patches = rng.uniform(0, 2.0, size=(3 * 5,))
    upper, opacity, ps = 2.0, 0.7, 8

    got = np.asarray(viz.add_highlights(img, patches, ps, upper=upper, opacity=opacity))

    overlay = Image.new("RGBA", img.size, (0, 0, 0, 0))
    draw = ImageDraw.Draw(overlay)
    t = patches / (upper + 1e-9)
    cols = (viz.colormap(t)[:, :3] * 255).astype(np.uint8)
    for p in range(len(patches)):
        x, y = p % 5, p // 5
        draw.rectangle(
            [(x * ps, y * ps), (x * ps + ps, y * ps + ps)],
            fill=(*cols[p], int(opacity * t[p] * 255)),
        )
    want = np.asarray(Image.alpha_composite(img.convert("RGBA"), overlay))

    assert got.shape == want.shape
    diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
    assert diff.max() <= 1, diff.max()


def test_add_highlights_saturates_out_of_range():
    """Activations above `upper` (or below 0) must saturate like the PIL draw
    path, not wrap modulo 256: the hottest patch stays fully opaque."""
    img = Image.new("RGB", (16, 8), (0, 0, 0))
    patches = np.array([1.5, -0.5], dtype=np.float64)  # 1.5x upper; negative
    out = np.asarray(viz.add_highlights(img, patches, 8, upper=1.0, opacity=1.0))
    hot = out[:8, :8]  # patch 0: t clamps to 1 -> fully colormap-colored
    cold = out[:8, 8:]  # patch 1: t clamps to 0 -> untouched black
    want_hot = (viz.colormap(np.array([1.0]))[0, :3] * 255).round()
    np.testing.assert_allclose(hot[..., :3].reshape(-1, 3)[0], want_hot, atol=1)
    assert (cold[..., :3] == 0).all()


def test_add_highlights_transparent_base():
    """Source-over semantics on a transparent base (Image.alpha_composite
    oracle): highlighted transparent regions become visible heat patches."""
    from PIL import ImageDraw

    rng = np.random.default_rng(5)
    base = Image.new("RGBA", (16, 8), (10, 20, 30, 0))  # fully transparent
    patches = np.array([0.8, 0.3])
    got = np.asarray(viz.add_highlights(base, patches, 8, upper=1.0, opacity=0.9))

    overlay = Image.new("RGBA", base.size, (0, 0, 0, 0))
    draw = ImageDraw.Draw(overlay)
    t = patches / (1.0 + 1e-9)
    cols = (viz.colormap(t)[:, :3] * 255).astype(np.uint8)
    for p in range(2):
        draw.rectangle(
            [(p * 8, 0), (p * 8 + 8, 8)], fill=(*cols[p], int(0.9 * t[p] * 255))
        )
    want = np.asarray(Image.alpha_composite(base, overlay))
    diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
    assert diff.max() <= 1, diff.max()
