"""Dataset-exploration notebook support (mirror of reference
contrib/trait_discovery/notebooks/{fishvista,butterflies}.py: the
aspect-ratio menu, patch-grid resize previews, palette-rendered masks)."""

import importlib.util
import pathlib
import sys

import numpy as np
import pytest
from PIL import Image

from conftest import _Helpers as helpers

sys.path.insert(
    0, str(pathlib.Path(__file__).parent.parent / "contrib" / "trait_discovery" / "src")
)

from saev_tpu.data import transforms

NOTEBOOKS = (
    pathlib.Path(__file__).parent.parent / "contrib" / "trait_discovery" / "notebooks"
)


def test_aspect_ratios_menu():
    # n=12: factor pairs (1,12),(2,6),(3,4) -> ratios and reciprocals.
    got = transforms.aspect_ratios(12)
    want = sorted([12.0, 6 / 2, 4 / 3, 1 / 12, 2 / 6, 3 / 4])
    np.testing.assert_allclose(got, want)
    # Perfect square includes 1.0 exactly once.
    got = transforms.aspect_ratios(16)
    assert got.count(1.0) == 1
    with pytest.raises(ValueError):
        transforms.aspect_ratios(0)


def test_aspect_ratios_match_resize_choices():
    """Every resize_to_patch_grid output ratio is on the aspect_ratios menu."""
    menu = transforms.aspect_ratios(192)
    for w, h in ((640, 480), (100, 400), (512, 512)):
        out = transforms.resize_to_patch_grid(Image.new("RGB", (w, h)), p=16, n=192)
        ow, oh = out.size
        assert ow % 16 == 0 and oh % 16 == 0
        assert (ow // 16) * (oh // 16) == 192
        assert any(abs(ow / oh - r) < 1e-9 for r in menu)


def _load_driver(name):
    spec = importlib.util.spec_from_file_location(name, NOTEBOOKS / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # __main__ guard keeps the body inert
    return mod


def test_butterflies_make_seg_palette():
    butterflies = _load_driver("butterflies")
    mask = Image.fromarray(np.array([[0, 1], [1, 2]], dtype=np.uint8))
    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255)]
    rgb = np.asarray(butterflies.make_seg(mask, palette))
    np.testing.assert_array_equal(rgb[0, 0], [255, 0, 0])
    np.testing.assert_array_equal(rgb[0, 1], [0, 255, 0])
    np.testing.assert_array_equal(rgb[1, 1], [0, 0, 255])


def test_butterflies_driver_renders_pairs(tmp_path, monkeypatch):
    """The driver walks a real segfolder and writes palette pair images."""
    import subprocess
    import sys as _sys

    root = tmp_path / "segds"
    (root / "images" / "training").mkdir(parents=True)
    (root / "annotations" / "training").mkdir(parents=True)
    for stem in ("img0", "img1"):
        Image.new("RGB", (16, 16), (120, 60, 30)).save(
            root / "images" / "training" / f"{stem}.png"
        )
        Image.fromarray(
            np.arange(256, dtype=np.uint8).reshape(16, 16) % 4
        ).save(root / "annotations" / "training" / f"{stem}.png")
    (root / "labels.csv").write_text("stem,class\nimg0,a\nimg1,b\n")

    out = tmp_path / "gallery"
    env = {
        "BF_ROOT": str(root), "BF_N": "2", "BF_OUT": str(out),
        **helpers.subprocess_env(),
    }
    proc = subprocess.run(
        [_sys.executable, str(NOTEBOOKS / "butterflies.py")],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    pairs = sorted(out.glob("pair_*.png"))
    assert len(pairs) == 2
    img = Image.open(pairs[0])
    assert img.size == (32, 16)  # image + rendered mask side by side
