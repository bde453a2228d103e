"""Tests for standalone scripts: scene-categories CSV converter and the API
doc generator."""

import importlib.util
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def _load(name):
    spec = importlib.util.spec_from_file_location(name, REPO / "scripts" / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_convert_scene_categories(tmp_path):
    mod = _load("convert_scene_categories_to_csv")
    (tmp_path / "sceneCategories.txt").write_text(
        "ADE_train_00000001 airport_terminal\n"
        "ADE_train_00000002 bathroom\n"
        "\n"
        "ADE_val_00000001 misc\n"
    )
    out = mod.convert(tmp_path)
    lines = out.read_text().strip().splitlines()
    assert lines[0] == "stem,scene"
    assert lines[1] == "ADE_train_00000001,airport_terminal"
    assert len(lines) == 4


def test_docs_generator(tmp_path):
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "docs.py"), "--out", str(tmp_path)],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr
    index = (tmp_path / "index.md").read_text()
    assert "saev_tpu.nn.modeling" in index
    modeling = (tmp_path / "saev_tpu_nn_modeling.md").read_text()
    assert "SparseAutoencoderConfig" in modeling
    assert "d_sae" in modeling
