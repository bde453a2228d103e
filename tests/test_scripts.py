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


def test_export_notebook(tmp_path):
    """examples/inference.py exports to a valid .ipynb whose code cells
    compile as one module (reference scripts/export_notebook.py analog)."""
    import json

    out = tmp_path / "inference.ipynb"
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "export_notebook.py"),
         str(REPO / "examples" / "inference.py"), "-o", str(out)],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr
    nb = json.loads(out.read_text())
    assert nb["nbformat"] == 4
    kinds = {c["cell_type"] for c in nb["cells"]}
    assert kinds == {"markdown", "code"}
    assert "%pip install" in "".join(nb["cells"][1]["source"])
    code = "\n".join(
        "".join(c["source"]) for c in nb["cells"] if c["cell_type"] == "code"
    )
    compile(code.replace("%pip", "# %pip"), "nb", "exec")


def test_export_notebook_percent_format(tmp_path):
    import json

    src = tmp_path / "cells.py"
    src.write_text(
        "# %% [markdown]\n# # Title\n# Prose here.\n\n# %%\nx = 1\ny = x + 1\n\n"
        "# %%\nprint(y)\n"
    )
    mod = _load("export_notebook")
    out = tmp_path / "cells.ipynb"
    mod.export(src, out)
    nb = json.loads(out.read_text())
    # badge + install + 3 authored cells
    assert len(nb["cells"]) == 5
    assert nb["cells"][2]["cell_type"] == "markdown"
    assert "# Title" in "".join(nb["cells"][2]["source"])
    assert "x = 1" in "".join(nb["cells"][3]["source"])


def test_deploy_copies_demos(tmp_path, monkeypatch):
    mod = _load("deploy")
    root = tmp_path / "repo"
    (root / "src/web/classification").mkdir(parents=True)
    (root / "src/web/classification/index.html").write_text("<html/>")
    (root / "docs/demos/classification").mkdir(parents=True)
    (root / "docs/demos/classification/stale.html").write_text("old")
    monkeypatch.setattr(mod, "ROOT", root)
    monkeypatch.setattr(sys, "argv", ["deploy.py", "--skip-api"])
    assert mod.main() == 0
    assert (root / "docs/demos/classification/index.html").exists()
    assert not (root / "docs/demos/classification/stale.html").exists()


def test_activations_toml_sweep(tmp_path):
    """TOML sweep expansion drives real extractions on the fake backend."""
    sweep = tmp_path / "sweep.toml"
    sweep.write_text(
        'family = "fake-clip"\n'
        'ckpt = "hf-hub:hf-internal-testing/tiny-open-clip-model"\n'
        "d_model = 128\n"
        "content_tokens_per_example = 16\n"
        "batch_size = 4\n"
        "n_workers = 2\n"
        "max_tokens_per_shard = 256\n"
        'device = "cpu"\n'
        "[data]\n"
        "n_examples = [6, 8]\n"
    )
    shards_root = tmp_path / "saev" / "shards"
    shards_root.mkdir(parents=True)
    import os

    # The axon site hook (PYTHONPATH) re-selects the TPU tunnel even with
    # JAX_PLATFORMS=cpu in the env; strip it so the subprocess runs on CPU.
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if "axon_site" not in p
    )
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "activations.py"),
         "--sweep", str(sweep), "--shards-root", str(shards_root)],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert proc.returncode == 0, proc.stderr
    dirs = [p for p in shards_root.iterdir() if p.is_dir()]
    assert len(dirs) == 2, (proc.stdout, proc.stderr)
    for d in dirs:
        assert (d / "metadata.json").exists()
        assert (d / "shards.json").exists()


def test_contrib_notebooks_compile():
    """Every contrib percent-format notebook must at least be valid Python
    (they're research narratives; this guards against syntax rot)."""
    notebooks = sorted((REPO / "contrib").rglob("notebooks/*.py"))
    assert notebooks, "expected contrib notebooks"
    for nb in notebooks:
        compile(nb.read_text(), str(nb), "exec")
