"""Smoke-run the remaining 0%-coverage notebook drivers (third batch):
fishvista dataset-exploration, 008_pe probe-battery, 002_optim ablations,
baselines comparison, and 007_cambridge_mimicry harvest. Fixtures reuse the
engine-test builders (test_td_analysis, test_td_fishbase_mimicry,
tdiscovery.baselines dump format).
"""

import json
import pathlib
import subprocess
import sys

import numpy as np
import pytest

from conftest import _Helpers as helpers

REPO = pathlib.Path(__file__).parent.parent
TD_NOTEBOOKS = REPO / "contrib" / "trait_discovery" / "notebooks"

sys.path.insert(0, str(REPO / "contrib" / "trait_discovery" / "src"))


def _run(script: pathlib.Path, env: dict, cwd: pathlib.Path, timeout=280):
    return subprocess.run(
        [sys.executable, str(script)],
        capture_output=True, text=True,
        env=helpers.subprocess_env(**env), cwd=cwd, timeout=timeout,
    )


def _probe_study(tmp_path, run_specs):
    """shards_root + runs_root with planted probe artifacts per
    (run_id, layer) spec — the metrics/008/baselines drivers' input layout."""
    import test_td_analysis as tda

    train_shards, _ = tda._write_shards(tmp_path / "tr", "training", seed=0)
    val_shards, _ = tda._write_shards(tmp_path / "va", "validation", seed=1)
    shards_root = tmp_path / "all" / "saev" / "shards"
    shards_root.mkdir(parents=True)
    for src in (train_shards, val_shards):
        (shards_root / src.name).symlink_to(src)
    runs_root = helpers.tmp_runs_root(tmp_path)
    runs = {
        rid: tda._make_run(runs_root, train_shards, val_shards, rid, layer=layer)[0]
        for rid, layer in run_specs
    }
    return shards_root, runs_root, train_shards, val_shards, runs


def test_fishvista_driver_without_dataset(tmp_path):
    """FV_ROOT unset: the aspect-ratio menu cells still run standalone."""
    proc = _run(TD_NOTEBOOKS / "fishvista.py", {}, tmp_path)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "usable ratios" in proc.stdout


def test_fishvista_driver_with_seg_dataset(tmp_path):
    from PIL import Image

    root = tmp_path / "segds"
    (root / "images" / "training").mkdir(parents=True)
    (root / "annotations" / "training").mkdir(parents=True)
    for i, (w, h) in enumerate([(32, 16), (16, 32), (24, 24)]):
        Image.new("RGB", (w, h)).save(
            root / "images" / "training" / f"img{i}.png"
        )
        Image.new("L", (w, h)).save(
            root / "annotations" / "training" / f"img{i}.png"
        )
    out = tmp_path / "figs"
    proc = _run(
        TD_NOTEBOOKS / "fishvista.py",
        {"FV_ROOT": str(root), "FV_N": "3", "FV_OUT": str(out)},
        tmp_path,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert (out / "aspect_hist.png").exists()


def test_008_pe_driver(tmp_path):
    shards_root, runs_root, *_ = _probe_study(
        tmp_path, [("perun0", 0), ("perun1", 1)]
    )
    out = tmp_path / "figs008"
    proc = _run(
        TD_NOTEBOOKS / "008_pe.py",
        {"TD_RUNS_ROOT": str(runs_root), "TD_SHARDS_ROOT": str(shards_root),
         "TD_OUT": str(out)},
        tmp_path,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "2 runs with probe metrics" in proc.stdout
    assert "purity@16" in proc.stdout
    assert any(out.glob("*.pdf"))


def test_002_optim_driver(tmp_path):
    """Two optimizer variants over matched (data, layer) cells, summaries in
    the tracker; the driver prints completeness + the adam-vs-muon effect
    and saves the pareto grid. Shards come from the FakeImg pipeline so the
    frame's data_key resolves (variant pairing groups on it)."""
    import test_td_analysis as tda

    train_shards = helpers.write_shards(tmp_path, n_examples=6, layers=(0,))
    val_root = tmp_path / "val"
    val_root.mkdir()
    val_shards = helpers.write_shards(val_root, n_examples=4, layers=(0,))
    runs_root = helpers.tmp_runs_root(tmp_path)
    runs = {
        rid: tda._make_run(runs_root, train_shards, val_shards, rid, layer=0)[0]
        for rid in ("adamrun", "muonrun")
    }
    tracker = tmp_path / "tracker" / "saev"
    for rid, optim, l0, nmse in [
        ("adamrun", "adam", 20.0, 0.30), ("muonrun", "muon", 20.0, 0.25),
    ]:
        run = runs[rid]
        cfg = json.loads((run.run_dir / "checkpoint" / "config.json").read_text())
        cfg["optim"] = optim
        (run.run_dir / "checkpoint" / "config.json").write_text(json.dumps(cfg))
        (tracker / rid).mkdir(parents=True)
        (tracker / rid / "summary.json").write_text(json.dumps({
            "eval": {"l0": l0, "normalized_mse": nmse}
        }))

    proc = _run(
        TD_NOTEBOOKS / "002_optim.py",
        {"OPTIM_RUNS": str(runs_root), "OPTIM_TRACKER": str(tmp_path / "tracker"),
         "OPTIM_EXPECTED": "1"},
        tmp_path,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "2 runs." in proc.stdout
    assert "muon vs adam" in proc.stdout
    assert (tmp_path / "optim_pareto_grid.png").exists()


def test_baselines_driver(tmp_path):
    """One k-means baseline run + one SAE run; the driver prints the
    comparison table and the per-run baseline lines."""
    from tdiscovery import baselines

    shards_root, runs_root, *_rest, runs = _probe_study(
        tmp_path, [("kmrun", 0), ("saerun", 0)]
    )
    rng = np.random.default_rng(0)
    km = baselines.MiniBatchKMeans(k=3, seed=0)
    km.partial_fit(rng.normal(size=(64, 8)).astype(np.float32))
    baselines.dump(
        runs["kmrun"], "kmeans", km,
        extra={"metrics": {"eval/inertia": 12.5}, "k": 3},
    )

    proc = _run(
        TD_NOTEBOOKS / "baselines.py",
        {"TD_RUNS": str(runs_root), "TD_SHARDS": str(shards_root)},
        tmp_path,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "1 baseline runs, 2 SAE runs." in proc.stdout
    assert "k-means" in proc.stdout
    assert "kmrun" in proc.stdout


def test_007_cambridge_mimicry_driver(tmp_path):
    from test_td_fishbase_mimicry import _write_ckpt

    from tdiscovery import mimicry

    t1 = mimicry.task_name("notabilis", "plesseni", "dorsal")
    t2 = mimicry.task_name("cyrbia", "cythera", "dorsal")
    _write_ckpt(tmp_path, "runA", "sh1", t1, C=0.1, separable=True)
    _write_ckpt(tmp_path, "runA", "sh1", t2, C=0.1, separable=False, seed=1)
    proc = _run(
        TD_NOTEBOOKS / "007_cambridge_mimicry.py",
        {"MIMICRY_RUNS": str(tmp_path)},
        tmp_path,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "notabilis" in proc.stdout.lower() or "runA" in proc.stdout
