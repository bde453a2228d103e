"""Smoke-run the remaining notebook-mirror driver files (second batch):
birdsong clips browser, tdiscovery logs/metrics/results/visuals drivers, and
the two run-id-driven inference/score config generators. Fixtures reuse the
engine-test builders (test_birdsong_browse, test_td_analysis,
test_td_results) so each FILE executes top to bottom on realistic layouts.
"""

import importlib.util
import json
import pathlib
import subprocess
import sys

import numpy as np
import pytest

from conftest import _Helpers as helpers

REPO = pathlib.Path(__file__).parent.parent
TD_NOTEBOOKS = REPO / "contrib" / "trait_discovery" / "notebooks"


def _run(script: pathlib.Path, env: dict, cwd: pathlib.Path, timeout=280):
    return subprocess.run(
        [sys.executable, str(script)],
        capture_output=True, text=True,
        env=helpers.subprocess_env(**env), cwd=cwd, timeout=timeout,
    )


def test_birdsong_clips_driver(tmp_path):
    from test_birdsong_browse import _fake_clip_run

    run, md, runs_root = _fake_clip_run(tmp_path)
    out = tmp_path / "galleries"
    proc = _run(
        REPO / "contrib/birdsong/notebooks/clips.py",
        {"BS_RUNS_ROOTS": str(runs_root), "BS_OUT": str(out)},
        tmp_path,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "1 runs with clip galleries" in proc.stdout
    assert (out / "index.html").exists()


def test_td_visuals_driver(tmp_path):
    """Real artifacts via the inference + visuals pipeline (the browser page
    builder reads var.parquet and the rendered gallery images)."""
    pytest.importorskip("pandas")
    import jax

    sys.path.insert(0, str(REPO / "contrib" / "trait_discovery" / "src"))
    from tdiscovery import visuals as td_visuals

    from saev_tpu import disk, nn
    from saev_tpu.data import OrderedConfig, fake_vit
    from saev_tpu.framework import inference
    from saev_tpu.nn import modeling

    shards_dir = helpers.write_shards(tmp_path, n_examples=8, layers=(0,))
    runs_root = helpers.tmp_runs_root(tmp_path)
    run = disk.Run.new(
        "galrun", train_shards_dir=shards_dir, val_shards_dir=shards_dir,
        runs_root=runs_root,
    )
    cfg = modeling.SparseAutoencoderConfig(
        d_model=fake_vit.D_MODEL, d_sae=16, activation=modeling.TopK(top_k=2)
    )
    params, state = modeling.init(cfg, jax.random.key(0))
    nn.dump(run.ckpt, cfg, params, state)
    inference.worker_fn(inference.Config(
        run=run.run_dir,
        data=OrderedConfig(shards=shards_dir, layer=0, batch_size=32),
        device="cpu",
    ))
    td_visuals.worker_fn(td_visuals.Config(
        run=run.run_dir, shards=shards_dir, top_k=2, n_latents=3,
        log_freq_range=(-12, 2), log_value_range=(-12, 6), save_seg=False,
    ))
    out = tmp_path / "site"
    proc = _run(
        REPO / "contrib/trait_discovery/notebooks/visuals.py",
        {"TD_RUNS_ROOTS": str(runs_root), "TD_OUT": str(out),
         "TD_N_FEATURES": "4"},
        tmp_path,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "1 runs with galleries" in proc.stdout
    assert (out / "index.html").exists()


def test_td_logs_driver(tmp_path):
    import logging

    import scipy.sparse

    sys.path.insert(0, str(REPO / "contrib" / "trait_discovery" / "src"))
    from tdiscovery import probe1d

    log_fpath = tmp_path / "probe1d.log"
    handler = logging.FileHandler(log_fpath)
    handler.setFormatter(
        logging.Formatter("[%(asctime)s] [%(levelname)s] [%(name)s] %(message)s")
    )
    stats = logging.getLogger("probe1d.stats")
    old_level = stats.level
    stats.setLevel(logging.DEBUG)
    stats.addHandler(handler)
    try:
        rng = np.random.default_rng(0)
        x = np.where(rng.uniform(size=(64, 4)) < 0.4, 1.0, 0.0).astype(np.float32)
        y = (rng.uniform(size=(64, 2)) < 0.3).astype(np.float32)
        probe1d.Sparse1DProbe(
            n_latents=4, n_classes=2, class_slab_size=2, max_iter=4
        ).fit(scipy.sparse.csr_matrix(x), y)
        handler.flush()
    finally:
        stats.removeHandler(handler)
        stats.setLevel(old_level)
        handler.close()

    out = tmp_path / "figs"
    proc = _run(
        REPO / "contrib/trait_discovery/notebooks/logs.py",
        {"TD_LOG": str(log_fpath), "TD_OUT": str(out)},
        tmp_path,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "events in" in proc.stdout
    assert (out / "loss.png").exists() and (out / "memory.png").exists()


def test_td_metrics_driver(tmp_path):
    import test_td_analysis as tda

    train_shards, _ = tda._write_shards(tmp_path / "tr", "training", seed=0)
    val_shards, _ = tda._write_shards(tmp_path / "va", "validation", seed=1)
    shards_root = tmp_path / "all" / "saev" / "shards"
    shards_root.mkdir(parents=True)
    for src in (train_shards, val_shards):
        (shards_root / src.name).symlink_to(src)
    runs_root = helpers.tmp_runs_root(tmp_path)
    tda._make_run(runs_root, train_shards, val_shards, "runx", layer=0)
    tda._make_run(runs_root, train_shards, val_shards, "runy", layer=1)

    out = tmp_path / "figures"
    proc = _run(
        TD_NOTEBOOKS / "metrics.py",
        {"TD_RUNS_ROOT": str(runs_root), "TD_SHARDS_ROOT": str(shards_root),
         "TD_OUT": str(out)},
        tmp_path,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "2 runs" in proc.stdout
    # save_battery writes figures as .pdf and tables as .csv/.md.
    assert any(out.glob("*.pdf")) and any(out.glob("*.csv")), (
        sorted(out.iterdir()) if out.is_dir() else out
    )


def test_td_results_driver(tmp_path):
    from test_td_results import _write_result

    res = tmp_path / "results"
    res.mkdir()
    _write_result(res, method="sae", n_protos=4, test_ap=[0.8, 0.5, 0.7])
    _write_result(res, method="random", n_protos=4, test_ap=[0.2, 0.1, 0.3])
    proc = _run(
        TD_NOTEBOOKS / "results.py",
        {"TD_RESULTS": str(res), "TD_PREFIX": "fishvista"},
        tmp_path,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "rows from" in proc.stdout
    assert "sae" in proc.stdout and "random" in proc.stdout


@pytest.mark.parametrize(
    "rel, run_ids_literal, target_mod",
    [
        (
            "contrib/birdsong/sweeps/001_explore/inference.py",
            {13: ["aaaa1111", "bbbb2222"], 15: ["cccc3333"]},
            "saev_tpu.framework.inference",
        ),
        (
            "contrib/mimics/exps/001-widths/score.py",
            {(21, 16384): ["dddd4444"], (23, 20480): ["eeee5555"]},
            "saev_tpu.framework.inference",
        ),
    ],
)
def test_runid_config_generators(rel, run_ids_literal, target_mod, tmp_path):
    """The paste-run-ids inference/score sweep files: with ids filled in,
    make_cfgs rows must build real inference Configs through the engine."""
    import importlib

    from saev_tpu import configs

    spec = importlib.util.spec_from_file_location("sweepmod", REPO / rel)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.make_cfgs() == []  # placeholder state is an empty sweep
    mod.RUN_IDS = run_ids_literal
    dcts = mod.make_cfgs()
    assert len(dcts) == sum(len(v) for v in run_ids_literal.values())

    inference = importlib.import_module(target_mod)
    cfgs, errs = configs.load_cfgs(
        inference.Config(), default=inference.Config(), sweep_dcts=dcts
    )
    assert not errs, errs[:2]
    assert len(cfgs) == len(dcts)
    assert all(str(c.run) != "" for c in cfgs)
