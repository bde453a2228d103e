"""Smoke-run the notebook-mirror driver files that had no executing test:
birdsong explore, the two sweep-config generators, mimics exploration /
widths notebooks, and the interactive-interp figures driver. Follows the
subprocess driver-smoke pattern of tests/test_birdsong_drivers.py and
tests/test_study_e2e.py: tiny fake fixtures, run the FILE top to bottom,
assert on its printed summary and written artifacts. (Engines these drivers
call are unit-tested elsewhere; these tests pin the user-facing files
themselves.)
"""

import json
import os
import pathlib
import pickle
import subprocess
import sys
import types

import numpy as np
import pytest

from conftest import _Helpers as helpers

REPO = pathlib.Path(__file__).parent.parent


def _run(script: pathlib.Path, env: dict, cwd: pathlib.Path, timeout=280):
    return subprocess.run(
        [sys.executable, str(script)],
        capture_output=True, text=True,
        env=helpers.subprocess_env(**env), cwd=cwd, timeout=timeout,
    )


# ---------------------------------------------------------------------------
# Sweep-config generators (birdsong 001_explore, mimics width sweep): their
# contract is `make_cfgs()` feeding the real sweep engine — expand every
# combination into a constructible train.Config.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "sweep_rel, n_expected",
    [
        ("contrib/birdsong/sweeps/001_explore/train.py", 180),
        ("contrib/mimics/exps/001-widths/train_widths.py", 200),
    ],
)
def test_sweep_generators_expand_through_the_engine(sweep_rel, n_expected, tmp_path):
    from saev_tpu import configs
    from saev_tpu.framework import train as T

    dcts = configs.load_sweep(REPO / sweep_rel)
    cfgs, errs = configs.load_cfgs(
        T.Config(), default=T.Config(), sweep_dcts=dcts
    )
    assert not errs, errs[:3]
    assert len(cfgs) == n_expected
    # Axes really vary (lr x k at minimum) and layers stay train/val-paired.
    assert len({c.lr for c in cfgs}) >= 5
    assert len({c.sae.activation.top_k for c in cfgs}) >= 4
    assert all(c.train_data.layer == c.val_data.layer for c in cfgs)


# ---------------------------------------------------------------------------
# interactive_interp figures driver
# ---------------------------------------------------------------------------


def test_figures_driver_renders_panels(tmp_path):
    panels = {
        "a_before": {"probs": [["X", 40.0], ["Y", 10.0]], "ylim": 50.0},
        "a_after": {"probs": [["Y", 30.0], ["X", 5.0]], "ylim": 50.0},
    }
    data = tmp_path / "panels.json"
    data.write_text(json.dumps(panels))
    out = tmp_path / "figs"
    proc = _run(
        REPO / "contrib/interactive_interp/notebooks/figures.py",
        {"FIGURES_OUT": str(out), "FIGURES_JSON": str(data)},
        tmp_path,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    written = sorted(p.name for p in out.iterdir())
    assert written == ["a_after.png", "a_before.png"], (written, proc.stdout)


# ---------------------------------------------------------------------------
# mimics exps/001-heliconius exploration driver
# ---------------------------------------------------------------------------

TASK = "notabilis_dorsal_vs_plesseni_dorsal"


def _write_cls_ckpt(art: pathlib.Path, name: str, coef, test_acc: float):
    art.mkdir(parents=True, exist_ok=True)
    with open(art / name, "wb") as fd:
        fd.write(json.dumps({
            "cfg": {"cls": {"key": "sparse-linear", "C": 1.0}},
            "test_acc": test_acc, "n_classes": 2,
        }).encode() + b"\n")
        clf = types.SimpleNamespace(coef_=np.asarray(coef))
        pickle.dump({"classifier": clf}, fd)


def test_mimics_exploration_driver(tmp_path):
    runs = tmp_path / "runs"
    shard = "deadbeef"
    _write_cls_ckpt(
        runs / "runA" / "inference" / shard,
        f"cls_{TASK}_mean_sparse-linear-c1.pkl",
        [[3.0, 0.0, 2.0, 0.0]], 0.9,
    )
    _write_cls_ckpt(
        runs / "runB" / "inference" / shard,
        f"cls_{TASK}_mean_sparse-linear-c1.pkl",
        [[0.0, 2.5, 0.0, 1.0]], 0.8,
    )
    labels = tmp_path / "labels.json"
    labels.write_text(json.dumps(
        ["notabilis_dorsal", "plesseni_dorsal"] * 4
    ))
    out = tmp_path / "exploration"
    proc = _run(
        REPO / "contrib/mimics/exps/001-heliconius/exploration.py",
        {
            "MIMICS_RUNS": str(runs), "MIMICS_SHARD": shard,
            "MIMICS_TASK": TASK, "MIMICS_LABELS": str(labels),
            "MIMICS_OUT": str(out),
        },
        tmp_path,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "runA" in proc.stdout and "runB" in proc.stdout
    assert "pooled features" in proc.stdout
    plan = json.loads((out / "render_plan.json").read_text())
    assert plan and all("latents" in row for row in plan)


# ---------------------------------------------------------------------------
# mimics exps/002-wider-saes width-study notebook
# ---------------------------------------------------------------------------


def _fake_width_run(runs_root, tracker, run_id, *, d_sae, l0, nmse):
    ckpt_dir = runs_root / run_id / "checkpoint"
    ckpt_dir.mkdir(parents=True)
    (ckpt_dir / "config.json").write_text(json.dumps({
        "sae": {"d_sae": d_sae, "d_model": 32}, "lr": 1e-3,
        "tags": ["widths-test"],
    }))
    proj = tracker / "saev" / run_id
    proj.mkdir(parents=True, exist_ok=True)
    (proj / "summary.json").write_text(json.dumps({
        "eval": {"l0": l0, "nmse": nmse},
    }))


def test_mimics_widths_notebook(tmp_path):
    runs, tracker = tmp_path / "runs", tmp_path / "tracker"
    _fake_width_run(runs, tracker, "r64a", d_sae=64, l0=10, nmse=0.5)
    _fake_width_run(runs, tracker, "r64b", d_sae=64, l0=30, nmse=0.3)
    _fake_width_run(runs, tracker, "r128", d_sae=128, l0=20, nmse=0.2)
    out = tmp_path / "figures"
    proc = _run(
        REPO / "contrib/mimics/exps/002-wider-saes/notebook.py",
        {
            "MIMICS_RUNS": str(runs), "MIMICS_TRACKER": str(tracker),
            "MIMICS_OUT": str(out),
        },
        tmp_path,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "3 runs" in proc.stdout
    assert "d_sae" in proc.stdout  # the width_study table printed


# ---------------------------------------------------------------------------
# birdsong explore notebook: token-acts analysis -> visuals galleries ->
# tracker pareto, over a tiny bird-mae study (real ogg audio, hand-written
# shards + inference artifacts).
# ---------------------------------------------------------------------------


def _write_tracker_run(tracker, rid, layer, l0, nmse):
    d = tracker / rid
    d.mkdir(parents=True)
    (d / "config.json").write_text(json.dumps({
        "config": {"val_data": {"layer": layer}, "sae": {"d_sae": 32}},
        "tags": ["birdsong"],
    }))
    with open(d / "metrics.jsonl", "w") as fd:
        fd.write(json.dumps({"step": 1, "loss/l0": l0,
                             "metrics/normalized_mse": nmse}) + "\n")


@pytest.mark.slow
def test_birdsong_explore_driver(tmp_path):
    from saev_tpu import disk
    from saev_tpu.data import datasets, shards
    from saev_tpu.models import bird_mae
    from saev_tpu.utils import vorbis

    if not vorbis.available():
        pytest.skip("system vorbis libraries not present")
    import scipy.sparse
    import torch

    # 1. Tiny BirdCLEF root: 3 one-second tones.
    root = tmp_path / "birdclef-2025"
    (root / "train_audio" / "amekes").mkdir(parents=True)
    (root / "taxonomy.csv").write_text("primary_label,class_name\namekes,Aves\n")
    rows = ["primary_label,filename"]
    sr = bird_mae.SR_HZ
    t = np.arange(sr) / sr
    for i in range(3):
        wav = (0.3 * np.sin(2 * np.pi * (300 + 200 * i) * t)).astype(np.float32)
        vorbis.write_ogg(root / "train_audio" / "amekes" / f"x{i}.ogg", wav, sr)
        rows.append(f"amekes,amekes/x{i}.ogg")
    (root / "train.csv").write_text("\n".join(rows) + "\n")

    # 2. bird-mae-family shards over that dataset (d_model 16, 1 layer).
    data_cfg = datasets.BirdClef2025(root=root)
    n_examples, ctpe, d_model, d_sae = 3, bird_mae.N_PATCHES, 16, 32
    shards_root = tmp_path / "saev" / "shards"
    shards_root.mkdir(parents=True)
    md = shards.Metadata(
        family="bird-mae", ckpt="tiny-test", layers=(0,),
        content_tokens_per_example=ctpe, cls_token=False, d_model=d_model,
        n_examples=n_examples, max_tokens_per_shard=ctpe * 8,
        data=shards.encode_dataset_cfg(data_cfg), dataset=str(root),
    )
    md.dump(shards_root)
    rng = np.random.default_rng(0)
    with shards.ShardWriter(shards_root, md) as w:
        w.write_batch(
            rng.normal(size=(n_examples, 1, ctpe, d_model)).astype(np.float32), 0
        )
    shards_dir = shards_root / md.hash

    # 3. Run dir + inference artifacts (CSR token acts with a few latents in
    # the explorer's frequency band, plus the stats tensors).
    runs_root = tmp_path / "saev" / "runs"
    run = disk.Run.new(
        "abcd1234", train_shards_dir=shards_dir, val_shards_dir=shards_dir,
        runs_root=runs_root,
    )
    n_tok = n_examples * ctpe
    dense = np.zeros((n_tok, d_sae), np.float32)
    for lat in range(6):
        fire = rng.choice(n_tok, size=12, replace=False)
        dense[fire, lat] = rng.random(12).astype(np.float32) + 0.5
    art = run.run_dir / "inference" / md.hash
    art.mkdir(parents=True)
    scipy.sparse.save_npz(art / "token_acts.npz", scipy.sparse.csr_matrix(dense))
    torch.save(torch.tensor((dense > 0).mean(0)), art / "sparsity.pt")
    torch.save(torch.tensor(dense.mean(0)), art / "mean_values.pt")

    # 4. Tracker runs for the pareto cells.
    tracker = tmp_path / "tracker"
    _write_tracker_run(tracker, "aaaa", 13, 10.0, 0.5)
    _write_tracker_run(tracker, "bbbb", 13, 30.0, 0.2)

    proc = _run(
        REPO / "contrib/birdsong/notebooks/explore.py",
        {
            "BIRDSONG_RUN": str(run.run_dir),
            "BIRDSONG_SHARDS": str(shards_dir),
            "BIRDSONG_TRACKER": str(tracker),
        },
        tmp_path,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert f"{n_tok} tokens x {d_sae} latents" in proc.stdout
    assert "wrote galleries" in proc.stdout
    assert "layer 13: 2 runs" in proc.stdout
    assert "render clips for:" in proc.stdout
    clips = art / "clips"
    galleries = sorted(p.name for p in clips.iterdir())
    assert galleries, "no latent galleries written"
    one = clips / galleries[0]
    names = {p.name for p in one.iterdir()}
    assert "0_spectrogram.png" in names and "0_sae_spectrogram.png" in names
    assert any(n.startswith("0_time_clip") for n in names)
