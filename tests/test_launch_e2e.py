"""Subprocess end-to-end through the real CLI: `python launch.py
shards -> train -> inference` exactly as a user runs it (reference
launch.py:11-16 + guide.md's quick-start flow), on the fake backends."""

import json
import os
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).parent.parent


def _run(args, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # The image's site hook re-selects the TPU plugin even under
    # JAX_PLATFORMS=cpu (NOTES.md); subprocesses must drop it from PYTHONPATH.
    env["PYTHONPATH"] = ":".join(
        [str(REPO)]
        + [p for p in env.get("PYTHONPATH", "").split(":") if "axon" not in p and p]
    )
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, str(REPO / "launch.py"), *args],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, f"{args}\nSTDOUT:{proc.stdout}\nSTDERR:{proc.stderr}"
    return proc


@pytest.mark.slow
def test_launch_pipeline(tmp_path):
    shards_root = tmp_path / "saev" / "shards"
    shards_root.mkdir(parents=True)
    runs_root = tmp_path / "saev" / "runs"
    runs_root.mkdir(parents=True)

    from conftest import FAKE_CKPT

    _run(
        [
            "shards", "data:fake-img", "--data.n-examples", "32",
            "--family", "fake-clip", "--ckpt", FAKE_CKPT,
            "--d-model", "128", "--content-tokens-per-example", "16",
            "--cls-token", "--layers", "0",
            "--batch-size", "8", "--n-workers", "2",
            "--max-tokens-per-shard", "256",
            "--shards-root", str(shards_root), "--device", "cpu",
        ],
        cwd=tmp_path,
    )
    shard_dirs = [p for p in shards_root.iterdir() if p.is_dir()]
    assert len(shard_dirs) == 1
    shards_dir = shard_dirs[0]
    assert (shards_dir / "metadata.json").exists()
    assert (shards_dir / "acts000000.bin").exists()

    _run(
        [
            "train",
            "--train-data.shards", str(shards_dir), "--train-data.layer", "0",
            "--train-data.batch-size", "64", "--train-data.n-threads", "1",
            "--train-data.buffer-size", "4",
            "--val-data.shards", str(shards_dir), "--val-data.layer", "0",
            "--val-data.batch-size", "64", "--val-data.n-threads", "1",
            "--val-data.buffer-size", "4",
            "--n-train", "256", "--n-val", "64",
            "--sae.d-model", "128", "--sae.d-sae", "32",
            "sae.activation:top-k", "--sae.activation.top-k", "4",
            "--lr", "1e-3", "--no-track",
            "--runs-root", str(runs_root), "--device", "cpu",
        ],
        cwd=tmp_path,
    )
    run_dirs = [p for p in runs_root.iterdir() if p.is_dir()]
    assert len(run_dirs) == 1
    ckpt = run_dirs[0] / "checkpoint" / "sae.pt"
    assert ckpt.exists()
    assert (run_dirs[0] / "checkpoint" / "config.json").exists()

    _run(
        [
            "inference",
            "--run", str(run_dirs[0]),
            "--data.shards", str(shards_dir), "--data.layer", "0",
            "--data.batch-size", "32",
            "--device", "cpu",
        ],
        cwd=tmp_path,
    )
    art = run_dirs[0] / "inference" / shards_dir.name
    metrics = json.loads((art / "metrics.json").read_text())
    assert metrics["n_tokens"] == 32 * 16
    assert (art / "token_acts.npz").exists()


def test_launch_train_with_sweep_file(tmp_path):
    """`launch.py train --sweep <file>` expands a make_cfgs() grid through the
    real subprocess CLI (reference guide.md sweep flow) — two aux variants,
    two run dirs, distinct seeds."""
    shards_root = tmp_path / "saev" / "shards"
    shards_root.mkdir(parents=True)
    runs_root = tmp_path / "saev" / "runs"
    runs_root.mkdir(parents=True)

    from conftest import FAKE_CKPT

    _run(
        [
            "shards", "data:fake-img", "--data.n-examples", "16",
            "--family", "fake-clip", "--ckpt", FAKE_CKPT,
            "--d-model", "128", "--content-tokens-per-example", "16",
            "--cls-token", "--layers", "0",
            "--batch-size", "8", "--n-workers", "2",
            "--max-tokens-per-shard", "512",
            "--shards-root", str(shards_root), "--device", "cpu",
        ],
        cwd=tmp_path,
    )
    (shards_dir,) = [p for p in shards_root.iterdir() if p.is_dir()]

    sweep_fpath = tmp_path / "sweep.py"
    sweep_fpath.write_text(
        "def make_cfgs():\n"
        "    return [\n"
        "        {'sae': {'activation':\n"
        "            {'key': 'top-k', 'top_k': 4, 'aux': {'key': aux}}}}\n"
        "        for aux in ('auxk', 'no-aux')\n"
        "    ]\n"
    )

    _run(
        [
            "train", "--sweep", str(sweep_fpath),
            "--train-data.shards", str(shards_dir), "--train-data.layer", "0",
            "--train-data.batch-size", "32", "--train-data.n-threads", "1",
            "--train-data.buffer-size", "4",
            "--val-data.shards", str(shards_dir), "--val-data.layer", "0",
            "--val-data.batch-size", "32", "--val-data.n-threads", "1",
            "--val-data.buffer-size", "4",
            "--n-train", "128", "--n-val", "32",
            "--sae.d-model", "128", "--sae.d-sae", "32",
            "--lr", "1e-3", "--no-track",
            "--runs-root", str(runs_root), "--device", "cpu",
        ],
        cwd=tmp_path,
    )
    run_dirs = sorted(p for p in runs_root.iterdir() if p.is_dir())
    assert len(run_dirs) == 2

    import json

    aux_keys, seeds = set(), set()
    for run_dir in run_dirs:
        cfg = json.loads((run_dir / "checkpoint" / "config.json").read_text())
        aux_keys.add(cfg["sae"]["activation"]["aux"]["key"])
        seeds.add(cfg["seed"])
    assert aux_keys == {"auxk", "no-aux"}
    assert len(seeds) == 2  # auto-incremented per expanded config
