"""Birdsong notebook drivers execute end-to-end on fake shards (mirrors the
study-driver smoke pattern of tests/test_study_e2e.py)."""

import json
import os
import pathlib
import subprocess
import sys

import pytest

from conftest import _Helpers as helpers

REPO = pathlib.Path(__file__).parent.parent
NOTEBOOKS = REPO / "contrib" / "birdsong" / "notebooks"


@pytest.mark.timeout(300)
def test_birdset_driver_runs_on_fake_shards(tmp_path):
    """The birdset study driver samples two shard sets, writes the JSON
    report, and prints the outlier/norm sections."""
    audio = helpers.write_shards(tmp_path, n_examples=8, layers=(0,))
    img_root = tmp_path / "img"
    img_root.mkdir()
    img = helpers.write_shards(img_root, n_examples=8, layers=(0,))
    out = tmp_path / "birdset_report.json"
    env = {
        "BIRDSET_AUDIO_SHARDS": str(audio),
        "BIRDSET_IMG_SHARDS": str(img),
        "BIRDSET_N": "512",
        "BIRDSET_OUT": str(out),
        **helpers.subprocess_env(),
    }
    proc = subprocess.run(
        [sys.executable, str(NOTEBOOKS / "birdset.py")],
        capture_output=True, text=True, env=env, timeout=280,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "== audio ==" in proc.stdout and "== image ==" in proc.stdout
    report = json.loads(out.read_text())
    assert set(report["per_set"]) == {"audio", "image"}
    for per_set in report["per_set"].values():
        assert per_set["n_sampled"] > 0
    assert report["comparisons"], "norm comparisons missing"
