"""Birdsong clip-gallery discovery + site assembly (mirror of reference
contrib/birdsong/notebooks/clips.py: has_clips run discovery, checkpoint/
shards selection, clip-gallery navigation)."""

import pathlib
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(REPO / "contrib" / "birdsong" / "src"))

from birdsong import browse, visuals  # noqa: E402


def _fake_clip_run(tmp_path, rid="birdrun"):
    from PIL import Image

    from conftest import _Helpers as helpers
    from saev_tpu import disk
    from saev_tpu.data import Metadata

    shards_dir = helpers.write_shards(tmp_path, n_examples=4, layers=(0,))
    md = Metadata.load(shards_dir)
    runs_root = helpers.tmp_runs_root(tmp_path)
    run = disk.Run.new(
        rid, train_shards_dir=shards_dir, val_shards_dir=shards_dir,
        runs_root=runs_root,
    )
    clips = run.inference / md.hash / "clips"
    for latent in (3, 7):
        d = clips / str(latent)
        d.mkdir(parents=True)
        for j in range(2):
            Image.new("L", (64, 16)).save(d / f"{j}_spectrogram.png")
            Image.new("L", (64, 16)).save(d / f"{j}_sae_spectrogram.png")
            visuals.write_wav(
                d / f"{j}_time_clip.wav", np.zeros(100, np.float32), 32000
            )
    return run, md, runs_root


def test_discover_and_build(tmp_path):
    run, md, runs_root = _fake_clip_run(tmp_path)
    # A run without clips is ignored.
    (runs_root / "empty" / "inference" / "deadbeef").mkdir(parents=True)

    clip_runs = browse.discover_runs([runs_root, tmp_path / "missing"])
    assert [c.run_dir.name for c in clip_runs] == ["birdrun"]
    assert clip_runs[0].shards == (md.hash,)
    assert browse.shards_with_clips(runs_root / "empty") == ()

    out_dir = tmp_path / "site"
    written = browse.build_browsers([runs_root], out_dir)
    index = out_dir / "index.html"
    assert index in written and index.exists()
    assert f"birdrun / {md.hash}" in index.read_text()
    pages = [p for p in written if p != index]
    assert len(pages) == 1
    html = pages[0].read_text()
    # Embedded galleries carry the latent sections and audio players inline.
    assert "Latent 3" in html and "Latent 7" in html
    assert "data:audio/wav;base64," in html
    assert "data:image/png;base64," in html
