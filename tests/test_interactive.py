"""Tests for the interactive report generators (static equivalents of the
reference's marimo notebooks, src/saev/interactive/)."""

import json
import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(
    0, str(pathlib.Path(__file__).parent.parent / "contrib" / "trait_discovery" / "src")
)

from conftest import _Helpers as helpers


def test_shards_browser(tmp_path):
    from saev_tpu.interactive import shards as ishards

    shards_dir = helpers.write_shards(tmp_path, n_examples=6, layers=(0,))
    rows = ishards.scan(shards_dir.parent)
    assert len(rows) == 1
    assert rows[0]["family"] == "fake-clip"
    assert rows[0]["n_examples"] == 6
    assert rows[0]["gb"] > 0
    table = ishards.format_table(rows)
    assert "fake-clip" in table
    out = tmp_path / "shards.html"
    ishards.cli(ishards.Config(root=shards_dir.parent, out=out))
    assert out.exists() and "fake-clip" in out.read_text()


def test_metrics_report(tmp_path):
    from saev_tpu.interactive import metrics as imetrics

    tracker = tmp_path / "tracker"
    for rid, (l0, nmse) in {"aaaa": (10, 0.5), "bbbb": (30, 0.2)}.items():
        d = tracker / rid
        d.mkdir(parents=True)
        (d / "config.json").write_text(json.dumps({"config": {"lr": 1e-3}}))
        with open(d / "metrics.jsonl", "w") as fd:
            for step in range(3):
                fd.write(json.dumps({"step": step, "loss/mse": 1.0 / (step + 1)}) + "\n")
            fd.write(
                json.dumps({"step": 3, "eval/l0": l0, "eval/normalized_mse": nmse}) + "\n"
            )
    out = imetrics.generate(imetrics.Config(tracker_dir=tracker, out=tmp_path / "report"))
    assert out.exists()
    assert (tmp_path / "report" / "pareto.png").exists()
    assert (tmp_path / "report" / "curves.png").exists()
    html = out.read_text()
    assert "aaaa" in html and "bbbb" in html


def test_features_gallery(tmp_path):
    pytest.importorskip("pandas")
    import jax

    from saev_tpu import disk, nn
    from saev_tpu.data import Metadata, OrderedConfig, fake_vit
    from saev_tpu.framework import inference
    from saev_tpu.interactive import features as ifeatures
    from saev_tpu.nn import modeling
    from tdiscovery import visuals

    shards_dir = helpers.write_shards(tmp_path, n_examples=8, layers=(0,))
    md = Metadata.load(shards_dir)
    runs_root = helpers.tmp_runs_root(tmp_path)
    run = disk.Run.new(
        "featrun", train_shards_dir=shards_dir, val_shards_dir=shards_dir,
        runs_root=runs_root,
    )
    cfg = modeling.SparseAutoencoderConfig(
        d_model=fake_vit.D_MODEL, d_sae=16, activation=modeling.TopK(top_k=2)
    )
    params, state = modeling.init(cfg, jax.random.key(0))
    nn.dump(run.ckpt, cfg, params, state)
    inference.worker_fn(
        inference.Config(
            run=run.run_dir,
            data=OrderedConfig(shards=shards_dir, layer=0, batch_size=32),
            device="cpu",
        )
    )
    visuals.worker_fn(
        visuals.Config(
            run=run.run_dir, shards=shards_dir, top_k=2, n_latents=3,
            log_freq_range=(-12, 2), log_value_range=(-12, 6), save_seg=False,
        )
    )

    out = ifeatures.generate(
        ifeatures.Config(run=run.run_dir, shards=shards_dir, n_features=5)
    )
    assert out.exists()
    html = out.read_text()
    assert "data:image/png;base64," in html
    assert "Latent features" in html
