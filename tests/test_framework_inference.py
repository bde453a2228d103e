"""End-to-end inference artifact tests (mirror of reference
tests/test_framework_inference.py:14-168)."""

import dataclasses
import json
import pathlib

import numpy as np
import pytest
import scipy.sparse

from saev_tpu import disk, nn
from saev_tpu.data import Metadata, OrderedConfig
from saev_tpu.framework import inference
from saev_tpu.nn import modeling

from conftest import _Helpers as helpers


def _make_run(tmp_path: pathlib.Path, shards_dir: pathlib.Path, d_model: int):
    runs_root = helpers.tmp_runs_root(tmp_path)
    run = disk.Run.new(
        "testrun1",
        train_shards_dir=shards_dir,
        val_shards_dir=shards_dir,
        runs_root=runs_root,
    )
    cfg = modeling.SparseAutoencoderConfig(
        d_model=d_model, d_sae=32, activation=modeling.TopK(top_k=4)
    )
    import jax

    params, state = modeling.init(cfg, jax.random.key(0))
    nn.dump(run.ckpt, cfg, params, state)
    return run


def test_inference_artifacts(tmp_path):
    from saev_tpu.data import fake_vit

    shards_dir = helpers.write_shards(tmp_path, n_examples=12, layers=(0,))
    md = Metadata.load(shards_dir)
    run = _make_run(tmp_path, shards_dir, fake_vit.D_MODEL)

    cfg = inference.Config(
        run=run.run_dir,
        data=OrderedConfig(shards=shards_dir, layer=0, batch_size=16),
        n_dists=5,
        device="cpu",
    )
    inference.worker_fn(cfg)

    root = run.inference / md.hash
    fpaths = inference.Filepaths.from_run(run, md)
    for fpath in fpaths:
        assert fpath.exists(), fpath

    # metrics.json is a valid Metrics dict.
    from saev_tpu.metrics import Metrics

    with open(fpaths.metrics) as fd:
        m = Metrics.from_dict(json.load(fd))
    assert m.n_tokens == 12 * md.content_tokens_per_example
    assert m.d_model == fake_vit.D_MODEL
    assert 0 <= m.normalized_mse

    # token_acts has one row per content token and d_sae cols; TopK(4) rows.
    token_acts = scipy.sparse.load_npz(fpaths.token_acts)
    assert token_acts.shape == (m.n_tokens, 32)
    row_l0 = np.diff(token_acts.indptr)
    assert (row_l0 <= 4 + 3).all()  # topk ties may keep a couple extra

    # .pt artifacts load with torch (reference-compatible codec).
    torch = pytest.importorskip("torch")
    mean_values = torch.load(fpaths.mean_values, weights_only=True)
    sparsity = torch.load(fpaths.sparsity, weights_only=True)
    assert mean_values.shape == (32,)
    assert sparsity.shape == (32,)
    assert (sparsity >= 0).all() and (sparsity <= 1).all()
    dists = torch.load(fpaths.distributions, weights_only=True)
    assert dists.shape == (m.n_tokens, 5)

    # config.json recorded beside the artifacts.
    assert (root / "config.json").exists()


def test_inference_idempotent(tmp_path):
    from saev_tpu.data import fake_vit

    shards_dir = helpers.write_shards(tmp_path, n_examples=6, layers=(0,))
    run = _make_run(tmp_path, shards_dir, fake_vit.D_MODEL)
    cfg = inference.Config(
        run=run.run_dir,
        data=OrderedConfig(shards=shards_dir, layer=0, batch_size=8),
        device="cpu",
    )
    inference.worker_fn(cfg)
    do, reason, _ = inference.need_compute(cfg)
    assert not do, reason
    do, _, _ = inference.need_compute(dataclasses.replace(cfg, force_recompute=True))
    assert do


def test_inference_metrics_only(tmp_path):
    from saev_tpu.data import fake_vit

    shards_dir = helpers.write_shards(tmp_path, n_examples=6, layers=(0,))
    md = Metadata.load(shards_dir)
    run = _make_run(tmp_path, shards_dir, fake_vit.D_MODEL)
    cfg = inference.Config(
        run=run.run_dir,
        data=OrderedConfig(shards=shards_dir, layer=0, batch_size=8),
        save=False,
        device="cpu",
    )
    inference.worker_fn(cfg)
    fpaths = inference.Filepaths.from_run(run, md)
    assert fpaths.metrics.exists()
    assert not fpaths.token_acts.exists()


def test_inference_label_ignore(tmp_path):
    """Masked tokens contribute nothing: rows are zero and metrics count drops."""
    from saev_tpu.data import fake_vit

    shards_dir = helpers.write_shards(tmp_path, n_examples=6, layers=(0,))
    md = Metadata.load(shards_dir)
    labels = np.zeros((md.n_examples, md.content_tokens_per_example), dtype=np.uint8)
    labels[:, 0] = 7  # first content token of every example gets label 7
    helpers.write_token_labels(shards_dir, labels)

    run = _make_run(tmp_path, shards_dir, fake_vit.D_MODEL)
    cfg = inference.Config(
        run=run.run_dir,
        data=OrderedConfig(shards=shards_dir, layer=0, batch_size=8),
        ignore_labels=(7,),
        device="cpu",
    )
    inference.worker_fn(cfg)

    fpaths = inference.Filepaths.from_run(run, md)
    from saev_tpu.metrics import Metrics

    with open(fpaths.metrics) as fd:
        m = Metrics.from_dict(json.load(fd))
    assert m.n_tokens == md.n_examples * (md.content_tokens_per_example - 1)

    token_acts = scipy.sparse.load_npz(fpaths.token_acts)
    dense = token_acts.toarray().reshape(
        md.n_examples, md.content_tokens_per_example, -1
    )
    assert (dense[:, 0, :] == 0).all()
    assert (dense[:, 1:, :] != 0).any()
