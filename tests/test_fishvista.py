"""Tests for the FishVista unified evaluation pipeline
(contrib/trait_discovery/src/tdiscovery/fishvista/)."""

import dataclasses
import json
import pathlib
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "contrib" / "trait_discovery" / "src"))

from tdiscovery import baselines, saes  # noqa: E402
from tdiscovery.fishvista import evaluation, supervised, utils  # noqa: E402

from saev_tpu.data import OrderedConfig  # noqa: E402


@pytest.fixture(scope="module")
def seg_shards(tmp_path_factory, helpers):
    """Labeled fake shards shared across the module (train == test dirs with
    different example counts)."""
    train = helpers.write_shards(
        tmp_path_factory.mktemp("fv_train"), n_examples=12, layers=(1,), seg=True,
        max_tokens_per_shard=4096,
    )
    test = helpers.write_shards(
        tmp_path_factory.mktemp("fv_test"), n_examples=8, layers=(1,), seg=True,
        max_tokens_per_shard=4096,
    )
    return train, test


def _acts_cfg(shards):
    return OrderedConfig(shards=shards, layer=1, batch_size=64)


def test_random_method_end_to_end(seg_shards, tmp_path):
    train, test = seg_shards
    cfg = evaluation.Config(
        method="random", n_prototypes=32,
        train_acts=_acts_cfg(train), test_acts=_acts_cfg(test),
        n_classes=3, n_fit=256, dump_to=tmp_path, output_format="both",
    )
    result = evaluation.worker_fn(cfg)
    assert result.n_prototypes == 32
    assert len(result.test_ap_per_class) == 3
    for ap in result.test_ap_per_class:
        assert np.isnan(ap) or 0.0 <= ap <= 1.0
    dumped = json.loads((tmp_path / "fishvista_random_32.json").read_text())
    assert dumped["method"] == "random"
    csv = (tmp_path / "fishvista_random_32.csv").read_text()
    assert csv.startswith("class,best_prototype,train_ap,test_ap")


def test_kmeans_method_fits_in_pipeline(seg_shards, tmp_path):
    train, test = seg_shards
    cfg = evaluation.Config(
        method="kmeans", n_prototypes=8,
        train_acts=_acts_cfg(train), test_acts=_acts_cfg(test),
        n_classes=3, n_fit=256, dump_to=tmp_path,
    )
    result = evaluation.worker_fn(cfg)
    assert result.method == "kmeans"
    assert result.n_prototypes == 8
    assert np.isfinite(result.mean_ap)


def test_sae_method(seg_shards, tmp_path):
    import jax

    from saev_tpu import nn
    from saev_tpu.nn import modeling

    train, test = seg_shards
    sae_cfg = modeling.SparseAutoencoderConfig(
        d_model=128, d_sae=64, activation=modeling.TopK(top_k=8)
    )
    params, state = modeling.init(sae_cfg, jax.random.key(0))
    ckpt = tmp_path / "sae.pt"
    nn.dump(ckpt, sae_cfg, params, state)

    scorer = saes.SparseAutoencoderScorer(str(ckpt))
    assert scorer.n_prototypes == 64
    s = scorer.transform(np.random.default_rng(0).normal(size=(16, 128)))
    assert s.shape == (16, 64)
    assert ((s != 0).sum(axis=1) == 8).all()  # TopK(8) eval L0

    cfg = evaluation.Config(
        method="sae", sae_ckpt=str(ckpt),
        train_acts=_acts_cfg(train), test_acts=_acts_cfg(test),
        n_classes=3, dump_to=tmp_path,
    )
    result = evaluation.worker_fn(cfg)
    assert result.n_prototypes == 64


def test_get_best_aps_finds_planted_prototype():
    """A prototype that perfectly ranks one class must be selected for it with
    train AP 1.0 and (same data) test AP 1.0."""
    rng = np.random.default_rng(0)
    n, k = 400, 16
    labels = rng.integers(0, 3, size=n)
    scores = rng.normal(size=(n, k)).astype(np.float32)
    scores[:, 5] = (labels == 1).astype(np.float32) + rng.normal(size=n) * 0.01
    best_idx, train_ap, test_ap = evaluation.get_best_aps(
        scores, labels, scores, labels, n_classes=3, chunk=4
    )
    assert best_idx[1] == 5
    assert train_ap[1] > 0.99
    assert test_ap[1] > 0.99


def test_make_keep_mask():
    m = utils.make_keep_mask(100, 10, seed=0)
    assert m.sum() == 10
    assert utils.make_keep_mask(100, -1, seed=0).all()
    assert utils.make_keep_mask(100, 200, seed=0).all()


def test_random_vectors_baseline_roundtrip():
    rv = baselines.RandomVectors(8, d=16, seed=1)
    x = np.random.default_rng(2).normal(size=(4, 16)).astype(np.float32)
    s = rv.transform(x)
    assert s.shape == (4, 8)
    rv2 = baselines.RandomVectors(8)
    rv2.load_state_dict(rv.state_dict())
    np.testing.assert_array_equal(rv2.transform(x), s)


def test_supervised_probe_grid(seg_shards, tmp_path):
    train, test = seg_shards
    cfg = supervised.Config(
        train_acts=_acts_cfg(train), test_acts=_acts_cfg(test),
        learning_rates=(1e-3,), weight_decays=(1e-4, 1e-3),
        n_train=512, batch_size=64, n_classes=3, dump_to=tmp_path,
    )
    out = supervised.worker_fn(cfg)
    assert out["n_probes"] == 2
    assert len(out["results"]) == 2
    assert np.isfinite(out["best"]["mean_ap"])
    dumped = json.loads((tmp_path / "fishvista_supervised.json").read_text())
    assert dumped["method"] == "supervised-linear"
