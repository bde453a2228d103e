"""Trait-discovery metrics pipeline tests: probe worker → AP/purity evaluation
end-to-end on fake segmentation shards."""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(
    0, str(pathlib.Path(__file__).parent.parent / "contrib" / "trait_discovery" / "src")
)

from conftest import _Helpers as helpers
from tdiscovery import metrics as td_metrics
from tdiscovery import probe1d


def test_average_precision_known_values():
    scores = np.array([[0.9], [0.8], [0.3], [0.1]])
    labels = np.array([[1.0], [0.0], [1.0], [0.0]])
    ap = td_metrics.average_precision(scores, labels)
    # Ranked: pos, neg, pos, neg -> AP = (1/1 + 2/3)/2 = 5/6
    np.testing.assert_allclose(ap[0], 5 / 6, rtol=1e-9)

    # No positives -> NaN
    ap = td_metrics.average_precision(scores, np.zeros_like(labels))
    assert np.isnan(ap[0])


def test_purity_at_k():
    top = np.array([[1, 1, 1, 2], [3, 4, 5, 6]], dtype=np.uint8)
    p = td_metrics.purity_at_k(top, 4)
    np.testing.assert_allclose(p, [0.75, 0.25])


def test_loss_matrix_with_aux_confusion_counts():
    import scipy.sparse

    rng = np.random.default_rng(0)
    n, L, C = 200, 3, 2
    x = np.where(rng.uniform(size=(n, L)) < 0.4, np.abs(rng.normal(size=(n, L))), 0.0)
    y = np.zeros((n, C), dtype=np.float32)
    y[:, 0] = (x[:, 0] > 0.5).astype(np.float32)
    y[:, 1] = 1 - y[:, 0]
    probe = probe1d.Sparse1DProbe(n_latents=L, n_classes=C)
    probe.fit(scipy.sparse.csr_matrix(x.astype(np.float32)), y)
    loss, tp, fp, tn, fn = probe.loss_matrix_with_aux(
        scipy.sparse.csr_matrix(x.astype(np.float32)), y
    )
    # Cross-check against dense computation for every (latent, class).
    for l in range(L):
        for c in range(C):
            z = probe.intercept_[l, c] + probe.coef_[l, c] * x[:, l]
            pred = z > 0
            assert tp[l, c] == (pred & (y[:, c] > 0)).sum()
            assert fp[l, c] == (pred & (y[:, c] == 0)).sum()
            assert fn[l, c] == ((~pred) & (y[:, c] > 0)).sum()
            assert tn[l, c] == ((~pred) & (y[:, c] == 0)).sum()
    # Counts always total n.
    np.testing.assert_allclose(tp + fp + tn + fn, n)


def test_probe_and_metrics_pipeline(tmp_path):
    """Full flow on fake seg shards: inference -> probe worker -> AP metrics."""
    import jax

    from saev_tpu import disk, nn
    from saev_tpu.data import Metadata, OrderedConfig, fake_vit
    from saev_tpu.framework import inference
    from saev_tpu.nn import modeling

    shards_dir = helpers.write_shards(tmp_path, n_examples=8, layers=(0,), seg=True)
    md = Metadata.load(shards_dir)
    assert (shards_dir / "labels.bin").exists()

    runs_root = helpers.tmp_runs_root(tmp_path)
    run = disk.Run.new(
        "proberun", train_shards_dir=shards_dir, val_shards_dir=shards_dir,
        runs_root=runs_root,
    )
    cfg = modeling.SparseAutoencoderConfig(
        d_model=fake_vit.D_MODEL, d_sae=16, activation=modeling.TopK(top_k=3)
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

    rc = probe1d.worker_fn(
        probe1d.Config(
            run=run.run_dir, train_shards=shards_dir, test_shards=shards_dir,
            max_iter=20,
        )
    )
    assert rc == 0
    art = run.inference / md.hash
    with np.load(art / "probe1d_metrics.npz") as fd:
        assert fd["loss"].shape[0] == 16
        assert {"weights", "biases", "tp", "fp", "tn", "fn"} <= set(fd.files)

    results = td_metrics.worker_fn(
        td_metrics.Config(
            run=run.run_dir, train_shards=shards_dir, test_shards=shards_dir,
            max_k=16,
        )
    )
    assert 0.0 <= results["mean_ap"] <= 1.0
    assert "purity@16" in results
    assert (art / "trait_metrics.json").exists()
    # The analysis layer's npz artifact (reference metrics.py:262-271).
    with np.load(art / f"probe1d_metrics__train-{md.hash}.npz") as fd:
        assert {"ap", "precision", "recall", "f1", "top_labels"} <= set(fd.files)
        assert fd["ap"].shape == fd["precision"].shape
