"""Classification-head tests (mirror of reference trait_discovery
classification coverage: aggregation, grouping, train/eval round trip)."""

import pathlib
import sys

import numpy as np
import pytest
import scipy.sparse

sys.path.insert(
    0, str(pathlib.Path(__file__).parent.parent / "contrib" / "trait_discovery" / "src")
)

from conftest import _Helpers as helpers
from tdiscovery import classification as cls_mod


def test_aggregate_to_images_mean_and_max():
    acts = scipy.sparse.csr_matrix(
        np.array(
            [[1.0, 0.0], [3.0, 2.0], [0.0, 0.0], [5.0, 4.0]], dtype=np.float32
        )
    )
    mean = cls_mod.aggregate_to_images(acts, 2, cls_mod.PatchAgg.MEAN)
    np.testing.assert_allclose(mean, [[2.0, 1.0], [2.5, 2.0]])
    mx = cls_mod.aggregate_to_images(acts, 2, cls_mod.PatchAgg.MAX)
    np.testing.assert_allclose(mx, [[3.0, 2.0], [5.0, 4.0]])


def test_label_grouping():
    g = cls_mod.LabelGrouping(name="t", source_col="class")
    y, names = g.apply(["cat", "dog", "cat"])
    assert names == ["cat", "dog"]
    np.testing.assert_array_equal(y, [0, 1, 0])

    g = cls_mod.LabelGrouping(
        name="t", source_col="class",
        groups={"pets": ["cat", "dog"], "wild": ["wolf"]},
    )
    y, names = g.apply(["cat", "wolf", "parrot", "dog"])
    assert names == ["pets", "wild"]
    np.testing.assert_array_equal(y, [0, 1, -1, 0])


@pytest.mark.parametrize("head", [cls_mod.SparseLinear(C=1.0), cls_mod.DecisionTree()])
def test_train_eval_roundtrip(tmp_path, monkeypatch, head):
    import jax

    from saev_tpu import disk, nn
    from saev_tpu.data import Metadata, OrderedConfig, fake_vit
    from saev_tpu.framework import inference
    from saev_tpu.nn import modeling

    shards_dir = helpers.write_shards(tmp_path, n_examples=12, layers=(0,))
    md = Metadata.load(shards_dir)
    runs_root = helpers.tmp_runs_root(tmp_path)
    run = disk.Run.new(
        "clsrun", train_shards_dir=shards_dir, val_shards_dir=shards_dir,
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

    # FakeImg has a single label; inject a 2-class labeling for the head.
    fake_labels = ["a" if i % 2 == 0 else "b" for i in range(md.n_examples)]
    monkeypatch.setattr(
        cls_mod, "load_image_labels", lambda shards, col: fake_labels
    )

    task = cls_mod.LabelGrouping(name="parity", source_col="class")
    rc = cls_mod.train_worker_fn(
        cls_mod.TrainConfig(
            run=run.run_dir, train_shards=shards_dir, test_shards=shards_dir,
            task=task, cls=head,
        )
    )
    assert rc == 0
    assert (run.ckpt.parent / "classifier_parity.pkl").exists()

    results = cls_mod.eval_worker_fn(
        cls_mod.EvalConfig(run=run.run_dir, test_shards=shards_dir, task=task)
    )
    assert 0.0 <= results["accuracy"] <= 1.0
    assert len(results["ap_per_class"]) == 2
    assert len(results["top_features_per_class"]) == 2
    out = run.inference / md.hash / "classification_parity.json"
    assert out.exists()


def test_load_image_labels_fake(tmp_path):
    shards_dir = helpers.write_shards(tmp_path, n_examples=4, layers=(0,))
    labels = cls_mod.load_image_labels(shards_dir, "class")
    assert labels == ["dummy"] * 4
