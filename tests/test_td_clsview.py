"""Classification-results view tests (mirror of reference
contrib/trait_discovery/notebooks/004_fishbase_cls.py: results frames,
decision-tree rule rendering, per-class top-latent tables, shared latents)."""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(
    0, str(pathlib.Path(__file__).parent.parent / "contrib" / "trait_discovery" / "src")
)

from conftest import _Helpers as helpers
from tdiscovery import classification as cls_mod
from tdiscovery import clsview


@pytest.fixture()
def cls_run(tmp_path, monkeypatch):
    """A run with trained linear + tree heads and their eval artifacts."""
    import jax

    from saev_tpu import disk, nn
    from saev_tpu.data import Metadata, OrderedConfig, fake_vit
    from saev_tpu.framework import inference
    from saev_tpu.nn import modeling

    shards_dir = helpers.write_shards(tmp_path, n_examples=12, layers=(0,))
    runs_root = helpers.tmp_runs_root(tmp_path)
    run = disk.Run.new(
        "viewrun", train_shards_dir=shards_dir, val_shards_dir=shards_dir,
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

    md = Metadata.load(shards_dir)
    fake_labels = ["a" if i % 2 == 0 else "b" for i in range(md.n_examples)]
    monkeypatch.setattr(
        cls_mod, "load_image_labels",
        lambda shards: (["class"], {"class": fake_labels}),
    )
    task = cls_mod.LabelGrouping(name="parity", source_col="class")
    for head in (cls_mod.SparseLinear(C=1.0), cls_mod.DecisionTree(max_depth=3)):
        cls_mod.train_worker_fn(cls_mod.TrainConfig(
            run=run.run_dir, train_shards=shards_dir, test_shards=shards_dir,
            task=task, cls=head,
        ))
        cls_mod.eval_worker_fn(cls_mod.EvalConfig(
            run=run.run_dir, test_shards=shards_dir, task=task, cls=head,
        ))
    return run, shards_dir, runs_root


def test_cls_results_fpaths_and_df(cls_run):
    run, shards_dir, runs_root = cls_run
    fpaths = clsview.cls_results_fpaths(run.run_dir)
    assert len(fpaths) == 1  # both heads write the same task artifact
    assert fpaths[0].name == "classification_parity.json"

    df = clsview.load_cls_results_df([run.run_dir])
    assert len(df) == 1
    row = df.iloc[0]
    assert row["run_id"] == "viewrun"
    assert row["task"] == "parity"
    assert row["n_classes"] == 2
    assert 0.0 <= row["accuracy"] <= 1.0
    assert 0.0 <= row["mean_ap"] <= 1.0

    per_class = clsview.load_cls_results_df([run.run_dir], per_class=True)
    assert len(per_class) == 2
    assert set(per_class["class_name"]) == {"a", "b"}
    assert all(len(t) > 0 for t in per_class["top_latents"])
    # Non-run dirs are skipped without raising.
    empty = clsview.load_cls_results_df([runs_root / "missing"])
    assert len(empty) == 0


def test_tree_rules_renders_latent_thresholds():
    import sklearn.tree

    rng = np.random.default_rng(0)
    x = rng.uniform(size=(64, 8)).astype(np.float32)
    y = (x[:, 2] > 0.5).astype(int)  # latent 2 separates the classes
    clf = sklearn.tree.DecisionTreeClassifier(max_depth=3, random_state=0).fit(x, y)
    text = clsview.tree_rules(clf, ["a", "b"])
    assert "latent 2" in text
    assert "class: a" in text and "class: b" in text
    # Depth limiting keeps the render bounded.
    short = clsview.tree_rules(clf, ["a", "b"], max_depth=1)
    assert len(short) <= len(text)


def test_tree_rules_on_trained_head_checkpoint(cls_run):
    """The checkpointed tree head renders without error (fake-backend trees
    may be a single leaf; the render must still show a class)."""
    run, _, _ = cls_run
    tree_ckpts = list(run.inference.glob("*/cls_*depth*.pkl"))
    assert tree_ckpts
    header, payload = cls_mod.load_classifier_checkpoint(tree_ckpts[0])
    text = clsview.tree_rules(payload["classifier"], header["class_names"])
    assert "class: a" in text or "class: b" in text


def test_top_latents_table_and_shared(cls_run):
    import json

    run, shards_dir, _ = cls_run
    art = next(iter(clsview.cls_results_fpaths(run.run_dir)))
    results = json.loads(art.read_text())
    table = clsview.top_latents_table(results, k=5)
    assert list(table.columns) == ["class_idx", "class_name", "ap", "top_latents"]
    assert len(table) == 2
    assert (table["ap"].iloc[0] >= table["ap"].iloc[1])  # sorted desc
    assert all(len(t) <= 5 for t in table["top_latents"])

    shared = clsview.shared_latents(results, k=16)
    for latent, names in shared.items():
        assert isinstance(latent, int) and len(names) > 1


def test_mimics_discovery_reads_real_checkpoint_headers(cls_run):
    """mimics.checkpoints must parse the ACTUAL header schema the
    classification writer emits (cfg/cls/key/C + test_acc) — a synthetic
    header can't catch writer drift."""
    sys.path.insert(
        0, str(pathlib.Path(__file__).parent.parent / "contrib" / "mimics" / "src")
    )
    from mimics import checkpoints

    run, shards_dir, runs_root = cls_run
    rows = checkpoints.discover_checkpoints(checkpoints.DiscoverCheckpointsConfig(
        run_root_dpath=runs_root, shard_id=shards_dir.name, task_name="parity",
    ))
    by_type = {r["cls_type"]: r for r in rows}
    assert set(by_type) == {"sparse-linear", "decision-tree"}
    lin = by_type["sparse-linear"]
    assert lin["c_value"] == pytest.approx(1.0)
    assert lin["test_acc"] is not None and 0.0 <= lin["test_acc"] <= 1.0
    # The C filter works against the real header.
    only = checkpoints.discover_checkpoints(checkpoints.DiscoverCheckpointsConfig(
        run_root_dpath=runs_root, shard_id=shards_dir.name, task_name="parity",
        c_values=(1.0,),
    ))
    assert [r["cls_type"] for r in only] == ["sparse-linear"]


def test_latent_class_matrix_binary_expansion():
    class FakeClf:
        coef_ = np.array([[1.0, -2.0, 0.0]])
        classes_ = np.array([0, 1])

    mat = clsview.latent_class_matrix(FakeClf(), 2)
    np.testing.assert_allclose(mat[0], [-1.0, 2.0, 0.0])
    np.testing.assert_allclose(mat[1], [1.0, -2.0, 0.0])

    class Multi:
        coef_ = np.array([[1.0, 0.0], [0.0, 1.0]])
        classes_ = np.array([0, 2])

    mat = clsview.latent_class_matrix(Multi(), 3)
    np.testing.assert_allclose(mat[1], [0.0, 0.0])  # absent class stays zero
    np.testing.assert_allclose(mat[2], [0.0, 1.0])
