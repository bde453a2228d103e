"""Classification-head tests (mirror of reference trait_discovery
classification coverage: aggregation, grouping, train/eval round trip, the
tie-aware audit AP, and the Yield@B audit protocol)."""

import itertools
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


def test_label_grouping_rejects_duplicates():
    g = cls_mod.LabelGrouping(
        name="t", source_col="class",
        groups={"a": ["cat"], "b": ["cat", "dog"]},
    )
    with pytest.raises(AssertionError, match="multiple|appears"):
        g.apply(["cat"])


# ---------------------------------------------------------------------------
# Audit AP math
# ---------------------------------------------------------------------------


def _standard_ap(scores, labels):
    order = np.argsort(-scores, kind="stable")
    lab = labels[order].astype(np.float64)
    tp = lab.cumsum()
    ranks = np.arange(1, len(lab) + 1)
    npos = lab.sum()
    return float(((tp / ranks) * lab).sum() / max(npos, 1.0))


def test_tie_aware_ap_no_ties_matches_standard():
    rng = np.random.default_rng(0)
    scores = rng.normal(size=50).astype(np.float32)
    labels = (rng.random((50, 3)) < 0.3).astype(np.float32)
    n_pos = labels.sum(axis=0)
    got = cls_mod.tie_aware_ap(scores, labels, n_pos)
    want = [_standard_ap(scores, labels[:, c]) for c in range(3)]
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_tie_aware_ap_exact_over_permutations():
    """On a tiny input, the tie-aware AP must equal the exact mean of the
    standard AP over ALL permutations within tie groups."""
    scores = np.array([2.0, 1.0, 1.0, 1.0, 0.0], dtype=np.float32)
    labels = np.array([0, 1, 0, 1, 1], dtype=np.float32)[:, None]
    n_pos = labels.sum(axis=0)

    got = float(cls_mod.tie_aware_ap(scores, labels, n_pos)[0])

    tied = [1, 2, 3]  # indices of the tie group
    aps = []
    for perm in itertools.permutations(tied):
        order = [0, *perm, 4]
        aps.append(_standard_ap(np.arange(5, 0, -1).astype(float), labels[order, 0]))
    np.testing.assert_allclose(got, np.mean(aps), rtol=1e-6)


def test_tie_aware_ap_monte_carlo():
    """Random data with heavy ties: tie-aware AP ~= mean standard AP under
    random tie-breaking noise."""
    rng = np.random.default_rng(1)
    scores = rng.integers(0, 4, size=200).astype(np.float32)  # heavy ties
    labels = (rng.random((200, 2)) < 0.2).astype(np.float32)
    n_pos = labels.sum(axis=0)
    got = cls_mod.tie_aware_ap(scores, labels, n_pos)

    trials = []
    for t in range(400):
        noisy = scores + rng.uniform(-1e-6, 1e-6, size=scores.shape)
        trials.append([_standard_ap(noisy, labels[:, c]) for c in range(2)])
    mc = np.mean(trials, axis=0)
    np.testing.assert_allclose(got, mc, atol=0.02)


def test_ap_batched_matches_standard():
    rng = np.random.default_rng(2)
    acts = rng.normal(size=(100, 5)).astype(np.float32)
    labels = (rng.random((100, 4)) < 0.25).astype(np.float32)
    n_pos = labels.sum(axis=0)
    got = cls_mod.ap_batched(acts, labels, n_pos)
    for j in range(5):
        want = [_standard_ap(acts[:, j], labels[:, c]) for c in range(4)]
        np.testing.assert_allclose(got[j], want, rtol=1e-5)


# ---------------------------------------------------------------------------
# End-to-end: train -> eval -> audit on fake shards
# ---------------------------------------------------------------------------


def _make_run(tmp_path, seg=False):
    import jax

    from saev_tpu import disk, nn
    from saev_tpu.data import OrderedConfig, fake_vit
    from saev_tpu.framework import inference
    from saev_tpu.nn import modeling

    shards_dir = helpers.write_shards(tmp_path, n_examples=12, layers=(0,), seg=seg)
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
    return run, shards_dir


@pytest.mark.parametrize("head", [cls_mod.SparseLinear(C=1.0), cls_mod.DecisionTree()])
def test_train_eval_roundtrip(tmp_path, monkeypatch, head):
    from saev_tpu.data import Metadata

    run, shards_dir = _make_run(tmp_path)
    md = Metadata.load(shards_dir)

    # FakeImg has a single label; inject a 2-class labeling for the head.
    fake_labels = ["a" if i % 2 == 0 else "b" for i in range(md.n_examples)]
    monkeypatch.setattr(
        cls_mod, "load_image_labels", lambda shards: (["class"], {"class": fake_labels})
    )

    task = cls_mod.LabelGrouping(name="parity", source_col="class")
    train_cfg = cls_mod.TrainConfig(
        run=run.run_dir, train_shards=shards_dir, test_shards=shards_dir,
        task=task, cls=head,
    )
    assert cls_mod.train_worker_fn(train_cfg) == 0

    # Reference checkpoint format: cls_{task}_{agg}_{cls}.pkl with a JSON
    # header line under the test inference dir.
    ckpt = cls_mod.ckpt_fpath(run, train_cfg)
    assert ckpt.exists() and ckpt.name.startswith("cls_parity_max_")
    header, payload = cls_mod.load_classifier_checkpoint(ckpt)
    assert header["n_classes"] == 2
    assert 0.0 <= header["test_acc"] <= 1.0
    assert "classifier" in payload and "test_pred" in payload

    results = cls_mod.eval_worker_fn(
        cls_mod.EvalConfig(
            run=run.run_dir, test_shards=shards_dir, task=task, cls=head
        )
    )
    assert 0.0 <= results["accuracy"] <= 1.0
    assert len(results["ap_per_class"]) == 2
    assert len(results["top_features_per_class"]) == 2
    out = run.inference / md.hash / "classification_parity.json"
    assert out.exists()


def test_audit_protocol(tmp_path, monkeypatch):
    """Train two heads on seg shards, audit their rankings: AP artifacts,
    Yield@B monotone bookkeeping, AUC_B present per checkpoint."""
    import json

    from saev_tpu.data import Metadata

    run, shards_dir = _make_run(tmp_path, seg=True)
    md = Metadata.load(shards_dir)
    fake_labels = ["a" if i % 2 == 0 else "b" for i in range(md.n_examples)]
    monkeypatch.setattr(
        cls_mod, "load_image_labels", lambda shards: (["class"], {"class": fake_labels})
    )
    task = cls_mod.LabelGrouping(name="aud", source_col="class")

    ckpts = []
    for head in (cls_mod.SparseLinear(C=1.0), cls_mod.DecisionTree()):
        cfg = cls_mod.TrainConfig(
            run=run.run_dir, train_shards=shards_dir, test_shards=shards_dir,
            task=task, cls=head,
        )
        assert cls_mod.train_worker_fn(cfg) == 0
        ckpts.append(cls_mod.ckpt_fpath(run, cfg))

    results = cls_mod.audit_worker_fn(
        cls_mod.AuditConfig(
            run=run.run_dir, test_shards=shards_dir,
            cls_checkpoints=tuple(ckpts),
            max_budget=16, budgets=(2, 4, 16), tau=0.1,
        )
    )
    art = run.inference / md.hash
    assert (art / "audit_ap_s.npy").exists()
    assert (art / "audit_best_class_s.npy").exists()
    assert (art / "audit_results.json").exists()

    saved = json.loads((art / "audit_results.json").read_text())
    assert saved["n_features_evaluated"] >= 1
    assert len(saved["classifiers"]) == 2
    for entry in saved["classifiers"]:
        assert set(entry["yield_at_b"]) == {"2", "4", "16"}
        assert 0.0 <= entry["auc_b"] <= 1.0

    ap = np.load(art / "audit_ap_s.npy")
    evaluated = ~np.isnan(ap)
    assert evaluated.sum() == saved["n_features_evaluated"]
    assert np.all(ap[evaluated] >= 0) and np.all(ap[evaluated] <= 1.0 + 1e-6)
    assert results["d_sae"] == 16


def test_load_image_labels_fake(tmp_path):
    shards_dir = helpers.write_shards(tmp_path, n_examples=4, layers=(0,))
    cols, labels = cls_mod.load_image_labels(shards_dir)
    assert cols == ["class"]
    assert labels["class"] == ["dummy"] * 4


def test_img_seg_folder_multi_column_labels(tmp_path):
    """ImgSegFolderDataset exposes every CSV column (reference multi-label
    FishVista tasks, classification.py:176-218)."""
    from PIL import Image

    from saev_tpu.data import datasets

    root = tmp_path / "segds"
    (root / "images" / "training").mkdir(parents=True)
    (root / "annotations" / "training").mkdir(parents=True)
    for stem in ("img0", "img1"):
        Image.new("RGB", (8, 8)).save(root / "images" / "training" / f"{stem}.png")
        Image.new("L", (8, 8)).save(root / "annotations" / "training" / f"{stem}.png")
    (root / "labels.csv").write_text(
        "stem,habitat,diet\nimg0,reef,algae\nimg1,pelagic,fish\n"
    )

    ds = datasets.ImgSegFolderDataset(
        datasets.ImgSegFolder(root=root, split="training")
    )
    assert ds.label_cols == ["habitat", "diet"]
    assert ds.sample_labels["img0"] == {"habitat": "reef", "diet": "algae"}
    assert ds.labels["img1"] == "pelagic"  # first column stays the default


# ---------------------------------------------------------------------------
# Figures/tables data interface (tdiscovery.runs + notebooks/figures.py)
# ---------------------------------------------------------------------------


def test_runspec_load_df_and_figures(tmp_path, monkeypatch):
    import importlib.util

    from saev_tpu.data import Metadata
    from tdiscovery.runs import RunSpec, load_df, pareto_front

    run, shards_dir = _make_run(tmp_path, seg=True)
    md = Metadata.load(shards_dir)
    fake_labels = ["a" if i % 2 == 0 else "b" for i in range(md.n_examples)]
    monkeypatch.setattr(
        cls_mod, "load_image_labels", lambda shards: (["class"], {"class": fake_labels})
    )
    task = cls_mod.LabelGrouping(name="fig", source_col="class")
    train_cfg = cls_mod.TrainConfig(
        run=run.run_dir, train_shards=shards_dir, test_shards=shards_dir, task=task,
        cls=cls_mod.SparseLinear(C=1.0),
    )
    cls_mod.train_worker_fn(train_cfg)
    cls_mod.eval_worker_fn(
        cls_mod.EvalConfig(
            run=run.run_dir, test_shards=shards_dir, task=task,
            cls=cls_mod.SparseLinear(C=1.0),
        )
    )
    cls_mod.audit_worker_fn(cls_mod.AuditConfig(
        run=run.run_dir, test_shards=shards_dir,
        cls_checkpoints=(cls_mod.ckpt_fpath(run, train_cfg),),
        max_budget=16, budgets=(4, 16), tau=0.1,
    ))

    # Training writes config.json beside the checkpoint; mimic it here.
    import json as json_mod

    (run.ckpt.parent / "config.json").write_text(json_mod.dumps({
        "sae": {"d_sae": 16, "activation": {"key": "top-k", "top_k": 3}},
        "lr": 4e-4, "optim": "adam", "seed": 0,
    }))

    specs = [
        RunSpec(run=run.run_dir, method="sae", note="hermetic"),
        RunSpec(run=tmp_path / "missing-run", method="sae"),
    ]
    df, skipped = load_df(specs)
    assert len(df) == 1 and len(skipped) == 1
    row = df.iloc[0]
    assert row["run_id"] == "clsrun"
    assert row["d_sae"] == 16 and row["activation"] == "top-k"
    assert f"{md.hash}/normalized_mse" in df.columns
    assert f"{md.hash}/cls_fig_accuracy" in df.columns
    assert f"{md.hash}/audit_auc_b" in df.columns

    # Figure functions produce pdf+csv artifacts from the same interface.
    fpath = (
        pathlib.Path(__file__).parent.parent
        / "contrib" / "trait_discovery" / "notebooks" / "figures.py"
    )
    spec = importlib.util.spec_from_file_location("td_figures", fpath)
    figures = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(figures)

    out = tmp_path / "figs"
    _, have, _, (pdf, csv) = figures.plot_pareto(
        specs[:1], md.hash, name="pareto_test", out=out
    )
    assert pdf.exists() and csv.exists() and len(have) == 1
    tidy, _ = figures.table_methods(specs[:1], md.hash, name="methods_test", out=out)
    assert (out / "methods_test.csv").exists()
    assert "run_id" in tidy.columns
    audit = figures.table_audit(specs[:1], md.hash, name="audit_test", out=out)
    assert len(audit) == 1 and "auc_b" in audit.columns

    # pareto_front: strictly dominated points are excluded.
    import numpy as np

    keep = pareto_front(np.array([1.0, 2.0, 3.0]), np.array([3.0, 1.0, 2.0]))
    assert keep.tolist() == [True, True, False]


def test_eval_with_absent_train_class(tmp_path, monkeypatch):
    """A 3-group task whose train split contains only 2 groups: sklearn fits a
    binary head, and eval must align coef_ rows via clf.classes_ instead of
    assuming one row per class_name (round-3 review regression)."""
    run, shards_dir = _make_run(tmp_path)

    # 12 images: groups a/b present, c empty (labels never say "cc").
    fake_labels = ["aa" if i % 2 == 0 else "bb" for i in range(12)]
    monkeypatch.setattr(
        cls_mod, "load_image_labels", lambda shards: (["class"], {"class": fake_labels})
    )
    task = cls_mod.LabelGrouping(
        name="absent", source_col="class",
        groups={"a": ["aa"], "b": ["bb"], "c": ["cc"]},
    )
    head = cls_mod.SparseLinear(C=1.0)
    assert cls_mod.train_worker_fn(cls_mod.TrainConfig(
        run=run.run_dir, train_shards=shards_dir, test_shards=shards_dir,
        task=task, cls=head,
    )) == 0

    results = cls_mod.eval_worker_fn(cls_mod.EvalConfig(
        run=run.run_dir, test_shards=shards_dir, task=task, cls=head,
    ))
    assert len(results["top_features_per_class"]) == 3
    for ranking in results["top_features_per_class"]:
        assert len(ranking) > 0
