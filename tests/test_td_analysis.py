"""Trait-discovery analysis layer: runs root → validated DataFrame → figure/
hypothesis batteries, with CONTENT assertions (hand-computed probe R, purity,
fitted slopes), mirroring the research logic of the reference's notebooks
(metrics.py, figures.py, 006_proposal_audit.py)."""

import json
import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(
    0, str(pathlib.Path(__file__).parent.parent / "contrib" / "trait_discovery" / "src")
)

from conftest import _Helpers as helpers  # noqa: E402
from tdiscovery import analysis, audit_analysis, figplots  # noqa: E402

D_MODEL, N_LATENTS, N_CLASSES, TOKENS = 16, 8, 3, 4


def _write_shards(tmp_path, split: str, n_examples: int = 6, seed: int = 0):
    """A real shard dir via our ShardWriter whose embedded dataset config
    carries a train/val split label, plus a labels.bin."""
    from saev_tpu.data import datasets, shards

    root = helpers.tmp_shards_root(tmp_path)
    data_cfg = datasets.ImgSegFolder(
        root=pathlib.Path(f"./data/fake-{split}"), split=split
    )
    md = shards.Metadata(
        family="fake-clip",
        ckpt="analysis-test",
        layers=(0,),
        content_tokens_per_example=TOKENS,
        cls_token=True,
        d_model=D_MODEL,
        n_examples=n_examples,
        max_tokens_per_shard=n_examples * (TOKENS + 1),
        data=shards.encode_dataset_cfg(data_cfg),
        dataset=pathlib.Path("fake"),
    )
    md.dump(root)
    rng = np.random.default_rng(seed)
    acts = rng.normal(size=(n_examples, 1, TOKENS + 1, D_MODEL)).astype(np.float32)
    labels = rng.integers(0, N_CLASSES, size=(n_examples, TOKENS)).astype(np.uint8)
    with shards.ShardWriter(root, md) as writer:
        writer.write_batch(acts, 0, patch_labels=labels)
    return root / md.hash, labels


def _make_run(runs_root, train_shards, val_shards, run_id, *, layer=0, top_k=4,
              loss_seed=0, nmse=0.25, ap=None):
    """A run dir with planted probe/inference artifacts (no training)."""
    from saev_tpu import disk

    run = disk.Run.new(
        run_id, train_shards_dir=train_shards, val_shards_dir=val_shards,
        runs_root=runs_root,
    )
    cfg = {
        "train_data": {"shards": str(train_shards), "layer": layer},
        "val_data": {"shards": str(val_shards), "layer": layer},
        "sae": {"d_model": D_MODEL, "d_sae": N_LATENTS,
                "activation": {"key": "top-k", "top_k": top_k}},
        "objective": {"n_prefixes": 1},
        "lr": 1e-3,
    }
    (run.run_dir / "checkpoint" / "config.json").write_text(json.dumps(cfg))

    rng = np.random.default_rng(loss_seed)
    train_loss = rng.uniform(0.1, 1.0, size=(N_LATENTS, N_CLASSES)).astype(np.float32)
    val_loss = train_loss + 0.05
    weights = rng.normal(size=(N_LATENTS, N_CLASSES)).astype(np.float32)
    biases = np.zeros_like(weights)
    for shards_dir, loss in ((train_shards, train_loss), (val_shards, val_loss)):
        art = run.inference / shards_dir.name
        art.mkdir(parents=True, exist_ok=True)
        np.savez(art / "probe1d_metrics.npz", loss=loss, weights=weights,
                 biases=biases)
        (art / "metrics.json").write_text(
            json.dumps({"normalized_mse": nmse, "n_tokens": 24})
        )

    ap_c = np.asarray(ap if ap is not None else [0.9, 0.4, 0.6], np.float32)
    top_labels = np.tile(
        np.asarray([0, 0, 0, 1] * 4, np.uint8), (N_LATENTS, 1)
    )  # purity@16 = 12/16 for every latent
    np.savez(
        run.inference / val_shards.name
        / f"probe1d_metrics__train-{train_shards.name}.npz",
        ap=ap_c,
        precision=np.full(N_CLASSES, 0.5, np.float32),
        recall=np.full(N_CLASSES, 0.25, np.float32),
        f1=np.full(N_CLASSES, 1 / 3, np.float32),
        top_labels=top_labels,
    )
    return run, train_loss, val_loss, weights, ap_c


@pytest.fixture()
def analysis_setup(tmp_path):
    train_shards, train_labels = _write_shards(tmp_path / "tr", "training", seed=0)
    val_shards, val_labels = _write_shards(tmp_path / "va", "validation", seed=1)
    # One shards_root holding both (the analysis layer resolves by hash name).
    shards_root = tmp_path / "all" / "saev" / "shards"
    shards_root.mkdir(parents=True)
    for src in (train_shards, val_shards):
        (shards_root / src.name).symlink_to(src)
    runs_root = helpers.tmp_runs_root(tmp_path)
    return shards_root, runs_root, train_shards, val_shards, train_labels, val_labels


def test_baseline_ce_matches_entropy_formula(analysis_setup):
    shards_root, _, train_shards, _, train_labels, _ = analysis_setup
    ce = analysis.baseline_ce(train_shards)
    flat = train_labels.reshape(-1)
    for c in range(N_CLASSES):
        p = (flat == c).mean()
        want = -(p * np.log(p) + (1 - p) * np.log(1 - p)) if 0 < p < 1 else 0.0
        np.testing.assert_allclose(ce[c], want, rtol=1e-6)


def test_probe_split_labels(analysis_setup):
    _, _, train_shards, val_shards, _, _ = analysis_setup
    assert analysis.probe_split_label(train_shards) == "train"
    assert analysis.probe_split_label(val_shards) == "val"


def test_load_probe_results_df_content(analysis_setup):
    shards_root, runs_root, train_shards, val_shards, _, _ = analysis_setup
    _, train_loss, val_loss, weights, ap_c = _make_run(
        runs_root, train_shards, val_shards, "run00001", layer=2, nmse=0.25
    )
    _make_run(runs_root, train_shards, val_shards, "run00002", layer=5,
              loss_seed=7, nmse=0.5, ap=[0.2, 0.2, 0.8])

    df = analysis.load_probe_results_df(runs_root, shards_root)
    assert len(df) == 2
    analysis.validate_df(df)

    row = df[df["run_id"] == "run00001"].iloc[0]
    assert row["layer"] == 2
    assert row["model"] == "Fake CLIP (test)"
    assert row["objective"] == "vanilla"
    assert row["train_probe_shards"] == train_shards.name
    assert row["val_probe_shards"] == val_shards.name

    # Hand-compute the probe R math the reference pins (metrics.py:258-327).
    best_i = np.argmin(train_loss, axis=0)
    cols = np.arange(N_CLASSES)
    train_ce = train_loss[best_i, cols].mean()
    val_ce = val_loss[best_i, cols].mean()
    train_base = analysis.baseline_ce(train_shards).mean()
    val_base = analysis.baseline_ce(val_shards).mean()
    np.testing.assert_allclose(row["train_probe_ce"], train_ce, rtol=1e-6)
    np.testing.assert_allclose(row["train_probe_r"], 1 - train_ce / train_base,
                               rtol=1e-6)
    np.testing.assert_allclose(row["val_probe_r"], 1 - val_ce / val_base, rtol=1e-6)
    np.testing.assert_allclose(row["frac_w_neg"], (weights < 0).mean(), rtol=1e-6)
    np.testing.assert_allclose(
        row["frac_best_w_neg"], (weights[best_i, cols] < 0).mean(), atol=1e-9
    )

    # Coverage + mAP from the planted AP vector; purity from planted labels.
    np.testing.assert_allclose(row["val_mean_ap"], ap_c.mean(), rtol=1e-6)
    np.testing.assert_allclose(row["cov_at_0_5"], (ap_c > 0.5).mean(), rtol=1e-6)
    np.testing.assert_allclose(row["val_mean_purity_16"], 12 / 16, rtol=1e-6)
    np.testing.assert_allclose(row["train_nmse"], 0.25, rtol=1e-9)

    row2 = df[df["run_id"] == "run00002"].iloc[0]
    np.testing.assert_allclose(row2["cov_at_0_5"], 1 / 3, rtol=1e-6)


def test_validate_df_names_bad_column(analysis_setup):
    shards_root, runs_root, train_shards, val_shards, _, _ = analysis_setup
    _make_run(runs_root, train_shards, val_shards, "run00001")
    df = analysis.load_probe_results_df(runs_root, shards_root)
    df.loc[:, "val_mean_ap"] = 3.5
    with pytest.raises(ValueError, match="val_mean_ap"):
        analysis.validate_df(df)


def test_runs_without_both_splits_are_skipped(analysis_setup, caplog):
    shards_root, runs_root, train_shards, _, _, _ = analysis_setup
    # val links to the SAME train-split shards -> no "val" probe -> skipped.
    _make_run(runs_root, train_shards, train_shards, "trainonly")
    df = analysis.load_probe_results_df(runs_root, shards_root)
    assert len(df) == 0


def test_figure_battery_contents(analysis_setup):
    shards_root, runs_root, train_shards, val_shards, _, _ = analysis_setup
    for i, (layer, nmse) in enumerate([(0, 0.2), (0, 0.4), (3, 0.3)]):
        _make_run(runs_root, train_shards, val_shards, f"run0000{i}",
                  layer=layer, loss_seed=i, nmse=nmse, ap=[0.1 * (i + 1)] * 3)
    df = analysis.load_probe_results_df(runs_root, shards_root)

    fig, sub = figplots.fig_overfitting(df)
    assert len(fig.axes) == 2
    # The CE panel's first scatter holds exactly the df's CE pairs.
    # collections: [0] the fill_between band, [1] the probe-CE scatter.
    offsets = fig.axes[0].collections[1].get_offsets()
    np.testing.assert_allclose(
        np.sort(np.asarray(offsets)[:, 0]), np.sort(sub["train_probe_ce"])
    )

    fig, plotted = figplots.fig_layerwise_explained_variance(
        df, model="Fake CLIP (test)", layers=[0, 3], n_layers=6
    )
    assert set(plotted) == {0, 3}
    xs0, ys0 = plotted[0]
    want = df[df["layer"] == 0]
    np.testing.assert_allclose(np.sort(xs0), np.sort(1 - want["val_nmse"]))
    np.testing.assert_allclose(np.sort(ys0), np.sort(want["val_probe_r"]))
    assert len(fig.axes) == 2

    df2 = df.assign(sae_val_l0=[4.0, 8.0, 16.0])
    fig, frontiers = figplots.fig_tradeoff(df2)
    mask = frontiers["Fake CLIP (test)"]
    # Hand-check the frontier on (l0, nmse): (4,.2) and (... ) minimize both.
    sub2 = df2.dropna(subset=["sae_val_l0", "val_nmse"])
    from tdiscovery.runs import pareto_front

    np.testing.assert_array_equal(
        mask, pareto_front(sub2["sae_val_l0"].to_numpy(), sub2["val_nmse"].to_numpy())
    )

    table = figplots.table_sae_variants(df)
    assert list(table["method"]) == ["vanilla"]
    # picks the max-mAP run (run00002 has ap=0.3 mean)
    assert table.iloc[0]["run_id"] == "run00002"

    table2 = figplots.comparison_table(
        df, [("present", {"model": "Fake CLIP (test)"}), ("absent", {"model": "nope"})]
    )
    import pandas as pd

    assert pd.isna(table2.iloc[1]["run_id"])  # null row for missing method


def _plant_audit(run, val_shards, entries):
    art = run.inference / val_shards.name
    art.mkdir(parents=True, exist_ok=True)
    (art / "audit_results.json").write_text(json.dumps({
        "run": str(run.run_dir), "test_shards": val_shards.name,
        "max_budget": 100, "n_features_evaluated": 12, "n_seg_classes": 3,
        "ignore_label_ids": [0], "d_sae": N_LATENTS, "classifiers": entries,
    }))


def _cls_entry(cls_type, y3, y10, y30, n_nonzero):
    ys = {"3": y3, "10": y10, "30": y30, "100": min(1.0, y30 + 0.1)}
    return {
        "cls_checkpoint": "/nonexistent.bin", "cls_type": cls_type,
        "n_nonzero_importance": n_nonzero, "tau": 0.3,
        "budgets": [3, 10, 30, 100], "yield_at_b": ys,
        "auc_b": sum(ys.values()) / 4,
    }


def test_audit_frames_and_hypothesis_battery(analysis_setup, tmp_path):
    shards_root, runs_root, train_shards, val_shards, _, _ = analysis_setup
    # Layer 0 yields low, layer 4 yields high -> positive slope, r^2 = 1 for
    # the planted per-layer means.
    plan = [
        ("runA", 0, [("decision-tree", 0.2, 0.3, 0.4, 10)]),
        ("runB", 4, [("sparse-linear", 0.6, 0.7, 0.8, 100)]),
    ]
    run_dirs = []
    for run_id, layer, entries in plan:
        run, *_ = _make_run(runs_root, train_shards, val_shards, run_id,
                            layer=layer)
        _plant_audit(run, val_shards, [_cls_entry(*e) for e in entries])
        run_dirs.append(run.run_dir)

    sae_df, clf_df = audit_analysis.load_audit_frames(run_dirs)
    assert len(sae_df) == 2 and len(clf_df) == 2
    assert "is_pareto" in sae_df.columns

    adf = audit_analysis.analysis_frame(clf_df)
    assert len(adf) == 2
    np.testing.assert_allclose(sorted(adf["y10"]), [0.3, 0.7])

    fig, stats = audit_analysis.hyp_layer_yield(adf)
    # Two points (0, 0.3), (4, 0.7) -> slope 0.1, perfect fit.
    np.testing.assert_allclose(stats["y10"]["slope"], 0.1, rtol=1e-6)
    np.testing.assert_allclose(stats["y10"]["r_squared"], 1.0, rtol=1e-6)
    assert stats["n_per_layer"] == {0: 1, 4: 1}

    fig, stats = audit_analysis.hyp_clf_type(adf)
    assert stats["n_per_clf"] == {"decision-tree": 1, "sparse-linear": 1}
    np.testing.assert_allclose(stats["mean_yield"]["y3"]["decision-tree"], 0.2)

    fig, stats = audit_analysis.hyp_nonzero_yield(adf)
    # y10 increases with n_nonzero (10 -> 0.3, 100 -> 0.7): r = 1 on 2 points.
    np.testing.assert_allclose(stats["y10"]["r"], 1.0, rtol=1e-6)

    fig, agg = audit_analysis.hyp_layer_clf_interaction(adf)
    assert len(agg) == 2

    best = audit_analysis.hyp_best_configs(adf, n=1)
    np.testing.assert_allclose(best.iloc[0]["y10"], 0.7)

    fig, corr = audit_analysis.hyp_corr_heatmap(adf)
    np.testing.assert_allclose(corr.loc["y10", "y30"], 1.0, rtol=1e-6)

    out = tmp_path / "battery"
    results = audit_analysis.run_battery(run_dirs, out)
    assert results["n_clf"] == 2
    assert (out / "audit_stats.json").exists()
    assert (out / "h1_layer_yield.pdf").exists()
    assert (out / "h9_corr.pdf").exists()


def test_auc_over_yield_curve(analysis_setup):
    shards_root, runs_root, train_shards, val_shards, _, _ = analysis_setup
    run, *_ = _make_run(runs_root, train_shards, val_shards, "runA")
    _plant_audit(run, val_shards, [
        _cls_entry("decision-tree", 0.2, 0.4, 0.6, 10),
        _cls_entry("decision-tree", 0.4, 0.6, 0.8, 20),
    ])
    _, clf_df = audit_analysis.load_audit_frames([run.run_dir])
    fig, agg = audit_analysis.fig_auc_over_yield(clf_df)
    at10 = agg[(agg["clf_type"] == "decision-tree") & (agg["budget"] == 10)]
    np.testing.assert_allclose(at10["yield"].iloc[0], 0.5, rtol=1e-6)


def test_latent_vs_purity_figure(analysis_setup):
    shards_root, runs_root, train_shards, val_shards, _, _ = analysis_setup
    run, train_loss, *_ = _make_run(runs_root, train_shards, val_shards, "runA")
    fig, (loss_c, purity_c) = figplots.fig_latent_vs_purity(
        run.run_dir, train_shards.name, val_shards.name
    )
    best_i = np.argmin(train_loss, axis=0)
    np.testing.assert_allclose(
        loss_c, train_loss[best_i, np.arange(N_CLASSES)], rtol=1e-6
    )
    np.testing.assert_allclose(purity_c, [12 / 16] * N_CLASSES)


def test_analysis_on_real_pipeline(tmp_path):
    """Integration: real inference + probe1d + metrics workers on split-tagged
    shards, then the analysis df over the resulting run dir."""
    import jax

    from saev_tpu import disk, nn
    from saev_tpu.data import OrderedConfig
    from saev_tpu.framework import inference
    from tdiscovery import metrics as td_metrics
    from tdiscovery import probe1d

    train_shards, _ = _write_shards(tmp_path / "tr", "training", n_examples=8)
    val_shards, _ = _write_shards(tmp_path / "va", "validation", n_examples=8,
                                  seed=3)
    shards_root = tmp_path / "all" / "saev" / "shards"
    shards_root.mkdir(parents=True)
    for src in (train_shards, val_shards):
        (shards_root / src.name).symlink_to(src)
    runs_root = helpers.tmp_runs_root(tmp_path)

    run = disk.Run.new(
        "realrun", train_shards_dir=train_shards, val_shards_dir=val_shards,
        runs_root=runs_root,
    )
    from saev_tpu.nn import modeling

    cfg = modeling.SparseAutoencoderConfig(
        d_model=D_MODEL, d_sae=N_LATENTS, activation=modeling.TopK(top_k=3)
    )
    params, state = modeling.init(cfg, jax.random.key(0))
    nn.dump(run.ckpt, cfg, params, state)
    (run.run_dir / "checkpoint" / "config.json").write_text(json.dumps({
        "train_data": {"layer": 0}, "val_data": {"layer": 0},
        "sae": {"d_sae": N_LATENTS, "activation": {"key": "top-k", "top_k": 3}},
        "objective": {"n_prefixes": 1}, "lr": 1e-3,
    }))

    for shards_dir in (train_shards, val_shards):
        inference.worker_fn(inference.Config(
            run=run.run_dir,
            data=OrderedConfig(shards=shards_dir, layer=0, batch_size=20),
            device="cpu",
        ))
    probe1d.worker_fn(probe1d.Config(
        run=run.run_dir, train_shards=train_shards, test_shards=val_shards,
        max_iter=20,
    ))
    td_metrics.worker_fn(td_metrics.Config(
        run=run.run_dir, train_shards=train_shards, test_shards=val_shards,
        max_k=16,
    ))

    df = analysis.load_probe_results_df(runs_root, shards_root)
    assert len(df) == 1
    analysis.validate_df(df)
    row = df.iloc[0]
    assert row["run_id"] == "realrun"
    assert np.isfinite(row["val_probe_r"])
    assert 0 <= row["val_mean_ap"] <= 1
    assert row["val_nmse"] != 1.0  # metrics.json was actually read


# ---------------------------------------------------------------------------
# Baseline probe-results frame (reference notebooks/baselines.py:139-328)
# ---------------------------------------------------------------------------


def _make_baseline_run(runs_root, train_shards, val_shards, run_id, *,
                       method="kmeans", k=N_LATENTS, inertia=12.5, mse=0.7,
                       loss_seed=0):
    """A baseline run: checkpoint/baseline.pt header + probe artifacts, no
    config.json (baseline runs never have one)."""
    from saev_tpu import disk

    run = disk.Run.new(
        run_id, train_shards_dir=train_shards, val_shards_dir=val_shards,
        runs_root=runs_root,
    )
    metrics = (
        {"eval/inertia": inertia} if method == "kmeans" else {"eval/mse": mse}
    )
    header = {"schema": 1, "method": method, "k": k, "metrics": metrics}
    ckpt = run.run_dir / "checkpoint" / "baseline.pt"
    ckpt.write_bytes((json.dumps(header) + "\n").encode() + b"\x00")

    rng = np.random.default_rng(loss_seed)
    train_loss = rng.uniform(0.1, 1.0, size=(N_LATENTS, N_CLASSES)).astype(np.float32)
    val_loss = train_loss + 0.05
    weights = rng.normal(size=(N_LATENTS, N_CLASSES)).astype(np.float32)
    for shards_dir, loss in ((train_shards, train_loss), (val_shards, val_loss)):
        art = run.inference / shards_dir.name
        art.mkdir(parents=True, exist_ok=True)
        np.savez(art / "probe1d_metrics.npz", loss=loss, weights=weights,
                 biases=np.zeros_like(weights))
        (art / "metrics.json").write_text(
            json.dumps({"normalized_mse": 0.5, "n_tokens": 24})
        )
    return run


def test_load_baseline_probe_results_df(tmp_path):
    train_shards, _ = _write_shards(tmp_path, "train", seed=1)
    val_shards, _ = _write_shards(tmp_path, "val", seed=2)
    runs_root = helpers.tmp_runs_root(tmp_path)
    _make_baseline_run(runs_root, train_shards, val_shards, "km1",
                       method="kmeans", inertia=12.5)
    _make_baseline_run(runs_root, train_shards, val_shards, "pca1",
                       method="pca", k=6, mse=0.7, loss_seed=3)
    # An SAE run (config.json, no baseline.pt) must NOT appear.
    _make_run(runs_root, train_shards, val_shards, "sae1")

    df = analysis.load_baseline_probe_results_df(
        runs_root, train_shards.parent
    )
    assert sorted(df["run_id"]) == ["km1", "pca1"]
    km = df[df["run_id"] == "km1"].iloc[0]
    assert km["method"] == "k-means"
    assert km["fit_val_mse"] == pytest.approx(12.5)
    assert km["fit_val_l0"] == 1.0
    pca = df[df["run_id"] == "pca1"].iloc[0]
    assert pca["method"] == "pca"
    assert pca["fit_val_mse"] == pytest.approx(0.7)
    assert pca["fit_val_l0"] == 6.0
    # Downstream columns share the SAE frame's semantics.
    assert 0 <= km["val_probe_ce"]
    assert km["train_probe_r"] == pytest.approx(
        1 - km["train_probe_ce"] / km["train_baseline_ce"]
    )
    assert km["val_nmse"] == pytest.approx(0.5)


def test_baseline_frame_feeds_comparison_table(tmp_path):
    """The frame slots into figplots.comparison_table for the SAE-vs-baseline
    tables (reference notebooks/baselines.py:336-433)."""
    train_shards, _ = _write_shards(tmp_path, "train", seed=4)
    val_shards, _ = _write_shards(tmp_path, "val", seed=5)
    runs_root = helpers.tmp_runs_root(tmp_path)
    _make_baseline_run(runs_root, train_shards, val_shards, "km1")
    df = analysis.load_baseline_probe_results_df(runs_root, train_shards.parent)
    table = figplots.comparison_table(
        df, [("k-means", {"method": "k-means"}), ("semi-nmf", {"method": "semi-nmf"})]
    )
    assert list(table["method"]) == ["k-means", "semi-nmf"]
    assert table.iloc[0]["run_id"] == "km1"
    import pandas as pd
    assert pd.isna(table.iloc[1]["run_id"])  # aligned null row for missing method
