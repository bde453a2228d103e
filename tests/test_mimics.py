"""Mimics contrib tests: max pooling, AUROC math, end-to-end scoring."""

import pathlib
import sys

import numpy as np
import pytest
import scipy.sparse

sys.path.insert(
    0, str(pathlib.Path(__file__).parent.parent / "contrib" / "mimics" / "src")
)

from conftest import _Helpers as helpers
from mimics import scoring


def test_max_pool_csr():
    acts = scipy.sparse.csr_matrix(
        np.array([[1.0, 0.0], [3.0, 2.0], [0.0, 5.0], [0.0, 4.0]], dtype=np.float32)
    )
    pooled = scoring.max_pool_csr(acts, 2, 2)
    np.testing.assert_allclose(pooled, [[3.0, 2.0], [0.0, 5.0]])


def test_auroc_known_values():
    # Perfect separation -> 1.0; inverted -> 0.0; random-ish -> 0.5.
    scores = np.array([[0.1, 0.9, 0.5], [0.2, 0.8, 0.5], [0.8, 0.2, 0.5], [0.9, 0.1, 0.5]])
    binary = np.array([0, 0, 1, 1], dtype=np.int8)
    auroc = scoring.auroc_per_latent(scores, binary)
    np.testing.assert_allclose(auroc, [1.0, 0.0, 0.5], atol=1e-9)


def test_auroc_matches_sklearn():
    sk = pytest.importorskip("sklearn.metrics")
    rng = np.random.default_rng(0)
    scores = rng.normal(size=(64, 7))
    scores[:, 2] = np.round(scores[:, 2])  # introduce ties
    binary = (rng.uniform(size=64) < 0.4).astype(np.int8)
    ours = scoring.auroc_per_latent(scores, binary, chunk=3)
    theirs = np.array([
        sk.roc_auc_score(binary, scores[:, j]) for j in range(7)
    ])
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_build_task_specs():
    labels = ["a"] * 12 + ["b"] * 12 + ["c"] * 3
    specs = scoring.build_task_specs(
        labels, pairs=[("a", "b"), ("a", "c")], min_samples=10
    )
    assert len(specs) == 1  # a_vs_c dropped (c has 3 < 10)
    assert specs[0].name == "a_vs_b"
    assert specs[0].n_pos == 12 and specs[0].n_neg == 12


def test_score_run_end_to_end(tmp_path):
    import jax

    from saev_tpu import disk, nn
    from saev_tpu.data import Metadata, OrderedConfig, fake_vit
    from saev_tpu.framework import inference
    from saev_tpu.nn import modeling

    shards_dir = helpers.write_shards(tmp_path, n_examples=24, layers=(0,))
    md = Metadata.load(shards_dir)
    runs_root = helpers.tmp_runs_root(tmp_path)
    run = disk.Run.new(
        "mimrun", train_shards_dir=shards_dir, val_shards_dir=shards_dir,
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
            data=OrderedConfig(shards=shards_dir, layer=0, batch_size=64),
            device="cpu",
        )
    )

    labels = tuple("erato" if i % 2 == 0 else "melpomene" for i in range(24))
    results = scoring.score_run(
        scoring.Config(
            run=run.run_dir, shards=shards_dir, labels=labels,
            pairs=(("erato", "melpomene"),), min_samples=5,
        )
    )
    assert "erato_vs_melpomene" in results
    task = results["erato_vs_melpomene"]
    assert 0.5 <= task["best_separation"] <= 1.0
    assert len(task["top10"]) == 10
    # Idempotent: second call reads the cached json.
    again = scoring.score_run(
        scoring.Config(
            run=run.run_dir, shards=shards_dir, labels=labels,
            pairs=(("erato", "melpomene"),), min_samples=5,
        )
    )
    assert again == results


def _scored_run(tmp_path, run_id, seed, shards_dir=None):
    """Run dir with inference + mimic scores over fake shards."""
    import jax

    from saev_tpu import disk, nn
    from saev_tpu.data import Metadata, OrderedConfig, fake_vit
    from saev_tpu.framework import inference
    from saev_tpu.nn import modeling

    if shards_dir is None:
        shards_dir = helpers.write_shards(tmp_path, n_examples=24, layers=(0,))
    runs_root = helpers.tmp_runs_root(tmp_path)
    run = disk.Run.new(
        run_id, train_shards_dir=shards_dir, val_shards_dir=shards_dir,
        runs_root=runs_root,
    )
    cfg = modeling.SparseAutoencoderConfig(
        d_model=fake_vit.D_MODEL, d_sae=16, activation=modeling.TopK(top_k=3)
    )
    params, state = modeling.init(cfg, jax.random.key(seed))
    nn.dump(run.ckpt, cfg, params, state)
    inference.worker_fn(
        inference.Config(
            run=run.run_dir,
            data=OrderedConfig(shards=shards_dir, layer=0, batch_size=64),
            device="cpu",
        )
    )
    labels = tuple("erato" if i % 2 == 0 else "melpomene" for i in range(24))
    scoring.score_run(scoring.Config(
        run=run.run_dir, shards=shards_dir, labels=labels,
        pairs=(("erato", "melpomene"),), min_samples=5,
    ))
    return run, shards_dir, labels


def test_render_and_viewer(tmp_path):
    """render: per-task per-latent strips + index.json; viewer: embedded HTML."""
    import importlib.util
    import json

    from mimics import render

    run, shards_dir, labels = _scored_run(tmp_path, "rendrun", 0)
    indexes = render.worker_fn(render.Config(
        run=run.run_dir, shards=shards_dir, labels=labels,
        n_features=3, n_per_class=2,
    ))
    assert "erato_vs_melpomene" in indexes
    from saev_tpu.data import Metadata

    md = Metadata.load(shards_dir)
    task_dir = run.inference / md.hash / "mimics" / "erato_vs_melpomene"
    index = json.loads((task_dir / "index.json").read_text())
    assert index["sides"] == ["erato", "melpomene"]
    assert len(index["features"]) == 3
    feat = index["features"][0]
    for side in ("erato", "melpomene"):
        assert len(feat["strips"][side]) == 2
        for name in feat["strips"][side]:
            assert (task_dir / str(feat["latent"]) / name).exists()

    fpath = (
        pathlib.Path(__file__).parent.parent
        / "contrib" / "mimics" / "scripts" / "viewer.py"
    )
    spec = importlib.util.spec_from_file_location("mimics_viewer", fpath)
    viewer = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(viewer)
    out = viewer.build(viewer.Config(
        runs=(run.run_dir,), shards=shards_dir, out=tmp_path / "viewer.html",
    ))
    html_doc = out.read_text()
    assert "data:image/png;base64," in html_doc
    for needle in ("Feature order", "consistency", "Columns", "Prev"):
        assert needle in html_doc, needle


def test_consistency_across_runs(tmp_path):
    """Two runs over the SAME shards: a latent's consistency is the best
    pooled-profile correlation against the other run's candidates. A run
    compared against itself (identical ckpt) must score ~1.0 somewhere."""
    import json

    from mimics import consistency

    run_a, shards_dir, labels = _scored_run(tmp_path, "runA", 0)
    run_b, _, _ = _scored_run(tmp_path, "runB", 0, shards_dir=shards_dir)  # same seed
    run_c, _, _ = _scored_run(tmp_path, "runC", 7, shards_dir=shards_dir)

    results = consistency.worker_fn(consistency.Config(
        runs=(run_a.run_dir, run_b.run_dir, run_c.run_dir),
        shards=shards_dir, top_k=5,
    ))
    entries = results[str(run_a.run_dir)]["erato_vs_melpomene"]
    assert len(entries) == 5
    # run B is an identical checkpoint, so run A's top latent must find a
    # near-perfect witness.
    best = entries[0]
    assert best["consistency"] > 0.999, best
    assert best["witness_run"] == str(run_b.run_dir)
    assert best["witness_latent"] == best["latent"]
    # Entries are sorted by consistency descending.
    scores = [e["consistency"] for e in entries]
    assert scores == sorted(scores, reverse=True)

    from saev_tpu.data import Metadata

    md = Metadata.load(shards_dir)
    fpath = run_a.inference / md.hash / "mimic_consistency.json"
    assert json.loads(fpath.read_text())["erato_vs_melpomene"] == entries


def test_decide_task_specs_loads_labels_from_shards(tmp_path):
    """The no-injection path must survive the (cols, dict) load_image_labels
    API (round-3 review fix): fake labels match no butterfly task, so every
    candidate is built but kept=False — and nothing raises."""
    from mimics import tasks

    shards_dir = helpers.write_shards(tmp_path, n_examples=4, layers=(0,))
    specs, summary = tasks.decide_task_specs(tasks.DecideTaskSpecsConfig(
        shards=shards_dir, pair_specs=("erato:melpomene",), views=("dorsal",),
        min_samples_per_class=1, source_col="class", include_filtered=True,
    ))
    assert summary, "candidates should be generated"
    assert all(not s.keep for s in specs)


# ---------------------------------------------------------------------------
# Width-sweep analysis + checkpoint exploration (exps/002 notebook, exps/001
# exploration; reference notebook.py / exploration.py)
# ---------------------------------------------------------------------------


def _fake_run(runs_root: pathlib.Path, run_id: str, *, d_sae: int, l0: float,
              nmse: float, tracker: pathlib.Path, shard: str | None = None,
              sep: float | None = None):
    import json

    ckpt_dir = runs_root / run_id / "checkpoint"
    ckpt_dir.mkdir(parents=True)
    (ckpt_dir / "config.json").write_text(json.dumps({
        "sae": {"d_sae": d_sae, "d_model": 32}, "lr": 1e-3,
        "tags": ["widths-test"],
    }))
    proj = tracker / "saev"
    (proj / run_id).mkdir(parents=True, exist_ok=True)
    (proj / run_id / "summary.json").write_text(json.dumps({
        "eval": {"l0": l0, "nmse": nmse},
    }))
    if shard and sep is not None:
        art = runs_root / run_id / "inference" / shard
        art.mkdir(parents=True)
        (art / "mimic_scores.json").write_text(json.dumps({
            "erato_vs_melpomene": {
                "best_latent": 3, "best_auroc": sep, "best_separation": sep,
                "n_pos": 5, "n_neg": 5, "top10": [],
            },
        }))


def test_width_analysis_pareto_and_study(tmp_path):
    pytest.importorskip("pandas")
    from mimics import analysis

    runs = tmp_path / "runs"
    tracker = tmp_path / "tracker"
    # Width 64: two runs, one dominated. Width 128: one run with a score.
    _fake_run(runs, "r1", d_sae=64, l0=10, nmse=0.30, tracker=tracker)
    _fake_run(runs, "r2", d_sae=64, l0=10, nmse=0.50, tracker=tracker)
    _fake_run(runs, "r3", d_sae=128, l0=20, nmse=0.20, tracker=tracker,
              shard="abc123", sep=0.91)

    df = analysis.load_runs_df(runs, tracker_root=tracker, tags=("widths-test",))
    assert len(df) == 3
    df = analysis.mark_pareto(df)
    by_id = df.set_index("run_id")["pareto"]
    assert bool(by_id["r1"]) and not bool(by_id["r2"]) and bool(by_id["r3"])

    df = analysis.join_scores(df, runs, "abc123")
    study = analysis.width_study(df)
    assert list(study["d_sae"]) == [64, 128]
    w128 = study[study["d_sae"] == 128].iloc[0]
    assert w128["best_separation"] == pytest.approx(0.91)
    assert w128["n_pareto"] == 1

    fig = analysis.plot_frontier(df, tmp_path / "figs" / "frontier.png")
    assert fig.exists()


class _FakeLinear:
    def __init__(self, coef):
        self.coef_ = np.asarray(coef)


def test_checkpoint_discovery_pooling_and_render_plan(tmp_path):
    import json
    import pickle

    sys.path.insert(0, str(
        pathlib.Path(__file__).parent.parent / "contrib" / "trait_discovery" / "src"
    ))
    from mimics import checkpoints

    runs = tmp_path / "runs"
    shard = "deadbeef"

    def write_ckpt(run_id, name, coef, test_acc, c):
        art = runs / run_id / "inference" / shard
        art.mkdir(parents=True, exist_ok=True)
        with open(art / name, "wb") as fd:
            # The REAL writer schema (classification.train_worker_fn:249-254):
            # header = {cfg: asdict(TrainConfig), test_acc, n_classes, ...}.
            fd.write(json.dumps({
                "cfg": {"cls": {"key": "sparse-linear", "C": c}},
                "test_acc": test_acc, "n_classes": 2,
            }).encode() + b"\n")
            pickle.dump({"classifier": _FakeLinear(coef)}, fd)

    # run A: features 0,1 strong; run B: features 2,3; run C: other task.
    write_ckpt("runA", "cls_erato_vs_melpomene_mean_sparse-linear-c0.1.pkl",
               [[3.0, 2.0, 0.0, 0.0]], 0.9, 0.1)
    write_ckpt("runB", "cls_erato_vs_melpomene_mean_sparse-linear-c1.pkl",
               [[0.0, 0.0, 2.5, 1.0]], 0.8, 1.0)
    write_ckpt("runC", "cls_othertask_mean_sparse-linear-c1.pkl",
               [[9.0, 9.0, 9.0, 9.0]], 0.99, 1.0)

    rows = checkpoints.discover_checkpoints(checkpoints.DiscoverCheckpointsConfig(
        run_root_dpath=runs, shard_id=shard, task_name="erato_vs_melpomene",
    ))
    assert {r["run_id"] for r in rows} == {"runA", "runB"}
    assert all(r["d_sae"] == 4 for r in rows)

    # C filter keeps only the matching head.
    only_c01 = checkpoints.discover_checkpoints(checkpoints.DiscoverCheckpointsConfig(
        run_root_dpath=runs, shard_id=shard, task_name="erato_vs_melpomene",
        c_values=(0.1,),
    ))
    assert [r["run_id"] for r in only_c01] == ["runA"]

    selected = checkpoints.select_checkpoints(rows, top_k=2)
    pooled = checkpoints.pool_features(selected, per_ckpt=2)
    assert set(pooled) == {0, 1, 2, 3}
    assert pooled[0] == pytest.approx(3.0)
    assert list(pooled)[0] == 0  # sorted by importance

    labels = ["erato", "melpomene"] * 5
    plan = checkpoints.build_render_plan(
        labels, pooled,
        groups={"erato": ["erato"], "melpomene": ["melpomene"]},
        n_per_class=2,
    )
    assert len(plan) == 4
    for row in plan:
        assert labels[row["example_idx"]] == row["class"]
        assert row["latents"] == list(pooled)


def test_launcher_lists_subcommands(capsys):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "mimics_launch",
        pathlib.Path(__file__).parent.parent / "contrib" / "mimics" / "launch.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod._bind()
    from saev_tpu.utils import cli as cli_mod

    with pytest.raises(SystemExit):
        cli_mod.run(
            {"score": mod.score, "render": mod.render,
             "consistency": mod.consistency, "viewer": mod.build_viewer},
            argv=["--help"],
        )
    out = capsys.readouterr().out
    assert "score" in out and "viewer" in out


def test_scores_viewer_builds(tmp_path):
    """The cross-run scores browser renders per-task tables from
    mimic_scores.json (mirror of reference exps/002-wider-saes/viewer.py)."""
    import importlib.util
    import json as json_mod

    import saev_tpu.disk

    spec = importlib.util.spec_from_file_location(
        "mimics_viewer",
        pathlib.Path(__file__).parent.parent / "contrib" / "mimics" / "scripts" / "viewer.py",
    )
    viewer = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(viewer)

    shards_dir = helpers.write_shards(tmp_path, n_examples=2)
    shards_name = shards_dir.name
    runs_root = helpers.tmp_runs_root(tmp_path)
    runs = []
    for rid, d_sae, sep in [("ra", 1024, 0.9), ("rb", 4096, 0.95)]:
        run = saev_tpu.disk.Run.new(
            rid, train_shards_dir=shards_dir, val_shards_dir=shards_dir,
            runs_root=runs_root,
        )
        (run.run_dir / "checkpoint" / "config.json").write_text(
            json_mod.dumps({"sae": {"d_sae": d_sae}})
        )
        art = run.inference / shards_name
        art.mkdir(parents=True)
        (art / "mimic_scores.json").write_text(json_mod.dumps({
            "notabilis_dorsal_vs_plesseni_dorsal": {
                "best_latent": 7, "best_auroc": sep, "best_separation": sep,
                "n_pos": 10, "n_neg": 12,
                "top10": [{"latent": 7, "auroc": sep}],
            },
        }))
        runs.append(run.run_dir)

    out = tmp_path / "scores.html"
    viewer.build_scores(viewer.ScoresConfig(
        runs=tuple(runs), shards=shards_dir, out=out,
    ))
    html = out.read_text()
    assert "notabilis_dorsal_vs_plesseni_dorsal" in html
    payload = json_mod.loads(
        html.split("const payload = ")[1].split(";\n")[0]
    )
    rows = payload["tasks"]["notabilis_dorsal_vs_plesseni_dorsal"]
    # Sorted by separation descending: the wider SAE wins here.
    assert [r["run_id"] for r in rows] == ["rb", "ra"]
    assert rows[0]["d_sae"] == 4096
