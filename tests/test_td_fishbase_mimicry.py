"""Content-asserting tests for the 004_fishbase and 007_cambridge_mimicry
analysis protocols (tdiscovery.fishbase, tdiscovery.mimicry)."""

import json
import pathlib
import pickle
import sys

import numpy as np
import pytest

sys.path.insert(
    0, str(pathlib.Path(__file__).parent.parent / "contrib" / "trait_discovery" / "src")
)

from tdiscovery import fishbase, mimicry  # noqa: E402


# ---------------------------------------------------------------------------
# fishbase scoring primitives
# ---------------------------------------------------------------------------


def test_fast_auc_perfect_and_chance():
    acts = np.array([[0.0, 1.0], [1.0, 1.0], [2.0, 1.0], [3.0, 1.0]])
    labels = np.array([False, False, True, True])
    auc = fishbase.fast_auc(acts, labels)
    assert auc[0] == pytest.approx(1.0)  # perfectly ranked
    assert auc[1] == pytest.approx(0.5)  # constant column = chance


def test_fast_auc_antiranked_is_zero():
    acts = np.array([[3.0], [2.0], [1.0], [0.0]])
    labels = np.array([False, False, True, True])
    assert fishbase.fast_auc(acts, labels)[0] == pytest.approx(0.0)


def test_fast_pearson_sign_and_magnitude():
    y = np.array([0, 0, 1, 1], dtype=bool)
    acts = np.stack([y.astype(float), 1 - y.astype(float)], axis=1)
    r = fishbase.fast_pearson(acts, y)
    assert r[0] == pytest.approx(1.0, abs=1e-6)
    assert r[1] == pytest.approx(-1.0, abs=1e-6)


def test_activation_freq_ratio_direction():
    y = np.array([False] * 50 + [True] * 50)
    acts = np.zeros((100, 2))
    acts[50:, 0] = 1.0  # fires only on positives
    acts[:50, 1] = 1.0  # fires only on negatives
    lo = fishbase.activation_freq_ratio(acts, y, threshold=0.5)
    assert lo[0] > 10 and lo[1] < -10


# ---------------------------------------------------------------------------
# fishbase trait join + part x trait tables
# ---------------------------------------------------------------------------

TRAITS = {
    ("Thunnus", "albacares"): {"habitat": "pelagic-oceanic"},
    ("Amphiprion", "ocellaris"): {"habitat": "reef-associated"},
}


def test_parse_species_and_join():
    parts = fishbase.parse_species("Scombridae_Thunnus_albacares")
    assert parts["genus"] == "Thunnus" and parts["species"] == "albacares"
    labels = [
        "Scombridae_Thunnus_albacares",
        "Pomacentridae_Amphiprion_ocellaris",
        "Unknownidae_Nope_nada",
        "Scombridae_Thunnus",  # genus-only: not in table
    ]
    idx = fishbase.example_traits(labels, TRAITS, "habitat")
    assert idx[0] == fishbase.HABITATS.index("pelagic-oceanic")
    assert idx[1] == fishbase.HABITATS.index("reef-associated")
    assert idx[2] == -1 and idx[3] == -1


def test_load_trait_table(tmp_path):
    csv = tmp_path / "traits.csv"
    csv.write_text(
        "genus,species,habitat,migration\n"
        "Thunnus,albacares,pelagic-oceanic,oceanodromous\n"
    )
    table = fishbase.load_trait_table(csv)
    # Keys are lowercased for the case-insensitive join.
    assert table[("thunnus", "albacares")]["habitat"] == "pelagic-oceanic"
    assert table[("thunnus", "albacares")]["migration"] == "oceanodromous"


def _planted_setup(rng, *, plant_latent=7, plant_part=3, plant_habitat=1):
    """60 examples x 4 tokens, 16 latents; latent `plant_latent` fires exactly
    on (part == plant_part) patches of fish with habitat index `plant_habitat`."""
    n_examples, tokens, d_sae = 60, 4, 16
    trait_idx = rng.integers(0, 3, size=n_examples).astype(np.int32)
    trait_idx[:5] = -1  # some unknown species
    part_labels = rng.integers(0, 5, size=n_examples * tokens)
    acts = rng.random((n_examples * tokens, d_sae)) * 0.1
    target = (part_labels == plant_part) & (
        np.repeat(trait_idx, tokens) == plant_habitat
    )
    acts[target, plant_latent] = 5.0
    return acts, part_labels, trait_idx, tokens


def test_score_part_by_trait_recovers_planted_latent():
    rng = np.random.default_rng(0)
    acts, part_labels, trait_idx, tokens = _planted_setup(rng)
    res = fishbase.score_part_by_trait(
        acts, part_labels, trait_idx, tokens,
        vocab=fishbase.HABITATS[:3], parts=fishbase.PART_NAMES[:5],
    )
    assert res.scores.shape == (16, 5, 3)
    rows = res.table()
    (hit,) = [
        r for r in rows
        if r["part"] == fishbase.PART_NAMES[3] and r["target"] == fishbase.HABITATS[1]
    ]
    assert hit["latent"] == 7
    assert hit["score"] > 0.5
    assert 7 in res.best_latents()


def test_score_part_by_comparison_groups():
    rng = np.random.default_rng(1)
    # Plant on the "deep" group: habitats mesopelagic(8)... use a small vocab
    vocab = ("shallow-a", "shallow-b", "deep-a", "deep-b")
    comparisons = ({"shallow": ("shallow-a", "shallow-b"),
                    "deep": ("deep-a", "deep-b")},)
    n_examples, tokens, d_sae = 80, 2, 8
    trait_idx = rng.integers(0, 4, size=n_examples).astype(np.int32)
    part_labels = rng.integers(0, 3, size=n_examples * tokens)
    acts = rng.random((n_examples * tokens, d_sae)) * 0.1
    target = (part_labels == 1) & (np.repeat(trait_idx, tokens) >= 2)
    acts[target, 5] = 3.0
    res = fishbase.score_part_by_comparison(
        acts, part_labels, trait_idx, tokens,
        comparisons=comparisons, vocab=vocab, parts=("p0", "p1", "p2"),
    )
    assert res.targets == ("deep", "shallow")  # sorted group names
    rows = res.table()
    (hit,) = [r for r in rows if r["part"] == "p1" and r["target"] == "deep"]
    assert hit["latent"] == 5


def test_trait_coverage_counts():
    idx = np.array([0, 0, 1, -1, 2, 2, 2], dtype=np.int32)
    cov = fishbase.trait_coverage(idx, vocab=("a", "b", "c"))
    assert [r["n_examples"] for r in cov] == [2, 1, 3]


# ---------------------------------------------------------------------------
# mimicry: checkpoint harvesting + downstream tables
# ---------------------------------------------------------------------------


def _write_ckpt(runs_root, run_id, shard_id, task, *, C=0.1, seed=0,
                separable=True, patch_agg="max", key="sparse-linear"):
    """A cls_*.pkl checkpoint in train_worker_fn's exact format, with a real
    sklearn sparse-linear head fit on tiny synthetic features."""
    import sklearn.linear_model

    rng = np.random.default_rng(seed)
    n, d = 40, 12
    y = np.arange(n) % 2
    x = rng.random((n, d)) * 0.1
    if separable:
        x[:, 3] = y * 2.0  # latent 3 carries the discrimination
    clf = sklearn.linear_model.LogisticRegression(
        penalty="l1", C=C, solver="liblinear", max_iter=50
    )
    clf.fit(x, y)
    pred = clf.predict(x)
    header = {
        "cfg": {
            "task": {"name": task, "source_col": "subspecies_view"},
            "patch_agg": patch_agg,
            "cls": {"key": key, "C": C},
        },
        "test_acc": float((pred == y).mean()),
        "n_classes": 2,
        "class_names": ["erato", "melpomene"],
    }
    out = runs_root / run_id / "inference" / shard_id
    out.mkdir(parents=True, exist_ok=True)
    fpath = out / f"cls_{task}_{patch_agg}_C{C}.pkl"
    with open(fpath, "wb") as fd:
        fd.write((json.dumps(header) + "\n").encode())
        pickle.dump({"classifier": clf, "test_pred": pred, "test_y": y}, fd)
    return fpath


def test_harvest_results_and_filtering(tmp_path):
    t_easy = mimicry.task_name("notabilis", "plesseni", "dorsal")
    t_hard = mimicry.task_name("cyrbia", "cythera", "dorsal")
    _write_ckpt(tmp_path, "runA", "sh1", t_easy, C=0.1, separable=True)
    _write_ckpt(tmp_path, "runA", "sh1", t_hard, C=0.1, separable=False, seed=1)
    # Filtered out: wrong C, wrong agg, unknown task
    _write_ckpt(tmp_path, "runA", "sh1", t_easy, C=7.0)
    _write_ckpt(tmp_path, "runB", "sh1", t_easy, C=0.1, patch_agg="mean")
    _write_ckpt(tmp_path, "runB", "sh1", "other_task", C=0.1)

    filt = mimicry.HarvestFilter(tasks=frozenset({t_easy, t_hard}))
    rows = mimicry.harvest_results(tmp_path, filt=filt)
    assert len(rows) == 2
    by_task = {r["task"]: r for r in rows}
    easy, hard = by_task[t_easy], by_task[t_hard]
    assert easy["balanced_acc"] == pytest.approx(1.0)
    assert easy["run_id"] == "runA"
    assert hard["balanced_acc"] < 0.9
    assert len(easy["features"]) == easy["n_nonzero"] == len(easy["weights"])
    # The planted latent must be among the selected features.
    assert 3 in easy["features"]


def test_difficulty_and_tradeoff_tables(tmp_path):
    t1 = mimicry.task_name("a", "b", "dorsal")
    t2 = mimicry.task_name("c", "d", "dorsal")
    _write_ckpt(tmp_path, "r1", "sh", t1, C=0.1, separable=True)
    _write_ckpt(tmp_path, "r1", "sh", t1, C=0.01, separable=True, seed=2)
    _write_ckpt(tmp_path, "r1", "sh", t2, C=0.1, separable=False, seed=3)
    rows = mimicry.harvest_results(
        tmp_path, filt=mimicry.HarvestFilter(tasks=frozenset({t1, t2}))
    )
    table = mimicry.difficulty_table(rows)
    assert [r["task"] for r in table][-1] == t1  # easiest last (sorted ascending)
    assert table[0]["task"] == t2
    assert table[-1]["n_checkpoints"] == 2

    trade = mimicry.sparsity_tradeoff(rows)
    assert [r["C"] for r in trade] == [0.01, 0.1]
    # Stronger regularization (smaller C) must not use more features.
    assert trade[0]["mean_n_nonzero"] <= trade[1]["mean_n_nonzero"] + 1e-9


def test_rank_features_sign_semantics(tmp_path):
    t = mimicry.task_name("a", "b", "ventral")
    _write_ckpt(tmp_path, "r1", "sh", t, C=0.5, separable=True)
    rows = mimicry.harvest_results(
        tmp_path, filt=mimicry.HarvestFilter(tasks=frozenset({t}),
                                             c_values=frozenset({0.5}))
    )
    ranked = mimicry.rank_features(rows[0], top_k=3)
    assert ranked[0]["latent"] == 3
    # Latent 3 fires on class 1 (melpomene) => positive weight.
    assert ranked[0]["weight"] > 0
    assert ranked[0]["points_at"] == "melpomene"


def test_pair_counts_on_fake_seg_shards(tmp_path):
    """pair_counts over a real shard dir: FakeImgSeg doesn't carry a
    subspecies_view column, so the guard must trip — the informative-failure
    contract."""
    from conftest import _Helpers as helpers

    shards = helpers.write_shards(tmp_path, n_examples=4, seg=True)
    with pytest.raises(AssertionError, match="subspecies_view"):
        mimicry.pair_counts(shards, [("a", "b")])


def test_pair_counts_rows():
    """Count logic itself on synthetic labels (monkeypatched loader)."""
    labels = (
        ["notabilis_dorsal"] * 12 + ["plesseni_dorsal"] * 3 + ["other_dorsal"] * 5
    )
    orig = mimicry.cls_mod.load_image_labels
    try:
        mimicry.cls_mod.load_image_labels = lambda shards: (
            ["subspecies_view"], {"subspecies_view": labels}
        )
        rows = mimicry.pair_counts(
            pathlib.Path("/nonexistent"), [("notabilis", "plesseni")],
            views=("dorsal",), min_samples_per_class=5,
        )
    finally:
        mimicry.cls_mod.load_image_labels = orig
    (row,) = rows
    assert row["n_erato"] == 12 and row["n_melpomene"] == 3
    assert row["majority_acc"] == pytest.approx(12 / 15)
    assert row["insufficient_data"] is True
