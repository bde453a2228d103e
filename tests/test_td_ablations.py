"""Content tests for the 003_auxk-style variant-ablation analysis
(tdiscovery.ablations): completeness, dead units, probe winners, pareto
grids, paired variant effects."""

import pathlib
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(
    0, str(pathlib.Path(__file__).parent.parent / "contrib" / "trait_discovery" / "src")
)

from tdiscovery import ablations  # noqa: E402


def make_frame():
    """A synthetic flattened-run frame: 2 variants x 2 layers x 3 L0 points.
    AuxK runs have strictly fewer dead units and slightly better NMSE."""
    rows = []
    rid = 0
    for aux in ("auxk", "no-aux"):
        for layer in (13, 23):
            for k, l0 in enumerate((16.0, 64.0, 256.0)):
                nmse = 1.0 / (1 + l0 / 64) + (0.0 if aux == "auxk" else 0.05)
                rows.append({
                    "run_id": f"r{rid}",
                    "data_key": "FakeData",
                    "config/val_data/layer": layer,
                    "config/sae/activation/aux/key": aux,
                    "config/sae/d_sae": 1000,
                    "summary/eval/l0": l0,
                    "summary/eval/normalized_mse": nmse,
                    "summary/loss/n_dead": 50 if aux == "auxk" else 400,
                    "summary/eval/n_dead": 80 if aux == "auxk" else 500,
                    "train_probe_r": 0.1 + 0.01 * k + (0.2 if aux == "auxk" else 0),
                    "is_pareto": True,
                })
                rid += 1
    return pd.DataFrame(rows)


def test_completeness_flags_missing_cells():
    df = make_frame()
    rows = ablations.completeness(df, expected=3)
    assert len(rows) == 4  # 2 variants x 1 data x 2 layers
    assert all(r["done"] for r in rows)
    rows = ablations.completeness(df.iloc[:-1], expected=3)
    incomplete = [r for r in rows if not r["done"]]
    assert len(incomplete) == 1
    assert incomplete[0]["count"] == 2


def test_completeness_requires_columns():
    with pytest.raises(AssertionError, match="missing group columns"):
        ablations.completeness(pd.DataFrame({"run_id": ["a"]}), expected=1)


def test_dead_units_separates_variants():
    rows = ablations.dead_units(make_frame())
    by_aux = {}
    for r in rows:
        by_aux.setdefault(r["config/sae/activation/aux/key"], []).append(r)
    # d_sae=1000: auxk 50/1000=5% train, no-aux 400/1000=40%.
    assert all(r["loss_mean"] == pytest.approx(5.0) for r in by_aux["auxk"])
    assert all(r["loss_mean"] == pytest.approx(40.0) for r in by_aux["no-aux"])
    assert all(r["eval_mean"] == pytest.approx(8.0) for r in by_aux["auxk"])


def test_best_by_picks_probe_winner():
    rows = ablations.best_by(make_frame(), "train_probe_r")
    assert len(rows) == 4
    for r in rows:
        if r["config/sae/activation/aux/key"] == "auxk":
            # Best k index is 2 -> 0.1 + 0.02 + 0.2
            assert r["train_probe_r"] == pytest.approx(0.32)
            assert r["summary/eval/l0"] == 256.0


def test_source_vs_downstream_layer_slice():
    rows = ablations.source_vs_downstream(make_frame(), layer=23)
    assert len(rows) == 6
    assert all("train_probe_r" in r for r in rows)
    l0s = [r["summary/eval/l0"] for r in rows]
    assert l0s == sorted(l0s[:3]) + sorted(l0s[3:])  # sorted within variant


def test_fig_variant_grid_returns_frontier_ids():
    fig, pareto_ids = ablations.fig_variant_grid(make_frame())
    assert ("FakeData", 13) in pareto_ids and ("FakeData", 23) in pareto_ids
    # NMSE strictly decreases with L0 here, so every run is on its front.
    assert len(pareto_ids[("FakeData", 13)]) == 6
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_variant_effect_sign_and_pairs():
    rows = ablations.variant_effect(make_frame(), baseline="no-aux")
    (row,) = rows
    assert row["variant"] == "auxk"
    assert row["n_pairs"] == 2  # two (data, layer) cells
    # AuxK is 0.05 better (lower NMSE) everywhere.
    assert row["mean_diff"] == pytest.approx(-0.05)


def test_variant_effect_custom_column():
    """The engine generalizes to other variant columns (the 002_optim use)."""
    df = make_frame().rename(
        columns={"config/sae/activation/aux/key": "config/optim"}
    ).replace({"config/optim": {"auxk": "muon", "no-aux": "adam"}})
    rows = ablations.variant_effect(df, variant_col="config/optim",
                                    baseline="adam")
    (row,) = rows
    assert row["variant"] == "muon"
    assert row["mean_diff"] == pytest.approx(-0.05)
