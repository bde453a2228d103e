"""FishVista results-analysis tests (mirror of reference
contrib/trait_discovery/notebooks/results.py: results-dir loading, grouped
mAP, best-latent and method-vs-random tables, CUB attributes parsing)."""

import json
import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(
    0, str(pathlib.Path(__file__).parent.parent / "contrib" / "trait_discovery" / "src")
)

from tdiscovery import results
from tdiscovery.fishvista import utils as fv_utils


def _write_result(root, *, method, n_protos, test_ap, train_ap=None, seed=0,
                  extra=None, stem=None):
    result = fv_utils.Result(
        method=method,
        n_prototypes=n_protos,
        best_prototype_per_class=list(range(len(test_ap))),
        train_ap_per_class=train_ap or [a * 1.1 for a in test_ap],
        test_ap_per_class=test_ap,
        mean_ap=float(np.mean(test_ap)),
        n_train_patches=1000,
        n_test_patches=500,
        seed=seed,
        extra=extra or {},
    )
    result.dump_json(root / f"{stem or f'fishvista_{method}_{n_protos}'}.json")
    return result


@pytest.fixture()
def results_dir(tmp_path):
    _write_result(
        tmp_path, method="sae", n_protos=64, test_ap=[0.1, 0.8, 0.7],
        extra={"layer": 5, "vit_family": "fake-clip", "n_train": 300},
    )
    _write_result(
        tmp_path, method="random", n_protos=64, test_ap=[0.1, 0.3, 0.2],
        extra={"layer": 5, "vit_family": "fake-clip", "n_train": 300},
    )
    _write_result(
        tmp_path, method="pca", n_protos=32, test_ap=[0.1, 0.5, 0.6],
        extra={"layer": 5, "vit_family": "fake-clip", "n_train": 300},
    )
    # A non-matching prefix file that must be filtered out.
    _write_result(tmp_path, method="sae", n_protos=8, test_ap=[0.9, 0.9, 0.9],
                  stem="other_dataset_sae_8")
    return tmp_path


def test_load_results_df_long_format(results_dir):
    df = results.load_results_df(results_dir, prefix="fishvista")
    # 3 matching files x 3 classes.
    assert len(df) == 9
    assert set(df["method"]) == {"sae", "random", "pca"}
    # extra unnested into columns.
    assert set(df["layer"]) == {5}
    assert set(df["vit_family"]) == {"fake-clip"}
    # class names resolve from the FishVista table.
    assert df[df["class_idx"] == 1]["class_name"].iloc[0] == "head"
    sae_head = df[(df["method"] == "sae") & (df["class_idx"] == 1)]
    assert sae_head["average_precision"].iloc[0] == pytest.approx(0.8)


def test_map_table_ranks_methods(results_dir):
    df = results.load_results_df(results_dir, prefix="fishvista")
    table = results.map_table(df, ("method",))
    assert list(table["method"]) == ["sae", "pca", "random"]
    assert table["mAP"].iloc[0] == pytest.approx((0.1 + 0.8 + 0.7) / 3)


def test_best_latents_per_class(results_dir):
    df = results.load_results_df(results_dir, prefix="fishvista")
    best = results.best_latents(df)
    assert list(best["class_idx"]) == [0, 1, 2]
    # Class 1 best comes from the sae run (0.8), class 2 too (0.7).
    assert best[best["class_idx"] == 1]["method"].iloc[0] == "sae"
    assert best[best["class_idx"] == 2]["average_precision"].iloc[0] == pytest.approx(0.7)
    only_pca = results.best_latents(df, method="pca")
    assert set(only_pca["method"]) == {"pca"}


def test_method_vs_random_delta(results_dir):
    df = results.load_results_df(results_dir, prefix="fishvista")
    pivot = results.method_vs_random(df, n_prototypes=64)
    assert "sae_minus_random" in pivot.columns
    head = pivot[pivot["class_idx"] == 1]
    assert head["sae_minus_random"].iloc[0] == pytest.approx(0.8 - 0.3)


def test_load_cub_attributes(tmp_path):
    fpath = tmp_path / "attributes.txt"
    fpath.write_text(
        "1 has_bill_shape::curved_(up_or_down)\n"
        "2 has_bill_shape::dagger\n"
        "3 has_wing_color::blue\n"
    )
    attrs = results.load_cub_attributes(fpath)
    assert len(attrs) == 3
    assert attrs[0].name == "has_bill_shape"
    assert attrs[0].value == "curved_(up_or_down)"
    # idx is the file's own (1-based) attribute id, the join key of
    # image_attribute_labels.txt — NOT a line counter.
    assert attrs[0].idx == 1
    assert attrs[2] == results.CubAttribute(3, "has_wing_color", "blue")


def test_result_extra_round_trips(tmp_path):
    result = _write_result(
        tmp_path, method="sae", n_protos=4, test_ap=[0.5],
        extra={"sae_ckpt": "/x/sae.pt", "layer": 3},
    )
    payload = json.loads((tmp_path / "fishvista_sae_4.json").read_text())
    assert payload["extra"] == {"sae_ckpt": "/x/sae.pt", "layer": 3}
    # Legacy JSONs without extra still load.
    del payload["extra"]
    (tmp_path / "fishvista_sae_4.json").write_text(json.dumps(payload))
    df = results.load_results_df(tmp_path, prefix="fishvista")
    assert len(df) == 1 and df["method"].iloc[0] == "sae"
    assert result.mean_ap == pytest.approx(0.5)
