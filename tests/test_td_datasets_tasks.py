"""Tests for tdiscovery.datasets (metadata datasets) and mimics.tasks
(pair-spec task construction)."""

import pathlib
import sys

import numpy as np
import pytest
from PIL import Image

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "contrib" / "trait_discovery" / "src"))
sys.path.insert(0, str(REPO / "contrib" / "mimics" / "src"))

from mimics import tasks  # noqa: E402
from tdiscovery import datasets as td_datasets  # noqa: E402


@pytest.fixture()
def butterfly_root(tmp_path):
    root = tmp_path / "butterflies"
    (root / "images" / "training").mkdir(parents=True)
    (root / "annotations" / "training").mkdir(parents=True)
    rng = np.random.default_rng(0)
    names = ["CAM000001.png", "CAM000002.png", "CAM000003.png"]
    for name in names:
        Image.fromarray(
            rng.integers(0, 255, size=(16, 16, 3), dtype=np.uint8)
        ).save(root / "images" / "training" / name)
        Image.fromarray(
            rng.integers(0, 3, size=(16, 16), dtype=np.uint8)
        ).save(root / "annotations" / "training" / name)
    (root / "labels.csv").write_text(
        "stem,label\nCAM000001,erato\nCAM000002,melpomene\nCAM000003,erato\n"
    )
    (root / "Heliconius_img_master.csv").write_text(
        "Image_name,subspecies,View,Date,file_url\n"
        "CAM000001.png,lativitta,dorsal,2019-01-01,http://x\n"
        "CAM000002.png,malleti,ventral,2019-01-02,http://y\n"
        "CAM000003.png,cyrbia,dorsal,2019-01-03,http://z\n"
    )
    return root


def test_butterflies_metadata_without_image_load(butterfly_root):
    ds = td_datasets.get_dataset(td_datasets.Butterflies(root=butterfly_root))
    assert len(ds) == 3
    meta = ds.get_metadata(0)
    assert meta["subspecies"] == "lativitta"
    assert meta["View"] == "dorsal"
    # Dead columns are dropped (reference datasets.py:62-78).
    assert "Date" not in meta and "file_url" not in meta

    sample = ds[1]
    assert sample["subspecies"] == "malleti"
    assert sample["label"] == "melpomene"
    assert sample["data"].size == (16, 16)


def test_butterflies_missing_metadata_raises(butterfly_root):
    (butterfly_root / "images" / "training" / "CAM000099.png").write_bytes(
        (butterfly_root / "images" / "training" / "CAM000001.png").read_bytes()
    )
    with pytest.raises(ValueError, match="CAM000099"):
        td_datasets.get_dataset(td_datasets.Butterflies(root=butterfly_root))


def test_pair_spec_parsing():
    assert tasks.parse_pair_spec("lativitta:malleti") == ("lativitta", "malleti")
    with pytest.raises(AssertionError):
        tasks.parse_pair_spec("nopair")
    with pytest.raises(AssertionError):
        tasks.parse_pair_spec(":malleti")


def test_task_name_roundtrip():
    name = tasks.get_task_name("lativitta", "malleti", "dorsal")
    assert name == "lativitta_dorsal_vs_malleti_dorsal"
    assert tasks.parse_task_name(name) == ("lativitta", "malleti", "dorsal")
    with pytest.raises(AssertionError, match="mismatched views"):
        tasks.parse_task_name("a_dorsal_vs_b_ventral")


def test_make_candidate_task_names_dedup():
    cfg = tasks.DecideTaskSpecsConfig(
        pair_specs=("a:b", "a:b"), views=("dorsal",)
    )
    assert tasks.make_candidate_task_names(cfg) == ["a_dorsal_vs_b_dorsal"]
    cfg = tasks.DecideTaskSpecsConfig(task_names=("x_dorsal_vs_y_dorsal",) * 2)
    assert tasks.make_candidate_task_names(cfg) == ["x_dorsal_vs_y_dorsal"]


def test_decide_task_specs_filters_by_support(tmp_path):
    labels = (
        ["lativitta_dorsal"] * 60 + ["malleti_dorsal"] * 55
        + ["cyrbia_dorsal"] * 3 + ["cythera_dorsal"] * 80
    )
    cfg = tasks.DecideTaskSpecsConfig(
        pair_specs=("lativitta:malleti", "cyrbia:cythera"), views=("dorsal",),
        min_samples_per_class=50,
    )
    specs, summary = tasks.decide_task_specs(cfg, labels=labels)
    assert [s.task_name for s in specs] == ["lativitta_dorsal_vs_malleti_dorsal"]
    assert specs[0].n_erato == 60 and specs[0].n_melpomene == 55
    assert specs[0].keep

    # Summary covers all candidates, kept first.
    assert len(summary) == 2
    assert summary[0]["keep"] and not summary[1]["keep"]
    assert summary[1]["n_erato"] == 3

    # include_filtered keeps the low-support task too.
    specs_all, _ = tasks.decide_task_specs(
        tasks.DecideTaskSpecsConfig(
            pair_specs=("cyrbia:cythera",), views=("dorsal",),
            min_samples_per_class=50, include_filtered=True,
        ),
        labels=labels,
    )
    assert len(specs_all) == 1 and not specs_all[0].keep

    out = tmp_path / "summary.csv"
    tasks.dump_summary_csv(summary, out)
    lines = out.read_text().strip().splitlines()
    assert lines[0].startswith("task_name,")
    assert len(lines) == 3


def test_grouping_from_task_name():
    g = tasks.make_label_grouping("lativitta_dorsal_vs_malleti_dorsal")
    y, names = g.apply(
        ["lativitta_dorsal", "malleti_dorsal", "other_dorsal", "lativitta_dorsal"]
    )
    assert names == ["erato", "melpomene"]
    assert y.tolist() == [0, 1, -1, 0]
