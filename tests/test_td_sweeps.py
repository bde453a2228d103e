"""The study sweep files must expand through the real config engine into the
target dataclasses — the semantics check, not just "the file parses"."""

import os
import pathlib
import sys

import pytest

REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "contrib" / "trait_discovery" / "src"))

from saev_tpu import configs as saev_configs  # noqa: E402

SWEEPS = REPO / "contrib" / "trait_discovery" / "sweeps"

TRAIN_SWEEPS = [
    ("001_actfn/train_topk.py", 6 * 6 * 6),
    ("001_actfn/train_relu.py", 6 * 6 * 4 * 2),
    ("002_optim/train.py", 2 * 5 * 6 * 6),
    ("003_auxk/train.py", 2 * 5 * 6 * 3),
    ("004_fishbase/train.py", 3 * 6 * 5),
    ("005_butterflies/train.py", 3 * 6 * 5),
]


@pytest.mark.parametrize("rel,expected", TRAIN_SWEEPS)
def test_train_sweeps_expand_to_train_configs(rel, expected, monkeypatch):
    from saev_tpu.framework import train as ftrain

    monkeypatch.setenv("TD_TRAIN_SHARDS", "./shards/tr")
    monkeypatch.setenv("TD_VAL_SHARDS", "./shards/va")
    dcts = saev_configs.load_sweep(SWEEPS / rel)
    assert len(dcts) == expected
    base = ftrain.Config(track=False)
    cfgs, errs = saev_configs.load_cfgs(base, default=ftrain.Config(),
                                        sweep_dcts=dcts[:4])
    assert not errs, errs
    assert len(cfgs) == 4
    assert {str(c.train_data.shards) for c in cfgs} == {"shards/tr"}


def test_actfn_arms_cover_both_activations(monkeypatch):
    monkeypatch.setenv("TD_TRAIN_SHARDS", "x")
    monkeypatch.setenv("TD_VAL_SHARDS", "y")
    topk = saev_configs.load_sweep(SWEEPS / "001_actfn/train_topk.py")
    relu = saev_configs.load_sweep(SWEEPS / "001_actfn/train_relu.py")
    assert {d["sae"]["activation"]["key"] for d in topk} == {"top-k"}
    assert {d["sae"]["activation"]["key"] for d in relu} == {"relu"}
    # The ReLU arm carries the datapoint-init ablation.
    assert {d["sae"]["reinit_blend"] for d in relu} == {0.0, 0.8}


def test_auxk_sweep_covers_both_aux_variants(monkeypatch):
    monkeypatch.setenv("TD_TRAIN_SHARDS", "x")
    monkeypatch.setenv("TD_VAL_SHARDS", "y")
    dcts = saev_configs.load_sweep(SWEEPS / "003_auxk/train.py")
    keys = {d["sae"]["activation"]["aux"]["key"] for d in dcts}
    assert keys == {"auxk", "no-aux"}


def _fake_runs(tmp_path, ids):
    for rid in ids:
        ckpt = tmp_path / rid / "checkpoint"
        ckpt.mkdir(parents=True)
        (ckpt / "sae.pt").write_bytes(b"x")


def test_probe1d_sweep_constructs_configs(tmp_path, monkeypatch):
    from tdiscovery import probe1d

    _fake_runs(tmp_path, ["r1", "r2"])
    monkeypatch.setenv("TD_RUNS_ROOT", str(tmp_path))
    monkeypatch.delenv("TD_RUN_IDS", raising=False)
    monkeypatch.setenv("TD_TRAIN_SHARDS", "./shards/tr")
    monkeypatch.setenv("TD_TEST_SHARDS", "./shards/te")
    dcts = saev_configs.load_sweep(SWEEPS / "004_fishbase/probe1d.py")
    assert len(dcts) == 2
    cfgs, errs = saev_configs.load_cfgs(
        probe1d.Config(), default=probe1d.Config(), sweep_dcts=dcts
    )
    assert not errs
    assert sorted(c.run.name for c in cfgs) == ["r1", "r2"]


def test_cls_train_sweep_constructs_configs(tmp_path, monkeypatch):
    from tdiscovery import classification as cls_mod

    _fake_runs(tmp_path, ["r1"])
    monkeypatch.setenv("TD_RUNS_ROOT", str(tmp_path))
    monkeypatch.delenv("TD_RUN_IDS", raising=False)
    monkeypatch.setenv("TD_TRAIN_SHARDS", "tr")
    monkeypatch.setenv("TD_TEST_SHARDS", "te")
    dcts = saev_configs.load_sweep(SWEEPS / "004_fishbase/cls_train.py")
    assert len(dcts) == 2 * 3 * 2  # agg x C x target
    cfgs, errs = saev_configs.load_cfgs(
        cls_mod.TrainConfig(), default=cls_mod.TrainConfig(), sweep_dcts=dcts
    )
    assert not errs, errs
    aggs = {c.patch_agg for c in cfgs}
    assert aggs == {cls_mod.PatchAgg.MEAN, cls_mod.PatchAgg.MAX}
    assert {c.task.source_col for c in cfgs} == {"habitat", "family"}


def test_006_audit_heads_cover_both_families(tmp_path, monkeypatch):
    from tdiscovery import classification as cls_mod

    _fake_runs(tmp_path, ["r1"])
    monkeypatch.setenv("TD_RUNS_ROOT", str(tmp_path))
    monkeypatch.delenv("TD_RUN_IDS", raising=False)
    dcts = saev_configs.load_sweep(SWEEPS / "006_proposal_audit/cls_train.py")
    assert len(dcts) == 5
    cfgs, errs = saev_configs.load_cfgs(
        cls_mod.TrainConfig(), default=cls_mod.TrainConfig(), sweep_dcts=dcts
    )
    assert not errs, errs
    kinds = {type(c.cls).__name__ for c in cfgs}
    assert kinds == {"SparseLinear", "DecisionTree"}


def test_007_mimicry_tasks_group_correctly(tmp_path, monkeypatch):
    from tdiscovery import classification as cls_mod, mimicry

    _fake_runs(tmp_path, ["r1"])
    monkeypatch.setenv("TD_RUNS_ROOT", str(tmp_path))
    monkeypatch.delenv("TD_RUN_IDS", raising=False)
    monkeypatch.setenv("TD_TRAIN_SHARDS", "sh")
    dcts = saev_configs.load_sweep(SWEEPS / "007_cambridge/cls_train.py")
    assert len(dcts) == 4 * 2 * 3  # pairs x views x C
    cfgs, errs = saev_configs.load_cfgs(
        cls_mod.TrainConfig(), default=cls_mod.TrainConfig(), sweep_dcts=dcts
    )
    assert not errs, errs
    # Task names must match the mimicry module's convention exactly.
    names = {c.task.name for c in cfgs}
    assert mimicry.task_name("cyrbia", "cythera", "dorsal") in names
    one = next(c for c in cfgs if c.task.name.startswith("notabilis_dorsal"))
    assert one.task.groups == {
        "erato": ["notabilis_dorsal"], "melpomene": ["plesseni_dorsal"],
    }
    # Feature discovery: train == test shards by design.
    assert str(one.train_shards) == str(one.test_shards) == "sh"


def test_006_eval_sweep_discovers_checkpoints(tmp_path, monkeypatch):
    _fake_runs(tmp_path, ["r1"])
    art = tmp_path / "r1" / "inference" / "te"
    art.mkdir(parents=True)
    (art / "cls_audit_max_C0.01.pkl").write_bytes(b"x")
    monkeypatch.setenv("TD_RUNS_ROOT", str(tmp_path))
    monkeypatch.setenv("TD_TEST_SHARDS", "./shards/te")
    dcts = saev_configs.load_sweep(SWEEPS / "006_proposal_audit/cls_eval.py")
    assert len(dcts) == 1
    assert dcts[0]["cls_checkpoints"] == [str(art / "cls_audit_max_C0.01.pkl")]
