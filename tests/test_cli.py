"""Tests for the dataclass CLI engine (tyro-equivalent surface; reference drives
everything with tyro, launch.py:11-16, guide.md:41/:93-95)."""

import pathlib

import pytest

from saev_tpu.framework import shards as fshards
from saev_tpu.framework import train as ftrain
from saev_tpu.nn import modeling
from saev_tpu.utils import cli


def test_parse_defaults():
    cfg = cli.parse(ftrain.Config, [])
    assert cfg == ftrain.Config()


def test_parse_scalar_overrides():
    cfg = cli.parse(ftrain.Config, ["--lr", "0.001", "--n-train", "500"])
    assert cfg.lr == 0.001
    assert cfg.n_train == 500


def test_parse_nested_overrides():
    cfg = cli.parse(
        ftrain.Config,
        ["--sae.d-sae", "1024", "--train-data.batch-size", "256"],
    )
    assert cfg.sae.d_sae == 1024
    assert cfg.train_data.batch_size == 256
    # Untouched nested config keeps defaults.
    assert cfg.val_data == ftrain.Config().val_data


def test_parse_union_subcommand():
    cfg = cli.parse(ftrain.Config, ["sae.activation:relu"])
    assert isinstance(cfg.sae.activation, modeling.Relu)

    cfg = cli.parse(
        ftrain.Config,
        ["sae.activation:batch-top-k", "--sae.activation.top-k", "64"],
    )
    assert isinstance(cfg.sae.activation, modeling.BatchTopK)
    assert cfg.sae.activation.top_k == 64


def test_parse_nested_union_subcommand():
    cfg = cli.parse(
        ftrain.Config,
        [
            "sae.activation:relu",
            "sae.activation.sparsity:no-sparsity",
        ],
    )
    assert isinstance(cfg.sae.activation, modeling.Relu)
    assert isinstance(cfg.sae.activation.sparsity, modeling.NoSparsity)


def test_parse_dataset_union():
    cfg = cli.parse(
        fshards.Config, ["data:fake-img", "--data.n-examples", "99"]
    )
    from saev_tpu.data import datasets

    assert isinstance(cfg.data, datasets.FakeImg)
    assert cfg.data.n_examples == 99


def test_parse_path_tuple_bool():
    cfg = cli.parse(
        fshards.Config,
        [
            "--shards-root", "/tmp/x/saev/shards",
            "--layers", "3,7,11",
            "--cls-token", "false",
        ],
    )
    assert cfg.shards_root == pathlib.Path("/tmp/x/saev/shards")
    assert cfg.layers == (3, 7, 11)
    assert cfg.cls_token is False


def test_parse_bool_flag_forms():
    cfg = cli.parse(ftrain.Config, ["--track"])
    assert cfg.track is True
    cfg = cli.parse(ftrain.Config, ["--no-track"])
    assert cfg.track is False


def test_parse_equals_form():
    cfg = cli.parse(ftrain.Config, ["--lr=0.01"])
    assert cfg.lr == 0.01


def test_unknown_flag_errors():
    with pytest.raises(SystemExit):
        cli.parse(ftrain.Config, ["--not-a-flag", "3"])


def test_unknown_union_choice_errors():
    with pytest.raises(SystemExit):
        cli.parse(ftrain.Config, ["sae.activation:nope"])


def test_literal_choice():
    cfg = cli.parse(ftrain.Config, ["--optim", "muon"])
    assert cfg.optim == "muon"
    with pytest.raises(SystemExit):
        cli.parse(ftrain.Config, ["--optim", "sgd"])


def test_run_dispatch():
    captured = {}

    import dataclasses

    @dataclasses.dataclass(frozen=True)
    class Cfg:
        x: int = 1

    def fn(cfg: Cfg, sweep: pathlib.Path | None = None):
        captured["cfg"] = cfg
        captured["sweep"] = sweep

    cli.run({"go": fn}, ["go", "--x", "5", "--sweep", "/tmp/s.py"])
    assert captured["cfg"] == Cfg(x=5)
    assert captured["sweep"] == pathlib.Path("/tmp/s.py")


def test_run_unknown_command():
    with pytest.raises(SystemExit):
        cli.run({"a": lambda c: None}, ["b"])
