import pathlib

import pytest

from saev_tpu import disk
from tests import conftest


def test_is_runs_root(tmp_path):
    root = conftest.tmp_runs_root(tmp_path)
    assert disk.is_runs_root(root)
    assert not disk.is_runs_root(tmp_path)
    assert not disk.is_runs_root(root / "nonexistent")


def test_is_shards_root_and_dir(tmp_path):
    root = conftest.tmp_shards_root(tmp_path)
    assert disk.is_shards_root(root)
    d = root / "abcd1234"
    d.mkdir()
    assert disk.is_shards_dir(d)
    assert not disk.is_shards_dir(root)


def test_run_new_and_load(tmp_path):
    runs_root = conftest.tmp_runs_root(tmp_path)
    shards_root = conftest.tmp_shards_root(tmp_path)
    train = shards_root / "aaaa"
    val = shards_root / "bbbb"
    train.mkdir()
    val.mkdir()

    run = disk.Run.new(
        "run123", train_shards_dir=train, val_shards_dir=val, runs_root=runs_root
    )
    assert run.run_id == "run123"
    assert run.ckpt == runs_root / "run123" / "checkpoint" / "sae.pt"
    assert run.train_shards == train.resolve()
    assert run.val_shards == val.resolve()
    assert run.inference.is_dir()

    # Reload.
    run2 = disk.Run(runs_root / "run123")
    assert run2.run_id == "run123"


def test_run_missing_raises(tmp_path):
    runs_root = conftest.tmp_runs_root(tmp_path)
    with pytest.raises(FileNotFoundError):
        disk.Run(runs_root / "nope")


def test_run_invalid_path():
    with pytest.raises(ValueError):
        disk.Run(pathlib.Path("/x"))
