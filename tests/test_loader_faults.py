"""Loader fault-path tests: worker crashes, manager death, timeout rollback.

Mirrors the semantics the reference pins in tests/test_shuffled_dataloader.py:318-505
(err_queue → consumer re-raise with the remote traceback, manager-death liveness
errors, warm-up-gate failure modes) for the thread-based TPU-native loaders.
"""

import dataclasses
import pathlib

import numpy as np
import pytest

from saev_tpu import guards
from saev_tpu.data import buffers, ordered, shuffled


def _shuffled_cfg(shards_dir: pathlib.Path, **kw) -> shuffled.Config:
    defaults = dict(
        shards=shards_dir,
        layer=0,
        batch_size=8,
        n_threads=2,
        buffer_size=4,
        batch_timeout_s=1.0,
        seed=7,
    )
    defaults.update(kw)
    return shuffled.Config(**defaults)


def _truncate_all_shards(shards_dir: pathlib.Path) -> int:
    """Corrupt every shard AFTER loader init so validate() passes but the
    worker's np.memmap (which re-checks file size) blows up."""
    n = 0
    for f in sorted(shards_dir.glob("acts*.bin")):
        with open(f, "r+b") as fd:
            fd.truncate(16)
        n += 1
    assert n > 0
    return n


class TestShuffledFaults:
    def test_worker_exception_reraised_with_remote_traceback(self, tmp_path, helpers):
        shards_dir = helpers.write_shards(tmp_path, n_examples=8)
        dl = shuffled.DataLoader(_shuffled_cfg(shards_dir))
        _truncate_all_shards(shards_dir)
        with pytest.raises(RuntimeError, match="crashed") as excinfo:
            for _ in dl:
                pass
        # The remote traceback (formatted in the worker thread) must ride along.
        assert "Traceback" in str(excinfo.value)

    def test_worker_exception_during_warmup(self, tmp_path, helpers):
        shards_dir = helpers.write_shards(tmp_path, n_examples=8)
        dl = shuffled.DataLoader(_shuffled_cfg(shards_dir, min_buffer_fill=0.9))
        _truncate_all_shards(shards_dir)
        with pytest.raises(RuntimeError, match="crashed"):
            for _ in dl:
                pass

    def test_manager_death_raises_liveness_error(
        self, tmp_path, helpers, monkeypatch
    ):
        shards_dir = helpers.write_shards(tmp_path, n_examples=8)

        def dead_manager(*args, **kwargs):
            return  # exits immediately: no workers, no error pushed

        monkeypatch.setattr(shuffled, "_manager_main", dead_manager)
        dl = shuffled.DataLoader(_shuffled_cfg(shards_dir))
        with pytest.raises(RuntimeError, match="Manager thread died"):
            for _ in dl:
                pass

    def test_manager_death_during_warmup(self, tmp_path, helpers, monkeypatch):
        shards_dir = helpers.write_shards(tmp_path, n_examples=8)
        monkeypatch.setattr(shuffled, "_manager_main", lambda *a, **k: None)
        dl = shuffled.DataLoader(_shuffled_cfg(shards_dir, min_buffer_fill=0.5))
        with pytest.raises(
            RuntimeError, match="Manager thread died while waiting"
        ):
            for _ in dl:
                pass

    def test_invalid_layer_propagates_from_manager(self, tmp_path, helpers):
        shards_dir = helpers.write_shards(tmp_path, n_examples=8, layers=(0, 1))
        dl = shuffled.DataLoader(_shuffled_cfg(shards_dir, layer=5))
        with pytest.raises(RuntimeError, match="manager crashed"):
            for _ in dl:
                pass

    def test_loader_reusable_after_fault(self, tmp_path, helpers, monkeypatch):
        """A crashed epoch must not poison the loader object: shutdown() resets
        all thread/buffer state, so the next __iter__ starts a fresh manager."""
        shards_dir = helpers.write_shards(tmp_path, n_examples=8)
        dl = shuffled.DataLoader(_shuffled_cfg(shards_dir))
        real_manager = shuffled._manager_main
        monkeypatch.setattr(shuffled, "_manager_main", lambda *a, **k: None)
        with pytest.raises(RuntimeError):
            for _ in dl:
                pass
        monkeypatch.setattr(shuffled, "_manager_main", real_manager)
        batches = list(dl)
        assert sum(len(b["act"]) for b in batches) == dl.n_samples


class TestOrderedFaults:
    def test_producer_exception_reraised(self, tmp_path, helpers):
        shards_dir = helpers.write_shards(tmp_path, n_examples=8)
        cfg = ordered.Config(
            shards=shards_dir, layer=0, batch_size=8, batch_timeout_s=1.0
        )
        dl = ordered.DataLoader(cfg)
        _truncate_all_shards(shards_dir)
        with pytest.raises(RuntimeError, match="crashed") as excinfo:
            for _ in dl:
                pass
        assert "Traceback" in str(excinfo.value)

    def test_producer_death_raises_liveness_error(
        self, tmp_path, helpers, monkeypatch
    ):
        shards_dir = helpers.write_shards(tmp_path, n_examples=8)
        cfg = ordered.Config(
            shards=shards_dir, layer=0, batch_size=8, batch_timeout_s=0.5
        )
        monkeypatch.setattr(ordered, "_producer_main", lambda *a, **k: None)
        dl = ordered.DataLoader(cfg)
        with pytest.raises(RuntimeError, match="Producer died"):
            for _ in dl:
                pass


class TestReservoirTimeoutRollback:
    def test_get_timeout_preserves_rows(self):
        """get(n) with too few rows must time out WITHOUT consuming anything
        (reference buffers.py:179-204 rollback semantics)."""
        buf = buffers.ReservoirBuffer(capacity=16, d_model=4, seed=0)
        acts = np.arange(5 * 4, dtype=np.float32).reshape(5, 4)
        meta = {
            "example_idx": np.arange(5, dtype=np.int64),
            "token_idx": np.zeros(5, dtype=np.int64),
        }
        buf.put(acts, meta)
        with pytest.raises(TimeoutError):
            buf.get(10, timeout=0.2)
        assert buf.qsize() == 5
        out, out_meta = buf.get(5, timeout=0.2)
        assert sorted(out_meta["example_idx"].tolist()) == [0, 1, 2, 3, 4]
        np.testing.assert_array_equal(np.sort(out[:, 0]), acts[:, 0])

    def test_put_timeout_on_full_buffer(self):
        buf = buffers.ReservoirBuffer(capacity=4, d_model=2, seed=0)
        acts = np.zeros((4, 2), dtype=np.float32)
        meta = {
            "example_idx": np.zeros(4, dtype=np.int64),
            "token_idx": np.zeros(4, dtype=np.int64),
        }
        buf.put(acts, meta)
        with pytest.raises(TimeoutError):
            buf.put(acts, meta, timeout=0.2)
        # The pool is unchanged and still drainable.
        assert buf.qsize() == 4


class TestLoaderGuards:
    def test_shuffled_rejects_bad_config(self, tmp_path, helpers):
        shards_dir = helpers.write_shards(tmp_path, n_examples=8)
        for field, value in [
            ("batch_size", 0),
            ("n_threads", 0),
            ("buffer_size", -1),
            ("min_buffer_fill", 1.5),
        ]:
            cfg = dataclasses.replace(_shuffled_cfg(shards_dir), **{field: value})
            with pytest.raises(guards.GuardError, match=field):
                shuffled.DataLoader(cfg)

    def test_ordered_rejects_bad_config(self, tmp_path, helpers):
        shards_dir = helpers.write_shards(tmp_path, n_examples=8)
        cfg = ordered.Config(shards=shards_dir, layer=0, batch_size=0)
        with pytest.raises(guards.GuardError, match="batch_size"):
            ordered.DataLoader(cfg)


class TestTmpdirStaging:
    def test_use_tmpdir_copies_and_reuses(self, tmp_path, helpers, monkeypatch):
        """use_tmpdir stages shards to $TMPDIR/<job>/saev/shards/<hash> with a
        completion marker, and a second loader reuses the copy (reference
        shuffled.py:74-129)."""
        shards_dir = helpers.write_shards(tmp_path, n_examples=8)
        staging = tmp_path / "node_local"
        staging.mkdir()
        monkeypatch.setenv("TMPDIR", str(staging))
        monkeypatch.setenv("SLURM_JOB_ID", "job42")

        cfg = _shuffled_cfg(shards_dir, use_tmpdir=True)
        dl = shuffled.DataLoader(cfg)
        staged = staging / "job42" / "saev" / "shards" / shards_dir.name
        assert (staged / ".copy_complete").exists()
        assert (staged / "metadata.json").exists()
        assert dl._shards_path == staged

        total = sum(len(b["act"]) for b in dl)
        assert total == dl.n_samples

        # Second loader reuses the staged copy (marker short-circuits the copy).
        marker_mtime = (staged / ".copy_complete").stat().st_mtime
        dl2 = shuffled.DataLoader(cfg)
        assert dl2._shards_path == staged
        assert (staged / ".copy_complete").stat().st_mtime == marker_mtime

    def test_use_tmpdir_without_env_falls_back(self, tmp_path, helpers, monkeypatch):
        shards_dir = helpers.write_shards(tmp_path, n_examples=8)
        monkeypatch.delenv("TMPDIR", raising=False)
        dl = shuffled.DataLoader(_shuffled_cfg(shards_dir, use_tmpdir=True))
        assert dl._shards_path == pathlib.Path(shards_dir)
