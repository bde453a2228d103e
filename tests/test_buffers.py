"""Concurrency tests for RingBuffer / ReservoirBuffer (threads). Models the
reference's test_ring_buffer.py / test_reservoir_buffer.py blocking semantics."""

import threading
import time

import numpy as np
import pytest

from saev_tpu.data import buffers


class TestRingBuffer:
    def test_fifo_order(self):
        rb = buffers.RingBuffer(4, (2,))
        for i in range(3):
            rb.put(np.full(2, i, dtype=np.float32))
        for i in range(3):
            np.testing.assert_array_equal(rb.get(), np.full(2, i, dtype=np.float32))

    def test_qsize_fill(self):
        rb = buffers.RingBuffer(4, (1,))
        assert rb.qsize() == 0 and rb.fill() == 0.0
        rb.put(np.zeros(1, dtype=np.float32))
        assert rb.qsize() == 1 and rb.fill() == 0.25

    def test_put_blocks_when_full(self):
        rb = buffers.RingBuffer(1, (1,))
        rb.put(np.zeros(1, dtype=np.float32))
        with pytest.raises(TimeoutError):
            rb.put(np.zeros(1, dtype=np.float32), timeout=0.1)

    def test_get_blocks_when_empty(self):
        rb = buffers.RingBuffer(1, (1,))
        with pytest.raises(TimeoutError):
            rb.get(timeout=0.1)

    def test_threaded_producer_consumer(self):
        rb = buffers.RingBuffer(4, (1,))
        n = 100
        got = []

        def producer():
            for i in range(n):
                rb.put(np.full(1, i, dtype=np.float32))

        t = threading.Thread(target=producer)
        t.start()
        for _ in range(n):
            got.append(int(rb.get()[0]))
        t.join()
        assert got == list(range(n))

    def test_close_unblocks(self):
        rb = buffers.RingBuffer(1, (1,))
        exc = []

        def getter():
            try:
                rb.get(timeout=5.0)
            except buffers.BufferClosed as e:
                exc.append(e)

        t = threading.Thread(target=getter)
        t.start()
        time.sleep(0.05)
        rb.close()
        t.join(timeout=2.0)
        assert exc


class TestReservoirBuffer:
    def test_put_get_roundtrip(self):
        rv = buffers.ReservoirBuffer(100, 4, seed=0)
        acts = np.arange(40, dtype=np.float32).reshape(10, 4)
        meta = {
            "example_idx": np.arange(10, dtype=np.int64),
            "token_idx": np.zeros(10, dtype=np.int64),
        }
        rv.put(acts, meta)
        assert len(rv) == 10

        got_acts, got_meta = rv.get(10)
        assert len(rv) == 0
        # Rows come back shuffled but as a set they match exactly.
        order = np.argsort(got_meta["example_idx"])
        np.testing.assert_array_equal(got_acts[order], acts)

    def test_rows_stay_consistent(self):
        # Meta stays attached to the right activation row across swap-removal.
        rv = buffers.ReservoirBuffer(64, 2, seed=1)
        acts = np.stack([np.arange(32), np.arange(32)], axis=1).astype(np.float32)
        meta = {
            "example_idx": np.arange(32, dtype=np.int64),
            "token_idx": np.arange(32, dtype=np.int64) * 10,
        }
        rv.put(acts, meta)
        for _ in range(4):
            a, m = rv.get(8)
            np.testing.assert_array_equal(a[:, 0].astype(np.int64), m["example_idx"])
            np.testing.assert_array_equal(m["example_idx"] * 10, m["token_idx"])

    def test_get_blocks_until_enough(self):
        rv = buffers.ReservoirBuffer(10, 1, seed=0)
        rv.put(np.zeros((3, 1), np.float32), {"example_idx": np.zeros(3, np.int64), "token_idx": np.zeros(3, np.int64)})
        with pytest.raises(TimeoutError):
            rv.get(5, timeout=0.1)
        # Rollback: the 3 rows are still there.
        assert len(rv) == 3
        a, _ = rv.get(3)
        assert len(a) == 3

    def test_put_blocks_when_full_and_splits(self):
        rv = buffers.ReservoirBuffer(4, 1, seed=0)
        z = lambda n: (np.zeros((n, 1), np.float32), {"example_idx": np.zeros(n, np.int64), "token_idx": np.zeros(n, np.int64)})
        rv.put(*z(4))
        with pytest.raises(TimeoutError):
            rv.put(*z(1), timeout=0.1)

        # A consumer makes room; oversized put splits and completes.
        def consumer():
            time.sleep(0.05)
            rv.get(4)
            time.sleep(0.05)
            rv.get(4)

        t = threading.Thread(target=consumer)
        t.start()
        rv.put(*z(8), timeout=5.0)
        t.join()

    def test_sampling_is_roughly_uniform(self):
        rv = buffers.ReservoirBuffer(1000, 1, seed=0)
        acts = np.zeros((1000, 1), np.float32)
        meta = {
            "example_idx": np.arange(1000, dtype=np.int64),
            "token_idx": np.zeros(1000, np.int64),
        }
        rv.put(acts, meta)
        _, m = rv.get(500)
        # Should draw from both halves.
        assert (m["example_idx"] < 500).sum() > 150
        assert (m["example_idx"] >= 500).sum() > 150

    def test_threaded_producers_consumers(self):
        rv = buffers.ReservoirBuffer(256, 1, seed=0)
        n_per = 512
        seen = []
        lock = threading.Lock()

        def producer(base):
            for s in range(0, n_per, 32):
                idx = np.arange(base + s, base + s + 32, dtype=np.int64)
                rv.put(
                    idx[:, None].astype(np.float32),
                    {"example_idx": idx, "token_idx": np.zeros(32, np.int64)},
                )

        def consumer():
            got = 0
            while got < n_per:
                _, m = rv.get(32, timeout=10.0)
                got += 32
                with lock:
                    seen.extend(m["example_idx"].tolist())

        ps = [threading.Thread(target=producer, args=(i * n_per,)) for i in range(2)]
        cs = [threading.Thread(target=consumer) for _ in range(2)]
        for t in ps + cs:
            t.start()
        for t in ps + cs:
            t.join(timeout=30.0)
        assert sorted(seen) == list(range(2 * n_per))


class TestReserveCommit:
    """The direct-write producer API (reserve -> fill slots -> commit)."""

    def test_reserved_rows_invisible_until_commit(self):
        rv = buffers.ReservoirBuffer(8, 2, seed=0)
        ids = rv.reserve(4)
        assert len(ids) == 4
        assert rv.qsize() == 0  # reserved but unpublished
        rv.acts[ids] = np.arange(8, dtype=np.float32).reshape(4, 2)
        rv.meta["example_idx"][ids] = np.arange(4)
        rv.meta["token_idx"][ids] = 0
        rv.commit(ids)
        assert rv.qsize() == 4
        acts, meta = rv.get(4, timeout=1.0)
        assert sorted(meta["example_idx"].tolist()) == [0, 1, 2, 3]

    def test_reserve_partial_when_nearly_full(self):
        rv = buffers.ReservoirBuffer(4, 1, seed=0)
        a = rv.reserve(3)
        b = rv.reserve(10)  # only 1 slot left; must return it, not block
        assert len(a) == 3 and len(b) == 1
        assert set(a.tolist()).isdisjoint(b.tolist())

    def test_reserve_blocks_until_slots_free(self):
        rv = buffers.ReservoirBuffer(2, 1, seed=0)
        ids = rv.reserve(2)
        with pytest.raises(TimeoutError):
            rv.reserve(1, timeout=0.1)
        rv.cancel(ids)
        assert len(rv.reserve(1, timeout=0.1)) == 1

    def test_cancel_returns_slots_without_publishing(self):
        rv = buffers.ReservoirBuffer(4, 1, seed=0)
        ids = rv.reserve(4)
        rv.cancel(ids)
        assert rv.qsize() == 0
        # All four slots usable again.
        ids2 = rv.reserve(4)
        assert sorted(ids2.tolist()) == sorted(ids.tolist())

    def test_commit_on_closed_raises(self):
        rv = buffers.ReservoirBuffer(2, 1, seed=0)
        ids = rv.reserve(1)
        rv.close()
        with pytest.raises(buffers.BufferClosed):
            rv.commit(ids)

    def test_interleaved_with_get(self):
        rv = buffers.ReservoirBuffer(8, 1, seed=0)
        rv.put(
            np.ones((4, 1), np.float32),
            {"example_idx": np.arange(4), "token_idx": np.zeros(4, np.int64)},
        )
        ids = rv.reserve(2)  # in-flight reservation
        acts, meta = rv.get(4, timeout=1.0)  # live rows unaffected
        assert len(acts) == 4
        rv.acts[ids] = 7.0
        rv.meta["example_idx"][ids] = [10, 11]
        rv.meta["token_idx"][ids] = 0
        rv.commit(ids)
        _, meta2 = rv.get(2, timeout=1.0)
        assert sorted(meta2["example_idx"].tolist()) == [10, 11]
