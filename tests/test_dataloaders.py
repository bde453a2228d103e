"""Integration tests for the shuffled / ordered / indexed loaders over real (fake-
backbone) shards. Models reference test_shuffled_dataloader.py /
test_ordered_dataloader.py / test_indexed_dataset.py coverage."""

import dataclasses

import numpy as np
import pytest

from saev_tpu.data import indexed, ordered, shards, shuffled
from tests import conftest


@pytest.fixture(scope="module")
def shards_dir(tmp_path_factory):
    return conftest.write_shards(
        tmp_path_factory.mktemp("shards"), n_examples=10, layers=(0, 1)
    )


@pytest.fixture(scope="module")
def ref_acts(shards_dir):
    """All activations in global order for layer 1, content tokens: (10*16, 128)."""
    md = shards.Metadata.load(shards_dir)
    info = shards.ShardInfo.load(shards_dir)
    layer_i = md.layers.index(1)
    parts = []
    for s in info:
        mm = np.memmap(
            shards_dir / s.name, mode="r", dtype=np.float32, shape=md.shard_shape
        )
        sl = np.array(mm[: s.n_examples, layer_i, int(md.cls_token) :, :])
        parts.append(sl.reshape(-1, md.d_model))
    return np.concatenate(parts)


class TestShuffled:
    def test_batch_shapes(self, shards_dir):
        cfg = shuffled.Config(
            shards=shards_dir, layer=1, batch_size=32, n_threads=2, buffer_size=4, seed=3
        )
        dl = shuffled.DataLoader(cfg)
        assert dl.n_samples == 160
        batches = list(dl)
        assert sum(len(b["act"]) for b in batches) == 160
        for b in batches:
            assert b["act"].shape[1] == 128
            assert b["act"].dtype == np.float32
            assert b["example_idx"].shape == b["token_idx"].shape == (len(b["act"]),)

    def test_covers_every_token_exactly_once(self, shards_dir, ref_acts):
        cfg = shuffled.Config(
            shards=shards_dir, layer=1, batch_size=64, n_threads=2, buffer_size=4
        )
        dl = shuffled.DataLoader(cfg)
        seen = set()
        for b in dl:
            for e, t, act in zip(b["example_idx"], b["token_idx"], b["act"]):
                key = (int(e), int(t))
                assert key not in seen
                seen.add(key)
                np.testing.assert_array_equal(act, ref_acts[e * 16 + t])
        assert len(seen) == 160

    def test_restartable_epochs(self, shards_dir):
        cfg = shuffled.Config(
            shards=shards_dir, layer=0, batch_size=80, n_threads=2, buffer_size=4
        )
        dl = shuffled.DataLoader(cfg)
        n1 = sum(len(b["act"]) for b in dl)
        n2 = sum(len(b["act"]) for b in dl)
        assert n1 == n2 == 160

    def test_min_buffer_fill(self, shards_dir):
        cfg = shuffled.Config(
            shards=shards_dir,
            layer=1,
            batch_size=32,
            n_threads=2,
            buffer_size=2,
            min_buffer_fill=0.5,
        )
        dl = shuffled.DataLoader(cfg)
        assert sum(len(b["act"]) for b in dl) == 160

    def test_missing_shards_detected_at_init(self, tmp_path):
        d = conftest.tmp_shards_root(tmp_path) / "deadbeef"
        with pytest.raises(RuntimeError, match="not saved"):
            shuffled.DataLoader(shuffled.Config(shards=d, layer=1))

    def test_wrong_layer_fails(self, shards_dir):
        cfg = shuffled.Config(shards=shards_dir, layer=9, batch_size=32, n_threads=1)
        dl = shuffled.DataLoader(cfg)
        with pytest.raises(RuntimeError):
            next(iter(dl))

    def test_label_filtering(self, tmp_path):
        seg_dir = conftest.write_shards(tmp_path, n_examples=6, seg=True)
        cfg = shuffled.Config(
            shards=seg_dir, layer=1, batch_size=16, n_threads=2, ignore_labels=[0]
        )
        dl = shuffled.DataLoader(cfg)
        md = shards.Metadata.load(seg_dir)
        labels = np.array(
            np.memmap(
                seg_dir / "labels.bin",
                mode="r",
                dtype=np.uint8,
                shape=(md.n_examples, md.content_tokens_per_example),
            )
        )
        expected = int((labels != 0).sum())
        assert dl.n_samples == expected
        got = 0
        for b in dl:
            got += len(b["act"])
            for e, t in zip(b["example_idx"], b["token_idx"]):
                assert labels[int(e), int(t)] != 0
        assert got == expected

    def test_label_filtering_requires_labels(self, shards_dir):
        cfg = shuffled.Config(shards=shards_dir, layer=1, ignore_labels=[0])
        with pytest.raises(FileNotFoundError):
            shuffled.DataLoader(cfg)

    def test_deterministic_shard_order(self, shards_dir):
        def first_epoch_order(seed):
            cfg = shuffled.Config(
                shards=shards_dir, layer=1, batch_size=160, n_threads=1, seed=seed
            )
            dl = shuffled.DataLoader(cfg)
            batch = next(iter(dl))
            dl.shutdown()
            return batch["example_idx"].tolist()

        assert first_epoch_order(7) == first_epoch_order(7)


class TestDescriptorSampling:
    """descriptor_sampling=True: the reservoir shuffles (example_idx,
    token_idx) descriptors and the consumer gathers rows from refcounted
    shard mmaps — one page-cache→batch copy (docs/performance.md)."""

    def test_covers_every_token_with_correct_rows(self, shards_dir, ref_acts):
        cfg = shuffled.Config(
            shards=shards_dir, layer=1, batch_size=64, n_threads=2,
            buffer_size=4, descriptor_sampling=True,
        )
        dl = shuffled.DataLoader(cfg)
        seen = set()
        for b in dl:
            assert b["act"].dtype == np.float32
            for e, t, act in zip(b["example_idx"], b["token_idx"], b["act"]):
                key = (int(e), int(t))
                assert key not in seen
                seen.add(key)
                np.testing.assert_array_equal(act, ref_acts[e * 16 + t])
        assert len(seen) == 160

    def test_same_epoch_as_pool_mode(self, shards_dir):
        """Both modes deliver the identical full epoch — same (example_idx,
        token_idx) multiset with byte-identical act rows. (Per-BATCH contents
        are not comparable across modes: sampling draws from whatever the
        producers have published at draw time, and descriptor producers run
        far ahead of copying ones.)"""
        def epoch(descriptor_sampling):
            cfg = shuffled.Config(
                shards=shards_dir, layer=1, batch_size=40, n_threads=1,
                buffer_size=4, seed=11, descriptor_sampling=descriptor_sampling,
            )
            es, ts, acts = [], [], []
            for b in shuffled.DataLoader(cfg):
                es.append(b["example_idx"]); ts.append(b["token_idx"])
                acts.append(b["act"].copy())
            e, t = np.concatenate(es), np.concatenate(ts)
            a = np.concatenate(acts)
            key = np.lexsort((t, e))
            return e[key], t[key], a[key]

        (pe, pt, pa), (de, dt, da) = epoch(False), epoch(True)
        np.testing.assert_array_equal(pe, de)
        np.testing.assert_array_equal(pt, dt)
        np.testing.assert_array_equal(pa, da)

    def test_acquire_failure_keeps_slot_conservation(self, shards_dir, monkeypatch):
        """A registry.acquire that raises mid-span (registry closed during a
        shutdown race, mmap OSError on re-open) must cancel the just-reserved
        reservoir slots: live + free == capacity once no producer is in
        flight, or the pool silently shrinks for the rest of training."""
        def boom(self, shard_i, n=1):
            raise RuntimeError("acquire boom")

        monkeypatch.setattr(shuffled._ShardRegistry, "acquire", boom)
        cfg = shuffled.Config(
            shards=shards_dir, layer=1, batch_size=32, n_threads=1,
            buffer_size=4, descriptor_sampling=True, batch_timeout_s=2.0,
        )
        dl = shuffled.DataLoader(cfg)
        dl._start_manager()
        res = dl.reservoir  # shutdown() nulls the attribute; keep a handle
        with pytest.raises(RuntimeError, match="acquire boom"):
            next(iter(dl))
        assert res._n + res._n_free == res.capacity

    def test_registry_drains_to_empty(self, shards_dir):
        cfg = shuffled.Config(
            shards=shards_dir, layer=0, batch_size=32, n_threads=2,
            buffer_size=4, descriptor_sampling=True,
        )
        dl = shuffled.DataLoader(cfg)
        it = iter(dl)
        next(it)
        assert dl.registry is not None and dl.registry.n_open() >= 1
        for _ in it:
            pass
        # __iter__'s finally ran shutdown: registry torn down.
        assert dl.registry is None

    def test_label_filtering(self, tmp_path):
        seg_dir = conftest.write_shards(tmp_path, n_examples=6, seg=True)
        cfg = shuffled.Config(
            shards=seg_dir, layer=1, batch_size=16, n_threads=2,
            ignore_labels=[0], descriptor_sampling=True,
        )
        dl = shuffled.DataLoader(cfg)
        md = shards.Metadata.load(seg_dir)
        labels = np.array(
            np.memmap(
                seg_dir / "labels.bin", mode="r", dtype=np.uint8,
                shape=(md.n_examples, md.content_tokens_per_example),
            )
        )
        got = 0
        for b in dl:
            got += len(b["act"])
            for e, t in zip(b["example_idx"], b["token_idx"]):
                assert labels[int(e), int(t)] != 0
        assert got == dl.n_samples == int((labels != 0).sum())


class TestOrdered:
    def test_strict_order_and_content(self, shards_dir, ref_acts):
        cfg = ordered.Config(shards=shards_dir, layer=1, batch_size=48)
        dl = ordered.DataLoader(cfg)
        assert dl.n_samples == 160
        prev = -1
        got = []
        for b in dl:
            idx = b["example_idx"] * 16 + b["token_idx"]
            assert idx[0] == prev + 1
            assert (np.diff(idx) == 1).all()
            prev = int(idx[-1])
            got.append(b["act"])
        got = np.concatenate(got)
        np.testing.assert_array_equal(got, ref_acts)

    def test_drop_last(self, shards_dir):
        cfg = ordered.Config(shards=shards_dir, layer=1, batch_size=48, drop_last=True)
        dl = ordered.DataLoader(cfg)
        assert len(dl) == 3
        batches = list(dl)
        assert len(batches) == 3
        assert all(len(b["act"]) == 48 for b in batches)

    def test_token_labels(self, tmp_path):
        seg_dir = conftest.write_shards(tmp_path, n_examples=6, seg=True)
        md = shards.Metadata.load(seg_dir)
        labels = np.array(
            np.memmap(
                seg_dir / "labels.bin",
                mode="r",
                dtype=np.uint8,
                shape=(md.n_examples, md.content_tokens_per_example),
            )
        )
        cfg = ordered.Config(shards=seg_dir, layer=1, batch_size=32)
        dl = ordered.DataLoader(cfg)
        for b in dl:
            assert "token_labels" in b
            for e, t, lab in zip(b["example_idx"], b["token_idx"], b["token_labels"]):
                assert labels[int(e), int(t)] == int(lab)

    def test_restartable(self, shards_dir):
        cfg = ordered.Config(shards=shards_dir, layer=0, batch_size=64)
        dl = ordered.DataLoader(cfg)
        assert sum(len(b["act"]) for b in dl) == 160
        assert sum(len(b["act"]) for b in dl) == 160


class TestIndexed:
    def test_getitem_matches_ordered(self, shards_dir, ref_acts):
        cfg = indexed.Config(shards=shards_dir, layer=1)
        ds = indexed.Dataset(cfg)
        assert len(ds) == 160
        for i in [0, 5, 17, 100, 159]:
            ex = ds[i]
            np.testing.assert_array_equal(ex["act"], ref_acts[i])
            assert ex["example_idx"] == i // 16
            assert ex["token_idx"] == i % 16

    def test_token_label(self, tmp_path):
        seg_dir = conftest.write_shards(tmp_path, n_examples=4, seg=True)
        ds = indexed.Dataset(indexed.Config(shards=seg_dir, layer=0))
        ex = ds[5]
        assert "token_label" in ex

    def test_take_matches_getitem(self, shards_dir):
        ds = indexed.Dataset(indexed.Config(shards=shards_dir, layer=1))
        idxs = np.array([159, 0, 17, 100, 5, 17])  # unordered, with a repeat
        batch = ds.take(idxs)
        assert batch["act"].shape == (len(idxs), ds.d_model)
        for row, i in enumerate(idxs):
            ex = ds[int(i)]
            np.testing.assert_array_equal(batch["act"][row], ex["act"])
            assert batch["example_idx"][row] == ex["example_idx"]
            assert batch["token_idx"][row] == ex["token_idx"]

    def test_take_token_labels(self, tmp_path):
        seg_dir = conftest.write_shards(tmp_path, n_examples=4, seg=True)
        ds = indexed.Dataset(indexed.Config(shards=seg_dir, layer=0))
        batch = ds.take(np.arange(8))
        assert "token_label" in batch
        assert batch["token_label"].shape == (8,)


def test_make_ordered_config(shards_dir):
    from saev_tpu import data

    scfg = shuffled.Config(shards=shards_dir, layer=1, batch_size=99)
    ocfg = data.make_ordered_config(scfg, drop_last=True)
    assert ocfg.shards == shards_dir
    assert ocfg.layer == 1
    assert ocfg.batch_size == 99
    assert ocfg.drop_last is True


def test_take_labels_with_special_tokens(tmp_path):
    """take() must keep per-row label semantics when the view includes
    special tokens: CLS rows get -1, content rows get their label."""
    seg_dir = conftest.write_shards(tmp_path, n_examples=4, seg=True)
    ds = indexed.Dataset(indexed.Config(shards=seg_dir, layer=0, tokens="all"))
    batch = ds.take(np.arange(6))
    assert "token_label" in batch
    special = batch["token_idx"] < 0
    assert special.any() and (~special).any()
    assert (batch["token_label"][special] == -1).all()
    assert (batch["token_label"][~special] >= 0).all()


def test_shuffled_drop_last(tmp_path):
    """drop_last on the shuffled loader: only full batches are yielded."""
    shards_dir = conftest.write_shards(tmp_path, n_examples=10, layers=(0,))
    cfg = shuffled.Config(
        shards=shards_dir, layer=0, batch_size=48, n_threads=1, buffer_size=4,
        drop_last=True,
    )
    dl = shuffled.DataLoader(cfg)
    assert len(dl) == 160 // 48
    batches = list(dl)
    assert len(batches) == 3
    assert all(len(b["act"]) == 48 for b in batches)
