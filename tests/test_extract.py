"""End-to-end extraction tests with the fake JAX backbone (hermetic, CPU)."""

import numpy as np

from saev_tpu.data import fake_vit, shards
from tests import conftest


def test_write_shards_e2e(tmp_path):
    shards_dir = conftest.write_shards(tmp_path, n_examples=10)
    md = shards.Metadata.load(shards_dir)
    assert md.n_examples == 10
    assert md.d_model == fake_vit.D_MODEL
    assert md.cls_token

    info = shards.ShardInfo.load(shards_dir)
    info.validate(shards_dir)
    assert sum(s.n_examples for s in info) == 10


def test_extraction_is_deterministic(tmp_path):
    d1 = conftest.write_shards(tmp_path / "a", n_examples=4, batch_size=2)
    d2 = conftest.write_shards(tmp_path / "b", n_examples=4, batch_size=4)
    md = shards.Metadata.load(d1)

    def read_all(d):
        info = shards.ShardInfo.load(d)
        parts = []
        for s in info:
            mm = np.memmap(d / s.name, mode="r", dtype=np.float32, shape=md.shard_shape)
            parts.append(np.array(mm[: s.n_examples]))
        return np.concatenate(parts)

    np.testing.assert_allclose(read_all(d1), read_all(d2), rtol=1e-5, atol=1e-5)


def test_write_shards_seg_labels(tmp_path):
    shards_dir = conftest.write_shards(tmp_path, n_examples=6, seg=True)
    md = shards.Metadata.load(shards_dir)
    labels = np.memmap(
        shards_dir / "labels.bin",
        mode="r",
        dtype=np.uint8,
        shape=(md.n_examples, md.content_tokens_per_example),
    )
    labels = np.array(labels)
    # FakeImgSeg: first patch-grid row is background (label 0); others follow
    # (patch_idx + i) % n_classes.
    assert (labels[:, :4] == 0).all()
    for i in range(6):
        for p in range(4, 16):
            assert labels[i, p] == (p + i) % 3


def test_recorder_token_selection(tmp_path):
    # cls_token=False drops the CLS token from storage.
    shards_dir = conftest.write_shards(tmp_path, n_examples=4, cls_token=False)
    md = shards.Metadata.load(shards_dir)
    assert md.tokens_per_example == fake_vit.N_PATCHES
    assert not md.cls_token
