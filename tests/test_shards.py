"""Shard protocol tests: metadata invariants (hypothesis), writer round-trips, and
IndexMap coordinate math. Models the reference's test_shards_properties.py /
test_shards_math.py coverage."""

import dataclasses
import json
import pathlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from saev_tpu.data import shards
from tests import conftest

FAKE_CKPT = conftest.FAKE_CKPT


def make_md(**kwargs) -> shards.Metadata:
    defaults = dict(
        family="fake-clip",
        ckpt=FAKE_CKPT,
        layers=(0, 1),
        content_tokens_per_example=16,
        cls_token=True,
        d_model=128,
        n_examples=100,
        max_tokens_per_shard=1024,
        data="",
        dataset=pathlib.Path("fake"),
    )
    defaults.update(kwargs)
    return shards.Metadata(**defaults)


@st.composite
def metadatas(draw):
    layers = tuple(
        sorted(
            draw(
                st.sets(
                    st.integers(min_value=0, max_value=24), min_size=1, max_size=4
                )
            )
        )
    )
    ctpe = draw(st.integers(min_value=1, max_value=300))
    cls_token = draw(st.booleans())
    tokens_per_example = ctpe + int(cls_token)
    # Ensure at least one example fits per shard.
    min_tokens = tokens_per_example * len(layers)
    max_tokens = draw(st.integers(min_value=min_tokens, max_value=min_tokens * 50))
    return make_md(
        layers=layers,
        content_tokens_per_example=ctpe,
        cls_token=cls_token,
        n_examples=draw(st.integers(min_value=1, max_value=10_000)),
        max_tokens_per_shard=max_tokens,
        d_model=draw(st.sampled_from([32, 128, 1024])),
    )


@settings(max_examples=50, deadline=None)
@given(md=metadatas())
def test_metadata_shard_sizing_invariants(md: shards.Metadata):
    assert md.examples_per_shard >= 1
    assert md.n_shards >= 1
    # All examples fit in n_shards.
    assert md.n_shards * md.examples_per_shard >= md.n_examples
    # Not over-provisioned by more than one shard.
    assert (md.n_shards - 1) * md.examples_per_shard < md.n_examples
    # Tokens per shard within budget.
    per_shard_tokens = md.examples_per_shard * md.tokens_per_example * len(md.layers)
    assert per_shard_tokens <= md.max_tokens_per_shard
    assert md.shard_shape == (
        md.examples_per_shard,
        len(md.layers),
        md.tokens_per_example,
        md.d_model,
    )


@settings(max_examples=25, deadline=None)
@given(md=metadatas())
def test_metadata_hash_stable_and_sensitive(md: shards.Metadata):
    assert md.hash == md.hash
    assert len(md.hash) == 8
    import dataclasses

    other = dataclasses.replace(md, n_examples=md.n_examples + 1)
    assert other.hash != md.hash


def test_metadata_dump_load_roundtrip(tmp_path):
    root = conftest.tmp_shards_root(tmp_path)
    md = make_md()
    md.dump(root)
    loaded = shards.Metadata.load(root / md.hash)
    assert loaded == md


def test_metadata_json_fields(tmp_path):
    root = conftest.tmp_shards_root(tmp_path)
    md = make_md()
    md.dump(root)
    with open(root / md.hash / "metadata.json") as fd:
        dct = json.load(fd)
    assert dct["family"] == "fake-clip"
    assert dct["pixel_agg"] == "majority"
    assert dct["protocol"] == "2.1"
    assert dct["layers"] == [0, 1]


def test_metadata_requires_one_example_per_shard():
    with pytest.raises(AssertionError):
        make_md(max_tokens_per_shard=1)


def test_shard_writer_roundtrip(tmp_path):
    root = conftest.tmp_shards_root(tmp_path)
    md = make_md(n_examples=10, max_tokens_per_shard=4 * 17 * 2)  # 4 examples/shard
    assert md.examples_per_shard == 4
    md.dump(root)

    rng = np.random.default_rng(0)
    acts = rng.normal(size=(10, 2, 17, 128)).astype(np.float32)

    with shards.ShardWriter(root, md) as writer:
        writer.write_batch(acts[:3], 0)
        writer.write_batch(acts[3:9], 3)
        writer.write_batch(acts[9:], 9)

    info = shards.ShardInfo.load(root / md.hash)
    assert [s.n_examples for s in info] == [4, 4, 2]
    info.validate(root / md.hash)

    # Read back and compare.
    got = []
    for i, s in enumerate(info):
        mm = np.memmap(
            root / md.hash / s.name, mode="r", dtype=np.float32, shape=md.shard_shape
        )
        got.append(np.array(mm[: s.n_examples]))
    got = np.concatenate(got)
    np.testing.assert_array_equal(got, acts)

    # No labels were written -> labels.bin deleted.
    assert not (root / md.hash / "labels.bin").exists()


def test_shard_writer_labels(tmp_path):
    root = conftest.tmp_shards_root(tmp_path)
    md = make_md(n_examples=6, max_tokens_per_shard=4 * 17 * 2)
    md.dump(root)

    acts = np.zeros((6, 2, 17, 128), dtype=np.float32)
    labels = (np.arange(6 * 16) % 256).astype(np.uint8).reshape(6, 16)

    with shards.ShardWriter(root, md) as writer:
        writer.write_batch(acts, 0, patch_labels=labels)

    got = np.memmap(
        root / md.hash / "labels.bin", mode="r", dtype=np.uint8, shape=(6, 16)
    )
    np.testing.assert_array_equal(np.array(got), labels)


def test_shard_info_missing_json_diagnostics(tmp_path):
    root = conftest.tmp_shards_root(tmp_path)
    d = root / "deadbeef"
    d.mkdir()
    with pytest.raises(FileNotFoundError, match="Could not load shard metadata"):
        shards.ShardInfo.load(d)


def test_validate_missing_file(tmp_path):
    root = conftest.tmp_shards_root(tmp_path)
    d = root / "deadbeef"
    d.mkdir()
    info = shards.ShardInfo([shards.Shard("acts000000.bin", 4)])
    info.dump(d)
    with pytest.raises(FileNotFoundError, match="Missing files"):
        info.validate(d)


def test_validate_empty_file(tmp_path):
    root = conftest.tmp_shards_root(tmp_path)
    d = root / "deadbeef"
    d.mkdir()
    (d / "acts000000.bin").touch()
    info = shards.ShardInfo([shards.Shard("acts000000.bin", 4)])
    with pytest.raises(FileNotFoundError, match="Empty files"):
        info.validate(d)


class TestIndexMap:
    def test_content_fixed_layer(self):
        md = make_md(n_examples=10, max_tokens_per_shard=4 * 17 * 2)
        im = shards.IndexMap(md, "content", 1)
        assert len(im) == 10 * 16

        idx = im.from_global(0)
        assert idx.example_idx == 0
        assert idx.content_token_idx == 0
        assert idx.shard_idx == 0
        assert idx.token_idx_in_shard == 1  # CLS at 0

        # Example 5 token 3: global = 5*16+3
        idx = im.from_global(5 * 16 + 3)
        assert idx.example_idx == 5
        assert idx.content_token_idx == 3
        assert idx.shard_idx == 1  # 4 examples/shard
        assert idx.example_idx_in_shard == 1
        assert idx.layer_idx_in_shard == 1
        assert idx.token_idx_in_shard == 4

    def test_special_fixed_layer(self):
        md = make_md(n_examples=10, max_tokens_per_shard=4 * 17 * 2)
        im = shards.IndexMap(md, "special", 0)
        assert len(im) == 10
        idx = im.from_global(7)
        assert idx.example_idx == 7
        assert idx.content_token_idx == -1
        assert idx.shard_idx == 1
        assert idx.example_idx_in_shard == 3
        assert idx.token_idx_in_shard == 0

    def test_no_cls_content(self):
        md = make_md(cls_token=False, n_examples=4, max_tokens_per_shard=4 * 16 * 2)
        im = shards.IndexMap(md, "content", 0)
        idx = im.from_global(0)
        assert idx.token_idx_in_shard == 0

    def test_all_tokens_len(self):
        md = make_md(n_examples=10)
        assert len(shards.IndexMap(md, "all", 0)) == 10 * 17
        assert len(shards.IndexMap(md, "all", "all")) == 10 * 17 * 2
        assert len(shards.IndexMap(md, "content", "all")) == 10 * 16 * 2

    def test_out_of_range(self):
        md = make_md(n_examples=10)
        im = shards.IndexMap(md, "content", 0)
        with pytest.raises(IndexError):
            im.from_global(len(im))
        with pytest.raises(IndexError):
            im.from_global(-1)

    def test_special_requires_cls(self):
        md = make_md(cls_token=False)
        with pytest.raises(AssertionError):
            shards.IndexMap(md, "special", 0)

    def test_bad_layer(self):
        md = make_md(layers=(0, 1))
        with pytest.raises(AssertionError):
            shards.IndexMap(md, "content", 5)


def test_pixel_to_patch_labels_majority():
    seg = np.zeros((8, 8), dtype=np.uint8)
    seg[0:4, 0:4] = 1  # patch 0 all 1s
    seg[0:4, 4:8] = 2  # patch 1 all 2s
    seg[4:8, 0:2] = 3  # patch 2: half 3s, half 0s -> tie, argmax picks 0
    got = shards.pixel_to_patch_labels(seg, n_patches=4, patch_size=4)
    assert got.tolist() == [1, 2, 0, 0]
    assert got.dtype == np.uint8


def test_pixel_to_patch_labels_prefer_fg():
    seg = np.zeros((8, 8), dtype=np.uint8)
    seg[4:6, 0:2] = 3  # patch 2: minority 3s over background
    got = shards.pixel_to_patch_labels(
        seg, n_patches=4, patch_size=4, pixel_agg=shards.PixelAgg.PREFER_FG
    )
    assert got.tolist() == [0, 0, 3, 0]


def test_pixel_to_patch_labels_shape_mismatch():
    seg = np.zeros((8, 8), dtype=np.uint8)
    with pytest.raises(AssertionError):
        shards.pixel_to_patch_labels(seg, n_patches=5, patch_size=4)


def test_metadata_hash_golden():
    """The content hash is pinned: field-definition-order compact JSON, matching
    orjson's dataclass serialization in the reference (shards.py:127-135).
    Changing serialization silently would orphan every existing shard dir."""
    import base64
    import hashlib
    import json
    import pickle

    from saev_tpu.data import datasets, shards

    data = base64.b64encode(pickle.dumps(datasets.FakeImg(n_examples=4))).decode()
    md = shards.Metadata(
        family="fake-clip",
        ckpt="test-ckpt",
        layers=(0,),
        content_tokens_per_example=16,
        cls_token=True,
        d_model=128,
        n_examples=4,
        max_tokens_per_shard=128,
        data=data,
        dataset=pathlib.Path("/fake/root"),
    )
    # Independent recomputation of the spec: compact JSON, field order.
    dct = {f.name: getattr(md, f.name) for f in dataclasses.fields(md)}
    rendered = json.dumps(
        dct, separators=(",", ":"),
        default=lambda o: str(o) if isinstance(o, pathlib.Path) else o.value,
    ).encode()
    assert md.hash == hashlib.sha256(rendered).hexdigest()[:8]
    # Field order, not sorted order.
    keys = list(json.loads(rendered).keys())
    assert keys[0] == "family" and keys != sorted(keys)


def test_decode_dataset_cfg_blocks_arbitrary_code():
    """The protocol's pickled dataset configs decode through a restricted
    unpickler: config dataclasses round-trip, reference module paths map onto
    ours, and reduce-to-os.system payloads raise instead of executing."""
    import base64
    import pickle

    from saev_tpu.data import datasets
    from saev_tpu.data import shards as shards_mod

    enc = shards_mod.encode_dataset_cfg(datasets.FakeImg(n_examples=7))
    assert shards_mod.decode_dataset_cfg(enc) == datasets.FakeImg(n_examples=7)

    # Reference-written configs use module saev.data.datasets; same-name
    # dataclasses resolve onto ours. Simulate one by pickling a class whose
    # __module__ claims the reference package.
    import dataclasses as _dc
    import sys
    import types

    @_dc.dataclass(frozen=True)
    class FakeImg:
        n_examples: int = 10

    FakeImg.__module__ = "saev.data.datasets"
    FakeImg.__qualname__ = "FakeImg"
    mod = types.ModuleType("saev.data.datasets")
    mod.FakeImg = FakeImg
    # Save/restore sys.modules: the reference-parity tests may have the REAL
    # saev package loaded in this process.
    saved = {n: sys.modules.get(n) for n in ("saev", "saev.data", "saev.data.datasets")}
    sys.modules.setdefault("saev", types.ModuleType("saev"))
    sys.modules.setdefault("saev.data", types.ModuleType("saev.data"))
    sys.modules["saev.data.datasets"] = mod
    try:
        ref_enc = base64.b64encode(pickle.dumps(FakeImg(n_examples=3))).decode("utf8")
    finally:
        for name, prev in saved.items():
            if prev is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = prev
    assert shards_mod.decode_dataset_cfg(ref_enc) == datasets.FakeImg(n_examples=3)

    class Evil:
        def __reduce__(self):
            import os

            return (os.system, ("echo pwned",))

    evil = base64.b64encode(pickle.dumps(Evil())).decode("utf8")
    with pytest.raises(pickle.UnpicklingError, match="Blocked"):
        shards_mod.decode_dataset_cfg(evil)
