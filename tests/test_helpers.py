import dataclasses
import json
import pathlib

import numpy as np
import pytest
import scipy.sparse

from saev_tpu import helpers


def test_fssafe():
    assert helpers.fssafe("hf-hub:timm/ViT-L-16") == "hf-hub_timm_ViT-L-16"
    assert helpers.fssafe("a b/c\\d") == "a_b_c_d"


def test_batched_idx():
    assert list(helpers.batched_idx(10, 4)) == [(0, 4), (4, 8), (8, 10)]
    assert list(helpers.batched_idx(0, 4)) == []
    assert list(helpers.batched_idx(4, 4)) == [(0, 4)]


def test_flattened_and_get():
    dct = {"a": {"b": 1, "c": {"d": 2}}, "e": 3}
    flat = helpers.flattened(dct)
    assert flat == {"a.b": 1, "a.c.d": 2, "e": 3}
    assert helpers.get(dct, "a.c.d") == 2


def test_jdumps_compact():
    assert helpers.jdumps({"a": 1, "b": [1, 2]}) == b'{"a":1,"b":[1,2]}'


def test_jdumps_dataclass_field_order():
    @dataclasses.dataclass
    class Foo:
        z: int = 1
        a: str = "x"

    assert helpers.jdumps(Foo()) == b'{"z":1,"a":"x"}'


def test_jdumps_path_and_sort():
    obj = {"b": pathlib.Path("/tmp/x"), "a": 1}
    assert helpers.jdumps(obj, sort_keys=True) == b'{"a":1,"b":"/tmp/x"}'


def test_jdump_roundtrip(tmp_path):
    fpath = tmp_path / "x.json"
    with open(fpath, "wb") as fd:
        helpers.jdump({"k": [1, 2.5, "s"]}, fd, indent=2)
    with open(fpath) as fd:
        assert json.load(fd) == {"k": [1, 2.5, "s"]}


def test_make_hashable():
    a = helpers.make_hashable({"x": [1, 2], "y": {"z": (3,)}})
    b = helpers.make_hashable({"y": {"z": (3,)}, "x": [1, 2]})
    assert a == b
    assert hash(a) == hash(b)
    assert helpers.make_hashable([1]) != helpers.make_hashable((1,))
    assert helpers.make_hashable(pathlib.Path("/a")) == ("path", "/a")


def test_make_hashable_nan():
    assert helpers.make_hashable(float("nan")) == helpers.make_hashable(float("nan"))


def test_np_topk_flat():
    arr = np.array([3.0, 1.0, 4.0, 1.0, 5.0])
    res = helpers.np_topk(arr, 2)
    assert list(res.values) == [5.0, 4.0]
    assert list(res.indices) == [4, 2]


def test_np_topk_axis():
    arr = np.array([[1.0, 5.0, 3.0], [9.0, 2.0, 7.0]])
    res = helpers.np_topk(arr, 2, axis=1)
    np.testing.assert_array_equal(res.values, [[5.0, 3.0], [9.0, 7.0]])
    np.testing.assert_array_equal(res.indices, [[1, 2], [0, 2]])


def test_np_topk_stable_ties():
    arr = np.array([2.0, 2.0, 2.0])
    res = helpers.np_topk(arr, 2)
    assert list(res.indices) == [0, 1]


@pytest.mark.parametrize("axis", [0, 1])
def test_csr_topk_matches_dense(axis):
    rng = np.random.default_rng(0)
    dense = rng.random((50, 20)).astype(np.float32)
    dense[dense < 0.7] = 0.0
    sp = scipy.sparse.csr_array(dense)

    k = 5
    got = helpers.csr_topk(sp, k, axis=axis, batch_size=7)
    want = helpers.np_topk(dense, k, axis=axis)
    np.testing.assert_allclose(got.values, want.values, rtol=1e-6)
    # Values equal at the same positions (indices may differ on exact ties).
    np.testing.assert_allclose(
        np.take_along_axis(dense, got.indices, axis=axis), want.values, rtol=1e-6
    )


def test_progress_len():
    p = helpers.progress([1, 2, 3], total=3)
    assert len(p) == 3
    assert list(p) == [1, 2, 3]


def test_get_slurm_max_array_size_off_slurm():
    from saev_tpu import helpers

    assert helpers.get_slurm_max_array_size(default=777) == 777
    assert helpers.get_slurm_job_count() == 0


def test_submit_job_array_batches():
    """submit_job_array splits into MaxArraySize-respecting batches and yields
    (index, result) in order, with None for failed jobs."""
    from saev_tpu import helpers

    class FakeJob:
        def __init__(self, value):
            self.value = value
            self.job_id = str(value)

        def result(self):
            if self.value == 3:
                raise RuntimeError("boom")  # treated as generic failure? no:
            return self.value * 10

    class FakeExecutor:
        _saev_sleep_s = 0.0

        def __init__(self):
            self.batches = []

        def batch(self):
            import contextlib

            self.batches.append([])
            return contextlib.nullcontext()

        def submit(self, fn, arg):
            return FakeJob(fn(arg))

    ex = FakeExecutor()
    results = list(helpers.submit_job_array(ex, lambda x: x, [0, 1, 2], margin=0.8))
    assert results == [(0, 0), (1, 10), (2, 20)]
