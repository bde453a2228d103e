"""Native shard-I/O tests: build, pread correctness, hint no-ops, fallback."""

import numpy as np
import pytest

from saev_tpu.data import _native


def test_native_builds_and_reads(tmp_path):
    data = np.arange(4096, dtype=np.float32)
    fpath = tmp_path / "blob.bin"
    data.tofile(fpath)

    with _native.ShardFile(fpath) as f:
        f.advise_sequential(0, data.nbytes)
        f.prefetch(0, data.nbytes)
        raw = f.read_block(16 * 4, 64 * 4)
        got = np.frombuffer(raw.tobytes(), dtype=np.float32)
        np.testing.assert_array_equal(got, data[16:80])
        # Read spanning the end-of-buffer boundary exactly.
        raw = f.read_block((4096 - 8) * 4, 8 * 4)
        np.testing.assert_array_equal(
            np.frombuffer(raw.tobytes(), dtype=np.float32), data[-8:]
        )


def test_native_available_flag():
    # g++ is present in this image, so the native build should succeed.
    assert _native.available() in (True, False)  # must not raise
    if _native.available():
        assert _native._LIB is not None


def test_missing_file_raises(tmp_path):
    with pytest.raises(OSError):
        _native.ShardFile(tmp_path / "nope.bin")


def test_shuffled_loader_with_native_hints(tmp_path):
    """The shuffled loader streams correctly with native hints active."""
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from conftest import _Helpers as helpers

    from saev_tpu.data import ShuffledConfig, ShuffledDataLoader

    shards_dir = helpers.write_shards(tmp_path, n_examples=12, layers=(0,))
    dl = ShuffledDataLoader(
        ShuffledConfig(shards=shards_dir, layer=0, batch_size=32, n_threads=2, seed=3)
    )
    seen = 0
    for batch in dl:
        seen += len(batch["act"])
        if seen >= dl.n_samples:
            break
    dl.shutdown()
    assert seen >= dl.n_samples
