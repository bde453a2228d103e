"""Regression tests for review findings: drop_last, exact-fill shard rollover,
jdumps UTF-8 byte parity, extraction layer-order validation, job-array error
propagation, ImgFolder count consistency, and the BirdCLEF dataset."""

import json
import pathlib

import numpy as np
import pytest

from conftest import _Helpers as helpers


def test_shuffled_drop_last(tmp_path):
    from saev_tpu.data import ShuffledConfig, ShuffledDataLoader

    shards_dir = helpers.write_shards(tmp_path, n_examples=10, layers=(0,))
    # 10 examples x 4 patches + cls = 5 tokens/example -> 50 content+special?
    # Use the loader's own n_samples: batch 16 over it leaves a remainder.
    base = dict(shards=shards_dir, layer=0, batch_size=24, n_threads=2, seed=0)

    keep = ShuffledDataLoader(ShuffledConfig(**base, drop_last=False))
    drop = ShuffledDataLoader(ShuffledConfig(**base, drop_last=True))
    assert keep.n_samples % 24 != 0, "fixture should produce a remainder"

    keep_batches = [b["act"].shape[0] for b in keep]
    drop_batches = [b["act"].shape[0] for b in drop]
    assert keep_batches.count(24) == len(keep_batches) - 1
    assert keep_batches[-1] == keep.n_samples % 24
    assert all(b == 24 for b in drop_batches)
    assert len(drop_batches) == drop.n_samples // 24 == len(drop)
    assert len(keep_batches) == len(keep)
    keep.shutdown()
    drop.shutdown()


def test_shard_writer_exact_fill_no_empty_shard(tmp_path):
    """n_examples an exact multiple of examples_per_shard must not leave a
    trailing empty shard in shards.json."""
    from saev_tpu.data import shards as shards_mod

    # 8 examples, shard size such that examples_per_shard divides 8 exactly.
    shards_dir = helpers.write_shards(
        tmp_path, n_examples=8, layers=(0,), max_tokens_per_shard=20
    )
    md = shards_mod.Metadata.load(shards_dir)
    info = shards_mod.ShardInfo.load(shards_dir)
    assert md.n_examples % md.examples_per_shard == 0
    assert len(info) == md.n_shards
    assert all(s.n_examples > 0 for s in info)
    # And every recorded shard file exists with the right size.
    info.validate(shards_dir)


def test_jdumps_utf8_bytes():
    from saev_tpu import helpers as H

    out = H.jdumps({"ckpt": "модель-β"})
    # orjson emits raw UTF-8, not \uXXXX escapes.
    assert out == '{"ckpt":"модель-β"}'.encode("utf-8")
    assert b"\\u" not in out
    assert json.loads(out) == {"ckpt": "модель-β"}


def test_extract_rejects_unsorted_layers(tmp_path):
    from saev_tpu.data import datasets, extract, fake_vit
    from conftest import FAKE_CKPT

    with pytest.raises(AssertionError, match="sorted and unique"):
        extract.worker_fn(
            family="fake-clip",
            ckpt=FAKE_CKPT,
            content_tokens_per_example=fake_vit.N_PATCHES,
            cls_token=True,
            d_model=fake_vit.D_MODEL,
            layers=[1, 0],
            data=datasets.FakeImg(n_examples=4),
            batch_size=2,
            n_workers=1,
            max_tokens_per_shard=128,
            shards_root=helpers.tmp_shards_root(tmp_path),
            device="cpu",
        )


def test_submit_job_array_propagates_errors():
    """Without submitit, real job exceptions must propagate, not be swallowed
    as 'did not finish'."""
    import contextlib

    from saev_tpu import helpers as H

    class FakeJob:
        job_id = "x"

        def result(self):
            raise RuntimeError("boom")

    class FakeExecutor:
        _saev_sleep_s = 0.0

        def batch(self):
            return contextlib.nullcontext()

        def submit(self, fn, arg):
            return FakeJob()

    with pytest.raises(RuntimeError, match="boom"):
        list(H.submit_job_array(FakeExecutor(), lambda x: x, [0]))


def test_imgfolder_count_matches_dataset(tmp_path):
    from PIL import Image

    from saev_tpu.data import datasets

    for split in ("a", "b"):
        for cls in ("c0", "c1"):
            d = tmp_path / split / cls
            d.mkdir(parents=True)
            for i in range(3):
                Image.new("RGB", (4, 4)).save(d / f"{i}.png")
    # A stray image NOT under a class dir must not be counted (the dataset
    # never loads it).
    Image.new("RGB", (4, 4)).save(tmp_path / "a" / "stray.png")

    cfg = datasets.ImgFolder(root=tmp_path / "*")
    ds = datasets.get_dataset(cfg)
    assert cfg.n_examples == len(ds) == 12


def test_birdclef_dataset(tmp_path):
    import scipy.io.wavfile

    from saev_tpu.data import datasets

    root = tmp_path / "birdclef-2025"
    (root / "train_audio" / "amekes").mkdir(parents=True)
    (root / "train_audio" / "mammal1").mkdir(parents=True)
    (root / "taxonomy.csv").write_text(
        "primary_label,class_name\namekes,Aves\nmammal1,Mammalia\n"
    )
    (root / "train.csv").write_text(
        "primary_label,filename\n"
        "amekes,amekes/x1.wav\n"
        "amekes,amekes/x2.wav\n"
        "mammal1,mammal1/y.wav\n"
    )
    rng = np.random.default_rng(0)
    for rel in ("amekes/x1.wav", "amekes/x2.wav", "mammal1/y.wav"):
        wav = (rng.normal(size=8000) * 0.1).astype(np.float32)
        scipy.io.wavfile.write(root / "train_audio" / rel, 16000, wav)

    cfg = datasets.BirdClef2025(root=root)
    assert cfg.n_examples == 2  # Aves only
    ds = datasets.get_dataset(cfg)
    assert len(ds) == 2
    s = ds[0]
    assert s["label"] == "amekes" and s["target"] == 0
    assert s["sample_rate"] == 16000
    assert isinstance(s["data"], np.ndarray) and s["data"].ndim == 1

    # Transform hook applies to the waveform.
    ds2 = datasets.get_dataset(cfg, data_transform=lambda w: w[:100])
    assert ds2[1]["data"].shape == (100,)


def test_load_audio_int16_wav_normalized(tmp_path):
    """Integer-PCM WAVs must be normalized to [-1, 1] (ADVICE r1: the float
    cast ran before the integer-kind check, so int16 came out at +/-32768)."""
    import scipy.io.wavfile

    from saev_tpu.data.datasets import _load_audio

    sr = 16000
    f32 = (np.sin(np.linspace(0, 440 * 2 * np.pi, sr)) * 0.5).astype(np.float32)
    i16 = (f32 * 32767).astype(np.int16)
    u8 = ((f32 * 127) + 128).round().clip(0, 255).astype(np.uint8)

    for name, data in [("f.wav", f32), ("i.wav", i16), ("u.wav", u8)]:
        scipy.io.wavfile.write(tmp_path / name, sr, data)

    wav_f, sr_f = _load_audio(tmp_path / "f.wav")
    wav_i, _ = _load_audio(tmp_path / "i.wav")
    wav_u, _ = _load_audio(tmp_path / "u.wav")
    assert sr_f == sr
    for wav in (wav_f, wav_i, wav_u):
        assert wav.dtype == np.float32
        assert np.abs(wav).max() <= 1.0 + 1e-3
    # int16 round-trips the float signal up to quantization error.
    np.testing.assert_allclose(wav_i, f32, atol=1.5 / 32767)
    # uint8 is offset PCM: must come back centered, not in [0, 2].
    assert abs(wav_u.mean()) < 0.05
    np.testing.assert_allclose(wav_u, f32, atol=2.5 / 127)


def test_decode_precision_threaded_to_all_matmuls():
    """decode(precision=HIGHEST) must run every contraction (group matmul,
    prefix-mask einsum, remainder dot) at HIGHEST (ADVICE r1: the mask einsum
    and remainder dot dropped the precision argument). On CPU precision is a
    no-op numerically, so assert on the jaxpr instead."""
    import jax
    import jax.numpy as jnp

    from saev_tpu.nn import modeling

    cfg = modeling.SparseAutoencoderConfig(
        d_model=16, d_sae=64, activation=modeling.TopK(top_k=4)
    )
    params, _ = modeling.init(cfg, jax.random.key(0))
    f_x = jnp.zeros((8, 64), jnp.float32)
    prefixes = jnp.asarray([16, 40, 64], jnp.int32)

    jaxpr = jax.make_jaxpr(
        lambda p, f: modeling.decode(
            cfg, p, f, prefixes, group_size=32, precision=jax.lax.Precision.HIGHEST
        )
    )(params, f_x)
    dots = [
        e.params["precision"]
        for e in jaxpr.jaxpr.eqns
        if e.primitive.name == "dot_general"
    ]
    assert len(dots) >= 3, f"expected group+mask+remainder dots, got {len(dots)}"
    for prec in dots:
        assert prec == (jax.lax.Precision.HIGHEST, jax.lax.Precision.HIGHEST), prec
