"""Ogg/Vorbis codec binding tests: ctypes encode/decode round trip and the
BirdCLEF .ogg decode path the reference relies on (reference
src/saev/data/datasets.py:717-755 via soundfile; ours binds libvorbisfile
directly — saev_tpu/utils/vorbis.py)."""

import numpy as np
import pytest

from saev_tpu.utils import vorbis

pytestmark = pytest.mark.skipif(
    not vorbis.available(), reason="system vorbis libraries not present"
)


def _tone(sr: int, seconds: float = 2.0) -> np.ndarray:
    t = np.arange(int(sr * seconds)) / sr
    return (
        0.4 * np.sin(2 * np.pi * 440 * t) + 0.1 * np.sin(2 * np.pi * 1200 * t)
    ).astype(np.float32)


def test_roundtrip_tone(tmp_path):
    sr = 32000
    wav = _tone(sr)
    fpath = tmp_path / "tone.ogg"
    vorbis.write_ogg(fpath, wav, sr, quality=0.5)
    assert fpath.stat().st_size > 1000

    rec, sr2 = vorbis.read_ogg(fpath)
    assert sr2 == sr
    assert len(rec) == len(wav)
    # Vorbis is lossy but a pure tone at q=0.5 survives nearly unchanged.
    corr = np.corrcoef(rec, wav)[0, 1]
    assert corr > 0.99, corr


def test_roundtrip_noise_and_lengths(tmp_path):
    rng = np.random.default_rng(0)
    sr = 16000
    for n in (1, 777, 16000):
        wav = (rng.normal(size=n) * 0.1).astype(np.float32)
        fpath = tmp_path / f"n{n}.ogg"
        vorbis.write_ogg(fpath, wav, sr)
        rec, sr2 = vorbis.read_ogg(fpath)
        assert sr2 == sr
        assert len(rec) == n, (len(rec), n)


def test_read_rejects_non_ogg(tmp_path):
    fpath = tmp_path / "junk.ogg"
    fpath.write_bytes(b"definitely not an ogg stream")
    with pytest.raises(ValueError, match="ov_fopen"):
        vorbis.read_ogg(fpath)


def test_birdclef_ogg_dataset(tmp_path):
    """The reference's BirdCLEF format uses .ogg recordings; the dataset must
    decode them end-to-end through _load_audio's vorbis backend."""
    from saev_tpu.data import datasets

    root = tmp_path / "birdclef-2025"
    (root / "train_audio" / "amekes").mkdir(parents=True)
    (root / "taxonomy.csv").write_text(
        "primary_label,class_name\namekes,Aves\n"
    )
    (root / "train.csv").write_text(
        "primary_label,filename\namekes,amekes/x1.ogg\n"
    )
    sr = 32000
    wav = _tone(sr, seconds=1.0)
    vorbis.write_ogg(root / "train_audio" / "amekes" / "x1.ogg", wav, sr)

    ds = datasets.get_dataset(datasets.BirdClef2025(root=root))
    sample = ds[0]
    assert sample["sample_rate"] == sr
    assert sample["data"].shape == (len(wav),)
    assert np.corrcoef(sample["data"], wav)[0, 1] > 0.99


def test_birdsong_write_clip_prefers_ogg(tmp_path):
    import pathlib
    import sys

    sys.path.insert(
        0,
        str(pathlib.Path(__file__).parent.parent / "contrib" / "birdsong" / "src"),
    )
    from birdsong import visuals

    out = visuals.write_clip(tmp_path / "clip", _tone(16000, 0.5), 16000)
    assert out.suffix == ".ogg"
    rec, sr = vorbis.read_ogg(out)
    assert sr == 16000 and len(rec) > 0


@pytest.mark.timeout(60)
def test_truncated_stream_terminates(tmp_path):
    """Mid-stream corruption must terminate (shorter audio or ValueError),
    never spin on a persistent decoder error (round-3 review: only OV_HOLE
    is recoverable)."""
    sr = 16000
    wav = _tone(sr, seconds=2.0)
    fpath = tmp_path / "full.ogg"
    vorbis.write_ogg(fpath, wav, sr)
    data = fpath.read_bytes()
    for frac in (0.9, 0.6, 0.3):
        cut = tmp_path / f"cut{int(frac * 100)}.ogg"
        cut.write_bytes(data[: int(len(data) * frac)])
        try:
            rec, sr2 = vorbis.read_ogg(cut)
            assert sr2 == sr
            assert len(rec) <= len(wav)
        except ValueError:
            pass  # a hard decoder error is acceptable; hanging is not
