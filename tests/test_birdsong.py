"""Birdsong contrib tests: WAV codec, spectrogram rendering, highlight layout."""

import pathlib
import sys
import wave

import numpy as np

sys.path.insert(
    0, str(pathlib.Path(__file__).parent.parent / "contrib" / "birdsong" / "src")
)

from birdsong import visuals
from saev_tpu.models import bird_mae


def test_write_wav_roundtrip(tmp_path):
    sr = 32000
    t = np.arange(sr) / sr
    wav_f = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    fpath = tmp_path / "tone.wav"
    visuals.write_wav(fpath, wav_f, sr)
    with wave.open(str(fpath)) as w:
        assert w.getframerate() == sr
        assert w.getnchannels() == 1
        pcm = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    rec = pcm.astype(np.float32) / 32767
    np.testing.assert_allclose(rec, wav_f, atol=1e-3)


def test_spectrogram_images():
    rng = np.random.default_rng(0)
    fb = rng.normal(size=(512, 128)).astype(np.float32)
    img = visuals.spectrogram_image(fb)
    assert img.size == (512, 128)  # time on x, mel on y
    img2 = visuals.spectrogram_image(fb, scale=2)
    assert img2.size == (1024, 256)

    acts = np.zeros(256, dtype=np.float32)
    acts[5 * 8 + 2] = 3.0  # time patch 5, mel patch 2
    over = visuals.sae_spectrogram_image(fb, acts)
    assert over.size == (512, 128)
    arr = np.asarray(over)
    # The highlighted patch: x in [5*16, 6*16), y (flipped mel) in
    # [(8-1-2)*16, (8-2)*16). The overlay makes it differ from the base there.
    base = np.asarray(visuals.spectrogram_image(fb).convert("RGBA"))
    y0, x0 = (8 - 1 - 2) * 16, 5 * 16
    patch_diff = (arr[y0:y0 + 16, x0:x0 + 16, :3] != base[y0:y0 + 16, x0:x0 + 16, :3]).any()
    elsewhere_same = (arr[:16, -16:, :3] == base[:16, -16:, :3]).all()
    assert patch_diff and elsewhere_same


def test_clip_pipeline_from_waveform(tmp_path):
    """transform -> patch activations -> filter -> wav files, end to end."""
    rng = np.random.default_rng(1)
    wav_f = rng.normal(size=bird_mae.SR_HZ * 5).astype(np.float32) * 0.1
    fb = bird_mae.transform(wav_f)
    acts = np.zeros(256, dtype=np.float32)
    acts[3 * 8 + 1] = 1.0
    patches = acts > 0
    clip = bird_mae.filter_audio(wav_f, bird_mae.SR_HZ, patches, mode="time")
    visuals.write_wav(tmp_path / "clip.wav", clip, bird_mae.SR_HZ)
    assert (tmp_path / "clip.wav").exists()
    visuals.sae_spectrogram_image(fb, acts).save(tmp_path / "spec.png")
    assert (tmp_path / "spec.png").exists()
