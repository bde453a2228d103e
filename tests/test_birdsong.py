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


class TestStats:
    """birdsong.stats: the birdset activation-distribution study."""

    def test_outlier_dims_finds_planted_channel(self):
        from birdsong import stats

        rng = np.random.default_rng(0)
        acts = rng.normal(size=(2000, 64)).astype(np.float32)
        acts[:, 17] *= 80.0  # the d_bad channel
        s = stats.compute_stats(acts)
        flagged = stats.outlier_dims(s)
        assert flagged, "planted outlier channel not found"
        assert flagged[0]["dim"] == 17
        assert flagged[0]["robust_z"] > 6.0

    def test_no_outliers_on_iid_gaussian(self):
        from birdsong import stats

        rng = np.random.default_rng(1)
        s = stats.compute_stats(rng.normal(size=(2000, 64)))
        assert [d["dim"] for d in stats.outlier_dims(s)] == []

    def test_report_over_fake_shards(self, tmp_path):
        from birdsong import stats
        from conftest import _Helpers as helpers

        audio = helpers.write_shards(tmp_path / "a", n_examples=8, layers=(0,))
        img = helpers.write_shards(tmp_path / "b", n_examples=8, layers=(0,))
        out = tmp_path / "report.json"
        result = stats.report(
            {"audio": (audio, 0), "image": (img, 0)}, n=64, out=out
        )
        assert out.exists()
        assert set(result["per_set"]) == {"audio", "image"}
        assert "audio_vs_image" in result["comparisons"]
        cmp = result["comparisons"]["audio_vs_image"]
        assert cmp["norm_ratio"] > 0
        for name in ("audio", "image"):
            per = result["per_set"][name]
            assert per["n_sampled"] == 64
            assert sum(per["norm_histogram"]["counts"]) == 64


def _fake_clips_dir(tmp_path):
    """Run dir + clips artifacts shaped like birdsong.visuals output."""
    import json

    from PIL import Image

    from conftest import _Helpers as helpers
    from saev_tpu import disk
    from saev_tpu.data import Metadata

    shards_dir = helpers.write_shards(tmp_path, n_examples=4, layers=(0,))
    md = Metadata.load(shards_dir)
    runs_root = helpers.tmp_runs_root(tmp_path)
    run = disk.Run.new(
        "birdrun", train_shards_dir=shards_dir, val_shards_dir=shards_dir,
        runs_root=runs_root,
    )
    clips = run.inference / md.hash / "clips"
    for latent in (3, 7):
        d = clips / str(latent)
        d.mkdir(parents=True)
        for j in range(2):
            Image.new("L", (64, 16)).save(d / f"{j}_spectrogram.png")
            Image.new("L", (64, 16)).save(d / f"{j}_sae_spectrogram.png")
            visuals.write_wav(
                d / f"{j}_time_clip.wav", np.zeros(100, np.float32), 32000
            )
            visuals.write_wav(
                d / f"{j}_time_freq_clip.wav", np.zeros(100, np.float32), 32000
            )
    notes = tmp_path / "notes.json"
    notes.write_text(json.dumps({"3": "call-like harmonic stack"}))
    return run, shards_dir, notes


class TestMakeHtml:
    def _load(self):
        import importlib.util

        fpath = (
            pathlib.Path(__file__).parent.parent
            / "contrib" / "birdsong" / "scripts" / "make_html.py"
        )
        spec = importlib.util.spec_from_file_location("bird_make_html", fpath)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_embedded_with_notes(self, tmp_path):
        mod = self._load()
        run, shards_dir, notes = _fake_clips_dir(tmp_path)
        out = mod.make(mod.Config(
            run=run.run_dir, shards=shards_dir, embed=True, notes=notes,
            out=tmp_path / "page.html",
        ))
        html_doc = out.read_text()
        assert "data:image/png;base64," in html_doc
        assert "data:audio/wav;base64," in html_doc
        assert "call-like harmonic stack" in html_doc
        assert "Latent 3" in html_doc and "Latent 7" in html_doc
        assert "Original Spectrogram" in html_doc
        assert "Time+Freq-Clipped Audio" in html_doc

    def test_curated_latents(self, tmp_path):
        mod = self._load()
        run, shards_dir, _ = _fake_clips_dir(tmp_path)
        out = mod.make(mod.Config(
            run=run.run_dir, shards=shards_dir, latents=(7,),
            out=tmp_path / "curated.html",
        ))
        html_doc = out.read_text()
        assert "Latent 7" in html_doc and "Latent 3" not in html_doc
        # Relative (non-embedded) mode keeps src paths, not data URIs.
        assert "data:image/png" not in html_doc


class TestChannelTrace:
    """birdsong.trace: the model-internals channel microscope (reference
    birdset.py:429-1046 graphs 1-4 + layernorm studies)."""

    @staticmethod
    def _tiny_model(bad_channel: int | None = None):
        import types

        import jax

        from saev_tpu.models import vit

        spec = vit.Spec(
            d_model=32, n_layers=3, n_heads=4, patch_size=4,
            cls_token=False, pos_kind="learned",
        )
        params = vit.init(spec, jax.random.key(0), n_pos=16)
        if bad_channel is not None:
            # Plant a pathological channel the way Bird-MAE's d=295 shows up:
            # a huge constant component entering the residual stream at embed.
            b = np.asarray(params["patch_embed"]["b"]).copy()
            b[bad_channel] = 50.0
            params = dict(params)
            params["patch_embed"] = {**params["patch_embed"], "b": b}
        return types.SimpleNamespace(spec=spec, params=params)

    @staticmethod
    def _tokens(n=2):
        rng = np.random.default_rng(0)
        return rng.normal(size=(n, 16, 3 * 4 * 4)).astype(np.float32)

    def test_forward_sites_shapes_and_consistency(self):
        from birdsong import trace

        model = self._tiny_model()
        acts = trace.trace_sites(model, self._tokens(), (4, 4))
        assert set(acts) == set(trace.SITES)
        for site, a in acts.items():
            assert a.shape == (2, 3, 16, 32), (site, a.shape)
        # The last resid tap must equal the engine's standard layer tap.
        from saev_tpu.models import vit

        _, taps = vit.forward(
            model.spec, model.params, self._tokens(), (0, 1, 2), grid=(4, 4)
        )
        np.testing.assert_allclose(
            acts["resid"], np.asarray(taps), rtol=1e-5, atol=1e-5
        )

    def test_planted_channel_found_and_dominant(self):
        from birdsong import trace

        bad = 7
        model = self._tiny_model(bad_channel=bad)
        acts = trace.trace_sites(model, self._tokens(), (4, 4))
        assert trace.find_bad_channel(acts) == bad
        tr = trace.channel_trace(acts, bad)
        # The planted channel dominates the residual stream at every layer.
        assert (tr.dominance("resid") > 10).all()
        # And a healthy model shows no such dominance at the planted index.
        healthy = trace.channel_trace(
            trace.trace_sites(self._tiny_model(), self._tokens(), (4, 4)), bad
        )
        assert healthy.dominance("resid").max() < 10

    def test_channel_trace_layer_axis_exact(self):
        """Per-layer stats must come from exactly that layer: plant a channel
        whose value IS the layer index and assert the means recover it (a
        reshape that interleaves layers with tokens fails this)."""
        from birdsong import trace

        b, L, t, d = 2, 3, 5, 8
        rng = np.random.default_rng(0)
        acts = rng.normal(size=(b, L, t, d)).astype(np.float32)
        ch = 4
        for layer in range(L):
            acts[:, layer, :, ch] = 10.0 * (layer + 1)
        tr = trace.channel_trace({"resid": acts}, ch)
        np.testing.assert_allclose(
            tr.chan_mean["resid"], [10.0, 20.0, 30.0], rtol=1e-6
        )
        np.testing.assert_allclose(tr.chan_std["resid"], 0.0, atol=1e-5)
        # rest stats exclude the planted channel entirely.
        assert np.abs(tr.rest_mean["resid"]).max() < 1.0

    def test_trace_report_artifacts(self, tmp_path):
        from birdsong import trace

        model = self._tiny_model(bad_channel=3)
        report = trace.trace_report(
            model, self._tokens(), (4, 4), out_dir=tmp_path
        )
        assert report["channel"] == 3 and report["n_layers"] == 3
        assert set(report["dominance_by_site"]) == set(trace.SITES)
        assert len(report["layernorm"]["ln1"]["chan_scale"]) == 3
        figs = [pathlib.Path(p) for p in report["figures"]]
        assert len(figs) == len(trace.SITES) and all(f.exists() for f in figs)
