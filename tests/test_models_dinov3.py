"""DINOv3 parity: tiny torch model implementing the reference architecture
(axial RoPE + storage tokens + LayerScale + masked K bias; reference
src/saev/data/dinov3.py) must match our JAX family through the converter."""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from saev_tpu.data import models as base
from saev_tpu.data import transforms
from saev_tpu.models import dinov3, vit

RTOL, ATOL = 2e-4, 2e-5
D, DEPTH, HEADS, P = 32, 2, 4, 4
N_STORAGE = 4


def _rope_tables(periods: torch.Tensor, h: int, w: int):
    # Reference RopePositionEmbedding.forward (dinov3.py:181-215), separate norm.
    coords_h = torch.arange(0.5, h, dtype=torch.float64) / h
    coords_w = torch.arange(0.5, w, dtype=torch.float64) / w
    coords = torch.stack(
        torch.meshgrid(coords_h, coords_w, indexing="ij"), dim=-1
    ).flatten(0, 1)
    coords = 2.0 * coords - 1.0
    angles = 2 * math.pi * coords[:, :, None] / periods[None, None, :]
    angles = angles.flatten(1, 2).tile((1, 2))
    return torch.sin(angles).float(), torch.cos(angles).float()


def _rotate_half(x):
    x1, x2 = x.chunk(2, dim=-1)
    return torch.cat([-x2, x1], dim=-1)


class _TorchDinov3(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.cls_token = torch.nn.Parameter(torch.randn(1, 1, D) * 0.02)
        self.storage_tokens = torch.nn.Parameter(torch.randn(1, N_STORAGE, D) * 0.02)
        self.patch_proj = torch.nn.Conv2d(3, D, kernel_size=P, stride=P)
        d_head = D // HEADS
        self.periods = (
            100.0 ** (2 * torch.arange(d_head // 4, dtype=torch.float64) / (d_head // 2))
        )
        self.norm = torch.nn.LayerNorm(D, eps=1e-5)
        blocks = []
        for _ in range(DEPTH):
            blk = torch.nn.Module()
            blk.norm1 = torch.nn.LayerNorm(D, eps=1e-5)
            blk.qkv = torch.nn.Linear(D, 3 * D)
            blk.bias_mask = torch.cat(
                [torch.ones(D), torch.zeros(D), torch.ones(D)]
            )  # K bias masked
            blk.proj = torch.nn.Linear(D, D)
            blk.ls1 = torch.nn.Parameter(torch.full((D,), 1e-2))
            blk.norm2 = torch.nn.LayerNorm(D, eps=1e-5)
            blk.fc1 = torch.nn.Linear(D, 4 * D)
            blk.fc2 = torch.nn.Linear(4 * D, D)
            blk.ls2 = torch.nn.Parameter(torch.full((D,), 1e-2))
            blocks.append(blk)
        self.blocks = torch.nn.ModuleList(blocks)

    def forward(self, x_bchw, tap_layers, grid_hw):
        x = self.patch_proj(x_bchw)
        b, d, hp, wp = x.shape
        x = x.reshape(b, d, hp * wp).permute(0, 2, 1)
        x = torch.cat(
            [self.cls_token.expand(b, -1, -1), self.storage_tokens.expand(b, -1, -1), x],
            dim=1,
        )
        sin, cos = _rope_tables(self.periods, *grid_hw)
        n_prefix = 1 + N_STORAGE
        taps = []
        for i, blk in enumerate(self.blocks):
            h = blk.norm1(x)
            qkv = torch.nn.functional.linear(
                h, blk.qkv.weight, blk.qkv.bias * blk.bias_mask
            )
            q, k, v = qkv.chunk(3, dim=-1)
            t = x.shape[1]
            hd = D // HEADS

            def heads(z):
                return z.reshape(b, t, HEADS, hd).transpose(1, 2)

            q, k, v = heads(q), heads(k), heads(v)

            def rope(z):
                pre, pat = z[:, :, :n_prefix], z[:, :, n_prefix:]
                pat = pat * cos + _rotate_half(pat) * sin
                return torch.cat([pre, pat], dim=2)

            q, k = rope(q), rope(k)
            attn = torch.nn.functional.scaled_dot_product_attention(q, k, v)
            attn = attn.transpose(1, 2).reshape(b, t, D)
            x = x + blk.ls1 * blk.proj(attn)
            x = x + blk.ls2 * blk.fc2(
                torch.nn.functional.gelu(blk.fc1(blk.norm2(x)))
            )
            if i in tap_layers:
                taps.append(x)
        return self.norm(x), torch.stack(taps, dim=1)

    def encoder_state_dict(self):
        sd = {
            "cls_token": self.cls_token.detach().numpy(),
            "storage_tokens": self.storage_tokens.detach().numpy(),
            "patch_embed.proj.weight": self.patch_proj.weight.detach().numpy(),
            "patch_embed.proj.bias": self.patch_proj.bias.detach().numpy(),
            "rope_embed.periods": self.periods.numpy(),
            "norm.weight": self.norm.weight.detach().numpy(),
            "norm.bias": self.norm.bias.detach().numpy(),
        }
        for i, blk in enumerate(self.blocks):
            pre = f"blocks.{i}"
            sd[f"{pre}.norm1.weight"] = blk.norm1.weight.detach().numpy()
            sd[f"{pre}.norm1.bias"] = blk.norm1.bias.detach().numpy()
            sd[f"{pre}.attn.qkv.weight"] = blk.qkv.weight.detach().numpy()
            sd[f"{pre}.attn.qkv.bias"] = blk.qkv.bias.detach().numpy()
            sd[f"{pre}.attn.qkv.bias_mask"] = blk.bias_mask.numpy()
            sd[f"{pre}.attn.proj.weight"] = blk.proj.weight.detach().numpy()
            sd[f"{pre}.attn.proj.bias"] = blk.proj.bias.detach().numpy()
            sd[f"{pre}.ls1.gamma"] = blk.ls1.detach().numpy()
            sd[f"{pre}.ls2.gamma"] = blk.ls2.detach().numpy()
            sd[f"{pre}.norm2.weight"] = blk.norm2.weight.detach().numpy()
            sd[f"{pre}.norm2.bias"] = blk.norm2.bias.detach().numpy()
            sd[f"{pre}.mlp.fc1.weight"] = blk.fc1.weight.detach().numpy()
            sd[f"{pre}.mlp.fc1.bias"] = blk.fc1.bias.detach().numpy()
            sd[f"{pre}.mlp.fc2.weight"] = blk.fc2.weight.detach().numpy()
            sd[f"{pre}.mlp.fc2.bias"] = blk.fc2.bias.detach().numpy()
        return sd


def _tiny_spec():
    import dataclasses

    return dataclasses.replace(
        dinov3.PRETRAINED_SPECS["dinov3_vitb16"],
        d_model=D, n_layers=DEPTH, n_heads=HEADS, patch_size=P,
    )


def _make_jax_model(ref):
    spec = _tiny_spec()
    params, periods = dinov3.convert_encoder(ref.encoder_state_dict(), spec)
    model = object.__new__(dinov3.Vit)
    model._ckpt_path = "test"
    model._name = "tiny"
    model.spec = spec
    model.params = params
    model.periods = periods
    return model


@pytest.mark.parametrize("grid", [(4, 4), (2, 8), (8, 2)])
def test_dinov3_parity_flex_grids(grid):
    torch.manual_seed(3)
    ref = _TorchDinov3().eval()
    model = _make_jax_model(ref)

    gh, gw = grid
    x = np.random.default_rng(5).normal(size=(2, 3, gh * P, gw * P)).astype(np.float32)
    with torch.no_grad():
        out_t, taps_t = ref(torch.from_numpy(x), tap_layers=(0, 1), grid_hw=grid)

    tokens = np.stack([transforms.patchify(xi, P)[0] for xi in x])
    grids = np.tile(np.array([[gh, gw]]), (2, 1))
    out_j, taps_j = model.forward_recorded(tokens, (0, 1), grid=grids)

    np.testing.assert_allclose(taps_j, taps_t.numpy(), rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(out_j, out_t.numpy(), rtol=RTOL, atol=ATOL)


def test_dinov3_mixed_grids_in_batch():
    """Per-example grids: each example matches its own single-grid forward."""
    torch.manual_seed(4)
    ref = _TorchDinov3().eval()
    model = _make_jax_model(ref)

    rng = np.random.default_rng(6)
    x1 = rng.normal(size=(3, 2 * P, 8 * P)).astype(np.float32)
    x2 = rng.normal(size=(3, 4 * P, 4 * P)).astype(np.float32)
    t1, _ = transforms.patchify(x1, P)
    t2, _ = transforms.patchify(x2, P)
    tokens = np.stack([t1, t2])
    grids = np.array([[2, 8], [4, 4]])

    _, taps_mixed = model.forward_recorded(tokens, (1,), grid=grids)
    _, taps_a = model.forward_recorded(t1[None], (1,), grid=np.array([[2, 8]]))
    _, taps_b = model.forward_recorded(t2[None], (1,), grid=np.array([[4, 4]]))

    np.testing.assert_allclose(taps_mixed[0], taps_a[0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(taps_mixed[1], taps_b[0], rtol=1e-5, atol=1e-6)


def test_dinov3_recorder_token_selection():
    torch.manual_seed(5)
    ref = _TorchDinov3().eval()
    model = _make_jax_model(ref)

    n_content = 16
    rec = base.Recorder(model, n_content, cls_token=True, layers=[0])
    x = np.random.default_rng(7).normal(size=(2, 3, 16, 16)).astype(np.float32)
    tokens = np.stack([transforms.patchify(xi, P)[0] for xi in x])
    out, acts = rec(tokens, grid=np.array([[4, 4], [4, 4]]))
    assert acts.shape == (2, 1, n_content + 1, D)
    # Storage tokens (positions 1..4 raw) are excluded.
    _, taps = model.forward_recorded(tokens, (0,), grid=np.array([[4, 4], [4, 4]]))
    np.testing.assert_allclose(acts[:, 0, 0], taps[:, 0, 0], rtol=1e-6)
    np.testing.assert_allclose(acts[:, 0, 1:], taps[:, 0, 1 + N_STORAGE:], rtol=1e-6)


def test_parse_name():
    assert (
        dinov3.Vit._parse_name("dinov3_vitb16_pretrain_lvd1689m-73cec8be.pth")
        == "dinov3_vitb16"
    )
    assert dinov3.Vit._parse_name("/a/b/dinov3_vits16plus_pretrain_x-abc.pth") == (
        "dinov3_vits16plus"
    )


# ---------------------------------------------------------------------------
# LIVE parity against the reference's OWN DINOv3 module (src/saev/data/
# dinov3.py:23-456): its Encoder, randomized, converted through our
# convert_encoder, must match our JAX engine bit-for-tolerance. The
# hand-rebuilt _TorchDinov3 above pins the architecture as WE read it; this
# pins it as the reference WROTE it.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_dinov3():
    from conftest import load_reference_data_module

    return load_reference_data_module("dinov3")


def test_dinov3_live_reference_parity(ref_dinov3):
    ref = ref_dinov3
    cfg = ref.Config(
        img_size=4 * P, patch_size=P, embed_dim=D, depth=DEPTH, num_heads=HEADS,
        n_storage_tokens=N_STORAGE, ffn_layer="mlp", ffn_ratio=4.0,
        mask_k_bias=True, pos_embed_rope_dtype="fp32",
    )
    enc = ref.Encoder(cfg)
    torch.manual_seed(11)
    with torch.no_grad():
        for p_ in enc.parameters():
            if p_.ndim >= 2:
                torch.nn.init.normal_(p_, std=0.02)
            else:
                torch.nn.init.normal_(p_, std=0.01)
        for i, blk in enumerate(enc.blocks):
            # Real checkpoints carry the K-mask as data; q/v biased, k not.
            blk.attn.qkv.bias_mask.copy_(
                torch.cat([torch.ones(D), torch.zeros(D), torch.ones(D)])
            )
            blk.ls1.gamma.fill_(1e-2 * (i + 1))
            blk.ls2.gamma.fill_(2e-2 * (i + 1))
    enc.eval()

    b, gh, gw = 2, 4, 4
    n = gh * gw
    g = torch.Generator().manual_seed(5)
    x_tokens = torch.randn(b, n, 3 * P * P, generator=g)
    grid = torch.tensor([[gh, gw]] * b)
    with torch.no_grad():
        want = enc(x_tokens, grid=grid)

    sd = {
        k: v.detach().numpy()
        for k, v in {**dict(enc.state_dict()), **dict(enc.named_buffers())}.items()
    }
    spec = _tiny_spec()
    params, periods = dinov3.convert_encoder(sd, spec)
    model = object.__new__(dinov3.Vit)
    model._ckpt_path = "ref"
    model._name = "tiny"
    model.spec = spec
    model.params = params
    model.periods = periods

    out_j, _taps = model.forward_recorded(
        np.asarray(x_tokens.numpy()), (DEPTH - 1,),
        grid=np.tile(np.array([[gh, gw]]), (b, 1)),
    )
    # forward_recorded's `out` is the final-norm output, matching the
    # reference's x_norm (dinov3.py:456-461).
    np.testing.assert_allclose(
        out_j[:, 0], want["cls"].numpy(), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        out_j[:, 1 + N_STORAGE :], want["patches"].numpy(), rtol=2e-4, atol=3e-5
    )
