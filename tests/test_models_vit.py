"""Parity tests for the generic ViT engine and weight converters: tiny random
torch models in each source naming scheme must produce (near-)identical outputs
through our JAX forward."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from saev_tpu.data import models as base
from saev_tpu.data import transforms
from saev_tpu.models import convert, families, vit

RTOL, ATOL = 2e-4, 2e-5


def _img_batch(b, c, h, w, seed=0):
    return np.random.default_rng(seed).normal(size=(b, c, h, w)).astype(np.float32)


def _patchify_batch(x_bchw, p):
    toks = [transforms.patchify(x, p)[0] for x in x_bchw]
    return np.stack(toks)


# ---------------------------------------------------------------------------
# OpenCLIP-style reference model (ln_pre + MultiheadAttention + QuickGELU)
# ---------------------------------------------------------------------------


class _QuickGELU(torch.nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class _TorchCLIP(torch.nn.Module):
    def __init__(self, d, n_layers, n_heads, p, n_patches):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, d, kernel_size=p, stride=p, bias=False)
        self.class_embedding = torch.nn.Parameter(torch.randn(d) * 0.02)
        self.positional_embedding = torch.nn.Parameter(
            torch.randn(n_patches + 1, d) * 0.02
        )
        self.ln_pre = torch.nn.LayerNorm(d, eps=1e-5)
        self.ln_post = torch.nn.LayerNorm(d, eps=1e-5)
        blocks = []
        for _ in range(n_layers):
            blk = torch.nn.Module()
            blk.ln_1 = torch.nn.LayerNorm(d, eps=1e-5)
            blk.attn = torch.nn.MultiheadAttention(d, n_heads, batch_first=True)
            blk.ln_2 = torch.nn.LayerNorm(d, eps=1e-5)
            blk.mlp = torch.nn.Sequential()
            blk.mlp.add_module("c_fc", torch.nn.Linear(d, 4 * d))
            blk.mlp.add_module("gelu", _QuickGELU())
            blk.mlp.add_module("c_proj", torch.nn.Linear(4 * d, d))
            blocks.append(blk)
        self.resblocks = torch.nn.ModuleList(blocks)

    def forward(self, x_bchw, tap_layers):
        x = self.conv1(x_bchw)  # (b, d, hp, wp)
        b, d, hp, wp = x.shape
        x = x.reshape(b, d, hp * wp).permute(0, 2, 1)
        cls = self.class_embedding.expand(b, 1, -1)
        x = torch.cat([cls, x], dim=1) + self.positional_embedding
        x = self.ln_pre(x)
        taps = []
        for i, blk in enumerate(self.resblocks):
            h = blk.ln_1(x)
            attn_out, _ = blk.attn(h, h, h, need_weights=False)
            x = x + attn_out
            x = x + blk.mlp(blk.ln_2(x))
            if i in tap_layers:
                taps.append(x)
        return self.ln_post(x), torch.stack(taps, dim=1)

    def openclip_state_dict(self):
        sd = {}
        sd["conv1.weight"] = self.conv1.weight.detach().numpy()
        sd["class_embedding"] = self.class_embedding.detach().numpy()
        sd["positional_embedding"] = self.positional_embedding.detach().numpy()
        for ln, name in ((self.ln_pre, "ln_pre"), (self.ln_post, "ln_post")):
            sd[f"{name}.weight"] = ln.weight.detach().numpy()
            sd[f"{name}.bias"] = ln.bias.detach().numpy()
        for i, blk in enumerate(self.resblocks):
            pre = f"transformer.resblocks.{i}"
            for ln, name in ((blk.ln_1, "ln_1"), (blk.ln_2, "ln_2")):
                sd[f"{pre}.{name}.weight"] = ln.weight.detach().numpy()
                sd[f"{pre}.{name}.bias"] = ln.bias.detach().numpy()
            sd[f"{pre}.attn.in_proj_weight"] = blk.attn.in_proj_weight.detach().numpy()
            sd[f"{pre}.attn.in_proj_bias"] = blk.attn.in_proj_bias.detach().numpy()
            sd[f"{pre}.attn.out_proj.weight"] = blk.attn.out_proj.weight.detach().numpy()
            sd[f"{pre}.attn.out_proj.bias"] = blk.attn.out_proj.bias.detach().numpy()
            sd[f"{pre}.mlp.c_fc.weight"] = blk.mlp.c_fc.weight.detach().numpy()
            sd[f"{pre}.mlp.c_fc.bias"] = blk.mlp.c_fc.bias.detach().numpy()
            sd[f"{pre}.mlp.c_proj.weight"] = blk.mlp.c_proj.weight.detach().numpy()
            sd[f"{pre}.mlp.c_proj.bias"] = blk.mlp.c_proj.bias.detach().numpy()
        return sd


def test_openclip_converter_parity():
    torch.manual_seed(0)
    d, n_layers, n_heads, p, img = 32, 3, 4, 4, 16
    n_patches = (img // p) ** 2
    ref = _TorchCLIP(d, n_layers, n_heads, p, n_patches).eval()

    spec = vit.Spec(
        d_model=d, n_layers=n_layers, n_heads=n_heads, patch_size=p,
        act="quick_gelu", pre_norm=True, ln_eps=1e-5, pos_kind="learned",
    )
    params, pos = convert.from_openclip(ref.openclip_state_dict(), spec)
    params["pos"] = pos

    x = _img_batch(2, 3, img, img)
    with torch.no_grad():
        out_t, taps_t = ref(torch.from_numpy(x), tap_layers=(0, 2))

    tokens = _patchify_batch(x, p)
    g = img // p
    out_j, taps_j = vit.run(spec, params, tokens, (0, 2), (g, g))

    np.testing.assert_allclose(taps_j, taps_t.numpy(), rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(out_j, out_t.numpy(), rtol=RTOL, atol=ATOL)


# ---------------------------------------------------------------------------
# timm/DINOv2-style reference block (qkv Linear + LayerScale + registers)
# ---------------------------------------------------------------------------


class _TorchTimm(torch.nn.Module):
    def __init__(self, d, n_layers, n_heads, p, n_patches, *, n_reg=0, cls=True):
        super().__init__()
        self.n_heads = n_heads
        self.cls = cls
        self.n_reg = n_reg
        self.patch_proj = torch.nn.Conv2d(3, d, kernel_size=p, stride=p)
        if cls:
            self.cls_token = torch.nn.Parameter(torch.randn(1, 1, d) * 0.02)
        if n_reg:
            self.register_tokens = torch.nn.Parameter(torch.randn(1, n_reg, d) * 0.02)
        self.pos_embed = torch.nn.Parameter(
            torch.randn(1, n_patches + int(cls), d) * 0.02
        )
        self.norm = torch.nn.LayerNorm(d, eps=1e-6)
        blocks = []
        for _ in range(n_layers):
            blk = torch.nn.Module()
            blk.norm1 = torch.nn.LayerNorm(d, eps=1e-6)
            blk.qkv = torch.nn.Linear(d, 3 * d)
            blk.proj = torch.nn.Linear(d, d)
            blk.ls1 = torch.nn.Parameter(torch.full((d,), 1e-2))
            blk.norm2 = torch.nn.LayerNorm(d, eps=1e-6)
            blk.fc1 = torch.nn.Linear(d, 4 * d)
            blk.fc2 = torch.nn.Linear(4 * d, d)
            blk.ls2 = torch.nn.Parameter(torch.full((d,), 1e-2))
            blocks.append(blk)
        self.blocks = torch.nn.ModuleList(blocks)

    def forward(self, x_bchw, tap_layers):
        x = self.patch_proj(x_bchw)
        b, d, hp, wp = x.shape
        x = x.reshape(b, d, hp * wp).permute(0, 2, 1)
        if self.cls:
            x = torch.cat([self.cls_token.expand(b, -1, -1), x], dim=1)
        x = x + self.pos_embed
        if self.n_reg:
            # DINOv2 inserts registers AFTER the positional add.
            x = torch.cat(
                [x[:, :1], self.register_tokens.expand(b, -1, -1), x[:, 1:]], dim=1
            )
        taps = []
        for i, blk in enumerate(self.blocks):
            h = blk.norm1(x)
            qkv = blk.qkv(h)
            q, k, v = qkv.chunk(3, dim=-1)
            t = x.shape[1]
            hd = d // self.n_heads

            def heads(z):
                return z.reshape(b, t, self.n_heads, hd).transpose(1, 2)

            attn = torch.nn.functional.scaled_dot_product_attention(
                heads(q), heads(k), heads(v)
            )
            attn = attn.transpose(1, 2).reshape(b, t, d)
            x = x + blk.ls1 * blk.proj(attn)
            h = blk.fc2(torch.nn.functional.gelu(blk.fc1(blk.norm2(x))))
            x = x + blk.ls2 * h
            if i in tap_layers:
                taps.append(x)
        return self.norm(x), torch.stack(taps, dim=1)

    def timm_state_dict(self):
        sd = {
            "patch_embed.proj.weight": self.patch_proj.weight.detach().numpy(),
            "patch_embed.proj.bias": self.patch_proj.bias.detach().numpy(),
            "pos_embed": self.pos_embed.detach().numpy(),
            "norm.weight": self.norm.weight.detach().numpy(),
            "norm.bias": self.norm.bias.detach().numpy(),
        }
        if self.cls:
            sd["cls_token"] = self.cls_token.detach().numpy()
        if self.n_reg:
            sd["register_tokens"] = self.register_tokens.detach().numpy()
        for i, blk in enumerate(self.blocks):
            pre = f"blocks.{i}"
            for mod, name in (
                (blk.norm1, "norm1"), (blk.norm2, "norm2"),
                (blk.qkv, "attn.qkv"), (blk.proj, "attn.proj"),
                (blk.fc1, "mlp.fc1"), (blk.fc2, "mlp.fc2"),
            ):
                sd[f"{pre}.{name}.weight"] = mod.weight.detach().numpy()
                sd[f"{pre}.{name}.bias"] = mod.bias.detach().numpy()
            sd[f"{pre}.ls1.gamma"] = blk.ls1.detach().numpy()
            sd[f"{pre}.ls2.gamma"] = blk.ls2.detach().numpy()
        return sd


@pytest.mark.parametrize("n_reg,cls", [(0, True), (4, True), (0, False)])
def test_timm_converter_parity(n_reg, cls):
    torch.manual_seed(1)
    d, n_layers, n_heads, p, img = 32, 2, 4, 4, 16
    n_patches = (img // p) ** 2
    ref = _TorchTimm(d, n_layers, n_heads, p, n_patches, n_reg=n_reg, cls=cls).eval()

    spec = vit.Spec(
        d_model=d, n_layers=n_layers, n_heads=n_heads, patch_size=p,
        layerscale=True, cls_token=cls, n_registers=n_reg, ln_eps=1e-6,
        pos_kind="learned",
    )
    params, pos = convert.from_timm(ref.timm_state_dict(), spec)
    # Registers get zero positional entries (inserted after the pos add).
    if n_reg:
        pos = np.concatenate(
            [pos[:1], np.zeros((n_reg, d), pos.dtype), pos[1:]], axis=0
        )
    params["pos"] = pos

    x = _img_batch(2, 3, img, img, seed=1)
    with torch.no_grad():
        out_t, taps_t = ref(torch.from_numpy(x), tap_layers=(1,))

    tokens = _patchify_batch(x, p)
    g = img // p
    out_j, taps_j = vit.run(spec, params, tokens, (1,), (g, g))

    np.testing.assert_allclose(taps_j, taps_t.numpy(), rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(out_j, out_t.numpy(), rtol=RTOL, atol=ATOL)


# ---------------------------------------------------------------------------
# Family wrappers + Recorder integration
# ---------------------------------------------------------------------------


def test_dinov2_family_registered_and_token_selection():
    import jax

    arch = "dinov2_vits14"
    preset = families.DINOV2_PRESETS[arch]
    n_pos = 1 + 4 + preset.grid[0] * preset.grid[1]
    # Tiny-ified spec for speed: shrink layers via dataclasses.replace.
    import dataclasses

    spec = dataclasses.replace(preset.spec, n_layers=2, n_registers=4)
    params = vit.init(spec, jax.random.key(0), n_pos=n_pos)

    model = object.__new__(families.Dinov2)
    model._ckpt = arch + "_reg"
    model.arch = arch
    model.preset = dataclasses.replace(preset, spec=spec)
    model.spec = spec
    model.params = params

    n_content = preset.grid[0] * preset.grid[1]
    token_i = model.get_token_i(n_content)
    assert token_i[0] == 0 and token_i[1] == 5  # skips 4 registers

    rec = base.Recorder(model, n_content, cls_token=True, layers=[0, 1])
    x = _img_batch(2, 3, 224, 224)
    tokens = _patchify_batch(x, 14)
    out, acts = rec(tokens)
    assert acts.shape == (2, 2, n_content + 1, spec.d_model)


def test_missing_weights_error_message(tmp_path, monkeypatch):
    monkeypatch.setenv("SAEV_CACHE", str(tmp_path))
    with pytest.raises(FileNotFoundError, match="cannot download"):
        families.Clip("ViT-B-16/openai")


def test_family_registry_has_all_families():
    from saev_tpu.data import models

    fams = set(models.list_families())
    assert {"clip", "siglip", "dinov2", "pe-core", "pe-spatial", "fake-clip"} <= fams


def test_load_weights_from_explicit_path(tmp_path):
    torch.manual_seed(2)
    d, n_layers, n_heads, p, img = 32, 2, 4, 4, 16
    n_patches = (img // p) ** 2
    ref = _TorchTimm(d, n_layers, n_heads, p, n_patches, cls=False)
    fpath = tmp_path / "tiny_siglip.pt"
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in ref.timm_state_dict().items()}, fpath)

    import dataclasses

    tiny = families.Preset(
        spec=vit.Spec(d_model=d, n_layers=n_layers, n_heads=n_heads, patch_size=p,
                      cls_token=False, layerscale=True, ln_eps=1e-6),
        img_size=img, resize_size=img,
        mean=families.SIGLIP_MEAN, std=families.SIGLIP_STD,
    )
    old = families.Siglip.presets
    families.Siglip.presets = {**old, "tiny": tiny}
    try:
        model = families.Siglip(f"tiny={fpath}")
        x = _img_batch(1, 3, img, img)
        out, taps = model.forward_recorded(_patchify_batch(x, p), (0,))
        assert taps.shape == (1, 1, n_patches, d)
    finally:
        families.Siglip.presets = old
