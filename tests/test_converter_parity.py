"""Hermetic converter/engine parity vs minimal torch reimplementations.

The reference loads every family through torch model libraries (open_clip /
timm / torch.hub; reference src/saev/data/{clip,siglip,dinov2,pe}.py). This
environment has none of those, so each test builds a *minimal torch forward*
with the exact semantics of the source library for that family — the same
hermetic strategy tests/test_transforms.py uses for patchify — generates a
random state dict under the source's key names, round-trips it through
`models.convert`, and asserts the JAX engine reproduces the torch residual
stream to ~1e-5.

This pins, per family:
- clip:    open_clip VisionTransformer (fused in_proj MHA packing, quick-gelu,
           ln_pre, CLS-first token order).
- siglip:  timm no-CLS ViT (pos over patches only).
- dinov2:  timm-style hub module (CLS + register tokens inserted after the
           pos add, LayerScale ls{1,2}.gamma).
- pe:      Meta Perception Encoder (reference pe.py loads `vit_pe_*` via
           timm): learned abs pos + 2-D RoPE with theta=10000, raw integer
           patch coords, interleaved complex rotation. The torch side below
           implements the PE/timm rotation literally (view_as_complex pairs);
           parity proves convert.interleave_to_halves + vit.rope_sincos_pe
           reproduce it exactly under the engine's halves-based rotate_half.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from saev_tpu.models import convert, vit


def _ln(x, sd, key, eps):
    return F.layer_norm(x, (x.shape[-1],), sd[f"{key}.weight"], sd[f"{key}.bias"], eps)


def _linear(x, sd, key):
    return F.linear(x, sd[f"{key}.weight"], sd.get(f"{key}.bias"))


def _gelu_mlp(x, sd, prefix, act, fc1="mlp.fc1", fc2="mlp.fc2"):
    h = _linear(x, sd, f"{prefix}.{fc1}")
    if act == "quick_gelu":
        h = h * torch.sigmoid(1.702 * h)
    else:
        h = F.gelu(h, approximate="tanh" if act == "gelu_tanh" else "none")
    return _linear(h, sd, f"{prefix}.{fc2}")


def _attention(q, k, v, n_heads):
    """(B, T, D) fused-head attention, f32 softmax — mirrors both torch MHA
    and the engine's math."""
    b, t, d = q.shape
    dh = d // n_heads

    def heads(z):
        return z.reshape(b, t, n_heads, dh).permute(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    attn = (q / np.sqrt(dh)) @ k.transpose(-2, -1)
    attn = attn.softmax(dim=-1)
    o = attn @ v
    return o.permute(0, 2, 1, 3).reshape(b, t, d)


def _rand_sd(shapes: dict[str, tuple], seed: int) -> dict[str, torch.Tensor]:
    g = torch.Generator().manual_seed(seed)
    sd = {}
    for k, shape in shapes.items():
        if k.endswith((".weight", ".bias")) and len(shape) == 1:
            # LN/bias-ish params: keep near identity/zero scale.
            base = torch.ones(shape) if k.endswith("weight") else torch.zeros(shape)
            sd[k] = base + 0.05 * torch.randn(shape, generator=g)
        else:
            fan_in = int(np.prod(shape[1:])) if len(shape) > 1 else shape[0]
            sd[k] = torch.randn(shape, generator=g) / np.sqrt(max(fan_in, 1))
    return sd


def _block_shapes(prefix, d, d_mlp, *, layerscale=False):
    shapes = {
        f"{prefix}.norm1.weight": (d,),
        f"{prefix}.norm1.bias": (d,),
        f"{prefix}.attn.qkv.weight": (3 * d, d),
        f"{prefix}.attn.qkv.bias": (3 * d,),
        f"{prefix}.attn.proj.weight": (d, d),
        f"{prefix}.attn.proj.bias": (d,),
        f"{prefix}.norm2.weight": (d,),
        f"{prefix}.norm2.bias": (d,),
        f"{prefix}.mlp.fc1.weight": (d_mlp, d),
        f"{prefix}.mlp.fc1.bias": (d_mlp,),
        f"{prefix}.mlp.fc2.weight": (d, d_mlp),
        f"{prefix}.mlp.fc2.bias": (d,),
    }
    if layerscale:
        shapes[f"{prefix}.ls1.gamma"] = (d,)
        shapes[f"{prefix}.ls2.gamma"] = (d,)
    return shapes


def _timm_block(x, sd, prefix, n_heads, eps, act="gelu", rope=None, n_prefix=0):
    """timm Block forward: returns residual stream after the block."""
    h = _ln(x, sd, f"{prefix}.norm1", eps)
    qkv = _linear(h, sd, f"{prefix}.attn.qkv")
    q, k, v = qkv.chunk(3, dim=-1)
    if rope is not None:
        q = _apply_rope_interleaved(q, rope, n_heads, n_prefix)
        k = _apply_rope_interleaved(k, rope, n_heads, n_prefix)
    o = _attention(q, k, v, n_heads)
    o = _linear(o, sd, f"{prefix}.attn.proj")
    if f"{prefix}.ls1.gamma" in sd:
        o = o * sd[f"{prefix}.ls1.gamma"]
    x = x + o
    h = _gelu_mlp(_ln(x, sd, f"{prefix}.norm2", eps), sd, prefix, act)
    if f"{prefix}.ls2.gamma" in sd:
        h = h * sd[f"{prefix}.ls2.gamma"]
    return x + h


def _pe_freqs_cis(d_head: int, theta: float, gh: int, gw: int) -> torch.Tensor:
    """Meta PE Rope2D table: complex (N, d_head/2), x-angles then y-angles,
    raw integer patch coordinates, freq_m = theta^(-4m/d_head)."""
    m = torch.arange(0, d_head, 4)[: d_head // 4].float()
    freq = 1.0 / theta ** (m / d_head)
    idx = torch.arange(gh * gw)
    tx = (idx % gw).float()
    ty = torch.div(idx, gw, rounding_mode="floor").float()
    fx = torch.outer(tx, freq)
    fy = torch.outer(ty, freq)
    f = torch.cat([fx, fy], dim=-1)  # (N, d_head/2)
    return torch.polar(torch.ones_like(f), f)


def _apply_rope_interleaved(x, freqs_cis, n_heads, n_prefix):
    """PE/timm-style rotation of interleaved channel pairs via complex
    multiply; prefix tokens pass through unrotated."""
    b, t, d = x.shape
    dh = d // n_heads
    xh = x.reshape(b, t, n_heads, dh)
    prefix, patches = xh[:, :n_prefix], xh[:, n_prefix:]
    xc = torch.view_as_complex(
        patches.float().reshape(b, t - n_prefix, n_heads, dh // 2, 2)
    )
    rotated = torch.view_as_real(xc * freqs_cis[None, :, None, :]).flatten(-2)
    return torch.cat([prefix, rotated], dim=1).reshape(b, t, d)


def _run_jax(spec, params, tokens, n_layers, pos=None):
    out, taps = vit.forward(
        spec,
        convert_tree_to_jax(params),
        tokens,
        tuple(range(n_layers)),
        grid=(GH, GW),
        pos_override=pos,
    )
    return np.asarray(taps)


def convert_tree_to_jax(params):
    import jax.numpy as jnp

    def conv(x):
        return jnp.asarray(np.asarray(x))

    import jax

    return jax.tree.map(conv, params)


# Small-but-representative sizes: d_head=16 (divisible by 4 for axial rope).
B, C, P, GH, GW = 2, 3, 4, 3, 5
D, HEADS, LAYERS = 64, 4, 3
D_MLP = 128
IMG_H, IMG_W = GH * P, GW * P


def _img_and_tokens(seed):
    g = torch.Generator().manual_seed(seed)
    img = torch.randn(B, C, IMG_H, IMG_W, generator=g)
    # (B, N, c*p*p) in (c, p1, p2) channel order == transforms.patchify.
    tokens = (
        img.reshape(B, C, GH, P, GW, P)
        .permute(0, 2, 4, 1, 3, 5)
        .reshape(B, GH * GW, C * P * P)
    )
    return img, tokens.numpy()


def _patch_embed_torch(img, w, b=None):
    x = F.conv2d(img, w, b, stride=P)
    return x.flatten(2).transpose(1, 2)  # (B, N, D)


def _assert_taps_close(jax_taps, torch_taps, label):
    t = torch.stack(torch_taps, dim=1).numpy()
    assert jax_taps.shape == t.shape, (jax_taps.shape, t.shape)
    scale = np.abs(t).max()
    np.testing.assert_allclose(
        jax_taps, t, atol=2e-5 * scale, rtol=1e-4, err_msg=label
    )


def test_openclip_clip_parity():
    """open_clip VisionTransformer semantics (reference clip.py:13-113)."""
    eps = 1e-5
    shapes = {
        "conv1.weight": (D, C, P, P),
        "class_embedding": (D,),
        "positional_embedding": (1 + GH * GW, D),
        "ln_pre.weight": (D,),
        "ln_pre.bias": (D,),
        "ln_post.weight": (D,),
        "ln_post.bias": (D,),
    }
    for i in range(LAYERS):
        p = f"transformer.resblocks.{i}"
        shapes.update({
            f"{p}.ln_1.weight": (D,),
            f"{p}.ln_1.bias": (D,),
            f"{p}.attn.in_proj_weight": (3 * D, D),
            f"{p}.attn.in_proj_bias": (3 * D,),
            f"{p}.attn.out_proj.weight": (D, D),
            f"{p}.attn.out_proj.bias": (D,),
            f"{p}.ln_2.weight": (D,),
            f"{p}.ln_2.bias": (D,),
            f"{p}.mlp.c_fc.weight": (D_MLP, D),
            f"{p}.mlp.c_fc.bias": (D_MLP,),
            f"{p}.mlp.c_proj.weight": (D, D_MLP),
            f"{p}.mlp.c_proj.bias": (D,),
        })
    sd = _rand_sd(shapes, seed=0)
    img, tokens = _img_and_tokens(1)

    with torch.no_grad():
        x = _patch_embed_torch(img, sd["conv1.weight"])  # conv1 has no bias
        cls = sd["class_embedding"].expand(B, 1, D)
        x = torch.cat([cls, x], dim=1) + sd["positional_embedding"]
        x = _ln(x, sd, "ln_pre", eps)
        taps = []
        for i in range(LAYERS):
            p = f"transformer.resblocks.{i}"
            h = _ln(x, sd, f"{p}.ln_1", eps)
            qkv = F.linear(h, sd[f"{p}.attn.in_proj_weight"], sd[f"{p}.attn.in_proj_bias"])
            q, k, v = qkv.chunk(3, dim=-1)
            o = _attention(q, k, v, HEADS)
            x = x + _linear(o, sd, f"{p}.attn.out_proj")
            h = _gelu_mlp(
                _ln(x, sd, f"{p}.ln_2", eps), sd, p, "quick_gelu",
                fc1="mlp.c_fc", fc2="mlp.c_proj",
            )
            x = x + h
            taps.append(x.clone())

    spec = vit.Spec(
        d_model=D, n_layers=LAYERS, n_heads=HEADS, patch_size=P,
        mlp_ratio=D_MLP / D, act="quick_gelu", pre_norm=True, ln_eps=eps,
        pos_kind="learned",
    )
    params, pos = convert.from_openclip({k: v.numpy() for k, v in sd.items()}, spec)
    jax_taps = _run_jax(spec, params, tokens, LAYERS, pos=pos)
    _assert_taps_close(jax_taps, taps, "clip")


def test_timm_siglip_parity():
    """timm no-CLS ViT (reference siglip.py:15-89)."""
    eps = 1e-6
    shapes = {
        "patch_embed.proj.weight": (D, C, P, P),
        "patch_embed.proj.bias": (D,),
        "pos_embed": (1, GH * GW, D),
        "norm.weight": (D,),
        "norm.bias": (D,),
    }
    for i in range(LAYERS):
        shapes.update(_block_shapes(f"blocks.{i}", D, D_MLP))
    sd = _rand_sd(shapes, seed=2)
    img, tokens = _img_and_tokens(3)

    with torch.no_grad():
        x = _patch_embed_torch(img, sd["patch_embed.proj.weight"], sd["patch_embed.proj.bias"])
        x = x + sd["pos_embed"][0]
        taps = []
        for i in range(LAYERS):
            x = _timm_block(x, sd, f"blocks.{i}", HEADS, eps)
            taps.append(x.clone())

    spec = vit.Spec(
        d_model=D, n_layers=LAYERS, n_heads=HEADS, patch_size=P,
        mlp_ratio=D_MLP / D, cls_token=False, ln_eps=eps, pos_kind="learned",
    )
    params, pos = convert.from_timm({k: v.numpy() for k, v in sd.items()}, spec)
    jax_taps = _run_jax(spec, params, tokens, LAYERS, pos=pos)
    _assert_taps_close(jax_taps, taps, "siglip")


def test_timm_dinov2_parity():
    """DINOv2 hub module: CLS + registers inserted after the pos add,
    LayerScale (reference dinov2.py:14-82)."""
    eps = 1e-6
    n_reg = 4
    shapes = {
        "patch_embed.proj.weight": (D, C, P, P),
        "patch_embed.proj.bias": (D,),
        "cls_token": (1, 1, D),
        "register_tokens": (1, n_reg, D),
        "pos_embed": (1, 1 + GH * GW, D),
        "norm.weight": (D,),
        "norm.bias": (D,),
    }
    for i in range(LAYERS):
        shapes.update(_block_shapes(f"blocks.{i}", D, D_MLP, layerscale=True))
    sd = _rand_sd(shapes, seed=4)
    img, tokens = _img_and_tokens(5)

    with torch.no_grad():
        x = _patch_embed_torch(img, sd["patch_embed.proj.weight"], sd["patch_embed.proj.bias"])
        cls = sd["cls_token"].expand(B, -1, -1)
        x = torch.cat([cls, x], dim=1) + sd["pos_embed"][0]
        # DINOv2 inserts register tokens after the positional add.
        x = torch.cat(
            [x[:, :1], sd["register_tokens"].expand(B, -1, -1), x[:, 1:]], dim=1
        )
        taps = []
        for i in range(LAYERS):
            x = _timm_block(x, sd, f"blocks.{i}", HEADS, eps)
            taps.append(x.clone())

    spec = vit.Spec(
        d_model=D, n_layers=LAYERS, n_heads=HEADS, patch_size=P,
        mlp_ratio=D_MLP / D, n_registers=n_reg, layerscale=True,
        ln_eps=eps, pos_kind="learned",
    )
    params, pos = convert.from_timm({k: v.numpy() for k, v in sd.items()}, spec)
    # Families._arrange_pos semantics: zero positional rows for registers.
    pos_full = np.concatenate(
        [pos[:1], np.zeros((n_reg, D), np.float32), pos[1:]], axis=0
    )
    jax_taps = _run_jax(spec, params, tokens, LAYERS, pos=pos_full)
    _assert_taps_close(jax_taps, taps, "dinov2")


@pytest.mark.parametrize("use_cls", [True, False])
def test_pe_rope_parity(use_cls):
    """Perception Encoder: learned abs pos + 2-D RoPE (theta=1e4, raw integer
    coords, interleaved complex rotation), ln_pre, LayerScale (reference
    pe.py:24-170 via timm; rotation semantics from Meta's Rope2D)."""
    eps = 1e-5
    n_tok = int(use_cls) + GH * GW
    shapes = {
        "patch_embed.proj.weight": (D, C, P, P),
        "patch_embed.proj.bias": (D,),
        "pos_embed": (1, n_tok, D),
        "norm_pre.weight": (D,),
        "norm_pre.bias": (D,),
        "norm.weight": (D,),
        "norm.bias": (D,),
    }
    if use_cls:
        shapes["cls_token"] = (1, 1, D)
    for i in range(LAYERS):
        shapes.update(_block_shapes(f"blocks.{i}", D, D_MLP, layerscale=True))
    sd = _rand_sd(shapes, seed=6)
    img, tokens = _img_and_tokens(7)

    dh = D // HEADS
    freqs = _pe_freqs_cis(dh, 10000.0, GH, GW)

    with torch.no_grad():
        x = _patch_embed_torch(img, sd["patch_embed.proj.weight"], sd["patch_embed.proj.bias"])
        if use_cls:
            x = torch.cat([sd["cls_token"].expand(B, -1, -1), x], dim=1)
        x = x + sd["pos_embed"][0]
        x = _ln(x, sd, "norm_pre", eps)
        taps = []
        for i in range(LAYERS):
            x = _timm_block(
                x, sd, f"blocks.{i}", HEADS, eps,
                rope=freqs, n_prefix=int(use_cls),
            )
            taps.append(x.clone())

    spec = vit.Spec(
        d_model=D, n_layers=LAYERS, n_heads=HEADS, patch_size=P,
        mlp_ratio=D_MLP / D, cls_token=use_cls, layerscale=True,
        pre_norm=True, ln_eps=eps,
        pos_kind="rope", rope_style="pe", rope_base=10000.0, rope_abs_pos=True,
    )
    params, pos = convert.from_timm({k: v.numpy() for k, v in sd.items()}, spec)
    jax_taps = _run_jax(spec, params, tokens, LAYERS, pos=pos)
    _assert_taps_close(jax_taps, taps, "pe")


def test_interleave_to_halves_is_permutation():
    perm = convert.interleave_to_halves(16)
    assert sorted(perm.tolist()) == list(range(16))
    # Engine pair (m, m+8) must hold source pair (2m, 2m+1).
    for m in range(8):
        assert perm[m] == 2 * m and perm[m + 8] == 2 * m + 1
