"""Generic ViT engine: one configurable forward covering every family in the zoo.

TPU-first design notes:
- The patch embedding is patchify + ONE matmul (`transforms.patchify` host-side or
  `embed_pixels` on-device), never a conv — stride==kernel convs are exactly a
  reshaped matmul and this form always tiles onto the MXU
  (reference src/saev/data/transforms.py:106-132 proves the equivalence in torch).
- Activations tap the residual stream *after* each requested block from a single
  forward — the functional analog of the reference's forward hooks
  (reference shards.py:239-301).
- All matmuls run in a configurable precision; extraction defaults to bfloat16
  inputs with f32 accumulation (`preferred_element_type`), the documented-fast
  path on v5e. The SAE consumes f32 activations either way.
- Static shapes per (batch, grid) combination; jit cache keyed on the tap tuple.

Families map onto `Spec` as:
    CLIP/OpenCLIP ViT  pre-LN, learned pos, CLS, GELU MLP, pre-proj LN
    SigLIP (timm)      pre-LN, learned pos, no CLS, GELU MLP, attn-pool head (unused)
    DINOv2             pre-LN, learned pos (interp), CLS + registers, LayerScale
    DINOv3             pre-LN, axial RoPE, CLS + storage tokens, LayerScale,
                       SwiGLU or GELU, masked K bias (LinearKMaskedBias)
    PE core/spatial    pre-LN, learned pos, CLS, GELU
    Bird-MAE           pre-LN, 2-D sincos pos, CLS, LayerScale, GELU (audio input)
"""

import dataclasses
import functools
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class Spec:
    """Architecture description; every family is an instance of this."""

    d_model: int
    n_layers: int
    n_heads: int
    patch_size: int
    mlp_ratio: float = 4.0
    mlp_kind: tp.Literal["gelu", "swiglu"] = "gelu"
    act: tp.Literal["gelu", "gelu_tanh", "quick_gelu"] = "gelu"
    """MLP nonlinearity: exact erf GELU (timm/dinov2), tanh-approx, or
    QuickGELU x*sigmoid(1.702x) (OpenAI CLIP checkpoints)."""
    pre_norm: bool = False
    """LayerNorm before the first block (OpenCLIP ViT ln_pre)."""
    pos_kind: tp.Literal["learned", "sincos2d", "rope", "none"] = "learned"
    cls_token: bool = True
    n_registers: int = 0
    """DINOv2 register / DINOv3 storage tokens, placed after CLS."""
    layerscale: bool = False
    ln_eps: float = 1e-6
    in_chans: int = 3
    final_norm: bool = True
    qk_norm: bool = False
    """Per-head LayerNorm on q and k (some PE variants)."""
    mask_k_bias: bool = False
    """DINOv3 LinearKMaskedBias: the K projection carries a zeroed-out bias."""
    tap_point: tp.Literal["block", "norm2"] = "block"
    """Where the residual tap records: after the full block (most families), or
    the norm2 output mid-block (Bird-MAE hooks block.norm2; reference
    bird_mae.py:608)."""
    rope_base: float = 100.0
    """DINOv3 RoPE period base."""
    rope_min_period: float | None = None
    rope_max_period: float | None = None
    rope_normalize_coords: tp.Literal["min", "max", "separate"] = "separate"
    rope_style: tp.Literal["dinov3", "pe"] = "dinov3"
    """Angle-table construction. "dinov3": patch-center coords normalized to
    [-1, 1], angle = coord·2π/period, h-angles then w-angles (reference
    dinov3.py:178-215). "pe": Meta Perception Encoder Rope2D — raw integer
    patch coords (t_x = idx % W, t_y = idx // W), freq = base^(-4m/d_head),
    x-angles then y-angles. The PE source rotates interleaved channel pairs
    (2m, 2m+1) via complex multiply; this engine always rotates halves pairs
    (m, m+d/2), so PE converters permute q/k head channels
    (convert.interleave_to_halves) to make the two exactly equal."""
    rope_abs_pos: bool = False
    """PE uses a learned absolute positional table *and* RoPE; when set (with
    pos_kind="rope"), params["pos"] is added exactly like pos_kind="learned"."""
    rope_dtype: tp.Any = jnp.float32

    @property
    def d_head(self) -> int:
        assert self.d_model % self.n_heads == 0
        return self.d_model // self.n_heads

    @property
    def d_mlp(self) -> int:
        return int(self.d_model * self.mlp_ratio)

    @property
    def n_prefix_tokens(self) -> int:
        return int(self.cls_token) + self.n_registers


# ---------------------------------------------------------------------------
# Parameter initialization (for tests / fake weights; real weights come from
# family converters)
# ---------------------------------------------------------------------------


def init(spec: Spec, key: Array, *, n_pos: int | None = None) -> dict:
    """Random small-scale init with the exact pytree layout converters target."""
    keys = iter(jax.random.split(key, 8 + 8 * spec.n_layers))
    d = spec.d_model

    def dense(k, d_in, d_out):
        scale = 1.0 / np.sqrt(d_in)
        return {
            "w": jax.random.normal(k, (d_in, d_out), jnp.float32) * scale,
            "b": jnp.zeros((d_out,), jnp.float32),
        }

    def lnp():
        return {"g": jnp.ones((d,), jnp.float32), "b": jnp.zeros((d,), jnp.float32)}

    params: dict = {
        "patch_embed": dense(
            next(keys), spec.in_chans * spec.patch_size**2, d
        ),
    }
    if spec.cls_token:
        params["cls"] = jax.random.normal(next(keys), (d,), jnp.float32) * 0.02
    if spec.n_registers:
        params["reg"] = (
            jax.random.normal(next(keys), (spec.n_registers, d), jnp.float32) * 0.02
        )
    if spec.pos_kind == "learned" or (spec.pos_kind == "rope" and spec.rope_abs_pos):
        assert n_pos is not None, "learned pos embeddings need n_pos"
        params["pos"] = jax.random.normal(next(keys), (n_pos, d), jnp.float32) * 0.02

    if spec.pre_norm:
        params["ln_pre"] = lnp()

    blocks = []
    for _ in range(spec.n_layers):
        blk: dict = {
            "ln1": lnp(),
            "attn": {
                "qkv": dense(next(keys), d, 3 * d),
                "proj": dense(next(keys), d, d),
            },
            "ln2": lnp(),
        }
        if spec.qk_norm:
            blk["attn"]["q_norm"] = {
                "g": jnp.ones((spec.d_head,)),
                "b": jnp.zeros((spec.d_head,)),
            }
            blk["attn"]["k_norm"] = {
                "g": jnp.ones((spec.d_head,)),
                "b": jnp.zeros((spec.d_head,)),
            }
        if spec.mlp_kind == "swiglu":
            blk["mlp"] = {
                "w12": dense(next(keys), d, 2 * spec.d_mlp),
                "w3": dense(next(keys), spec.d_mlp, d),
            }
        else:
            blk["mlp"] = {
                "fc1": dense(next(keys), d, spec.d_mlp),
                "fc2": dense(next(keys), spec.d_mlp, d),
            }
        if spec.layerscale:
            blk["ls1"] = jnp.full((d,), 1e-5, jnp.float32)
            blk["ls2"] = jnp.full((d,), 1e-5, jnp.float32)
        blocks.append(blk)
    params["blocks"] = blocks
    if spec.final_norm:
        params["ln_f"] = lnp()
    return params


# ---------------------------------------------------------------------------
# Positional embeddings
# ---------------------------------------------------------------------------


def sincos_2d(d_model: int, grid_h: int, grid_w: int) -> np.ndarray:
    """Fixed 2-D sine-cosine positional embeddings, (grid_h*grid_w, d_model)
    (reference bird_mae.py:89-130 semantics: half the dims encode h, half w)."""
    assert d_model % 4 == 0
    d_half = d_model // 2

    def one_axis(positions: np.ndarray) -> np.ndarray:
        omega = np.arange(d_half // 2, dtype=np.float64) / (d_half / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("p,f->pf", positions.astype(np.float64), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    gh = np.arange(grid_h, dtype=np.float64)
    gw = np.arange(grid_w, dtype=np.float64)
    # Row-major grid: token (i, j) at index i*grid_w + j.
    emb_h = np.repeat(one_axis(gh), grid_w, axis=0)
    emb_w = np.tile(one_axis(gw), (grid_h, 1))
    return np.concatenate([emb_w, emb_h], axis=1).astype(np.float32)


def rope_periods(spec: Spec) -> np.ndarray:
    """The D_head/4 RoPE periods: log-spaced in [min_period, max_period], or
    base**(4k/d_head) (reference dinov3.py:166-176)."""
    d_head = spec.d_head
    assert d_head % 4 == 0
    n_per = d_head // 4
    if spec.rope_min_period is not None and spec.rope_max_period is not None:
        exps = np.linspace(0.0, 1.0, n_per, dtype=np.float64)
        return spec.rope_min_period * (
            (spec.rope_max_period / spec.rope_min_period) ** exps
        )
    return spec.rope_base ** (
        2.0 * np.arange(n_per, dtype=np.float64) / (d_head // 2)
    )


def rope_sincos_from_periods(
    periods: np.ndarray,
    grid_h: int,
    grid_w: int,
    normalize_coords: str = "separate",
) -> tuple[np.ndarray, np.ndarray]:
    """Axial RoPE sin/cos tables for a (grid_h, grid_w) patch grid.

    DINOv3-style (reference dinov3.py:178-215): patch-center coordinates
    normalized to [-1, 1]; per position the angle vector is
    [h·2π/periods, w·2π/periods] tiled twice across the head dim, pairing with
    the halves-based rotate_half. Returns (sin, cos), each (grid_h*grid_w, d_head).
    """
    if normalize_coords == "max":
        norm_h = norm_w = max(grid_h, grid_w)
    elif normalize_coords == "min":
        norm_h = norm_w = min(grid_h, grid_w)
    else:
        norm_h, norm_w = grid_h, grid_w
    ch = (np.arange(grid_h, dtype=np.float64) + 0.5) / norm_h * 2.0 - 1.0
    cw = (np.arange(grid_w, dtype=np.float64) + 0.5) / norm_w * 2.0 - 1.0

    hh = np.repeat(ch, grid_w)
    ww = np.tile(cw, grid_h)
    ang_h = hh[:, None] * (2.0 * np.pi / periods)[None, :]
    ang_w = ww[:, None] * (2.0 * np.pi / periods)[None, :]
    angles = np.concatenate([ang_h, ang_w], axis=1)  # (N, d_head/2)
    angles = np.tile(angles, (1, 2))  # (N, d_head)
    return np.sin(angles).astype(np.float32), np.cos(angles).astype(np.float32)


def rope_sincos_pe(
    d_head: int, base: float, grid_h: int, grid_w: int
) -> tuple[np.ndarray, np.ndarray]:
    """Meta Perception Encoder Rope2D angle tables (halves layout).

    Per the PE source (perception_models rope.py, mirrored by timm's port):
    freq_m = base^(-4m/d_head) for m < d_head/4; token at flat index i has
    integer coords t_x = i % W, t_y = i // W; the angle vector is
    [t_x·freq..., t_y·freq...]. The source applies these to interleaved
    channel pairs; here they are laid out for halves-based rotate_half, which
    matches exactly once q/k channels are permuted by
    `convert.interleave_to_halves`.
    """
    assert d_head % 4 == 0
    n_per = d_head // 4
    freq = 1.0 / base ** (
        4.0 * np.arange(n_per, dtype=np.float64) / d_head
    )
    idx = np.arange(grid_h * grid_w)
    tx = (idx % grid_w).astype(np.float64)
    ty = (idx // grid_w).astype(np.float64)
    ang_x = tx[:, None] * freq[None, :]
    ang_y = ty[:, None] * freq[None, :]
    angles = np.concatenate([ang_x, ang_y], axis=1)  # (N, d_head/2)
    angles = np.tile(angles, (1, 2))  # (N, d_head)
    return np.sin(angles).astype(np.float32), np.cos(angles).astype(np.float32)


def rope_angles(spec: Spec, grid_h: int, grid_w: int) -> tuple[np.ndarray, np.ndarray]:
    """Spec-derived RoPE tables (see rope_sincos_from_periods / rope_sincos_pe)."""
    if spec.rope_style == "pe":
        return rope_sincos_pe(spec.d_head, spec.rope_base, grid_h, grid_w)
    return rope_sincos_from_periods(
        rope_periods(spec), grid_h, grid_w, spec.rope_normalize_coords
    )


def _rotate_half(x: Array) -> Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(
    x: Array, sin: Array, cos: Array, n_prefix: int
) -> Array:
    """Apply RoPE to patch tokens only; prefix (CLS/storage) tokens untouched.

    x: (B, H, N, d_head); sin/cos: (N_patches, d_head) shared across the batch, or
    (B, N_patches, d_head) per-example (DINOv3 variable aspect grids).
    """
    if sin.ndim == 3:
        sin = sin[:, None, :, :]
        cos = cos[:, None, :, :]
    prefix, patches = x[:, :, :n_prefix, :], x[:, :, n_prefix:, :]
    rotated = patches * cos + _rotate_half(patches) * sin
    return jnp.concatenate([prefix, rotated.astype(x.dtype)], axis=2)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _layer_norm(x: Array, p: dict, eps: float) -> Array:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


def embed_tokens(spec: Spec, params: dict, tokens: Array) -> Array:
    """Patch tokens (B, N, c*p*p) -> embedded sequence with CLS/registers.

    Input is pre-patchified (host-side `transforms.patchify`), so the embedding is
    one MXU matmul.
    """
    b = tokens.shape[0]
    pe = params["patch_embed"]
    x = (
        jnp.dot(tokens, pe["w"], preferred_element_type=jnp.float32) + pe["b"]
    )
    prefix = []
    if spec.cls_token:
        prefix.append(jnp.broadcast_to(params["cls"], (b, 1, spec.d_model)))
    if spec.n_registers:
        prefix.append(
            jnp.broadcast_to(params["reg"], (b, spec.n_registers, spec.d_model))
        )
    if prefix:
        x = jnp.concatenate(prefix + [x], axis=1)
    return x



def _apply_block(spec: Spec, blk: dict, x: Array, sin, cos, compute_dtype):
    """One transformer block; returns (x_out, sites) where sites maps every
    internal tap point (norm1/attn_out/norm2/mlp_out) to its activation.
    Callers that use only one site pay nothing for the rest — dead values are
    pruned during XLA compilation."""
    b, t, d = x.shape
    n_prefix = spec.n_prefix_tokens
    scale = 1.0 / np.sqrt(spec.d_head)

    h = _layer_norm(x, blk["ln1"], spec.ln_eps)
    h_norm1 = h
    qkv = (
        jnp.dot(h, blk["attn"]["qkv"]["w"], preferred_element_type=jnp.float32)
        + blk["attn"]["qkv"]["b"]
    )
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(z):
        return z.reshape(b, t, spec.n_heads, spec.d_head).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    if spec.qk_norm:
        q = _layer_norm(q, blk["attn"]["q_norm"], spec.ln_eps)
        k = _layer_norm(k, blk["attn"]["k_norm"], spec.ln_eps)
    if sin is not None:
        q = apply_rope(q, sin, cos, n_prefix)
        k = apply_rope(k, sin, cos, n_prefix)

    attn = jnp.einsum(
        "bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32
    )
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", attn, v, preferred_element_type=jnp.float32)
    o = o.astype(compute_dtype).transpose(0, 2, 1, 3).reshape(b, t, d)
    o = (
        jnp.dot(o, blk["attn"]["proj"]["w"], preferred_element_type=jnp.float32)
        + blk["attn"]["proj"]["b"]
    )
    if spec.layerscale:
        o = o * blk["ls1"]
    attn_out = o
    x = x + o.astype(compute_dtype)

    h = _layer_norm(x, blk["ln2"], spec.ln_eps)
    h_norm2 = h
    if spec.mlp_kind == "swiglu":
        h12 = (
            jnp.dot(h, blk["mlp"]["w12"]["w"], preferred_element_type=jnp.float32)
            + blk["mlp"]["w12"]["b"]
        )
        h1, h2 = jnp.split(h12, 2, axis=-1)
        h = jax.nn.silu(h1) * h2
        h = (
            jnp.dot(h, blk["mlp"]["w3"]["w"], preferred_element_type=jnp.float32)
            + blk["mlp"]["w3"]["b"]
        )
    else:
        h = (
            jnp.dot(h, blk["mlp"]["fc1"]["w"], preferred_element_type=jnp.float32)
            + blk["mlp"]["fc1"]["b"]
        )
        if spec.act == "quick_gelu":
            h = h * jax.nn.sigmoid(1.702 * h)
        else:
            h = jax.nn.gelu(h, approximate=spec.act == "gelu_tanh")
        h = (
            jnp.dot(h, blk["mlp"]["fc2"]["w"], preferred_element_type=jnp.float32)
            + blk["mlp"]["fc2"]["b"]
        )
    if spec.layerscale:
        h = h * blk["ls2"]
    x = x + h.astype(compute_dtype)
    sites = {
        "norm1": h_norm1,
        "attn_out": attn_out,
        "norm2": h_norm2,
        "mlp_out": h,
    }
    return x, sites


def _embed_with_pos(
    spec: Spec,
    params: dict,
    tokens: Array,
    grid: tuple[int, int],
    *,
    pos_override: Array | None = None,
    rope_sincos: tuple[Array, Array] | None = None,
    compute_dtype: tp.Any = jnp.float32,
) -> tuple[Array, Array | None, Array | None]:
    """Shared forward preamble: patch embedding + positional encoding + rope
    tables + pre-norm. Returns (x in compute_dtype, sin, cos); used by both
    `forward` (residual taps) and `forward_sites` (full microscope) so the
    two entry points cannot drift."""
    x = embed_tokens(spec, params, tokens)
    _, t, d = x.shape
    n_prefix = spec.n_prefix_tokens
    gh, gw = grid

    if spec.pos_kind == "learned" or (spec.pos_kind == "rope" and spec.rope_abs_pos):
        pos = pos_override if pos_override is not None else params["pos"]
        assert pos.shape[0] == t, (
            f"pos table has {pos.shape[0]} entries for {t} tokens; interpolate "
            "with `interpolate_pos` before calling forward"
        )
        x = x + pos
    elif spec.pos_kind == "sincos2d":
        pos = jnp.asarray(sincos_2d(d, gh, gw))
        if n_prefix:
            pos = jnp.concatenate([jnp.zeros((n_prefix, d), pos.dtype), pos], axis=0)
        x = x + pos

    sin = cos = None
    if spec.pos_kind == "rope":
        if rope_sincos is not None:
            # Host-computed tables (per-example grids / loaded periods buffer).
            sin, cos = rope_sincos
        else:
            sin_np, cos_np = rope_angles(spec, gh, gw)
            sin, cos = jnp.asarray(sin_np), jnp.asarray(cos_np)

    if spec.pre_norm:
        x = _layer_norm(x, params["ln_pre"], spec.ln_eps)

    return x.astype(compute_dtype), sin, cos


def forward(
    spec: Spec,
    params: dict,
    tokens: Array,
    layers: tuple[int, ...],
    *,
    grid: tuple[int, int],
    pos_override: Array | None = None,
    rope_sincos: tuple[Array, Array] | None = None,
    compute_dtype: tp.Any = jnp.float32,
) -> tuple[Array, Array]:
    """Run the ViT, tapping the residual stream after each layer in `layers`.

    Args:
        tokens: (B, N_patches, c*p*p) pre-patchified pixels.
        layers: block indices to record (negative indices allowed).
        grid: (grid_h, grid_w) patch grid — static per trace.
        pos_override: optional (n_tokens, d_model) positional table overriding the
            spec's default (used for learned-pos interpolation).

    Returns:
        (x_final, taps) — x_final (B, T, D) after final norm; taps
        (B, len(layers), T, D) raw residual stream (pre-final-norm), CLS first.
    """
    layers = tuple(i % spec.n_layers for i in layers)
    x, sin, cos = _embed_with_pos(
        spec, params, tokens, grid,
        pos_override=pos_override, rope_sincos=rope_sincos,
        compute_dtype=compute_dtype,
    )
    taps = []

    for i, blk in enumerate(params["blocks"]):
        x, sites = _apply_block(spec, blk, x, sin, cos, compute_dtype)
        if i in layers:
            tap = sites["norm2"] if spec.tap_point == "norm2" else x
            taps.append(tap.astype(jnp.float32))

    assert len(taps) == len(set(layers)), (
        f"Requested layers {layers} out of range for n_layers={spec.n_layers}"
    )
    # Taps were appended in block order; reorder to match the requested order.
    taps_arr = jnp.stack(taps, axis=1)
    block_order = sorted(set(layers))
    idx = [block_order.index(i) for i in layers]
    if idx != list(range(len(layers))):
        taps_arr = taps_arr[:, jnp.asarray(idx), :, :]

    x_out = x.astype(jnp.float32)
    if spec.final_norm:
        x_out = _layer_norm(x_out, params["ln_f"], spec.ln_eps)
    return x_out, taps_arr


SITE_NAMES = ("resid", "norm1", "attn_out", "norm2", "mlp_out")


def forward_sites(
    spec: Spec,
    params: dict,
    tokens: Array,
    *,
    grid: tuple[int, int],
    compute_dtype: tp.Any = jnp.float32,
) -> dict[str, Array]:
    """Run the ViT recording EVERY internal site of EVERY block — the
    microscope for model-internals studies (e.g. hunting pathological channels,
    reference contrib/birdsong/notebooks/birdset.py:429-1046 instruments
    block/attention/MLP/norm outputs with hooks).

    Returns {site: (B, n_layers, T, D) float32} for sites `SITE_NAMES`
    ("resid" is the residual stream after each block).
    """
    x, sin, cos = _embed_with_pos(
        spec, params, tokens, grid, compute_dtype=compute_dtype
    )
    recorded: dict[str, list] = {name: [] for name in SITE_NAMES}
    for blk in params["blocks"]:
        x, sites = _apply_block(spec, blk, x, sin, cos, compute_dtype)
        recorded["resid"].append(x.astype(jnp.float32))
        for name in ("norm1", "attn_out", "norm2", "mlp_out"):
            recorded[name].append(sites[name].astype(jnp.float32))
    return {name: jnp.stack(acts, axis=1) for name, acts in recorded.items()}


def forward_from(
    spec: Spec,
    params: dict,
    x_tap: Array,
    start_layer: int,
    *,
    grid: tuple[int, int],
    rope_sincos=None,
    compute_dtype=jnp.float32,
) -> Array:
    """Continue the forward from a residual tap: run blocks [start_layer+1:)
    plus the final norm. Enables differentiating a model-output score w.r.t. an
    intermediate activation (Grad-CAM style saliency; scripts/gradcam.py).

    Only valid for `tap_point == "block"` taps (the residual stream after block
    `start_layer`).
    """
    assert spec.tap_point == "block"
    sin = cos = None
    if spec.pos_kind == "rope":
        if rope_sincos is not None:
            sin, cos = rope_sincos
        else:
            sin_np, cos_np = rope_angles(spec, *grid)
            sin, cos = jnp.asarray(sin_np), jnp.asarray(cos_np)

    x = x_tap.astype(compute_dtype)
    for blk in params["blocks"][start_layer + 1 :]:
        x, _ = _apply_block(spec, blk, x, sin, cos, compute_dtype)
    x = x.astype(jnp.float32)
    if spec.final_norm:
        x = _layer_norm(x, params["ln_f"], spec.ln_eps)
    return x


def interpolate_pos(
    pos: np.ndarray, n_prefix: int, grid_from: tuple[int, int], grid_to: tuple[int, int]
) -> np.ndarray:
    """Bicubic-interpolate a learned positional table to a new patch grid
    (DINOv2-style; prefix entries pass through)."""
    from PIL import Image

    if grid_from == grid_to:
        return pos
    prefix, patch = pos[:n_prefix], pos[n_prefix:]
    h0, w0 = grid_from
    h1, w1 = grid_to
    d = patch.shape[1]
    img = patch.reshape(h0, w0, d)
    out = np.stack(
        [
            np.asarray(
                Image.fromarray(img[:, :, c].astype(np.float32), mode="F").resize(
                    (w1, h1), Image.BICUBIC
                )
            )
            for c in range(d)
        ],
        axis=-1,
    )
    return np.concatenate([prefix, out.reshape(h1 * w1, d)], axis=0).astype(np.float32)


@functools.lru_cache(maxsize=64)
def _jitted_forward(spec: Spec, layers: tuple[int, ...], grid: tuple[int, int], dtype):
    return jax.jit(
        functools.partial(
            forward, spec, layers=layers, grid=grid, compute_dtype=dtype
        )
    )


def to_device(params: dict) -> dict:
    """Transfer a converted (numpy) param tree to the default device ONCE.

    Converters return host numpy; passing numpy params into the jitted forward
    re-uploads the full weight set on every batch (jit does not cache
    transfers for numpy inputs) — for a ViT-L that is ~1.2 GB per step on the
    extraction hot path. Model wrappers call this at construction.
    """
    return jax.tree.map(jnp.asarray, params)


def run(
    spec: Spec,
    params: dict,
    tokens: np.ndarray,
    layers: tuple[int, ...],
    grid: tuple[int, int],
    *,
    compute_dtype: tp.Any = jnp.float32,
) -> tuple[np.ndarray, np.ndarray]:
    """Convenience: jitted forward (cached per (spec, layers, grid, dtype)).

    Extraction data parallelism (SURVEY.md §2.8): with multiple devices and a
    divisible batch, the image batch shards over the `data` mesh axis and XLA
    runs the ViT forward on every chip (params replicate on demand).
    """
    from .. import parallel

    fn = _jitted_forward(spec, tuple(layers), tuple(grid), compute_dtype)
    x = jnp.asarray(tokens)
    n_dev = len(jax.devices())
    if n_dev > 1 and tokens.shape[0] % n_dev == 0:
        x = jax.device_put(x, parallel.batch_sharding(parallel.make_mesh()))
    out, taps = fn(params, x)
    return np.asarray(out), np.asarray(taps)
