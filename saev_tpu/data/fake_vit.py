"""Fake ViT family ("fake-clip") for fast hermetic tests.

TPU-native analog of the reference's `src/saev/data/fake_clip.py:22-87` (which wraps
`hf-internal-testing/tiny-open-clip-model`): instead of downloading a tiny torch model,
we build a tiny deterministic pure-JAX ViT (8x8 images, 2x2 patches, 16 content tokens
+ CLS, d_model=128). No network access required; params derive from a fixed PRNG seed,
so outputs are reproducible across runs and machines.
"""

import functools
from collections.abc import Callable

import numpy as np
from PIL import Image

from . import models, transforms

D_MODEL = 128
N_LAYERS = 3
N_HEADS = 4
IMG_SIZE = 8
PATCH_SIZE = 2
N_PATCHES = (IMG_SIZE // PATCH_SIZE) ** 2  # 16
SEQ = N_PATCHES + 1  # CLS + patches

CKPT = "hf-hub:hf-internal-testing/tiny-open-clip-model"


def _make_params(seed: int):
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(seed)
    keys = iter(jax.random.split(key, 64))

    def dense(k, d_in, d_out):
        scale = 1.0 / np.sqrt(d_in)
        return {
            "w": jax.random.normal(k, (d_in, d_out), jnp.float32) * scale,
            "b": jnp.zeros((d_out,), jnp.float32),
        }

    params = {
        "patch_embed": dense(next(keys), 3 * PATCH_SIZE * PATCH_SIZE, D_MODEL),
        "cls": jax.random.normal(next(keys), (D_MODEL,), jnp.float32) * 0.02,
        "pos": jax.random.normal(next(keys), (SEQ, D_MODEL), jnp.float32) * 0.02,
        "blocks": [],
        "ln_f": {"g": jnp.ones((D_MODEL,)), "b": jnp.zeros((D_MODEL,))},
    }
    for _ in range(N_LAYERS):
        params["blocks"].append({
            "ln1": {"g": jnp.ones((D_MODEL,)), "b": jnp.zeros((D_MODEL,))},
            "qkv": dense(next(keys), D_MODEL, 3 * D_MODEL),
            "proj": dense(next(keys), D_MODEL, D_MODEL),
            "ln2": {"g": jnp.ones((D_MODEL,)), "b": jnp.zeros((D_MODEL,))},
            "fc1": dense(next(keys), D_MODEL, 4 * D_MODEL),
            "fc2": dense(next(keys), 4 * D_MODEL, D_MODEL),
        })
    return params


def _forward(params, x_bchw, layers: tuple[int, ...]):
    """Pre-LN ViT forward; residual stream tapped after each requested block."""
    import jax
    import jax.numpy as jnp

    def ln(x, p):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + 1e-5) * p["g"] + p["b"]

    b = x_bchw.shape[0]
    # Patchify: (b, 3, 8, 8) -> (b, 16, 12) -> embed.
    hp = IMG_SIZE // PATCH_SIZE
    tokens = (
        x_bchw.reshape(b, 3, hp, PATCH_SIZE, hp, PATCH_SIZE)
        .transpose(0, 2, 4, 1, 3, 5)
        .reshape(b, N_PATCHES, 3 * PATCH_SIZE * PATCH_SIZE)
    )
    x = tokens @ params["patch_embed"]["w"] + params["patch_embed"]["b"]
    cls = jnp.broadcast_to(params["cls"], (b, 1, D_MODEL))
    x = jnp.concatenate([cls, x], axis=1) + params["pos"]

    taps = []
    for i, blk in enumerate(params["blocks"]):
        h = ln(x, blk["ln1"])
        qkv = h @ blk["qkv"]["w"] + blk["qkv"]["b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = D_MODEL // N_HEADS

        def heads(t):
            return t.reshape(b, SEQ, N_HEADS, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(hd), axis=-1
        )
        o = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, SEQ, D_MODEL)
        x = x + (o @ blk["proj"]["w"] + blk["proj"]["b"])

        h = ln(x, blk["ln2"])
        h = jax.nn.gelu(h @ blk["fc1"]["w"] + blk["fc1"]["b"])
        x = x + (h @ blk["fc2"]["w"] + blk["fc2"]["b"])

        if i in layers:
            taps.append(x)

    acts = jnp.stack(taps, axis=1)  # (b, n_layers, SEQ, D)
    out = ln(x, params["ln_f"])[:, 0, :]  # pooled CLS
    return out, acts


class Vit(models.Transformer):
    """Tiny deterministic JAX ViT registered as family "fake-clip"."""

    family: str = "fake-clip"

    def __init__(self, ckpt: str):
        assert ckpt == CKPT, f"FakeVit only supports the tiny test checkpoint, got {ckpt}"
        self._ckpt = ckpt
        self.params = _make_params(seed=0)
        self._jitted: dict[tuple[int, ...], Callable] = {}

    @property
    def ckpt(self) -> str:
        return self._ckpt

    @property
    def patch_size(self) -> int:
        return PATCH_SIZE

    @property
    def d_model(self) -> int:
        return D_MODEL

    @property
    def n_layers(self) -> int:
        return N_LAYERS

    @staticmethod
    def make_transforms(
        ckpt: str, content_tokens_per_example: int
    ) -> tuple[Callable, Callable | None]:
        def img_transform(img: Image.Image) -> np.ndarray:
            img = img.convert("RGB").resize((IMG_SIZE, IMG_SIZE), Image.BICUBIC)
            return transforms.to_chw_float(img, mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5))

        return img_transform, None

    @staticmethod
    def make_resize(
        ckpt: str,
        content_tokens_per_example: int = -1,
        *,
        scale: float = 1.0,
        resample: Image.Resampling = Image.LANCZOS,
    ) -> Callable[[Image.Image], Image.Image]:
        def resize(img: Image.Image) -> Image.Image:
            size_px = (int(IMG_SIZE * scale), int(IMG_SIZE * scale))
            return img.resize(size_px, resample=resample)

        return resize

    def get_token_i(self, content_tokens_per_example: int) -> slice:
        return slice(None, None, None)

    def forward_recorded(
        self, batch: np.ndarray, layers: tuple[int, ...], **kwargs
    ) -> tuple[np.ndarray, np.ndarray]:
        import jax
        import jax.numpy as jnp

        # Negative indices allowed, as in the shared engine (models/vit.py:439)
        # and the reference's hook registration (list indexing supports them).
        layers = tuple(int(i) % N_LAYERS for i in layers)
        if layers not in self._jitted:
            self._jitted[layers] = jax.jit(
                functools.partial(_forward, layers=layers)
            )
        out, acts = self._jitted[layers](self.params, jnp.asarray(batch, jnp.float32))
        return np.asarray(out), np.asarray(acts)


models.register_family(Vit)
