"""Benchmark extraction-side ViT throughput on the local accelerator.

The extraction stage's cost is the frozen ViT forward (reference
data/shards.py worker hot loop); this measures the shared JAX engine
(saev_tpu/models/vit.py) at real family shapes with random weights —
weights don't affect throughput, so no downloads are needed.

Times the jitted recorded forward (tap at the second-to-last layer, the
production default) with device-resident inputs, bf16 compute (extraction
runs frozen models; activations are stored f32 but matmuls need not be), via
data-dependency chains (NOTES.md tunnel gotchas).

    python scripts/bench_extract.py [--families dinov2-b clip-l] [--batch 64]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

FAMILY_SPECS = {
    # name: (d_model, n_layers, n_heads, patch, img_px, extras)
    "clip-b": (768, 12, 12, 16, 224, {"pre_norm": True, "act": "quick_gelu"}),
    "clip-l": (1024, 24, 16, 14, 224, {"pre_norm": True, "act": "quick_gelu"}),
    "dinov2-b": (768, 12, 12, 14, 224, {"layerscale": True, "n_registers": 4}),
    "dinov2-l": (1024, 24, 16, 14, 224, {"layerscale": True, "n_registers": 4}),
    "siglip-b": (768, 12, 12, 16, 224, {"cls_token": False}),
}


def bench_family(name: str, batch: int, n_iters: int = 10) -> dict:
    import jax
    import jax.numpy as jnp

    from saev_tpu.models import vit

    d_model, n_layers, n_heads, patch, img_px, extras = FAMILY_SPECS[name]
    grid = (img_px // patch, img_px // patch)
    n_patches = grid[0] * grid[1]
    spec = vit.Spec(
        d_model=d_model, n_layers=n_layers, n_heads=n_heads, patch_size=patch,
        **extras,
    )
    n_pos = n_patches + int(spec.cls_token) + spec.n_registers
    params = vit.to_device(vit.init(spec, jax.random.key(0), n_pos=n_pos))
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(
        rng.normal(size=(batch, n_patches, 3 * patch * patch)).astype(np.float32)
    )
    layers = (n_layers - 2,)
    fn = vit._jitted_forward(spec, layers, grid, jnp.bfloat16)

    # Chain via an input perturbation so the tunnel can't dedupe dispatches;
    # params/tokens are ARGUMENTS (closed-over device constants get shipped in
    # the remote compile request — NOTES.md tunnel gotchas).
    @jax.jit
    def one(c, params, tokens):
        out, taps = fn(params, tokens * (1 + 1e-12 * c))
        return out.ravel()[0].astype(jnp.float32)

    c = jnp.float32(0)
    for _ in range(3):
        c = one(c, params, tokens)
    jax.block_until_ready(c)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        c = one(c, params, tokens)
    _ = float(np.asarray(c))
    dt = (time.perf_counter() - t0) / n_iters
    return {
        "family": name,
        "batch": batch,
        "ms_per_batch": round(dt * 1e3, 2),
        "images_per_s": round(batch / dt, 1),
        "patch_tokens_per_s": round(batch * n_patches / dt, 1),
    }


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--families", nargs="+", default=["clip-l", "dinov2-l"],
        choices=sorted(FAMILY_SPECS),
    )
    parser.add_argument("--batch", type=int, default=64)
    args = parser.parse_args()
    for fam in args.families:
        result = bench_family(fam, args.batch)
        print(result, flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
