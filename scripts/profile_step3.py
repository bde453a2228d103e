"""Round-4 component profiler. Unlike profile_step2.py, every jitted unit takes
the big arrays as ARGUMENTS (the dev tunnel hangs on jit closures over ~1 GB
device arrays — NOTES.md gotchas). Each unit is chained through a scalar carry
c; the `x * (1 + eps*c)` perturbation costs one extra HBM read+write, measured
separately as `baseline` and subtractable from every row.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from saev_tpu.nn import modeling
from saev_tpu.ops import pallas_topk

B, D, S = 16384, 1024, 16384


def chain_time(fn, args, n=10, warmup=3):
    c = jnp.float32(0)
    for _ in range(warmup):
        c = fn(c, *args)
    jax.block_until_ready(c)
    t0 = time.perf_counter()
    for _ in range(n):
        c = fn(c, *args)
    _ = float(np.asarray(c).ravel()[0])
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}", flush=True)
    x = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    sae_cfg = modeling.SparseAutoencoderConfig(
        d_model=D, d_sae=S, activation=modeling.TopK(top_k=32)
    )
    params, _ = modeling.init(sae_cfg, jax.random.key(0))
    h = jnp.asarray(rng.normal(size=(B, S)).astype(np.float32) ** 2)

    @jax.jit
    def base_step(c, h):
        hp = h * (1 + 1e-12 * c)
        return hp.ravel()[0]

    t_base = chain_time(base_step, (h,))
    print(f"baseline (perturb+read h) : {t_base:7.2f} ms", flush=True)

    @jax.jit
    def kth_step(c, h):
        hp = h * (1 + 1e-12 * c)
        return pallas_topk.exact_kth_value_pallas(hp, 32).ravel()[0]

    t = chain_time(kth_step, (h,))
    print(f"pallas kth (32-pass)      : {t:7.2f} ms  (net {t - t_base:6.2f})", flush=True)

    @jax.jit
    def topk_step(c, h):
        hp = h * (1 + 1e-12 * c)
        f = modeling.topk_activation(hp, 32, fast=True)
        return f.ravel()[0]

    t = chain_time(topk_step, (h,))
    print(f"topk activation (kth+mask): {t:7.2f} ms  (net {t - t_base:6.2f})", flush=True)

    @jax.jit
    def enc_step(c, x, W, b):
        xp = x * (1 + 1e-12 * c)
        h = jnp.dot(xp, W, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST) + b
        return h.ravel()[0]

    t = chain_time(enc_step, (x, params["W_enc"], params["b_enc"]))
    print(f"encode matmul (HIGHEST)   : {t:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
