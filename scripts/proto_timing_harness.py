"""Decide which timing harness tells the truth on the axon-tunneled chip.

Two harnesses disagree by 30x on the SAME kth kernel:
  plain  : re-dispatch fn(x) n times from Python, block at the end -> 7.9 ms
  chained: one jit per iteration, scalar output feeds next input  -> 0.2 ms

Discriminators run here:
  1. n-scaling of the chained harness (n=10 vs n=50): a real 8 ms kernel
     cannot run 50 chained iterations in under 400 ms.
  2. a known-cost control: (16384,16384)@(16384,1024) bf16 matmul
     (550 GFLOP -> >= 2.8 ms at v5e peak) through both harnesses.
  3. forced host transfer of one element after the block, to catch a
     block_until_ready that acks before execution.

Usage: python scripts/proto_timing_harness.py
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

B, S, D = 16384, 16384, 1024


def chained(fn, x, n):
    @jax.jit
    def chain(eps, salt, a):
        a = a + eps.astype(a.dtype)
        out = fn(a)
        eps = (out.reshape(-1)[0].astype(jnp.float32) + salt) * 1e-30
        return eps, out

    eps = jnp.float32(0.0)
    eps, out = chain(eps, jnp.float32(1e-6), x)
    jax.block_until_ready((eps, out))
    t0 = time.perf_counter()
    for i in range(n):
        eps, out = chain(eps, jnp.float32((i + 2) * 1e-6), x)
    jax.block_until_ready(eps)
    t_block = time.perf_counter() - t0
    elt = float(np.asarray(jax.jit(lambda o: o.reshape(-1)[0])(out)))
    t_xfer = time.perf_counter() - t0
    return t_block / n * 1e3, t_xfer / n * 1e3, elt


def plain(fn, x, n):
    jfn = jax.jit(fn)
    out = jfn(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = jfn(x)
    jax.block_until_ready(out)
    t_block = time.perf_counter() - t0
    elt = float(np.asarray(jax.jit(lambda o: o.reshape(-1)[0])(out)))
    t_xfer = time.perf_counter() - t0
    return t_block / n * 1e3, t_xfer / n * 1e3, elt


def main():
    from saev_tpu.ops import pallas_topk

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, S)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(S, D)).astype(np.float32) * 0.02, jnp.bfloat16)

    kth = lambda a: pallas_topk.exact_kth_value_pallas(a, 32)
    mm = lambda a: jnp.dot(a.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32)

    for name, fn in (("kth", kth), ("matmul550G", mm)):
        for n in (10, 50):
            tb, tx, _ = chained(fn, x, n)
            print(f"chained {name:10s} n={n:3d}: block {tb:7.2f} ms/call, +xfer {tx:7.2f}", flush=True)
        for n in (10, 30):
            tb, tx, _ = plain(fn, x, n)
            print(f"plain   {name:10s} n={n:3d}: block {tb:7.2f} ms/call, +xfer {tx:7.2f}", flush=True)


if __name__ == "__main__":
    main()
