"""Microbenchmark: kth-bisection kernel variants on the live chip.

Times the production exact kth kernel against raw compare+count loops at
different pass counts and dtypes — decides whether a 16-bit two-phase kth
rewrite can beat the 32-pass bisection (NOTES.md headroom: "16-bit SWAR
pack ≈ −25%"). Uses the scalar-carry chained-timing pattern from
scripts/profile_step2.py (the dev tunnel dedups identical dispatches).
"""

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from saev_tpu.ops import pallas_topk

B, S = 16384, 16384
TILE = pallas_topk.TILE_ROWS


def chain_time(step, carry=None, n=12, warmup=3):
    carry = jnp.float32(0) if carry is None else carry
    for _ in range(warmup):
        carry = step(carry)
    jax.block_until_ready(carry)
    t0 = time.perf_counter()
    for _ in range(n):
        carry = step(carry)
    _ = float(np.asarray(jax.tree.leaves(carry)[0]).ravel()[0])
    return (time.perf_counter() - t0) / n * 1e3


def loop_kernel(n_passes: int, x_ref, out_ref):
    key = x_ref[:]

    def step(i, acc):
        cand = jnp.ones((), key.dtype) * i.astype(key.dtype)
        count = jnp.sum((key >= cand).astype(jnp.int32), axis=1, keepdims=True)
        return acc + count

    acc = jax.lax.fori_loop(
        0, n_passes, step, jnp.zeros((key.shape[0], 1), jnp.int32), unroll=True
    )
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnums=(1,))
def count_loop(x, n_passes):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, s = x.shape
    return pl.pallas_call(
        functools.partial(loop_kernel, n_passes),
        out_shape=jax.ShapeDtypeStruct((b, 1), jnp.int32),
        grid=(b // TILE,),
        in_specs=[pl.BlockSpec((TILE, s), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE, 1), lambda i: (i, 0)),
    )(x)


def main():
    rng = np.random.default_rng(0)
    xf = jnp.asarray(rng.normal(size=(B, S)).astype(np.float32))
    print(f"backend: {jax.default_backend()}")

    @jax.jit
    def kth_step(c):
        out = pallas_topk.exact_kth_value_pallas(xf * (1 + 1e-12 * c), 32)
        return out.ravel()[0]

    print(f"exact kth (32-pass bisection, f32): {chain_time(kth_step):7.2f} ms")

    xi32 = jnp.asarray(rng.integers(1, 2**31, size=(B, S), dtype=np.int32))

    for passes in (32, 16, 8):
        @jax.jit
        def ct_step(c, _p=passes):
            out = count_loop(xi32 + c.astype(jnp.int32), _p)
            return out.ravel()[0].astype(jnp.float32)

        print(f"raw {passes:2d}x compare+count, int32:      {chain_time(ct_step):7.2f} ms")




if __name__ == "__main__":
    main()
