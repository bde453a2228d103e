"""Microbench: per-pass op formulations for the 32-pass kth bisection.

v5e Mosaic has NO 16-bit comparisons (int16/uint16/bf16 all refuse to
lower; probed 2026-08-18), so the 16-bit two-phase kth is unreachable on
this target. The remaining room is per-pass op count in the 32-bit domain:
the production kernel spends ~3 VPU ops/element/pass (u32 compare, i1->i32
convert, reduce-accumulate) and sits near the VPU roofline. Variants:

  prod          u32 compare + astype(i32) + jnp.sum            (baseline)
  tile128/256   same kernel, more rows per grid program
  i32key        XOR the sign bit once outside the loop -> signed compares
  subsar        count via sum((key'-cand) >> 31) (arith shift); timing-only
                here (31-bit exactness bracketing not wired in)
  f32red        mask summed in f32 instead of i32
  mxucount      mask -> bf16, counted by an MXU matvec against ones

Usage: python scripts/proto_kth_ops.py
"""

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

B, S, K = 16384, 16384, 32

def _salted_time(fn, x, n=30):
    """Time with a fresh host scalar folded into every dispatch: repeated
    IDENTICAL dispatches on this setup can return in ~0.05 ms without
    executing (NOTES.md 'microbench traps'), so never time an unchanged
    (program, inputs) pair."""
    import jax

    @jax.jit
    def salted(s, a):
        out = fn(a)
        return out, out.reshape(-1)[0].astype(jnp.float32) + s

    rs = np.random.default_rng(time.time_ns() % (1 << 32))
    out = salted(jnp.float32(rs.normal()), x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = salted(jnp.float32(rs.normal()), x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def _wrap(kernel, tile_rows):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    params = (
        pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
        if tile_rows > 32 else None
    )
    return jax.jit(
        pl.pallas_call(
            functools.partial(kernel, K),
            out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
            grid=(B // tile_rows,),
            in_specs=[
                pl.BlockSpec(
                    (tile_rows, S), lambda i: (i, 0), memory_space=pltpu.VMEM
                )
            ],
            out_specs=pl.BlockSpec((tile_rows, 1), lambda i: (i, 0)),
            compiler_params=params,
        )
    )


def _key_u32(x):
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    neg = (u >> 31) == 1
    return jnp.where(neg, ~u, u | jnp.uint32(0x80000000))


def _unkey_u32(cur):
    was_nonneg = (cur >> 31) == 1
    bits = jnp.where(was_nonneg, cur & jnp.uint32(0x7FFFFFFF), ~cur)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def _prod_kernel(k, x_ref, out_ref):
    x = x_ref[:]
    key = _key_u32(x)

    def bit_step(i, cur):
        bit = jnp.uint32(1) << (jnp.uint32(31) - jnp.uint32(i))
        cand = cur | bit
        count = jnp.sum((key >= cand).astype(jnp.int32), axis=1, keepdims=True)
        return jnp.where(count >= k, cand, cur)

    cur = jax.lax.fori_loop(
        0, 32, bit_step, jnp.zeros((x.shape[0], 1), jnp.uint32), unroll=32
    )
    out_ref[:] = _unkey_u32(cur)


def _i32key_kernel(k, x_ref, out_ref):
    x = x_ref[:]
    key = (_key_u32(x) ^ jnp.uint32(0x80000000)).astype(jnp.int32)

    def bit_step(i, cur):
        # cur: signed-domain prefix; start at INT32_MIN (= u32 0 ^ signbit).
        bit = (jnp.uint32(1) << (jnp.uint32(31) - jnp.uint32(i))).astype(jnp.int32)
        cand = cur + bit  # prefix | bit in the signed domain: bits below unset
        count = jnp.sum((key >= cand).astype(jnp.int32), axis=1, keepdims=True)
        return jnp.where(count >= k, cand, cur)

    lo = jnp.full((x.shape[0], 1), jnp.int32(-(2**31)))
    cur = jax.lax.fori_loop(0, 32, bit_step, lo, unroll=32)
    u = jax.lax.bitcast_convert_type(cur, jnp.uint32) ^ jnp.uint32(0x80000000)
    out_ref[:] = _unkey_u32(u)


def _subsar_kernel(k, x_ref, out_ref):
    """Timing shape only: counts via arithmetic shift of (key - cand).
    Exact only when key-cand never overflows; not wired for production."""
    x = x_ref[:]
    key = (_key_u32(x) >> 1).astype(jnp.int32)  # 31-bit domain: no overflow

    def bit_step(i, cur):
        bit = (jnp.uint32(1) << (jnp.uint32(30) - jnp.uint32(i))).astype(jnp.int32)
        cand = cur + bit
        # (key - cand) >> 31 is -1 where key < cand else 0.
        less = jnp.sum((key - cand) >> 31, axis=1, keepdims=True)
        count = jnp.int32(x.shape[1]) + less
        return jnp.where(count >= k, cand, cur)

    cur = jax.lax.fori_loop(
        0, 31, bit_step, jnp.zeros((x.shape[0], 1), jnp.int32), unroll=31
    )
    out_ref[:] = _unkey_u32((cur.astype(jnp.uint32)) << 1)


def _f32red_kernel(k, x_ref, out_ref):
    x = x_ref[:]
    key = _key_u32(x)
    kf = jnp.float32(k)

    def bit_step(i, cur):
        bit = jnp.uint32(1) << (jnp.uint32(31) - jnp.uint32(i))
        cand = cur | bit
        count = jnp.sum((key >= cand).astype(jnp.float32), axis=1, keepdims=True)
        return jnp.where(count >= kf, cand, cur)

    cur = jax.lax.fori_loop(
        0, 32, bit_step, jnp.zeros((x.shape[0], 1), jnp.uint32), unroll=32
    )
    out_ref[:] = _unkey_u32(cur)


def _mxu_kernel(k, x_ref, out_ref):
    x = x_ref[:]
    key = _key_u32(x)
    ones = jnp.ones((x.shape[1], 8), jnp.bfloat16)
    kf = jnp.float32(k)

    def bit_step(i, cur):
        bit = jnp.uint32(1) << (jnp.uint32(31) - jnp.uint32(i))
        cand = cur | bit
        mask = (key >= cand).astype(jnp.bfloat16)
        count = jax.lax.dot_general(
            mask, ones, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[:, :1]
        return jnp.where(count >= kf, cand, cur)

    cur = jax.lax.fori_loop(
        0, 32, bit_step, jnp.zeros((x.shape[0], 1), jnp.uint32), unroll=32
    )
    out_ref[:] = _unkey_u32(cur)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, S)).astype(np.float32))
    ref = jax.jit(lambda h: jax.lax.top_k(h, K)[0][:, -1:])
    want = np.asarray(ref(x))

    variants = [
        ("prod t32", _wrap(_prod_kernel, 32), True),
        ("prod t64", _wrap(_prod_kernel, 64), True),
        ("prod t128", _wrap(_prod_kernel, 128), True),
        ("prod t256", _wrap(_prod_kernel, 256), True),
        ("subsar t32", _wrap(_subsar_kernel, 32), False),
        ("f32red t32", _wrap(_f32red_kernel, 32), True),
        ("mxucount t32", _wrap(_mxu_kernel, 32), True),
        ("f32red t256", _wrap(_f32red_kernel, 256), True),
        ("f32red t512", _wrap(_f32red_kernel, 512), True),
        ("prod t512", _wrap(_prod_kernel, 512), True),
    ]
    for name, fn, check in variants:
        try:
            got = np.asarray(fn(x))
        except Exception as e:
            import re

            m = re.search(r"Mosaic failed[^\"]*", str(e))
            print(f"{name:14s}: LOWER-FAIL {m.group(0)[:70] if m else str(e)[:70]}")
            continue
        if check and not np.array_equal(got, want):
            print(f"{name:14s}: MISMATCH")
            continue
        ms = _salted_time(fn, x)
        tag = "" if check else "  (timing-only)"
        print(f"{name:14s}: {ms:7.2f} ms{tag}")


if __name__ == "__main__":
    main()
