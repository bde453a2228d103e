"""Prototype: fix the 16-bit kth kernel's Mosaic lowering and time variants.

The two-phase 16-bit bisection (ops/pallas_topk.py::_kernel16) fails to lower
because Mosaic has no int16 reductions. Two candidate fixes, timed here
against the production 32-pass kernel on the live chip:

  v16_i32red : keep uint16 compares (2/lane) but convert the mask to int32 at
               the reduction (`jnp.sum(mask.astype(int32))`).
  v16_tree   : keep EVERYTHING 16-bit-packed — reduce the int16 mask with a
               manual halving tree of int16 adds (counts <= S <= 32767 never
               overflow) down to 128 lanes, then one tiny int32 reduce.

Both are bit-identical to the 32-pass kernel by construction (same integer
bisection over the same order keys); parity is asserted vs lax.top_k on
random and heavy-ties inputs before timing.

Usage: python scripts/proto_kth16.py
"""

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

TILE_ROWS = 32


def _tree_count_i16(mask_i16):
    """Sum (T, S) int16 0/1 mask along axis 1 -> (T, 1) int32, via a halving
    tree of int16 adds (stays 2-per-lane) down to 128 lanes."""
    x = mask_i16
    s = x.shape[1]
    while s > 128:
        half = s // 2
        x = x[:, :half] + x[:, half:]
        s = half
    return jnp.sum(x.astype(jnp.int32), axis=1, keepdims=True)


def _order_key(x):
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    neg = (u >> 31) == 1
    return jnp.where(neg, ~u, u | jnp.uint32(0x80000000))


def _unkey(cur):
    was_nonneg = (cur >> 31) == 1
    bits = jnp.where(was_nonneg, cur & jnp.uint32(0x7FFFFFFF), ~cur)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def _take_mask16(count_i32, k32):
    """(count >= k) as a (T, 1) uint16 all-ones/all-zeros mask, without ever
    materializing an i1 vector in the 16-bit lane domain (Mosaic cannot
    relayout (T,1) i1 from 32-bit to 16-bit packed layout)."""
    take = jnp.minimum(jnp.maximum(count_i32 - k32 + 1, 0), 1)  # (T,1) i32 0/1
    return (jnp.uint16(0) - take.astype(jnp.uint16))  # 0x0000 or 0xFFFF


def _make_kernel16(count_fn):
    def kernel(k: int, x_ref, out_ref):
        x = x_ref[:]
        key = _order_key(x)
        hi = (key >> 16).astype(jnp.uint16)
        k32 = jnp.int32(k)

        def hi_step(i, cur):
            bit = (jnp.uint16(1) << (jnp.uint16(15) - jnp.uint16(i))).astype(
                jnp.uint16
            )
            cand = cur | bit
            count = count_fn((hi >= cand).astype(jnp.int16))
            return cur | (bit & _take_mask16(count, k32))

        h_star = jax.lax.fori_loop(
            0, 16, hi_step, jnp.zeros((x.shape[0], 1), jnp.uint16), unroll=16
        )
        c_above = count_fn((hi > h_star).astype(jnp.int16))
        lo = jnp.where(
            hi == h_star,
            (key & jnp.uint32(0xFFFF)).astype(jnp.uint16),
            jnp.uint16(0),
        )

        def lo_step(i, cur):
            bit = (jnp.uint16(1) << (jnp.uint16(15) - jnp.uint16(i))).astype(
                jnp.uint16
            )
            cand = cur | bit
            count = count_fn((lo >= cand).astype(jnp.int16))
            return cur | (bit & _take_mask16(c_above + count, k32))

        l_star = jax.lax.fori_loop(
            0, 16, lo_step, jnp.zeros((x.shape[0], 1), jnp.uint16), unroll=16
        )
        cur = (h_star.astype(jnp.uint32) << 16) | l_star.astype(jnp.uint32)
        out_ref[:] = _unkey(cur)

    return kernel


def _i32red_count(mask_i16):
    return jnp.sum(mask_i16.astype(jnp.int32), axis=1, keepdims=True)


def _pallas_wrap(kernel, b, s, k):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.pallas_call(
        functools.partial(kernel, k),
        out_shape=jax.ShapeDtypeStruct((b, 1), jnp.float32),
        grid=(b // TILE_ROWS,),
        in_specs=[
            pl.BlockSpec((TILE_ROWS, s), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((TILE_ROWS, 1), lambda i: (i, 0)),
    )


def main():
    from saev_tpu.ops import pallas_topk

    B, S, K = 16384, 16384, 32
    rng = np.random.default_rng(0)
    cases = {
        "normal": rng.normal(size=(B, S)).astype(np.float32),
        "ties": np.round(rng.normal(size=(B, S)) * 4).astype(np.float32) / 4,
        "mixed-sign": (rng.normal(size=(B, S)) - 1.0).astype(np.float32),
    }

    variants = {
        "v32 (prod)": jax.jit(lambda h: pallas_topk.exact_kth_value_pallas(h, K)),
        "v16_i32red": jax.jit(
            _pallas_wrap(_make_kernel16(_i32red_count), B, S, K)
        ),
        "v16_tree": jax.jit(
            _pallas_wrap(_make_kernel16(_tree_count_i16), B, S, K)
        ),
    }

    ref_fn = jax.jit(lambda h: jax.lax.top_k(h, K)[0][:, -1:])
    for cname, x in cases.items():
        xd = jnp.asarray(x)
        want = np.asarray(ref_fn(xd))
        for vname, fn in variants.items():
            try:
                got = np.asarray(fn(xd))
            except Exception as e:  # lowering failure
                print(f"parity {vname:12s} {cname:10s}: FAILED {str(e)[:90]}")
                continue
            ok = np.array_equal(got, want)
            print(f"parity {vname:12s} {cname:10s}: {'bitwise ok' if ok else 'MISMATCH'}")
            assert ok, (vname, cname)

    x = jnp.asarray(cases["normal"])
    for vname, fn in variants.items():
        try:
            fn(x).block_until_ready()
        except Exception:
            continue

        # Salt every dispatch: repeated IDENTICAL dispatches on this setup
        # can return in ~0.05 ms without executing (NOTES.md traps).
        @jax.jit
        def salted(s, a, fn=fn):
            out = fn(a)
            return out, out.reshape(-1)[0] + s

        rs = np.random.default_rng(time.time_ns() % (1 << 32))
        salted(jnp.float32(rs.normal()), x)[1].block_until_ready()
        n = 30
        t0 = time.perf_counter()
        for _ in range(n):
            out = salted(jnp.float32(rs.normal()), x)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / n * 1e3
        print(f"time   {vname:12s}: {ms:7.2f} ms")


if __name__ == "__main__":
    main()
