"""Prototype: encode matmul + TopK stats epilogue in ONE Pallas kernel.

The production step runs the encode matmul (XLA, 2.85 ms MXU-bound) and then
the stats kernel (6.83 ms VPU-bound) back to back — the h tensor round-trips
HBM (1 GB write + 1 GB read) and each unit idles while the other works. A
single kernel computes h = bf16(x) @ W + b into its VMEM-resident output
block and runs the bisection epilogue on it before the block flushes:
h's read-back disappears and Mosaic can interleave MXU/VPU work.

W stays VMEM-resident (constant block index, 32 MB bf16); per 256-row tile
the budget is W 32 + h-out 2x16 + f-out 2x8 + x 2x1 ≈ 83 MB under the raised
100 MB scoped limit.

Usage: python scripts/proto_encode_stats.py   (on the TPU tunnel)
"""

import functools
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(k, x_ref, w_ref, be_ref, h_ref, kth_ref, f_ref, live_ref, l0_ref,
            l1_ref):
    xb = x_ref[:].astype(jnp.bfloat16)
    h = jnp.dot(xb, w_ref[:], preferred_element_type=jnp.float32) + be_ref[:]
    h_ref[:] = h

    u = jax.lax.bitcast_convert_type(h, jnp.uint32)
    neg = (u >> 31) == 1
    key = jnp.where(neg, ~u, u | jnp.uint32(0x80000000))
    kf = jnp.float32(k)

    def bit_step(i, cur):
        bit = jnp.uint32(1) << (jnp.uint32(31) - jnp.uint32(i))
        cand = cur | bit
        count = jnp.sum((key >= cand).astype(jnp.float32), axis=1, keepdims=True)
        return jnp.where(count >= kf, cand, cur)

    cur = jax.lax.fori_loop(
        0, 32, bit_step, jnp.zeros((h.shape[0], 1), jnp.uint32), unroll=32
    )
    was_nonneg = (cur >> 31) == 1
    bits = jnp.where(was_nonneg, cur & jnp.uint32(0x7FFFFFFF), ~cur)
    kth = jax.lax.bitcast_convert_type(bits, jnp.float32)
    kth_ref[:] = kth

    mask = h >= kth
    f = jnp.where(mask, h, jnp.zeros((), h.dtype))
    fb = f.astype(jnp.bfloat16)
    f_ref[:] = fb
    live_ref[:] = jnp.broadcast_to(
        jnp.sum((fb != jnp.bfloat16(0)).astype(jnp.float32), axis=0,
                keepdims=True),
        live_ref.shape,
    )
    l0_ref[:] = jnp.sum(
        (mask & (h != 0.0)).astype(jnp.float32), axis=1, keepdims=True
    )
    l1_ref[:] = jnp.sum(jnp.abs(f), axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def encode_stats_pallas(x, w_bf16, b_enc, k, tile=256, interpret=False):
    from jax.experimental.pallas import tpu as _pltpu

    # W (32 MB bf16) is double-buffered by the pipeline despite its constant
    # index map, so this kernel needs more scoped VMEM than the shared
    # 100 MB policy: 2x32 (W) + 2x16 (h out) + 2x8 (f out) + ~3 = ~115 MB.
    params = (
        None if interpret
        else _pltpu.CompilerParams(vmem_limit_bytes=122 * 1024 * 1024)
    )
    b, d_model = x.shape
    s = w_bf16.shape[1]
    assert b % tile == 0
    return pl.pallas_call(
        functools.partial(_kernel, k),
        out_shape=[
            jax.ShapeDtypeStruct((b, s), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, s), jnp.bfloat16),
            jax.ShapeDtypeStruct((8 * (b // tile), s), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
        ],
        grid=(b // tile,),
        in_specs=[
            pl.BlockSpec((tile, d_model), lambda i: (i, 0)),
            pl.BlockSpec((d_model, s), lambda i: (0, 0)),
            pl.BlockSpec((1, s), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tile, s), lambda i: (i, 0)),
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),
            pl.BlockSpec((tile, s), lambda i: (i, 0)),
            pl.BlockSpec((8, s), lambda i: (i, 0)),
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),
        ],
        interpret=interpret,
        compiler_params=params,
    )(x, w_bf16, b_enc.reshape(1, s))


def main():
    from kprof import device_profile
    from saev_tpu.nn import modeling
    from saev_tpu.ops import topk as ops_topk

    B, D, S, K = 16384, 1024, 16384, 32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(D, S)).astype(np.float32) / 32)
    be = jnp.asarray(rng.normal(size=(S,)).astype(np.float32) * 0.01)
    wb = w.astype(jnp.bfloat16)

    if "--check" in sys.argv or jax.default_backend() != "tpu":
        # Correctness vs the two-pass formulation (separate invocation: each
        # shape's kernel compile costs minutes through the dev tunnel).
        interp = jax.default_backend() != "tpu"
        hs, kth, f, live, l0, l1 = encode_stats_pallas(
            x[:512], wb[:, :], be, K, 256, interp
        )
        h_ref = modeling._linear_bias(x[:512], w, be, jax.lax.Precision.DEFAULT)
        np.testing.assert_allclose(
            np.asarray(hs), np.asarray(h_ref), rtol=1e-5, atol=1e-5
        )
        # The kernel's OWN h is the h the step would consume; its stats must
        # be exact w.r.t. that h (vs XLA's h they differ by MXU accum ulps).
        st = ops_topk._topk_stats_xla(jnp.asarray(np.asarray(hs)), K)
        np.testing.assert_array_equal(np.asarray(kth), np.asarray(st.kth))
        np.testing.assert_array_equal(np.asarray(f), np.asarray(st.f))
        np.testing.assert_array_equal(np.asarray(l0), np.asarray(st.l0))
        print("numerics: h ~ XLA (ulp), stats exact on own h: OK")
        return

    # A/B timing via the profiler.
    def fused(_c):
        hs, kth, f, live, l0, l1 = encode_stats_pallas(x, wb, be, K)
        return kth.sum() + l1.sum()

    def two_pass(_c):
        h = modeling._linear_bias(x, w, be, jax.lax.Precision.DEFAULT)
        st = ops_topk.topk_stats(h, K)
        return st.kth.sum() + st.l1.sum()

    for name, fn in (("two_pass", two_pass), ("fused", fused)):
        try:
            rows = device_profile(fn, (), n=6, warmup=2)
        except Exception as err:
            print(f"{name}: FAILED {str(err)[:300]}")
            continue
        tot = sum(ms for nm, ms, _ in rows if not nm.startswith("jit_"))
        print(f"{name}: {tot:.2f} ms")
        for nm, ms, cnt in rows:
            if ms >= 0.3:
                print(f"   {ms:8.3f} ms x{cnt} {nm[:80]}")


if __name__ == "__main__":
    main()
