"""Pallas TPU kernel: EXACT per-row k-th-largest value in one HBM pass.

XLA's `lax.top_k` sorts each row (~230 ms for (16384, 16384) f32 on v5e) and
ApproxTopK trades exactness for speed. This kernel gets exactness AND speed:

- Each grid program stages a tile of rows (8 x S f32 = 512 KB at S=16384) in
  VMEM — the data leaves HBM exactly once.
- Floats map to an order-preserving uint32 key (sign-flip trick), and the k-th
  largest key is found by 32-step bitwise bisection: at bit b, tentatively set
  the bit and count keys >= candidate (a VPU reduce over the VMEM-resident
  tile); keep the bit iff count >= k. The result is the largest threshold t
  with count(key >= t) >= k — exactly the k-th order statistic, bit-identical
  to lax.top_k's k-th value (ties collapse to the same value).
- Cost: 32 vectorized compare+reduce passes over VMEM (no HBM re-reads), so
  the kernel runs at HBM streaming speed (~4 ms/GB) for any k.

Used by `ops.topk.exact_kth_value` on TPU backends; eval/inference paths get
exact reference-parity thresholds at approx-top-k speed.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

TILE_ROWS = 32  # minimum row tile (batch padding granularity)
MAX_TILE_ROWS = 512  # preferred row tile; needs the raised scoped-VMEM limit


def _tile_rows(b: int) -> int:
    """Largest power-of-two row tile (<= MAX_TILE_ROWS) dividing the padded
    batch. Bigger tiles amortize Mosaic per-program overhead: 8.1 -> 6.4 ms
    at the production shape (scripts/proto_kth_ops.py, 512-row tiles, f32
    count reduce)."""
    t = MAX_TILE_ROWS
    while t > TILE_ROWS and b % t:
        t //= 2
    return t


def _vmem_params(tile_rows: int, interpret: bool = False):
    """(tile_rows, S) f32 tiles above 32 rows exceed Mosaic's 16 MB default
    scoped-VMEM limit (shared policy: ops/_mosaic.py)."""
    from . import _mosaic

    return _mosaic.vmem_params(tile_rows, 32, interpret)


def _kernel(k: int, x_ref, out_ref):
    from jax.experimental import pallas as pl  # noqa: F401

    x = x_ref[:]  # (TILE_ROWS, S) f32 in VMEM
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    # Order-preserving map: non-negative floats -> set sign bit; negative
    # floats -> bitwise NOT. Monotone increasing with float value.
    neg = (u >> 31) == 1
    key = jnp.where(neg, ~u, u | jnp.uint32(0x80000000))

    kf = jnp.float32(k)

    def bit_step(i, cur):
        # cur: (tile, 1) uint32 prefix of the k-th largest key. Counts reduce
        # in f32 (exact for integers up to 2**24 >> S): measurably faster
        # than the i32 reduce on v5e (scripts/proto_kth_ops.py).
        bit = jnp.uint32(1) << (jnp.uint32(31) - jnp.uint32(i))
        cand = cur | bit
        count = jnp.sum((key >= cand).astype(jnp.float32), axis=1, keepdims=True)
        return jnp.where(count >= kf, cand, cur)

    cur = jax.lax.fori_loop(
        0, 32, bit_step, jnp.zeros((x.shape[0], 1), jnp.uint32), unroll=32
    )
    # Invert the key map back to float.
    was_nonneg = (cur >> 31) == 1
    bits = jnp.where(was_nonneg, cur & jnp.uint32(0x7FFFFFFF), ~cur)
    out_ref[:] = jax.lax.bitcast_convert_type(bits, jnp.float32)


@functools.partial(jax.jit, static_argnums=(1, 2))
def exact_kth_value_pallas(h: jax.Array, k: int, interpret: bool = False) -> jax.Array:
    """Exact k-th largest along the last axis of (B, S) f32; returns (B, 1).

    B must be a multiple of 8 (callers pad). `interpret=True` runs the Pallas
    interpreter (CPU testing).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, s = h.shape
    assert h.dtype == jnp.float32
    assert b % TILE_ROWS == 0, f"batch {b} must be a multiple of {TILE_ROWS}"
    k = min(k, s)
    tile = _tile_rows(b)

    return pl.pallas_call(
        functools.partial(_kernel, k),
        out_shape=jax.ShapeDtypeStruct((b, 1), jnp.float32),
        grid=(b // tile,),
        in_specs=[
            pl.BlockSpec((tile, s), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0)),
        interpret=interpret,
        compiler_params=_vmem_params(tile, interpret),
    )(h)


def kth_value(h: jax.Array, k: int) -> jax.Array:
    """Exact k-th largest, dispatching to the Pallas kernel on TPU (padding the
    row count to a tile multiple) and lax.top_k elsewhere.

    A two-phase 16-bit bisection variant (half-width compares packed
    2-per-lane) was prototyped and deleted: Mosaic on v5e has no 16-bit
    compare or 16-bit reduction lowering at all (probed op-by-op 2026-08-18;
    docs/performance.md "Round-4 negative results")."""
    from . import shmap

    if (
        (jax.default_backend() != "tpu" and not shmap.INTERPRET)
        or h.ndim != 2
        or h.dtype != jnp.float32
    ):
        return jax.lax.top_k(h, min(k, h.shape[-1]))[0][..., -1:]
    b = h.shape[0]
    quantum = TILE_ROWS * shmap.n_shards()
    pad = (-b) % quantum
    hp = jnp.pad(h, ((0, pad), (0, 0))) if pad else h
    call = shmap.shard_rows(
        lambda hh: exact_kth_value_pallas(hh, k, shmap.INTERPRET),
        in_batch_dims=(0,), out_batch_dims=(0,),
    )
    return call(hp)[:b]


def _kernel_stats(k: int, x_ref, kth_ref, f_ref, live_ref, l0_ref, l1_ref):
    """Bisection kth + the TopK epilogue on the VMEM-resident tile.

    The train step consumes four derived tensors whose XLA formulations each
    re-read the 1 GB pre-activation tensor from HBM (profiled round 5:
    compare_reduce_fusion 2.3 ms + abs_reduce_fusion 1.4 ms at the production
    shape): f_bf16 = where(h >= kth, h, 0).astype(bf16) for the decode
    kernels, per-latent liveness (bf16 resolution, nn/objectives.py), and
    per-row L0/L1. All four fall out of the tile this kernel already stages
    for the bisection, so emitting them here removes both follow-up passes.
    """
    x = x_ref[:]  # (TILE, S) f32 in VMEM
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    neg = (u >> 31) == 1
    key = jnp.where(neg, ~u, u | jnp.uint32(0x80000000))

    kf = jnp.float32(k)

    def bit_step(i, cur):
        bit = jnp.uint32(1) << (jnp.uint32(31) - jnp.uint32(i))
        cand = cur | bit
        count = jnp.sum((key >= cand).astype(jnp.float32), axis=1, keepdims=True)
        return jnp.where(count >= kf, cand, cur)

    cur = jax.lax.fori_loop(
        0, 32, bit_step, jnp.zeros((x.shape[0], 1), jnp.uint32), unroll=32
    )
    was_nonneg = (cur >> 31) == 1
    bits = jnp.where(was_nonneg, cur & jnp.uint32(0x7FFFFFFF), ~cur)
    kth = jax.lax.bitcast_convert_type(bits, jnp.float32)
    kth_ref[:] = kth

    mask = x >= kth  # threshold-mask TopK (nn/modeling.topk_activation)
    f = jnp.where(mask, x, jnp.zeros((), x.dtype))
    fb = f.astype(jnp.bfloat16)
    f_ref[:] = fb
    # Liveness at bf16 resolution — the exact semantics of the XLA pass this
    # replaces (objectives.matryoshka_loss reads the bf16 decode buffer).
    # Broadcast into an 8-row block: Mosaic rejects 1-row output blocks
    # ((8, 128) divisibility); callers reduce with sum(axis=0) > 0 anyway.
    live_ref[:] = jnp.broadcast_to(
        jnp.sum((fb != jnp.bfloat16(0)).astype(jnp.float32), axis=0, keepdims=True),
        live_ref.shape,
    )
    # L0 counts f != 0 (mask alone keeps boundary zeros when kth <= 0); L1 in
    # f32 row sums — both match the XLA formulations they replace bit-for-bit
    # up to reduction order (L0 is integer-valued, so exactly).
    l0_ref[:] = jnp.sum(
        (mask & (x != 0.0)).astype(jnp.float32), axis=1, keepdims=True
    )
    l1_ref[:] = jnp.sum(jnp.abs(f), axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def topk_stats_pallas(
    h: jax.Array, k: int, tile_rows: int | None = None, interpret: bool = False
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """(kth (B,1) f32, f (B,S) bf16, live_partial (8·B/tile, S) f32,
    l0 (B,1) f32, l1 (B,1) f32) — kth threshold plus TopK epilogue, one HBM
    pass.

    live_partial rows are per-row-tile counts of bf16-nonzero activations
    (each tile's count broadcast over an 8-row block — Mosaic's minimum
    output block); callers reduce over axis 0 (`live_partial.sum(0) > 0`).
    B must be a multiple of TILE_ROWS (callers pad).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from . import _mosaic

    b, s = h.shape
    assert h.dtype == jnp.float32
    assert b % TILE_ROWS == 0, f"batch {b} must be a multiple of {TILE_ROWS}"
    k = min(k, s)
    # 256-row tiles: the f32 input + bf16 output blocks double-buffer at
    # 2*(4+2)*tile*S bytes = 48 MB. 512-row tiles fail to compile at the
    # production shape (130.3 MB scoped VMEM > the 128 MB capacity — measured
    # round 5, input window alone is 64 MB double-buffered).
    tile = tile_rows or min(_tile_rows(b), 256)

    kth, f, live, l0, l1 = pl.pallas_call(
        functools.partial(_kernel_stats, k),
        out_shape=[
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, s), jnp.bfloat16),
            jax.ShapeDtypeStruct((8 * (b // tile), s), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
        ],
        grid=(b // tile,),
        in_specs=[
            pl.BlockSpec((tile, s), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=[
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),
            pl.BlockSpec((tile, s), lambda i: (i, 0)),
            pl.BlockSpec((8, s), lambda i: (i, 0)),
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _mosaic.vmem_params(tile, 0),
    )(h)
    return kth, f, live, l0, l1


# Order-preserving key of float32 -inf: bits(-inf)=0xFF800000 is negative, so
# key = ~bits = 0x007FFFFF. Masked-out columns take this key, making the
# masked kth bit-identical to kth over where(mask, x, -inf).
_KEY_NEG_INF = np.uint32(0x007FFFFF)


def _kernel_masked(k: int, x_ref, mask_ref, out_ref):
    x = x_ref[:]  # (TILE_ROWS, S) f32
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    neg = (u >> 31) == 1
    key = jnp.where(neg, ~u, u | jnp.uint32(0x80000000))
    key = jnp.where(mask_ref[:] != 0, key, jnp.uint32(_KEY_NEG_INF))

    kf = jnp.float32(k)

    def bit_step(i, cur):
        bit = jnp.uint32(1) << (jnp.uint32(31) - jnp.uint32(i))
        cand = cur | bit
        count = jnp.sum((key >= cand).astype(jnp.float32), axis=1, keepdims=True)
        return jnp.where(count >= kf, cand, cur)

    cur = jax.lax.fori_loop(
        0, 32, bit_step, jnp.zeros((x.shape[0], 1), jnp.uint32), unroll=32
    )
    was_nonneg = (cur >> 31) == 1
    bits = jnp.where(was_nonneg, cur & jnp.uint32(0x7FFFFFFF), ~cur)
    out_ref[:] = jax.lax.bitcast_convert_type(bits, jnp.float32)


@functools.partial(jax.jit, static_argnums=(2, 3))
def exact_kth_value_masked_pallas(
    h: jax.Array, mask: jax.Array, k: int, interpret: bool = False
) -> jax.Array:
    """Exact k-th largest of where(mask, h, -inf) along the last axis of
    (B, S) f32 WITHOUT materializing the masked tensor — mask (1, S) int32
    (shared across rows) is applied to the order keys in VMEM. Returns (B, 1);
    bit-identical to `exact_kth_value_pallas(where(mask, h, -inf), k)`.

    Used for the AuxK dead-latent threshold: the dead mask is per-latent, the
    batch is large, and the where(dead, h, -inf) materialization is pure HBM
    waste (nn/objectives._aux_loss).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, s = h.shape
    assert h.dtype == jnp.float32
    assert mask.shape == (1, s), mask.shape
    assert b % TILE_ROWS == 0, f"batch {b} must be a multiple of {TILE_ROWS}"
    k = min(k, s)
    tile = _tile_rows(b)

    return pl.pallas_call(
        functools.partial(_kernel_masked, k),
        out_shape=jax.ShapeDtypeStruct((b, 1), jnp.float32),
        grid=(b // tile,),
        in_specs=[
            pl.BlockSpec((tile, s), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0)),
        interpret=interpret,
        compiler_params=_vmem_params(tile, interpret),
    )(h, mask.astype(jnp.int32))


def kth_value_masked(h: jax.Array, mask: jax.Array, k: int) -> jax.Array:
    """Exact k-th largest of where(mask, h, -inf); mask is (S,) bool shared
    across rows. Pallas on TPU, lax.top_k on the materialized tensor
    elsewhere."""
    from . import shmap

    if (
        (jax.default_backend() != "tpu" and not shmap.INTERPRET)
        or h.ndim != 2
        or h.dtype != jnp.float32
    ):
        masked = jnp.where(mask[None, :], h, jnp.array(-jnp.inf, h.dtype))
        return jax.lax.top_k(masked, min(k, h.shape[-1]))[0][..., -1:]
    b = h.shape[0]
    quantum = TILE_ROWS * shmap.n_shards()
    pad = (-b) % quantum
    hp = jnp.pad(h, ((0, pad), (0, 0))) if pad else h
    call = shmap.shard_rows(
        lambda hh, mm: exact_kth_value_masked_pallas(hh, mm, k, shmap.INTERPRET),
        in_batch_dims=(0, None), out_batch_dims=(0,),
    )
    return call(hp, mask[None, :])[:b]
