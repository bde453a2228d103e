"""Prototype: group-OUTER grid for the fused Matryoshka forward kernel.

The production `grouped_prefix_err` walks grid (B/bm, G) with G innermost:
W_G blocks change every step, so the full W (64 MB bf16) is re-fetched per
row tile — 2 GB/kernel at production shape, the dominant HBM term
(docs/performance.md). Inverting the grid to (G, B/bm) with rows innermost
makes the W_G block index constant across inner steps (fetched once per
group: 64 MB total) at the cost of a persistent (B, D) f32 running-sum
scratch (64 MB VMEM — scratch persists across grid steps on TPU, and the
raised 100 MB scoped limit accommodates it at production shape).

Two further cuts fall out of the inversion:
- x is folded into the accumulator INIT (run = b_dec - x at G==0, DMA'd from
  HBM once per row tile), so emits need no x re-read and E_j = bf16(run +
  remainder) directly. f32 accumulation order changes ((bd - x) first instead
  of last), so results match to f32-noise, not bitwise.
- the second output becomes the FULL f32 error (xhat_nb + b_dec - x == the
  final accumulator) instead of xhat_nb; callers recover xhat_nb = err + x -
  b_dec (one fused XLA add) or use err directly as the AuxK residual.

Verifies numerics vs the production kernel at the bench shape, then times
both with the kprof device profiler.

Usage: python scripts/proto_gouter.py [--bm 256]
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


def _err_kernel_gouter(j_n, n_groups, m_ref, r_ref, f_ref, w_ref, x_hbm,
                       bd_ref, iu_ref, e_out_ref, err_ref, loss_ref,
                       run_ref, snap_ref, stage_ref, pend_ref, acc_ref,
                       sem, semx):
    gi = pl.program_id(0)
    ti = pl.program_id(1)
    bm = f_ref.shape[0]
    g = f_ref.shape[1]
    row0 = pl.multiple_of(ti * bm, bm)

    @pl.when((gi == 0) & (ti == 0))
    def _():
        pend_ref[0] = 0

    @pl.when(gi == 0)
    def _():
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(row0, bm), :], stage_ref, semx
        )
        cp.start()
        cp.wait()
        run_ref[pl.ds(row0, bm), :] = bd_ref[:] - stage_ref[:]
        acc_ref[ti] = 0.0

    def drain():
        @pl.when(pend_ref[0] != 0)
        def _():
            pltpu.make_async_copy(snap_ref, snap_ref, sem).wait()
            pend_ref[0] = 0

    def emit(j, base_f32):
        drain()
        eb = base_f32.astype(snap_ref.dtype)
        snap_ref[:] = eb
        acc_ref[ti] += jnp.sum((eb.astype(jnp.float32) * iu_ref[0, 0]) ** 2)
        pltpu.make_async_copy(
            snap_ref, e_out_ref.at[j, pl.ds(row0, bm), :], sem
        ).start()
        pend_ref[0] = 1

    lane = jax.lax.broadcasted_iota(jnp.int32, (bm, g), 1)
    for j in range(j_n):
        @pl.when(m_ref[j] == gi)
        def _():
            f_m = jnp.where(lane < r_ref[j], f_ref[:], jnp.zeros((), f_ref.dtype))
            emit(
                j,
                run_ref[pl.ds(row0, bm), :]
                + jnp.dot(f_m, w_ref[:], preferred_element_type=jnp.float32),
            )

    run_ref[pl.ds(row0, bm), :] += jnp.dot(
        f_ref[:], w_ref[:], preferred_element_type=jnp.float32
    )

    @pl.when(gi == n_groups - 1)
    def _():
        for j in range(j_n):
            @pl.when(m_ref[j] == n_groups)
            def _():
                emit(j, run_ref[pl.ds(row0, bm), :])
        drain()
        stage_ref[:] = run_ref[pl.ds(row0, bm), :]
        cp = pltpu.make_async_copy(
            stage_ref, err_ref.at[pl.ds(row0, bm), :], semx
        )
        cp.start()
        cp.wait()

    loss_ref[:] = jnp.full(loss_ref.shape, acc_ref[ti], jnp.float32)


def grouped_prefix_err_gouter(
    f_bf16, w_bf16, x, b_dec, inv_upper, m, r, *, group_size=1024,
    block_rows=256, interpret=False,
):
    """(e, err_full_f32, loss_partials): group-outer variant. err_full =
    xhat_nb + b_dec - x (the final accumulator) replaces xhat_nb."""
    b, d_sae = f_bf16.shape
    d_model = w_bf16.shape[1]
    g = group_size
    assert d_sae % g == 0
    n_groups = d_sae // g
    j_n = m.shape[0]
    bm = min(block_rows, b)
    assert b % bm == 0
    n_tiles = b // bm

    kernel = functools.partial(_err_kernel_gouter, j_n, n_groups)
    e, err, loss_p = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_groups, n_tiles),
            in_specs=[
                pl.BlockSpec((bm, g), lambda G, i, m, r: (i, G)),
                pl.BlockSpec((g, d_model), lambda G, i, m, r: (G, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((1, d_model), lambda G, i, m, r: (0, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((8, 128), lambda G, i, m, r: (i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((b, d_model), jnp.float32),
                pltpu.VMEM((bm, d_model), jnp.bfloat16),
                pltpu.VMEM((bm, d_model), jnp.float32),
                pltpu.SMEM((1,), jnp.int32),
                pltpu.SMEM((n_tiles,), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((j_n, b, d_model), jnp.bfloat16),
            jax.ShapeDtypeStruct((b, d_model), jnp.float32),
            jax.ShapeDtypeStruct((8 * n_tiles, 128), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ) if not interpret else None,
    )(
        m.astype(jnp.int32), r.astype(jnp.int32),
        f_bf16, w_bf16, x, b_dec.reshape(1, d_model),
        inv_upper.astype(jnp.float32).reshape(1, 1),
    )
    return e, err, loss_p


def main():
    from saev_tpu.ops import pallas_matryoshka as pk
    from kprof import device_profile, total_device_ms

    bm = 256
    if "--bm" in sys.argv:
        bm = int(sys.argv[sys.argv.index("--bm") + 1])

    B, S, D, G, J = 16384, 16384, 1024, 1024, 10
    rng = np.random.default_rng(0)
    f = rng.normal(size=(B, S)).astype(np.float32)
    f[f < 1.5] = 0.0
    f = jnp.asarray(f, jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(S, D)).astype(np.float32) * 0.02, jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    bd = jnp.asarray(rng.normal(size=(D,)).astype(np.float32) * 0.01)
    iu = jnp.float32(0.41)
    prefixes = np.sort(rng.choice(np.arange(1, S + 1), size=J, replace=False))
    prefixes[-1] = S  # full decode, like the objective
    m = jnp.asarray(prefixes // G, jnp.int32)
    r = jnp.asarray(prefixes - (prefixes // G) * G, jnp.int32)

    # --- numerics vs the production kernel ---
    e0, xhat0, lp0 = jax.jit(
        lambda *a: pk.grouped_prefix_err(*a, block_rows=bm)
    )(f, w, x, bd, iu, m, r)
    e1, err1, lp1 = jax.jit(
        lambda *a: grouped_prefix_err_gouter(*a, block_rows=bm)
    )(f, w, x, bd, iu, m, r)
    jax.block_until_ready(err1)

    e0n, e1n = np.asarray(e0, np.float32), np.asarray(e1, np.float32)
    mism = float(np.mean(e0n != e1n))
    rel = float(
        np.linalg.norm(e0n - e1n) / max(np.linalg.norm(e0n), 1e-30)
    )
    err_want = np.asarray(xhat0) + (np.asarray(bd) - np.asarray(x))
    err_rel = float(
        np.linalg.norm(np.asarray(err1) - err_want)
        / max(np.linalg.norm(err_want), 1e-30)
    )
    loss0 = float(np.asarray(lp0)[::8, 0].sum())
    loss1 = float(np.asarray(lp1)[::8, 0].sum())
    print(
        f"numerics: e mismatch frac {mism:.2e} rel {rel:.2e}; err rel "
        f"{err_rel:.2e}; loss {loss0:.6e} vs {loss1:.6e} "
        f"(rel {abs(loss0 - loss1) / abs(loss0):.2e})"
    )
    assert rel < 2e-3 and err_rel < 1e-5, "numerics FAIL"
    assert abs(loss0 - loss1) / abs(loss0) < 1e-4, "loss FAIL"

    # --- timing (device profiler; NOTES.md wall-clock traps) ---
    @jax.jit
    def step_prod(c, f_, w_, x_):
        f_ = f_ * (1 + jnp.asarray(1e-12 * c, f_.dtype))
        e, xh, lp = pk.grouped_prefix_err(f_, w_, x_, bd, iu, m, r, block_rows=bm)
        return lp.reshape(-1)[0]

    @jax.jit
    def step_gout(c, f_, w_, x_):
        f_ = f_ * (1 + jnp.asarray(1e-12 * c, f_.dtype))
        e, er, lp = grouped_prefix_err_gouter(
            f_, w_, x_, bd, iu, m, r, block_rows=bm
        )
        return lp.reshape(-1)[0]

    for name, fn in (("prod", step_prod), ("gouter", step_gout)):
        rows = device_profile(fn, (f, w, x))
        ms = total_device_ms(rows, lambda nm: "custom" in nm or "tpu" in nm.lower())
        top = rows[0]
        print(f"{name:7s} bm={bm}: {ms:6.2f} ms kernel (top {top[1]:.2f} {top[0][:40]})")


if __name__ == "__main__":
    main()
