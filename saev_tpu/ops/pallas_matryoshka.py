"""Pallas grouped-prefix decode: the Matryoshka hot path without HBM blowup.

The Matryoshka objective needs, per ascending prefix p_j, the partial
reconstruction base_j = f[:, :floor(p_j/g)*g] @ W[:...] (the remainder lanes
are cheap XLA matmuls). XLA's implementations of this (batched einsum or
static-slice matmuls + mask einsum) materialize bf16 conversions and
relayouts of every (B, G, D) intermediate — ~29 GB of HBM traffic for the
fwd+bwd at production shape (measured via cost_analysis), ~57 ms/step.

`grouped_prefix_base` keeps the per-group running sum in VMEM: grid
(B/bm, G) with G innermost; each step does one (bm, g) @ (g, D) MXU matmul
into a running-sum scratch, and snapshots the running sum into base[:, j]
via an async DMA when group index == m_j (predicated on SMEM scalars — the
prefix cuts are traced values, never shapes). The (B, G, D) partials tensor
never exists; HBM traffic is f (bf16) + W (bf16, re-read per row tile) +
base (f32, written once) ≈ 2.2 GB.

The backward uses the same kernel shape twice (see ops/matryoshka.py):
  dA_G = sum_j [G < m_j] Ebar_j   (small XLA contraction)
  df_G = dA_G @ W_G^T + remainder scatter   -> `grouped_matmul_dgrad`
  dW_G = f_G^T @ dA_G + remainder scatter   -> `grouped_matmul_wgrad`
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _base_kernel(j_n, n_groups, m_ref, f_ref, w_ref, base_ref, xhat_ref,
                 run_ref, sem):
    """One (row-tile, group) step: run += f_G @ W_G; snapshot run into
    base[:, j] when this group is prefix j's cut group."""
    gi = pl.program_id(1)
    bm = f_ref.shape[0]
    row0 = pl.multiple_of(pl.program_id(0) * bm, bm)

    @pl.when(gi == 0)
    def _():
        run_ref[:] = jnp.zeros_like(run_ref)

    # Snapshot BEFORE adding this group: base_j = sum of groups < m_j.
    # base is laid out (J, B, D) so the DMA slices the untiled major dim.
    for j in range(j_n):
        @pl.when(m_ref[j] == gi)
        def _():
            copy = pltpu.make_async_copy(
                run_ref, base_ref.at[j, pl.ds(row0, bm), :], sem
            )
            copy.start()
            copy.wait()

    run_ref[:] += jnp.dot(f_ref[:], w_ref[:], preferred_element_type=jnp.float32)

    @pl.when(gi == n_groups - 1)
    def _():
        xhat_ref[:] = run_ref[:]
        for j in range(j_n):
            @pl.when(m_ref[j] == n_groups)
            def _():
                copy = pltpu.make_async_copy(
                    run_ref, base_ref.at[j, pl.ds(row0, bm), :], sem
                )
                copy.start()
                copy.wait()


def grouped_prefix_base(
    f_bf16: Array, w_bf16: Array, m: Array, *, group_size: int = 1024,
    block_rows: int = 512, interpret: bool = False,
) -> tuple[Array, Array]:
    """(base, xhat_nobias): base[j, b] = f[b, :m_j*g] @ W[:m_j*g] laid out
    (J, B, D); xhat_nobias is the full (all-groups) product. f/w must be
    bf16; accumulation is f32.

    m: (J,) int32 cut group indices (prefix // group_size), values in
    [0, n_groups]. Traced data, static length.
    """
    b, d_sae = f_bf16.shape
    d_model = w_bf16.shape[1]
    g = group_size
    assert d_sae % g == 0
    n_groups = d_sae // g
    j_n = m.shape[0]
    bm = min(block_rows, b)
    assert b % bm == 0

    kernel = functools.partial(_base_kernel, j_n, n_groups)
    base, xhat = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b // bm, n_groups),
            in_specs=[
                pl.BlockSpec((bm, g), lambda i, G, m: (i, G)),
                pl.BlockSpec((g, d_model), lambda i, G, m: (G, 0)),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((bm, d_model), lambda i, G, m: (i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((bm, d_model), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((j_n, b, d_model), jnp.float32),
            jax.ShapeDtypeStruct((b, d_model), jnp.float32),
        ],
        interpret=interpret,
    )(m.astype(jnp.int32), f_bf16, w_bf16)
    return base, xhat


def _dgrad_kernel(da_ref, w_ref, dfrem_ref, df_ref):
    """df[:, G] = dA_G @ W_G^T + dfrem_G (one (bm, D) x (D, g) MXU step)."""
    df_ref[:] = (
        jax.lax.dot_general(
            da_ref[0], w_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + dfrem_ref[0].astype(jnp.float32)
    )


def grouped_matmul_dgrad(
    da_gbd: Array, w_bf16: Array, dfrem_gbg: Array, *, group_size: int = 1024,
    block_rows: int = 512, interpret: bool = False,
) -> Array:
    """df (B, d_sae) f32 from group cotangents dA (G, B, D) bf16, weights
    (d_sae, D) bf16, and the remainder scatter dfrem (G, B, g) bf16."""
    n_groups, b, d_model = da_gbd.shape
    g = group_size
    d_sae = n_groups * g
    bm = min(block_rows, b)
    assert b % bm == 0

    return pl.pallas_call(
        _dgrad_kernel,
        grid=(b // bm, n_groups),
        in_specs=[
            pl.BlockSpec((1, bm, d_model), lambda i, G: (G, i, 0)),
            pl.BlockSpec((g, d_model), lambda i, G: (G, 0)),
            pl.BlockSpec((1, bm, g), lambda i, G: (G, i, 0)),
        ],
        out_specs=pl.BlockSpec((bm, g), lambda i, G: (i, G)),
        out_shape=jax.ShapeDtypeStruct((b, d_sae), jnp.float32),
        interpret=interpret,
    )(da_gbd, w_bf16, dfrem_gbg)


def _wgrad_kernel(f_ref, da_ref, dw_ref):
    """dW_G += f_G^T @ dA_G, accumulated over row tiles (b innermost)."""
    bi = pl.program_id(1)
    prod = jax.lax.dot_general(
        f_ref[:], da_ref[0],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(bi == 0)
    def _():
        dw_ref[:] = prod

    @pl.when(bi != 0)
    def _():
        dw_ref[:] += prod


def grouped_matmul_wgrad(
    f_bf16: Array, da_gbd: Array, *, group_size: int = 1024,
    block_rows: int = 256, interpret: bool = False,
) -> Array:
    # block_rows=256: the double-buffered (g, D) f32 output block costs 8 MB
    # of VMEM; 512-row input tiles push the total past the 16 MB budget.
    """dW (d_sae, D) f32 = per-group f_G^T @ dA_G (remainder scatter added by
    the caller)."""
    n_groups, b, d_model = da_gbd.shape
    g = group_size
    bm = min(block_rows, b)
    assert b % bm == 0

    return pl.pallas_call(
        _wgrad_kernel,
        grid=(n_groups, b // bm),
        in_specs=[
            pl.BlockSpec((bm, g), lambda G, i: (i, G)),
            pl.BlockSpec((1, bm, d_model), lambda G, i: (G, i, 0)),
        ],
        out_specs=pl.BlockSpec((g, d_model), lambda G, i: (G, 0)),
        out_shape=jax.ShapeDtypeStruct((n_groups * g, d_model), jnp.float32),
        interpret=interpret,
    )(f_bf16, da_gbd)
