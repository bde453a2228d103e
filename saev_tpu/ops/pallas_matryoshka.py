"""Pallas grouped-prefix decode: the Matryoshka hot path without HBM blowup.

The Matryoshka objective needs, per ascending prefix p_j, the partial
reconstruction base_j = f[:, :floor(p_j/g)*g] @ W[:...] (the remainder lanes
are cheap XLA matmuls). XLA's implementations of this (batched einsum or
static-slice matmuls + mask einsum) materialize bf16 conversions and
relayouts of every (B, G, D) intermediate — ~29 GB of HBM traffic for the
fwd+bwd at production shape (measured via cost_analysis), ~57 ms/step.

`grouped_prefix_err` (the production forward) keeps the per-group running
sum in VMEM: grid (B/bm, G) with G innermost; each step does one
(bm, g) @ (g, D) MXU matmul into a running-sum scratch, and when group
index == m_j (predicated on SMEM scalars — the prefix cuts are traced
values, never shapes) snapshots E_j = bf16(base_j + b_dec − x) via an async
DMA while accumulating the scale-stabilized squared-error partial in SMEM.
The (B, G, D) partials tensor never exists and E is written exactly once;
HBM traffic is f (bf16) + W (bf16, re-read per row tile) + x (f32) +
E (bf16, written once) ≈ 1.9 GB. `grouped_prefix_base` is the same kernel
without the error epilogue (kept for kernel-level tests/benches).

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


def _compiler_params(bm: int):
    """Mosaic scoped-VMEM limit for a given row-tile size: the 1024-row
    tiles that cut W re-read traffic 4x need ~24-44 MB of scoped allocation
    vs the 16 MB default (shared policy: ops/_mosaic.py)."""
    from . import _mosaic

    return _mosaic.vmem_params(bm, 256)


def _base_kernel(j_n, n_groups, m_ref, r_ref, f_ref, w_ref, base_ref, xhat_ref,
                 run_ref, snap_ref, pend_ref, sem):
    """One (row-tile, group) step: snapshot base_j = run + (lane-masked f_G) @ W_G
    for every prefix j cutting inside this group (the remainder matmul folded in
    — f/W tiles are already in VMEM, so the sub-group term costs one extra
    predicated MXU pass and ZERO extra HBM traffic), then run += f_G @ W_G.

    Snapshot DMAs are DEFERRED: each copy starts and is only awaited right
    before the snap buffer is next overwritten (pend_ref tracks the
    outstanding copy) or at the row tile's last group step — the 1 MB
    VMEM→HBM write overlaps the following MXU passes instead of stalling
    them (~640 serialized waits per call at production shape otherwise)."""
    gi = pl.program_id(1)
    bm = f_ref.shape[0]
    g = f_ref.shape[1]
    row0 = pl.multiple_of(pl.program_id(0) * bm, bm)

    @pl.when(gi == 0)
    def _():
        run_ref[:] = jnp.zeros_like(run_ref)
        pend_ref[0] = 0

    def drain():
        @pl.when(pend_ref[0] != 0)
        def _():
            pltpu.make_async_copy(snap_ref, snap_ref, sem).wait()
            pend_ref[0] = 0

    # base_j = sum of groups < m_j  +  masked remainder within group m_j.
    # base is laid out (J, B, D) so the DMA slices the untiled major dim.
    lane = jax.lax.broadcasted_iota(jnp.int32, (bm, g), 1)
    for j in range(j_n):
        @pl.when(m_ref[j] == gi)
        def _():
            drain()
            f_m = jnp.where(lane < r_ref[j], f_ref[:], jnp.zeros((), f_ref.dtype))
            snap_ref[:] = (
                run_ref[:]
                + jnp.dot(f_m, w_ref[:], preferred_element_type=jnp.float32)
            ).astype(snap_ref.dtype)
            pltpu.make_async_copy(
                snap_ref, base_ref.at[j, pl.ds(row0, bm), :], sem
            ).start()
            pend_ref[0] = 1

    run_ref[:] += jnp.dot(f_ref[:], w_ref[:], preferred_element_type=jnp.float32)

    @pl.when(gi == n_groups - 1)
    def _():
        xhat_ref[:] = run_ref[:]
        for j in range(j_n):
            @pl.when(m_ref[j] == n_groups)
            def _():
                drain()
                snap_ref[:] = run_ref[:].astype(snap_ref.dtype)
                pltpu.make_async_copy(
                    snap_ref, base_ref.at[j, pl.ds(row0, bm), :], sem
                ).start()
                pend_ref[0] = 1
        drain()


def grouped_prefix_base(
    f_bf16: Array, w_bf16: Array, m: Array, r: Array, *, group_size: int = 1024,
    block_rows: int = 256, base_dtype=jnp.float32, interpret: bool = False,
) -> tuple[Array, Array]:
    """(base, xhat_nobias): base[j, b] = f[b, :p_j] @ W[:p_j] — the FULL
    prefix product including the sub-group remainder — laid out (J, B, D);
    xhat_nobias is the full (all-groups) product. f/w must be bf16;
    accumulation is f32.

    m: (J,) int32 cut group indices (prefix // group_size) in [0, n_groups];
    r: (J,) int32 in-group remainders (prefix - m*group_size). Traced data,
    static length.
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
            num_scalar_prefetch=2,
            grid=(b // bm, n_groups),
            in_specs=[
                pl.BlockSpec((bm, g), lambda i, G, m, r: (i, G)),
                pl.BlockSpec((g, d_model), lambda i, G, m, r: (G, 0)),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((bm, d_model), lambda i, G, m, r: (i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((bm, d_model), jnp.float32),
                pltpu.VMEM((bm, d_model), base_dtype),
                pltpu.SMEM((1,), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((j_n, b, d_model), base_dtype),
            jax.ShapeDtypeStruct((b, d_model), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_compiler_params(bm),
    )(m.astype(jnp.int32), r.astype(jnp.int32), f_bf16, w_bf16)
    return base, xhat


def _err_kernel(j_n, n_groups, m_ref, r_ref, f_ref, w_ref, x_ref, bd_ref,
                iu_ref, e_out_ref, xhat_ref, loss_ref, run_ref, snap_ref,
                pend_ref, acc_ref, sem):
    """`_base_kernel` with the error epilogue folded in: each snapshot emits
    E_j = bf16(base_j + b_dec - x) instead of base_j, and the scale-stabilized
    squared-error partial sum Σ (E_j · inv_upper)² accumulates in SMEM across
    the row tile's snapshots (emitted once at the last group step). This
    removes the two XLA follow-up passes over the (J, B, D) tensor — the
    e-assembly fusion (1.2 ms) and the loss reduction (0.4 ms) at production
    shape — and E never exists in f32 form in HBM."""
    gi = pl.program_id(1)
    bm = f_ref.shape[0]
    g = f_ref.shape[1]
    row0 = pl.multiple_of(pl.program_id(0) * bm, bm)

    @pl.when(gi == 0)
    def _():
        run_ref[:] = jnp.zeros_like(run_ref)
        pend_ref[0] = 0
        acc_ref[0] = 0.0

    def drain():
        @pl.when(pend_ref[0] != 0)
        def _():
            pltpu.make_async_copy(snap_ref, snap_ref, sem).wait()
            pend_ref[0] = 0

    def emit(j, base_f32):
        drain()
        # base here is FULL f32 (no intermediate bf16 rounding of base_j —
        # strictly tighter than the two-pass formulation it replaces).
        eb = (base_f32 + (bd_ref[:] - x_ref[:])).astype(snap_ref.dtype)
        snap_ref[:] = eb
        acc_ref[0] += jnp.sum((eb.astype(jnp.float32) * iu_ref[0, 0]) ** 2)
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
                run_ref[:]
                + jnp.dot(f_m, w_ref[:], preferred_element_type=jnp.float32),
            )

    run_ref[:] += jnp.dot(f_ref[:], w_ref[:], preferred_element_type=jnp.float32)

    @pl.when(gi == n_groups - 1)
    def _():
        xhat_ref[:] = run_ref[:]
        for j in range(j_n):
            @pl.when(m_ref[j] == n_groups)
            def _():
                emit(j, run_ref[:])
        drain()
        # One scalar per row tile, broadcast over the (8, 128) minimum output
        # block; the caller reads [::8, 0].
        loss_ref[:] = jnp.full(loss_ref.shape, acc_ref[0], jnp.float32)


def grouped_prefix_err(
    f_bf16: Array, w_bf16: Array, x: Array, b_dec: Array, inv_upper: Array,
    m: Array, r: Array, *, group_size: int = 1024, block_rows: int = 256,
    interpret: bool = False,
) -> tuple[Array, Array, Array]:
    """(e, xhat_nobias, loss_partials): the grouped prefix decode with the
    Matryoshka error epilogue fused in. e[j] = bf16(f @ W[:p_j] + b_dec - x)
    laid out (J, B, D); xhat_nobias (B, D) f32 is the full product;
    loss_partials ((8·B/bm, 128) f32) carries one Σ (e·inv_upper)² partial
    per row tile at [::8, 0] — total loss = partials[::8, 0].sum() / (J·B·D)
    / inv_upper² (ops/matryoshka.py applies the scale-stabilized form)."""
    b, d_sae = f_bf16.shape
    d_model = w_bf16.shape[1]
    g = group_size
    assert d_sae % g == 0
    n_groups = d_sae // g
    j_n = m.shape[0]
    bm = min(block_rows, b)
    assert b % bm == 0

    kernel = functools.partial(_err_kernel, j_n, n_groups)
    e, xhat, loss_p = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b // bm, n_groups),
            in_specs=[
                pl.BlockSpec((bm, g), lambda i, G, m, r: (i, G)),
                pl.BlockSpec((g, d_model), lambda i, G, m, r: (G, 0)),
                pl.BlockSpec((bm, d_model), lambda i, G, m, r: (i, 0)),
                pl.BlockSpec((1, d_model), lambda i, G, m, r: (0, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((bm, d_model), lambda i, G, m, r: (i, 0)),
                pl.BlockSpec((8, 128), lambda i, G, m, r: (i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((bm, d_model), jnp.float32),
                pltpu.VMEM((bm, d_model), jnp.bfloat16),
                pltpu.SMEM((1,), jnp.int32),
                pltpu.SMEM((1,), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((j_n, b, d_model), jnp.bfloat16),
            jax.ShapeDtypeStruct((b, d_model), jnp.float32),
            jax.ShapeDtypeStruct((8 * (b // bm), 128), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_compiler_params(bm),
    )(
        m.astype(jnp.int32), r.astype(jnp.int32),
        f_bf16, w_bf16, x, b_dec.reshape(1, d_model),
        inv_upper.astype(jnp.float32).reshape(1, 1),
    )
    return e, xhat, loss_p


def _dgrad_kernel(j_n, n_groups, m_ref, r_ref, w_ref, e_ref, scale_ref,
                  df_ref, da_ref, run_ref, esl_ref, holds_ref, sem):
    """df[:, G] = dA_G @ W_G^T + sum_j [m_j == G] [lane < r_j] (scale * E_j) @ W_G^T,
    with dA_G = scale * sum_j [G < m_j] E_j built IN-KERNEL and emitted as a
    second output for the wgrad kernel.

    Grid is (B/bm, G') with G' walking groups in DESCENDING order: per row
    tile a VMEM f32 accumulator carries the E-suffix, each group step folds
    in the E_j rows whose cut sits one group above (m_j == G+1), snapshots
    dA_G, and consumes it for df while it is still in VMEM. The XLA-side
    alternative (einsum + relayout copy + HBM round-trip of dA into this
    kernel) costs ~3.7 ms/step at production shape (profiled); here dA's
    production is one DMA'd E pass and its df-side consumption never touches
    HBM."""
    gp = pl.program_id(1)
    bm = df_ref.shape[0]
    g = df_ref.shape[1]
    row0 = pl.multiple_of(pl.program_id(0) * bm, bm)
    g_cur = n_groups - 1 - gp  # descending group index

    @pl.when(gp == 0)
    def _():
        run_ref[:] = jnp.zeros_like(run_ref)
        holds_ref[0] = -1  # esl content is from the previous row tile

    def load(j):
        """DMA E_j's row slice into esl unless it is already there: the
        descending walk uses each slice twice in consecutive steps (the
        remainder term at m_j == G, then the suffix entry at m_j == G+1), so
        tracking the resident j halves the E traffic and its serialized
        DMA waits."""
        @pl.when(holds_ref[0] != j)
        def _():
            copy = pltpu.make_async_copy(
                e_ref.at[j, pl.ds(row0, bm), :], esl_ref, sem
            )
            copy.start()
            copy.wait()
            holds_ref[0] = j

    # Suffix update: prefixes cutting at the group boundary above this one
    # (m_j == G+1; m_j == n_groups is the full-decode prefix) enter dA here.
    for j in range(j_n):
        @pl.when(m_ref[j] == g_cur + 1)
        def _():
            load(j)
            run_ref[:] += esl_ref[:].astype(jnp.float32)

    da = (run_ref[:] * scale_ref[0, 0]).astype(da_ref.dtype)
    da_ref[:] = da
    df_ref[:] = jax.lax.dot_general(
        da, w_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(df_ref.dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (bm, g), 1)
    for j in range(j_n):
        @pl.when(m_ref[j] == g_cur)
        def _():
            load(j)
            prod = jax.lax.dot_general(
                esl_ref[:], w_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # Accumulate through the output ref; for a bf16 df this rounds
            # twice on the <= J cut-group blocks only (the consumer casts to
            # bf16 regardless — DEFAULT-precision matmul operands).
            df_ref[:] = (
                df_ref[:].astype(jnp.float32)
                + jnp.where(lane < r_ref[j], prod * scale_ref[0, 0], 0.0)
            ).astype(df_ref.dtype)


def grouped_matmul_dgrad(
    w_bf16: Array, e_jbd: Array, m: Array, r: Array,
    scale: Array, *, group_size: int = 1024, block_rows: int = 256,
    df_dtype=jnp.float32, interpret: bool = False,
) -> tuple[Array, Array]:
    """(df, dA): df (B, d_sae) in `df_dtype` and the group cotangent dA
    (B, G, D) bf16 — dA_G = scale * sum_j [G < m_j] E_j — both built from the
    weights (d_sae, D) bf16 and the per-prefix error tensor E (J, B, D) bf16.
    The per-prefix remainder contribution (scaled by the f32 scalar `scale`)
    is folded into df. dA is emitted batch-major for `grouped_matmul_wgrad`."""
    b = e_jbd.shape[1]
    d_model = w_bf16.shape[1]
    g = group_size
    d_sae = w_bf16.shape[0]
    assert d_sae % g == 0, (d_sae, g)  # grid covers (d_sae//g)*g columns
    n_groups = d_sae // g
    bm = min(block_rows, b)
    assert b % bm == 0
    j_n = e_jbd.shape[0]

    kernel = functools.partial(_dgrad_kernel, j_n, n_groups)
    df, da2d = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b // bm, n_groups),
            in_specs=[
                pl.BlockSpec(
                    (g, d_model), lambda i, Gp, m, r: (n_groups - 1 - Gp, 0)
                ),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec(
                    (bm, g), lambda i, Gp, m, r: (i, n_groups - 1 - Gp)
                ),
                # dA as a 2D (B, G*D) view: a (bm, 1, D) block of (B, G, D)
                # violates the (8, 128)-divisibility rule on the middle dim.
                pl.BlockSpec(
                    (bm, d_model), lambda i, Gp, m, r: (i, n_groups - 1 - Gp)
                ),
            ],
            scratch_shapes=[
                pltpu.VMEM((bm, d_model), jnp.float32),
                pltpu.VMEM((bm, d_model), e_jbd.dtype),
                pltpu.SMEM((1,), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, d_sae), df_dtype),
            jax.ShapeDtypeStruct((b, n_groups * d_model), e_jbd.dtype),
        ],
        interpret=interpret,
        compiler_params=_compiler_params(bm),
    )(
        m.astype(jnp.int32), r.astype(jnp.int32),
        w_bf16, e_jbd, scale.astype(jnp.float32).reshape(1, 1),
    )
    return df, da2d.reshape(b, n_groups, d_model)


def _wgrad_kernel(j_n, m_ref, r_ref, f_ref, da_ref, e_ref, scale_ref, dw_ref,
                  esl_ref, sem):
    """dW_G += f_G^T @ dA_G + sum_j [m_j == G] ([lane < r_j] f_G)^T @ (scale E_j),
    accumulated over row tiles (b innermost)."""
    gi = pl.program_id(0)
    bi = pl.program_id(1)
    bm = f_ref.shape[0]
    g = f_ref.shape[1]
    row0 = pl.multiple_of(bi * bm, bm)

    prod = jax.lax.dot_general(
        f_ref[:], da_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(bi == 0)
    def _():
        dw_ref[:] = prod

    @pl.when(bi != 0)
    def _():
        dw_ref[:] += prod

    lane = jax.lax.broadcasted_iota(jnp.int32, (bm, g), 1)
    for j in range(j_n):
        @pl.when(m_ref[j] == gi)
        def _():
            copy = pltpu.make_async_copy(
                e_ref.at[j, pl.ds(row0, bm), :], esl_ref, sem
            )
            copy.start()
            copy.wait()
            f_m = jnp.where(lane < r_ref[j], f_ref[:], jnp.zeros((), f_ref.dtype))
            rem = jax.lax.dot_general(
                f_m, esl_ref[:],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dw_ref[:] += rem * scale_ref[0, 0]


def grouped_matmul_wgrad(
    f_bf16: Array, da_bgd: Array, e_jbd: Array, m: Array, r: Array,
    scale: Array, *, group_size: int = 1024, block_rows: int = 256,
    interpret: bool = False,
) -> Array:
    # block_rows=256: the double-buffered (g, D) f32 output block costs 8 MB
    # of VMEM; 512-row input tiles push the total past the 16 MB budget.
    """dW (d_sae, D) f32 = per-group f_G^T @ dA_G with the per-prefix
    remainder term (from E (J, B, D) bf16, scaled by `scale`) folded in.
    dA is batch-major (B, G, D) — see grouped_matmul_dgrad."""
    b, n_groups, d_model = da_bgd.shape
    g = group_size
    bm = min(block_rows, b)
    assert b % bm == 0
    j_n = e_jbd.shape[0]

    kernel = functools.partial(_wgrad_kernel, j_n)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_groups, b // bm),
            in_specs=[
                pl.BlockSpec((bm, g), lambda G, i, m, r: (i, G)),
                # da flattened (B, G*D); see grouped_matmul_dgrad.
                pl.BlockSpec((bm, d_model), lambda G, i, m, r: (i, G)),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((g, d_model), lambda G, i, m, r: (G, 0)),
            scratch_shapes=[
                pltpu.VMEM((bm, d_model), e_jbd.dtype),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_groups * g, d_model), jnp.float32),
        interpret=interpret,
        compiler_params=_compiler_params(bm),
    )(
        m.astype(jnp.int32), r.astype(jnp.int32),
        f_bf16, da_bgd.reshape(b, n_groups * d_model), e_jbd,
        scale.astype(jnp.float32).reshape(1, 1),
    )
