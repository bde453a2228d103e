"""Fused Matryoshka prefix-MSE with a hand-derived backward pass.

The training objective needs `mean_j mean_bd (xhat_j - x)^2` over J ascending
latent prefixes (reference objectives.py:101-156 decodes every prefix then
averages). Autodiffing the grouped decode (modeling.decode) costs ~57 ms
fwd+bwd at the production shape — ~29 GB of HBM traffic (cost_analysis): the
backward re-materializes the (B, G, D) partials, scatters ten dynamic-slice
remainder gradients through 1 GB dynamic-update-slices, and every einsum
materializes bf16 conversions/relayouts of its operands.

This op computes the same scalar with a custom VJP in two flavors:

- **Pallas path (TPU)**: `pallas_matryoshka.grouped_prefix_err` keeps the
  per-group running sum in VMEM and snapshots E_j = bf16(base_j + b_dec − x)
  via predicated DMA, accumulating the scale-stabilized squared-error
  partials in SMEM — the (B, G, D) partials never exist and the (J, B, D)
  error tensor is written exactly once (no XLA e-assembly or loss-reduce
  re-read). The backward's key identity:
  with Ebar_j = 2/(B J D) (xhat_j - x), the group-path cotangent
  dA_G = sum_j [G < m_j] Ebar_j serves BOTH parameter gradients:
      df_G = dA_G @ W_G^T + remainder term   (grouped_matmul_dgrad)
      dW_G = f_G^T @ dA_G + remainder term   (grouped_matmul_wgrad)
  Remainder (sub-group) terms are folded INTO all three kernels as
  predicated extra MXU passes on tiles already resident in VMEM (the
  backward kernels DMA the matching E_j row slice from HBM on demand) —
  no XLA-side dynamic-slice matmuls or one-hot scatter einsums. E is saved
  bf16; f/W are consumed bf16 (matching the train step's DEFAULT matmul
  precision).
- **XLA path (CPU / fallback)**: the same algebra with static-slice matmuls,
  f32 end-to-end, used on non-TPU backends and by parity tests.

The second output is the FULL reconstruction xhat_J (the last prefix is
always d_sae) for AuxK's stop-gradient residual; its cotangent is ignored by
the VJP, so callers MUST treat it as non-differentiable (matryoshka_loss
wraps it in stop_gradient immediately).

Measured (v5e, batch 16384, d_model 1024, d_sae 16384, J=10): see
docs/performance.md; gradients agree with autodiff-through-decode to bf16
matmul noise (~1e-3 at DEFAULT; the XLA path to ~1e-5 at HIGHEST).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_BF16 = jnp.bfloat16


def _use_pallas(b: int | None = None) -> bool:
    """The Pallas path needs a real TPU backend (Mosaic; or the interpreter
    under the `shmap.INTERPRET` test hook); CPU tests and the virtual-device
    mesh fall back to the XLA custom-VJP path. The kernels tile rows in
    256-row blocks, so odd batch sizes also fall back (production batches are
    powers of two; the XLA path is correct for any shape). Under an active
    `shmap` batch-sharding context the tiling constraint applies to the
    PER-SHARD row count (each shard runs the kernel on its slice)."""
    from . import shmap

    if jax.default_backend() != "tpu" and not shmap.INTERPRET:
        return False
    if b is None:
        return True
    ns = shmap.n_shards()
    if b % ns:
        return False
    local = b // ns
    # Interpret mode (CPU tests) has no Mosaic block constraints; 8-row
    # granularity keeps the BlockSpecs valid at tiny test shapes.
    return local % (8 if shmap.INTERPRET else 256) == 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def prefix_mse(
    w_dec: Array,
    b_dec: Array,
    f_x: Array,
    x: Array,
    prefixes: Array,
    group_size: int = 1024,
    precision=None,
) -> tuple[Array, Array]:
    """(scale-stabilized mean prefix MSE, full reconstruction).

    Args:
        w_dec: (d_sae, d_model); d_sae must divide by group_size.
        b_dec: (d_model,)
        f_x: (batch, d_sae) post-activation latents.
        x: (batch, d_model) targets. Non-differentiable.
        prefixes: (J,) ascending int32 cut points, last == d_sae. Traced
            values, static length.
    """
    loss, xhat_full, _ = _fwd_impl(w_dec, b_dec, f_x, x, prefixes, group_size, precision)
    return loss, xhat_full


def _rem_matmuls(f, w_dec, m, r, g, precision, out_dtype=jnp.float32):
    """rem_j = (lane-masked f[:, m_j g:]) @ W[m_j g:] -> (J, B, D)."""
    b = f.shape[0]
    d_model = w_dec.shape[1]
    lane = jnp.arange(g, dtype=jnp.int32)
    rems = []
    for j in range(m.shape[0]):
        f_m = jax.lax.dynamic_slice(f, (0, m[j] * g), (b, g))
        w_m = jax.lax.dynamic_slice(w_dec, (m[j] * g, 0), (g, d_model))
        rem = jnp.dot(
            jnp.where(lane < r[j], f_m, jnp.zeros((), f.dtype)),
            w_m,
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        rems.append(rem.astype(out_dtype))
    return jnp.stack(rems)


def _loss_from_e(e: Array, x: Array) -> Array:
    """Scale-stabilized reduction (reference objectives.py:224-237)."""
    upper = jnp.maximum(jnp.max(jnp.abs(x)), 1e-12)
    return jnp.mean((e.astype(jnp.float32) / upper) ** 2) * upper * upper


def _fwd_impl(w_dec, b_dec, f_x, x, prefixes, group_size, precision):
    b, d_sae = f_x.shape
    g = min(group_size, d_sae)
    assert d_sae % g == 0, (d_sae, g)
    n_groups = d_sae // g
    p32 = prefixes.astype(jnp.int32)
    m = p32 // g
    r = p32 - m * g

    if _use_pallas(b):
        from . import pallas_matryoshka as pk
        from . import shmap

        fb = f_x.astype(_BF16)
        wb = w_dec.astype(_BF16)
        # One kernel pass emits E_j = bf16(base_j + b_dec - x) directly plus
        # per-row-tile squared-error partials — the e-assembly fusion and the
        # loss reduction never re-read the (J, B, D) tensor from HBM
        # (1.6 ms/step at production shape, profiled round 5). upper is the
        # scale stabilizer of `_loss_from_e`; its max runs over the GLOBAL x
        # (outside the shard_map region, so GSPMD inserts the cross-shard
        # max under data sharding). Row-parallel under batch sharding: each
        # shard decodes its rows with the replicated weights.
        upper = jnp.maximum(jnp.max(jnp.abs(x)), 1e-12)
        err_call = shmap.shard_rows(
            lambda ff, ww, xx, bd, iu, mm, rr: pk.grouped_prefix_err(
                ff, ww, xx, bd, iu, mm, rr, group_size=g,
                interpret=shmap.INTERPRET,
            ),
            in_batch_dims=(0, None, 0, None, None, None, None),
            out_batch_dims=(1, 0, 0),
        )
        e, xhat_nb, loss_p = err_call(fb, wb, x, b_dec, 1.0 / upper, m, r)
        j_n = m.shape[0]
        loss = (
            loss_p[::8, 0].sum() / (j_n * b * x.shape[1]) * upper * upper
        )
        # Zero-size dtype marker: the df cotangent must match the PRIMAL f_x
        # dtype (bf16 when the TopK stats kernel feeds pre-cast latents, f32
        # otherwise).
        return loss, xhat_nb + b_dec, (fb, wb, e, m, r, jnp.zeros((0,), f_x.dtype))

    # XLA path: f32 static-slice matmuls (same algebra, autodiff-grade).
    parts = [
        jnp.dot(
            f_x[:, i * g : (i + 1) * g],
            w_dec[i * g : (i + 1) * g],
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        for i in range(n_groups)
    ]
    a = jnp.stack(parts, axis=0)  # (G, B, D)
    xhat_full = a.sum(axis=0) + b_dec
    mask = (
        jnp.arange(n_groups, dtype=jnp.int32)[:, None] < m[None, :]
    ).astype(jnp.float32)  # (G, J)
    base = jnp.einsum(
        "Gbd,GJ->Jbd", a, mask, preferred_element_type=jnp.float32,
        precision=precision,
    )
    rem = _rem_matmuls(f_x, w_dec, m, r, g, precision)
    e = base + rem + (b_dec - x)[None]
    loss = _loss_from_e(e, x)
    return loss, xhat_full, (f_x, w_dec, e, m, r, jnp.zeros((0,), f_x.dtype))


def _fwd(w_dec, b_dec, f_x, x, prefixes, group_size, precision):
    loss, xhat_full, res = _fwd_impl(
        w_dec, b_dec, f_x, x, prefixes, group_size, precision
    )
    return (loss, xhat_full), res


def _bwd(group_size, precision, res, cts):
    f, w, e, m, r, fdt = res  # f/w/e bf16 on the Pallas path, f32 on the XLA path
    t_loss, _t_xhat = cts  # xhat_full cotangent intentionally dropped (module doc)

    j_n, b, d_model = e.shape
    d_sae = f.shape[1]
    g = min(group_size, d_sae)
    n_groups = d_sae // g
    scale = t_loss * 2.0 / (b * j_n * d_model)

    db_dec = jnp.einsum("jbd->d", e.astype(jnp.float32)) * scale

    # The forward's path choice binds the backward's: Pallas-path residuals are
    # bf16 (its kernels consume them), XLA-path residuals are f32.
    if e.dtype == _BF16:
        from . import pallas_matryoshka as pk
        from . import shmap

        # Remainder gradients are folded into the kernels (predicated in-kernel
        # DMA of E_j row slices); no XLA-side scatter machinery. The group
        # cotangent dA_G = sum_j [G < m_j] Ebar_j is built INSIDE the dgrad
        # kernel (descending-G suffix accumulation) and handed to wgrad — the
        # XLA einsum form materializes in a layout the kernels cannot consume
        # and costs a 1.07 GB relayout copy per step (profiled at 1.6 ms).
        scale_arr = jnp.asarray(scale, jnp.float32)
        # df emitted directly in the primal dtype: a bf16 primal (the TopK
        # stats-kernel path) halves the dgrad write AND the encoder-gradient
        # contraction's read, and is bitwise-equal downstream — the DEFAULT-
        # precision dwb matmul casts its dh operand to bf16 anyway, and
        # bf16(df)·mask == bf16(df·mask) for a 0/1 mask.
        # Under batch sharding: dgrad is row-parallel (df/dA live with their
        # rows); wgrad's dW = f^T @ dA reduces over the batch, so each shard's
        # partial is psum'd over the batch axes inside the region — the same
        # all-reduce GSPMD would insert for the XLA formulation.
        dgrad_call = shmap.shard_rows(
            lambda ww, ee, mm, rr, sc: pk.grouped_matmul_dgrad(
                ww, ee, mm, rr, sc, group_size=g, df_dtype=fdt.dtype,
                interpret=shmap.INTERPRET,
            ),
            in_batch_dims=(None, 1, None, None, None), out_batch_dims=(0, 0),
        )
        df, da = dgrad_call(w, e, m, r, scale_arr)
        wgrad_call = shmap.shard_rows(
            lambda ff, dd, ee, mm, rr, sc: pk.grouped_matmul_wgrad(
                ff, dd, ee, mm, rr, sc, group_size=g, interpret=shmap.INTERPRET,
            ),
            in_batch_dims=(0, 0, 1, None, None, None), out_batch_dims=(None,),
            psum_outs=(0,),
        )
        dw = wgrad_call(f, da, e, m, r, scale_arr)
    else:
        mask = (
            jnp.arange(n_groups, dtype=jnp.int32)[None, :] < m[:, None]
        ).astype(jnp.float32)  # (J, G)
        eq = (
            jnp.arange(n_groups, dtype=jnp.int32)[None, :] == m[:, None]
        ).astype(jnp.float32)  # (J, G); rows with m == n_groups (p == d_sae) are 0

        # Group-path cotangent dA_G = sum_j [G < m_j] Ebar_j, batch-major.
        da = (
            jnp.einsum(
                "jbd,jG->bGd", e, (mask * scale).astype(e.dtype),
                preferred_element_type=jnp.float32, precision=precision,
            )
        ).astype(e.dtype)  # (B, G, D)
        # Remainder path: per-prefix gradients scattered into groups with
        # (J, G) one-hot contractions instead of dynamic-update-slices.
        lane = jnp.arange(g, dtype=jnp.int32)
        dfrem_js, dwrem_js = [], []
        for j in range(j_n):
            w_m = jax.lax.dynamic_slice(w, (m[j] * g, 0), (g, d_model))
            f_m = jax.lax.dynamic_slice(f, (0, m[j] * g), (b, g))
            lane_mask = (lane < r[j]).astype(jnp.float32)
            ebar_j = e[j].astype(jnp.float32) * scale
            dfrem = (
                jax.lax.dot_general(
                    ebar_j.astype(e.dtype), w_m,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision,
                )
                * lane_mask
            )
            dwrem = jax.lax.dot_general(
                (f_m.astype(jnp.float32) * lane_mask).astype(f.dtype),
                ebar_j.astype(e.dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )
            dfrem_js.append(dfrem.astype(e.dtype))
            dwrem_js.append(dwrem)
        dfrem_stack = jnp.stack(dfrem_js)  # (J, B, g)
        dwrem = jnp.einsum(
            "jgd,jG->Ggd", jnp.stack(dwrem_js).astype(e.dtype), eq.astype(e.dtype),
            preferred_element_type=jnp.float32, precision=precision,
        ).reshape(d_sae, d_model)
        dfrem_g = jnp.einsum(
            "jbg,jG->bGg", dfrem_stack, eq,
            preferred_element_type=jnp.float32, precision=precision,
        )
        df_groups = [
            jax.lax.dot_general(
                da[:, i], w[i * g : (i + 1) * g],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )
            for i in range(n_groups)
        ]
        dw_groups = [
            jax.lax.dot_general(
                f[:, i * g : (i + 1) * g], da[:, i],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )
            for i in range(n_groups)
        ]
        df = (jnp.stack(df_groups, axis=1) + dfrem_g).reshape(b, d_sae)
        dw = jnp.stack(dw_groups, axis=0).reshape(d_sae, d_model) + dwrem

    # x and prefixes are non-differentiable data inputs (int cotangents must
    # be float0 per the custom_vjp contract).
    dprefixes = np.zeros(m.shape, dtype=jax.dtypes.float0)
    return (
        dw, db_dec, df.astype(fdt.dtype),
        jnp.zeros((b, d_model), jnp.float32), dprefixes,
    )


prefix_mse.defvjp(_fwd, _bwd)
