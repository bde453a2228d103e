"""Fast k-th-largest (top-k threshold) primitives for TPU.

XLA lowers `lax.top_k` on TPU to a full row sort: ~230 ms for a
(16384, 16384) f32 batch on v5e regardless of k — it dominates the SAE train
step (the reference's torch.topk runs as a CUDA radix select and never faced
this; SURVEY.md §3.4). The SAE only needs the k-th largest *value* per row
(selection happens with a `>= kth` compare mask, modeling.py), so these
primitives compute thresholds directly. Measured on v5e, same batch:

    lax.top_k (exact)          ~230 ms
    hier_kth_value (exact)     ~77 ms   chunked top-k merge
    two_stage_kth_value        ~20 ms   approx candidates -> exact top-k
    approx_kth_value           ~5 ms    TPU ApproxTopK PartialReduce

`two_stage` is exact whenever ApproxTopK's candidate set contains the true
top-k of the row (>97% of rows at m=8k on Gaussian data; when it misses, the
returned value is *smaller* than the true k-th, so a `>= thr` mask keeps
slightly more than k entries — measured mean L0 of 32.02 for k=32). On CPU
backends ApproxTopK falls back to exact top-k, so tests are deterministic.
"""

import functools
import typing

import jax
import jax.numpy as jnp

Array = jax.Array


# Trace-time switch: True forces the pure-XLA lax.top_k path everywhere.
# Set by make_train_step under feature parallelism — Pallas custom calls have
# no GSPMD partitioning rules, so a latent-sharded step must stay XLA-only
# (same module-global pattern as nn.objectives.FUSED_ENABLED).
FORCE_LAX = False


class TopKStats(typing.NamedTuple):
    """TopK activation plus the per-step statistics the train loop consumes,
    computed in one pass (one HBM read of `h` on TPU — ops/pallas_topk.py
    `_kernel_stats`; the separate XLA passes cost ~3.8 ms/step at the
    production bench shape, profiled round 5)."""

    kth: Array  # (B, 1) f32 exact k-th largest per row (non-differentiable)
    f: Array    # (B, S) bf16 where(h >= kth, h, 0) — differentiable
    live: Array  # (S,) bool: latent fired this batch (bf16 resolution)
    l0: Array   # (B, 1) f32 per-row count of f != 0 (non-differentiable)
    l1: Array   # (B, 1) f32 per-row sum |f| — differentiable


def _topk_stats_xla(h: Array, k: int) -> TopKStats:
    kth = exact_kth_value(jax.lax.stop_gradient(h), k)
    mask = h >= kth
    f32f = jnp.where(mask, h, jnp.zeros((), h.dtype))
    f = f32f.astype(jnp.bfloat16)
    live = jnp.any(f != 0, axis=0)
    l0 = jnp.sum((mask & (h != 0)).astype(jnp.float32), axis=1, keepdims=True)
    l1 = jnp.sum(jnp.abs(f32f), axis=1, keepdims=True)
    return TopKStats(kth=kth, f=f, live=live, l0=l0, l1=l1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def topk_stats(h: Array, k: int) -> TopKStats:
    """TopK threshold activation with fused statistics; (B, S) f32 input.

    Differentiable in `f` and `l1` (the losses); `kth`/`live`/`l0` carry
    stop-gradient semantics (the threshold is piecewise-constant in h, the
    others are counts). On TPU this is one Pallas pass; elsewhere an XLA
    composition with identical outputs.
    """
    from . import pallas_topk, shmap

    k = min(k, h.shape[-1])
    if (
        FORCE_LAX
        or (jax.default_backend() != "tpu" and not shmap.INTERPRET)
        or h.dtype != jnp.float32
    ):
        return _topk_stats_xla(h, k)
    b = h.shape[0]
    # Pad so every batch shard is a whole number of row tiles (the kernel is
    # row-parallel; under an active shmap context it runs per-shard on its
    # slice of the batch).
    quantum = pallas_topk.TILE_ROWS * shmap.n_shards()
    pad = (-b) % quantum
    hp = jnp.pad(h, ((0, pad), (0, 0))) if pad else h
    call = shmap.shard_rows(
        lambda hh: pallas_topk.topk_stats_pallas(hh, k, None, shmap.INTERPRET),
        in_batch_dims=(0,), out_batch_dims=(0, 0, 0, 0, 0),
    )
    kth, f, live_p, l0, l1 = call(hp)
    # Padded zero rows contribute kth=0, f=0, live=0, l0=0, l1=0 — slicing the
    # row outputs restores the unpadded result exactly.
    return TopKStats(
        kth=kth[:b], f=f[:b], live=live_p.sum(axis=0) > 0, l0=l0[:b], l1=l1[:b]
    )


def _topk_stats_fwd(h, k):
    out = topk_stats(h, k)
    return out, (h, out.kth)


def _topk_stats_bwd(k, res, cts):
    h, kth = res
    # f = where(mask, h, 0) -> dh += t_f * mask;  l1 = sum|f| -> dh += t_l1 *
    # sign(h) * mask. kth/live/l0 cotangents are zeros/float0 (stop-grad
    # semantics) and are dropped. XLA fuses this into the encoder-gradient
    # contraction (the mask re-derives from h + kth, both already live there).
    mask = h >= kth
    dh = jnp.where(mask, cts.f.astype(h.dtype) + cts.l1 * jnp.sign(h), 0.0)
    return (dh,)


topk_stats.defvjp(_topk_stats_fwd, _topk_stats_bwd)


def exact_kth_value(h: Array, k: int) -> Array:
    """Exact k-th largest along the last axis, (B, ..., 1).

    On TPU with a 2-D f32 input this dispatches to the Pallas bitwise-bisection
    kernel (ops/pallas_topk.py): one HBM pass, ~12x faster than lax.top_k's row
    sort and bit-identical. Other backends/shapes (or FORCE_LAX) use lax.top_k.
    """
    from . import pallas_topk

    k = min(k, h.shape[-1])
    if FORCE_LAX:
        return jax.lax.top_k(h, k)[0][..., -1:]
    return pallas_topk.kth_value(h, k)


def exact_kth_value_masked(h: Array, mask: Array, k: int) -> Array:
    """Exact k-th largest of where(mask, h, -inf), (B, 1); `mask` is a (S,)
    per-column bool shared across rows.

    On TPU the Pallas kernel applies the mask to the order keys in VMEM, so
    the -inf-masked tensor is never materialized in HBM (the AuxK dead-latent
    threshold's hot path). Bit-identical to
    `exact_kth_value(where(mask, h, -inf), k)`.
    """
    from . import pallas_topk

    k = min(k, h.shape[-1])
    if FORCE_LAX:
        masked = jnp.where(mask[None, :], h, jnp.array(-jnp.inf, h.dtype))
        return jax.lax.top_k(masked, k)[0][..., -1:]
    return pallas_topk.kth_value_masked(h, mask, k)


def hier_kth_value(h: Array, k: int, *, chunk: int = 256) -> Array:
    """Exact k-th largest via hierarchical chunked top-k.

    Each row's top-k is contained in the union of its per-chunk top-k's, so a
    (B, S) sort becomes (B, S/chunk) small sorts plus a merge — ~3x faster than
    lax.top_k on v5e and bit-identical.
    """
    b = h.shape[0]
    s = h.shape[-1]
    if s <= max(4096, 2 * chunk) or k >= chunk:
        return exact_kth_value(h, k)
    n_chunks = s // chunk
    rem = s - n_chunks * chunk
    main = h[..., : n_chunks * chunk].reshape(b, n_chunks, chunk)
    cand = jax.lax.top_k(main, k)[0].reshape(b, n_chunks * k)
    if rem:
        cand = jnp.concatenate([cand, h[..., n_chunks * chunk :]], axis=-1)
    while cand.shape[-1] > 4096:
        c = cand.shape[-1] // chunk * chunk
        folded = jax.lax.top_k(cand[..., :c].reshape(b, -1, chunk), k)[0]
        cand = jnp.concatenate([folded.reshape(b, -1), cand[..., c:]], axis=-1)
    return exact_kth_value(cand, k)


def two_stage_kth_value(h: Array, k: int, *, oversample: int = 4) -> Array:
    """Near-exact k-th largest: ApproxTopK candidates, then exact top-k among
    them. The result is <= the true k-th value (candidates are a subset of the
    row), so `h >= thr` masks keep AT LEAST k entries."""
    m = min(max(k * oversample, k), h.shape[-1])
    if m >= h.shape[-1]:
        return exact_kth_value(h, k)
    cand = jax.lax.approx_max_k(h, m)[0]
    return exact_kth_value(cand, k)


def approx_kth_value(h: Array, k: int) -> Array:
    """Fastest: ApproxTopK's k-th candidate directly (<= the true k-th)."""
    if k >= h.shape[-1]:
        return exact_kth_value(h, k)
    return jax.lax.approx_max_k(h, k)[0][..., -1:]


def sampled_kth_value(h: Array, k: int, *, n_sample: int = 2048) -> Array:
    """Statistical k-th-largest estimate from a strided column subsample.

    ApproxTopK's cost grows linearly with k (~150 ms at k=512 on a
    (16384, 16384) batch), but a quantile that deep is estimated well from a
    subsample: the k-th of S values is ~the (k*n/S)-th of an n-column sample.
    Measured: ~9 ms, keeps k*(1 +/- 0.12) entries for k=512 — the right tool
    when the exact boundary doesn't matter (AuxK's dead-latent selection).
    Rows whose sampled k'-th value is -inf (fewer than k' finite samples)
    keep everything, matching AuxK's min(k_aux, n_dead) semantics.
    """
    s = h.shape[-1]
    if n_sample >= s or k >= s:
        return exact_kth_value(h, min(k, s))
    sub = h[..., :: max(s // n_sample, 1)]
    m = max((k * sub.shape[-1]) // s, 1)
    if m >= sub.shape[-1]:
        return exact_kth_value(h, min(k, s))
    return jax.lax.approx_max_k(sub, m)[0][..., -1:]


def batch_global_kth_value(
    h: Array, k_total: int, *, row_oversample: int = 4, exact: bool = False
) -> Array:
    """k_total-th largest over the WHOLE (B, S) batch (BatchTopK's flattened
    global top-k, reference modeling.py:216-244).

    Exact mode sorts the full flat batch (lax.top_k over B*S elements — very
    expensive on TPU). The fast path gathers per-row candidates first: with
    m_row = row_oversample * ceil(k_total / B) candidates per row, the global
    top-k_total is exact unless some row contributes more than m_row winners
    (rare for activation batches; the error direction keeps more entries).
    """
    b, s = h.shape
    k_total = min(k_total, b * s)
    if exact:
        return jax.lax.top_k(h.reshape(-1), k_total)[0][-1]
    m_row = min(max(-(-k_total // b) * row_oversample, 1), s)
    if m_row >= s:
        return jax.lax.top_k(h.reshape(-1), k_total)[0][-1]
    cand = jax.lax.approx_max_k(h, m_row)[0].reshape(-1)
    k_eff = min(k_total, cand.shape[0])
    return jax.lax.top_k(cand, k_eff)[0][-1]
