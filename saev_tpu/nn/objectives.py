"""Matryoshka training objective as pure JAX functions.

Capability mirror of reference `src/saev/nn/objectives.py` (MatryoshkaObjective at
objectives.py:93, sample_prefixes at :161, scale-stabilized MSE at :224), rebuilt
for the jitted train step:

- The objective is a pure function of (params, state, batch, prefixes); the dead-
  latent counter (`toks_since_active`, a mutable attribute in the reference) is
  explicit state threaded through the step so it vmaps over the SAE sweep axis.
- Prefix cuts are sampled *host-side* with numpy each step (they are data-dependent
  values, not shapes; the decode keeps static shapes regardless — see
  modeling.decode) and passed in as a small int32 array.
- AuxK's `k_use = min(k_aux, n_dead)` dynamic top-k (reference modeling.py:93-97)
  becomes a static-k threshold mask restricted to dead latents, which reproduces
  the same selected set for every n_dead (see `_aux_loss`).
"""

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from . import modeling

Array = jax.Array

# Cap for the tokens-since-active counter so int32 never overflows on long runs;
# far above any dead_threshold_tokens in practice.
_TOKS_CAP = np.int32(1 << 30)

# Escape hatch for A/B validation (scripts/proto_fused_quality.py): False
# forces the autodiff-through-decode training path everywhere.
FUSED_ENABLED = True


@dataclasses.dataclass(frozen=True)
class Matryoshka:
    """Config for the Matryoshka loss (reference objectives.py:15-25; per
    arxiv.org/abs/2503.17547)."""

    n_prefixes: int = 10
    """Number of random length prefixes to use for loss calculation."""
    dead_threshold_tokens: int = 10_000_000
    """Tokens without activation before a latent is considered dead."""


ObjectiveConfig = Matryoshka


class MatryoshkaLoss(tp.NamedTuple):
    """Composite loss terms for a training batch (reference objectives.py:59-89)."""

    mse: Array
    """Average reconstruction MSE over all prefix lengths."""
    sparsity: Array
    """Sparsity loss, typically lambda * L1."""
    l0: Array
    """Mean per-example L0 of the full encoding."""
    l1: Array
    """Mean per-example L1 of the full encoding."""
    aux: Array
    """Auxiliary loss term (AuxK)."""
    n_dead: Array
    """Number of dead latents (per aux loss threshold)."""

    @property
    def loss(self) -> Array:
        """Total loss."""
        return self.mse + self.sparsity + self.aux

    def metrics(self) -> dict[str, object]:
        return {
            "loss": float(self.loss),
            "mse": float(self.mse),
            "l0": float(self.l0),
            "l1": float(self.l1),
            "sparsity": float(self.sparsity),
            "aux": float(self.aux),
            "n_dead": int(self.n_dead),
        }


ObjectiveState = dict[str, Array]
# {"toks_since_active": int32 (d_sae,)}


def init_state(sae_cfg: modeling.SparseAutoencoderConfig) -> ObjectiveState:
    return {"toks_since_active": jnp.zeros((sae_cfg.d_sae,), dtype=jnp.int32)}


def sample_prefixes(
    d_sae: int,
    n_prefixes: int,
    *,
    min_prefix_length: int = 1,
    pareto_power: float = 0.5,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Sample ascending prefix lengths from a Pareto-ish distribution favoring short
    prefixes (reference objectives.py:161-201). Host-side numpy: runs once per step
    outside the jitted computation.

    Returns a sorted int32 array of length n_prefixes ending in d_sae.
    """
    if n_prefixes <= 1:
        return np.array([d_sae], dtype=np.int32)
    assert n_prefixes <= d_sae
    if rng is None:
        rng = np.random.default_rng()

    lengths = np.arange(1, d_sae)
    pareto_cdf = 1.0 - (min_prefix_length / lengths.astype(np.float64)) ** pareto_power
    pareto_pdf = np.concatenate([pareto_cdf[:1], np.diff(pareto_cdf)])
    p = pareto_pdf / pareto_pdf.sum()

    sampled = rng.choice(lengths.shape[0], size=n_prefixes - 1, replace=False, p=p)
    prefixes = np.concatenate([lengths[sampled], [d_sae]])
    prefixes.sort()
    return prefixes.astype(np.int32)


def scale_stabilized_mse(x_hat: Array, x: Array) -> Array:
    """Elementwise MSE normalized by max|x| before squaring for numerical stability
    (reference objectives.py:224-237, norm=False path)."""
    upper = jnp.maximum(jnp.max(jnp.abs(x)), 1e-12)
    return ((x_hat / upper - x / upper) ** 2) * upper * upper


def _aux_loss(
    aux_cfg: modeling.AuxK,
    sae_cfg: modeling.SparseAutoencoderConfig,
    params: modeling.Params,
    x: Array,
    h_x: Array,
    x_hat_full: Array,
    dead_mask: Array,
    alpha: Array | float | None = None,
    precision=None,
) -> Array:
    """AuxK dead-latent resurrection loss (reference modeling.py:75-103).

    Top-k_aux pre-activations among dead latents reconstruct the detached main
    residual. Static-k threshold selection: with kth = k_aux-th largest of
    (h masked to dead, else -inf), the kept set {h >= kth and dead} equals the
    reference's dynamic top-min(k_aux, n_dead) for every n_dead (when n_dead <
    k_aux the threshold is -inf and all dead latents are kept).
    """
    from .. import ops

    residual = jax.lax.stop_gradient(x - x_hat_full)
    k_aux = min(aux_cfg.k_aux, sae_cfg.d_sae)
    # Exact k_aux-th threshold among dead latents from the mask-aware Pallas
    # bisection kernel (ops/topk.py): the where(dead, h, -inf) tensor is never
    # materialized. Rows with fewer than k_aux dead latents threshold at -inf
    # and keep all dead latents, the reference's min(k_aux, n_dead) behavior.
    kth = ops.exact_kth_value_masked(
        jax.lax.stop_gradient(h_x), dead_mask, k_aux
    )
    keep = (h_x >= kth) & dead_mask[None, :]
    aux_acts = jnp.where(keep, h_x, jnp.zeros((), h_x.dtype))
    aux_recon = modeling.decode(sae_cfg, params, aux_acts, precision=precision)[:, -1, :]
    alpha = aux_cfg.alpha if alpha is None else alpha
    loss = alpha * jnp.mean((aux_recon - residual) ** 2)
    n_dead = jnp.sum(dead_mask)
    return jnp.where(n_dead > 0, loss, jnp.zeros((), loss.dtype))


def default_subspace_cap(d_sae: int, k_aux: int) -> int:
    """Default dead-subspace width: a quarter of the dictionary, at least
    4x k_aux, rounded up to a 128-lane multiple, capped at d_sae."""
    cap = max(d_sae // 4, 4 * k_aux)
    cap = -(-cap // 128) * 128
    return min(cap, d_sae)


def subspace_cap_ladder(d_sae: int, k_aux: int) -> list[int]:
    """Ascending subspace caps for the train loop's AuxK routing.

    Two rungs: a tight cap (d_sae/16, the few-percent-dead steady state — at
    production shape the whole aux path shrinks 16x) and the d_sae/4 default;
    n_dead above the top rung routes to the dense step. Each rung is one extra
    compile at loop start, nothing at steady state."""
    tight = min(-(-max(d_sae // 16, 2 * k_aux) // 128) * 128, d_sae)
    wide = default_subspace_cap(d_sae, k_aux)
    return sorted({c for c in (tight, wide) if c < d_sae})


def _aux_loss_subspace(
    aux_cfg: modeling.AuxK,
    sae_cfg: modeling.SparseAutoencoderConfig,
    params: modeling.Params,
    x: Array,
    x_hat_full: Array,
    toks: Array,
    dead_threshold: int,
    cap: int,
    alpha: Array | float | None = None,
    precision=None,
) -> Array:
    """AuxK loss computed in the gathered subspace of the `cap` stalest latents.

    Dead latents form a GLOBAL column set (dead_mask is per-latent, shared
    across rows), and at steady state only a few percent of the dictionary is
    dead — yet the dense aux path (kth threshold + decode + backward matmuls)
    runs at full d_sae width, ~16 ms of the production step. Gathering the
    `cap` stalest columns (by toks_since_active) shrinks every aux tensor by
    d_sae/cap: all dead latents sort above all live ones, so whenever
    n_dead <= cap the subspace contains every dead latent and this loss (and
    its gradients, which flow through the gathered W_enc/W_dec columns and
    scatter back) equals `_aux_loss` exactly. Callers MUST guarantee
    n_dead <= cap — the train loop does so with a lagged risk counter
    (stats["aux_risk"]) and falls back to the dense variant otherwise
    (framework/train.py).

    The subspace pre-activations are recomputed as x @ W_enc[:, idx] rather
    than gathered from h_x: the 2x(B x D x cap) recompute matmuls are cheaper
    than scattering a (B, d_sae) gradient back into the main encode backward.
    """
    from .. import ops

    residual = jax.lax.stop_gradient(x - x_hat_full)
    cap = min(cap, sae_cfg.d_sae)
    k_aux = min(aux_cfg.k_aux, cap)
    # Stalest-cap columns. top_k on the int32 staleness counters: every dead
    # latent (toks >= threshold) outranks every live one.
    idx = jax.lax.top_k(toks, cap)[1]
    dead_sub = jnp.take(toks, idx) >= jnp.int32(dead_threshold)
    w_enc_sub = jnp.take(params["W_enc"], idx, axis=1)  # (d_model, cap)
    b_enc_sub = jnp.take(params["b_enc"], idx)
    h_sub = (
        jnp.dot(x, w_enc_sub, preferred_element_type=jnp.float32, precision=precision)
        + b_enc_sub
    )
    kth = ops.exact_kth_value_masked(jax.lax.stop_gradient(h_sub), dead_sub, k_aux)
    keep = (h_sub >= kth) & dead_sub[None, :]
    aux_acts = jnp.where(keep, h_sub, jnp.zeros((), h_sub.dtype))
    w_dec_sub = jnp.take(params["W_dec"], idx, axis=0)  # (cap, d_model)
    aux_recon = (
        jnp.dot(
            aux_acts, w_dec_sub, preferred_element_type=jnp.float32,
            precision=precision,
        )
        + params["b_dec"]
    )
    alpha = aux_cfg.alpha if alpha is None else alpha
    loss = alpha * jnp.mean((aux_recon - residual) ** 2)
    n_dead = jnp.sum(dead_sub)
    return jnp.where(n_dead > 0, loss, jnp.zeros((), loss.dtype))


def matryoshka_loss(
    obj_cfg: Matryoshka,
    sae_cfg: modeling.SparseAutoencoderConfig,
    params: modeling.Params,
    sae_state: modeling.State,
    obj_state: ObjectiveState,
    x: Array,
    prefixes: Array,
    *,
    training: bool,
    hp: dict[str, Array] | None = None,
    precision=None,
    any_dead: Array | None = None,
    aux_subspace_cap: int | None = None,
    allow_fused: bool = True,
) -> tuple[MatryoshkaLoss, modeling.Output, modeling.State, ObjectiveState]:
    """One objective forward (reference MatryoshkaObjective.forward,
    objectives.py:101-156). Pure: returns updated SAE state (BatchTopK threshold)
    and objective state (dead-latent counters) alongside the loss and outputs.

    `hp` optionally overrides float hyperparameters with traced scalars — keys
    "sparsity_coeff", "aux_alpha", "momentum" — so a vmapped sweep can vary them
    per SAE within one compiled step.

    `any_dead` optionally gates the AuxK computation — the reference skips ALL
    AuxK work when no latent is dead (its eager `k_use == 0` early return,
    reference modeling.py:94-96), ~19 ms/step at production shape:
    - None (default): compute aux unconditionally.
    - Python bool: STATIC gate — False compiles the aux out entirely. This is
      how the train loop skips aux during warm-up, where no latent can have
      been inactive for dead_threshold_tokens yet (train.py aux_from_step);
      zero runtime overhead either way.
    - traced bool scalar: lax.cond. Saves ~11 ms when False but costs ~8 ms
      when True (cond operands are copied, breaking fusion) — measured on
      v5e; prefer the static gate. The predicate must be UNBATCHED (a batched
      cond predicate lowers to select and executes both branches).

    `aux_subspace_cap` (static int) switches the AuxK computation to the
    dead-subspace variant `_aux_loss_subspace`, exact iff n_dead <= cap at
    every step it is used — the caller's contract (the train loop enforces it
    with the stats["aux_risk"] counter and a dense fallback step).
    """
    hp = hp or {}
    from .. import ops as _ops
    from ..ops import matryoshka as _fused

    # Training at DEFAULT matmul precision uses the fused prefix-MSE
    # (custom VJP; Pallas grouped kernels on TPU — ops/matryoshka.py), which
    # never materializes the (batch, n_prefixes, d_model) reconstructions.
    # Eval and high-precision modes keep the autodiff decode (reference-parity
    # numerics). In the fused path `out.x_hats` carries only the FULL
    # reconstruction (stop-gradient), which is all the train step consumes.
    use_fused = (
        FUSED_ENABLED
        and allow_fused
        and training
        and prefixes is not None
        and prefixes.shape[0] > 1
        and sae_cfg.d_sae % min(1024, sae_cfg.d_sae) == 0
        and (precision is None or precision == jax.lax.Precision.DEFAULT)
    )
    # On the TPU fused path with TopK, the activation + per-step statistics
    # (bf16 latents for the decode kernels, liveness, L0, L1) come from ONE
    # Pallas pass over the pre-activations (ops.topk_stats) — each XLA
    # formulation re-reads the (batch, d_sae) tensor from HBM (~3.8 ms/step
    # at the production shape, profiled round 5).
    use_stats = (
        use_fused
        and isinstance(sae_cfg.activation, modeling.TopK)
        and _fused._use_pallas(x.shape[0])
    )
    if use_stats:
        h_x = modeling._linear_bias(
            x, params["W_enc"], params["b_enc"],
            precision or modeling.MATMUL_PRECISION,
        )
        st = _ops.topk_stats(h_x, sae_cfg.activation.top_k)
        # API-compatible f32 latents for Output.f_x; the train step consumes
        # only the losses, so XLA dead-code-eliminates this materialization.
        f_api = jnp.where(h_x >= st.kth, h_x, jnp.zeros((), h_x.dtype))
        enc = modeling.EncodeOut(h_x=h_x, f_x=f_api)
        new_sae_state = sae_state
    else:
        st = None
        enc, new_sae_state = modeling.encode(
            sae_cfg, params, sae_state, x, training=training,
            momentum=hp.get("momentum"), precision=precision,
        )
    bsz, d_sae = enc.f_x.shape

    new_obj_state = obj_state
    if training:
        toks = obj_state["toks_since_active"]
        # Liveness at bf16 resolution: the fused train path materializes
        # f_x.astype(bf16) for the Pallas decode kernels, and reading THAT
        # buffer (XLA CSEs the cast) halves this pass's HBM traffic vs
        # re-deriving the mask from the f32 pre-activations (1.4 -> 0.7
        # ms/step at the bench shape); the stats kernel folds the same
        # bf16-resolution count into its single pass. Only f32 subnormals
        # (< 1.2e-38) flush to zero in the cast — a latent "firing" below
        # bf16 resolution is dead by any practical measure.
        if st is not None:
            active = st.live
        else:
            active = jnp.any(enc.f_x.astype(jnp.bfloat16) != 0, axis=0)
        toks = jnp.minimum(toks + jnp.int32(bsz), _TOKS_CAP)
        toks = jnp.where(active, jnp.zeros((), toks.dtype), toks)
        dead_mask = toks >= obj_cfg.dead_threshold_tokens
        new_obj_state = {**obj_state, "toks_since_active": toks}
    else:
        dead_mask = None

    if use_fused:
        mse, xhat_full = _fused.prefix_mse(
            params["W_dec"], params["b_dec"],
            st.f if st is not None else enc.f_x, x, prefixes,
            min(1024, sae_cfg.d_sae), precision,
        )
        xhat_full = jax.lax.stop_gradient(xhat_full)
        x_hats = xhat_full[:, None, :]
    else:
        x_hats = modeling.decode(
            sae_cfg, params, enc.f_x, prefixes, precision=precision
        )
        n_prefixes = x_hats.shape[1]
        mse = scale_stabilized_mse(
            x_hats, jnp.broadcast_to(x[:, None, :], (bsz, n_prefixes, x.shape[-1]))
        ).mean()
        xhat_full = x_hats[:, -1, :]
    out = modeling.Output(h_x=enc.h_x, f_x=enc.f_x, x_hats=x_hats)

    aux_cfg = sae_cfg.activation.aux
    if training and isinstance(aux_cfg, modeling.AuxK):
        use_subspace = (
            aux_subspace_cap is not None and aux_subspace_cap < sae_cfg.d_sae
        )

        def _heavy():
            if use_subspace:
                return _aux_loss_subspace(
                    aux_cfg, sae_cfg, params, x, xhat_full,
                    new_obj_state["toks_since_active"],
                    obj_cfg.dead_threshold_tokens, aux_subspace_cap,
                    alpha=hp.get("aux_alpha"), precision=precision,
                )
            return _aux_loss(
                aux_cfg, sae_cfg, params, x, enc.h_x, xhat_full, dead_mask,
                alpha=hp.get("aux_alpha"), precision=precision,
            )

        if any_dead is None:
            aux = _heavy()
        elif isinstance(any_dead, bool):
            aux = _heavy() if any_dead else jnp.zeros((), x.dtype)
        else:
            aux = jax.lax.cond(any_dead, _heavy, lambda: jnp.zeros((), x.dtype))
    else:
        aux = jnp.zeros((), x.dtype)

    n_dead = (
        jnp.sum(dead_mask).astype(jnp.int32)
        if dead_mask is not None
        else jnp.zeros((), jnp.int32)
    )

    if st is not None:
        # One-pass kernel statistics: l1 stays differentiable through the
        # topk_stats custom VJP (sign(h)·mask); l0 is integer-valued in f32.
        l1_full = st.l1[:, 0].mean(axis=0)
        l0_full = st.l0[:, 0].astype(x.dtype).mean(axis=0)
    else:
        l1_full = jnp.abs(enc.f_x).sum(axis=1).mean(axis=0)
        l0_full = (enc.f_x != 0).astype(x.dtype).sum(axis=1).mean(axis=0)
    if hp.get("sparsity_coeff") is not None and isinstance(
        sae_cfg.activation.sparsity, modeling.L1Sparsity
    ):
        sparsity = l1_full * hp["sparsity_coeff"]
    else:
        sparsity = sae_cfg.activation.sparsity.loss(enc.f_x)

    loss = MatryoshkaLoss(
        mse=mse,
        sparsity=sparsity,
        l0=l0_full,
        l1=l1_full,
        aux=aux,
        n_dead=n_dead,
    )
    return loss, out, new_sae_state, new_obj_state
