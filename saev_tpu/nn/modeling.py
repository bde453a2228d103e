"""Sparse autoencoder core, redesigned TPU-first in pure JAX.

Capability mirror of the reference's `src/saev/nn/modeling.py` (SparseAutoencoder at
modeling.py:288, activations at :111-244, AuxK at :68) but architected for XLA:

- Parameters are a plain dict pytree `{"W_enc", "b_enc", "W_dec", "b_dec"}` so the
  whole sweep of N SAEs can be trained as ONE jitted step via `jax.vmap` over a
  stacked leading axis (the reference loops over SAEs in Python, train.py:339-343).
- Activations are pure functions. BatchTopK's EMA threshold (a torch buffer in the
  reference, modeling.py:214) is explicit mutable state threaded through `encode`
  so it lives in the jitted train-state pytree.
- TopK/BatchTopK select via a top-k *threshold* mask (`h >= kth largest`) instead of
  scatter: one `lax.top_k` plus vectorized VPU compares, no serialized scatter on
  TPU. Tie semantics: values equal to the k-th largest are all kept (torch's topk
  keeps exactly k, breaking ties by index; ties are measure-zero for real float
  activations).
- Matryoshka decode (reference modeling.py:351-409 builds per-prefix dynamic-shape
  block matmuls) is re-derived as a static *group decomposition*: one batched group
  matmul + cumsum gives prefix sums at group boundaries; each of the P prefixes then
  needs only one small (batch, group) remainder matmul selected with
  `lax.dynamic_slice`. Total FLOPs ~= one full decode * (1 + P*group/d_sae), vs. P
  full decodes for the naive masked formulation — and every shape is static, so XLA
  tiles everything onto the MXU.
"""

import dataclasses
import functools
import typing as tp

import jax
import jax.numpy as jnp
from jaxtyping import Float

from .. import guards

Array = jax.Array

# Default matmul precision: HIGHEST (6-pass f32 emulation) for parity with the
# reference (<1e-4 relative MSE target, BASELINE.md). Eval/inference always use
# this; the training step may lower it via the explicit `precision` arguments
# (train.Config.matmul_precision; its default is "default" = bf16 inputs with
# f32 accumulation — validated against bf16x3 on 400-step training runs, see
# docs/performance.md; "high" = bf16x3 ~1e-7 rel err for parity studies).
MATMUL_PRECISION = jax.lax.Precision.HIGHEST

PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}

# ---------------------------------------------------------------------------
# Sparsity / aux-loss / activation configs (reference modeling.py:25-146).
# Field names and defaults match the reference so checkpoint headers and sweep
# configs are interchangeable.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class NoSparsity:
    """No explicit sparsity penalty (TopK/BatchTopK control sparsity via k)."""

    key: tp.Literal["no-sparsity"] = "no-sparsity"

    def loss(self, f_x: Array) -> Array:
        return jnp.zeros((), dtype=f_x.dtype)


@dataclasses.dataclass(frozen=True)
class L1Sparsity:
    key: tp.Literal["l1-sparsity"] = "l1-sparsity"
    coeff: float = 1e-4

    def loss(self, f_x: Array) -> Array:
        # Mean over batch of per-row L1 (reference modeling.py:40-42).
        return jnp.abs(f_x).sum(axis=1).mean(axis=0) * self.coeff


Sparsity = NoSparsity | L1Sparsity


@dataclasses.dataclass(frozen=True)
class NoAux:
    """No auxiliary loss (e.g., for ReLU)."""

    key: tp.Literal["no-aux"] = "no-aux"


@dataclasses.dataclass(frozen=True)
class AuxK:
    """AuxK auxiliary reconstruction loss for dead latents (reference modeling.py:68)."""

    key: tp.Literal["auxk"] = "auxk"
    k_aux: int = 512
    alpha: float = 1 / 32


Aux = AuxK | NoAux


@dataclasses.dataclass(frozen=True)
class Relu:
    """Vanilla ReLU."""

    key: tp.Literal["relu"] = "relu"
    sparsity: Sparsity = L1Sparsity(coeff=4e-4)
    aux: Aux = NoAux()


@dataclasses.dataclass(frozen=True)
class TopK:
    key: tp.Literal["top-k"] = "top-k"
    top_k: int = 32
    """How many values are allowed to be non-zero."""
    sparsity: Sparsity = NoSparsity()
    aux: Aux = AuxK()

    def __post_init__(self):
        assert self.top_k > 0, "top_k must be a positive integer."


@dataclasses.dataclass(frozen=True)
class BatchTopK:
    key: tp.Literal["batch-top-k"] = "batch-top-k"
    top_k: int = 32
    """Average non-zero values per sample across the batch."""
    sparsity: Sparsity = NoSparsity()
    momentum: float = 0.1
    aux: AuxK = AuxK()

    def __post_init__(self):
        assert self.top_k > 0, "top_k must be a positive integer."


ActivationConfig = Relu | TopK | BatchTopK


@dataclasses.dataclass(frozen=True)
class SparseAutoencoderConfig:
    """SAE architecture + init/optimization knobs (reference modeling.py:261-284)."""

    d_model: int = 1024
    """Size of x."""
    d_sae: int = 1024 * 16
    """Number of features in SAE latent space; size of f(x)."""
    activation: ActivationConfig = TopK()
    """Activation function."""
    reinit_blend: float = 0.8
    """Blend factor between real datapoints and Kaiming noise at init."""
    reinit_enc_dec_tranpose: bool = True
    """Whether datapoint init also sets W_dec = W_enc^T."""
    remove_parallel_grads: bool = True
    """Project decoder grads off the unit-norm row direction (Anthropic recipe;
    see reference modeling.py:282)."""
    normalize_w_dec: bool = True
    """Keep W_dec rows unit-norm."""


# ---------------------------------------------------------------------------
# Parameters and state
# ---------------------------------------------------------------------------

Params = dict[str, Array]
# {"W_enc": (d_model, d_sae), "b_enc": (d_sae,),
#  "W_dec": (d_sae, d_model), "b_dec": (d_model,)}

State = dict[str, Array]
# {"threshold": f32 scalar} — BatchTopK EMA/JumpReLU threshold; present (and
# ignored) for all activation kinds so stacked sweeps have a uniform pytree.


class EncodeOut(tp.NamedTuple):
    """Pre-activations and activated latents (reference modeling.py:292)."""

    h_x: Array  # (batch, d_sae)
    f_x: Array  # (batch, d_sae)


class Output(tp.NamedTuple):
    """Full SAE forward outputs for objectives and metrics (reference modeling.py:299)."""

    h_x: Array  # (batch, d_sae)
    f_x: Array  # (batch, d_sae)
    x_hats: Array  # (batch, n_prefixes, d_model)


def init(cfg: SparseAutoencoderConfig, key: Array) -> tuple[Params, State]:
    """Initialize SAE parameters.

    Mirrors reference modeling.py:306-329: W_dec ~ Kaiming-uniform (bound
    sqrt(6/d_model), torch's kaiming_uniform_ default on a (d_sae, d_model)
    tensor), rows normalized to unit norm, W_enc = W_dec^T, zero biases. RNG
    streams differ from torch by design (SURVEY.md §7.4: init parity is not a
    target; trained-checkpoint parity is).
    """
    bound = float(jnp.sqrt(6.0 / cfg.d_model))
    w_dec = jax.random.uniform(
        key, (cfg.d_sae, cfg.d_model), dtype=jnp.float32, minval=-bound, maxval=bound
    )
    if cfg.normalize_w_dec:
        w_dec = w_dec / jnp.linalg.norm(w_dec, axis=1, keepdims=True)
    params = {
        "W_dec": w_dec,
        "b_dec": jnp.zeros((cfg.d_model,), dtype=jnp.float32),
        "W_enc": w_dec.T.copy(),
        "b_enc": jnp.zeros((cfg.d_sae,), dtype=jnp.float32),
    }
    state = {"threshold": jnp.zeros((), dtype=jnp.float32)}
    return params, state


def init_state(cfg: SparseAutoencoderConfig) -> State:
    return {"threshold": jnp.zeros((), dtype=jnp.float32)}


# ---------------------------------------------------------------------------
# Activation functions
# ---------------------------------------------------------------------------


def _kth_largest(x: Array, k: int) -> Array:
    """k-th largest value along the last axis, keepdims."""
    return jax.lax.top_k(x, k)[0][..., -1:]


@guards.typed
def topk_activation(
    h: Float[Array, "batch d_sae"], k: int, *, fast: bool = False
) -> Float[Array, "batch d_sae"]:
    """Per-row TopK via threshold mask (reference TopKActivation, modeling.py:160).

    Keeps all entries >= the k-th largest per row; exact ties at the boundary may
    keep more than k entries (torch keeps exactly k by index order). The
    threshold is EXACT on every backend and path: on TPU it comes from the
    Pallas bitwise-bisection kernel (ops/pallas_topk.py, one HBM pass, ~12x
    faster than lax.top_k's row sort and bit-identical), elsewhere from
    lax.top_k. `fast` is kept for API stability; both paths are exact now.
    """
    from .. import ops

    k = min(k, h.shape[-1])
    # stop_gradient on the INPUT: the threshold is piecewise-constant in h, and
    # the Pallas kernel has no JVP rule (nor needs one).
    kth = ops.exact_kth_value(jax.lax.stop_gradient(h), k)
    return jnp.where(h >= kth, h, jnp.zeros((), h.dtype))


@guards.typed
def batch_topk_train(
    h: Float[Array, "batch d_sae"],
    k: int,
    momentum: Array | float,
    threshold: Float[Array, ""],
) -> tuple[Float[Array, "batch d_sae"], Float[Array, ""]]:
    """BatchTopK training mode (reference BatchTopKActivation, modeling.py:216-244).

    Flattens the batch, keeps the largest batch*k entries globally, and updates an
    EMA of the minimum surviving positive activation (the eval-time JumpReLU
    threshold). Returns (f, new_threshold). The global k-th value comes from
    `ops.batch_global_kth_value` (per-row candidate gather; a full flat sort of
    B*d_sae elements is prohibitive on TPU).
    """
    from .. import ops

    bsz, d_sae = h.shape
    k_flat = min(k * bsz, d_sae * bsz)
    kth = jax.lax.stop_gradient(ops.batch_global_kth_value(h, k_flat))
    f = jnp.where(h >= kth, h, jnp.zeros((), h.dtype))
    pos_min = jnp.min(jnp.where(f > 0, f, jnp.inf))
    new_threshold = jnp.where(
        jnp.isfinite(pos_min),
        (1.0 - momentum) * threshold + momentum * pos_min,
        threshold,
    )
    return f, new_threshold


@guards.typed
def batch_topk_eval(
    h: Float[Array, "batch d_sae"], threshold: Float[Array, ""]
) -> Float[Array, "batch d_sae"]:
    """JumpReLU with the learned threshold; plain ReLU when threshold <= 0
    (reference modeling.py:221-225)."""
    eff = jnp.maximum(threshold, jnp.zeros((), h.dtype))
    return jnp.where(h > eff, h, jnp.zeros((), h.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _linear_bias(x: Array, w: Array, b: Array, precision) -> Array:
    """x @ w + b with a hand-written backward that computes dW and db in ONE
    MXU contraction: d[W;b] = [x; 1]^T @ dh. Autodiff's separate
    db = sum_rows(dh) lowers to a VPU pass that re-reads dh AND the
    pre-activations it is fused with (~2.8 ms/step at the production bench
    shape, profiled) — as an extra matmul row it is effectively free. db
    picks up the same bf16-operand rounding dW always had."""
    return (
        jnp.dot(x, w, preferred_element_type=jnp.float32, precision=precision)
        + b
    )


def _linear_bias_fwd(x, w, b, precision):
    return _linear_bias(x, w, b, precision), (x, w)


def _linear_bias_bwd(precision, res, dh):
    x, w = res
    xa = jnp.concatenate([x, jnp.ones((x.shape[0], 1), x.dtype)], axis=1)
    dwb = jax.lax.dot_general(
        xa, dh, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    # dx is a separate matmul: XLA dead-code-eliminates it when the caller
    # only differentiates with respect to the parameters (the train step).
    dx = jax.lax.dot_general(
        dh, w, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    ).astype(x.dtype)
    return dx, dwb[:-1], dwb[-1]


_linear_bias.defvjp(_linear_bias_fwd, _linear_bias_bwd)


def encode(
    cfg: SparseAutoencoderConfig,
    params: Params,
    state: State,
    x: Array,
    *,
    training: bool,
    momentum: Array | float | None = None,
    precision: jax.lax.Precision | None = None,
) -> tuple[EncodeOut, State]:
    """x @ W_enc + b_enc, then the configured activation (reference modeling.py:343).

    Returns (EncodeOut, new_state); new_state carries the updated BatchTopK EMA
    threshold during training and is unchanged otherwise. `momentum` optionally
    overrides the BatchTopK config value with a traced per-SAE scalar (so a vmapped
    sweep can vary it without retracing).
    """
    guards.check("x", x, ndim=2, last_dim=params["W_enc"].shape[0],
                 what=f"(batch, d_model) activations for this {cfg.d_model}-d SAE")
    h_x = _linear_bias(x, params["W_enc"], params["b_enc"],
                       precision or MATMUL_PRECISION)
    act = cfg.activation
    new_state = state
    if isinstance(act, Relu):
        f_x = jnp.maximum(h_x, jnp.zeros((), h_x.dtype))
    elif isinstance(act, TopK):
        f_x = topk_activation(h_x, act.top_k, fast=training)
    elif isinstance(act, BatchTopK):
        if training:
            f_x, new_threshold = batch_topk_train(
                h_x,
                act.top_k,
                act.momentum if momentum is None else momentum,
                state["threshold"],
            )
            new_state = {**state, "threshold": new_threshold}
        else:
            f_x = batch_topk_eval(h_x, state["threshold"])
    else:
        tp.assert_never(act)
    return EncodeOut(h_x=h_x, f_x=f_x), new_state


# ---------------------------------------------------------------------------
# Matryoshka-native decode
# ---------------------------------------------------------------------------


def decode(
    cfg: SparseAutoencoderConfig,
    params: Params,
    f_x: Array,
    prefixes: Array | None = None,
    *,
    group_size: int = 1024,
    precision: jax.lax.Precision | None = None,
) -> Array:
    """Decode latents to per-prefix reconstructions (batch, n_prefixes, d_model).

    Semantics match reference modeling.py:351-409: x_hats[:, j] = f_x[:, :p_j] @
    W_dec[:p_j] + b_dec for ascending prefixes p_1 < ... < p_P = d_sae; with
    prefixes=None, a single full reconstruction (n_prefixes=1).

    TPU-first implementation: the latent axis is split into static groups of
    `group_size`; one batched group matmul produces per-group partial sums, a
    (J, G) prefix mask contracts them straight to the J cut points on the MXU
    (no cumsum over boundaries no prefix touches), and each prefix adds a single
    masked remainder-group matmul picked out with `lax.dynamic_slice`. All
    shapes static; prefix values may be traced.
    """
    guards.check("f_x", f_x, ndim=2, last_dim=params["W_dec"].shape[0],
                 what=f"(batch, d_sae) latents for this {cfg.d_sae}-latent SAE")
    precision = precision or MATMUL_PRECISION
    w_dec = params["W_dec"]  # (d_sae, d_model)
    b_dec = params["b_dec"]
    b, d_sae = f_x.shape
    d_model = w_dec.shape[1]

    if prefixes is None:
        x_hat = jnp.dot(f_x, w_dec, preferred_element_type=jnp.float32, precision=precision) + b_dec
        return x_hat[:, None, :]

    n_prefixes = prefixes.shape[0]
    if n_prefixes == 1:
        # Single prefix must be d_sae (asserted host-side by callers); full decode.
        x_hat = jnp.dot(f_x, w_dec, preferred_element_type=jnp.float32, precision=precision) + b_dec
        return x_hat[:, None, :]

    g = min(group_size, d_sae)
    n_groups = -(-d_sae // g)
    pad = n_groups * g - d_sae
    if pad:
        f_pad = jnp.pad(f_x, ((0, 0), (0, pad)))
        w_pad = jnp.pad(w_dec, ((0, pad), (0, 0)))
    else:
        f_pad, w_pad = f_x, w_dec

    # One batched matmul over all groups: (b, G, g) x (G, g, d) -> (b, G, d).
    partial = jnp.einsum(
        "bGg,Ggd->bGd",
        f_pad.reshape(b, n_groups, g),
        w_pad.reshape(n_groups, g, d_model),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    # Prefix sums at the J cut points directly, as one mask contraction on the
    # MXU: base[:, j] = sum of groups fully below prefix j. This reads
    # `partial` once; a cumsum over all G+1 boundaries would write and re-read
    # the whole (b, G, d) tensor and run a serial scan (and its backward, a
    # reverse scan) for boundaries no prefix ever touches.
    p32 = prefixes.astype(jnp.int32)  # (J,)
    m = p32 // g  # group index holding each cut
    r = p32 - m * g  # lanes of that group below the cut
    group_mask = (
        jnp.arange(n_groups, dtype=jnp.int32)[None, :] < m[:, None]
    ).astype(partial.dtype)  # (J, G)
    # The mask contraction inherits the caller's precision too: at DEFAULT a
    # TPU f32 einsum truncates `partial` to bf16, putting ~1e-3 rel error on
    # the dominant term of every multi-prefix reconstruction even when the
    # caller requested HIGHEST (eval/inference parity budget is <1e-4).
    base = jnp.einsum(
        "bGd,JG->bJd",
        partial,
        group_mask,
        preferred_element_type=jnp.float32,
        precision=precision,
    )

    lane = jnp.arange(g, dtype=jnp.int32)
    x_hats = []
    for j in range(n_prefixes):
        # Remainder group: dynamic_slice clamps m*g into range; r == 0 masks it out.
        f_m = jax.lax.dynamic_slice(f_pad, (0, m[j] * g), (b, g))
        w_m = jax.lax.dynamic_slice(w_pad, (m[j] * g, 0), (g, d_model))
        rem = jnp.dot(
            jnp.where(lane < r[j], f_m, jnp.zeros((), f_m.dtype)),
            w_m,
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        x_hats.append(base[:, j, :] + rem + b_dec)

    return jnp.stack(x_hats, axis=1)


def forward(
    cfg: SparseAutoencoderConfig,
    params: Params,
    state: State,
    x: Array,
    *,
    training: bool = False,
    prefixes: Array | None = None,
) -> tuple[Output, State]:
    """Full SAE forward (reference modeling.py:331-341)."""
    enc, new_state = encode(cfg, params, state, x, training=training)
    x_hats = decode(cfg, params, enc.f_x, prefixes)
    return Output(h_x=enc.h_x, f_x=enc.f_x, x_hats=x_hats), new_state


# ---------------------------------------------------------------------------
# Decoder-norm constraints (Anthropic recipe; reference modeling.py:411-445)
# ---------------------------------------------------------------------------


def normalize_w_dec(cfg: SparseAutoencoderConfig, params: Params) -> Params:
    """Unit-norm W_dec rows (no-op if cfg.normalize_w_dec is False)."""
    if not cfg.normalize_w_dec:
        return params
    w = params["W_dec"]
    w = w / jnp.linalg.norm(w, axis=1, keepdims=True)
    return {**params, "W_dec": w}


def remove_parallel_grads(
    cfg: SparseAutoencoderConfig, params: Params, grads: Params
) -> Params:
    """Remove the gradient component parallel to each W_dec row.

    Rows are unit-norm constrained, so the parallel component is noise that only
    fights normalize_w_dec (reference modeling.py:420-445).
    """
    if not cfg.remove_parallel_grads:
        return grads
    w = params["W_dec"]
    g = grads["W_dec"]
    parallel = jnp.sum(g * w, axis=1)  # (d_sae,)
    norm_sq = jnp.sum(w * w, axis=1)
    scales = jnp.where(norm_sq > 0, parallel / jnp.where(norm_sq > 0, norm_sq, 1.0), 0.0)
    return {**grads, "W_dec": g - scales[:, None] * w}
