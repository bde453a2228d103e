"""SAE training: one jitted, vmapped, data-parallel train step.

Capability mirror of reference `src/saev/framework/train.py` (train at :239-462,
make_saes/datapoint init at :109-189, evaluate at :510-618, split_cfgs at :670,
main at :706), re-architected for TPU:

- The reference iterates N SAEs in a Python loop over a shared batch
  (train.py:339-343). Here the whole sweep is *stacked* along a leading axis and
  the entire step — normalize W_dec, forward, loss, backward, grad projection,
  per-SAE clip, Adam, LR schedule — is ONE `jax.jit` containing `jax.vmap` over
  the sweep axis. Float hyperparameters that vary across the sweep (lr, L1 coeff,
  AuxK alpha, BatchTopK momentum, grad clip) are per-SAE arrays traced into the
  step; SAEs whose *static* structure differs (activation kind, top_k, k_aux,
  n_prefixes, ...) are split into separate jitted "cohorts" that still share each
  host batch.
- Data parallelism (absent in the reference; SURVEY.md §2.8): the batch is sharded
  along axis 0 over a 1-D `data` mesh; params/optimizer state are replicated, and
  XLA inserts the ICI gradient all-reduce. BatchTopK's batch-global top-k keeps
  exact global semantics under pjit's global view.
- Adam is implemented inline (elementwise; bias-corrected exactly like
  torch.optim.Adam) so the per-SAE learning rate is a traced array. Muon (reference
  train.py:304) orthogonalizes 2-D updates via Newton-Schulz, vmapped over the
  sweep.
- float64 metric accumulators (reference train.py:379-390) become f32 on-device
  sums (TPUs have no f64) accumulated into host numpy float64 across batches;
  within-batch f32 tree-reduction keeps relative error ~1e-7, far inside the
  <1e-4 parity budget (BASELINE.md).
"""

import dataclasses
import collections
import logging
import os
import pathlib
import time
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from .. import configs, disk, guards, helpers, nn, parallel
from . import checkpoints
from ..data import ShuffledConfig, ShuffledDataLoader
from ..nn import modeling, objectives
from ..utils import scheduling, statistics
from ..utils.monitoring import DataloaderMonitor
from ..utils.wandb import NullParallelRun, ParallelWandbRun

logger = logging.getLogger("train")

Array = jax.Array

# Lag (in steps) at which the train loop reads stats["aux_risk"] when routing
# between the subspace and dense AuxK step variants; the risk counter inside
# the step bounds n_dead this many steps ahead (make_train_step).
AUX_RISK_HORIZON = 2


@dataclasses.dataclass(frozen=True)
class Config:
    """Configuration for training an SAE on ViT activations (reference train.py:52-105)."""

    train_data: ShuffledConfig = ShuffledConfig()
    """Training data."""
    val_data: ShuffledConfig = ShuffledConfig()
    """Validation data."""
    n_train: int = 100_000_000
    """Number of SAE training samples."""
    n_val: int = 10_000_000
    """Number of SAE evaluation samples."""
    sae: modeling.SparseAutoencoderConfig = modeling.SparseAutoencoderConfig()
    """SAE configuration."""
    objective: objectives.Matryoshka = objectives.Matryoshka()
    """SAE objective configuration."""
    n_sparsity_warmup: int = 0
    """Number of sparsity coefficient warmup steps."""
    optim: tp.Literal["adam", "muon"] = "adam"
    """Optimizer for training."""
    lr: float = 0.0004
    """Learning rate."""
    n_lr_warmup: int = 500
    """Number of learning rate warmup steps."""
    grad_clip: float = 1.0
    """Maximum gradient norm across all SAE parameters."""
    sweep_parallel: int = 1
    """Shard the stacked-SAE sweep axis over this many devices (the `sweep`
    mesh axis): each chip trains its slice of the sweep with no gradient
    traffic. Cohort sizes must divide it. 1 = replicate (pure DP)."""
    sweep_vmap_width: int = 1
    """SAEs per vmap chunk inside the train step: vmap within a chunk,
    sequential (scan) across chunks. A single production-shape SAE fwd+bwd
    peaks at ~8 GB of HLO temps, so width 1 is the safe default on 16 GB
    chips; raise it for small SAEs. Composes with sweep_parallel: the width
    then bounds PER-DEVICE memory and must divide n_sae / sweep_parallel."""
    feature_parallel: int = 1
    """Shard the latent dimension (d_sae) over this many devices (the
    `feature` mesh axis) — tensor parallelism for dictionaries too wide for
    one chip's HBM. The step runs pure-XLA under GSPMD (Pallas kernels have
    no partitioning rules for a latent-sharded kth): measured 294.7 ms/step
    vs 37.4 ms for the kernel step at the production shape on one v5e chip
    (docs/performance.md), so N feature shards must amortize a ~7.9x
    single-chip slowdown — use ONLY when d_sae genuinely exceeds HBM.
    Composes with data/sweep axes; d_sae must divide it. 1 = no latent
    sharding."""
    matmul_precision: tp.Literal["highest", "high", "default"] = "default"
    """Train-step matmul precision: default = bf16 inputs with f32 accumulation
    (the TPU-native choice, 1.43x over bf16x3 end to end), high = bf16x3
    (~1e-7 rel err), highest = full f32 emulation (reference parity mode).
    Measured on structured synthetic data (400 steps, identical seeds), bf16
    and bf16x3 produce per-step loss curves identical to 4 decimals and final
    eval NMSE within 0.12% (noise) — scripts/proto_prec_quality.py. Eval and
    inference always run at highest regardless of this knob."""
    ckpt_every: int = 0
    """Save the full train state (params + optimizer + counters) every N steps
    under runs_root/.train_state (0 disables). The reference has no mid-run
    checkpointing (SURVEY.md §5.4)."""
    resume: bool = False
    """Resume from the latest saved train state if one exists. The data stream
    restarts reshuffled; optimizer state and step counters are restored."""
    profile_dir: pathlib.Path | None = None
    """Capture a jax.profiler trace of steps [10, 20) into this directory
    (view with TensorBoard/XProf; the reference's analog is VizTracer on the
    dataloaders, SURVEY.md §5.1)."""

    # Logging
    track: bool = True
    """Whether to track with WandB (falls back to a local JSONL recorder offline)."""
    wandb_project: str = "saev"
    """WandB project name."""
    tags: tuple[str, ...] = ()
    """Tags to add to WandB run."""
    log_every: int = 25
    """How often to log metrics."""
    runs_root: pathlib.Path = pathlib.Path("$SAEV_NFS/saev/runs")
    """Root directory for runs."""

    device: tp.Literal["tpu", "cpu"] = "tpu"
    """Hardware platform (informational; JAX picks the active backend)."""
    seed: int = 42
    """Random seed."""
    slurm_acct: str = ""
    """Slurm account string. Empty means to not use Slurm."""
    slurm_partition: str = ""
    """Slurm partition."""
    n_hours: float = 24.0
    """Slurm job length in hours."""
    mem_gb: int = 128
    """Node memory in GB."""
    log_to: str = os.path.join(".", "logs")
    """Where to log job stdout/stderr."""


# ---------------------------------------------------------------------------
# Sweep cohorts: SAEs that can share one compiled step
# ---------------------------------------------------------------------------


def _static_key(cfg: Config) -> tuple:
    """Everything that changes the traced computation (shapes / static ints /
    branch structure). SAEs with equal keys train in one vmapped step; float knobs
    are traced per-SAE arrays and do NOT split cohorts."""
    act = cfg.sae.activation
    act_static: tuple = (type(act).__name__,)
    if isinstance(act, (modeling.TopK, modeling.BatchTopK)):
        act_static += (act.top_k,)
    aux = act.aux
    if isinstance(aux, modeling.AuxK):
        act_static += ("auxk", aux.k_aux)
    else:
        act_static += ("no-aux",)
    act_static += (type(act.sparsity).__name__,)
    return (
        cfg.sae.d_model,
        cfg.sae.d_sae,
        act_static,
        cfg.sae.normalize_w_dec,
        cfg.sae.remove_parallel_grads,
        cfg.objective.n_prefixes,
        cfg.objective.dead_threshold_tokens,
        cfg.optim,
        cfg.matmul_precision,
        cfg.sweep_vmap_width,
    )


class Cohort(tp.NamedTuple):
    """A sub-sweep sharing one compiled train step."""

    indices: list[int]  # positions in the original cfgs list
    cfgs: list[Config]


def make_cohorts(cfgs: list[Config]) -> list[Cohort]:
    groups: dict[tuple, list[int]] = collections.defaultdict(list)
    for i, cfg in enumerate(cfgs):
        groups[_static_key(cfg)].append(i)
    return [
        Cohort(indices=idxs, cfgs=[cfgs[i] for i in idxs])
        for idxs in sorted(groups.values())
    ]


def _hp_arrays(cfgs: list[Config]) -> dict[str, np.ndarray]:
    """Per-SAE float hyperparameters as (n_sae,) arrays traced into the step."""
    def f32(vals):
        return np.asarray(vals, dtype=np.float32)

    sparsity_coeff, aux_alpha, momentum = [], [], []
    for cfg in cfgs:
        act = cfg.sae.activation
        sp = act.sparsity
        sparsity_coeff.append(sp.coeff if isinstance(sp, modeling.L1Sparsity) else 0.0)
        aux = act.aux
        aux_alpha.append(aux.alpha if isinstance(aux, modeling.AuxK) else 0.0)
        momentum.append(act.momentum if isinstance(act, modeling.BatchTopK) else 0.0)
    return {
        "lr": f32([c.lr for c in cfgs]),
        "n_lr_warmup": f32([c.n_lr_warmup for c in cfgs]),
        "grad_clip": f32([c.grad_clip for c in cfgs]),
        "sparsity_coeff": f32(sparsity_coeff),
        "aux_alpha": f32(aux_alpha),
        "momentum": f32(momentum),
    }


# ---------------------------------------------------------------------------
# Datapoint initialization (reference make_saes, train.py:109-189)
# ---------------------------------------------------------------------------


class SweepState(tp.NamedTuple):
    """Stacked train state for one cohort (leading axis = SAE sweep)."""

    params: modeling.Params
    sae_state: modeling.State
    obj_state: objectives.ObjectiveState
    opt_state: dict[str, tp.Any]
    step: Array  # i32 scalar


def make_saes(
    cfgs: list[Config],
    dl: tp.Any,
    *,
    seed: int = 0,
) -> tuple[modeling.Params, modeling.State, objectives.ObjectiveState]:
    """Build and (datapoint-)initialize a stacked sweep of SAEs.

    Mirrors reference train.py:109-189: W_enc columns are initialized from >=
    max(d_sae, 65536) zero-centered real activations blended with Kaiming noise at
    `reinit_blend`; optionally W_dec = W_enc^T; W_dec re-normalized; W_enc synced
    to the normalized W_dec^T (the reference does this unconditionally). All host
    numpy, then stacked.
    """
    assert cfgs, "Need at least one SAE to initialize."
    sae_cfg0 = cfgs[0].sae
    d_sae, d_model = sae_cfg0.d_sae, sae_cfg0.d_model
    assert all(c.sae.d_sae == d_sae and c.sae.d_model == d_model for c in cfgs), (
        "All SAEs in a cohort must share d_sae/d_model."
    )

    rng = np.random.default_rng(seed)
    keys = jax.random.split(jax.random.key(seed), len(cfgs))
    inits = [modeling.init(c.sae, k) for c, k in zip(cfgs, keys)]
    params_list = [jax.tree.map(np.asarray, p) for p, _ in inits]

    if any(c.sae.reinit_blend > 0 for c in cfgs):
        n_samples = max(d_sae, 65_536)
        if jax.process_count() > 1:
            # Each host's loader is partitioned; sample the init set from this
            # host's slice, then broadcast process 0's result below so every
            # host starts from identical params.
            n_samples = max(d_sae, n_samples // jax.process_count())
        if hasattr(dl, "n_samples"):
            assert dl.n_samples >= d_sae, (
                f"Need {d_sae} samples for datapoint init; dataloader has {dl.n_samples}."
            )
            n_samples = min(n_samples, dl.n_samples)

        batches, n_seen = [], 0
        for batch in dl:
            act = np.asarray(batch["act"])
            batches.append(act)
            n_seen += len(act)
            if n_seen >= n_samples:
                break
        assert n_seen >= n_samples, (
            f"Datapoint init requested {n_samples} samples but saw {n_seen}."
        )
        acts = np.concatenate(batches, axis=0)[:n_samples]
        acts = acts[rng.permutation(n_samples)]
        acts_mean = acts.mean(axis=0, keepdims=True)
        zero_centered = (acts[:d_sae] - acts_mean).astype(np.float32)
        bound = np.sqrt(6.0 / d_model)
        kaiming = rng.uniform(-bound, bound, size=zero_centered.shape).astype(np.float32)

        for cfg, params in zip(cfgs, params_list):
            blend = cfg.sae.reinit_blend
            assert 0.0 <= blend <= 1.0, f"reinit_blend must be in [0, 1], got {blend}."
            if blend == 0:
                continue
            idx = rng.permutation(d_sae)
            enc_rows = blend * zero_centered[idx] + (1 - blend) * kaiming[idx]
            params["W_enc"] = enc_rows.T.copy()
            if cfg.sae.reinit_enc_dec_tranpose:
                params["W_dec"] = enc_rows.copy()
            if cfg.sae.normalize_w_dec:
                params["W_dec"] = params["W_dec"] / np.linalg.norm(
                    params["W_dec"], axis=1, keepdims=True
                )
            # Unconditional sync, matching the reference (train.py:185): W_enc
            # always ends as the normalized W_dec transpose.
            params["W_enc"] = params["W_dec"].T.copy()

        mean_p = sum(c.sae.reinit_blend for c in cfgs) / len(cfgs)
        logger.info("Initialized %d SAEs with avg(p)=%.2f", len(cfgs), mean_p)

        # Datapoint init read THIS host's loader partition; multi-host SPMD
        # requires identical starting params everywhere.
        params_list = parallel.broadcast_from_primary(params_list)

    stack = lambda trees: jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
    params = stack(params_list)
    sae_state = stack([s for _, s in inits])
    obj_state = stack([objectives.init_state(c.sae) for c in cfgs])
    return params, sae_state, obj_state


# ---------------------------------------------------------------------------
# Optimizers (inline; per-SAE traced learning rates)
# ---------------------------------------------------------------------------


def _adam_init(params) -> dict[str, tp.Any]:
    zeros = lambda: jax.tree.map(jnp.zeros_like, params)
    return {"m": zeros(), "v": zeros(), "count": jnp.zeros((), jnp.int32)}


def _adam_update(grads, opt_state, lr_per_sae, *, b1=0.9, b2=0.999, eps=1e-8):
    """torch.optim.Adam-equivalent elementwise update; lr is a (n_sae,) array
    broadcast over each stacked leaf's leading axis."""
    count = opt_state["count"] + 1
    t = count.astype(jnp.float32)
    bc1 = 1.0 - b1**t
    bc2 = 1.0 - b2**t
    m = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, opt_state["m"], grads)
    v = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, opt_state["v"], grads)

    def upd(m, v):
        lr = lr_per_sae.reshape((-1,) + (1,) * (m.ndim - 1))
        return -lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps)

    updates = jax.tree.map(upd, m, v)
    return updates, {"m": m, "v": v, "count": count}


def _newton_schulz(g: Array, steps: int = 5, eps: float = 1e-7) -> Array:
    """Orthogonalize the last two axes via the quintic Newton-Schulz iteration
    (torch.optim.Muon's _zeropower_via_newtonschulz; Jordan et al. 2024). Works
    on stacked (n_sae, a, b) arrays. torch runs the iteration in bf16; we keep
    f32 (strictly more accurate, same fixed point)."""
    a, b, c = 3.4445, -4.7750, 2.0315
    transpose = g.shape[-2] > g.shape[-1]
    x = jnp.swapaxes(g, -2, -1) if transpose else g
    x = x / jnp.maximum(jnp.linalg.norm(x, axis=(-2, -1), keepdims=True), eps)
    for _ in range(steps):
        gram = x @ jnp.swapaxes(x, -2, -1)
        x = a * x + (b * gram + c * gram @ gram) @ x
    return jnp.swapaxes(x, -2, -1) if transpose else x


def _muon_init(params) -> dict[str, tp.Any]:
    return {
        "mu": jax.tree.map(jnp.zeros_like, params),
        "adam": _adam_init(params),
        "count": jnp.zeros((), jnp.int32),
    }


def _muon_update(
    params, grads, opt_state, lr_per_sae, *, beta=0.95, weight_decay=0.1
):
    """torch.optim.Muon-equivalent update on 2-D (stacked 3-D) params, Adam on
    the rest (the reference splits params the same way, train.py:296-306).

    Matches torch.optim.Muon defaults (torch/optim/_muon.py): EMA momentum
    buffer (buf = m*buf + (1-m)*g), nesterov blend (upd = (1-m)*g + m*buf),
    Newton-Schulz orthogonalization, lr adjusted by sqrt(max(1, rows/cols)),
    and decoupled weight decay 0.1 applied with the UNADJUSTED lr.
    """
    mu = jax.tree.map(
        lambda m, g: beta * m + (1.0 - beta) * g, opt_state["mu"], grads
    )
    adam_updates, adam_state = _adam_update(grads, opt_state["adam"], lr_per_sae)

    def upd(p, g, path_mu, adam_u):
        if path_mu.ndim >= 3:  # stacked 2-D param -> Muon
            nesterov = (1.0 - beta) * g + beta * path_mu
            ortho = _newton_schulz(nesterov)
            scale = jnp.sqrt(
                jnp.maximum(1.0, path_mu.shape[-2] / path_mu.shape[-1])
            )
            lr = lr_per_sae.reshape((-1,) + (1,) * (path_mu.ndim - 1))
            return -lr * weight_decay * p - lr * scale * ortho
        return adam_u

    updates = jax.tree.map(upd, params, grads, mu, adam_updates)
    return updates, {"mu": mu, "adam": adam_state, "count": opt_state["count"] + 1}


# ---------------------------------------------------------------------------
# The jitted train step
# ---------------------------------------------------------------------------


def _per_sae_global_norm(grads) -> Array:
    """L2 norm over all of each SAE's params: (n_sae,)."""
    sq = [
        jnp.sum(g.reshape(g.shape[0], -1) ** 2, axis=1) for g in jax.tree.leaves(grads)
    ]
    return jnp.sqrt(sum(sq))


def dictionary_coherence(w: Array, block: int = 1024) -> Array:
    """max off-diagonal |<w_i/|w_i|, w_j/|w_j|>| over decoder rows, computed in row
    blocks so the (d_sae, d_sae) Gram matrix is never materialized (the reference
    materializes it, train.py:414)."""
    d_sae, d = w.shape
    wn = w / jnp.linalg.norm(w, axis=1, keepdims=True)
    block = min(block, d_sae)
    nb = -(-d_sae // block)
    pad = nb * block - d_sae
    wp = jnp.pad(wn, ((0, pad), (0, 0)))

    col_ids = jnp.arange(d_sae)[None, :]

    def body(carry, i):
        rows = jax.lax.dynamic_slice(wp, (i * block, 0), (block, d))
        gram = jnp.abs(
            jnp.dot(rows, wn.T, preferred_element_type=jnp.float32,
                    precision=modeling.MATMUL_PRECISION)
        )
        row_ids = i * block + jnp.arange(block)[:, None]
        mask = (row_ids != col_ids) & (row_ids < d_sae)
        m = jnp.max(jnp.where(mask, gram, 0.0))
        return jnp.maximum(carry, m), None

    coh, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), jnp.arange(nb))
    return coh


def _sweep_map(fn, args, width: int, *, sweep_parallel: int = 1, mesh=None):
    """Apply `fn` over the stacked sweep axis, composing in-chip chunking with
    device sharding.

    Unsharded sweep (sweep_parallel == 1): one vmap when `width` covers the
    whole sweep, otherwise lax.map in vmap chunks of `width` so per-chunk HLO
    temps stay bounded.

    Device-sharded sweep (sweep_parallel > 1): lax.map's scan would
    dynamic-slice the sharded axis and force reshards, so instead the stacked
    (n_sae, ...) leaves are rearranged to (n_chunks, sweep_parallel·width, ...)
    — scan axis UNsharded, vmapped slab axis still sharded over `sweep` — and
    scanned. Each device then runs its local `width`-wide vmap per chunk with
    zero cross-device traffic: `width` now bounds per-device memory for sweeps
    of any size (round 2; previously sharded sweeps forced a full vmap). The
    rearrangement reshapes/transposes never move data across devices
    (sharding constraints pin each step when `mesh` is given).
    """
    n_sae = jax.tree.leaves(args)[0].shape[0]
    if sweep_parallel <= 1:
        if width >= n_sae:
            return jax.vmap(fn)(args)
        return jax.lax.map(fn, args, batch_size=width)

    assert n_sae % sweep_parallel == 0, (n_sae, sweep_parallel)
    per_dev = n_sae // sweep_parallel
    width = min(width, per_dev)
    assert per_dev % width == 0, (
        f"sweep_vmap_width={width} must divide the per-device sweep size "
        f"{per_dev} (n_sae={n_sae}, sweep_parallel={sweep_parallel})"
    )
    n_chunks = per_dev // width
    if n_chunks == 1:
        return jax.vmap(fn)(args)

    from jax.sharding import NamedSharding, PartitionSpec

    def cs(x, *spec):
        if mesh is None:
            return x
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, PartitionSpec(*spec))
        )

    sw = parallel.SWEEP_AXIS

    def to_chunks(x):
        x2 = cs(x.reshape((sweep_parallel, n_chunks, width) + x.shape[1:]), sw)
        x3 = cs(jnp.moveaxis(x2, 1, 0), None, sw)
        return cs(x3.reshape((n_chunks, sweep_parallel * width) + x.shape[1:]), None, sw)

    def from_chunks(y):
        y2 = cs(y.reshape((n_chunks, sweep_parallel, width) + y.shape[2:]), None, sw)
        y3 = cs(jnp.moveaxis(y2, 0, 1), sw)
        return cs(y3.reshape((n_sae,) + y.shape[2:]), sw)

    chunked = jax.tree.map(to_chunks, args)
    out = jax.lax.map(jax.vmap(fn), chunked)
    return jax.tree.map(from_chunks, out)


def make_train_step(
    sae_cfg: modeling.SparseAutoencoderConfig,
    obj_cfg: objectives.Matryoshka,
    n_steps: int,
    optim: str = "adam",
    matmul_precision: str = "default",
    sweep_vmap_width: int = 1,
    sweep_parallel: int = 1,
    mesh=None,
    aux_enabled: bool = True,
    aux_subspace_cap: int | None = None,
    feature_parallel: int = 1,
):
    """Build the jitted train step for one cohort.

    `aux_enabled=False` statically compiles the AuxK computation out (~19 ms/
    step at production shape) — valid exactly while no latent can be dead yet,
    i.e. during the first dead_threshold_tokens of training (the reference's
    eager code skips the same work via its k_use == 0 early return). The train
    loop uses this warm-up variant until `aux_from_step` and the full step
    after (train()).

    `aux_subspace_cap` compiles the AuxK path in the dead-subspace form
    (objectives._aux_loss_subspace): every aux tensor shrinks from d_sae to
    `cap` columns, ~3x cheaper at production shape. Exact iff n_dead <= cap at
    the step — the train loop guarantees that by reading the lagged
    stats["aux_risk"] counter (an upper bound on n_dead over the next
    AUX_RISK_HORIZON steps) and routing to the dense variant when the bound
    exceeds the cap (step_fn_at).

    Signature: step(sweep_state, x, prefixes, hp) -> (sweep_state, stats)
      x:        (batch, d_model) f32, sharded over the data mesh axis
      prefixes: (n_sae, n_prefixes) i32, sampled host-side per step
      hp:       per-SAE float hyperparameter arrays (_hp_arrays)
      stats:    light per-step stats {loss terms (n_sae,), grad_norm, lr}

    The per-SAE forward+backward runs as `lax.map` over the sweep axis in
    chunks of `sweep_vmap_width` (vmap within a chunk, sequential across
    chunks). A single-SAE fwd+bwd at production shapes peaks at ~8 GB of HLO
    temps (batch x d_sae intermediates), so fully vmapping the sweep OOMs a
    16 GB chip at 3+ SAEs and thrashes at 2; chunk width 1 trains a sweep of
    ANY size at ~n_sae x the single-SAE step time. Raise the width for small
    SAEs where the chunk fits comfortably.
    """

    assert sweep_vmap_width >= 1, f"sweep_vmap_width must be >= 1, got {sweep_vmap_width}"
    assert sae_cfg.d_sae % feature_parallel == 0, (
        f"d_sae={sae_cfg.d_sae} must divide over feature_parallel="
        f"{feature_parallel}; otherwise GSPMD silently replicates the latent "
        "dimension and the sharding saves no memory."
    )
    precision = modeling.PRECISIONS[matmul_precision]
    if feature_parallel > 1 or sweep_parallel > 1:
        logger.info(
            "feature_parallel=%d sweep_parallel=%d: Pallas kernels disabled "
            "inside this step (pure-XLA trace so GSPMD can shard the latent/"
            "sweep axes; the data axis alone keeps kernels via shard_map).",
            feature_parallel, sweep_parallel,
        )

    def loss_one(
        params, sae_state, obj_state, x, prefixes, coeff, alpha, momentum, any_dead
    ):
        loss, out, s1, s2 = objectives.matryoshka_loss(
            obj_cfg, sae_cfg, params, sae_state, obj_state, x, prefixes,
            training=True,
            hp={"sparsity_coeff": coeff, "aux_alpha": alpha, "momentum": momentum},
            precision=precision,
            any_dead=any_dead,
            aux_subspace_cap=aux_subspace_cap,
            # Pallas custom-call kernels have no GSPMD partitioning rules.
            # Data-sharded batches keep the kernels via explicit shard_map
            # regions (ops/shmap.py, installed below); the feature- and
            # sweep-sharded axes have no manual-SPMD wrapping (kth over a
            # latent-sharded row needs a distributed combine; a sweep-sharded
            # vmap dim would be all-gathered at the region boundary), so those
            # steps stay pure-XLA for the partitioner.
            allow_fused=feature_parallel == 1 and sweep_parallel == 1,
        )
        return loss, out, s1, s2

    # Static gate: None = unconditional aux; False = compiled out (see
    # docstring). The traced-lax.cond form also exists in matryoshka_loss but
    # costs ~8 ms when the heavy branch is taken, so the loop prefers the
    # static two-phase split.
    any_dead = None if aux_enabled else False

    def step(ts: SweepState, x: Array, prefixes: Array, hp: dict[str, Array]):
        # Normalize W_dec rows before the forward (reference train.py:334).
        params = jax.vmap(lambda p: modeling.normalize_w_dec(sae_cfg, p))(ts.params)

        def grad_one(args):
            params_i, sae_state_i, obj_state_i, prefixes_i, coeff, alpha, mom = args

            def scalar_loss(p):
                loss, _out, s1, s2 = loss_one(
                    p, sae_state_i, obj_state_i, x, prefixes_i, coeff, alpha, mom,
                    any_dead,
                )
                return loss.loss, (loss, s1, s2)

            (_, (loss, s1, s2)), g = jax.value_and_grad(scalar_loss, has_aux=True)(
                params_i
            )
            return loss, g, s1, s2

        mapped = (
            params, ts.sae_state, ts.obj_state, prefixes,
            hp["sparsity_coeff"], hp["aux_alpha"], hp["momentum"],
        )
        losses, grads, sae_states, obj_states = _sweep_map(
            grad_one, mapped, sweep_vmap_width,
            sweep_parallel=sweep_parallel, mesh=mesh,
        )

        grads = jax.vmap(lambda p, g: modeling.remove_parallel_grads(sae_cfg, p, g))(
            params, grads
        )

        # Per-SAE global-norm clip (torch.nn.utils.clip_grad_norm_ semantics).
        grad_norm = _per_sae_global_norm(grads)
        clip_coef = jnp.minimum(hp["grad_clip"] / (grad_norm + 1e-6), 1.0)
        grads = jax.tree.map(
            lambda g: g * clip_coef.reshape((-1,) + (1,) * (g.ndim - 1)), grads
        )

        # LR at step t = WarmupCosine after t scheduler steps (lr=0 at t=0,
        # matching the reference's empty-LR first step, train.py:118).
        lr = scheduling.warmup_cosine(
            ts.step, 0.0, hp["n_lr_warmup"], hp["lr"], float(n_steps), 0.0
        )

        if optim == "adam":
            updates, opt_state = _adam_update(grads, ts.opt_state, lr)
        elif optim == "muon":
            updates, opt_state = _muon_update(params, grads, ts.opt_state, lr)
        else:
            raise ValueError(f"Unknown optimizer: {optim}")
        params = jax.tree.map(lambda p, u: p + u, params, updates)

        new_ts = SweepState(
            params=params,
            sae_state=sae_states,
            obj_state=obj_states,
            opt_state=opt_state,
            step=ts.step + 1,
        )
        # Upper bound on n_dead over the next AUX_RISK_HORIZON steps: counters
        # grow by at most bsz/step, so a latent dead within h steps must
        # already sit within h*bsz of the threshold. The loop reads this with
        # an AUX_RISK_HORIZON-step lag (no pipeline stall) to route between
        # the subspace and dense AuxK step variants.
        risk_floor = jnp.int32(
            obj_cfg.dead_threshold_tokens - AUX_RISK_HORIZON * x.shape[0]
        )
        aux_risk = jnp.sum(
            obj_states["toks_since_active"] >= risk_floor, axis=-1
        ).astype(jnp.int32)

        stats = {
            "mse": losses.mse,
            "sparsity": losses.sparsity,
            "l0": losses.l0,
            "l1": losses.l1,
            "aux": losses.aux,
            "n_dead": losses.n_dead,
            "loss": losses.loss,
            "grad_norm": grad_norm,
            "lr": lr,
            "aux_risk": aux_risk,
        }
        return new_ts, stats

    if feature_parallel == 1 and sweep_parallel == 1:
        # The GSPMD-partitioned (feature/sweep-sharded) step keeps default
        # layouts: AUTO layouts compose with the partitioner's sharding
        # propagation in ways we have no equality test for, and the relayout
        # copies they remove are specific to the replicated-params fast path.
        jitted = _auto_layout_jit(step)
    else:
        jitted = jax.jit(step, donate_argnums=(0,))
    return _spmd_wrap(
        jitted, mesh=mesh, sweep_parallel=sweep_parallel,
        feature_parallel=feature_parallel,
    )


def _auto_layout_jit(step):
    """jit the train step with compiler-chosen (AUTO) layouts on the carried
    SweepState, carrying the state in that layout between steps.

    XLA's preferred layout for the W_enc-shaped leaves (params + Adam m/v) is
    transposed relative to the row-major default the state is created with:
    the encoder-gradient contraction emits d[W;b] with d_sae minor while the
    encode matmul wants d_model minor. With default entry/exit layouts the
    compiler reconciles by copying — six 64 MB relayouts per step at the
    production shape (profiled: ~1.2 ms of the 36.6 ms step). AOT-compiling
    with `Format(Layout.AUTO)` on the state argument and result lets XLA pin
    its preferred layout at the jit boundary; the first call relayouts the
    incoming state once (and after any checkpoint reload or step-variant
    switch), then every output feeds the next step copy-free.

    Falls back to the plain jit if AUTO compilation fails on this backend or
    the chosen input and output layouts disagree (carrying the state would
    then relayout every step, worse than the copies)."""
    from jax.experimental.layout import Format, Layout

    auto = Format(Layout.AUTO)
    jitted = jax.jit(
        step, donate_argnums=(0,),
        in_shardings=(auto, None, None, None), out_shardings=(auto, None),
    )
    # AOT-compiled executables are shape-specialized (no retrace on a new
    # shape, unlike plain jit), so key the cache on the argument shapes.
    cache: dict[tuple, tuple] = {}
    plain = None

    def call(ts, x, prefixes, hp):
        nonlocal plain
        key = tuple(
            (l.shape, str(l.dtype))
            for l in jax.tree.leaves((ts, x, prefixes, hp))
        )
        if key not in cache:
            try:
                comp = jitted.lower(ts, x, prefixes, hp).compile()
                in_fmt = comp.input_formats[0][0]
                out_fmt = comp.output_formats[0]
                if jax.tree.all(jax.tree.map(
                    lambda a, b: a.layout == b.layout, in_fmt, out_fmt
                )):
                    cache[key] = (comp, in_fmt)
                else:  # pragma: no cover - compiler-dependent
                    logger.info(
                        "AUTO in/out layouts disagree; keeping default layouts."
                    )
                    plain = plain or jax.jit(step, donate_argnums=(0,))
                    cache[key] = (plain, None)
            except Exception as exc:  # pragma: no cover - backend-dependent
                logger.info("AUTO-layout jit unavailable (%s); plain jit.", exc)
                plain = plain or jax.jit(step, donate_argnums=(0,))
                cache[key] = (plain, None)
        fn, fmt = cache[key]
        if fmt is not None and jax.tree.map(lambda l: l.format, ts) != fmt:
            ts = jax.device_put(ts, fmt)
        return fn(ts, x, prefixes, hp)

    return call


def _spmd_wrap(jitted, *, mesh, sweep_parallel: int = 1, feature_parallel: int = 1):
    """Make a jitted function whose batch operand is data-sharded safe for
    the Pallas dispatch layer. Applies to EVERY jit that reaches the kernels
    with sharded inputs (train step, heavy metrics, eval forwards) — GSPMD
    cannot partition tpu_custom_call, so an unwrapped sharded trace either
    fails to partition or replicates the global batch onto every chip.

    Pure data parallelism installs the `ops.shmap` trace-time context (each
    kernel call becomes a shard_map region over the data axis). Sweep- or
    feature-sharded traces instead force the XLA kernel fallbacks
    (`topk.FORCE_LAX`, scoped to this trace: a later pure-DP jit in the same
    process must keep its Pallas kernels)."""
    if feature_parallel == 1 and sweep_parallel == 1:
        if mesh is None or mesh.shape.get(parallel.DATA_AXIS, 1) == 1:
            return jitted

        from ..ops import shmap as _shmap

        def dp_call(*args, **kwargs):
            with _shmap.batch_sharded(mesh, (parallel.DATA_AXIS,)):
                return jitted(*args, **kwargs)

        return dp_call

    from ..ops import topk as _topk

    def scoped_call(*args, **kwargs):
        prev = _topk.FORCE_LAX
        _topk.FORCE_LAX = True
        try:
            return jitted(*args, **kwargs)
        finally:
            _topk.FORCE_LAX = prev

    return scoped_call


def make_metrics_fn(
    sae_cfg: modeling.SparseAutoencoderConfig,
    sweep_vmap_width: int = 1,
    sweep_parallel: int = 1,
    mesh=None,
    feature_parallel: int = 1,
):
    """Heavy per-SAE metrics computed every log_every steps (reference
    train.py:365-432): explained variance, dead %, coherence, SSE terms. Re-runs
    the (eval-mode-free) forward on the current params; amortized over log_every."""

    def one(params, sae_state, x, prefixes):
        enc, _ = modeling.encode(sae_cfg, params, sae_state, x, training=True)
        x_hat = modeling.decode(sae_cfg, params, enc.f_x)[:, -1, :]
        residual = x - x_hat
        sse_sae = jnp.sum(residual**2)
        explained_var = 1.0 - jnp.var(residual) / jnp.var(x)
        dead_pct = jnp.mean(
            (jnp.sum(jnp.abs(enc.f_x) > 1e-12, axis=0) == 0).astype(jnp.float32)
        )
        coherence = dictionary_coherence(params["W_dec"])
        avg_row_norm = jnp.mean(jnp.linalg.norm(params["W_dec"], axis=1))
        return {
            "sse_sae": sse_sae,
            "explained_variance": explained_var,
            "dead_unit_pct": dead_pct,
            "dictionary_coherence": coherence,
            "avg_decoder_row_norm": avg_row_norm,
        }

    def metrics(ts: SweepState, x: Array, prefixes: Array):
        n_batch = x.shape[0]
        sum_sq = jnp.sum(x * x)
        sum_vec = jnp.sum(x, axis=0)
        sse_baseline = sum_sq - jnp.dot(sum_vec, sum_vec) / n_batch
        per_sae = _sweep_map(
            lambda a: one(a[0], a[1], x, a[2]),
            (ts.params, ts.sae_state, prefixes),
            sweep_vmap_width,
            sweep_parallel=sweep_parallel, mesh=mesh,
        )
        per_sae["sse_baseline"] = jnp.broadcast_to(
            sse_baseline, per_sae["sse_sae"].shape
        )
        per_sae["normalized_mse"] = per_sae["sse_sae"] / sse_baseline
        return per_sae

    # Same SPMD treatment as the train step: this jit reaches the Pallas kth
    # kernels (encode -> topk_activation) with a data-sharded x.
    return _spmd_wrap(
        jax.jit(metrics), mesh=mesh, sweep_parallel=sweep_parallel,
        feature_parallel=feature_parallel,
    )


# ---------------------------------------------------------------------------
# Training driver
# ---------------------------------------------------------------------------


class _CohortRuntime(tp.NamedTuple):
    cohort: Cohort
    ts: SweepState
    step_fn: tp.Any
    metrics_fn: tp.Any
    hp: dict[str, Array]
    prefix_rng: np.random.Generator
    # AuxK three-phase stepping: no latent can be dead before
    # dead_threshold_tokens of training, so steps < aux_from_step use
    # step_fn_warm (AuxK statically compiled out, ~19 ms cheaper at
    # production shape). After that, the smallest dead-subspace variant in
    # step_fn_subs whose cap the lagged risk counter proves sufficient runs
    # (~11 ms cheaper at the tight rung); the dense step_fn is the
    # always-correct fallback.
    step_fn_warm: tp.Any = None
    aux_from_step: int = 0
    # [(cap, step_fn), ...] ascending by cap.
    step_fn_subs: list = None
    # Mutable routing state (shared across _replace copies by design):
    # pending [(step_idx, stats), ...] awaiting risk readout, and the newest
    # proven bound in risk[0] (None = unknown, use dense).
    pending: list = None
    risk: list = None

    def step_fn_at(self, global_step: int):
        if self.step_fn_warm is not None and global_step < self.aux_from_step:
            return self.step_fn_warm
        if not self.step_fn_subs:
            return self.step_fn
        # Drain stats that are AUX_RISK_HORIZON+ steps old. Reading them can
        # block only until that step's compute finished — at least one newer
        # step is already enqueued, so the device never idles on the readout.
        while self.pending and self.pending[0][0] <= global_step - AUX_RISK_HORIZON:
            _, stats = self.pending.pop(0)
            self.risk[0] = int(np.max(np.asarray(stats["aux_risk"])))
        if self.risk[0] is not None:
            for cap, fn in self.step_fn_subs:
                if self.risk[0] <= cap:
                    return fn
        return self.step_fn

    def record_stats(self, global_step: int, stats) -> None:
        # Warm-phase stats before (aux_from_step - horizon) would never be
        # read; skip them so pending stays O(horizon).
        if self.step_fn_subs and (
            global_step >= self.aux_from_step - AUX_RISK_HORIZON
        ):
            self.pending.append((global_step, stats))


def _device_mesh(batch_size: int, sweep: int = 1, feature: int = 1):
    """All devices whose data extent divides the batch size, with the requested
    sweep- and feature-axis extents."""
    devices = jax.devices()
    n = len(devices)
    assert n % (sweep * feature) == 0, (
        f"{n} devices not divisible by sweep_parallel={sweep} x "
        f"feature_parallel={feature}"
    )
    n_data = n // (sweep * feature)
    while n_data > 1 and batch_size % n_data != 0:
        n_data -= 1
    return parallel.make_mesh(
        n_devices=n_data * sweep * feature, sweep=sweep, feature=feature
    )


def _partitioned_data_cfg(data_cfg, what: str):
    """Per-process slice of a loader config under multi-host SPMD: 1/world of
    the global batch rows off this process's disjoint shard partition
    (identity when single-process). drop_last because a short local batch at
    one rank's epoch boundary would break global-batch assembly — ranks must
    contribute equal row counts; BatchLimiter cycles epochs, so no data is
    lost."""
    world = jax.process_count()
    if world == 1:
        return data_cfg
    assert data_cfg.batch_size % world == 0, (
        f"Global {what} batch_size={data_cfg.batch_size} must divide "
        f"across {world} processes."
    )
    return dataclasses.replace(
        data_cfg,
        batch_size=data_cfg.batch_size // world,
        rank=jax.process_index(),
        world=world,
        drop_last=True,
    )


def _check_full_mesh(mesh, batch_size: int, sweep: int, feature: int) -> None:
    """Multi-host: the mesh must span every global device. `_device_mesh`
    shrinks the data axis until it divides the batch size; a partial mesh
    would make `make_array_from_process_local_data`'s per-process shard
    math (and every collective) straddle hosts unevenly and fail mid-run."""
    if jax.process_count() > 1:
        assert mesh.devices.size == jax.device_count(), (
            f"Global batch_size={batch_size} must be a multiple of the "
            f"data-axis extent {jax.device_count() // (sweep * feature)}; "
            "multi-host batch assembly needs every device in the mesh."
        )


def train(
    cfgs: list[Config],
) -> tuple[list[_CohortRuntime], ParallelWandbRun, int]:
    """Train a parallel sweep of SAEs on one shared data stream
    (reference train.py:239-462)."""
    if len(split_cfgs(cfgs)) != 1:
        raise ValueError(f"Configs are not parallelizeable: {cfgs}.")

    logger.info("Parallelizing %d runs.", len(cfgs))
    cfg = cfgs[0]

    # Multi-host SPMD (jax.distributed initialized, process_count > 1): this
    # process loads 1/world of each global batch from its disjoint shard
    # partition; `parallel.shard_batch` assembles the slices into one global
    # array. Host-side writes (wandb, checkpoints, run dirs) gate on process 0.
    world = jax.process_count()
    data_cfg = _partitioned_data_cfg(cfg.train_data, "train")

    dataloader = ShuffledDataLoader(data_cfg)
    metadata = dataloader.metadata
    if metadata.d_model != cfg.sae.d_model:
        raise guards.GuardError(
            f"sae.d_model={cfg.sae.d_model} does not match the shards' "
            f"d_model={metadata.d_model} ({cfg.train_data.shards}); the SAE "
            "must be configured for the model family the shards were "
            "extracted from."
        )
    limited = scheduling.BatchLimiter(dataloader, cfg.n_train // world)
    n_steps = len(limited)

    mesh = _device_mesh(
        cfg.train_data.batch_size, cfg.sweep_parallel, cfg.feature_parallel
    )
    _check_full_mesh(
        mesh, cfg.train_data.batch_size, cfg.sweep_parallel, cfg.feature_parallel
    )
    logger.info("Mesh: %d device(s) over '%s'.", mesh.devices.size, parallel.DATA_AXIS)

    cohorts = make_cohorts(cfgs)
    runtimes: list[_CohortRuntime] = []
    for ci, cohort in enumerate(cohorts):
        params, sae_state, obj_state = make_saes(
            cohort.cfgs, limited, seed=cfg.seed + ci
        )
        c0 = cohort.cfgs[0]
        # Sweep axis shards over `sweep`; with feature_parallel the latent
        # (d_sae) dims additionally shard over `feature` (both replicate at
        # extent 1 — shard_features degenerates to shard_sweep).
        place = (
            (lambda t: parallel.shard_features(mesh, t, c0.sae.d_sae))
            if cfg.feature_parallel > 1
            else (lambda t: parallel.shard_sweep(mesh, t))
        )
        params = place(params)
        sae_state = place(sae_state)
        obj_state = place(obj_state)
        opt_init = _adam_init if c0.optim == "adam" else _muon_init
        ts = SweepState(
            params=params,
            sae_state=sae_state,
            obj_state=obj_state,
            opt_state=place(opt_init(params)),
            step=jnp.zeros((), jnp.int32),
        )
        hp = {
            k: parallel.shard_sweep(mesh, jnp.asarray(v))
            for k, v in _hp_arrays(cohort.cfgs).items()
        }
        # Chunking composes with a device-sharded sweep axis (_sweep_map
        # rearranges chunks so the scan axis is unsharded): sweep_vmap_width
        # bounds PER-DEVICE memory. shard_sweep silently replicates
        # non-divisible cohorts, so reject that combination loudly instead.
        eff_width = c0.sweep_vmap_width
        if c0.sweep_parallel > 1:
            if len(cohort.cfgs) % c0.sweep_parallel != 0:
                raise ValueError(
                    f"Cohort of {len(cohort.cfgs)} SAEs is not divisible by "
                    f"sweep_parallel={c0.sweep_parallel}; the sweep axis would "
                    "be silently replicated instead of sharded."
                )
            per_dev = len(cohort.cfgs) // c0.sweep_parallel
            eff_width = min(eff_width, per_dev)
            if per_dev % eff_width != 0:
                raise ValueError(
                    f"sweep_vmap_width={c0.sweep_vmap_width} must divide the "
                    f"per-device sweep size {per_dev} (cohort of "
                    f"{len(cohort.cfgs)} over sweep_parallel={c0.sweep_parallel})."
                )
        step_kwargs = dict(
            sweep_vmap_width=eff_width,
            sweep_parallel=c0.sweep_parallel, mesh=mesh,
            feature_parallel=cfg.feature_parallel,
        )
        # Steps [0, aux_from_step) cannot produce a dead latent: within
        # 0-based step i the counters reach at most (i+1)*bsz, and dead
        # requires >= dead_threshold_tokens, so the first step that can see a
        # dead latent is ceil(threshold/bsz) - 1. The warm step compiles AuxK
        # out. Valid across resume too (restored counters are <= step*bsz).
        has_aux = isinstance(c0.sae.activation.aux, modeling.AuxK)
        bsz = cfg.train_data.batch_size
        aux_from_step = (
            max(0, -(-c0.objective.dead_threshold_tokens // bsz) - 1)
            if has_aux
            else n_steps + 1
        )
        aux_caps = (
            objectives.subspace_cap_ladder(
                c0.sae.d_sae, c0.sae.activation.aux.k_aux
            )
            if has_aux
            else []
        )
        runtimes.append(
            _CohortRuntime(
                cohort=cohort,
                ts=ts,
                step_fn=make_train_step(
                    c0.sae, c0.objective, n_steps, c0.optim, c0.matmul_precision,
                    **step_kwargs,
                ),
                step_fn_warm=make_train_step(
                    c0.sae, c0.objective, n_steps, c0.optim, c0.matmul_precision,
                    aux_enabled=False, **step_kwargs,
                )
                if has_aux and aux_from_step > 0
                else None,
                step_fn_subs=[
                    (
                        cap,
                        make_train_step(
                            c0.sae, c0.objective, n_steps, c0.optim,
                            c0.matmul_precision, aux_subspace_cap=cap,
                            **step_kwargs,
                        ),
                    )
                    for cap in aux_caps
                ],
                pending=[],
                risk=[None],
                aux_from_step=aux_from_step,
                metrics_fn=make_metrics_fn(
                    c0.sae, sweep_vmap_width=eff_width,
                    sweep_parallel=c0.sweep_parallel, mesh=mesh,
                    feature_parallel=c0.feature_parallel,
                ),
                hp=hp,
                prefix_rng=np.random.default_rng(cfg.seed + 1000 + ci),
            )
        )

    # Resume from the latest saved train state (stable key per training group;
    # sha256 — Python's hash() is randomized per process).
    import hashlib

    group_key = hashlib.sha256(
        repr(_parallel_key(cfg)).encode()
    ).hexdigest()[:16]
    start_step = 0
    if cfg.resume:
        # The latest step SHARED by every cohort: per-cohort saves are
        # sequential, so a crash can land between them — a max-over-c0 choice
        # would then demand a step some cohort never saved and brick resume.
        step_sets = [
            set(checkpoints.available_steps(cfg.runs_root, f"{group_key}_c{ci}"))
            for ci in range(len(runtimes))
        ]
        common = set.intersection(*step_sets) if step_sets else set()
        latest = max(common) if common else None
        if latest is not None:
            for ci, rt in enumerate(runtimes):
                # Every process restores (orbax reads the shared checkpoint
                # dir and returns full global host values); place_like puts
                # them back onto the template's exact device shardings —
                # jnp.asarray here would commit everything to one local
                # device and break the meshed step (multi-host or
                # sweep/feature-sharded states).
                restored = checkpoints.restore(
                    cfg.runs_root, f"{group_key}_c{ci}", latest, rt.ts
                )
                runtimes[ci] = rt._replace(
                    ts=parallel.place_like(rt.ts, restored)
                )
            start_step = latest
            logger.info("Resuming training from step %d.", start_step)
        else:
            logger.info("No saved train state found; starting fresh.")

    mode = "online" if cfg.track else "disabled"
    metadata_dict = dataclasses.asdict(metadata)
    wandb_configs = []
    for c in cfgs:
        cfg_dict = dataclasses.asdict(c)
        cfg_dict["train_data"]["metadata"] = metadata_dict
        wandb_configs.append(cfg_dict)
    run = (
        ParallelWandbRun(cfg.wandb_project, wandb_configs, mode, list(cfg.tags))
        if parallel.is_primary()
        else NullParallelRun()
    )
    slurm_job_id = os.environ.get("SLURM_JOB_ID")
    if slurm_job_id:
        run.set_summary("slurm_job_id", slurm_job_id)

    dl_monitor = DataloaderMonitor(dataloader)
    global_step, n_patches_seen = start_step, start_step * cfg.train_data.batch_size

    import itertools

    batches = helpers.progress(limited, every=cfg.log_every, desc="train")
    if start_step:
        # The stream restarts reshuffled on resume; only consume the remaining
        # step budget.
        batches = itertools.islice(iter(batches), max(n_steps - start_step, 0))

    # Double-buffered device prefetch: batch i+1 transfers to HBM while step i
    # computes (SURVEY.md §7.2 step 4).
    for x, batch in parallel.prefetch_to_device(batches, mesh, depth=2):
        n_patches_seen += x.shape[0]

        log_now = (global_step + 1) % cfg.log_every == 0
        all_metrics: list[dict[str, object]] = [None] * len(cfgs)

        for ri, rt in enumerate(runtimes):
            n_sae = len(rt.cohort.cfgs)
            n_prefixes = rt.cohort.cfgs[0].objective.n_prefixes
            d_sae = rt.cohort.cfgs[0].sae.d_sae
            prefixes = jnp.asarray(
                np.stack([
                    objectives.sample_prefixes(d_sae, n_prefixes, rng=rt.prefix_rng)
                    for _ in range(n_sae)
                ])
            )
            new_ts, stats = rt.step_fn_at(global_step)(rt.ts, x, prefixes, rt.hp)
            rt.record_stats(global_step, stats)

            if log_now:
                heavy = rt.metrics_fn(new_ts, x, prefixes)
                stats_np = jax.tree.map(np.asarray, stats)
                heavy_np = jax.tree.map(np.asarray, heavy)
                dl_metrics = dl_monitor.compute()
                dl_metrics.update(
                    statistics.calc_batch_entropy(
                        batch["example_idx"],
                        batch["token_idx"],
                        metadata.n_examples,
                        metadata.content_tokens_per_example,
                    )
                )
                for si, gi in enumerate(rt.cohort.indices):
                    all_metrics[gi] = {
                        "loss/loss": float(stats_np["loss"][si]),
                        "loss/mse": float(stats_np["mse"][si]),
                        "loss/l0": float(stats_np["l0"][si]),
                        "loss/l1": float(stats_np["l1"][si]),
                        "loss/sparsity": float(stats_np["sparsity"][si]),
                        "loss/aux": float(stats_np["aux"][si]),
                        "loss/n_dead": int(stats_np["n_dead"][si]),
                        "progress/n_patches_seen": n_patches_seen,
                        "progress/learning_rate": float(stats_np["lr"][si]),
                        "metrics/explained_variance": float(heavy_np["explained_variance"][si]),
                        "metrics/dead_unit_pct": float(heavy_np["dead_unit_pct"][si]),
                        "metrics/dictionary_coherence": float(heavy_np["dictionary_coherence"][si]),
                        "metrics/avg_decoder_row_norm": float(heavy_np["avg_decoder_row_norm"][si]),
                        "metrics/grad_norm": float(stats_np["grad_norm"][si]),
                        "metrics/sse_sae": float(heavy_np["sse_sae"][si]),
                        "metrics/sse_baseline": float(heavy_np["sse_baseline"][si]),
                        "metrics/normalized_mse": float(heavy_np["normalized_mse"][si]),
                        **dl_metrics,
                    }

            runtimes[ri] = rt._replace(ts=new_ts)
            # The routing state (pending/risk) is MUTABLE and must stay shared
            # across _replace copies — step_fn_at mutates it in place. Guard
            # the aliasing so a future _replace(pending=..., risk=...) or a
            # deepcopy-style refactor fails here, not as a silent mis-route.
            assert (
                runtimes[ri].pending is rt.pending
                and runtimes[ri].risk is rt.risk
            ), "cohort routing state must alias across _replace copies"

        if log_now:
            run.log(all_metrics, step=global_step)
            m0 = all_metrics[0]
            logger.info(
                ", ".join(
                    f"{k.split('/')[-1]}: {v:.5f}"
                    for k, v in m0.items()
                    if k.startswith("loss/")
                )
            )

        global_step += 1

        if cfg.profile_dir is not None:
            if global_step == 10:
                jax.profiler.start_trace(str(cfg.profile_dir))
                logger.info("Started jax.profiler trace -> %s", cfg.profile_dir)
            elif global_step == 20:
                jax.profiler.stop_trace()
                logger.info("Stopped jax.profiler trace.")

        if cfg.ckpt_every and global_step % cfg.ckpt_every == 0:
            for ci, rt in enumerate(runtimes):
                # Both to_host (an allgather for cross-process-sharded
                # leaves) and checkpoints.save (orbax's internal multihost
                # barrier; it gates file writes to the primary itself) are
                # collectives — every process calls them. Pruning waits until
                # EVERY cohort saved this step (prune=False): a crash between
                # the sequential saves must leave a previous step restorable
                # for all cohorts.
                host_ts = parallel.to_host(rt.ts)
                checkpoints.save(
                    cfg.runs_root, f"{group_key}_c{ci}", global_step, host_ts,
                    prune=False,
                )
            for ci in range(len(runtimes)):
                checkpoints.prune_below(
                    cfg.runs_root, f"{group_key}_c{ci}", global_step
                )

    return runtimes, run, global_step


# ---------------------------------------------------------------------------
# Evaluation (reference train.py:510-618)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class EvalMetrics:
    """Results of evaluating a trained SAE on a dataset (reference train.py:467-507)."""

    l0: float
    l1: float
    mse: float
    normalized_mse: float
    sse_sae: float
    sse_baseline: float
    n_dead: int
    n_almost_dead: int
    n_dense: int
    freqs: np.ndarray
    mean_values: np.ndarray
    almost_dead_threshold: float
    dense_threshold: float

    def for_wandb(self) -> dict[str, object]:
        dct = dataclasses.asdict(self)
        dct["freqs"] = dct["freqs"].tolist()
        dct["mean_values"] = dct["mean_values"].tolist()
        return {f"eval/{key}": value for key, value in dct.items()}


def evaluate(cfgs: list[Config], runtimes: list[_CohortRuntime]) -> list[EvalMetrics]:
    """Eval pass over the val loader: L0/L1/MSE, normalized MSE vs mean baseline,
    per-feature firing stats, dead/almost-dead/dense counts."""
    if len(split_cfgs(cfgs)) != 1:
        raise ValueError(f"Configs are not parallelizeable: {cfgs}.")

    cfg = cfgs[0]
    almost_dead_lim, dense_lim = 1e-7, 1e-2

    # Same per-process partitioning as training (train()).
    world = jax.process_count()
    val_cfg = _partitioned_data_cfg(cfg.val_data, "val")

    dataloader = ShuffledDataLoader(val_cfg)
    n_val = min(dataloader.n_samples, cfg.n_val // world)
    if world > 1:
        # Shard partitions can be uneven; every process must run the SAME
        # number of (collective-bearing) eval batches.
        n_val = int(parallel.global_min(np.asarray(n_val)))
    limited = scheduling.BatchLimiter(dataloader, n_val)
    # Same mesh shape as training (sweep/feature extents included) so params
    # keep their placement instead of resharding on the first eval batch.
    mesh = _device_mesh(
        cfg.val_data.batch_size, cfg.sweep_parallel, cfg.feature_parallel
    )
    _check_full_mesh(
        mesh, cfg.val_data.batch_size, cfg.sweep_parallel, cfg.feature_parallel
    )

    n_cfgs = len(cfgs)
    d_sae = cfgs[0].sae.d_sae
    n_fired = np.zeros((n_cfgs, d_sae), dtype=np.float64)
    values = np.zeros((n_cfgs, d_sae), dtype=np.float64)
    total_l0 = np.zeros(n_cfgs, dtype=np.float64)
    total_l1 = np.zeros(n_cfgs, dtype=np.float64)
    total_mse = np.zeros(n_cfgs, dtype=np.float64)
    total_sse = np.zeros(n_cfgs, dtype=np.float64)
    sum_sq, n_tokens = 0.0, 0
    sum_vec = np.zeros(cfgs[0].sae.d_model, dtype=np.float64)

    eval_fns = {}
    for ri, rt in enumerate(runtimes):
        c0 = rt.cohort.cfgs[0]

        # Same memory bound as training: vmapping N eval forwards
        # materializes N x (batch, d_sae) intermediates; chunking composes
        # with a device-sharded sweep axis (see _sweep_map, with the same
        # mesh as training so the chunk rearrange keeps its constraints).
        width = c0.sweep_vmap_width
        if c0.sweep_parallel > 1:
            width = min(width, len(rt.cohort.cfgs) // c0.sweep_parallel)

        def make(c0=c0, width=width):
            @jax.jit
            def run(params, sae_state, obj_state, x, prefixes):
                def one(args):
                    p, ss, os_, pfx = args
                    loss, out, _, _ = objectives.matryoshka_loss(
                        c0.objective, c0.sae, p, ss, os_, x, pfx, training=False
                    )
                    residual = x - out.x_hats[:, -1, :]
                    return {
                        "l0": loss.l0,
                        "l1": loss.l1,
                        "mse": loss.mse,
                        "sse": jnp.sum(residual**2),
                        "n_fired": jnp.sum(out.f_x > 0, axis=0).astype(jnp.float32),
                        "values": jnp.sum(out.f_x, axis=0),
                    }

                return _sweep_map(
                    one, (params, sae_state, obj_state, prefixes), width,
                    sweep_parallel=c0.sweep_parallel, mesh=mesh,
                )

            return run

        # Eval forwards also reach the Pallas kth kernels with a data-sharded
        # x — same SPMD wrapping as the train step and heavy metrics.
        eval_fns[ri] = _spmd_wrap(
            make(), mesh=mesh, sweep_parallel=c0.sweep_parallel,
            feature_parallel=c0.feature_parallel,
        )

    # Double-buffered device prefetch, same as the train loop: batch i+1
    # transfers to HBM while batch i's eval forwards run.
    batches = helpers.progress(limited, desc="eval", every=cfg.log_every)
    for x, batch in parallel.prefetch_to_device(batches, mesh, depth=2):
        # batch["act"] is this process's local slice; x is the assembled
        # global batch. Host f64 accumulators sum locally and cross processes
        # once at the end (parallel.global_sum); per-batch jit outputs below
        # are already global (replicated) values.
        x_np = np.asarray(batch["act"])
        bsz = x.shape[0]
        x64 = x_np.astype(np.float64)
        sum_sq += float(np.sum(x64 * x64))
        sum_vec += x64.sum(axis=0)
        n_tokens += bsz

        for ri, rt in enumerate(runtimes):
            n_sae = len(rt.cohort.cfgs)
            n_prefixes = rt.cohort.cfgs[0].objective.n_prefixes
            prefixes = jnp.asarray(
                np.stack([
                    objectives.sample_prefixes(d_sae, n_prefixes, rng=rt.prefix_rng)
                    for _ in range(n_sae)
                ])
            )
            out = parallel.to_host(
                eval_fns[ri](rt.ts.params, rt.ts.sae_state, rt.ts.obj_state, x, prefixes)
            )
            for si, gi in enumerate(rt.cohort.indices):
                total_l0[gi] += float(out["l0"][si]) * bsz
                total_l1[gi] += float(out["l1"][si]) * bsz
                total_mse[gi] += float(out["mse"][si]) * bsz
                total_sse[gi] += float(out["sse"][si])
                n_fired[gi] += out["n_fired"][si]
                values[gi] += out["values"][si]

    assert n_tokens > 0, "Validation dataloader yielded zero tokens."
    if world > 1:
        sum_sq = float(parallel.global_sum(np.asarray(sum_sq)))
        sum_vec = parallel.global_sum(sum_vec)
    sse_baseline = sum_sq - float(sum_vec @ sum_vec) / n_tokens
    assert sse_baseline > 0, (
        f"Validation baseline variance non-positive: sse_baseline={sse_baseline:.6e}"
    )

    with np.errstate(divide="ignore", invalid="ignore"):
        mean_values = values / n_fired
    freqs = n_fired / n_tokens

    metrics = []
    for i in range(n_cfgs):
        metrics.append(
            EvalMetrics(
                l0=float(total_l0[i] / n_tokens),
                l1=float(total_l1[i] / n_tokens),
                mse=float(total_mse[i] / n_tokens),
                normalized_mse=float(total_sse[i] / sse_baseline),
                sse_sae=float(total_sse[i]),
                sse_baseline=sse_baseline,
                n_dead=int((freqs[i] == 0).sum()),
                n_almost_dead=int((freqs[i] < almost_dead_lim).sum()),
                n_dense=int((freqs[i] > dense_lim).sum()),
                freqs=freqs[i],
                mean_values=mean_values[i],
                almost_dead_threshold=almost_dead_lim,
                dense_threshold=dense_lim,
            )
        )
    return metrics


# ---------------------------------------------------------------------------
# Worker + parallel grouping + main (reference train.py:193-235, :626-797)
# ---------------------------------------------------------------------------


def worker_fn(cfgs: list[Config]) -> list[str]:
    logging.basicConfig(
        level=logging.INFO,
        format="[%(asctime)s] [%(levelname)s] [%(name)s] %(message)s",
    )
    runtimes, run, steps = train(cfgs)
    eval_metrics = evaluate(cfgs, runtimes)
    run.log([m.for_wandb() for m in eval_metrics], step=steps)
    ids = run.finish()

    # Unstack the trained sweep back into per-config checkpoints. to_host is
    # a collective for cross-process-sharded leaves, so it runs on every
    # process; the run-dir writes below only happen on process 0 (run.finish
    # returns no ids on secondaries — NullParallelRun).
    flat: dict[int, tuple[Config, modeling.Params, modeling.State]] = {}
    for rt in runtimes:
        params_np = parallel.to_host(rt.ts.params)
        state_np = parallel.to_host(rt.ts.sae_state)
        for si, gi in enumerate(rt.cohort.indices):
            flat[gi] = (
                rt.cohort.cfgs[si],
                jax.tree.map(lambda a: a[si], params_np),
                jax.tree.map(lambda a: a[si], state_np),
            )

    for gi, id in enumerate(ids):
        cfg, params, state = flat[gi]
        metric = eval_metrics[gi]
        logger.info(
            "Checkpoint %s: %d dense, %d dead, %d almost-dead features.",
            id, metric.n_dense, metric.n_dead, metric.n_almost_dead,
        )
        run_dir = disk.Run.new(
            id,
            train_shards_dir=cfg.train_data.shards,
            val_shards_dir=cfg.val_data.shards,
            runs_root=cfg.runs_root,
        )
        nn.dump(run_dir.ckpt, cfg.sae, params, state)
        logger.info("Dumped checkpoint to '%s'.", run_dir.ckpt)
        with open(run_dir.run_dir / "checkpoint" / "config.json", "wb") as fd:
            helpers.jdump(cfg, fd, indent=2)

    parallel.sync("worker_done")
    return ids


CANNOT_PARALLELIZE = set([
    "sweep_parallel",
    "feature_parallel",
    "train_data",
    "val_data",
    "n_train",
    "n_val",
    "track",
    "wandb_project",
    "tags",
    "log_every",
    "runs_root",
    "device",
    "slurm_acct",
    "slurm_partition",
    "n_hours",
    "log_to",
    "sae.d_sae",
    "sae.d_model",
    "sae.reinit_blend",
    "sae.reinit_enc_dec_tranpose",
])


def _parallel_key(cfg: Config) -> tuple:
    """Grouping key ignoring dataloader seeds but respecting all other
    non-parallelizable fields (reference train.py:649-666)."""
    d = dataclasses.asdict(cfg)
    for field in ("train_data", "val_data"):
        sub = dict(d[field])
        sub["seed"] = "IGNORED_FOR_PARALLEL"
        d[field] = sub
    return tuple(
        (key, helpers.make_hashable(helpers.get(d, key)))
        for key in sorted(CANNOT_PARALLELIZE)
    )


def split_cfgs(cfgs: list[Config]) -> list[list[Config]]:
    """Split configs into groups that can train on one shared data stream
    (reference train.py:670-695)."""
    groups = collections.defaultdict(list)
    for cfg in cfgs:
        groups[_parallel_key(cfg)].append(cfg)
    return [
        [
            dataclasses.replace(
                cfg,
                train_data=dataclasses.replace(cfg.train_data, seed=cfg.seed),
                val_data=dataclasses.replace(cfg.val_data, seed=cfg.seed),
            )
            for cfg in group
        ]
        for _, group in sorted(groups.items())
    ]


def _split_by_cap(group: list[Config], cap: int) -> list[list[Config]]:
    assert cap > 0, "max_parallel must be > 0"
    return [group[start:end] for start, end in helpers.batched_idx(len(group), cap)]


def main(
    cfg: Config,
    sweep: pathlib.Path | None = None,
    max_parallel: int | None = None,
):
    """Train SAEs, optionally as a parallel grid search (reference train.py:706-797).

    Jobs run inline by default; with slurm_acct set and submitit available, they
    are submitted as Slurm batch jobs.
    """
    logging.basicConfig(
        level=logging.INFO,
        format="[%(asctime)s] [%(levelname)s] [%(name)s] %(message)s",
    )

    if sweep is not None:
        sweep_dcts = configs.load_sweep(sweep)
        if not sweep_dcts:
            logger.error("No valid sweeps found in '%s'.", sweep)
            raise SystemExit(1)
        cfgs, errs = configs.load_cfgs(cfg, default=Config(), sweep_dcts=sweep_dcts)
        if errs:
            for err in errs:
                logger.warning("Error in config: %s", err)
            return []
    else:
        cfgs = [cfg]

    groups = split_cfgs(cfgs)
    if max_parallel:
        groups = [sub for group in groups for sub in _split_by_cap(group, max_parallel)]

    logger.info("Running %d training jobs.", len(groups))
    cfg = groups[0][0]

    if cfg.slurm_acct:
        try:
            import submitit
        except ImportError as err:
            raise RuntimeError(
                "slurm_acct set but submitit is not installed; run without Slurm."
            ) from err
        executor = submitit.SlurmExecutor(folder=cfg.log_to)
        executor.update_parameters(
            job_name="sae-train",
            time=int(cfg.n_hours * 60),
            partition=cfg.slurm_partition,
            ntasks_per_node=1,
            mem=f"{cfg.mem_gb}GB",
            stderr_to_stdout=True,
            account=cfg.slurm_acct,
        )
        with executor.batch():
            jobs = [executor.submit(worker_fn, group) for group in groups]
        time.sleep(5.0)
        ids = []
        for j, job in enumerate(jobs):
            try:
                ids.extend(job.result())
                logger.info("Job %d/%d finished.", j + 1, len(jobs))
            except Exception:
                logger.warning("Job %s (%d) did not finish.", job.job_id, j)
        return ids

    ids = []
    for group in groups:
        ids.extend(worker_fn(group))
    logger.info("Jobs done.")
    return ids
