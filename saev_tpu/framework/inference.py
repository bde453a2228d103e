"""SAE inference: one ordered pass dumping per-run artifacts.

Capability mirror of reference `src/saev/framework/inference.py` (Config at :44,
Filepaths at :80, need_compute at :110, worker_fn at :138, main at :289). Writes,
per (run, shard-hash), the same 5 files:

1. mean_values.pt     — (d_sae,) mean activation value per latent when firing
2. sparsity.pt        — (d_sae,) firing frequency per latent
3. distributions.pt   — (n_examples, n_dists) first-n latents per example
4. token_acts.npz     — scipy CSR sparse matrix of all token×latent activations
5. metrics.json       — validated `saev_tpu.metrics.Metrics`

TPU redesign: the per-batch compute (SAE forward + masked SSE/statistic partial
sums) is ONE jitted function; float64 accumulators (TPUs have no f64) are host
numpy float64 fed by on-device f32 partial sums per batch. CSR blocks are built
host-side from the jitted forward's f_x. The .pt artifacts are written with
torch.save purely as a codec so downstream reference tooling (`torch.load`)
reads them unchanged.
"""

import collections.abc
import dataclasses
import logging
import os
import pathlib
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse

from .. import configs, disk, guards, helpers, nn
from ..data import Metadata, OrderedConfig, OrderedDataLoader
from ..metrics import Metrics
from ..nn import modeling

logger = logging.getLogger("inference")


@dataclasses.dataclass(frozen=True)
class Config:
    """Configuration for computing SAE inference artifacts (reference inference.py:44-75)."""

    run: pathlib.Path = pathlib.Path("./runs/abcdefg")
    """Path to the run directory (containing checkpoint/sae.pt)."""
    data: OrderedConfig = OrderedConfig()
    """Data configuration."""
    n_dists: int = 25
    """Number of features to save distributions for."""
    ignore_labels: tuple[int, ...] = ()
    """Which token labels to ignore when calculating summarized image activations."""
    force_recompute: bool = False
    """Force recomputation even if files exist."""
    save: bool = True
    """Whether to write token_acts/statistics files. If False, only metrics.json."""
    device: str = "tpu"
    """Hardware platform (informational; JAX picks the active backend)."""
    slurm_acct: str = ""
    """Slurm account string. Empty means to not use Slurm."""
    slurm_partition: str = ""
    """Slurm partition."""
    n_hours: float = 4.0
    """Slurm job length in hours."""
    mem_gb: int = 80
    """Node memory in GB."""
    log_to: str = os.path.join(".", "logs")
    """Where to log job stdout/stderr."""


@dataclasses.dataclass(frozen=True)
class Filepaths:
    """The 5 artifact paths under runs/<id>/inference/<shard-hash>/
    (reference inference.py:80-105)."""

    mean_values: pathlib.Path
    sparsity: pathlib.Path
    distributions: pathlib.Path
    token_acts: pathlib.Path
    metrics: pathlib.Path

    @classmethod
    def from_run(cls, run: disk.Run, md: Metadata) -> "Filepaths":
        root = run.inference / md.hash
        root.mkdir(exist_ok=True, parents=True)
        return cls(
            mean_values=root / "mean_values.pt",
            sparsity=root / "sparsity.pt",
            distributions=root / "distributions.pt",
            token_acts=root / "token_acts.npz",
            metrics=root / "metrics.json",
        )

    def __iter__(self) -> collections.abc.Iterator[pathlib.Path]:
        yield from (
            self.mean_values,
            self.sparsity,
            self.distributions,
            self.token_acts,
            self.metrics,
        )


def need_compute(cfg: Config) -> tuple[bool, str, Filepaths]:
    """Idempotency check (reference inference.py:110-135)."""
    run = disk.Run(cfg.run)
    md = Metadata.load(cfg.data.shards)
    fpaths = Filepaths.from_run(run, md)

    required = list(fpaths) if cfg.save else [fpaths.metrics]
    mode = "full artifacts" if cfg.save else "metrics only"
    missing = [fpath for fpath in required if not fpath.exists()]

    if not cfg.force_recompute and not missing:
        return False, f"Found all required files ({mode}).", fpaths
    if cfg.force_recompute:
        return True, f"Force recompute flag set; computing {mode}.", fpaths
    missing_msg = ", ".join(str(f) for f in missing)
    return True, f"Missing files {missing_msg}; computing {mode}.", fpaths


def _make_infer_fn(sae_cfg: modeling.SparseAutoencoderConfig):
    """One jitted function per batch: SAE forward + masked partial sums.

    The label-ignore mask is computed host-side (numpy isin on the small label
    column) and traced in. Returns (f_x_masked, stats) where stats holds on-device
    f32 partial sums that the host accumulates in float64 across batches
    (SURVEY.md §7: TPUs have no f64; within-batch f32 tree-reduction keeps
    relative error ~1e-7).
    """

    @jax.jit
    def infer(params, state, x, mask):
        enc, _ = modeling.encode(sae_cfg, params, state, x, training=False)
        x_hat = modeling.decode(sae_cfg, params, enc.f_x)[:, 0, :]

        xm = jnp.where(mask[:, None], x, 0.0)
        diff = jnp.where(mask[:, None], x - x_hat, 0.0)
        f_masked = jnp.where(mask[:, None], enc.f_x, 0.0)

        stats = {
            "n_tokens": jnp.sum(mask),
            "sse_recon": jnp.sum(diff * diff),
            "sum_sq": jnp.sum(xm * xm),
            "sum_vec": jnp.sum(xm, axis=0),
            "mean_values": jnp.sum(f_masked, axis=0),
            "sparsity": jnp.sum(f_masked > 0, axis=0).astype(jnp.float32),
        }
        return f_masked, stats

    return infer


def worker_fn(cfg: Config) -> None:
    """Single ordered pass over the shards (reference inference.py:138-285)."""
    run = disk.Run(cfg.run)
    md = Metadata.load(cfg.data.shards)
    root = run.inference / md.hash

    do, reason, fpaths = need_compute(cfg)
    logger.info(reason)
    if not do:
        return

    root.mkdir(exist_ok=True, parents=True)
    with open(root / "config.json", "wb") as fd:
        helpers.jdump(cfg, fd)

    assert cfg.data.tokens == "content"
    sae_cfg, params, state = nn.load(run.ckpt)
    if sae_cfg.d_model != md.d_model:
        raise guards.GuardError(
            f"SAE checkpoint d_model={sae_cfg.d_model} ({run.ckpt}) does not "
            f"match the shards' d_model={md.d_model} ({cfg.data.shards})."
        )

    # Round the batch to a whole number of examples so distributions indexing and
    # the order asserts line up (reference inference.py:164-171).
    batch_size = max(
        cfg.data.batch_size
        // md.content_tokens_per_example
        * md.content_tokens_per_example,
        md.content_tokens_per_example,
    )
    dataloader = OrderedDataLoader(dataclasses.replace(cfg.data, batch_size=batch_size))
    n_samples = dataloader.n_samples

    d_sae = sae_cfg.d_sae
    if cfg.save:
        sparsity_s = np.zeros((d_sae,), dtype=np.float64)
        mean_values_s = np.zeros((d_sae,), dtype=np.float64)
        token_acts_blocks: list[scipy.sparse.csr_array] = []
        n_dists = min(cfg.n_dists, d_sae)
        distributions_nm = np.zeros((n_samples, n_dists), dtype=np.float32)

    sse_recon = 0.0
    sum_sq = 0.0
    sum_vec_s = np.zeros((sae_cfg.d_model,), dtype=np.float64)
    n_tokens = 0

    infer = _make_infer_fn(sae_cfg)
    ignore = np.asarray(cfg.ignore_labels, dtype=np.int64)
    logger.info("Loaded SAE and data.")

    prev_i = -1
    for batch in helpers.progress(dataloader, desc="infer"):
        x = jnp.asarray(batch["act"])
        if ignore.size and "token_labels" in batch:
            mask = np.isin(batch["token_labels"], ignore, invert=True)
        else:
            mask = np.ones(x.shape[0], dtype=bool)
        f_masked, stats = infer(params, state, x, jnp.asarray(mask))
        stats = jax.tree.map(np.asarray, stats)

        n_tokens += int(stats["n_tokens"])
        sse_recon += float(stats["sse_recon"])
        sum_sq += float(stats["sum_sq"])
        sum_vec_s += stats["sum_vec"].astype(np.float64)

        if not cfg.save:
            continue

        f_np = np.asarray(f_masked)
        batch_idx = (
            batch["example_idx"] * md.content_tokens_per_example + batch["token_idx"]
        )
        # Sequential-order invariants (reference inference.py:233-238).
        assert int(batch_idx[0]) == prev_i + 1
        assert (np.sort(batch_idx) == batch_idx).all()
        assert (np.arange(batch_idx[0], batch_idx[-1] + 1) == batch_idx).all()

        # distributions are indexed by global token position (the reference indexes
        # by example_idx with a token-granular array; we keep token granularity).
        distributions_nm[batch_idx] = f_np[:, :n_dists]
        mean_values_s += stats["mean_values"].astype(np.float64)
        sparsity_s += stats["sparsity"].astype(np.float64)
        token_acts_blocks.append(scipy.sparse.csr_array(f_np))
        prev_i = int(batch_idx[-1])

    if cfg.save:
        with np.errstate(divide="ignore", invalid="ignore"):
            mean_values_s = mean_values_s / sparsity_s
        sparsity_s = sparsity_s / n_samples

        token_acts = scipy.sparse.vstack(token_acts_blocks, format="csr")
        scipy.sparse.save_npz(fpaths.token_acts, token_acts)
        _torch_save(mean_values_s.astype(np.float32), fpaths.mean_values)
        _torch_save(sparsity_s.astype(np.float32), fpaths.sparsity)
        _torch_save(distributions_nm, fpaths.distributions)

    assert n_tokens > 0, (
        "Inference dataloader yielded zero valid tokens; cannot compute metrics."
    )
    sse_baseline = sum_sq - float(sum_vec_s @ sum_vec_s) / n_tokens
    if sse_baseline <= 0.0:
        raise RuntimeError(
            f"Baseline variance is non-positive (sse_baseline={sse_baseline:.6e}); "
            "cannot compute normalized MSE."
        )

    metrics = Metrics.from_accumulators(
        sse_recon=sse_recon,
        sse_baseline=sse_baseline,
        n_tokens=n_tokens,
        d_model=sae_cfg.d_model,
    )
    with open(fpaths.metrics, "wb") as fd:
        helpers.jdump(metrics.to_dict(), fd, indent=2)
    logger.info("Wrote metrics to '%s'.", fpaths.metrics)


def _torch_save(arr: np.ndarray, fpath: pathlib.Path) -> None:
    """Write a .pt artifact readable by downstream reference tooling (torch.load).
    torch is a codec here, not a compute dependency."""
    import torch

    torch.save(torch.from_numpy(np.ascontiguousarray(arr)), fpath)


def main(cfg: Config, sweep: pathlib.Path | None = None):
    """Run SAE inference, optionally as a sweep of jobs (reference inference.py:289-361)."""
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
            return
    else:
        cfgs = [cfg]

    if cfg.slurm_acct:
        try:
            import submitit
        except ImportError as err:
            raise RuntimeError(
                "slurm_acct set but submitit is not installed; run without Slurm."
            ) from err
        executor = submitit.SlurmExecutor(folder=cfg.log_to)
        executor.update_parameters(
            job_name="sae-inference",
            time=int(cfg.n_hours * 60),
            partition=cfg.slurm_partition,
            ntasks_per_node=1,
            mem=f"{cfg.mem_gb}GB",
            stderr_to_stdout=True,
            account=cfg.slurm_acct,
        )
        with executor.batch():
            jobs = [executor.submit(worker_fn, c) for c in cfgs]
        for j, job in enumerate(jobs):
            try:
                job.result()
                logger.info("Job %d/%d finished.", j + 1, len(jobs))
            except Exception:
                logger.warning("Job %s (%d) did not finish.", job.job_id, j)
        return

    for c in cfgs:
        worker_fn(c)
