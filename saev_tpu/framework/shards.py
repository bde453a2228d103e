"""Extraction entry point: run a frozen ViT over a dataset and write shards.

Capability mirror of reference `src/saev/framework/shards.py` (Config at :30,
cli at :83): a typed config wrapping `saev_tpu.data.extract.worker_fn`, with
optional Slurm submission.
"""

import dataclasses
import logging
import pathlib
import typing as tp

from ..data import PixelAgg, datasets, extract

logger = logging.getLogger("shards")


@dataclasses.dataclass(frozen=True)
class Config:
    """Configuration for calculating and saving ViT activations."""

    data: datasets.Config = dataclasses.field(default_factory=datasets.FakeImg)
    """Which dataset to use."""
    shards_root: pathlib.Path = pathlib.Path("$SAEV_SCRATCH/saev/shards/")
    """Where to write shards."""
    family: tp.Literal[
        "bird-mae",
        "clip",
        "dinov2",
        "dinov3",
        "fake-clip",
        "pe-core",
        "pe-spatial",
        "siglip",
    ] = "clip"
    """Which model family."""
    ckpt: str = "ViT-L-14/openai"
    """Specific model checkpoint."""
    batch_size: int = 1024
    """Batch size for ViT inference."""
    n_workers: int = 8
    """Number of dataloader workers."""
    d_model: int = 1024
    """Dimension of the ViT activations (depends on model)."""
    layers: tuple[int, ...] = (-2,)
    """Which layers to save. By default, the second-to-last layer."""
    content_tokens_per_example: int = 256
    """Number of content tokens per example (depends on model)."""
    cls_token: bool = True
    """Whether the model has a [CLS] token."""
    pixel_agg: PixelAgg = PixelAgg.MAJORITY
    """How segmentation pixel labels aggregate into patch labels."""
    max_tokens_per_shard: int = 2_400_000
    """Maximum number of activations per shard; 2.4M ~= 10GB at d=1024 fp32."""
    device: str = "tpu"
    """Hardware platform (informational; JAX picks the active backend)."""
    n_hours: float = 24.0
    """Slurm job length."""
    slurm_acct: str = ""
    """Slurm account string."""
    slurm_partition: str = ""
    """Slurm partition."""
    log_to: str = "./logs"
    """Where to log Slurm job stdout/stderr."""


def cli(cfg: Config) -> None:
    """Save ViT activations for use later on (reference framework/shards.py:83-138)."""
    logging.basicConfig(
        level=logging.INFO,
        format="[%(asctime)s] [%(levelname)s] [%(name)s] %(message)s",
    )
    kwargs = dict(
        family=cfg.family,
        ckpt=cfg.ckpt,
        content_tokens_per_example=cfg.content_tokens_per_example,
        cls_token=cfg.cls_token,
        d_model=cfg.d_model,
        layers=list(cfg.layers),
        data=cfg.data,
        batch_size=cfg.batch_size,
        n_workers=cfg.n_workers,
        max_tokens_per_shard=cfg.max_tokens_per_shard,
        shards_root=cfg.shards_root,
        device=cfg.device,
        pixel_agg=cfg.pixel_agg,
    )

    if cfg.slurm_acct:
        try:
            import submitit
        except ImportError as err:
            raise RuntimeError(
                "slurm_acct set but submitit is not installed; run without Slurm."
            ) from err
        executor = submitit.SlurmExecutor(folder=cfg.log_to)
        executor.update_parameters(
            time=int(cfg.n_hours * 60),
            partition=cfg.slurm_partition,
            ntasks_per_node=1,
            cpus_per_task=cfg.n_workers + 4,
            stderr_to_stdout=True,
            account=cfg.slurm_acct,
        )
        job = executor.submit(extract.worker_fn, **kwargs)
        logger.info("Running job '%s'.", job.job_id)
        job.result()
    else:
        extract.worker_fn(**kwargs)
