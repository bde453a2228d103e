"""Dataloader throughput benchmark harness.

Capability mirror of reference `scripts/benchmark.py` (benchmark_fn :72,
benchmark :194, plot :287): grids over loader kind × workers × batch size,
measures warm patches/s and peak RSS, writes JSONL results, and plots with
matplotlib (the reference uses altair).

Usage:
    python scripts/benchmark.py benchmark --shards <dir> --layer 0
    python scripts/benchmark.py plot --results bench_results.jsonl
"""

import dataclasses
import json
import logging
import pathlib
import sys
import time
import typing as tp

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

log_format = "[%(asctime)s] [%(levelname)s] [%(name)s] %(message)s"
logging.basicConfig(level=logging.INFO, format=log_format)
logger = logging.getLogger("benchmark")


@dataclasses.dataclass(frozen=True)
class Result:
    kind: str
    batch_size: int
    n_workers: int
    n_patches: int
    duration_s: float
    peak_rss_mb: float

    @property
    def patches_per_s(self) -> float:
        return self.n_patches / self.duration_s

    def to_dict(self) -> dict:
        return {**dataclasses.asdict(self), "patches_per_s": self.patches_per_s}


def infinite(dataloader):
    """Infinite iterator: re-create the underlying iterator when exhausted
    (reference benchmark.py:55-69)."""
    while True:
        yield from dataloader


def benchmark_fn(
    kind: tp.Literal["indexed", "shuffled", "ordered"],
    *,
    shards: pathlib.Path,
    layer: int,
    batch_size: int,
    n_workers: int,
    warmup_s: float,
    run_s: float,
) -> Result:
    from saev_tpu.data import (
        IndexedConfig,
        IndexedDataset,
        OrderedConfig,
        OrderedDataLoader,
        ShuffledConfig,
        ShuffledDataLoader,
    )

    if kind == "indexed":
        ds = IndexedDataset(IndexedConfig(shards=shards, layer=layer))
        import numpy as np

        rng = np.random.default_rng(0)

        def batches():
            while True:
                idx = rng.integers(0, len(ds), size=batch_size)
                yield {"act": np.stack([ds[int(i)]["act"] for i in idx])}

        it = batches()
    elif kind == "ordered":
        dl = OrderedDataLoader(
            OrderedConfig(shards=shards, layer=layer, batch_size=batch_size)
        )
        it = infinite(dl)
    elif kind == "shuffled":
        dl = ShuffledDataLoader(
            ShuffledConfig(
                shards=shards, layer=layer, batch_size=batch_size,
                n_threads=n_workers, seed=0,
            )
        )
        it = infinite(dl)
    else:
        raise ValueError(kind)

    try:
        import psutil

        proc = psutil.Process()
        peak_rss = proc.memory_info().rss
    except ImportError:
        proc, peak_rss = None, 0

    # Warmup.
    t_end = time.perf_counter() + warmup_s
    while time.perf_counter() < t_end:
        next(it)

    n_patches = 0
    t0 = time.perf_counter()
    t_end = t0 + run_s
    while time.perf_counter() < t_end:
        batch = next(it)
        n_patches += len(batch["act"])
        if proc is not None:
            peak_rss = max(peak_rss, proc.memory_info().rss)
    duration = time.perf_counter() - t0

    if kind in ("ordered", "shuffled"):
        dl.shutdown()

    result = Result(
        kind=kind,
        batch_size=batch_size,
        n_workers=n_workers,
        n_patches=n_patches,
        duration_s=duration,
        peak_rss_mb=peak_rss / 1e6,
    )
    logger.info(
        "%s bsz=%d workers=%d: %.0f patches/s, peak RSS %.0f MB",
        kind, batch_size, n_workers, result.patches_per_s, result.peak_rss_mb,
    )
    return result


@dataclasses.dataclass(frozen=True)
class BenchmarkConfig:
    shards: pathlib.Path = pathlib.Path(".")
    layer: int = 0
    kinds: tuple[str, ...] = ("shuffled", "ordered", "indexed")
    batch_sizes: tuple[int, ...] = (2048, 8192, 16384)
    n_workers: tuple[int, ...] = (4, 16)
    warmup_s: float = 5.0
    run_s: float = 30.0
    out: pathlib.Path = pathlib.Path("bench_results.jsonl")


def benchmark(cfg: BenchmarkConfig):
    results = []
    for kind in cfg.kinds:
        for batch_size in cfg.batch_sizes:
            workers_grid = cfg.n_workers if kind == "shuffled" else (1,)
            for n_workers in workers_grid:
                results.append(
                    benchmark_fn(
                        kind,  # type: ignore[arg-type]
                        shards=cfg.shards,
                        layer=cfg.layer,
                        batch_size=batch_size,
                        n_workers=n_workers,
                        warmup_s=cfg.warmup_s,
                        run_s=cfg.run_s,
                    )
                )
    with open(cfg.out, "w") as fd:
        for r in results:
            fd.write(json.dumps(r.to_dict()) + "\n")
    logger.info("Wrote %d results to %s", len(results), cfg.out)


@dataclasses.dataclass(frozen=True)
class PlotConfig:
    results: pathlib.Path = pathlib.Path("bench_results.jsonl")
    out: pathlib.Path = pathlib.Path("bench_results.png")


def plot(cfg: PlotConfig):
    import matplotlib.pyplot as plt

    rows = [json.loads(line) for line in cfg.results.read_text().splitlines() if line]
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4))
    kinds = sorted({r["kind"] for r in rows})
    for kind in kinds:
        sub = sorted((r for r in rows if r["kind"] == kind), key=lambda r: r["batch_size"])
        ax1.plot(
            [r["batch_size"] for r in sub],
            [r["patches_per_s"] for r in sub],
            marker="o", label=kind,
        )
        ax2.plot(
            [r["batch_size"] for r in sub],
            [r["peak_rss_mb"] for r in sub],
            marker="o", label=kind,
        )
    ax1.set_xlabel("batch size"); ax1.set_ylabel("patches/s"); ax1.legend()
    ax2.set_xlabel("batch size"); ax2.set_ylabel("peak RSS (MB)"); ax2.legend()
    fig.tight_layout()
    fig.savefig(cfg.out, dpi=120)
    logger.info("Wrote %s", cfg.out)


if __name__ == "__main__":
    from saev_tpu.utils import cli

    cli.run({"benchmark": benchmark, "plot": plot})
