"""Subcommand CLI for the classification probing demo (mirror of reference
contrib/interactive_interp/classification/__main__.py: train with optional
TOML sweep, plus the dataset fetchers).

Usage:
    python -m classification train --train-shards <dir> ... [--sweep grid.toml]
    python -m classification flowers --dir data/flowers
"""

import logging
import pathlib
import tomllib

from saev_tpu.utils import cli

from . import download, training

logging.basicConfig(
    level=logging.INFO,
    format="[%(asctime)s] [%(levelname)s] [%(name)s] %(message)s",
)
logger = logging.getLogger("contrib.classification")


def train(cfg: training.Train, sweep: pathlib.Path | None = None) -> None:
    """Train the probe grid; with --sweep, expand a TOML grid first."""
    if sweep is not None:
        cfgs, errs = training.grid(cfg, tomllib.loads(sweep.read_text()))
        for err in errs:
            logger.warning("Error in config: %s", err)
        if errs and not cfgs:
            raise SystemExit(1)
    else:
        cfgs = [cfg]
    logger.info("Training %d probe(s).", len(cfgs))
    training.main(cfgs)


if __name__ == "__main__":
    cli.run({
        "train": train,
        "flowers": download.flowers,
        "cub": download.cub,
        "caltech101": download.caltech101,
    })
