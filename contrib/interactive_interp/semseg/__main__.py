"""Subcommand CLI for the semseg contrib project (mirror of reference
contrib/interactive_interp/semseg/__main__.py: train/visuals/validate/quantify,
plus the `interactive` intervention-app generator).

Usage:
    python -m semseg train --shards <dir> --layer 0 ...
    python -m semseg interactive --sae-ckpt ... --head-ckpt ... --out app.html
"""

import logging

from saev_tpu.utils import cli

from . import interactive, quantitative, training, validation, visuals

logging.basicConfig(
    level=logging.INFO,
    format="[%(asctime)s] [%(levelname)s] [%(name)s] %(message)s",
)


def train(cfg: training.Train) -> None:
    """Train one linear patch-segmentation probe and dump it."""
    params = training.train([cfg])
    training.dump(cfg.ckpt_path, [cfg], params)


if __name__ == "__main__":
    cli.run({
        "train": train,
        "visuals": visuals.cli,
        "validate": validation.cli,
        "quantify": quantitative.cli,
        "interactive": interactive.cli,
    })
