"""Trait-discovery launcher: subcommand CLI over every tdiscovery pipeline
(capability mirror of reference contrib/trait_discovery/scripts/launch.py,
which exposes the same seven subcommands through tyro).

Usage:
    python contrib/trait_discovery/scripts/launch.py probe1d --run ... --train-shards ...
    python contrib/trait_discovery/scripts/launch.py baseline::train --method kmeans ...
"""

import pathlib
import sys

_ROOT = pathlib.Path(__file__).resolve().parents[3]
sys.path.insert(0, str(_ROOT))
sys.path.insert(0, str(_ROOT / "contrib" / "trait_discovery" / "src"))

import tdiscovery.baselines
import tdiscovery.classification
import tdiscovery.metrics
import tdiscovery.probe1d
import tdiscovery.visuals
from saev_tpu.utils import cli as cli_mod

COMMANDS = {
    "baseline::train": tdiscovery.baselines.train_cli,
    "baseline::inference": tdiscovery.baselines.inference_cli,
    "cls::train": tdiscovery.classification.train_cli,
    "cls::eval": tdiscovery.classification.eval_cli,
    "cls::audit": tdiscovery.classification.audit_cli,
    "metrics": tdiscovery.metrics.cli,
    "probe1d": tdiscovery.probe1d.cli,
    "visuals": tdiscovery.visuals.cli,
}

if __name__ == "__main__":
    cli_mod.run(COMMANDS)
