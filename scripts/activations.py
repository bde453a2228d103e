"""Sweep-capable launcher for activation extraction.

Capability mirror of reference `scripts/activations.py` (TOML-sweep + submitit
batch launcher; note the reference's version imports a `saev.scripts.activations`
module that no longer exists in its tree — this analog wires the same workflow
to the live extraction entry point, `saev_tpu.framework.shards`).

A TOML sweep file is a table whose list-valued entries cartesian-product into
many extraction configs (same expansion semantics as Python sweep files,
saev_tpu/configs.py:48):

    # sweep.toml
    family = "dinov2"
    ckpt = "dinov2_vitb14_reg"
    layers = [[-2], [-1]]        # two configs: one per layer choice
    [data]                       # nested fields update the dataset set on the
    n_examples = [128, 256]      # CLI/default config; x2 -> four configs total

Usage:
    python scripts/activations.py --sweep sweep.toml [field overrides...]
    python scripts/activations.py --family fake-clip --data.key fake-img
"""

import logging
import pathlib
import sys
import tomllib

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

from saev_tpu import configs
from saev_tpu.framework import shards as fshards
from saev_tpu.utils import cli

logger = logging.getLogger("scripts.activations")


def main(argv: list[str]) -> int:
    logging.basicConfig(
        level=logging.INFO,
        format="[%(asctime)s] [%(levelname)s] [%(name)s] %(message)s",
    )
    sweep_path = None
    if "--sweep" in argv:
        i = argv.index("--sweep")
        sweep_path = pathlib.Path(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]

    override = cli.parse(fshards.Config, argv, prog="activations")
    if sweep_path is None:
        cfgs = [override]
    else:
        with open(sweep_path, "rb") as fd:
            sweep = tomllib.load(fd)
        sweep_dcts = list(configs.expand(sweep))
        cfgs, errs = configs.load_cfgs(
            override, default=fshards.Config(), sweep_dcts=sweep_dcts
        )
        if errs:
            for err in errs:
                logger.error("Error in config: %s", err)
            return 1

    assert all(c.slurm_acct == cfgs[0].slurm_acct for c in cfgs)
    logger.info("Running %d extraction config(s).", len(cfgs))
    for i, cfg in enumerate(cfgs):
        logger.info("Config %d/%d: %s/%s.", i + 1, len(cfgs), cfg.family, cfg.ckpt)
        fshards.cli(cfg)
    logger.info("Jobs done.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
