"""Static HTML gallery of top SAE latents over a fish image collection.

Capability mirror of reference contrib/freshwater_fish/scripts/make_gallery.py:
thin wrapper over the general feature-gallery generator (the reference
duplicates the browse logic; here `saev_tpu.interactive.features` is the shared
engine). `extract_tol.py`'s Tree-of-Life download is egress-bound and stays a
documented manual step.

Usage:
    python contrib/freshwater_fish/scripts/make_gallery.py gallery \\
        --run runs/<id> --shards <dir> --out fish_gallery.html
"""

import dataclasses
import logging
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[3]))

logger = logging.getLogger("fish.gallery")


@dataclasses.dataclass(frozen=True)
class Config:
    run: pathlib.Path = pathlib.Path("./runs/abcdefg")
    shards: pathlib.Path = pathlib.Path("./shards/abcdef01")
    n_features: int = 200
    sort_by: str = "log10_freq"
    out: pathlib.Path | None = None


def gallery(cfg: Config) -> pathlib.Path:
    from saev_tpu.interactive import features

    return features.generate(
        features.Config(
            run=cfg.run,
            shards=cfg.shards,
            sort_by=cfg.sort_by,
            n_features=cfg.n_features,
            out=cfg.out,
        )
    )


if __name__ == "__main__":
    from saev_tpu.utils import cli as cli_mod

    logging.basicConfig(level=logging.INFO)
    cli_mod.run({"gallery": gallery})
