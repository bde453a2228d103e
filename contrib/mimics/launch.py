"""Launcher for the Cambridge mimicry utilities.

Capability mirror of reference contrib/mimics/launch.py (:22-90: tyro
subcommand CLI over scoring, with TOML sweep expansion). Subcommands map to
the library workers: `score` (per-latent AUROC over mimic pair tasks),
`render` (top-activation strips per feature), `consistency` (cross-run
feature correlation), `viewer` (self-contained HTML browser).

Usage:
    python contrib/mimics/launch.py score --run runs/<id> ... [--sweep s.toml]
    python contrib/mimics/launch.py render --run runs/<id> ...
"""

import dataclasses
import logging
import pathlib
import sys
import tomllib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent / "src"))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent / "scripts"))

from saev_tpu.utils import cli

logging.basicConfig(
    level=logging.INFO,
    format="[%(asctime)s] [%(levelname)s] [%(name)s] %(message)s",
)
logger = logging.getLogger("mimics.launch")


def score(cfg, sweep: pathlib.Path | None = None) -> None:
    """Score all SAE latents for mimic-pair discrimination; with --sweep,
    expand a TOML grid over the config (reference launch.py:22-63)."""
    from mimics import scoring

    from saev_tpu import configs as saev_configs

    if sweep is not None:
        cfgs = []
        for dct in saev_configs.expand(tomllib.loads(sweep.read_text())):
            cfgs.append(dataclasses.replace(cfg, **dct))
    else:
        cfgs = [cfg]
    logger.info("Scoring %d config(s).", len(cfgs))
    for c in cfgs:
        scoring.score_run(c)


def render(cfg) -> None:
    """Render top-activation strips for scored features."""
    from mimics import render as render_mod

    render_mod.worker_fn(cfg)


def consistency(cfg) -> None:
    """Cross-run feature-consistency correlations."""
    from mimics import consistency as consistency_mod

    consistency_mod.worker_fn(cfg)


def build_viewer(cfg) -> None:
    """Self-contained HTML viewer over rendered strips."""
    import viewer as viewer_mod

    viewer_mod.build(cfg)


def build_scores_viewer(cfg) -> None:
    """Cross-run mimic-scores browser (no rendered strips needed)."""
    import viewer as viewer_mod

    viewer_mod.build_scores(cfg)


def _bind():
    from mimics import consistency as consistency_mod
    from mimics import render as render_mod
    from mimics import scoring
    import viewer as viewer_mod

    score.__annotations__["cfg"] = scoring.Config
    render.__annotations__["cfg"] = render_mod.Config
    consistency.__annotations__["cfg"] = consistency_mod.Config
    build_viewer.__annotations__["cfg"] = viewer_mod.Config
    build_scores_viewer.__annotations__["cfg"] = viewer_mod.ScoresConfig


if __name__ == "__main__":
    _bind()
    cli.run({
        "score": score,
        "render": render,
        "consistency": consistency,
        "viewer": build_viewer,
        "scores": build_scores_viewer,
    })
