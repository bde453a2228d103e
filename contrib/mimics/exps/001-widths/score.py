"""Inference sweep over the pareto-optimal width-sweep runs (capability
mirror of reference contrib/mimics/exps/002-wider-saes/score.py): paste run
ids picked from the sweep explorer, then
`launch.py inference --sweep contrib/mimics/exps/001-widths/score.py`."""

import os

SHARDS = os.environ.get(
    "MIMICS_SHARDS",
    os.path.join(os.environ.get("SAEV_SCRATCH", "."), "saev", "shards", "a6be28a1"),
)
RUNS_ROOT = os.path.join(os.environ.get("SAEV_NFS", "."), "saev", "runs")

# Pareto-optimal run ids from the sweep explorer, keyed by (layer, d_sae).
RUN_IDS: dict[tuple[int, int], list[str]] = {
    # (21, 16384): ["..."],
}


def make_cfgs() -> list[dict]:
    return [
        {
            "run": os.path.join(RUNS_ROOT, run_id),
            "data": {"shards": SHARDS, "layer": layer},
        }
        for (layer, _d_sae), ids in RUN_IDS.items()
        for run_id in ids
    ]
