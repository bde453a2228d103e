"""Inference sweep over trained birdsong runs (capability mirror of reference
contrib/birdsong/sweeps/001_explore/inference.py): paste run ids per layer
after the training sweep finishes.

    python launch.py inference --sweep contrib/birdsong/sweeps/001_explore/inference.py
"""

import os

SHARDS = os.path.join(
    os.environ.get("SAEV_SCRATCH", "."), "saev", "shards", "5e37a03c"
)
RUNS_ROOT = os.path.join(os.environ.get("SAEV_NFS", "."), "saev", "runs")

# Paste run IDs here after training (layer -> run ids).
RUN_IDS: dict[int, list[str]] = {
    # 13: ["iwud7hc6", ...],
}


def make_cfgs() -> list[dict]:
    return [
        {
            "run": os.path.join(RUNS_ROOT, run_id),
            "data": {"shards": SHARDS, "layer": layer},
        }
        for layer, ids in RUN_IDS.items()
        for run_id in ids
    ]
