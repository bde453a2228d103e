"""004_fishbase probe stage: one 1-D probe fit per trained run.

Capability mirror of reference sweeps/004_fishbase/probe1d.py; run ids come
from TD_RUN_IDS (comma-separated) or by scanning TD_RUNS_ROOT.

    python contrib/trait_discovery/scripts/launch.py probe1d \\
        --sweep contrib/trait_discovery/sweeps/004_fishbase/probe1d.py
"""


def make_cfgs() -> list[dict]:
    import os
    import pathlib

    runs_root = pathlib.Path(os.environ.get("TD_RUNS_ROOT", "./runs"))
    ids_env = os.environ.get("TD_RUN_IDS", "")
    if ids_env:
        run_ids = [x for x in ids_env.split(",") if x]
    else:
        run_ids = sorted(
            p.name for p in runs_root.iterdir()
            if (p / "checkpoint" / "sae.pt").exists()
        ) if runs_root.is_dir() else []

    train = os.environ.get("TD_TRAIN_SHARDS", "./shards/train")
    test = os.environ.get("TD_TEST_SHARDS", "./shards/val")
    return [
        {"run": str(runs_root / rid), "train_shards": train,
         "test_shards": test}
        for rid in run_ids
    ]
