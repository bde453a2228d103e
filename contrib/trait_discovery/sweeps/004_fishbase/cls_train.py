"""004_fishbase classifier stage: agg x C x target-column over every run.

Capability mirror of reference sweeps/004_fishbase/cls_train.py (:24-41 grid:
mean/max aggregation x {0.001, 0.01, 0.1} x {habitat, family})."""


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

    cfgs = []
    for rid in run_ids:
        for agg in ["mean", "max"]:
            for C in [0.001, 0.01, 0.1]:
                for target_col in ["habitat", "family"]:
                    cfgs.append({
                        "run": str(runs_root / rid),
                        "train_shards": train,
                        "test_shards": test,
                        "patch_agg": agg,
                        "task": {"name": target_col, "source_col": target_col},
                        "cls": {"key": "sparse-linear", "C": C},
                    })
    return cfgs
