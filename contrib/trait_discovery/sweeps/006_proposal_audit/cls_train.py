"""006_proposal_audit proposal stage: head family x C/depth x task per run.

Capability mirror of reference sweeps/006_proposal_audit/cls_train.py
(:133-152: sparse-linear C grid + decision trees over the audit tasks)."""


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
    source_col = os.environ.get("TD_SOURCE_COL", "class")

    heads = [
        {"key": "sparse-linear", "C": 0.001},
        {"key": "sparse-linear", "C": 0.01},
        {"key": "sparse-linear", "C": 0.1},
        {"key": "decision-tree", "max_depth": 4},
        {"key": "decision-tree", "max_depth": 8},
    ]
    cfgs = []
    for rid in run_ids:
        for head in heads:
            cfgs.append({
                "run": str(runs_root / rid),
                "train_shards": train,
                "test_shards": test,
                "task": {"name": "audit", "source_col": source_col},
                "patch_agg": "max",
                "cls": head,
            })
    return cfgs
