"""007_cambridge: sparse-linear heads on every mimic-pair task.

Capability mirror of reference sweeps/007_cambridge_butterflies: one head
per (run, erato/melpomene pair, view, C) on the subspecies_view grouping
(`tdiscovery.mimicry.pair_task`); harvested by notebooks/
007_cambridge_mimicry.py."""

MIMIC_PAIRS = [
    ("notabilis", "plesseni"),
    ("cyrbia", "cythera"),
    ("lativitta", "malleti"),
    ("etylus", "ecuadorensis"),
]
VIEWS = ("dorsal", "ventral")


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

    shards = os.environ.get("TD_TRAIN_SHARDS", "./shards/butterflies")

    cfgs = []
    for rid in run_ids:
        for erato, melp in MIMIC_PAIRS:
            for view in VIEWS:
                for C in [0.01, 0.1, 1.0]:
                    task_name = f"{erato}_{view}_vs_{melp}_{view}"
                    cfgs.append({
                        "run": str(runs_root / rid),
                        # Feature discovery, not generalization: train==test
                        # (reference 007 note).
                        "train_shards": shards,
                        "test_shards": shards,
                        "task": {
                            "name": task_name,
                            "source_col": "subspecies_view",
                            "groups": {
                                "erato": [f"{erato}_{view}"],
                                "melpomene": [f"{melp}_{view}"],
                            },
                        },
                        "patch_agg": "max",
                        "cls": {"key": "sparse-linear", "C": C},
                    })
    return cfgs
