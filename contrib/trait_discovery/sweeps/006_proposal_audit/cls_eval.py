"""006_proposal_audit audit stage: ground every trained head's feature
ranking in segmentation AP (Yield@B / AUC_B).

Capability mirror of reference sweeps/006_proposal_audit/cls_eval.py: one
AuditConfig per run over all its cls_*.pkl checkpoints."""


def make_cfgs() -> list[dict]:
    import os
    import pathlib

    runs_root = pathlib.Path(os.environ.get("TD_RUNS_ROOT", "./runs"))
    test = os.environ.get("TD_TEST_SHARDS", "./shards/val")
    test_name = pathlib.Path(test).name

    cfgs = []
    if runs_root.is_dir():
        for run_dir in sorted(p for p in runs_root.iterdir() if p.is_dir()):
            ckpts = sorted(
                str(p) for p in (run_dir / "inference" / test_name).glob("cls_*.pkl")
            )
            if not ckpts:
                continue
            cfgs.append({
                "run": str(run_dir),
                "test_shards": test,
                "cls_checkpoints": ckpts,
                "max_budget": 1000,
                "budgets": [3, 10, 30, 100, 300, 1000],
                "tau": 0.3,
            })
    return cfgs
