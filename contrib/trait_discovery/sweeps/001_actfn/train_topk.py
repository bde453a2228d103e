"""001_actfn TopK arm: lr x layer x k grid over TopK SAEs.

Capability mirror of reference sweeps/001_actfn/train_topk.py — same grid
shape, with the cluster-specific shard hashes replaced by env vars:
TD_TRAIN_SHARDS / TD_VAL_SHARDS (+ optional TD_RUNS_ROOT, TD_LAYERS).

    python launch.py train --sweep contrib/trait_discovery/sweeps/001_actfn/train_topk.py
"""


def make_cfgs() -> list[dict]:
    import os

    train = os.environ.get("TD_TRAIN_SHARDS", "./shards/train")
    val = os.environ.get("TD_VAL_SHARDS", "./shards/val")
    layers = [int(x) for x in os.environ.get("TD_LAYERS", "13,15,17,19,21,23").split(",")]
    batch_size = 1024 * 16
    n_train = int(os.environ.get("TD_N_TRAIN", 100_000_000))

    cfgs = []
    for lr in [3e-5, 1e-4, 3e-4, 1e-3, 3e-3, 1e-2]:
        for layer in layers:
            for k in [8, 16, 32, 64, 128, 256]:
                cfgs.append({
                    "tags": ["actfn-topk"],
                    "lr": lr,
                    "n_lr_warmup": 500,
                    "n_sparsity_warmup": n_train // batch_size,
                    "n_train": n_train,
                    "sae": {
                        "activation": {"key": "top-k", "top_k": k},
                        "reinit_blend": 0.8,
                    },
                    "train_data": {"layer": layer, "shards": train,
                                   "min_buffer_fill": 0.2},
                    "val_data": {"layer": layer, "shards": val},
                })
    return cfgs
