"""Birdsong SAE exploration sweep: lr x layer x k over Bird-MAE BirdCLEF
shards (capability mirror of reference contrib/birdsong/sweeps/001_explore/
train.py — paths come from $SAEV_SCRATCH/$SAEV_NFS instead of the reference's
cluster-specific absolutes).

    python launch.py train --sweep contrib/birdsong/sweeps/001_explore/train.py ...
"""

import os

BATCH_SIZE = 1024 * 16
N_TRAIN = 50_000_000
SHARDS = os.path.join(
    os.environ.get("SAEV_SCRATCH", "."), "saev", "shards", "5e37a03c"
)
RUNS_ROOT = os.path.join(os.environ.get("SAEV_NFS", "."), "saev", "runs")


def make_cfgs() -> list[dict]:
    # Pre-expanded scalar grid (the make_cfgs contract — the launcher's
    # load_cfgs consumes one dict per run and auto-increments seeds):
    # 6 lrs x 6 layers x 5 ks = 180 configs, train/val layers paired.
    return [
        {
            "tags": ["birdclef-v0.1"],
            "lr": lr,
            "n_lr_warmup": 500,
            "n_sparsity_warmup": N_TRAIN // BATCH_SIZE,
            "runs_root": RUNS_ROOT,
            "n_train": N_TRAIN,
            "sae": {
                "d_model": 1024,
                "d_sae": 1024 * 16,
                "normalize_w_dec": True,
                "remove_parallel_grads": True,
                "activation": {"top_k": k},
                "reinit_blend": 0.8,
            },
            "train_data": {
                "layer": layer,
                "shards": SHARDS,
                "min_buffer_fill": 0.2,
            },
            "val_data": {"layer": layer, "shards": SHARDS},
        }
        for lr in [1e-4, 3e-4, 1e-3, 3e-3, 1e-2, 3e-2]
        for layer in [13, 15, 17, 19, 21, 23]
        for k in [16, 32, 64, 128, 256]
    ]
