"""004_fishbase: the lr x layer x k grid behind the FishBase trait study.

Capability mirror of reference sweeps/004_fishbase/train.py."""


def make_cfgs() -> list[dict]:
    import os

    train = os.environ.get("TD_TRAIN_SHARDS", "./shards/fishvista-imgfolder")
    val = os.environ.get("TD_VAL_SHARDS", "./shards/fishvista-segfolder")
    layers = [int(x) for x in os.environ.get("TD_LAYERS", "13,15,17,19,21,23").split(",")]
    batch_size = 1024 * 16
    n_train = int(os.environ.get("TD_N_TRAIN", 100_000_000))

    cfgs = []
    for lr in [3e-3, 1e-2, 3e-2]:
        for layer in layers:
            for k in [16, 32, 64, 128, 256]:
                cfgs.append({
                    "tags": ["fishbase-v0.1"],
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
