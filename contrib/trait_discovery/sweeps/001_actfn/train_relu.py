"""001_actfn ReLU arm: lr x layer x L1-coeff x init-blend grid.

Capability mirror of reference sweeps/001_actfn/train_relu.py (same grid; the
blend axis {0.0, 0.8} is the datapoint-init ablation)."""


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
            for coeff in [1e-4, 1e-3, 1e-2, 1e-1]:
                for blend in [0.0, 0.8]:
                    cfgs.append({
                        "tags": ["actfn-relu"],
                        "lr": lr,
                        "n_lr_warmup": 500,
                        "n_sparsity_warmup": n_train // batch_size,
                        "n_train": n_train,
                        "sae": {
                            "activation": {
                                "key": "relu",
                                "sparsity": {"key": "l1-sparsity", "coeff": coeff},
                            },
                            "reinit_blend": blend,
                        },
                        "train_data": {"layer": layer, "shards": train,
                                       "min_buffer_fill": 0.2},
                        "val_data": {"layer": layer, "shards": val},
                    })
    return cfgs
