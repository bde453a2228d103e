"""002_optim: Adam vs Muon x lr x layer x k.

Capability mirror of reference sweeps/002_optim/train.py."""


def make_cfgs() -> list[dict]:
    import os

    train = os.environ.get("TD_TRAIN_SHARDS", "./shards/train")
    val = os.environ.get("TD_VAL_SHARDS", "./shards/val")
    layers = [int(x) for x in os.environ.get("TD_LAYERS", "13,15,17,19,21,23").split(",")]

    cfgs = []
    for optim in ["adam", "muon"]:
        for lr in [1e-4, 3e-4, 1e-3, 3e-3, 1e-2]:
            for layer in layers:
                for k in [8, 16, 32, 64, 128, 256]:
                    cfgs.append({
                        "tags": ["optim-comparison"],
                        "optim": optim,
                        "lr": lr,
                        "sae": {"activation": {"key": "top-k", "top_k": k}},
                        "train_data": {"layer": layer, "shards": train,
                                       "min_buffer_fill": 0.2},
                        "val_data": {"layer": layer, "shards": val},
                    })
    return cfgs
