"""005_butterflies: AuxK TopK grid over the Cambridge butterfly shards.

Capability mirror of reference sweeps (005_bufferflies study): same TopK
grid as 004 over the butterfly segfolder extraction."""


def make_cfgs() -> list[dict]:
    import os

    train = os.environ.get("TD_TRAIN_SHARDS", "./shards/butterflies")
    val = os.environ.get("TD_VAL_SHARDS", "./shards/butterflies")
    layers = [int(x) for x in os.environ.get("TD_LAYERS", "13,15,17,19,21,23").split(",")]

    cfgs = []
    for lr in [1e-3, 3e-3, 1e-2]:
        for layer in layers:
            for k in [16, 32, 64, 128, 256]:
                cfgs.append({
                    "tags": ["butterflies-v0.1"],
                    "lr": lr,
                    "sae": {
                        "activation": {"key": "top-k", "top_k": k},
                        "reinit_blend": 0.8,
                    },
                    "train_data": {"layer": layer, "shards": train,
                                   "min_buffer_fill": 0.2},
                    "val_data": {"layer": layer, "shards": val},
                })
    return cfgs
