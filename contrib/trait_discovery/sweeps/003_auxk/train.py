"""003_auxk: AuxK on/off x lr x layer x k — the dead-latent ablation.

Capability mirror of reference sweeps/003_auxk/train.py; analyzed by
notebooks/003_auxk.py + tdiscovery.ablations."""


def make_cfgs() -> list[dict]:
    import os

    train = os.environ.get("TD_TRAIN_SHARDS", "./shards/train")
    val = os.environ.get("TD_VAL_SHARDS", "./shards/val")
    layers = [int(x) for x in os.environ.get("TD_LAYERS", "13,15,17,19,21,23").split(",")]

    cfgs = []
    for aux in [{"key": "auxk"}, {"key": "no-aux"}]:
        for lr in [1e-4, 3e-4, 1e-3, 3e-3, 1e-2]:
            for layer in layers:
                for k in [16, 64, 256]:
                    cfgs.append({
                        "tags": ["auxk-comparison"],
                        "lr": lr,
                        "sae": {
                            "activation": {"key": "top-k", "top_k": k, "aux": aux},
                            "reinit_blend": 0.8,
                        },
                        "train_data": {"layer": layer, "shards": train,
                                       "min_buffer_fill": 0.2},
                        "val_data": {"layer": layer, "shards": val},
                    })
    return cfgs
