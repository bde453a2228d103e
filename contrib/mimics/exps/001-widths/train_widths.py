"""Width sweep: 16K-32K latent SAEs on Cambridge butterflies
(capability mirror of reference contrib/mimics/exps/002-wider-saes/
train_widths.py; paths come from env instead of cluster absolutes)."""

import os

BATCH_SIZE = 1024 * 16
N_TRAIN = 100_000_000
SHARDS = os.environ.get(
    "MIMICS_SHARDS",
    os.path.join(os.environ.get("SAEV_SCRATCH", "."), "saev", "shards", "a6be28a1"),
)
RUNS_ROOT = os.path.join(os.environ.get("SAEV_NFS", "."), "saev", "runs")


def make_cfgs() -> list[dict]:
    # Pre-expanded scalar grid (the make_cfgs contract — load_cfgs consumes
    # one dict per run): 2 layers x 5 widths x 4 ks x 5 lrs = 200 configs,
    # train/val layers paired.
    return [
        {
            "tags": ["mimics-widths-384p-v1.6"],
            "n_hours": 8.0,
            "lr": lr,
            "n_lr_warmup": 500,
            "n_sparsity_warmup": N_TRAIN // BATCH_SIZE,
            "runs_root": RUNS_ROOT,
            "n_train": N_TRAIN,
            "sae": {
                "d_model": 1024,
                "d_sae": d_sae,
                "normalize_w_dec": True,
                "remove_parallel_grads": True,
                "activation": {"top_k": k},
                "reinit_blend": 0.8,
            },
            "train_data": {
                "layer": layer,
                "shards": SHARDS,
                "min_buffer_fill": 0.2,
                "ignore_labels": [0],
                "use_tmpdir": True,
            },
            "val_data": {
                "layer": layer,
                "shards": SHARDS,
                "ignore_labels": [0],
                "use_tmpdir": True,
            },
        }
        for layer in [21, 23]
        for d_sae in [1024 * w for w in [16, 20, 24, 28, 32]]
        for k in [16, 32, 64, 128]
        for lr in [1e-4, 3e-4, 1e-3, 3e-3, 1e-2]
    ]
