"""Example sweep file (reference sweep format: a Python file exporting
make_cfgs() -> list[dict]; reference configs.py:17-39, tests/sweeps/).

List-valued leaves cartesian-product via configs.expand; CLI overrides beat
sweep values; seeds auto-increment per expanded config.

    python launch.py train --sweep sweeps/example.py \
        --train-data.shards $SAEV_SCRATCH/saev/shards/<hash> ...
"""


def make_cfgs() -> list[dict]:
    return [
        {
            "lr": [1e-4, 4e-4, 1e-3],
            "sae": {
                "activation": {
                    "key": "top-k",
                    "top_k": [16, 32, 64],
                },
            },
            "objective": {"n_prefixes": 10},
        }
    ]
