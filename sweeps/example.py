"""Example sweep file (reference sweep format: a Python file exporting
make_cfgs() -> list[dict]; reference configs.py:16-39, tests/sweeps/).

`make_cfgs` returns the FINAL list of config dicts — one per run. For grids,
call `saev_tpu.configs.expand` (cartesian product over list-valued leaves)
inside make_cfgs, as below; CLI overrides beat sweep values and seeds
auto-increment per config.

    python launch.py train --sweep sweeps/example.py \
        --train-data.shards $SAEV_SCRATCH/saev/shards/<hash> ...
"""


def make_cfgs() -> list[dict]:
    from saev_tpu.configs import expand

    return list(expand({
        "lr": [1e-4, 4e-4, 1e-3],
        "sae": {
            "activation": {
                "key": "top-k",
                "top_k": [16, 32, 64],
            },
        },
        "objective": {"n_prefixes": 10},
    }))
