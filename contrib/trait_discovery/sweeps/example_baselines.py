"""Example baseline sweep: the full dictionary grid at production shape
(reference contrib/trait_discovery/sweeps/*). Consumed by
`launch.py baseline::train --sweep sweeps/example_baselines.py`-style flows or
saev_tpu.configs.load_sweep directly."""


def make_cfgs() -> list[dict]:
    return [
        {
            "method": ["kmeans", "pca", "semi-nmf"],
            "k": [1024, 4096, 16384],
            "n_train": 100_000_000,
        }
    ]
