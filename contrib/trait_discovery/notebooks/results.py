"""FishVista results explorer: results dir → per-class AP dataframe → tables.

Capability mirror of the reference's marimo notebook
(`contrib/trait_discovery/notebooks/results.py`: load result JSONs, grouped
mAP aggregation, per-class best-latent exploration, CUB attribute loading).
The logic lives in `tdiscovery.results` (tested in tests/test_td_results.py).

Env: TD_RESULTS=<results dir> [TD_PREFIX=fishvista] [TD_CUB_ATTRS=<attributes.txt>]
"""

# %%
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[3]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "src"))

from tdiscovery import results  # noqa: E402

RESULTS = pathlib.Path(os.environ.get("TD_RESULTS", "./results"))
PREFIX = os.environ.get("TD_PREFIX", "fishvista")

# %% [markdown]
# ## Per-class AP dataframe
# One row per (result file, segmentation class); `extra` provenance
# (vit family/ckpt, layer, sae_ckpt, n_train) unnested into columns.

# %%
if __name__ == "__main__":
    df = results.load_results_df(RESULTS, prefix=PREFIX)
    print(f"{len(df)} rows from {RESULTS}")
    if not len(df):
        raise SystemExit("No result JSONs found.")

    # %% [markdown]
    # ## Grouped mAP leaderboard + per-class best latents + method-vs-random

    # %%
    group_cols = [
        c for c in ("method", "n_prototypes", "layer", "n_train", "seed")
        if c in df.columns
    ]
    print(results.map_table(df, group_cols).to_string(index=False))
    print()
    print(results.best_latents(df).to_string(index=False))
    print()
    print(results.method_vs_random(df).to_string(index=False))

    # %% [markdown]
    # ## CUB attributes (when available)

    # %%
    cub = os.environ.get("TD_CUB_ATTRS")
    if cub and pathlib.Path(cub).is_file():
        attrs = results.load_cub_attributes(cub)
        names = sorted({a.name for a in attrs})
        print(f"{len(attrs)} CUB attributes across {len(names)} groups")
