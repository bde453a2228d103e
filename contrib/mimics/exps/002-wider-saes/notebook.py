"""Wider-SAEs analysis: does dictionary width buy mimic separation?

Driver for the reference's 002-wider-saes marimo notebook (reference
contrib/mimics/exps/002-wider-saes/notebook.py): load the width-sweep runs,
mark the per-width L0/NMSE pareto frontier, join each run's mimic-task
separations, and print the width study table + frontier figure.

Env: MIMICS_RUNS=<runs root> MIMICS_SHARD=<shard hash>
     [MIMICS_TRACKER=<offline tracker root>] [MIMICS_TAGS=a,b]
     [MIMICS_OUT=./figures]
"""

# %%
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[4]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2] / "src"))

from mimics import analysis  # noqa: E402

RUNS = pathlib.Path(os.environ.get("MIMICS_RUNS", "./runs"))
SHARD = os.environ.get("MIMICS_SHARD", "")
TRACKER = os.environ.get("MIMICS_TRACKER")
TAGS = tuple(t for t in os.environ.get("MIMICS_TAGS", "").split(",") if t)
OUT = pathlib.Path(os.environ.get("MIMICS_OUT", "./figures"))

if __name__ == "__main__":
    # %% [markdown]
    # ## Load the sweep and mark the pareto frontier

    # %%
    df = analysis.load_runs_df(
        RUNS,
        tracker_root=pathlib.Path(TRACKER) if TRACKER else None,
        tags=TAGS,
    )
    df = analysis.mark_pareto(df)
    print(f"{len(df)} runs, {int(df['pareto'].sum())} on a frontier")

    # %% [markdown]
    # ## Join mimic-task separations and tabulate per width

    # %%
    if SHARD:
        df = analysis.join_scores(df, RUNS, SHARD)
    study = analysis.width_study(df)
    print(study.to_string(index=False))

    # %% [markdown]
    # ## Frontier figure

    # %%
    if "summary/eval/l0" in df.columns:
        print("saved", analysis.plot_frontier(df, OUT / "width_frontier.png"))
