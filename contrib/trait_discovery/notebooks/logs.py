"""Probe1d log-telemetry explorer: log file → events → diagnostics.

Capability mirror of the reference's marimo notebook
(`contrib/trait_discovery/notebooks/logs.py`: parse probe1d structured JSON
events and explore VRAM usage, loss and gradients). The parsing and plotting
live in `tdiscovery.logparse` (tested in tests/test_td_logparse.py); this file
is the narrative driver.

Env: TD_LOG=<path to probe1d log file> [TD_OUT=./figures/logs]
"""

# %%
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[3]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "src"))

from tdiscovery import logparse  # noqa: E402

LOG = pathlib.Path(os.environ.get("TD_LOG", "./probe1d.log"))
OUT = pathlib.Path(os.environ.get("TD_OUT", "./figures/logs"))

# %% [markdown]
# ## Load telemetry events
# probe1d emits one JSON line per LM iteration on the `probe1d.stats` logger
# (enable with DEBUG level + a file handler) plus CSR-load brackets.

# %%
if __name__ == "__main__":
    events = logparse.load_events(LOG)
    print(f"{len(events)} events in {LOG}")
    if not events:
        raise SystemExit("No telemetry events found; was probe1d.stats at DEBUG?")

    summary = logparse.summarize(events)
    for key, value in summary.items():
        print(f"  {key}: {value}")

    # %% [markdown]
    # ## Convergence, trust-region health, memory

    # %%
    df = logparse.iters_df(events)
    OUT.mkdir(parents=True, exist_ok=True)
    for name, maker in (
        ("loss", logparse.fig_loss),
        ("grad", logparse.fig_grad),
        ("trust_region", logparse.fig_trust_region),
        ("memory", logparse.fig_memory),
    ):
        fig = maker(df)
        fpath = OUT / f"{name}.png"
        fig.savefig(fpath, dpi=120)
        print(f"Saved {fpath}")
