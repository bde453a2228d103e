"""Before/after-intervention probability panels for the paper.

Capability mirror of reference contrib/interactive_interp/notebooks/
figures.py (204-LoC marimo app of hardcoded per-species bar charts:
bluejay/kingbird/warbler/finch before vs after feature suppression). The
chart engine lives in `scripts/make_figures.py::barchart`; this driver holds
the paper's panel data — overridable with FIGURES_JSON pointing at
{"<name>": {"probs": [[label, value], ...], "ylim": N}, ...} — and renders
every panel to FIGURES_OUT.
"""

# %%
import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[3]))

OUT = pathlib.Path(os.environ.get("FIGURES_OUT", "./figures"))
DATA_JSON = os.environ.get("FIGURES_JSON", "")

# %% [markdown]
# ## Panel data
# The reference's hardcoded class-probability panels (its :62-195): model
# predictions on one image before and after suppressing the top latent.

# %%
PANELS: dict[str, dict] = {
    "bluejay_before": {
        "probs": [["Blue Jay", 49.0], ["Clark\nNutcracker", 15.0],
                  ["White-Breasted\nNuthatch", 11.0], ["Florida Jay", 7.0]],
        "ylim": 55.0,
    },
    "bluejay_after": {
        "probs": [["Clark\nNutcracker", 32.0], ["White-Breasted\nNuthatch", 21.0],
                  ["Great Gray\nShrike", 7.0], ["Blue Jay", 4.0]],
        "ylim": 55.0,
    },
    "kingbird_before": {
        "probs": [["Tropical\nKingbird", 93.0], ["Gray\nKingbird", 4.0],
                  ["Great Crested\nFlycatcher", 1.0], ["Sayornis", 1.0]],
        "ylim": 100.0,
    },
    "kingbird_after": {
        "probs": [["Gray\nKingbird", 73.0], ["Tropical\nKingbird", 12.0],
                  ["Western\nWood Peewee", 5.0], ["Sayornis", 2.0]],
        "ylim": 100.0,
    },
    "warbler_before": {
        "probs": [["Canada\nWarbler", 59.0], ["Magnolia\nWarbler", 17.0],
                  ["Wilson\nWarbler", 8.0], ["Kentucky\nWarbler", 3.0]],
        "ylim": 100.0,
    },
    "warbler_after": {
        "probs": [["Wilson\nWarbler", 36.0], ["Canada\nWarbler", 32.0],
                  ["Magnolia\nWarbler", 9.0], ["Kentucky\nWarbler", 3.0]],
        "ylim": 100.0,
    },
    "finch_before": {
        "probs": [["Purple\nFinch", 83.0], ["Pine\nGrosbeak", 4.0],
                  ["Summer\nTanager", 2.0], ["Bay-Breasted\nWarbler", 2.0]],
        "ylim": 100.0,
    },
    "finch_after": {
        "probs": [["Field\nSparrow", 14.0], ["Bay-Breasted\nWarbler", 11.0],
                  ["Tree\nSparrow", 5.0], ["Chipping\nSparrow", 4.0]],
        "ylim": 100.0,
    },
}

if DATA_JSON:
    PANELS = json.loads(pathlib.Path(DATA_JSON).read_text())

# %% [markdown]
# ## Render every panel

# %%
if __name__ == "__main__":
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ii_figures",
        pathlib.Path(__file__).resolve().parents[1] / "scripts" / "make_figures.py",
    )
    figures = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(figures)

    OUT.mkdir(parents=True, exist_ok=True)
    for name, panel in PANELS.items():
        cfg = figures.Barchart(
            labels=tuple(label for label, _ in panel["probs"]),
            values=tuple(float(v) for _, v in panel["probs"]),
            ylim_max=float(panel.get("ylim", 100.0)),
            out=OUT / f"{name}.png",
        )
        print(figures.barchart(cfg))
