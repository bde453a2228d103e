"""Explore birdsong SAE latents: spectrograms, top clips, latent summaries.

Capability mirror of reference contrib/birdsong/notebooks/001_explore.py +
clips.py (marimo notebooks; marimo is not a dependency here, so this is a
percent-format script — run it cell-by-cell in any editor, export to .ipynb
with scripts/export_notebook.py, or run top to bottom).

Prereqs: a trained run with inference artifacts over Bird-MAE shards
(launch.py inference) — the same inputs as birdsong.visuals.
"""

# %% [markdown]
# # Birdsong latent exploration
# Point `RUN` and `SHARDS` at a trained SAE run and its Bird-MAE activation
# shards, then walk through the cells.

# %%
import os
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[3]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "src"))

RUN = pathlib.Path(os.environ.get("BIRDSONG_RUN", "./runs/abcdefg"))
SHARDS = pathlib.Path(os.environ.get("BIRDSONG_SHARDS", "./shards/5e37a03c"))

# %% [markdown]
# ## Load inference artifacts (sparsity, mean values, token activations)

# %%
import scipy.sparse  # noqa: E402

from saev_tpu import disk  # noqa: E402
from saev_tpu.data import Metadata  # noqa: E402

md = Metadata.load(SHARDS)
run = disk.Run(RUN)
inf_dir = RUN / "inference" / md.hash
token_acts = scipy.sparse.load_npz(inf_dir / "token_acts.npz")
print(f"{token_acts.shape[0]} tokens x {token_acts.shape[1]} latents, "
      f"{token_acts.nnz / token_acts.shape[0]:.1f} mean L0")

# %% [markdown]
# ## Rank latents by firing frequency and mean value

# %%
freq = np.asarray((token_acts > 0).mean(axis=0)).ravel()
mean_val = np.asarray(token_acts.mean(axis=0)).ravel()
interesting = np.argsort(-mean_val * (freq > 1e-4) * (freq < 1e-1))[:25]
for lat in interesting[:10]:
    print(f"latent {lat}: freq {freq[lat]:.5f}, mean {mean_val[lat]:.4f}")

# %% [markdown]
# ## Render spectrogram galleries + filtered audio for the top latents
# (delegates to birdsong.visuals — writes PNG spectrograms with SAE overlays
# and time/frequency-masked WAV clips per latent)

# %%
from birdsong import visuals  # noqa: E402

cfg = visuals.Config(
    run=RUN, shards=SHARDS, latents=tuple(int(i) for i in interesting[:8]),
    n_latents=16,
)
visuals.worker_fn(cfg)
print(f"wrote galleries under {RUN}/inference/{md.hash}/clips/")

# %% [markdown]
# ## Browse
# `python contrib/birdsong/scripts/make_html.py --run <RUN> --shards <SHARDS>`
# builds the clickable HTML browser over these galleries.
