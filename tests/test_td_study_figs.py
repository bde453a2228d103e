"""Study-figure engines (mirror of reference trait_discovery notebooks
005_bufferflies/007_cambridge_sae/008_pe/009_pe_core: per-layer pareto
frontiers, classifier sparsity/accuracy tradeoffs, purity@k, per-run latent
frequency/value loaders)."""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(
    0, str(pathlib.Path(__file__).parent.parent / "contrib" / "trait_discovery" / "src")
)

from conftest import _Helpers as helpers
from tdiscovery import analysis, audit_analysis


def _sae_df(rows):
    import pandas as pd

    return pd.DataFrame(rows)


def test_fig_pareto_frontiers_selects_pareto_rows():
    rows = []
    # Layer 3: three runs, two on the frontier (l0 up, nmse down), one
    # dominated. Layer 5: one run.
    for rid, l0, nmse, pareto in (
        ("a", 8.0, 0.5, True), ("b", 16.0, 0.3, True), ("c", 16.0, 0.9, False),
    ):
        rows.append({
            "run_id": rid, "summary/eval/l0": l0,
            "summary/eval/normalized_mse": nmse,
            "config/val_data/layer": 3, "is_pareto": pareto,
            "config/sae/activation/key": "top-k",
        })
    rows.append({
        "run_id": "d", "summary/eval/l0": 4.0,
        "summary/eval/normalized_mse": 0.7,
        "config/val_data/layer": 5, "is_pareto": True,
        "config/sae/activation/key": "top-k",
    })
    fig, pareto_ckpts = audit_analysis.fig_pareto_frontiers(_sae_df(rows))
    assert pareto_ckpts == {3: ["a", "b"], 5: ["d"]}
    ax = fig.get_axes()[0]
    assert ax.get_xscale() == "log" and ax.get_yscale() == "log"
    labels = [t.get_text() for t in ax.get_legend().get_texts()]
    assert labels == ["Layer 4", "Layer 6"]
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_fig_pareto_frontiers_filters():
    rows = [
        {
            "run_id": "keep", "summary/eval/l0": 8.0,
            "summary/eval/normalized_mse": 0.5,
            "config/val_data/layer": 0, "is_pareto": True,
            "config/sae/activation/key": "top-k",
        },
        {
            "run_id": "drop", "summary/eval/l0": 2.0,
            "summary/eval/normalized_mse": 0.1,
            "config/val_data/layer": 0, "is_pareto": True,
            "config/sae/activation/key": "relu",
        },
    ]
    _, pareto_ckpts = audit_analysis.fig_pareto_frontiers(
        _sae_df(rows), filters={"config/sae/activation/key": "top-k"}
    )
    assert pareto_ckpts == {0: ["keep"]}


def test_fig_sparsity_accuracy():
    import pandas as pd

    clf_df = pd.DataFrame([
        {"cls/cls_type": "sparse-linear", "cls/n_nonzero": 10, "cls/test_acc": 0.8},
        {"cls/cls_type": "sparse-linear", "cls/n_nonzero": 40, "cls/test_acc": 0.9},
        {"cls/cls_type": "decision-tree", "cls/n_nonzero": 5, "cls/test_acc": 0.7},
    ])
    fig, best = audit_analysis.fig_sparsity_accuracy(clf_df)
    assert set(best["clf_type"]) == {"sparse-linear", "decision-tree"}
    lin = best[best["clf_type"] == "sparse-linear"].iloc[0]
    assert lin["best_acc"] == pytest.approx(0.9) and lin["n_nonzero"] == 40
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_fig_pareto_frontiers_tolerates_missing_metric_columns():
    """No tracker -> no summary columns; the figure must be empty, not a
    KeyError (the drivers document TD_TRACKER as optional)."""
    import pandas as pd

    df = pd.DataFrame([{"run_id": "a", "is_pareto": False}])
    fig, pareto_ckpts = audit_analysis.fig_pareto_frontiers(df)
    assert pareto_ckpts == {}
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_fig_pareto_frontiers_missing_filter_column_empties_selection():
    """A filter on an absent column must exclude everything (a figure labeled
    'AuxK only' must not silently plot every run)."""
    rows = [{
        "run_id": "a", "summary/eval/l0": 8.0,
        "summary/eval/normalized_mse": 0.5,
        "config/val_data/layer": 0, "is_pareto": True,
    }]
    _, pareto_ckpts = audit_analysis.fig_pareto_frontiers(
        _sae_df(rows), filters={"config/sae/activation/aux/key": "auxk"}
    )
    assert pareto_ckpts == {}


def test_purity_at_masks_rare_latents():
    """Latents firing fewer than k times carry arbitrary padding labels in
    top_labels (csr_topk contract); they must not inflate purity."""
    top_labels = np.array([
        [7, 7, 7, 7],   # fires 100 times: trustworthy
        [1, 1, 1, 1],   # fires twice: its "top 4" is mostly padding
    ])
    best_i = np.array([0, 1])
    nnz = np.array([100, 2])
    assert analysis.purity_at(
        top_labels, best_i, k=4, nnz_per_latent=nnz
    ) == pytest.approx(1.0)  # only latent 0 counted
    # All rare -> NaN, never a fabricated 1.0.
    assert np.isnan(
        analysis.purity_at(top_labels, np.array([1]), k=4, nnz_per_latent=nnz)
    )
    # Without nnz the unmasked semantics stay (back-compat with old npz).
    assert analysis.purity_at(top_labels, best_i, k=4) == pytest.approx(1.0)


def test_pareto_front_drops_dominated_ties():
    """Equal-x points are the COMMON case (top-k SAEs share exact L0); only
    the min-y point of each x may enter the frontier."""
    from tdiscovery import runs as td_runs

    xs = np.array([32.0, 32.0, 64.0, 64.0])
    ys = np.array([0.5, 0.3, 0.2, 0.4])
    keep = td_runs.pareto_front(xs, ys)
    np.testing.assert_array_equal(keep, [False, True, True, False])


def test_purity_at():
    # 3 classes, 4 latents, top-4 labels per latent. best_i picks latents
    # (0, 2, 3): purities 1.0 (all 7s), 0.5 (two 1s of four), 0.75.
    top_labels = np.array([
        [7, 7, 7, 7],
        [0, 1, 2, 3],
        [1, 1, 2, 3],
        [5, 5, 5, 2],
    ])
    best_i = np.array([0, 2, 3])
    assert analysis.purity_at(top_labels, best_i, k=4) == pytest.approx(
        (1.0 + 0.5 + 0.75) / 3
    )
    # k=2 slices the strongest two patches only.
    assert analysis.purity_at(top_labels, best_i, k=2) == pytest.approx(
        (1.0 + 1.0 + 1.0) / 3
    )
    with pytest.raises(AssertionError):
        analysis.purity_at(top_labels, best_i, k=5)


def test_load_freqs_and_mean_values(tmp_path):
    """The loaders read the actual inference artifacts (torch codec)."""
    import jax

    from saev_tpu import disk, nn
    from saev_tpu.data import Metadata, OrderedConfig, fake_vit
    from saev_tpu.framework import inference
    from saev_tpu.nn import modeling

    shards_dir = helpers.write_shards(tmp_path, n_examples=8, layers=(0,))
    runs_root = helpers.tmp_runs_root(tmp_path)
    run = disk.Run.new(
        "freqrun", train_shards_dir=shards_dir, val_shards_dir=shards_dir,
        runs_root=runs_root,
    )
    cfg = modeling.SparseAutoencoderConfig(
        d_model=fake_vit.D_MODEL, d_sae=16, activation=modeling.TopK(top_k=2)
    )
    params, state = modeling.init(cfg, jax.random.key(0))
    nn.dump(run.ckpt, cfg, params, state)
    inference.worker_fn(inference.Config(
        run=run.run_dir,
        data=OrderedConfig(shards=shards_dir, layer=0, batch_size=32),
        device="cpu",
    ))
    md = Metadata.load(shards_dir)
    freqs = analysis.load_freqs(run, md.hash)
    values = analysis.load_mean_values(run, md.hash)
    assert freqs.shape == (16,) and values.shape == (16,)
    assert (freqs >= 0).all() and (freqs <= 1).all()
    # TopK(2) over 16 latents: average firing rate is exactly 2/16.
    assert freqs.mean() == pytest.approx(2 / 16)
