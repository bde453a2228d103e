"""Probe1d telemetry round-trip: fit emits structured JSON events; logparse
reads them back into typed events, dataframes, summaries, and figures
(mirror of reference contrib/trait_discovery/notebooks/logs.py)."""

import logging
import pathlib
import sys

import numpy as np
import pytest
import scipy.sparse

sys.path.insert(
    0, str(pathlib.Path(__file__).parent.parent / "contrib" / "trait_discovery" / "src")
)

from tdiscovery import logparse, probe1d


@pytest.fixture()
def telemetry_log(tmp_path):
    """Fit a tiny probe with the stats channel at DEBUG; yields the log path."""
    log_fpath = tmp_path / "probe1d.log"
    handler = logging.FileHandler(log_fpath)
    handler.setFormatter(
        logging.Formatter("[%(asctime)s] [%(levelname)s] [%(name)s] %(message)s")
    )
    stats = logging.getLogger("probe1d.stats")
    old_level = stats.level
    stats.setLevel(logging.DEBUG)
    stats.addHandler(handler)
    try:
        rng = np.random.default_rng(0)
        x = np.where(rng.uniform(size=(128, 4)) < 0.4, 1.0, 0.0).astype(np.float32)
        y = (rng.uniform(size=(128, 3)) < 0.3).astype(np.float32)
        probe = probe1d.Sparse1DProbe(
            n_latents=4, n_classes=3, class_slab_size=2, max_iter=5
        )
        probe.fit(scipy.sparse.csr_matrix(x), y)
        handler.flush()
        yield log_fpath
    finally:
        stats.removeHandler(handler)
        stats.setLevel(old_level)
        handler.close()


def test_fit_emits_probe_iteration_events(telemetry_log):
    events = logparse.load_events(telemetry_log)
    iters = [e for e in events if isinstance(e, logparse.ProbeIter)]
    assert iters, "fit with probe1d.stats at DEBUG must emit events"
    # 3 classes in slabs of 2 -> slabs [0,2) and [2,3), each with iterations.
    slabs = {e.slab for e in iters}
    assert slabs == {(0, 2), (2, 3)}
    by_slab_iters = sorted(e.iter for e in iters if e.slab == (0, 2))
    assert by_slab_iters[0] == 0
    assert by_slab_iters == sorted(set(by_slab_iters)), "one event per iteration"
    first = iters[0]
    assert first.grad_max is not None and first.grad_max > 0
    assert first.loss_mean is not None and 0 < first.loss_mean < 10
    assert first.success_frac is not None and 0 <= first.success_frac <= 1
    assert first.rss_gb is not None and first.rss_gb > 0


def test_iters_df_and_summary(telemetry_log):
    events = logparse.load_events(telemetry_log)
    df = logparse.iters_df(events)
    assert {"slab_id", "iter", "loss_mean", "grad_max", "elapsed_s"} <= set(df.columns)
    assert (df["elapsed_s"] >= 0).all()
    # Loss never increases by an order of magnitude between iterations on
    # this convex toy problem.
    for _, grp in df.groupby("slab_id"):
        losses = grp.sort_values("iter")["loss_mean"].to_numpy()
        assert losses[-1] <= losses[0] * 1.5

    summary = logparse.summarize(events)
    assert summary["n_slabs"] == 2
    assert summary["n_iterations"] == len(df)
    assert summary["final_loss_mean"] > 0
    assert "peak_rss_gb" in summary


def test_figures_render(telemetry_log):
    events = logparse.load_events(telemetry_log)
    df = logparse.iters_df(events)
    for maker in (
        logparse.fig_loss,
        logparse.fig_grad,
        logparse.fig_trust_region,
        logparse.fig_memory,
    ):
        fig = maker(df)
        assert fig.get_axes(), maker.__name__
        import matplotlib.pyplot as plt

        plt.close(fig)


def test_parse_line_tolerates_noise():
    assert logparse.parse_line("plain text line") is None
    assert logparse.parse_line("prefix {not json") is None
    assert logparse.parse_line('{"event": "unknown_kind", "x": 1}') is None
    line = (
        "[2026-08-17 10:00:00] [DEBUG] [probe1d.stats] "
        '{"timestamp": "2026-08-17T10:00:00+00:00", "event": "load_csr_start",'
        ' "split": "abc123", "fpath": "/x/token_acts.npz", "rss_gb": 1.5}'
    )
    event = logparse.parse_line(line)
    assert isinstance(event, logparse.LoadCsr)
    assert event.split == "abc123" and event.phase == "start"
    assert event.rss_gb == 1.5


def test_worker_events_parse_without_iteration_fields():
    line = (
        '{"timestamp": "2026-08-17T10:00:01+00:00", "event": "load_csr_end",'
        ' "split": "abc123", "nnz": 420}'
    )
    event = logparse.parse_line(line)
    assert isinstance(event, logparse.LoadCsr)
    assert event.phase == "end" and event.nnz == 420 and event.rss_gb is None
