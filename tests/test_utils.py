"""Tests for the L5 utility layer: scheduling, statistics, monitoring,
tracking, and the validated Metrics dataclass (mirror of reference
tests/test_utils_monitoring.py, test_utils_statistics.py, and the Metrics
validation tests in test_framework_inference.py:99-168)."""

import json
import math

import numpy as np
import pytest

from saev_tpu import metrics as metrics_mod
from saev_tpu.utils import monitoring, scheduling, statistics
from saev_tpu.utils import wandb as wandb_mod


# ---------------------------------------------------------------------------
# scheduling
# ---------------------------------------------------------------------------


def test_warmup_schedule_values():
    s = scheduling.Warmup(init=0.0, final=1.0, n_steps=10)
    vals = [s.step() for _ in range(12)]
    assert vals[0] == pytest.approx(0.1)
    assert vals[8] == pytest.approx(0.9)
    assert vals[9] == 1.0 and vals[11] == 1.0
    assert all(b >= a for a, b in zip(vals, vals[1:]))


def test_warmup_cosine_schedule_values():
    s = scheduling.WarmupCosine(init=0.0, n_warmup=10, peak=1.0, n_steps=110, final=0.0)
    vals = [s.step() for _ in range(120)]
    assert vals[4] == pytest.approx(0.5)  # mid-warmup
    assert max(vals) <= 1.0
    # midpoint of the cosine leg: (10 + 110) / 2 = step 60 -> peak/2
    assert vals[59] == pytest.approx(0.5, abs=0.02)
    assert vals[110] == 0.0 and vals[119] == 0.0


def test_warmup_cosine_jnp_matches_stateful():
    """The in-jit pure function must track the host Scheduler step-for-step
    (t=0 -> init, i.e. the value BEFORE the first .step() call)."""
    s = scheduling.WarmupCosine(init=0.0, n_warmup=7, peak=3e-4, n_steps=50, final=0.0)
    host = [0.0] + [s.step() for _ in range(60)]
    fn = [
        float(scheduling.warmup_cosine(t, 0.0, 7, 3e-4, 50, 0.0)) for t in range(61)
    ]
    np.testing.assert_allclose(fn, host, rtol=1e-6, atol=1e-9)


class _FakeLoader:
    def __init__(self, batch_size, n_batches, drop_last=True, short_last=0):
        self.batch_size = batch_size
        self.n_batches = n_batches
        self.drop_last = drop_last
        self.short_last = short_last
        self.custom_attr = "hello"

    def __iter__(self):
        for i in range(self.n_batches):
            n = self.batch_size
            if self.short_last and i == self.n_batches - 1:
                n = self.short_last
            yield {"act": np.zeros((n, 4), np.float32)}


def test_batch_limiter_stops_at_n_samples():
    dl = _FakeLoader(batch_size=8, n_batches=4)
    lim = scheduling.BatchLimiter(dl, n_samples=20)
    seen = sum(len(b["act"]) for b in lim)
    assert seen == 24  # 3 batches of 8 (>= 20 after the 3rd)
    assert len(lim) == math.ceil(20 / 8)


def test_batch_limiter_wraps_epochs():
    dl = _FakeLoader(batch_size=4, n_batches=2)  # 8 samples/epoch
    lim = scheduling.BatchLimiter(dl, n_samples=30)
    batches = list(lim)
    assert sum(len(b["act"]) for b in batches) >= 30


def test_batch_limiter_attribute_passthrough():
    dl = _FakeLoader(batch_size=4, n_batches=2)
    lim = scheduling.BatchLimiter(dl, n_samples=8)
    assert lim.custom_attr == "hello"
    with pytest.raises(AttributeError, match="no attribute 'nope'"):
        _ = lim.nope


def test_infer_batch_size():
    assert scheduling._infer_batch_size({"act": np.zeros((5, 2))}, fallback=9) == 5
    assert scheduling._infer_batch_size({}, fallback=9) == 9
    assert scheduling._infer_batch_size(np.zeros((3, 2)), fallback=9) == 3
    assert scheduling._infer_batch_size(object(), fallback=9) == 9


# ---------------------------------------------------------------------------
# statistics
# ---------------------------------------------------------------------------


def test_percentile_estimator_converges():
    rng = np.random.default_rng(0)
    est = statistics.PercentileEstimator(percentile=90, total=50_000, lr=1e-2)
    data = rng.normal(size=50_000)
    for v in data:
        est.update(v)
    true_p90 = np.quantile(data, 0.9)
    assert abs(est.estimate - true_p90) < 0.15


def test_percentile_estimator_vector_shape():
    est = statistics.PercentileEstimator(percentile=50, total=100, shape=(3,))
    est.update(np.array([1.0, 2.0, 3.0]))
    assert est.estimate.shape == (3,)


def test_batch_entropy_uniform_vs_degenerate():
    n_examples, tokens = 64, 16
    rng = np.random.default_rng(1)
    uniform = statistics.calc_batch_entropy(
        rng.integers(0, n_examples, 4096), rng.integers(0, tokens, 4096),
        n_examples, tokens,
    )
    degenerate = statistics.calc_batch_entropy(
        np.zeros(4096, np.int64), np.zeros(4096, np.int64), n_examples, tokens
    )
    # Reference metric names preserved (statistics.py:57-91).
    for key in (
        "loader/example_entropy", "loader/example_entropy_normalized",
        "loader/example_coverage", "loader/token_entropy",
        "loader/token_entropy_normalized", "loader/token_coverage",
    ):
        assert key in uniform
    assert uniform["loader/example_entropy_normalized"] > 0.95
    assert uniform["loader/example_coverage"] == 1.0
    assert degenerate["loader/example_entropy"] == 0.0
    assert degenerate["loader/example_coverage"] == pytest.approx(1 / n_examples)


def test_batch_entropy_validation():
    with pytest.raises(ValueError, match="n_examples"):
        statistics.calc_batch_entropy([0], [0], 0, 4)
    with pytest.raises(ValueError, match="same length"):
        statistics.calc_batch_entropy([0, 1], [0], 4, 4)
    with pytest.raises(ValueError, match="at least one"):
        statistics.calc_batch_entropy([], [], 4, 4)


# ---------------------------------------------------------------------------
# monitoring
# ---------------------------------------------------------------------------


class _IoCounters:
    def __init__(self, read_bytes):
        self.read_bytes = read_bytes


class _FakeProc:
    def __init__(self, reads=(0, 10_000_000), cpu=42.0, fail_io=False, fail_cpu=False):
        self._reads = list(reads)
        self._cpu = cpu
        self.fail_io = fail_io
        self.fail_cpu = fail_cpu

    def io_counters(self):
        if self.fail_io:
            raise PermissionError("nope")
        return _IoCounters(self._reads.pop(0) if len(self._reads) > 1 else self._reads[0])

    def cpu_percent(self, interval=None):
        if self.fail_cpu:
            raise PermissionError("nope")
        return self._cpu


class _LoaderWithFill:
    buffer_fill = 0.75


def test_monitor_reports_io_cpu_fill():
    mon = monitoring.DataloaderMonitor(_LoaderWithFill(), process=_FakeProc())
    m1 = mon.compute(now=100.0)
    assert m1["loader/buffer_fill"] == 0.75
    assert m1["loader/read_mb"] == 0.0
    assert m1["loader/cpu_util"] == 42.0
    assert "loader/read_mb_s" not in m1  # needs two samples
    m2 = mon.compute(now=101.0)
    assert m2["loader/read_mb_s"] == pytest.approx(10.0)


def test_monitor_degrades_on_permission_denied(caplog):
    mon = monitoring.DataloaderMonitor(
        _LoaderWithFill(), process=_FakeProc(fail_io=True, fail_cpu=True)
    )
    m = mon.compute(now=1.0)
    m = mon.compute(now=2.0)  # warned once, not twice
    assert m == {"loader/buffer_fill": 0.75}
    assert mon.warned_io and mon.warned_cpu


def test_monitor_fill_fallbacks():
    class _Callable:
        def buffer_fill(self):
            return 0.5

    assert monitoring.DataloaderMonitor._get_reservoir_fill(_Callable()) == 0.5
    assert monitoring.DataloaderMonitor._get_reservoir_fill(object()) == 0.0


def test_monitor_attach_resets():
    mon = monitoring.DataloaderMonitor(_LoaderWithFill(), process=_FakeProc())
    mon.compute(now=1.0)
    assert mon.last_read_bytes is not None
    new_proc = _FakeProc()
    mon._proc = new_proc
    mon.attach(_LoaderWithFill())
    assert mon.last_read_bytes is None


# ---------------------------------------------------------------------------
# tracking (offline JSONL backend)
# ---------------------------------------------------------------------------


def test_parallel_run_replays_queued_metrics(tmp_path):
    run = wandb_mod.ParallelWandbRun(
        "proj", [{"lr": 1e-4}, {"lr": 4e-4}, {"lr": 1e-3}],
        mode="offline", tags=["test"], dir=str(tmp_path),
    )
    for step in range(3):
        run.log(
            [{"loss": float(i * 10 + step)} for i in range(3)], step=step
        )
    run.set_summary("final", 7)
    ids = run.finish()
    assert len(ids) == 3 and len(set(ids)) == 3

    for i, rid in enumerate(ids):
        d = tmp_path / "proj" / rid
        cfg = json.loads((d / "config.json").read_text())
        assert cfg["config"] == {"lr": [1e-4, 4e-4, 1e-3][i]}
        lines = [json.loads(l) for l in (d / "metrics.jsonl").read_text().splitlines()]
        assert [l["loss"] for l in lines] == [i * 10 + s for s in range(3)]
        assert [l["step"] for l in lines] == [0, 1, 2]
        summary = json.loads((d / "summary.json").read_text())
        # wandb semantics: summary = explicit set_summary keys PLUS the last
        # logged value per metric key.
        assert summary == {"final": 7, "loss": float(i * 10 + 2)}


def test_jsonable_handles_arrays():
    out = wandb_mod._jsonable({"a": np.float32(1.5), "b": np.arange(3)})
    assert out == {"a": 1.5, "b": [0, 1, 2]}


# ---------------------------------------------------------------------------
# metrics.Metrics
# ---------------------------------------------------------------------------


def test_metrics_from_accumulators_roundtrip():
    m = metrics_mod.Metrics.from_accumulators(
        sse_recon=10.0, sse_baseline=100.0, n_tokens=50, d_model=4
    )
    assert m.normalized_mse == pytest.approx(0.1)
    assert m.mse_per_dim == pytest.approx(10.0 / 200)
    assert m.n_elements == 200
    m2 = metrics_mod.Metrics.from_dict(m.to_dict())
    assert m2 == m


@pytest.mark.parametrize(
    "patch",
    [
        {"normalized_mse": 0.5},
        {"n_elements": 7},
        {"mse_per_token": 123.0},
        {"sse_baseline": -1.0},
        {"n_tokens": 0},
    ],
)
def test_metrics_rejects_inconsistent_fields(patch):
    good = metrics_mod.Metrics.from_accumulators(
        sse_recon=10.0, sse_baseline=100.0, n_tokens=50, d_model=4
    ).to_dict()
    import dataclasses as _dc

    bad = {**good, **patch}
    with pytest.raises(AssertionError):
        metrics_mod.Metrics(**bad)


def test_metrics_rejects_nonfinite():
    with pytest.raises(AssertionError, match="finite"):
        metrics_mod.Metrics.from_accumulators(
            sse_recon=float("inf"), sse_baseline=1.0, n_tokens=1, d_model=1
        )
