"""Sparse 1-D logistic probes for trait discovery, vectorized in JAX.

Capability mirror of reference contrib/trait_discovery/src/tdiscovery/probe1d.py
(Reference1DProbe :96, Sparse1DProbe :427, compute_lm_step :887,
_compute_slab_stats :841): per-(latent, class) two-parameter logistic probes
`sigmoid(b + w·x)` fit with a Levenberg–Marquardt trust-region step.

TPU-native redesign (the reference streams CSR events through torch index_add_
on a GPU): every (latent, class) problem is independent, so the whole
(n_latents × class_slab) grid solves as ONE jitted LM iteration —
`jax.ops.segment_sum` over CSR events replaces index_add_, and the 5-try
lambda-escalation inner loop is a masked `lax.fori_loop`. The zero-feature part
of the loss is analytic (per-latent counts), so work is O(nnz), never O(n·d).

Key invariants shared with the reference:
- x streams in CSR form; nothing shaped (nnz, n_classes) is materialized beyond
  one event chunk.
- qx (per-latent RMS of nonzero values) scales the trust region so db and
  qx·dw are commensurable.
- Ridge pulls the intercept toward the base rate logit, not zero.
"""

import dataclasses
import datetime
import json
import logging
import pathlib
import typing as tp

import numpy as np
import scipy.sparse

logger = logging.getLogger("probe1d")

# Structured telemetry channel (reference probe1d.py:795-817 emits one JSON
# "probe_iteration" event per LM iteration on a stats logger; notebooks/logs.py
# parses them). Enable with `logging.getLogger("probe1d.stats").setLevel(DEBUG)`
# plus a handler; tdiscovery.logparse reads the stream back.
stats_log = logging.getLogger("probe1d.stats")


def _rss_gb() -> float | None:
    try:
        import psutil

        return psutil.Process().memory_info().rss / 2**30
    except Exception:  # pragma: no cover - psutil always present in CI
        return None


def _device_peak_gb() -> float | None:
    """Peak device allocation in GiB, when the backend exposes memory_stats
    (TPU/GPU; CPU returns None)."""
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats()
        if stats and "peak_bytes_in_use" in stats:
            return stats["peak_bytes_in_use"] / 2**30
    except Exception:
        pass
    return None


def _emit_event(name: str, **fields) -> None:
    event = {
        "timestamp": datetime.datetime.now(datetime.timezone.utc).isoformat(),
        "event": name,
        **fields,
    }
    rss = _rss_gb()
    if rss is not None:
        event["rss_gb"] = rss
    stats_log.debug(json.dumps(event))


def sigmoid(z):
    """Stable logistic (reference probe1d.py:84-93)."""
    z = np.asarray(z, dtype=np.float64)
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return np.clip(out, 1e-12, 1 - 1e-12)


@dataclasses.dataclass
class ProbeHparams:
    ridge: float = 1e-8
    tol: float = 1e-6
    max_iter: int = 200
    lam_init: float = 1e-3
    lam_shrink: float = 0.1
    lam_grow: float = 10.0
    delta_logit: float = 6.0
    lam_min: float = 1e-12
    lam_max: float = 1e12
    eps: float = 1e-8
    fallback_step_scale: float = 1e-3


class Reference1DProbe:
    """Dense numpy reference implementing the trust-region spec step-for-step
    (reference probe1d.py:96-425). Used by tests to validate Sparse1DProbe."""

    def __init__(self, **kw):
        self.hp = ProbeHparams(**kw)
        self.intercept_: float = 0.0
        self.coef_: float = 0.0

    def fit(self, x: np.ndarray, y: np.ndarray) -> "Reference1DProbe":
        hp = self.hp
        x = np.asarray(x, dtype=np.float64).reshape(-1)
        y = np.asarray(y, dtype=np.float64).reshape(-1)
        n = len(x)
        pi = np.clip(y.mean(), hp.eps, 1 - hp.eps)
        base_b = float(np.log(pi / (1 - pi)))
        b, w = base_b, 0.0
        nz = x != 0
        rms = np.sqrt(np.mean(x[nz] ** 2)) if nz.any() else 1.0
        qx = max(rms, 1e-6)
        qx_sq = qx * qx

        lam = hp.lam_init
        prev_pred = np.nan
        prev_loss = np.nan
        prev_clipped = False

        for _ in range(hp.max_iter):
            z = b + w * x
            mu = sigmoid(z)
            s = mu * (1 - mu)
            g0 = float(np.mean(mu - y)) + hp.ridge * (b - base_b)
            g1 = float(np.mean((mu - y) * x)) + hp.ridge * w
            h0 = float(np.mean(s)) + hp.ridge
            h1 = float(np.mean(s * x))
            h2 = float(np.mean(s * x * x)) + hp.ridge
            loss = float(
                np.mean(-(y * np.log(mu) + (1 - y) * np.log1p(-np.minimum(mu, 1 - hp.eps))))
                + 0.5 * hp.ridge * (w**2 + (b - base_b) ** 2)
            )

            if np.isfinite(prev_pred) and np.isfinite(prev_loss):
                rho = (prev_loss - loss) / max(prev_pred, 1e-18)
                if rho >= 0.75 and not prev_clipped:
                    lam = max(lam * hp.lam_shrink, hp.lam_min)
                elif rho <= 0.25 or prev_clipped:
                    lam = min(lam * hp.lam_grow, hp.lam_max)

            if max(abs(g0), abs(g1)) <= hp.tol:
                break

            db = dw = pred = 0.0
            clipped = False
            ok = False
            lam_try = lam
            for _try in range(5):
                h0e, h2e = h0 + lam_try, h2 + lam_try * qx_sq
                det = h0e * h2e - h1 * h1
                if abs(det) > 1e-18:
                    db_t = (h2e * g0 - h1 * g1) / det
                    dw_t = (h0e * g1 - h1 * g0) / det
                    norm = np.sqrt(db_t**2 + (qx * dw_t) ** 2)
                    clipped_t = norm > hp.delta_logit
                    if clipped_t:
                        scale = hp.delta_logit / (norm + 1e-18)
                        db_t, dw_t = db_t * scale, dw_t * scale
                    pred_t = (
                        g0 * db_t + g1 * dw_t
                        - 0.5 * (h0 * db_t**2 + 2 * h1 * db_t * dw_t + h2 * dw_t**2)
                    )
                    if np.isfinite(pred_t) and pred_t > 0:
                        db, dw, pred, clipped, ok = db_t, dw_t, pred_t, clipped_t, True
                        break
                lam_try = min(lam_try * hp.lam_grow, hp.lam_max)

            if not ok:
                grad_scaled = np.sqrt(g0**2 + (qx * g1) ** 2)
                alpha = (
                    hp.fallback_step_scale * hp.delta_logit / (grad_scaled + 1e-18)
                    if grad_scaled > 0
                    else 0.0
                )
                db, dw = -alpha * g0, -alpha * g1
                pred = np.nan
                clipped = True
            lam = min(max(lam_try, hp.lam_min), hp.lam_max)

            b, w = b - db, w - dw
            prev_pred, prev_loss, prev_clipped = pred, loss, clipped

            step_norm = max(abs(db), abs(qx * dw))
            if max(abs(g0), abs(g1) / max(qx, 1e-12)) < hp.tol and step_norm < hp.tol:
                break

        self.intercept_, self.coef_ = float(b), float(w)
        return self

    def decision_function(self, x):
        return self.intercept_ + self.coef_ * np.asarray(x, dtype=np.float64)

    def predict_proba(self, x):
        p = sigmoid(self.decision_function(x))
        return np.stack([1 - p, p], axis=-1)

    def predict(self, x):
        return (self.decision_function(x) > 0).astype(np.int64)


@dataclasses.dataclass(frozen=True)
class MemoryPlan:
    """Device-memory plan for one Sparse1DProbe.fit (reference probe1d.py
    plans classes in slabs and rows in chunks, :449-466, :993-1030; here the
    resident costs are the stacked event arrays plus per-slab state)."""

    class_slab_size: int
    event_chunk_size: int
    event_bytes: int
    """All CSR events stay device-resident: 12 B/event (i32 col + f32 val + i32 row)."""
    slab_bytes: int
    """Per-slab state: y_slab (n_samples × c_b) + ~17 (L, c_b) f32 buffers
    (7 stats accumulators + 6 carry arrays + LM temps) + chunk temporaries."""

    @property
    def total_bytes(self) -> int:
        return self.event_bytes + self.slab_bytes


def plan_memory(
    *,
    n_latents: int,
    n_classes: int,
    nnz: int,
    n_samples: int,
    budget_bytes: int = 4 << 30,
    max_class_slab: int = 64,
    max_event_chunk: int = 1 << 20,
) -> MemoryPlan:
    """Choose (class_slab_size, event_chunk_size) so a fit stays under
    `budget_bytes` of device memory at production shapes (d_sae=16k latents ×
    thousands of classes × 10^8 events).

    The event stream is fixed cost; the free variables are the class slab
    (bounds y_slab + all (L, c_b) state) and the event chunk (bounds per-chunk
    (chunk, c_b) temporaries inside the scan body).
    """
    event_bytes = 12 * max(nnz, 1)
    assert event_bytes < budget_bytes, (
        f"Event stream alone ({event_bytes / 2**30:.1f} GiB) exceeds the "
        f"{budget_bytes / 2**30:.1f} GiB budget; shard the rows externally."
    )
    remaining = budget_bytes - event_bytes

    def slab_bytes(c_b: int, chunk: int) -> int:
        state = 17 * (n_latents + 1) * c_b * 4
        y_cost = n_samples * c_b * 4
        # ~8 live (chunk, c_b) f32 temporaries in the scan body (logits, mu,
        # s, residual, loss, yc, bc, wc).
        chunk_cost = 8 * chunk * c_b * 4
        return state + y_cost + chunk_cost

    slab = max_class_slab
    chunk = min(max_event_chunk, max(nnz, 1))
    while slab > 1 and slab_bytes(slab, chunk) > remaining:
        slab //= 2
    while chunk > (1 << 14) and slab_bytes(slab, chunk) > remaining:
        chunk //= 2
    slab = min(slab, n_classes)
    return MemoryPlan(
        class_slab_size=max(slab, 1),
        event_chunk_size=max(chunk, 1),
        event_bytes=event_bytes,
        slab_bytes=slab_bytes(max(slab, 1), max(chunk, 1)),
    )


class Sparse1DProbe:
    """Vectorized trust-region probes over all (latent, class) pairs in JAX
    (reference Sparse1DProbe, probe1d.py:427-786).

    Memory model: CSR events live on device once (12 B/event); classes are
    processed in slabs whose y columns transfer host->device per slab, so
    peak device use is events + O(n_latents × class_slab_size) state — a
    16k-latent × 2000-class probe over 10^8 events fits in ~1.5 GiB. Pass
    `memory_budget_mb` to auto-shrink `class_slab_size`/`event_chunk_size`
    (the plan is logged)."""

    def __init__(
        self,
        *,
        n_latents: int,
        n_classes: int,
        class_slab_size: int = 8,
        event_chunk_size: int = 1 << 20,
        memory_budget_mb: int = 4096,
        **hparams,
    ):
        self.n_latents = n_latents
        self.n_classes = n_classes
        self.class_slab_size = class_slab_size
        self.event_chunk_size = event_chunk_size
        self.memory_budget_mb = memory_budget_mb
        self.hp = ProbeHparams(**hparams)
        self.intercept_ = np.zeros((n_latents, n_classes), dtype=np.float32)
        self.coef_ = np.zeros((n_latents, n_classes), dtype=np.float32)
        self.n_iter_ = np.zeros((n_classes,), dtype=np.int32)

    def _plan(self, nnz: int, n_samples: int) -> MemoryPlan:
        plan = plan_memory(
            n_latents=self.n_latents,
            n_classes=self.n_classes,
            nnz=nnz,
            n_samples=n_samples,
            budget_bytes=self.memory_budget_mb << 20,
            max_class_slab=self.class_slab_size,
            max_event_chunk=self.event_chunk_size,
        )
        logger.info(
            "Memory plan: slab=%d chunk=%d events=%.1f MiB slab-state=%.1f MiB "
            "(budget %d MiB).",
            plan.class_slab_size, plan.event_chunk_size,
            plan.event_bytes / 2**20, plan.slab_bytes / 2**20,
            self.memory_budget_mb,
        )
        return plan

    # -- event preparation ----------------------------------------------------

    def _events(self, x: scipy.sparse.csr_matrix, chunk_size: int | None = None):
        x = x.tocsr()
        nnz = x.nnz
        row_idx = np.repeat(
            np.arange(x.shape[0], dtype=np.int32), np.diff(x.indptr)
        )
        cols = x.indices.astype(np.int32)
        vals = x.data.astype(np.float32)

        chunk = min(chunk_size or self.event_chunk_size, max(nnz, 1))
        pad = (-nnz) % chunk
        if pad:
            # Padding events point at latent index n_latents (a scratch row).
            cols = np.concatenate([cols, np.full(pad, self.n_latents, np.int32)])
            vals = np.concatenate([vals, np.zeros(pad, np.float32)])
            row_idx = np.concatenate([row_idx, np.zeros(pad, np.int32)])
        n_chunks = len(cols) // chunk
        return (
            cols.reshape(n_chunks, chunk),
            vals.reshape(n_chunks, chunk),
            row_idx.reshape(n_chunks, chunk),
        )

    def _latent_counts(self, x: scipy.sparse.csr_matrix):
        nnz_counts = np.zeros(self.n_latents, dtype=np.int64)
        np.add.at(nnz_counts, x.indices, 1)
        sum_sq = np.zeros(self.n_latents, dtype=np.float64)
        np.add.at(sum_sq, x.indices, x.data.astype(np.float64) ** 2)
        rms = np.sqrt(np.where(nnz_counts > 0, sum_sq / np.maximum(nnz_counts, 1), 1.0))
        qx = np.maximum(np.where(nnz_counts > 0, rms, 1.0), 1e-6)
        return nnz_counts, qx.astype(np.float32)

    # -- fit --------------------------------------------------------------------

    def fit(self, x: scipy.sparse.csr_matrix, y: np.ndarray) -> "Sparse1DProbe":
        import jax
        import jax.numpy as jnp

        n_samples, n_latents = x.shape
        assert n_latents == self.n_latents
        y = np.asarray(y, dtype=np.float32)
        assert y.shape == (n_samples, self.n_classes)
        hp = self.hp

        plan = self._plan(x.nnz, n_samples)
        cols_c, vals_c, rows_c = self._events(x, plan.event_chunk_size)
        nnz_counts, qx_np = self._latent_counts(x)
        empty_mask = (nnz_counts == 0).astype(np.bool_)
        n_zeros = (n_samples - nnz_counts).clip(min=0).astype(np.float32)

        cols_j = jnp.asarray(cols_c)
        vals_j = jnp.asarray(vals_c)
        rows_j = jnp.asarray(rows_c)
        qx = jnp.asarray(qx_np)[:, None]
        qx_sq = qx * qx
        n_f = float(n_samples)
        L = self.n_latents

        def slab_stats(y_slab, b, w):
            """Event-streamed per-(latent, class) sums via segment_sum
            (reference _compute_slab_stats, probe1d.py:841-885)."""
            c_b = y_slab.shape[1]

            def chunk_body(carry, inputs):
                cols, vals, rows = inputs
                bc = b[cols]  # (chunk, c_b); padding row L reads scratch
                wc = w[cols]
                v = vals[:, None]
                logits = bc + wc * v
                mu = jax.nn.sigmoid(logits)
                s = mu * (1 - mu)
                yc = y_slab[rows]
                # Padding events have value 0 and scratch latent; zero their
                # contribution entirely so pos_nz/mu_nz stay exact.
                valid = (cols < L)[:, None].astype(logits.dtype)
                residual = (mu - yc) * valid
                # Numerically-stable BCE with logits.
                loss = (
                    jnp.maximum(logits, 0) - logits * yc + jnp.log1p(jnp.exp(-jnp.abs(logits)))
                ) * valid
                seg = lambda t: jax.ops.segment_sum(t, cols, num_segments=L + 1)[:L]
                upd = {
                    "mu_nz": seg(mu * valid),
                    "g1": seg(residual * v),
                    "h0": seg(s * valid),
                    "h1": seg(s * v * valid),
                    "h2": seg(s * v * v * valid),
                    "loss_nz": seg(loss),
                    "pos_nz": seg(yc * valid),
                }
                carry = {k: carry[k] + upd[k] for k in carry}
                return carry, None

            init = {
                k: jnp.zeros((L, c_b), jnp.float32)
                for k in ("mu_nz", "g1", "h0", "h1", "h2", "loss_nz", "pos_nz")
            }
            stats, _ = jax.lax.scan(chunk_body, init, (cols_j, vals_j, rows_j))
            return stats

        def lm_step(g0, g1, h0, h1, h2, lam):
            """Masked 5-try LM solve (reference compute_lm_step, probe1d.py:887-993)."""
            grad_norm_init = jnp.maximum(jnp.abs(g0), jnp.abs(g1))
            inactive = grad_norm_init <= hp.tol
            state = {
                "lam": lam,
                "success": inactive,
                "db": jnp.zeros_like(g0),
                "dw": jnp.zeros_like(g0),
                "pred": jnp.zeros_like(g0),
                "clipped": jnp.zeros_like(g0, dtype=bool),
            }

            def try_body(_, st):
                active = ~st["success"]
                h0e = h0 + st["lam"]
                h2e = h2 + st["lam"] * qx_sq
                det = h0e * h2e - h1 * h1
                valid = active & (jnp.abs(det) > 1e-18)
                det_safe = jnp.where(valid, det, 1.0)
                db_t = jnp.where(valid, (h2e * g0 - h1 * g1) / det_safe, 0.0)
                dw_t = jnp.where(valid, (h0e * g1 - h1 * g0) / det_safe, 0.0)
                norm = jnp.sqrt(db_t**2 + (qx * dw_t) ** 2)
                clip = active & (norm > hp.delta_logit)
                scale = jnp.where(clip, hp.delta_logit / (norm + 1e-18), 1.0)
                db_t, dw_t = db_t * scale, dw_t * scale
                pred_t = (
                    g0 * db_t + g1 * dw_t
                    - 0.5 * (h0 * db_t**2 + 2 * h1 * db_t * dw_t + h2 * dw_t**2)
                )
                ok = active & jnp.isfinite(pred_t) & (pred_t > 0)
                st = {
                    "lam": jnp.clip(
                        jnp.where(active & ~ok, st["lam"] * hp.lam_grow, st["lam"]),
                        hp.lam_min, hp.lam_max,
                    ),
                    "success": st["success"] | ok,
                    "db": jnp.where(ok, db_t, st["db"]),
                    "dw": jnp.where(ok, dw_t, st["dw"]),
                    "pred": jnp.where(ok, pred_t, st["pred"]),
                    "clipped": jnp.where(ok, clip, st["clipped"]),
                }
                return st

            st = jax.lax.fori_loop(0, 5, try_body, state)

            failed = ~st["success"]
            qx_safe = jnp.maximum(qx, 1e-12)
            grad_scaled = jnp.sqrt(g0**2 + (qx_safe * g1) ** 2)
            alpha = jnp.where(
                grad_scaled > 0,
                hp.fallback_step_scale * hp.delta_logit / (grad_scaled + 1e-18),
                0.0,
            )
            db = jnp.where(failed, -alpha * g0, st["db"])
            dw = jnp.where(failed, -alpha * g1, st["dw"])
            pred = jnp.where(failed, jnp.nan, st["pred"])
            clipped = st["clipped"] | failed
            return db, dw, pred, st["lam"], clipped

        def iteration(carry, y_slab, pi_mean, base_slab, empty, n_zeros_col):
            """One outer LM iteration over a class slab (reference
            probe1d.py:632-825)."""
            b, w, lam, prev_pred, prev_loss, prev_clipped = carry
            stats = slab_stats(y_slab, jnp.concatenate([b, jnp.zeros((1, b.shape[1]))]),
                               jnp.concatenate([w, jnp.zeros((1, w.shape[1]))]))

            mu0 = jnp.clip(jax.nn.sigmoid(b), hp.eps, 1 - hp.eps)
            s0 = mu0 * (1 - mu0)
            zeros_frac = n_zeros_col / n_f
            g0 = stats["mu_nz"] / n_f + zeros_frac * mu0 - pi_mean
            g0 = g0 + hp.ridge * (b - base_slab)
            g1 = stats["g1"] / n_f + hp.ridge * w
            h0 = stats["h0"] / n_f + zeros_frac * s0 + hp.ridge
            h1 = stats["h1"] / n_f
            h2 = stats["h2"] / n_f + hp.ridge

            pos_nz_mean = stats["pos_nz"] / n_f
            pos_zero = jnp.minimum(jnp.clip(pi_mean - pos_nz_mean, 0.0), zeros_frac)
            neg_zero = zeros_frac - pos_zero
            zero_loss = -(
                pos_zero * jnp.log(mu0)
                + neg_zero * jnp.log1p(-jnp.minimum(mu0, 1 - hp.eps))
            )
            ridge_pen = 0.5 * hp.ridge * (w**2 + (b - base_slab) ** 2)
            loss_curr = stats["loss_nz"] / n_f + zero_loss + ridge_pen

            g0 = jnp.where(empty, 0.0, g0)
            g1 = jnp.where(empty, 0.0, g1)
            lam = jnp.where(empty, hp.lam_init, lam)

            mask_prev = jnp.isfinite(prev_pred) & jnp.isfinite(prev_loss)
            rho = jnp.where(
                mask_prev,
                (prev_loss - loss_curr) / jnp.maximum(prev_pred, 1e-18),
                0.0,
            )
            grow = mask_prev & ((rho <= 0.25) | prev_clipped)
            shrink = mask_prev & (rho >= 0.75) & (~prev_clipped)
            lam = jnp.clip(
                jnp.where(shrink, lam * hp.lam_shrink, jnp.where(grow, lam * hp.lam_grow, lam)),
                hp.lam_min, hp.lam_max,
            )

            db, dw, pred, lam, clipped = lm_step(g0, g1, h0, h1, h2, lam)
            fallback = jnp.isnan(pred) & ~empty
            b = jnp.where(empty, base_slab, b - db)
            w = jnp.where(empty, 0.0, w - dw)
            pred = jnp.where(empty, 0.0, pred)
            clipped = jnp.where(empty, False, clipped)
            prev_pred = jnp.where(empty, jnp.nan, pred)
            prev_loss = loss_curr
            prev_clipped = clipped

            qx_safe = jnp.maximum(qx, 1e-12)
            grad_abs = jnp.maximum(jnp.abs(g0), jnp.abs(g1 / qx_safe))
            step_abs = jnp.maximum(jnp.abs(db), jnp.abs(qx * dw))
            # Per-iteration telemetry aggregates (reference probe1d.py:795-816
            # logs grad_max/step_max/lambda_mean/loss_mean/loss_max/rho/
            # success_frac/fallback/step_clipped/pred_mean per iteration).
            aux = {
                "grad_max": jnp.max(grad_abs),
                "step_max": jnp.max(step_abs),
                "lambda_mean": jnp.mean(lam),
                "loss_mean": jnp.mean(loss_curr),
                "loss_max": jnp.max(loss_curr),
                "rho_mean": jnp.mean(rho),
                "rho_min": jnp.min(rho),
                "pred_mean": jnp.nanmean(jnp.where(empty, jnp.nan, pred)),
                "success_frac": 1.0 - jnp.mean(fallback.astype(jnp.float32)),
                "fallback": jnp.sum(fallback.astype(jnp.int32)),
                "step_clipped": jnp.sum((clipped & ~fallback).astype(jnp.int32)),
            }
            return (b, w, lam, prev_pred, prev_loss, prev_clipped), aux

        iteration_j = jax.jit(iteration)

        pi_all = np.clip(y.mean(axis=0), hp.eps, 1 - hp.eps)
        base_all = np.log(pi_all / (1 - pi_all)).astype(np.float32)
        empty_j = jnp.asarray(empty_mask)[:, None]
        n_zeros_j = jnp.asarray(n_zeros)[:, None]

        slab = plan.class_slab_size
        for c0 in range(0, self.n_classes, slab):
            c1 = min(c0 + slab, self.n_classes)
            c_b = c1 - c0
            # Per-slab host->device transfer: y never lives on device whole
            # (the memory plan's y_cost term).
            y_slab = jnp.asarray(np.ascontiguousarray(y[:, c0:c1]))
            pi_mean = jnp.asarray(pi_all[c0:c1].astype(np.float32))[None, :]
            base_slab = jnp.broadcast_to(
                jnp.asarray(base_all[c0:c1])[None, :], (L, c_b)
            )
            carry = (
                base_slab,
                jnp.zeros((L, c_b), jnp.float32),
                jnp.full((L, c_b), hp.lam_init, jnp.float32),
                jnp.full((L, c_b), jnp.nan, jnp.float32),
                jnp.full((L, c_b), jnp.nan, jnp.float32),
                jnp.zeros((L, c_b), dtype=bool),
            )
            n_iter = hp.max_iter
            emit = stats_log.isEnabledFor(logging.DEBUG)
            for it in range(hp.max_iter):
                carry, aux = iteration_j(
                    carry, y_slab, pi_mean, base_slab, empty_j, n_zeros_j
                )
                gn, sn = float(aux["grad_max"]), float(aux["step_max"])
                if emit:
                    fields = {
                        k: (int(v) if k in ("fallback", "step_clipped") else float(v))
                        for k, v in aux.items()
                    }
                    peak = _device_peak_gb()
                    if peak is not None:
                        fields["device_peak_gb"] = peak
                    _emit_event(
                        "probe_iteration", slab=[c0, c1], iter=it, **fields
                    )
                # Reference probe1d.py:821-823: all(grad <= tol) terminates (the
                # second grad<tol & step<tol clause is implied).
                if gn <= hp.tol or (gn < hp.tol and sn < hp.tol):
                    n_iter = it + 1
                    break
            self.intercept_[:, c0:c1] = np.asarray(carry[0])
            self.coef_[:, c0:c1] = np.asarray(carry[1])
            self.n_iter_[c0:c1] = n_iter
        return self

    # -- evaluation --------------------------------------------------------------

    def loss_matrix(self, x: scipy.sparse.csr_matrix, y: np.ndarray) -> np.ndarray:
        """Mean BCE per (latent, class) on (x, y) with the fitted params
        (reference loss_matrix, probe1d.py:1185-1265)."""
        import jax
        import jax.numpy as jnp

        n_samples = x.shape[0]
        y = np.asarray(y, dtype=np.float32)
        plan = self._plan(x.nnz, n_samples)
        cols_c, vals_c, rows_c = self._events(x, plan.event_chunk_size)
        nnz_counts, _ = self._latent_counts(x)
        n_zeros = (n_samples - nnz_counts).clip(min=0).astype(np.float32)

        L = self.n_latents
        cols_j = jnp.asarray(cols_c)
        vals_j = jnp.asarray(vals_c)
        rows_j = jnp.asarray(rows_c)

        def slab_sums(b, w, y_slab):
            def chunk_body(carry, inputs):
                cols, vals, rows = inputs
                logits = b[cols] + w[cols] * vals[:, None]
                yc = y_slab[rows]
                valid = (cols < L)[:, None].astype(logits.dtype)
                loss = (
                    jnp.maximum(logits, 0) - logits * yc
                    + jnp.log1p(jnp.exp(-jnp.abs(logits)))
                ) * valid
                seg = lambda t: jax.ops.segment_sum(t, cols, num_segments=L + 1)[:L]
                return (carry[0] + seg(loss), carry[1] + seg(yc * valid)), None

            c_b = y_slab.shape[1]
            init = (
                jnp.zeros((L, c_b), jnp.float32),
                jnp.zeros((L, c_b), jnp.float32),
            )
            (loss_nz, pos_nz), _ = jax.lax.scan(
                chunk_body, init, (cols_j, vals_j, rows_j)
            )
            return loss_nz, pos_nz

        slab_sums_j = jax.jit(slab_sums)
        loss_nz = np.zeros((L, self.n_classes), dtype=np.float32)
        pos_nz = np.zeros((L, self.n_classes), dtype=np.float32)
        for c0 in range(0, self.n_classes, plan.class_slab_size):
            c1 = min(c0 + plan.class_slab_size, self.n_classes)
            b = jnp.concatenate(
                [jnp.asarray(self.intercept_[:, c0:c1]),
                 jnp.zeros((1, c1 - c0), jnp.float32)]
            )
            w = jnp.concatenate(
                [jnp.asarray(self.coef_[:, c0:c1]),
                 jnp.zeros((1, c1 - c0), jnp.float32)]
            )
            ln, pn = slab_sums_j(b, w, jnp.asarray(np.ascontiguousarray(y[:, c0:c1])))
            loss_nz[:, c0:c1] = np.asarray(ln)
            pos_nz[:, c0:c1] = np.asarray(pn)

        pi = y.mean(axis=0)[None, :]
        mu0 = np.clip(sigmoid(self.intercept_.astype(np.float64)), self.hp.eps, 1 - self.hp.eps)
        zeros_frac = (n_zeros / n_samples)[:, None]
        pos_zero = np.minimum(np.clip(pi - np.asarray(pos_nz) / n_samples, 0.0, None), zeros_frac)
        neg_zero = zeros_frac - pos_zero
        zero_loss = -(pos_zero * np.log(mu0) + neg_zero * np.log1p(-np.minimum(mu0, 1 - self.hp.eps)))
        return (np.asarray(loss_nz) / n_samples + zero_loss).astype(np.float32)

    def loss_matrix_with_aux(
        self, x: scipy.sparse.csr_matrix, y: np.ndarray
    ) -> tuple[np.ndarray, ...]:
        """(loss, tp, fp, tn, fn) per (latent, class) at decision threshold 0
        (reference loss_matrix_with_aux, probe1d.py:1267-1336). Confusion counts
        decompose into streamed nonzero events + analytic zero-feature terms."""
        import jax
        import jax.numpy as jnp

        n_samples = x.shape[0]
        y = np.asarray(y, dtype=np.float32)
        loss = self.loss_matrix(x, y)

        plan = self._plan(x.nnz, n_samples)
        cols_c, vals_c, rows_c = self._events(x, plan.event_chunk_size)
        nnz_counts, _ = self._latent_counts(x)

        L = self.n_latents
        cols_j = jnp.asarray(cols_c)
        vals_j = jnp.asarray(vals_c)
        rows_j = jnp.asarray(rows_c)

        def slab_sums(b, w, y_slab):
            def chunk_body(carry, inputs):
                cols, vals, rows = inputs
                z = b[cols] + w[cols] * vals[:, None]
                pred = (z > 0).astype(jnp.float32)
                yc = y_slab[rows]
                valid = (cols < L)[:, None].astype(jnp.float32)
                seg = lambda t: jax.ops.segment_sum(t, cols, num_segments=L + 1)[:L]
                return (
                    carry[0] + seg(pred * yc * valid),        # tp_nz
                    carry[1] + seg(pred * (1 - yc) * valid),  # fp_nz
                    carry[2] + seg(yc * valid),               # pos_nz
                ), None

            c_b = y_slab.shape[1]
            init = tuple(jnp.zeros((L, c_b), jnp.float32) for _ in range(3))
            out, _ = jax.lax.scan(chunk_body, init, (cols_j, vals_j, rows_j))
            return out

        slab_sums_j = jax.jit(slab_sums)
        tp_nz = np.zeros((L, self.n_classes), dtype=np.float32)
        fp_nz = np.zeros((L, self.n_classes), dtype=np.float32)
        pos_nz = np.zeros((L, self.n_classes), dtype=np.float32)
        for c0 in range(0, self.n_classes, plan.class_slab_size):
            c1 = min(c0 + plan.class_slab_size, self.n_classes)
            b = jnp.concatenate(
                [jnp.asarray(self.intercept_[:, c0:c1]),
                 jnp.zeros((1, c1 - c0), jnp.float32)]
            )
            w = jnp.concatenate(
                [jnp.asarray(self.coef_[:, c0:c1]),
                 jnp.zeros((1, c1 - c0), jnp.float32)]
            )
            t, f, p = slab_sums_j(b, w, jnp.asarray(np.ascontiguousarray(y[:, c0:c1])))
            tp_nz[:, c0:c1] = np.asarray(t)
            fp_nz[:, c0:c1] = np.asarray(f)
            pos_nz[:, c0:c1] = np.asarray(p)

        n_nz = nnz_counts.astype(np.float64)[:, None]
        n_zero = np.maximum(n_samples - n_nz, 0.0)
        total_pos = y.sum(axis=0)[None, :]
        pos_zero = np.clip(total_pos - pos_nz, 0.0, None)
        pred0 = (self.intercept_ > 0).astype(np.float64)

        tp = tp_nz + pred0 * pos_zero
        fp = fp_nz + pred0 * (n_zero - pos_zero)
        fn = total_pos - tp
        tn = n_samples - tp - fp - fn
        return (
            loss,
            tp.astype(np.float32),
            fp.astype(np.float32),
            tn.astype(np.float32),
            fn.astype(np.float32),
        )

    def decision_function(self, x: scipy.sparse.csr_matrix, latent: int) -> np.ndarray:
        col = np.asarray(x[:, latent].todense()).reshape(-1)
        return self.intercept_[latent][None, :] + self.coef_[latent][None, :] * col[:, None]

    def predict_proba(self, x: scipy.sparse.csr_matrix, latent: int) -> np.ndarray:
        return sigmoid(self.decision_function(x, latent))


@dataclasses.dataclass(frozen=True)
class Config:
    """Probe training pipeline config (reference probe1d.py:1343-1374)."""

    run: pathlib.Path = pathlib.Path("./runs/abcdefg")
    """Run directory."""
    train_shards: pathlib.Path = pathlib.Path("./shards/01234567")
    """Training shards directory."""
    test_shards: pathlib.Path = pathlib.Path("./shards/abcdef01")
    """Test shards directory."""
    ridge: float = 1e-8
    class_slab_size: int = 8
    max_iter: int = 30
    memory_budget_mb: int = 4096
    """Device-memory budget; the fit auto-shrinks slab/chunk sizes to fit
    (see plan_memory)."""
    debug: bool = False


def worker_fn(cfg: Config) -> int:
    """Fit probes on the train split, dump probe1d_metrics.npz (loss, weights,
    biases, confusion counts) for both splits (reference probe1d.py:1390-1694)."""
    import saev_tpu.disk
    from saev_tpu.data import Metadata

    logger = logging.getLogger("probe1d")
    run = saev_tpu.disk.Run(cfg.run)

    def load_split(shards: pathlib.Path):
        art = run.inference / shards.name
        _emit_event("load_csr_start", split=shards.name, fpath=str(art / "token_acts.npz"))
        acts = scipy.sparse.load_npz(art / "token_acts.npz").tocsr()
        _emit_event("load_csr_end", split=shards.name, nnz=int(acts.nnz))
        md = Metadata.load(shards)
        labels = np.memmap(
            shards / "labels.bin", mode="r", dtype=np.uint8,
            shape=(md.n_examples, md.content_tokens_per_example),
        ).reshape(-1)
        return art, acts, np.asarray(labels)

    train_art, train_acts, train_labels = load_split(cfg.train_shards)
    test_art, test_acts, test_labels = load_split(cfg.test_shards)

    n_classes = int(max(train_labels.max(), test_labels.max())) + 1
    n_latents = train_acts.shape[1]
    assert test_acts.shape[1] == n_latents

    def one_hot(labels, n):
        out = np.zeros((labels.size, n), dtype=np.float32)
        out[np.arange(labels.size), labels] = 1.0
        return out

    probe = Sparse1DProbe(
        n_latents=n_latents, n_classes=n_classes,
        class_slab_size=cfg.class_slab_size, ridge=cfg.ridge, max_iter=cfg.max_iter,
        memory_budget_mb=cfg.memory_budget_mb,
    )
    probe.fit(train_acts, one_hot(train_labels, n_classes))
    logger.info("Fit probe on %d samples.", train_acts.shape[0])

    for art, acts, labels in (
        (train_art, train_acts, train_labels),
        (test_art, test_acts, test_labels),
    ):
        loss, tp, fp, tn, fn = probe.loss_matrix_with_aux(
            acts, one_hot(labels, n_classes)
        )
        out_fpath = art / "probe1d_metrics.npz"
        np.savez(
            out_fpath,
            loss=loss, weights=probe.coef_, biases=probe.intercept_,
            tp=tp, fp=fp, tn=tn, fn=fn,
        )
        logger.info("Saved probe outputs to %s.", out_fpath)
    return 0


def cli(cfg: Config, sweep: pathlib.Path | None = None) -> None:
    """Run the probe pipeline; with --sweep, expand a sweep file of config
    dicts (one worker per expanded config, reference launch.py probe1d
    sweeps, e.g. sweeps/004_fishbase/probe1d.py)."""
    import saev_tpu.configs

    logging.basicConfig(level=logging.INFO)
    if sweep is None:
        raise SystemExit(worker_fn(cfg))
    sweep_dcts = saev_tpu.configs.load_sweep(sweep)
    if not sweep_dcts:
        # Never silently fall back to the bare CLI config (train/inference
        # exit the same way on an unusable sweep file).
        logger.error("No valid sweeps found in '%s'.", sweep)
        raise SystemExit(1)
    cfgs, errs = saev_tpu.configs.load_cfgs(
        cfg, default=Config(), sweep_dcts=sweep_dcts
    )
    for err in errs:
        logger.warning("Error in config: %s", err)
    rc = 0
    for i, c in enumerate(cfgs, start=1):
        logger.info("Running probe1d config %d/%d.", i, len(cfgs))
        rc = max(rc, worker_fn(c))
    raise SystemExit(rc)
