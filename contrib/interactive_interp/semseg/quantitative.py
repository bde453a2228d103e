"""Quantitative latent-intervention evaluation for semantic segmentation.

Capability mirror of reference contrib/interactive_interp/semseg/quantitative.py
(main :26, Report :83, eval_{rand_vec,rand_feat,auto_feat} :159-396,
get_latent_lookup :399): for each segmentation class, pick its most-associated
SAE latent (best F1 across activation thresholds), set that latent to a scaled
value, re-run the linear segmentation probe, and count how many target-class
patches change prediction vs how many OTHER patches change — the specificity
measure of the latent's causal role. Controls: a random latent per class, and
a random direction of matched magnitude.

TPU redesign: no forward hooks or live ViT — activations stream from labeled
shards and the probe is per-patch linear, so interventions are evaluated ONE
CLASS AT A TIME on every patch (see _count_fn: the reference's cross-patch
specificity signal comes from hooking a mid-ViT layer; per-patch probes need
the per-class form for other_change to mean anything), and the linearity
collapses each class's modified logits to a rank-1 update — all three methods
share one ordered pass with no per-class re-encode.
"""

import csv
import dataclasses
import logging
import pathlib
import typing as tp

import numpy as np

from saev_tpu import helpers, nn
from saev_tpu.data import Metadata, OrderedConfig, OrderedDataLoader
from saev_tpu.nn import modeling

from . import training

logger = logging.getLogger("semseg.quantitative")

THRESHOLDS = (0.0, 0.1, 0.3, 1.0)


@dataclasses.dataclass(frozen=True)
class Config:
    """Intervention-evaluation configuration (reference quantitative.py config)."""

    sae_ckpt: pathlib.Path = pathlib.Path("./checkpoint/sae.pt")
    probe_ckpt: pathlib.Path = pathlib.Path("./checkpoints/semseg")
    acts: OrderedConfig = dataclasses.field(default_factory=OrderedConfig)
    """Labeled validation shards."""
    probe_i: int = 0
    """Which probe in the checkpoint grid to evaluate against."""
    n_classes: int = 151
    scale: float = -1.0
    """Intervention value = scale * latent's observed max (negative
    suppresses)."""
    methods: tuple[str, ...] = ("auto-feat", "rand-feat", "rand-vec")
    seed: int = 42
    dump_to: pathlib.Path = pathlib.Path("./results")


@dataclasses.dataclass(frozen=True)
class ClassResults:
    """Per-class intervention outcome (reference quantitative.py:56-79)."""

    class_id: int
    n_orig_patches: int
    n_changed_patches: int
    n_other_patches: int
    n_other_changed: int


@dataclasses.dataclass(frozen=True)
class Report:
    """One method's results (reference quantitative.py:83-136)."""

    method: str
    class_results: list[ClassResults]
    intervention_scale: float

    @property
    def mean_target_change(self) -> float:
        total = sum(r.n_orig_patches for r in self.class_results)
        changed = sum(r.n_changed_patches for r in self.class_results)
        return changed / total if total else 0.0

    @property
    def mean_other_change(self) -> float:
        total = sum(r.n_other_patches for r in self.class_results)
        changed = sum(r.n_other_changed for r in self.class_results)
        return changed / total if total else 0.0

    @property
    def target_change_std(self) -> float:
        """Std of the per-class target-change fraction — separates a method
        that disrupts every class a little from one that nukes a few
        (reference quantitative.py:110-125)."""
        per_class = np.array([
            r.n_changed_patches / r.n_orig_patches if r.n_orig_patches else 0.0
            for r in self.class_results
        ])
        return float(np.std(per_class))

    @property
    def other_change_std(self) -> float:
        per_class = np.array([
            r.n_other_changed / r.n_other_patches if r.n_other_patches else 0.0
            for r in self.class_results
        ])
        return float(np.std(per_class))

    def to_csv_row(self) -> dict[str, float | str]:
        return {
            "method": self.method,
            "target_change": self.mean_target_change,
            "other_change": self.mean_other_change,
            "target_std": self.target_change_std,
            "other_std": self.other_change_std,
            "scale": self.intervention_scale,
        }


def latent_class_stats(
    sae_cfg, params, state, acts_cfg: OrderedConfig, *, n_classes: int,
    thresholds: tuple[float, ...] = THRESHOLDS,
) -> tuple[np.ndarray, np.ndarray]:
    """(f1 (C, T, S), top_values (S,)): per-class/threshold latent F1 and the
    per-latent max activation, in one ordered pass (reference
    get_latent_lookup :399-540, without the live ViT)."""
    import jax
    import jax.numpy as jnp

    d_sae = sae_cfg.d_sae
    thr = jnp.asarray(thresholds, jnp.float32)

    @jax.jit
    def accumulate(tp_cts, fp_cts, fn_cts, top, x, labels):
        f_x = modeling.encode(sae_cfg, params, state, x, training=False)[0].f_x
        fired = f_x[:, None, :] > thr[None, :, None]  # (B, T, S)
        onehot = jax.nn.one_hot(labels, n_classes, dtype=jnp.float32)  # (B, C)
        pos = jnp.einsum("bc,bts->cts", onehot, fired.astype(jnp.float32))
        fired_total = jnp.sum(fired.astype(jnp.float32), axis=0)  # (T, S)
        class_total = jnp.sum(onehot, axis=0)  # (C,)
        return (
            tp_cts + pos,
            fp_cts + (fired_total[None] - pos),
            fn_cts + (class_total[:, None, None] - pos),
            jnp.maximum(top, f_x.max(axis=0)),
        )

    t = len(thresholds)
    tp_cts = np.zeros((n_classes, t, d_sae), np.float32)
    fp_cts = np.zeros((n_classes, t, d_sae), np.float32)
    fn_cts = np.zeros((n_classes, t, d_sae), np.float32)
    top = np.zeros((d_sae,), np.float32)
    dl = OrderedDataLoader(acts_cfg)
    try:
        for batch in helpers.progress(dl, desc="latent lookup"):
            assert "token_labels" in batch, (
                f"{acts_cfg.shards} has no labels.bin; quantitative eval needs "
                "per-patch labels."
            )
            tp_cts, fp_cts, fn_cts, top = accumulate(
                tp_cts, fp_cts, fn_cts, top,
                batch["act"], batch["token_labels"].astype(np.int32),
            )
    finally:
        dl.shutdown()
    tp_cts, fp_cts, fn_cts = (np.asarray(a) for a in (tp_cts, fp_cts, fn_cts))
    f1 = 2 * tp_cts / np.maximum(2 * tp_cts + fp_cts + fn_cts, 1.0)
    return f1, np.asarray(top)


def get_latent_lookup(f1_cts: np.ndarray) -> np.ndarray:
    """Best latent per class: max F1 over thresholds (background class 0 maps
    to latent -1, never intervened)."""
    best = f1_cts.max(axis=1).argmax(axis=1)  # (C,)
    best[0] = -1
    return best.astype(np.int64)


def _count_fn(sae_cfg, params, state, probe_w, probe_b, scale, n_classes):
    """One jitted pass computing per-class intervention counts for all three
    methods on one batch.

    Design note (differs from the one-pass-per-patch form this module first
    shipped): interventions are evaluated ONE CLASS AT A TIME — class c's
    latent is set to `scale * top_value` on EVERY patch, and we count how many
    class-c patches vs how many OTHER patches flip prediction. With a
    per-patch linear probe, modifying only class-c patches could never change
    any other patch (the reference's cross-patch effects come from hooking a
    mid-ViT layer, quantitative.py:337-367), so the all-patch per-class form
    is what makes other_change a real specificity measure here. Class masks
    use the ORIGINAL PREDICTIONS, matching the reference's accounting
    (compute_class_results, quantitative.py:592-630). The probe is linear, so
    each class's modified logits are orig + (v_c - f_lc) * (W_dec[l_c] @ W_p)
    — no re-encode per class."""
    import jax
    import jax.numpy as jnp

    w_dec = np.asarray(params["W_dec"])

    @jax.jit
    def run(x, lookup, top_values, rand_dir):
        enc, _ = modeling.encode(sae_cfg, params, state, x, training=False)
        f = enc.f_x  # (B, S)
        orig_logits = x @ probe_w + probe_b
        orig_pred = jnp.argmax(orig_logits, axis=-1)  # (B,)
        wdec_j = jnp.asarray(w_dec)

        def one_class(c):
            l = lookup[c]
            valid = l >= 0
            l_safe = jnp.maximum(l, 0)
            value = scale * top_values[l_safe]
            dscalar = value - f[:, l_safe]  # (B,) per-patch latent shift
            coef = wdec_j[l_safe] @ probe_w  # (K,)
            delta_lat = dscalar[:, None] * coef[None, :]
            if rand_dir is None:
                delta = delta_lat
            else:
                # Random-direction control: the same per-patch shift MAGNITUDE
                # along a fixed random unit vector.
                mag = jnp.abs(dscalar) * jnp.linalg.norm(wdec_j[l_safe])
                delta = mag[:, None] * (rand_dir @ probe_w)[None, :]
            mod_pred = jnp.argmax(orig_logits + delta, axis=-1)
            mod_pred = jnp.where(valid, mod_pred, orig_pred)
            orig_mask = orig_pred == c
            changed = mod_pred != orig_pred
            return (
                jnp.sum(orig_mask),
                jnp.sum(changed & orig_mask),
                jnp.sum(~orig_mask),
                jnp.sum(changed & ~orig_mask),
            )

        return jax.lax.map(one_class, jnp.arange(n_classes))

    return run


def worker_fn(cfg: Config) -> list[Report]:
    """Run every configured intervention method and dump the summary CSV
    (reference main :26-52). All methods share ONE ordered pass — the probe
    logits and SAE codes per batch are method-independent."""
    sae_cfg, params, state = nn.load(cfg.sae_ckpt)
    probe = training.load(cfg.probe_ckpt)
    probe_w = np.asarray(probe["w"][cfg.probe_i])
    probe_b = np.asarray(probe["b"][cfg.probe_i])

    f1, top_values = latent_class_stats(
        sae_cfg, params, state, cfg.acts, n_classes=cfg.n_classes
    )
    auto_lookup = get_latent_lookup(f1)
    rng = np.random.default_rng(cfg.seed)
    rand_lookup = np.where(
        auto_lookup >= 0, rng.integers(0, sae_cfg.d_sae, size=cfg.n_classes), -1
    )
    rand_dir = rng.normal(size=(sae_cfg.d_model,)).astype(np.float32)
    rand_dir /= np.linalg.norm(rand_dir)

    run = _count_fn(
        sae_cfg, params, state, probe_w, probe_b, cfg.scale, cfg.n_classes
    )
    method_args: dict[str, tuple] = {
        "auto-feat": (auto_lookup, None),
        "rand-feat": (rand_lookup, None),
        "rand-vec": (auto_lookup, rand_dir),
    }
    methods = [m for m in cfg.methods if m in method_args]
    totals = {m: np.zeros((cfg.n_classes, 4), np.int64) for m in methods}

    dl = OrderedDataLoader(cfg.acts)
    try:
        for batch in helpers.progress(dl, desc="interventions"):
            for method in methods:
                lookup, direction = method_args[method]
                counts = run(
                    batch["act"], lookup.astype(np.int32), top_values, direction
                )
                totals[method] += np.stack(
                    [np.asarray(c, np.int64) for c in counts], axis=1
                )
    finally:
        dl.shutdown()

    reports = []
    for method in methods:
        lookup = method_args[method][0]
        class_results = [
            ClassResults(
                class_id=c,
                n_orig_patches=int(totals[method][c, 0]),
                n_changed_patches=int(totals[method][c, 1]),
                n_other_patches=int(totals[method][c, 2]),
                n_other_changed=int(totals[method][c, 3]),
            )
            for c in range(1, cfg.n_classes)
            if lookup[c] >= 0 and totals[method][c, 0] > 0
        ]
        reports.append(Report(
            method=method,
            class_results=class_results,
            intervention_scale=cfg.scale,
        ))
        logger.info(
            "%s: target change %.3f, other change %.3f", method,
            reports[-1].mean_target_change, reports[-1].mean_other_change,
        )

    fpath = pathlib.Path(cfg.dump_to) / "results.csv"
    fpath.parent.mkdir(parents=True, exist_ok=True)
    with open(fpath, "w", newline="") as fd:
        writer = csv.DictWriter(
            fd,
            fieldnames=[
                "method", "target_change", "other_change",
                "target_std", "other_std", "scale",
            ],
        )
        writer.writeheader()
        for report in reports:
            writer.writerow(report.to_csv_row())
    return reports


def cli(cfg: Config) -> None:
    logging.basicConfig(
        level=logging.INFO,
        format="[%(asctime)s] [%(levelname)s] [%(name)s] %(message)s",
    )
    worker_fn(cfg)
