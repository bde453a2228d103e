"""Quantitative latent-intervention evaluation for semantic segmentation.

Capability mirror of reference contrib/interactive_interp/semseg/quantitative.py
(main :26, Report :83, eval_{rand_vec,rand_feat,auto_feat} :159-396,
get_latent_lookup :399): for each segmentation class, pick its most-associated
SAE latent (best F1 across activation thresholds), set that latent to a scaled
value in every patch of the class, reconstruct activations through the SAE
(x' = x - x_hat + decode(f')), re-run the linear segmentation probe, and count
how many target-class patches change prediction vs how many OTHER patches
change — the specificity measure of the latent's causal role. Controls:
a random latent per class, and a random direction of matched magnitude.

TPU redesign: no forward hooks or live ViT — activations stream from labeled
shards (ordered loader attaches token_labels) and the intervention is one
jitted function of (acts, labels, latent_lookup, top_values).
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


def _intervene_fn(sae_cfg, params, state, probe_w, probe_b, scale):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x, labels, lookup, top_values, rand_dir):
        enc, _ = modeling.encode(sae_cfg, params, state, x, training=False)
        f = enc.f_x
        x_hat = modeling.decode(sae_cfg, params, f)[:, -1, :]

        lat = lookup[labels]  # (B,), -1 for background
        valid = lat >= 0
        lat_safe = jnp.maximum(lat, 0)
        value = scale * top_values[lat_safe]
        f_mod = f.at[jnp.arange(f.shape[0]), lat_safe].set(
            jnp.where(valid, value, f[jnp.arange(f.shape[0]), lat_safe])
        )
        x_hat_mod = modeling.decode(sae_cfg, params, f_mod)[:, -1, :]
        if rand_dir is None:
            x_mod = x - x_hat + x_hat_mod
        else:
            # Random-direction control: perturb by the same per-patch magnitude
            # along a fixed random unit vector instead of the latent direction.
            mag = jnp.linalg.norm(x_hat_mod - x_hat, axis=-1, keepdims=True)
            x_mod = x + jnp.where(valid[:, None], mag * rand_dir[None, :], 0.0)

        orig = jnp.argmax(x @ probe_w + probe_b, axis=-1)
        mod = jnp.argmax(x_mod @ probe_w + probe_b, axis=-1)
        return orig, mod

    return run


def compute_class_results(
    orig: np.ndarray, mod: np.ndarray, labels: np.ndarray, n_classes: int
) -> list[ClassResults]:
    out = []
    changed = orig != mod
    for c in range(1, n_classes):
        is_c = labels == c
        n_c = int(is_c.sum())
        if n_c == 0:
            continue
        out.append(ClassResults(
            class_id=c,
            n_orig_patches=n_c,
            n_changed_patches=int(changed[is_c].sum()),
            n_other_patches=int((~is_c).sum()),
            n_other_changed=int(changed[~is_c].sum()),
        ))
    return out


def worker_fn(cfg: Config) -> list[Report]:
    """Run every configured intervention method and dump the summary CSV
    (reference main :26-52)."""
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

    run = _intervene_fn(sae_cfg, params, state, probe_w, probe_b, cfg.scale)
    method_args: dict[str, tuple] = {
        "auto-feat": (auto_lookup, None),
        "rand-feat": (rand_lookup, None),
        "rand-vec": (auto_lookup, rand_dir),
    }

    reports = []
    for method in cfg.methods:
        lookup, direction = method_args[method]
        origs, mods, labs = [], [], []
        dl = OrderedDataLoader(cfg.acts)
        try:
            for batch in helpers.progress(dl, desc=method):
                labels = batch["token_labels"].astype(np.int32)
                orig, mod = run(
                    batch["act"], labels, lookup.astype(np.int32),
                    top_values, direction,
                )
                origs.append(np.asarray(orig))
                mods.append(np.asarray(mod))
                labs.append(labels)
        finally:
            dl.shutdown()
        reports.append(Report(
            method=method,
            class_results=compute_class_results(
                np.concatenate(origs), np.concatenate(mods),
                np.concatenate(labs), cfg.n_classes,
            ),
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
