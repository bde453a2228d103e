"""Image-level classification heads on SAE features.

Capability mirror of reference contrib/trait_discovery/src/tdiscovery/
classification.py (PatchAgg :59, LabelGrouping :68, DecisionTree :120,
SparseLinear :131, aggregate_to_images :270, train_worker_fn :310,
eval_worker_fn :819): aggregate patch-level SAE activations to image features
(mean/max), group dataset labels into a task, train a sparse-linear (L1
logistic) or decision-tree head, and evaluate AP + feature rankings.
"""

import dataclasses
import enum
import json
import logging
import pathlib
import pickle
import typing as tp

import numpy as np
import scipy.sparse

import saev_tpu.disk
from saev_tpu.data import Metadata, datasets

logger = logging.getLogger("td.classification")


class PatchAgg(enum.Enum):
    """How to aggregate patch-level features to image-level."""

    MEAN = "mean"
    MAX = "max"


@dataclasses.dataclass(frozen=True)
class LabelGrouping:
    """Defines a classification task by grouping labels (reference
    classification.py:68-117). Empty groups = use original labels directly."""

    name: str = "class"
    source_col: str = "class"
    groups: dict[str, list[str]] = dataclasses.field(default_factory=dict)

    def apply(
        self, labels: list[str], class_names: list[str] | None = None
    ) -> tuple[np.ndarray, list[str]]:
        """Map raw string labels to group indices; returns (y, class_names).
        Ungrouped labels are dropped (marked -1) when groups are given.

        `class_names` pins the index space (e.g. the names saved in a trained
        checkpoint) — without it, the mapping is re-derived from THIS split's
        label set, and a test split missing the alphabetically-first train
        class would silently shift every index."""
        if not self.groups:
            names = class_names if class_names is not None else sorted(set(labels))
            index = {name: i for i, name in enumerate(names)}
            return np.array([index.get(label, -1) for label in labels]), list(names)
        names = class_names if class_names is not None else sorted(self.groups)
        order = {name: i for i, name in enumerate(names)}
        lookup = {
            raw: order[name]
            for name in self.groups
            if name in order
            for raw in self.groups[name]
        }
        return np.array([lookup.get(label, -1) for label in labels]), list(names)


@dataclasses.dataclass(frozen=True)
class DecisionTree:
    """sklearn DecisionTreeClassifier head."""

    key: tp.Literal["decision-tree"] = "decision-tree"
    max_depth: int = -1
    """Maximum depth; negative = unlimited."""


@dataclasses.dataclass(frozen=True)
class SparseLinear:
    """L1-penalized logistic regression head."""

    key: tp.Literal["sparse-linear"] = "sparse-linear"
    C: float = 0.01
    """Inverse regularization strength; lower = sparser."""
    max_iter: int = 90


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    run: pathlib.Path = pathlib.Path("./runs/abcdefg")
    """Run directory."""
    train_shards: pathlib.Path = pathlib.Path("./shards/01234567")
    test_shards: pathlib.Path = pathlib.Path("./shards/abcdef01")
    task: LabelGrouping = dataclasses.field(default_factory=LabelGrouping)
    patch_agg: PatchAgg = PatchAgg.MAX
    cls: DecisionTree | SparseLinear = SparseLinear()
    debug: bool = False


def aggregate_to_images(
    token_acts: scipy.sparse.csr_matrix, tokens_per_example: int, agg: PatchAgg
) -> np.ndarray:
    """(n_tokens, d_sae) CSR → (n_images, d_sae) dense image features
    (reference classification.py:270-308)."""
    n_tokens, d_sae = token_acts.shape
    assert n_tokens % tokens_per_example == 0
    n_images = n_tokens // tokens_per_example
    if agg is PatchAgg.MEAN:
        # Row-block mean via sparse matmul with a pooling matrix.
        rows = np.repeat(np.arange(n_images), tokens_per_example)
        pool = scipy.sparse.csr_matrix(
            (
                np.full(n_tokens, 1.0 / tokens_per_example, np.float32),
                (rows, np.arange(n_tokens)),
            ),
            shape=(n_images, n_tokens),
        )
        return np.asarray((pool @ token_acts).todense())
    # Vectorized per-image max over the CSR nonzeros: np.maximum.at on
    # (row // tokens_per_example, col). Activations are >= 0, so absent
    # entries correctly leave the zero default.
    coo = token_acts.tocoo()
    out = np.zeros((n_images, d_sae), dtype=np.float32)
    np.maximum.at(out, (coo.row // tokens_per_example, coo.col), coo.data)
    return out


def load_image_labels(shards: pathlib.Path, source_col: str) -> list[str]:
    """Per-image string labels from the shard metadata's dataset config
    (reference load_image_labels, classification.py:176-218)."""
    md = Metadata.load(shards)
    ds = datasets.get_dataset(md.make_data_cfg())
    labels = []
    for i in range(len(ds)):
        sample = ds[i]
        if source_col == "class":
            value = sample.get("label", sample.get("target"))
        else:
            value = sample.get(source_col)
        labels.append(str(value))
    return labels


def _ckpt_path(run: saev_tpu.disk.Run, task: str) -> pathlib.Path:
    return run.ckpt.parent / f"classifier_{task}.pkl"


def train_worker_fn(cfg: TrainConfig) -> int:
    """Train the head on train-shard features; save the classifier + metadata
    (reference train_worker_fn, classification.py:310-494)."""
    import sklearn.linear_model
    import sklearn.tree

    run = saev_tpu.disk.Run(cfg.run)
    md = Metadata.load(cfg.train_shards)
    acts = scipy.sparse.load_npz(
        run.inference / cfg.train_shards.name / "token_acts.npz"
    ).tocsr()
    x = aggregate_to_images(acts, md.content_tokens_per_example, cfg.patch_agg)
    raw = load_image_labels(cfg.train_shards, cfg.task.source_col)
    y, class_names = cfg.task.apply(raw)
    keep = y >= 0
    x, y = x[keep], y[keep]
    assert len(np.unique(y)) >= 2, "Need at least two classes after grouping."

    if isinstance(cfg.cls, SparseLinear):
        clf = sklearn.linear_model.LogisticRegression(
            penalty="l1", C=cfg.cls.C, solver="liblinear", max_iter=cfg.cls.max_iter,
        )
    else:
        depth = None if cfg.cls.max_depth < 0 else cfg.cls.max_depth
        clf = sklearn.tree.DecisionTreeClassifier(max_depth=depth, random_state=0)
    clf.fit(x, y)
    acc = float(clf.score(x, y))

    out = _ckpt_path(run, cfg.task.name)
    with open(out, "wb") as fd:
        pickle.dump(
            {
                "classifier": clf,
                "class_names": class_names,
                "task": dataclasses.asdict(cfg.task),
                "patch_agg": cfg.patch_agg.value,
                "cls_cfg": dataclasses.asdict(cfg.cls),
                "train_accuracy": acc,
            },
            fd,
        )
    logger.info("Trained %s head (train acc %.3f); saved %s", cfg.cls.key, acc, out)
    return 0


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    run: pathlib.Path = pathlib.Path("./runs/abcdefg")
    test_shards: pathlib.Path = pathlib.Path("./shards/abcdef01")
    task: LabelGrouping = dataclasses.field(default_factory=LabelGrouping)
    patch_agg: PatchAgg = PatchAgg.MAX
    top_features: int = 20
    """How many most-important features to report per class."""


def extract_feature_ranking(clf, n_classes: int, top_k: int) -> list[list[int]]:
    """Most-important SAE latents per class (reference classification.py:622-648)."""
    if hasattr(clf, "coef_"):
        coef = np.asarray(clf.coef_)
        if coef.shape[0] == 1 and n_classes == 2:
            coef = np.vstack([-coef[0], coef[0]])
        return [np.argsort(-np.abs(coef[c]))[:top_k].tolist() for c in range(len(coef))]
    importances = np.asarray(clf.feature_importances_)
    ranked = np.argsort(-importances)[:top_k].tolist()
    return [ranked for _ in range(n_classes)]


def eval_worker_fn(cfg: EvalConfig) -> dict[str, object]:
    """Evaluate the trained head on the test shards; write metrics json
    (reference eval_worker_fn, classification.py:819-1040)."""
    from . import metrics as td_metrics

    run = saev_tpu.disk.Run(cfg.run)
    with open(_ckpt_path(run, cfg.task.name), "rb") as fd:
        ckpt = pickle.load(fd)
    clf = ckpt["classifier"]
    class_names = ckpt["class_names"]

    md = Metadata.load(cfg.test_shards)
    acts = scipy.sparse.load_npz(
        run.inference / cfg.test_shards.name / "token_acts.npz"
    ).tocsr()
    x = aggregate_to_images(acts, md.content_tokens_per_example, cfg.patch_agg)
    raw = load_image_labels(cfg.test_shards, cfg.task.source_col)
    # The checkpoint's class_names define the index space; re-deriving from
    # the test split's labels would misalign indices whenever the splits'
    # label sets differ.
    y, _ = cfg.task.apply(raw, class_names=list(class_names))
    keep = y >= 0
    x, y = x[keep], y[keep]

    n_classes = len(class_names)
    onehot = np.zeros((len(y), n_classes), dtype=np.float32)
    onehot[np.arange(len(y)), y] = 1.0
    if hasattr(clf, "predict_proba"):
        raw_scores = np.asarray(clf.predict_proba(x))
        scores = np.zeros((len(y), n_classes), dtype=np.float64)
        scores[:, np.asarray(clf.classes_, dtype=int)] = raw_scores
    else:
        scores = onehot * 0.0

    ap = td_metrics.average_precision(scores, onehot)
    acc = float((clf.predict(x) == y).mean())
    results = {
        "accuracy": acc,
        "mean_ap": float(np.nanmean(ap)),
        "ap_per_class": ap.tolist(),
        "class_names": class_names,
        "top_features_per_class": extract_feature_ranking(
            clf, n_classes, cfg.top_features
        ),
        "n_test": int(len(y)),
    }
    out_fpath = (
        run.inference / cfg.test_shards.name / f"classification_{cfg.task.name}.json"
    )
    with open(out_fpath, "w") as fd:
        json.dump(results, fd, indent=2)
    logger.info("Eval acc %.3f, mAP %.3f; wrote %s", acc, results["mean_ap"], out_fpath)
    return results


def train_cli(cfg: TrainConfig) -> None:
    logging.basicConfig(level=logging.INFO)
    train_worker_fn(cfg)


def eval_cli(cfg: EvalConfig) -> None:
    logging.basicConfig(level=logging.INFO)
    eval_worker_fn(cfg)


if __name__ == "__main__":
    from saev_tpu.utils import cli as cli_mod

    cli_mod.run({"train": train_cli, "eval": eval_cli})
