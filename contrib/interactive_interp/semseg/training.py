"""Train parallel linear patch-segmentation probes on shard activations.

Capability mirror of reference contrib/interactive_interp/semseg/training.py
(main :33, make_models :284, dump/load :166-264, get_class_ious :379): M linear
heads predict per-patch class labels from residual activations; heads train in
parallel on a shared batch.

TPU redesign: the reference re-runs a frozen DINOv2 forward every batch on GPU;
here probes train directly from activation shards (labels.bin supplies the
per-patch classes) through the shuffled loader, and the M heads are a vmapped
leading axis inside ONE jitted AdamW step — the same sweep trick as SAE
training.
"""

import dataclasses
import json
import logging
import pathlib

import numpy as np

from saev_tpu.data import ShuffledConfig, ShuffledDataLoader
from saev_tpu.utils import scheduling

logger = logging.getLogger("semseg.training")


@dataclasses.dataclass(frozen=True)
class Train:
    """One probe's config (reference semseg/config.py)."""

    shards: pathlib.Path = pathlib.Path("./shards/abcdef01")
    """Activation shards WITH labels.bin."""
    layer: int = -2
    n_classes: int = 151
    learning_rate: float = 1e-4
    weight_decay: float = 1e-3
    n_train: int = 200_000
    batch_size: int = 4096
    seed: int = 42
    ckpt_path: pathlib.Path = pathlib.Path("./checkpoints/semseg")


def make_models(cfgs: list[Train], d_model: int):
    """Stacked (M, d_model, n_classes) linear heads + biases."""
    import jax
    import jax.numpy as jnp

    n_classes = cfgs[0].n_classes
    assert all(c.n_classes == n_classes for c in cfgs)
    keys = jax.random.split(jax.random.key(cfgs[0].seed), len(cfgs))
    w = jnp.stack([
        jax.random.normal(k, (d_model, n_classes), jnp.float32)
        / np.sqrt(d_model)
        for k in keys
    ])
    b = jnp.zeros((len(cfgs), n_classes), jnp.float32)
    return {"w": w, "b": b}


def _make_step(n_classes: int):
    import jax
    import jax.numpy as jnp

    def loss_one(w, b, acts, labels):
        logits = acts @ w + b
        logp = jax.nn.log_softmax(logits)
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=1).mean()
        return nll

    def step(params, opt, acts, labels, lr, wd):
        def total(params):
            losses = jax.vmap(loss_one, in_axes=(0, 0, None, None))(
                params["w"], params["b"], acts, labels
            )
            return jnp.sum(losses), losses

        (_, losses), grads = jax.value_and_grad(total, has_aux=True)(params)
        count = opt["count"] + 1
        t = count.astype(jnp.float32)
        b1, b2, eps = 0.9, 0.999, 1e-8
        m = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, opt["m"], grads)
        v = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, opt["v"], grads)

        def upd(p, m_, v_):
            lr_ = lr.reshape((-1,) + (1,) * (p.ndim - 1))
            wd_ = wd.reshape((-1,) + (1,) * (p.ndim - 1))
            update = (m_ / (1 - b1**t)) / (jnp.sqrt(v_ / (1 - b2**t)) + eps)
            return p - lr_ * (update + wd_ * p)  # decoupled weight decay

        params = jax.tree.map(upd, params, m, v)
        return params, {"m": m, "v": v, "count": count}, losses

    return jax.jit(step)


def train(cfgs: list[Train]) -> dict:
    """Train all probes on one shared stream; returns stacked params."""
    import jax.numpy as jnp

    cfg = cfgs[0]
    assert all(c.shards == cfg.shards and c.layer == cfg.layer for c in cfgs), (
        "All probes must share shards/layer (one data stream)."
    )
    dl = ShuffledDataLoader(
        ShuffledConfig(
            shards=cfg.shards, layer=cfg.layer, batch_size=cfg.batch_size,
            n_threads=2, seed=cfg.seed,
        )
    )
    limited = scheduling.BatchLimiter(dl, cfg.n_train)
    md = dl.metadata
    d_model = md.d_model

    labels_fpath = pathlib.Path(cfg.shards) / "labels.bin"
    assert labels_fpath.exists(), (
        f"Shards at {cfg.shards} have no labels.bin; semseg probes need "
        "per-patch labels."
    )
    labels_mmap = np.memmap(
        labels_fpath, mode="r", dtype=np.uint8,
        shape=(md.n_examples, md.content_tokens_per_example),
    )

    params = make_models(cfgs, d_model)
    opt = {
        "m": {k: jnp.zeros_like(v) for k, v in params.items()},
        "v": {k: jnp.zeros_like(v) for k, v in params.items()},
        "count": jnp.zeros((), jnp.int32),
    }
    lr = jnp.asarray([c.learning_rate for c in cfgs], jnp.float32)
    wd = jnp.asarray([c.weight_decay for c in cfgs], jnp.float32)
    step = _make_step(cfg.n_classes)

    n_steps = 0
    for batch in limited:
        acts = jnp.asarray(np.asarray(batch["act"]))
        # The shuffled loader yields (example_idx, token_idx); join the labels
        # from the labels.bin memmap host-side.
        labels_np = labels_mmap[
            np.asarray(batch["example_idx"]), np.asarray(batch["token_idx"])
        ]
        labels = jnp.asarray(labels_np.astype(np.int32))
        params, opt, losses = step(params, opt, acts, labels, lr, wd)
        n_steps += 1
    logger.info("Trained %d probes for %d steps.", len(cfgs), n_steps)
    return params


def dump(ckpt_path: pathlib.Path, cfgs: list[Train], params: dict) -> pathlib.Path:
    ckpt_path = pathlib.Path(ckpt_path)
    ckpt_path.mkdir(parents=True, exist_ok=True)
    fpath = ckpt_path / "probes.npz"
    np.savez(
        fpath,
        w=np.asarray(params["w"]),
        b=np.asarray(params["b"]),
    )
    with open(ckpt_path / "cfgs.json", "w") as fd:
        json.dump([dataclasses.asdict(c) for c in cfgs], fd, indent=2, default=str)
    return fpath


def load(ckpt_path: pathlib.Path) -> dict:
    with np.load(pathlib.Path(ckpt_path) / "probes.npz") as fd:
        return {"w": fd["w"], "b": fd["b"]}


def load_latest(root: pathlib.Path) -> dict:
    """Load the newest probe checkpoint under `root` — largest `_step<N>`
    suffix on the checkpoint dir name, falling back to directory mtime
    (reference semseg/training.py:199-237 load_latest)."""
    import re

    root = pathlib.Path(root)
    candidates = sorted(p.parent for p in root.rglob("probes.npz"))
    if not candidates:
        raise FileNotFoundError(f"No probe checkpoints under {root}")

    def step_of(dpath: pathlib.Path) -> int:
        match = re.search(r"_step(\d+)$", dpath.name)
        return int(match.group(1)) if match else -1

    steps = [step_of(d) for d in candidates]
    if max(steps) >= 0:
        best = candidates[int(np.argmax(steps))]
    else:
        best = max(candidates, key=lambda d: d.stat().st_mtime)
        logger.warning("No _step suffixes under %s; using newest: %s", root, best)
    logger.info("Loading probe checkpoint %s.", best)
    return load(best)


def predict(params: dict, acts: np.ndarray, probe_i: int = 0) -> np.ndarray:
    """Per-token class predictions for one probe."""
    logits = acts @ np.asarray(params["w"][probe_i]) + np.asarray(params["b"][probe_i])
    return logits.argmax(axis=-1)


def get_class_ious(
    preds: np.ndarray, labels: np.ndarray, n_classes: int
) -> np.ndarray:
    """Per-class IoU (reference semseg/training.py:379-...). NaN for absent
    classes."""
    ious = np.full(n_classes, np.nan)
    for c in range(n_classes):
        pred_c = preds == c
        true_c = labels == c
        union = (pred_c | true_c).sum()
        if union == 0:
            continue
        ious[c] = (pred_c & true_c).sum() / union
    return ious
