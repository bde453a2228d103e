"""Train a grid of linear probes on [CLS] activations from shards.

Capability mirror of reference contrib/interactive_interp/classification/
training.py (:33 main, :make_models, per-epoch AdamW loop over a live CLIP
forward). TPU redesign: the [CLS] activations come straight from the shard
protocol (`tokens="special"` — CLS is token 0), the whole probe grid is a
vmapped leading axis in one jitted AdamW step, and image targets come from
the dataset recorded in the shard metadata.
"""

import dataclasses
import json
import logging
import pathlib

import numpy as np

from saev_tpu import configs as saev_configs
from saev_tpu.data import IndexedConfig, IndexedDataset, Metadata, datasets

logger = logging.getLogger("classification.training")


@dataclasses.dataclass(frozen=True)
class Train:
    """One probe's config (reference classification/config.py:10-35)."""

    train_shards: pathlib.Path = pathlib.Path("./shards/abcdef01")
    """Shards extracted WITH cls_token=True."""
    val_shards: pathlib.Path = pathlib.Path("./shards/abcdef02")
    layer: int = -2
    learning_rate: float = 1e-4
    weight_decay: float = 1e-3
    n_epochs: int = 20
    batch_size: int = 512
    ckpt_path: pathlib.Path = pathlib.Path("./checkpoints/classification")
    seed: int = 42


def grid(cfg: Train, sweep_dct: dict[str, object]) -> tuple[list["Train"], list[str]]:
    """Expand a sweep dict into configs (reference config.py:39-47)."""
    cfgs, errs = [], []
    for d, dct in enumerate(saev_configs.expand(sweep_dct)):
        try:
            cfgs.append(dataclasses.replace(cfg, **dct, seed=cfg.seed + d))
        except Exception as err:
            errs.append(str(err))
    return cfgs, errs


def load_cls_features(shards: pathlib.Path, layer: int) -> np.ndarray:
    """(n_examples, d_model) CLS activations via the indexed dataset
    (tokens='special': one CLS vector per example)."""
    md = Metadata.load(shards)
    assert md.cls_token, f"Shards at {shards} were extracted without a CLS token."
    ds = IndexedDataset(
        IndexedConfig(shards=shards, tokens="special", layer=layer)
    )
    out = np.empty((md.n_examples, md.d_model), np.float32)
    for i in range(md.n_examples):
        out[i] = ds[i]["act"]
    return out


def load_targets(shards: pathlib.Path) -> np.ndarray:
    """Per-example integer targets from the dataset recorded in the shard
    metadata. Loads samples (incl. image bytes) — fine for probe-scale
    datasets; datasets with cheap metadata should override upstream."""
    md = Metadata.load(shards)
    ds = datasets.get_dataset(md.make_data_cfg())
    return np.asarray([int(ds[i]["target"]) for i in range(len(ds))], np.int64)


def train(cfgs: list[Train]) -> tuple[dict, list[str]]:
    """Train all probes jointly (one vmapped AdamW step); returns stacked
    params {w (M, D, C), b (M, C)} and the class list."""
    import jax
    import jax.numpy as jnp

    cfg = cfgs[0]
    assert all(
        c.train_shards == cfg.train_shards and c.layer == cfg.layer for c in cfgs
    ), "All probes must share shards/layer."

    x = load_cls_features(cfg.train_shards, cfg.layer)
    y = load_targets(cfg.train_shards)
    assert len(x) == len(y)
    n_classes = int(y.max()) + 1
    d_model = x.shape[1]
    m = len(cfgs)

    keys = jax.random.split(jax.random.key(cfg.seed), m)
    w = jnp.stack([
        jax.random.normal(k, (d_model, n_classes), jnp.float32) / np.sqrt(d_model)
        for k in keys
    ])
    params = {"w": w, "b": jnp.zeros((m, n_classes), jnp.float32)}
    opt = {
        "m": jax.tree.map(jnp.zeros_like, params),
        "v": jax.tree.map(jnp.zeros_like, params),
        "count": jnp.zeros((), jnp.int32),
    }
    lr = jnp.asarray([c.learning_rate for c in cfgs], jnp.float32)
    wd = jnp.asarray([c.weight_decay for c in cfgs], jnp.float32)

    @jax.jit
    def step(params, opt, xb, yb):
        def loss_one(w, b):
            logits = xb @ w + b
            logp = jax.nn.log_softmax(logits)
            return -jnp.mean(logp[jnp.arange(len(yb)), yb])

        losses, grads = jax.vmap(jax.value_and_grad(loss_one, argnums=(0, 1)))(
            params["w"], params["b"]
        )
        grads = {"w": grads[0], "b": grads[1]}
        count = opt["count"] + 1
        b1, b2, eps = 0.9, 0.999, 1e-8
        m_ = jax.tree.map(lambda mm, g: b1 * mm + (1 - b1) * g, opt["m"], grads)
        v_ = jax.tree.map(lambda vv, g: b2 * vv + (1 - b2) * g * g, opt["v"], grads)
        t = count.astype(jnp.float32)

        def upd(p, mm, vv):
            mhat = mm / (1 - b1**t)
            vhat = vv / (1 - b2**t)
            shape = (-1,) + (1,) * (p.ndim - 1)
            return p - lr.reshape(shape) * (
                mhat / (jnp.sqrt(vhat) + eps) + wd.reshape(shape) * p
            )

        params = jax.tree.map(upd, params, m_, v_)
        return params, {"m": m_, "v": v_, "count": count}, losses

    rng = np.random.default_rng(cfg.seed)
    n = len(x)
    bsz = min(cfg.batch_size, n)
    for _epoch in range(cfg.n_epochs):
        perm = rng.permutation(n)
        for start in range(0, n - bsz + 1, bsz):
            idx = perm[start : start + bsz]
            params, opt, losses = step(
                params, opt, jnp.asarray(x[idx]), jnp.asarray(y[idx])
            )
    logger.info("Trained %d probes, final losses %s.", m, np.asarray(losses))
    return jax.tree.map(np.asarray, params), [str(c) for c in range(n_classes)]


def evaluate(params: dict, shards: pathlib.Path, layer: int) -> np.ndarray:
    """(M,) validation accuracy per probe."""
    x = load_cls_features(shards, layer)
    y = load_targets(shards)
    logits = np.einsum("bd,mdc->mbc", x, np.asarray(params["w"])) + np.asarray(
        params["b"]
    )[:, None, :]
    preds = logits.argmax(axis=-1)
    return (preds == y[None]).mean(axis=1)


def dump(ckpt_path: pathlib.Path, cfgs: list[Train], params: dict,
         accs: np.ndarray) -> pathlib.Path:
    ckpt_path = pathlib.Path(ckpt_path)
    ckpt_path.mkdir(parents=True, exist_ok=True)
    np.savez(ckpt_path / "probes.npz", w=params["w"], b=params["b"])
    with open(ckpt_path / "report.json", "w") as fd:
        json.dump(
            [
                {**dataclasses.asdict(c), "val_accuracy": float(a)}
                for c, a in zip(cfgs, accs)
            ],
            fd, indent=2, default=str,
        )
    return ckpt_path / "probes.npz"


def main(cfgs: list[Train]) -> np.ndarray:
    """Train the grid, evaluate, checkpoint (reference training.py:33-120)."""
    cfg = cfgs[0]
    params, _classes = train(cfgs)
    accs = evaluate(params, cfg.val_shards, cfg.layer)
    dump(cfg.ckpt_path, cfgs, params, accs)
    for c, a in zip(cfgs, accs):
        logger.info("lr=%g wd=%g: val acc %.4f", c.learning_rate, c.weight_decay, a)
    return accs
