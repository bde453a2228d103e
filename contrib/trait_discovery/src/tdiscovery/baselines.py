"""Dictionary-learning baselines: mini-batch k-means, streaming PCA, semi-NMF.

Capability mirror of reference contrib/trait_discovery/src/tdiscovery/baselines.py
(MiniBatchKMeans :58, MiniBatchPCA :183, MiniBatchSemiNMF :284, dump/load
:588-677): sklearn-style `partial_fit`/`transform` estimators over activation
batches, rebuilt with jitted JAX updates. Checkpoints keep the reference layout
(`checkpoint/baseline.pt`, JSON header line + torch-codec state dict).
"""

import dataclasses
import json
import logging
import pathlib
import typing as tp

import numpy as np

import saev_tpu.disk

logger = logging.getLogger("baselines")

BaselineMethod = tp.Literal["kmeans", "pca", "semi-nmf"]
BASELINE_SCHEMA_VERSION = 1


def baseline_ckpt(run: saev_tpu.disk.Run) -> pathlib.Path:
    """Baseline weights live beside sae.pt as checkpoint/baseline.pt
    (reference baselines.py:38-45)."""
    return run.ckpt.parent / "baseline.pt"


def _pos_part(x):
    return (abs(x) + x) * 0.5


def _neg_part(x):
    return (abs(x) - x) * 0.5


class MiniBatchKMeans:
    """Mini-batch k-means with empty-cluster resurrection and collapsed-center
    splitting (reference baselines.py:58-180). The assignment + accumulation
    step is one jitted function."""

    method = "kmeans"

    def __init__(self, k: int, collapse_tol: float = 0.5, seed: int = 0):
        self.k = k
        self.collapse_tol = collapse_tol
        self.cluster_centers_: np.ndarray | None = None
        self.cluster_counts_: np.ndarray | None = None
        self.n_steps_ = 0
        self.n_features_in_: int | None = None
        self.last_batch_inertia_: float | None = None
        self._rng = np.random.default_rng(seed)
        self._step_fn = None

    def _make_step(self):
        import jax
        import jax.numpy as jnp

        @jax.jit
        def step(centers, counts, batch):
            d2 = (
                jnp.sum(batch**2, axis=1, keepdims=True)
                - 2.0 * batch @ centers.T
                + jnp.sum(centers**2, axis=1)[None, :]
            )
            assign = jnp.argmin(d2, axis=1)
            counts_batch = jnp.zeros(self.k, batch.dtype).at[assign].add(1.0)
            sums_batch = jnp.zeros_like(centers).at[assign].add(batch)
            inertia = jnp.mean(jnp.take_along_axis(d2, assign[:, None], axis=1))
            return assign, counts_batch, sums_batch, jnp.maximum(inertia, 0.0)

        return step

    def partial_fit(self, batch: np.ndarray) -> "MiniBatchKMeans":
        import jax.numpy as jnp

        batch = np.asarray(batch, dtype=np.float32)
        assert batch.ndim == 2, f"batch must be 2D, got {batch.shape}"
        if self.n_features_in_ is None:
            self.n_features_in_ = batch.shape[1]
        assert batch.shape[1] == self.n_features_in_

        if self.cluster_centers_ is None:
            n = batch.shape[0]
            if n >= self.k:
                idx = self._rng.permutation(n)[: self.k]
                self.cluster_centers_ = batch[idx].copy()
            else:
                reps = -(-self.k // n)
                self.cluster_centers_ = np.tile(batch, (reps, 1))[: self.k].copy()
            self.cluster_counts_ = np.zeros(self.k, dtype=np.float32)

        if self._step_fn is None:
            self._step_fn = self._make_step()
        _, counts_batch, sums_batch, inertia = map(
            np.asarray,
            self._step_fn(
                jnp.asarray(self.cluster_centers_),
                jnp.asarray(self.cluster_counts_),
                jnp.asarray(batch),
            ),
        )
        prev_counts = self.cluster_counts_.copy()

        # Resurrect clusters that have never seen data.
        empty = (prev_counts == 0) & (counts_batch == 0)
        if empty.any():
            repl = batch[self._rng.integers(0, batch.shape[0], size=int(empty.sum()))]
            counts_batch = counts_batch.copy()
            counts_batch[empty] = 1.0
            sums_batch = sums_batch.copy()
            sums_batch[empty] = repl

        self.cluster_counts_ = prev_counts + counts_batch
        mask = counts_batch > 0
        self.cluster_centers_[mask] = (
            self.cluster_centers_[mask] * prev_counts[mask, None] + sums_batch[mask]
        ) / self.cluster_counts_[mask, None]
        self.last_batch_inertia_ = float(inertia)

        self._split_collapsed_centers(batch)
        self.n_steps_ += 1
        return self

    def _split_collapsed_centers(self, batch: np.ndarray) -> None:
        """Replace near-duplicate centers with far-away batch points
        (reference baselines.py:146-172)."""
        if self.k < 2:
            return
        c = self.cluster_centers_
        pairwise = np.sqrt(
            np.maximum(
                ((c[:, None, :] - c[None, :, :]) ** 2).sum(-1), 0.0
            )
        )
        close = np.triu(pairwise < self.collapse_tol, k=1)
        if not close.any():
            return
        pairs = np.argwhere(close)
        cnt_i = self.cluster_counts_[pairs[:, 0]]
        cnt_j = self.cluster_counts_[pairs[:, 1]]
        losers = np.where(cnt_i <= cnt_j, pairs[:, 0], pairs[:, 1])
        loser_mask = np.zeros(self.k, dtype=bool)
        loser_mask[losers] = True
        n_needed = int(loser_mask.sum())
        cand = batch
        if cand.shape[0] < n_needed:
            cand = np.tile(cand, (-(-n_needed // cand.shape[0]), 1))
        cand_dist = np.sqrt(
            np.maximum(
                (cand**2).sum(1, keepdims=True) - 2 * cand @ c.T + (c**2).sum(1)[None],
                0.0,
            )
        )
        order = np.argsort(-cand_dist.max(axis=1))[:n_needed]
        self.cluster_centers_[loser_mask] = cand[order]
        self.cluster_counts_[loser_mask] = 0.0

    def transform(self, batch: np.ndarray) -> np.ndarray:
        """Negative distances to the centers (higher = closer), matching the
        reference's score convention (baselines.py:174-180)."""
        assert self.cluster_centers_ is not None, "not fitted"
        batch = np.asarray(batch, dtype=np.float32)
        c = self.cluster_centers_
        d2 = np.maximum(
            (batch**2).sum(1, keepdims=True) - 2 * batch @ c.T + (c**2).sum(1)[None],
            0.0,
        )
        return -np.sqrt(d2)

    def state_dict(self) -> dict[str, np.ndarray]:
        return {
            "cluster_centers_": self.cluster_centers_,
            "cluster_counts_": self.cluster_counts_,
        }

    def load_state_dict(self, sd):
        self.cluster_centers_ = np.asarray(sd["cluster_centers_"])
        self.cluster_counts_ = np.asarray(sd["cluster_counts_"])
        self.n_features_in_ = self.cluster_centers_.shape[1]


class MiniBatchPCA:
    """Streaming PCA via online mean/scatter accumulation + eigh
    (reference baselines.py:183-282)."""

    method = "pca"

    def __init__(self, n_components: int):
        self.n_components = n_components
        self.components_: np.ndarray | None = None
        self.explained_variance_: np.ndarray | None = None
        self.mean_: np.ndarray | None = None
        self.scatter_: np.ndarray | None = None
        self.n_samples_seen_ = 0
        self.n_steps_ = 0
        self.n_features_in_: int | None = None
        self.total_variance_: float | None = None
        self.last_batch_recon_error_: float | None = None
        self.last_batch_var_ratio_: float | None = None

    def partial_fit(self, batch: np.ndarray) -> "MiniBatchPCA":
        batch = np.asarray(batch, dtype=np.float64)
        if batch.shape[0] == 0:
            return self
        n_batch, n_features = batch.shape
        if self.n_features_in_ is None:
            self.n_features_in_ = n_features
        assert n_features == self.n_features_in_
        assert self.n_components <= n_features

        batch_mean = batch.mean(axis=0)
        centered = batch - batch_mean
        scatter_update = centered.T @ centered

        if self.n_samples_seen_ == 0:
            self.mean_ = batch_mean
            self.scatter_ = scatter_update
            self.n_samples_seen_ = n_batch
        else:
            n_prev = self.n_samples_seen_
            n_total = n_prev + n_batch
            delta = batch_mean - self.mean_
            correction = np.outer(delta, delta) * (n_prev * n_batch / n_total)
            self.scatter_ = self.scatter_ + scatter_update + correction
            self.mean_ = self.mean_ + delta * (n_batch / n_total)
            self.n_samples_seen_ = n_total

        cov = self.scatter_ / max(self.n_samples_seen_ - 1, 1)
        cov = 0.5 * (cov + cov.T)
        eigvals, eigvecs = np.linalg.eigh(cov)
        order = np.argsort(eigvals)[::-1][: self.n_components]
        self.explained_variance_ = eigvals[order]
        self.components_ = eigvecs[:, order].T.copy()
        total_var = float(eigvals.sum())
        self.total_variance_ = total_var if np.isfinite(total_var) else None
        self.last_batch_var_ratio_ = float(
            self.explained_variance_.sum() / max(total_var, 1e-12)
        )

        scores = (batch - self.mean_) @ self.components_.T
        recon = scores @ self.components_ + self.mean_
        self.last_batch_recon_error_ = float(((batch - recon) ** 2).mean())
        self.n_steps_ += 1
        return self

    def transform(self, batch: np.ndarray) -> np.ndarray:
        assert self.components_ is not None, "not fitted"
        return (np.asarray(batch, np.float64) - self.mean_) @ self.components_.T

    def state_dict(self):
        return {
            "components_": self.components_,
            "mean_": self.mean_,
            "explained_variance_": self.explained_variance_,
        }

    def load_state_dict(self, sd):
        self.components_ = np.asarray(sd["components_"])
        self.mean_ = np.asarray(sd["mean_"])
        self.explained_variance_ = np.asarray(sd["explained_variance_"])
        self.n_features_in_ = self.components_.shape[1]


class MiniBatchSemiNMF:
    """Mini-batch semi-NMF: non-negative codes, unconstrained dictionary
    (reference baselines.py:284-463). The multiplicative encode loop is a
    jitted `lax.fori_loop`."""

    method = "semi-nmf"

    def __init__(
        self,
        n_concepts: int,
        *,
        z_iters: int = 10,
        encode_iters: int = 300,
        ridge: float = 1e-6,
        eps: float = 1e-8,
        forget_factor: float = 0.7,
        d_update_every: int = 10,
        seed: int = 0,
    ):
        assert 0.0 <= forget_factor < 1.0
        self.n_concepts = n_concepts
        self.z_iters = z_iters
        self.encode_iters = encode_iters
        self.ridge = float(ridge)
        self.eps = float(eps)
        self.forget_factor = float(forget_factor)
        self.d_update_every = d_update_every
        self._rng = np.random.default_rng(seed)

        self.D_: np.ndarray | None = None
        self.n_features_in_: int | None = None
        self.n_samples_seen_ = 0
        self.n_steps_ = 0
        self.ZtZ_acc_: np.ndarray | None = None
        self.ZtA_acc_: np.ndarray | None = None
        self.last_batch_recon_mse_: float | None = None
        self.last_batch_nmse_: float | None = None
        self._encode_fns: dict[int, tp.Any] = {}

    def _encode_fn(self, n_iters: int):
        import jax
        import jax.numpy as jnp

        if n_iters not in self._encode_fns:
            eps = self.eps

            @jax.jit
            def encode(D, acts):
                ddt = D @ D.T
                k = D.shape[0]
                ddt_reg_inv = jnp.linalg.solve(
                    ddt + eps * jnp.eye(k, dtype=D.dtype), jnp.eye(k, dtype=D.dtype)
                )
                z = jnp.maximum(acts @ D.T @ ddt_reg_inv, eps)
                if n_iters == 0:
                    return z
                atd = acts @ D.T
                atd_pos, atd_neg = _pos_part(atd), _neg_part(atd)
                ddt_pos, ddt_neg = _pos_part(ddt), _neg_part(ddt)

                def body(_, z):
                    num = atd_pos + z @ ddt_neg
                    den = atd_neg + z @ ddt_pos + eps
                    return z * jnp.sqrt(num / den)

                return jax.lax.fori_loop(0, n_iters, body, z)

            self._encode_fns[n_iters] = encode
        return self._encode_fns[n_iters]

    def partial_fit(self, batch: np.ndarray) -> "MiniBatchSemiNMF":
        import jax.numpy as jnp

        acts = np.asarray(batch, dtype=np.float32)
        if acts.shape[0] == 0:
            return self
        n_batch, n_features = acts.shape
        if self.n_features_in_ is None:
            self.D_ = self._rng.normal(size=(self.n_concepts, n_features)).astype(
                np.float32
            )
            self.n_features_in_ = n_features
            self.ZtZ_acc_ = np.zeros((self.n_concepts, self.n_concepts), np.float32)
            self.ZtA_acc_ = np.zeros((self.n_concepts, n_features), np.float32)
        assert n_features == self.n_features_in_

        z = np.asarray(self._encode_fn(self.z_iters)(jnp.asarray(self.D_), jnp.asarray(acts)))
        self._update_last_batch_metrics(acts, z)

        ztz = z.T @ z
        zta = z.T @ acts
        f = self.forget_factor
        self.ZtZ_acc_ = f * self.ZtZ_acc_ + (1.0 - f) * ztz
        self.ZtA_acc_ = f * self.ZtA_acc_ + (1.0 - f) * zta
        self.n_samples_seen_ += n_batch
        self.n_steps_ += 1
        if self.n_steps_ % self.d_update_every == 0:
            reg = self.ZtZ_acc_ + self.ridge * np.eye(self.n_concepts, dtype=np.float32)
            self.D_ = np.linalg.solve(reg, self.ZtA_acc_)
        return self

    def transform(self, batch: np.ndarray, *, n_iters: int | None = None) -> np.ndarray:
        import jax.numpy as jnp

        assert self.D_ is not None, "not fitted"
        n_iters = self.encode_iters if n_iters is None else n_iters
        return np.asarray(
            self._encode_fn(n_iters)(
                jnp.asarray(self.D_), jnp.asarray(np.asarray(batch, np.float32))
            )
        )

    def _update_last_batch_metrics(self, acts: np.ndarray, z: np.ndarray) -> None:
        recon = z @ self.D_
        diff = (acts - recon).astype(np.float64)
        recon_sse = float((diff**2).sum())
        n_batch = acts.shape[0]
        self.last_batch_recon_mse_ = recon_sse / n_batch
        a64 = acts.astype(np.float64)
        sse_baseline = float((a64 * a64).sum()) - float(
            a64.sum(0) @ a64.sum(0)
        ) / n_batch
        assert sse_baseline > 0.0, (
            f"Baseline variance is non-positive (sse_baseline={sse_baseline:.6e})."
        )
        self.last_batch_nmse_ = recon_sse / sse_baseline

    def state_dict(self):
        return {"D_": self.D_, "ZtZ_acc_": self.ZtZ_acc_, "ZtA_acc_": self.ZtA_acc_}

    def load_state_dict(self, sd):
        self.D_ = np.asarray(sd["D_"])
        self.ZtZ_acc_ = np.asarray(sd["ZtZ_acc_"])
        self.ZtA_acc_ = np.asarray(sd["ZtA_acc_"])
        self.n_features_in_ = self.D_.shape[1]


class RandomVectors:
    """Random unit-gaussian prototype directions — the no-learning control
    baseline (reference fishvista/evaluation.py method='random'). `fit` is a
    no-op; scores are plain dot products."""

    method = "random"

    def __init__(self, k: int, d: int | None = None, seed: int = 0):
        self.k = k
        self.n_features_in_ = d
        self._rng = np.random.default_rng(seed)
        self.vectors_: np.ndarray | None = None
        if d is not None:
            self._init(d)

    def _init(self, d: int):
        v = self._rng.normal(size=(self.k, d)).astype(np.float32)
        self.vectors_ = v / np.linalg.norm(v, axis=1, keepdims=True)
        self.n_features_in_ = d

    def partial_fit(self, batch: np.ndarray) -> "RandomVectors":
        if self.vectors_ is None:
            self._init(np.asarray(batch).shape[1])
        return self

    def transform(self, batch: np.ndarray) -> np.ndarray:
        if self.vectors_ is None:
            self._init(np.asarray(batch).shape[1])
        return np.asarray(batch, np.float32) @ self.vectors_.T

    def state_dict(self) -> dict[str, np.ndarray]:
        assert self.vectors_ is not None, "not fitted"
        return {"vectors_": self.vectors_}

    def load_state_dict(self, sd):
        self.vectors_ = np.asarray(sd["vectors_"])
        self.n_features_in_ = self.vectors_.shape[1]


# ---------------------------------------------------------------------------
# Checkpointing (reference baselines.py:588-677)
# ---------------------------------------------------------------------------

_METHODS = {
    "kmeans": MiniBatchKMeans,
    "pca": MiniBatchPCA,
    "semi-nmf": MiniBatchSemiNMF,
    "random": RandomVectors,
}


def dump(run: saev_tpu.disk.Run, method: str, model, extra: dict | None = None) -> pathlib.Path:
    import torch

    fpath = baseline_ckpt(run)
    header = {
        "schema": BASELINE_SCHEMA_VERSION,
        "method": method,
        **(extra or {}),
    }
    sd = {
        k: torch.from_numpy(np.ascontiguousarray(np.asarray(v, dtype=np.float32)))
        for k, v in model.state_dict().items()
    }
    with open(fpath, "wb") as fd:
        fd.write(json.dumps(header).encode() + b"\n")
        torch.save(sd, fd)
    return fpath


def load(run: saev_tpu.disk.Run, **kwargs):
    import io

    import torch

    fpath = baseline_ckpt(run)
    with open(fpath, "rb") as fd:
        header = json.loads(fd.readline())
        sd = torch.load(io.BytesIO(fd.read()), weights_only=True, map_location="cpu")
    sd = {k: v.numpy() for k, v in sd.items()}
    method = header["method"]
    cls = _METHODS[method]
    if method == "kmeans":
        model = cls(k=sd["cluster_centers_"].shape[0], **kwargs)
    elif method == "pca":
        model = cls(n_components=sd["components_"].shape[0], **kwargs)
    elif method == "random":
        model = cls(k=sd["vectors_"].shape[0], **kwargs)
    else:
        model = cls(n_concepts=sd["D_"].shape[0], **kwargs)
    model.load_state_dict(sd)
    return model


# ---------------------------------------------------------------------------
# Training pipeline (reference baselines.py:465-494 TrainConfig, :851-949
# train_worker_fn, :701-849 per-method eval)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Baseline dictionary training over shard streams."""

    method: BaselineMethod = "kmeans"
    train_data: tp.Any = None
    """saev_tpu.data.ShuffledConfig for the train stream."""
    val_data: tp.Any = None
    """ShuffledConfig for eval (None or n_val<=0 skips eval)."""
    n_train: int = 100_000_000
    n_val: int = 10_000_000
    k: int = 1024 * 16
    """Dictionary size (clusters / components / concepts)."""
    collapse_tol: float = 0.5
    z_iters: int = 10
    encode_iters: int = 300
    ridge: float = 1e-6
    eps: float = 1e-8
    forget_factor: float = 0.7
    d_update_every: int = 10
    seed: int = 42
    runs_root: pathlib.Path = pathlib.Path("./tdiscovery/runs")
    log_every: int = 50
    debug: bool = False


def make_model(cfg: TrainConfig):
    if cfg.method == "kmeans":
        return MiniBatchKMeans(k=cfg.k, collapse_tol=cfg.collapse_tol, seed=cfg.seed)
    if cfg.method == "pca":
        return MiniBatchPCA(n_components=cfg.k)
    if cfg.method == "semi-nmf":
        return MiniBatchSemiNMF(
            n_concepts=cfg.k, z_iters=cfg.z_iters, encode_iters=cfg.encode_iters,
            ridge=cfg.ridge, eps=cfg.eps, forget_factor=cfg.forget_factor,
            d_update_every=cfg.d_update_every, seed=cfg.seed,
        )
    raise ValueError(f"Unknown method {cfg.method!r}")


def _val_batches(cfg: TrainConfig):
    from saev_tpu.data import ShuffledDataLoader
    from saev_tpu.utils import scheduling

    if cfg.val_data is None or cfg.n_val <= 0:
        return None
    dl = ShuffledDataLoader(cfg.val_data)
    return scheduling.BatchLimiter(dl, min(cfg.n_val, dl.n_samples))


def eval_kmeans(cfg: TrainConfig, model: MiniBatchKMeans) -> dict[str, float]:
    """Inertia + center utilization/population stats (reference :702-745)."""
    limiter = _val_batches(cfg)
    if limiter is None:
        return {}
    hits = np.zeros(model.k, dtype=np.float64)
    sum_sq_dist, n = 0.0, 0
    for batch in limiter:
        acts = np.asarray(batch["act"])
        d2 = (
            (acts**2).sum(1, keepdims=True)
            - 2 * acts @ model.cluster_centers_.T
            + (model.cluster_centers_**2).sum(1)[None, :]
        )
        assign = d2.argmin(1)
        sum_sq_dist += float(np.maximum(d2[np.arange(len(assign)), assign], 0).sum())
        np.add.at(hits, assign, 1.0)
        n += acts.shape[0]
    if n == 0:
        return {}
    return {
        "eval/inertia": sum_sq_dist / n,
        "eval/utilization": float((hits > 0).mean()),
        "eval/mean_pop": float(hits.mean()),
        "eval/max_pop": float(hits.max()),
    }


def _eval_nmse(limiter, recon_fn) -> dict[str, float]:
    """Normalized MSE of recon_fn over the val stream (reference :747-849)."""
    sse, sum_sq, n = 0.0, 0.0, 0
    sum_vec = None
    for batch in limiter:
        acts = np.asarray(batch["act"], dtype=np.float64)
        recon = np.asarray(recon_fn(acts.astype(np.float32)), dtype=np.float64)
        sse += float(((acts - recon) ** 2).sum())
        sum_sq += float((acts * acts).sum())
        sum_vec = acts.sum(0) if sum_vec is None else sum_vec + acts.sum(0)
        n += acts.shape[0]
    if n == 0:
        return {}
    sse_baseline = sum_sq - float(sum_vec @ sum_vec) / n
    return {
        "eval/mse": sse / n,
        "eval/normalized_mse": sse / max(sse_baseline, 1e-18),
    }


def eval_pca(cfg: TrainConfig, model: MiniBatchPCA) -> dict[str, float]:
    limiter = _val_batches(cfg)
    if limiter is None:
        return {}
    return _eval_nmse(
        limiter, lambda a: model.transform(a) @ model.components_ + model.mean_
    )


def eval_semi_nmf(cfg: TrainConfig, model: MiniBatchSemiNMF) -> dict[str, float]:
    limiter = _val_batches(cfg)
    if limiter is None:
        return {}
    return _eval_nmse(limiter, lambda a: model.transform(a) @ model.D_)


def get_training_metrics(model, n_samples: int) -> dict[str, float]:
    """Final train-side metrics recorded into the checkpoint header
    (reference :679-699)."""
    out: dict[str, float] = {"train/n_samples": float(n_samples)}
    for attr, key in (
        ("last_batch_recon_mse_", "train/last_batch_recon_mse"),
        ("last_batch_nmse_", "train/last_batch_nmse"),
        ("n_steps_", "train/n_steps"),
    ):
        v = getattr(model, attr, None)
        if v is not None:
            out[key] = float(v)
    return out


def train_worker_fn(cfg: TrainConfig) -> str:
    """Stream the shuffled loader, fit the dictionary, eval, dump to a Run
    (reference train_worker_fn :851-949). Returns the run id."""
    import secrets

    import saev_tpu.helpers
    from saev_tpu.data import ShuffledDataLoader
    from saev_tpu.utils import scheduling

    dl = ShuffledDataLoader(cfg.train_data)
    limiter = scheduling.BatchLimiter(dl, min(cfg.n_train, dl.n_samples))
    model = make_model(cfg)

    n_samples = 0
    for batch in saev_tpu.helpers.progress(limiter, desc="fit", every=cfg.log_every):
        acts = np.asarray(batch["act"], dtype=np.float32)
        model.partial_fit(acts)
        n_samples += acts.shape[0]

    evals = {
        "kmeans": eval_kmeans, "pca": eval_pca, "semi-nmf": eval_semi_nmf
    }[cfg.method](cfg, model)
    metrics = {**get_training_metrics(model, n_samples), **evals}
    logger.info("Trained %s on %d samples: %s", cfg.method, n_samples, metrics)

    run_id = secrets.token_hex(4)
    shards = pathlib.Path(cfg.train_data.shards)
    val_shards = pathlib.Path(cfg.val_data.shards) if cfg.val_data else shards
    run = saev_tpu.disk.Run.new(
        run_id, train_shards_dir=shards, val_shards_dir=val_shards,
        runs_root=pathlib.Path(cfg.runs_root),
    )
    dump(run, cfg.method, model, extra={"metrics": metrics, "k": cfg.k})
    with open(run.run_dir / "metrics.json", "w") as fd:
        json.dump(metrics, fd, indent=2)
    return run_id


# ---------------------------------------------------------------------------
# Inference pipeline: the same 5 artifacts as SAE inference so baselines slot
# into visuals/probe1d/metrics (reference :951-1378)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class InferenceConfig:
    run: pathlib.Path = pathlib.Path("./tdiscovery/runs/example")
    data: tp.Any = None
    """saev_tpu.data.OrderedConfig."""
    n_dists: int = 25
    n_iters: int = 300
    """Semi-NMF multiplicative update iterations at inference."""
    save: bool = True
    force: bool = False


def inference_worker_fn(cfg: InferenceConfig) -> None:
    """Ordered pass writing token_acts.npz / sparsity.pt / mean_values.pt /
    distributions.pt / metrics.json for the baseline dictionary
    (reference inference_worker_fn :1362-1378 dispatching :1001-1360)."""
    import scipy.sparse

    import saev_tpu.helpers
    from saev_tpu.data import Metadata, OrderedDataLoader
    from saev_tpu.framework.inference import Filepaths, _torch_save
    from saev_tpu.metrics import Metrics

    run = saev_tpu.disk.Run(cfg.run)
    model = load(run)
    method = type(model).method
    if method == "random":
        raise ValueError(
            "Baseline inference artifacts are reconstruction-based; the "
            "'random' control has no reconstruction semantics. Use it via "
            "the fishvista evaluation pipeline (prototype scoring) instead."
        )
    md = Metadata.load(cfg.data.shards)
    fpaths = Filepaths.from_run(run, md)
    required = list(fpaths) if cfg.save else [fpaths.metrics]
    if not cfg.force and all(f.exists() for f in required):
        logger.info("All artifacts exist for %s; skipping.", cfg.run)
        return

    batch_size = max(
        cfg.data.batch_size
        // md.content_tokens_per_example
        * md.content_tokens_per_example,
        md.content_tokens_per_example,
    )
    dl = OrderedDataLoader(dataclasses.replace(cfg.data, batch_size=batch_size))
    n_samples = dl.n_samples
    k = {
        "kmeans": lambda: model.cluster_centers_.shape[0],
        "pca": lambda: model.components_.shape[0],
        "semi-nmf": lambda: model.D_.shape[0],
    }[method]()
    d_model = md.d_model

    mean_values = np.zeros((k,), dtype=np.float64)
    sparsity = np.zeros((k,), dtype=np.float64)
    n_dists = min(cfg.n_dists, k)
    if cfg.save:
        distributions = np.zeros((n_samples, n_dists), dtype=np.float32)
        blocks: list[scipy.sparse.csr_matrix] = []
    sse_recon, sum_sq, n_tokens = 0.0, 0.0, 0
    sum_vec = np.zeros((d_model,), dtype=np.float64)
    prev_i = -1

    for batch in saev_tpu.helpers.progress(dl, desc=f"{method}-inference"):
        acts = np.asarray(batch["act"], dtype=np.float32)
        if method == "kmeans":
            d2 = (
                (acts**2).sum(1, keepdims=True)
                - 2 * acts @ model.cluster_centers_.T
                + (model.cluster_centers_**2).sum(1)[None, :]
            )
            assign = d2.argmin(1)
            min_d2 = np.maximum(d2[np.arange(len(assign)), assign], 0.0)
            # Sparse one-hot codes valued 1/(1+dist) (reference :1036).
            scores_sparse = (assign, 1.0 / (1.0 + np.sqrt(min_d2)))
            sse_recon += float(min_d2.astype(np.float64).sum())
            codes = None
        elif method == "pca":
            codes = model.transform(acts)
            recon = codes @ model.components_ + model.mean_
            sse_recon += float(((acts - recon).astype(np.float64) ** 2).sum())
            scores_sparse = None
        else:
            codes = model.transform(acts, n_iters=cfg.n_iters)
            recon = codes @ model.D_
            sse_recon += float(((acts - recon).astype(np.float64) ** 2).sum())
            scores_sparse = None

        a64 = acts.astype(np.float64)
        sum_sq += float((a64 * a64).sum())
        sum_vec += a64.sum(0)
        n_tokens += acts.shape[0]

        if not cfg.save:
            continue
        batch_idx = (
            np.asarray(batch["example_idx"]) * md.content_tokens_per_example
            + np.asarray(batch["token_idx"])
        )
        assert int(batch_idx[0]) == prev_i + 1
        assert (np.sort(batch_idx) == batch_idx).all()
        prev_i = int(batch_idx[-1])

        if scores_sparse is not None:
            assign, vals = scores_sparse
            np.add.at(sparsity, assign, 1.0)
            np.add.at(mean_values, assign, vals)
            blocks.append(
                scipy.sparse.csr_matrix(
                    (vals, (np.arange(len(assign)), assign)),
                    shape=(len(assign), k),
                )
            )
            sel = assign < n_dists
            distributions[batch_idx[sel], assign[sel]] = vals[sel]
        else:
            codes = codes.astype(np.float32)
            sparsity += (codes != 0).sum(0)
            mean_values += codes.sum(0, dtype=np.float64)
            blocks.append(scipy.sparse.csr_matrix(codes))
            distributions[batch_idx] = codes[:, :n_dists]

    if cfg.save:
        with np.errstate(divide="ignore", invalid="ignore"):
            mean_values = mean_values / sparsity
        sparsity = sparsity / n_samples
        token_acts = scipy.sparse.vstack(blocks, format="csr")
        scipy.sparse.save_npz(fpaths.token_acts, token_acts)
        _torch_save(mean_values.astype(np.float32), fpaths.mean_values)
        _torch_save(sparsity.astype(np.float32), fpaths.sparsity)
        _torch_save(distributions, fpaths.distributions)

    assert n_tokens > 0
    sse_baseline = sum_sq - float(sum_vec @ sum_vec) / n_tokens
    assert sse_baseline > 0.0, f"Non-positive baseline variance {sse_baseline:.3e}"
    metrics = Metrics.from_accumulators(
        sse_recon=sse_recon, sse_baseline=sse_baseline,
        n_tokens=n_tokens, d_model=d_model,
    )
    with open(fpaths.metrics, "wb") as fd:
        saev_tpu.helpers.jdump(metrics.to_dict(), fd, indent=2)
    logger.info("Wrote %s baseline inference artifacts under %s.", method, fpaths.metrics.parent)


def train_cli(cfg: TrainConfig) -> None:
    logging.basicConfig(level=logging.INFO)
    train_worker_fn(cfg)


def inference_cli(cfg: InferenceConfig) -> None:
    logging.basicConfig(level=logging.INFO)
    inference_worker_fn(cfg)
