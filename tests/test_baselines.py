"""Dictionary baseline tests (mirror of reference trait_discovery baseline
coverage: convergence on structured data, transform shapes, checkpoint
round-trips)."""

import pathlib
import sys

import numpy as np

sys.path.insert(
    0, str(pathlib.Path(__file__).parent.parent / "contrib" / "trait_discovery" / "src")
)

from conftest import _Helpers as helpers
from tdiscovery import baselines


def _clustered_data(rng, n=512, d=16, k=4, spread=0.05):
    centers = rng.normal(size=(k, d)).astype(np.float32) * 3
    assign = rng.integers(0, k, size=n)
    return centers[assign] + rng.normal(size=(n, d)).astype(np.float32) * spread, centers


def test_kmeans_quality_vs_sklearn():
    """Mini-batch k-means reaches inertia comparable to sklearn's on the same
    data (cluster recovery from a fixed batch is not guaranteed by the
    algorithm — duplicated-center local minima are possible for both)."""
    sklearn_cluster = __import__("sklearn.cluster", fromlist=["MiniBatchKMeans"])
    rng = np.random.default_rng(0)
    x, _ = _clustered_data(rng)
    km = baselines.MiniBatchKMeans(k=4, collapse_tol=0.5, seed=0)
    # Centers converge to cluster means at 1/n_steps (running-average update,
    # same rule as the reference), so give it enough steps.
    for _ in range(300):
        km.partial_fit(x)
    ours = float((np.min(-km.transform(x), axis=1) ** 2).mean())

    sk = sklearn_cluster.MiniBatchKMeans(n_clusters=4, n_init=3, random_state=0).fit(x)
    theirs = float(
        (np.linalg.norm(x - sk.cluster_centers_[sk.predict(x)], axis=1) ** 2).mean()
    )
    assert ours <= max(3.0 * theirs, theirs + 1e-3), (ours, theirs)

    scores = km.transform(x[:8])
    assert scores.shape == (8, 4)
    assert (scores <= 0).all()
    assert km.last_batch_inertia_ is not None


def test_kmeans_splits_collapsed_centers():
    rng = np.random.default_rng(1)
    x, _ = _clustered_data(rng, k=4)
    km = baselines.MiniBatchKMeans(k=4, collapse_tol=0.1, seed=1)
    km.partial_fit(x)
    # Force two centers to collapse, then check a fit splits them.
    km.cluster_centers_[1] = km.cluster_centers_[0] + 1e-4
    km.partial_fit(x)
    d01 = np.linalg.norm(km.cluster_centers_[0] - km.cluster_centers_[1])
    assert d01 > 0.1


def test_pca_matches_numpy_svd():
    rng = np.random.default_rng(2)
    d, n = 12, 2048
    basis = np.linalg.qr(rng.normal(size=(d, d)))[0]
    scales = np.array([5, 3, 1] + [0.05] * (d - 3))
    x = (rng.normal(size=(n, d)) * scales) @ basis.T + 10.0
    pca = baselines.MiniBatchPCA(n_components=3)
    for i in range(0, n, 256):
        pca.partial_fit(x[i : i + 256])

    full_mean = x.mean(axis=0)
    np.testing.assert_allclose(pca.mean_, full_mean, rtol=1e-10)
    cov = np.cov(x.T)
    eigvals = np.sort(np.linalg.eigvalsh(cov))[::-1][:3]
    np.testing.assert_allclose(pca.explained_variance_, eigvals, rtol=1e-6)
    # Components span the same subspace as the top-3 true directions.
    proj = pca.components_ @ basis[:, :3]
    s = np.linalg.svd(proj, compute_uv=False)
    np.testing.assert_allclose(s, 1.0, atol=1e-2)
    assert pca.last_batch_var_ratio_ > 0.95


def test_semi_nmf_reconstructs():
    rng = np.random.default_rng(3)
    d, k, n = 16, 8, 1024
    D_true = rng.normal(size=(k, d)).astype(np.float32)
    z_true = np.abs(rng.normal(size=(n, k))).astype(np.float32)
    x = z_true @ D_true
    nmf = baselines.MiniBatchSemiNMF(n_concepts=k, d_update_every=2, seed=3)
    for _ in range(30):
        nmf.partial_fit(x)
    assert nmf.last_batch_nmse_ is not None
    assert nmf.last_batch_nmse_ < 0.05, nmf.last_batch_nmse_
    z = nmf.transform(x[:16], n_iters=100)
    assert z.shape == (16, k)
    assert (z >= 0).all()


def test_dump_load_roundtrip(tmp_path):
    import jax  # noqa: F401  (ensures cpu config from conftest)

    rng = np.random.default_rng(4)
    x, _ = _clustered_data(rng, n=128, d=8, k=3)
    runs_root = helpers.tmp_runs_root(tmp_path)
    shards = tmp_path / "saev" / "shards" / "deadbeef"
    shards.mkdir(parents=True)
    import saev_tpu.disk

    run = saev_tpu.disk.Run.new(
        "b1", train_shards_dir=shards, val_shards_dir=shards, runs_root=runs_root
    )

    km = baselines.MiniBatchKMeans(k=3, seed=0)
    km.partial_fit(x)
    baselines.dump(run, "kmeans", km)
    km2 = baselines.load(run)
    np.testing.assert_allclose(km2.cluster_centers_, km.cluster_centers_, rtol=1e-6)
    np.testing.assert_allclose(km2.transform(x[:4]), km.transform(x[:4]), rtol=1e-5)


def test_train_and_inference_pipeline(tmp_path):
    """baseline::train then baseline::inference on fake shards produce the
    same 5 artifacts as SAE inference (reference baselines.py:851-1378)."""
    import scipy.sparse
    import torch

    from saev_tpu.data import Metadata, OrderedConfig, ShuffledConfig

    shards_dir = helpers.write_shards(tmp_path, n_examples=12, layers=(0,))
    md = Metadata.load(shards_dir)
    data_cfg = ShuffledConfig(shards=shards_dir, layer=0, batch_size=32, n_threads=2)

    for method in ("kmeans", "pca", "semi-nmf"):
        runs_root = helpers.tmp_runs_root(tmp_path / method)
        cfg = baselines.TrainConfig(
            method=method, train_data=data_cfg, val_data=data_cfg,
            n_train=128, n_val=64, k=8, runs_root=runs_root, seed=0,
        )
        run_id = baselines.train_worker_fn(cfg)
        run_dir = runs_root / run_id
        assert (run_dir / "checkpoint" / "baseline.pt").exists()
        metrics = (run_dir / "metrics.json").read_text()
        assert "train/n_samples" in metrics
        if method != "kmeans":
            assert "eval/normalized_mse" in metrics

        baselines.inference_worker_fn(baselines.InferenceConfig(
            run=run_dir,
            data=OrderedConfig(shards=shards_dir, layer=0, batch_size=32),
            n_dists=4, n_iters=50,
        ))
        art = run_dir / "inference" / md.hash
        acts = scipy.sparse.load_npz(art / "token_acts.npz")
        n_tokens = md.n_examples * md.content_tokens_per_example
        assert acts.shape == (n_tokens, 8)
        if method == "kmeans":
            # One-hot codes: exactly one nonzero per token.
            assert (np.diff(acts.tocsr().indptr) == 1).all()
        sparsity = torch.load(art / "sparsity.pt", weights_only=True)
        assert sparsity.shape == (8,)
        dists = torch.load(art / "distributions.pt", weights_only=True)
        assert dists.shape == (n_tokens, 4)
        m = (art / "metrics.json").read_text()
        assert "normalized_mse" in m
        # Idempotent: second call skips.
        baselines.inference_worker_fn(baselines.InferenceConfig(
            run=run_dir,
            data=OrderedConfig(shards=shards_dir, layer=0, batch_size=32),
            n_dists=4,
        ))


def test_launch_cli_lists_subcommands(capsys):
    import subprocess
    import sys as _sys

    res = subprocess.run(
        [_sys.executable, "contrib/trait_discovery/scripts/launch.py"],
        capture_output=True, text=True, cwd=str(pathlib.Path(__file__).parent.parent),
    )
    out = res.stdout + res.stderr
    for sub in ("baseline::train", "probe1d", "visuals", "metrics"):
        assert sub in out, out
