"""LIVE trained-artifact interop: the REFERENCE'S OWN training loop runs on
shards OUR extractor wrote, and OUR inference consumes its run dir — then the
reverse: OUR training produces a run dir the REFERENCE'S inference pass
accepts. This covers the optimizer/trajectory half of compatibility that
checkpoint-level parity can't (reference framework/train.py:193-235,
framework/inference.py:138-287).

The reference's torch training stack runs for real (its ShuffledDataLoader
manager process included) with four test-only dependency stubs plus an
in-process `wandb` stand-in (mode is "disabled" under track=False; only
`init/Table/Settings` and run ids are exercised).
"""

import dataclasses
import json
import pathlib
import sys
import types
import uuid

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from conftest import _Helpers as helpers
from conftest import load_reference_module


def _install_wandb_stub():
    """Register a minimal `wandb` module for the reference's imports.

    track=False maps to mode="disabled", so only the object surface is
    needed: init() -> run with id/log/summary/finish, Settings, Table.
    """
    if "wandb" in sys.modules:
        return

    stub = types.ModuleType("wandb")

    class _Run:
        def __init__(self):
            self.id = uuid.uuid4().hex[:8]
            self.summary = {}
            self.logged = []

        def log(self, metrics, step=None):
            self.logged.append((step, metrics))

        def finish(self):
            pass

    class Settings:
        def __init__(self, **kw):
            pass

    class Table:
        def __init__(self, columns=None, data=None):
            self.columns = columns
            self.data = data

    stub.init = lambda **kw: _Run()
    stub.Settings = Settings
    stub.Table = Table
    sys.modules["wandb"] = stub


def _ref_data_package():
    """Assemble the `saev.data` surface the reference's framework code needs
    WITHOUT executing the real package __init__ (it pulls open_clip/timm).
    """
    shuffled = load_reference_module("data.shuffled")
    ordered = load_reference_module("data.ordered")
    indexed = load_reference_module("data.indexed")
    shards = load_reference_module("data.shards")

    pkg = sys.modules["saev.data"]
    pkg.ShuffledConfig = shuffled.Config
    pkg.ShuffledDataLoader = shuffled.DataLoader
    pkg.OrderedConfig = ordered.Config
    pkg.OrderedDataLoader = ordered.DataLoader
    pkg.IndexedConfig = indexed.Config
    pkg.IndexedDataset = indexed.Dataset
    pkg.Metadata = shards.Metadata
    pkg.PixelAgg = shards.PixelAgg

    import saev

    saev.data = pkg  # `import saev.data` must resolve attribute access too
    return pkg


def _ref_nn_package():
    """Give `saev.nn` its public surface even when an earlier test left only
    a bare shell package in sys.modules (conftest.load_reference_module
    shells intermediate packages without executing their __init__)."""
    modeling = load_reference_module("nn.modeling")
    objectives = load_reference_module("nn.objectives")
    pkg = sys.modules["saev.nn"]
    for name in ("SparseAutoencoder", "SparseAutoencoderConfig", "dump", "load"):
        if not hasattr(pkg, name):
            setattr(pkg, name, getattr(modeling, name))
    for name in ("ObjectiveConfig", "get_objective"):
        if not hasattr(pkg, name):
            setattr(pkg, name, getattr(objectives, name))
    if not hasattr(pkg, "objectives"):
        pkg.objectives = objectives
    import saev

    saev.nn = pkg
    return pkg


def _link(dotted: str):
    """Load a reference module AND wire the parent-attribute chain, so
    `saev.utils.scheduling`-style attribute access works even when earlier
    tests left bare shell packages (shells never set parent attrs)."""
    mod = load_reference_module(dotted)
    parts = ("saev." + dotted).split(".")
    for i in range(1, len(parts)):
        parent = sys.modules[".".join(parts[:i])]
        child = sys.modules.get(".".join(parts[: i + 1]))
        if child is not None and not hasattr(parent, parts[i]):
            setattr(parent, parts[i], child)
    return mod


@pytest.fixture(scope="module")
def ref_framework():
    """Load the reference's framework.train + framework.inference modules."""
    import torch.multiprocessing as mp

    if mp.get_start_method(allow_none=True) not in (None, "fork"):
        pytest.skip("needs fork start method so children inherit refstubs")

    _install_wandb_stub()
    _ref_data_package()
    _ref_nn_package()
    for dotted in (
        "utils.scheduling", "utils.wandb", "utils.monitoring",
        "utils.statistics", "configs", "disk", "helpers", "metrics",
    ):
        _link(dotted)
    train = load_reference_module("framework.train")
    inference = load_reference_module("framework.inference")
    return train, inference


def _ref_train_cfg(ref_train, shards_dir, runs_root):
    import saev.nn as ref_nn
    import saev.nn.modeling as ref_modeling

    data = sys.modules["saev.data"].ShuffledConfig(
        shards=shards_dir, layer=0, batch_size=64, n_threads=2, buffer_size=4,
        batch_timeout_s=120.0, seed=3,
    )
    return ref_train.Config(
        train_data=data,
        val_data=data,
        n_train=256,
        n_val=128,
        sae=ref_nn.SparseAutoencoderConfig(
            d_model=128, d_sae=64, activation=ref_modeling.TopK(top_k=8)
        ),
        lr=1e-3,
        n_lr_warmup=2,
        log_every=4,
        track=False,
        runs_root=runs_root,
        device="cpu",
    )


@pytest.mark.slow
@pytest.mark.timeout(600)
def test_reference_trains_on_our_shards_then_our_inference(tmp_path, ref_framework):
    """Direction A: reference torch training end-to-end over OUR shard dump,
    then OUR JAX inference pass over ITS run dir."""
    ref_train, _ = ref_framework
    shards_dir = helpers.write_shards(tmp_path, n_examples=32, layers=(0,))
    runs_root = helpers.tmp_runs_root(tmp_path)

    cfg = _ref_train_cfg(ref_train, shards_dir, runs_root)
    run_ids = ref_train.worker_fn([cfg])
    assert len(run_ids) == 1
    run_dir = runs_root / run_ids[0]
    assert (run_dir / "checkpoint" / "sae.pt").exists()
    assert (run_dir / "checkpoint" / "config.json").exists()

    # Our loader accepts the reference's freshly TRAINED checkpoint (not a
    # synthetic round-trip fixture): forward gives exact TopK L0.
    from saev_tpu import nn

    sae_cfg, params, state = nn.load(run_dir / "checkpoint" / "sae.pt")
    assert sae_cfg.d_sae == 64
    x = np.random.default_rng(0).normal(size=(16, 128)).astype(np.float32)
    out, _ = nn.modeling.forward(sae_cfg, params, state, x)
    assert float((np.asarray(out.f_x) != 0).sum(-1).mean()) == 8.0

    # Our full inference pass over the reference's run dir.
    from saev_tpu.data import ordered as our_ordered
    from saev_tpu.framework import inference as our_inference

    our_inference.worker_fn(
        our_inference.Config(
            run=run_dir,
            data=our_ordered.Config(shards=shards_dir, layer=0, batch_size=64),
            device="cpu",
        )
    )
    art = run_dir / "inference" / shards_dir.name
    metrics = json.loads((art / "metrics.json").read_text())
    assert metrics["n_tokens"] == 32 * 16
    assert np.isfinite(metrics["normalized_mse"])
    assert (art / "token_acts.npz").exists()


@pytest.mark.slow
@pytest.mark.timeout(600)
def test_our_training_then_reference_inference(tmp_path, ref_framework):
    """Direction B: OUR JAX training writes a run dir, then the REFERENCE'S
    torch inference pass consumes it — checkpoint, run layout, and ordered
    data protocol all through its own code."""
    _, ref_inference = ref_framework
    shards_dir = helpers.write_shards(tmp_path, n_examples=32, layers=(0,))
    runs_root = helpers.tmp_runs_root(tmp_path)

    from saev_tpu.data import ShuffledConfig
    from saev_tpu.framework import train as our_train
    from saev_tpu.nn import modeling

    data_cfg = ShuffledConfig(
        shards=shards_dir, layer=0, batch_size=64, n_threads=2, seed=7
    )
    cfg = our_train.Config(
        train_data=data_cfg,
        val_data=data_cfg,
        n_train=256,
        n_val=128,
        sae=modeling.SparseAutoencoderConfig(
            d_model=128, d_sae=64, activation=modeling.TopK(top_k=8)
        ),
        lr=1e-3,
        n_lr_warmup=2,
        log_every=4,
        track=False,
        runs_root=runs_root,
        device="cpu",
    )
    run_ids = our_train.worker_fn([cfg])
    assert len(run_ids) == 1
    run_dir = runs_root / run_ids[0]

    ref_data = sys.modules["saev.data"]
    ref_cfg = ref_inference.Config(
        run=run_dir,
        data=ref_data.OrderedConfig(shards=shards_dir, layer=0, batch_size=64),
        device="cpu",
    )
    ref_inference.worker_fn(ref_cfg)

    art = run_dir / "inference" / shards_dir.name
    metrics = json.loads((art / "metrics.json").read_text())
    assert metrics["n_tokens"] == 32 * 16
    assert np.isfinite(metrics["normalized_mse"])
    assert (art / "token_acts.npz").exists()
    assert (art / "mean_values.pt").exists()

    # And OUR inference on the same run agrees with the reference's on the
    # headline reconstruction metric (same ckpt, same data, two stacks).
    from saev_tpu.data import ordered as our_ordered
    from saev_tpu.framework import inference as our_inference

    our_inference.worker_fn(
        our_inference.Config(
            run=run_dir,
            data=our_ordered.Config(shards=shards_dir, layer=0, batch_size=64),
            device="cpu",
            force_recompute=True,
        )
    )
    ours = json.loads((art / "metrics.json").read_text())
    assert ours["n_tokens"] == metrics["n_tokens"]
    # f32 accumulation order differs between the JAX and torch forward paths;
    # ~5e-4 relative is the observed cross-stack spread on this fixture.
    np.testing.assert_allclose(
        ours["normalized_mse"], metrics["normalized_mse"], rtol=2e-3
    )
