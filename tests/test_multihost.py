"""Multi-host (pod) execution path: per-process loader partitioning, the
cross-process helpers in `saev_tpu.parallel`, and the full N-process dryrun
(`__graft_entry__.dryrun_multihost` — real `jax.distributed` processes over
Gloo-backed CPU devices).

The reference trains one GPU per job (reference framework/train.py:764) and
has no multi-host analog; this subsystem is the rebuild's distributed feature
(SURVEY.md §2.8 / §5.8).
"""

import pathlib
import sys

import numpy as np
import pytest

from saev_tpu import parallel
from saev_tpu.data import shards as shards_mod, shuffled


@pytest.fixture(scope="module")
def tiny_shards(tmp_path_factory):
    """5 shards (an odd count, so rank slices are uneven) of (toks+1, d) acts."""
    root = tmp_path_factory.mktemp("mh") / "saev" / "shards"
    root.mkdir(parents=True)
    toks, d_model, examples_per_shard, n_shards = 8, 32, 6, 5
    n_examples = n_shards * examples_per_shard
    md = shards_mod.Metadata(
        family="fake-clip",
        ckpt="mh-test",
        layers=(0,),
        content_tokens_per_example=toks,
        cls_token=True,
        d_model=d_model,
        n_examples=n_examples,
        max_tokens_per_shard=examples_per_shard * (toks + 1),
        data="",
        dataset=pathlib.Path("fake"),
    )
    md.dump(root)
    rng = np.random.default_rng(5)
    acts = rng.normal(size=(n_examples, 1, toks + 1, d_model)).astype(np.float32)
    with shards_mod.ShardWriter(root, md) as writer:
        writer.write_batch(acts, 0)
    return root / md.hash, md


def _drain(cfg: shuffled.Config) -> set[tuple[int, int]]:
    """All (example_idx, token_idx) pairs a loader yields in one epoch,
    asserting exactly-once coverage within the rank."""
    dl = shuffled.DataLoader(cfg)
    seen: list[tuple[int, int]] = []
    for batch in dl:
        seen.extend(
            zip(batch["example_idx"].tolist(), batch["token_idx"].tolist())
        )
    assert len(seen) == dl.n_samples
    pairs = set(seen)
    assert len(pairs) == len(seen), "duplicate tokens within one rank"
    return pairs


@pytest.mark.parametrize("descriptor_sampling", [False, True])
def test_loader_rank_partition_exactly_once(tiny_shards, descriptor_sampling):
    """The union of all ranks' streams covers every (example, token) exactly
    once per epoch; ranks are disjoint; n_samples accounting matches — in
    both row-pool and descriptor-sampling modes (rank partitioning happens
    at the shard-permutation level, orthogonal to the gather strategy)."""
    shards_dir, md = tiny_shards
    base = dict(
        shards=shards_dir, layer=0, batch_size=16, n_threads=1,
        buffer_size=4, batch_timeout_s=60.0, seed=11,
        descriptor_sampling=descriptor_sampling,
    )
    world = 2
    covers, n_total = [], 0
    for rank in range(world):
        cfg = shuffled.Config(**base, rank=rank, world=world)
        dl = shuffled.DataLoader(cfg)
        n_total += dl.n_samples
        covers.append(_drain(cfg))

    assert covers[0].isdisjoint(covers[1]), "ranks overlap"
    union = covers[0] | covers[1]
    expected = {
        (ex, t)
        for ex in range(md.n_examples)
        for t in range(md.content_tokens_per_example)
    }
    assert union == expected
    assert n_total == md.n_examples * md.content_tokens_per_example
    # 5 shards over 2 ranks: the slices are uneven by exactly one shard.
    sizes = sorted(len(c) for c in covers)
    per_shard = (
        md.examples_per_shard * md.content_tokens_per_example
    )
    assert sizes == [2 * per_shard, 3 * per_shard]


def test_loader_rank_partition_matches_single(tiny_shards):
    """world=1 (default) is byte-identical to the pre-partitioning loader:
    full coverage, same n_samples."""
    shards_dir, md = tiny_shards
    cfg = shuffled.Config(
        shards=shards_dir, layer=0, batch_size=16, n_threads=1,
        buffer_size=4, batch_timeout_s=60.0, seed=11,
    )
    pairs = _drain(cfg)
    assert len(pairs) == md.n_examples * md.content_tokens_per_example


def test_invalid_rank_world():
    with pytest.raises(AssertionError):
        shuffled.Config(rank=2, world=2)
    with pytest.raises(AssertionError):
        shuffled.Config(rank=-1, world=1)


def test_world_exceeding_shard_count_raises(tiny_shards):
    """More loader processes than shards: some rank would own no shards, yield
    nothing, and stall the pod in its next collective — refuse loudly at
    construction instead."""
    shards_dir, md = tiny_shards
    cfg = shuffled.Config(
        shards=shards_dir, layer=0, batch_size=8,
        rank=0, world=md.n_shards + 1,
    )
    with pytest.raises(ValueError, match="owning no shards"):
        shuffled.DataLoader(cfg)


def test_partitioned_data_cfg(tiny_shards, monkeypatch):
    """train()/evaluate()'s shared per-process partitioning helper: identity
    single-process; 1/world rows + rank-strided shard slice + drop_last under
    a (faked) multi-process runtime."""
    import jax

    from saev_tpu.framework import train as train_mod

    shards_dir, _ = tiny_shards
    cfg = shuffled.Config(shards=shards_dir, layer=0, batch_size=32)
    assert train_mod._partitioned_data_cfg(cfg, "train") is cfg

    monkeypatch.setattr(jax, "process_count", lambda: 4)
    monkeypatch.setattr(jax, "process_index", lambda: 2)
    out = train_mod._partitioned_data_cfg(cfg, "train")
    assert (out.batch_size, out.rank, out.world, out.drop_last) == (8, 2, 4, True)
    bad = shuffled.Config(shards=shards_dir, layer=0, batch_size=30)
    with pytest.raises(AssertionError, match="must divide"):
        train_mod._partitioned_data_cfg(bad, "train")


def test_check_full_mesh_rejects_partial_mesh(monkeypatch):
    """Multi-host guard shared by train() and evaluate(): a mesh that dropped
    devices to divide the batch size must be rejected before any collective
    (make_array_from_process_local_data would fail mid-run otherwise)."""
    import jax

    from saev_tpu.framework import train as train_mod

    full = parallel.make_mesh()
    train_mod._check_full_mesh(full, 64, 1, 1)  # single-process: no-op
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    train_mod._check_full_mesh(full, 64, 1, 1)  # full mesh: fine
    partial = parallel.make_mesh(n_devices=5)
    with pytest.raises(AssertionError, match="every device in the mesh"):
        train_mod._check_full_mesh(partial, 100, 1, 1)


def test_parallel_helpers_single_process_identity():
    """global_sum / global_min / broadcast_from_primary / to_host / sync are
    exact identities in single-process mode (the multi-process branches are
    covered by the dryrun below)."""
    import jax.numpy as jnp

    v = np.asarray([1.5, 2.5])
    np.testing.assert_array_equal(parallel.global_sum(v), v)
    np.testing.assert_array_equal(parallel.global_min(v), v)
    tree = {"a": np.ones(3), "b": 2}
    assert parallel.broadcast_from_primary(tree) is tree
    host = parallel.to_host({"x": jnp.arange(4)})
    np.testing.assert_array_equal(host["x"], np.arange(4))
    parallel.sync("noop")
    assert parallel.is_primary()
    assert parallel.process_count() == 1


@pytest.mark.slow
def test_dryrun_multihost_two_processes():
    """The full battery: 2 real processes (jax.distributed over localhost
    Gloo), partitioned loaders, make_array_from_process_local_data batch
    assembly, datapoint-init broadcast, BatchTopK+AuxK across the process
    boundary, orbax checkpoint via the all-process call, and single-device
    trajectory equality on the recorded global batches."""
    repo_root = pathlib.Path(__file__).resolve().parents[1]
    sys.path.insert(0, str(repo_root))
    try:
        from __graft_entry__ import dryrun_multihost

        dryrun_multihost(2)
    finally:
        sys.path.remove(str(repo_root))


def test_drop_last_smaller_than_batch_raises(tiny_shards):
    """A drop_last loader over fewer samples than one batch yields zero
    batches forever (BatchLimiter spins; a pod rank never reaches its first
    collective) — refuse at construction. Rank partitions with small shards
    are the multi-host trigger."""
    shards_dir, md = tiny_shards
    # rank 0 of 5 owns one 6-example shard = 6*8 = 48 samples < 64.
    cfg = shuffled.Config(
        shards=shards_dir, layer=0, batch_size=64,
        rank=0, world=5, drop_last=True,
    )
    with pytest.raises(ValueError, match="zero batches"):
        shuffled.DataLoader(cfg)
    # Without drop_last the loader yields a short final batch: allowed.
    shuffled.DataLoader(
        shuffled.Config(shards=shards_dir, layer=0, batch_size=64, rank=0, world=5)
    )
