"""Device mesh + sharding utilities (the reference has no multi-device training —
SURVEY.md §2.8; this subsystem is the distributed feature added in the TPU
rebuild).

Three mesh axes:

- `data`: pure data parallelism. The token batch shards along axis 0; SAE
  params/optimizer state replicate, and XLA inserts the gradient all-reduce
  over ICI. BatchTopK's batch-global top-k keeps exact global semantics under
  pjit's global view.
- `sweep`: model-sweep parallelism. The stacked SAE axis (leading axis of every
  param/optimizer leaf) shards across devices — each chip trains its slice of
  the sweep with NO cross-chip gradient traffic (SAEs are independent); only
  the batch broadcasts. This scales the reference's signature same-batch
  multi-SAE training (reference train.py:339-343 loops in Python on one GPU)
  to pods.
- `feature`: tensor parallelism over the latent dimension (d_sae) for
  dictionaries too wide for one chip's HBM (`shard_features` slices every
  d_sae-sized dim of params/optimizer/counters; GSPMD partitions the pure-XLA
  step and inserts the cross-shard collectives, incl. the global top-k).

Multi-host: call `init_distributed()` before any JAX op on each host of a pod
slice; `jax.devices()` then spans the slice and the same mesh code works.
"""

import logging
import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

logger = logging.getLogger("parallel")

DATA_AXIS = "data"
SWEEP_AXIS = "sweep"
FEATURE_AXIS = "feature"


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize multi-host JAX (one process per host on a pod slice).

    On Cloud TPU pods the arguments auto-detect from the metadata server; on
    other clusters set $JAX_COORDINATOR_ADDRESS / $JAX_NUM_PROCESSES /
    $JAX_PROCESS_ID or pass them explicitly. The reference has no analog (each
    Slurm job is an independent single-GPU process)."""
    kwargs = {}
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    logger.info(
        "jax.distributed initialized: process %d/%d, %d global devices.",
        jax.process_index(), jax.process_count(), jax.device_count(),
    )


def make_mesh(
    n_devices: int | None = None, devices=None, *, sweep: int = 1,
    feature: int = 1,
) -> Mesh:
    """A ("data", "sweep", "feature") mesh over the first n local (or all
    global) devices.

    sweep=1 and feature=1 (defaults) degenerate to pure data parallelism.
    The `feature` axis shards the SAE latent dimension (d_sae) for very wide
    dictionaries — tensor parallelism over the one big axis SAEs have
    (SURVEY.md §2.8's suggested TPU-native extension).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % (sweep * feature) == 0, (
        f"{n} devices not divisible by sweep={sweep} x feature={feature}"
    )
    grid = np.asarray(devices).reshape(n // (sweep * feature), sweep, feature)
    return Mesh(grid, (DATA_AXIS, SWEEP_AXIS, FEATURE_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Token batches shard along axis 0 over `data` (replicated over `sweep`)."""
    return NamedSharding(mesh, PartitionSpec(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated (scalars, small state)."""
    return NamedSharding(mesh, PartitionSpec())


def sweep_sharding(mesh: Mesh) -> NamedSharding:
    """Stacked-SAE pytree leaves shard their leading (sweep) axis."""
    return NamedSharding(mesh, PartitionSpec(SWEEP_AXIS))


def shard_batch(mesh: Mesh, batch: np.ndarray) -> jax.Array:
    """Host numpy batch -> device array sharded along axis 0 of the mesh.

    The batch size must divide evenly by the mesh's data extent (the loaders'
    batch_size is controlled by config, so callers pick a multiple).
    """
    return jax.device_put(batch, batch_sharding(mesh))


def shard_sweep(mesh: Mesh, tree):
    """Place a stacked-SAE pytree with the sweep axis sharded over `sweep`
    (replicated when the mesh has sweep extent 1). Leaves whose leading axis
    does not divide the sweep extent are replicated."""
    n_sweep = mesh.shape[SWEEP_AXIS]
    repl = replicated(mesh)
    shard = sweep_sharding(mesh)

    def place(x):
        if (
            n_sweep > 1
            and hasattr(x, "ndim")
            and x.ndim >= 1
            and x.shape[0] % n_sweep == 0
        ):
            return jax.device_put(x, shard)
        return jax.device_put(x, repl)

    return jax.tree.map(place, tree)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree onto every device of the mesh."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_features(mesh: Mesh, tree, d_sae: int):
    """Place a stacked-SAE pytree with the latent dimension sharded over
    `feature` (and the leading sweep axis over `sweep`, as `shard_sweep`).

    Structural rule: every dim of size `d_sae` (beyond the leading stacked
    axis) is a latent dim — W_enc (n, d_model, d_sae), W_dec (n, d_sae,
    d_model), b_enc / toks_since_active (n, d_sae), and the optimizer moments
    mirroring them. Leaves with no latent dim fall back to the shard_sweep
    placement. Tiny-test caveat: keep d_model != d_sae or d_model dims would
    shard too."""
    n_feature = mesh.shape[FEATURE_AXIS]
    n_sweep = mesh.shape[SWEEP_AXIS]
    if n_feature == 1:
        return shard_sweep(mesh, tree)
    assert d_sae % n_feature == 0, (
        f"d_sae={d_sae} is not divisible by the feature axis ({n_feature}); "
        "the latent dimension would silently replicate instead of sharding."
    )

    def place(x):
        if not hasattr(x, "ndim") or x.ndim == 0:
            return jax.device_put(x, replicated(mesh))
        spec = [None] * x.ndim
        if n_sweep > 1 and x.shape[0] % n_sweep == 0:
            spec[0] = SWEEP_AXIS
        for i in range(1, x.ndim):
            if x.shape[i] == d_sae and x.shape[i] % n_feature == 0:
                spec[i] = FEATURE_AXIS
                break  # one latent dim per leaf
        while spec and spec[-1] is None:
            spec.pop()
        return jax.device_put(x, NamedSharding(mesh, PartitionSpec(*spec)))

    return jax.tree.map(place, tree)


def prefetch_to_device(iterator, mesh: Mesh, *, depth: int = 2, key: str = "act"):
    """Double/triple-buffer host batches into HBM (SURVEY.md §7.2 step 4).

    Wraps a host batch iterator: batch i+1's `device_put` (async under JAX's
    dispatch model) is issued while step i computes, hiding host->HBM transfer
    behind compute. Yields (device_array, host_batch) pairs.
    """
    import collections

    sharding = batch_sharding(mesh)
    queue = collections.deque()
    it = iter(iterator)

    def enqueue():
        try:
            batch = next(it)
        except StopIteration:
            return False
        x = jax.device_put(np.asarray(batch[key]), sharding)
        queue.append((x, batch))
        return True

    for _ in range(depth):
        if not enqueue():
            break
    while queue:
        item = queue.popleft()
        enqueue()
        yield item
