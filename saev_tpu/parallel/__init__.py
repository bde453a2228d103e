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
slice; `jax.devices()` then spans the slice and the same mesh code works. The
host-side contract is SPMD: every process runs the same program, each feeding
its own per-process batch slice (`shard_batch` assembles them into one global
array via `jax.make_array_from_process_local_data`), with the `data` mesh axis
crossing process boundaries and `sweep`/`feature` staying within a host (the
gradient all-reduce rides DCN; sweep/feature traffic stays on ICI). Host-only
side effects (run dirs, wandb, checkpoints) happen on process 0 only
(`is_primary`), and host-accumulated statistics cross processes via
`global_sum`/`to_host`. Validated end to end by `__graft_entry__.
dryrun_multihost` (N real processes over a Gloo-backed CPU fake pod).
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


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_primary() -> bool:
    """True on the process that owns host-side side effects (run dirs, wandb,
    checkpoint writes). Always true single-process."""
    return jax.process_index() == 0


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

    Multi-host: `data` is the slowest axis over the process-ordered device
    list, so it is the axis that crosses hosts. `sweep`/`feature` must fit
    within each host (asserted): a cross-host sweep would require every host
    in a replica group to feed IDENTICAL batch rows, which contradicts the
    per-process loader partitioning (`shuffled.Config.rank/world`).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % (sweep * feature) == 0, (
        f"{n} devices not divisible by sweep={sweep} x feature={feature}"
    )
    procs = {d.process_index for d in devices}
    if len(procs) > 1:
        per_proc = n // len(procs)
        assert per_proc % (sweep * feature) == 0, (
            f"sweep={sweep} x feature={feature} does not fit within one "
            f"host's {per_proc} devices; the sweep/feature axes may not cross "
            "process boundaries (batch rows are partitioned per process)."
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

    Multi-host: `batch` is this process's LOCAL slice — global_batch /
    process_count rows off this host's partitioned loader — and the returned
    array is the GLOBAL (global_batch, d) array assembled across processes
    (each host's rows land on its own devices; no cross-host copy).
    """
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(
            batch_sharding(mesh), np.asarray(batch)
        )
    return jax.device_put(batch, batch_sharding(mesh))


def _place(x, sharding: NamedSharding):
    """device_put that also works on multi-process meshes: each process
    supplies its addressable shards from the (identical-on-every-host) host
    value. Callers must guarantee cross-host value equality — `make_saes`
    broadcasts datapoint-initialized params from process 0 for exactly this."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    arr = np.asarray(x)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )


def broadcast_from_primary(tree):
    """Replicate process 0's host pytree onto every process (identity when
    single-process). Used to keep data-dependent initialization (datapoint
    init reads the partitioned loader) identical across hosts."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return jax.tree.map(np.asarray, multihost_utils.broadcast_one_to_all(tree))


def global_sum(values) -> np.ndarray:
    """Element-wise sum of a small host array across processes (identity when
    single-process). For host-side accumulators (eval f64 sums, token counts)
    that each process builds from its local batch slices."""
    if jax.process_count() == 1:
        return np.asarray(values)
    from jax.experimental import multihost_utils

    stacked = multihost_utils.process_allgather(np.asarray(values))
    return np.asarray(stacked).sum(axis=0)


def global_min(values) -> np.ndarray:
    """Element-wise min of a small host array across processes (identity when
    single-process). For agreeing on a common iteration count when per-process
    loader partitions are uneven (every process must run the same number of
    collective-bearing steps)."""
    if jax.process_count() == 1:
        return np.asarray(values)
    from jax.experimental import multihost_utils

    stacked = multihost_utils.process_allgather(np.asarray(values))
    return np.asarray(stacked).min(axis=0)


def to_host(tree):
    """Device pytree -> host numpy, multi-host-safe: leaves whose shards span
    other processes are allgathered to their full global value first (e.g.
    sweep/feature-sharded params at checkpoint time)."""
    if jax.process_count() == 1:
        return jax.tree.map(np.asarray, tree)
    from jax.experimental import multihost_utils

    def one(x):
        if isinstance(x, jax.Array) and not (
            x.is_fully_addressable or x.is_fully_replicated
        ):
            return np.asarray(multihost_utils.process_allgather(x))
        return np.asarray(x)

    return jax.tree.map(one, tree)


def place_like(template, host_tree):
    """Place host (global-value) numpy leaves onto the exact shardings of
    `template`'s device leaves — the inverse of `to_host`, used on checkpoint
    restore. Works on multi-process meshes: each process supplies its
    addressable shards from the identical-on-every-host global value (orbax
    restores the same bytes on every process, satisfying `_place`'s cross-host
    equality contract)."""

    def one(t, h):
        h = np.asarray(h)
        if isinstance(t, jax.Array):
            assert t.shape == h.shape, (t.shape, h.shape)
            h = h.astype(t.dtype, copy=False)
            if t.committed:
                return _place(h, t.sharding)
            # Uncommitted template leaves (e.g. a plain jnp scalar) must stay
            # uncommitted: committing them to their current single device
            # conflicts with mesh-committed siblings at the next jit.
            return jax.device_put(h)
        return h

    return jax.tree.map(one, template, host_tree)


def sync(name: str = "sync") -> None:
    """Cross-process barrier (no-op single-process)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


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
            return _place(x, shard)
        return _place(x, repl)

    return jax.tree.map(place, tree)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree onto every device of the mesh."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: _place(x, sharding), tree)


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
        return _place(x, NamedSharding(mesh, PartitionSpec(*spec)))

    return jax.tree.map(place, tree)


def prefetch_to_device(iterator, mesh: Mesh, *, depth: int = 2, key: str = "act"):
    """Double/triple-buffer host batches into HBM (SURVEY.md §7.2 step 4).

    Wraps a host batch iterator: batch i+1's `device_put` (async under JAX's
    dispatch model) is issued while step i computes, hiding host->HBM transfer
    behind compute. Yields (device_array, host_batch) pairs. Multi-host, the
    iterator yields per-process local slices and the device array is global
    (shard_batch).
    """
    import collections

    queue = collections.deque()
    it = iter(iterator)

    def enqueue():
        try:
            batch = next(it)
        except StopIteration:
            return False
        x = shard_batch(mesh, np.asarray(batch[key]))
        queue.append((x, batch))
        return True

    for _ in range(depth):
        if not enqueue():
            break
    while queue:
        item = queue.popleft()
        enqueue()
        yield item
