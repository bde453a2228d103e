"""Device mesh + sharding utilities (the reference has no multi-device training —
SURVEY.md §2.8; this is the one true distributed feature added in the TPU rebuild).

The training layout is pure data parallelism over a 1-D `data` mesh axis: the token
batch is sharded along axis 0 across chips, SAE parameters/optimizer state are
replicated, and XLA inserts the gradient all-reduce over ICI when the jitted step
consumes a sharded batch with replicated params. BatchTopK's batch-global top-k
keeps its exact global semantics under pjit's global view (XLA lowers the flattened
top-k to cross-chip collectives).
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """A 1-D mesh over the `data` axis using all (or the first n) local devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Token batches shard along axis 0 (the token/batch dimension)."""
    return NamedSharding(mesh, PartitionSpec(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Params / optimizer state / RNG are replicated on every chip."""
    return NamedSharding(mesh, PartitionSpec())


def shard_batch(mesh: Mesh, batch: np.ndarray) -> jax.Array:
    """Host numpy batch -> device array sharded along axis 0 of the mesh.

    The batch size must divide evenly by the mesh size (the loaders' batch_size is
    controlled by config, so callers pick a multiple of the device count).
    """
    return jax.device_put(batch, batch_sharding(mesh))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree onto every device of the mesh."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
