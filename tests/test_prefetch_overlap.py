"""Loader/step overlap guards for `parallel.prefetch_to_device` (the train
pipeline's double-buffer — framework/train.py feeds every step through it).

Two guards against prefetch regressions:

1. Deterministic: when the consumer receives item i, the wrapper must already
   have pulled items up to i+depth-1 from the host iterator (the lookahead
   that lets batch i+1's device_put overlap step i's compute). Fails if the
   wrapper is made serial (pull-on-demand) or the depth is dropped to 1.
2. Wall-clock: with a host loader that sleeps (releasing the GIL, like the
   real loader's page-cache reads) and a device step of comparable cost, the
   pipelined wall time must be well under the serial sum — fails if someone
   adds a blocking `block_until_ready` into the pipeline. Margins are
   generous (25%) to stay robust on a loaded 1-core CI host.
"""

import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from saev_tpu import parallel


def _mesh1():
    return parallel.make_mesh(n_devices=1)


def test_prefetch_pulls_ahead():
    mesh = _mesh1()
    pulled = []

    def gen():
        for i in range(6):
            pulled.append(i)
            yield {"act": np.full((8, 4), i, np.float32)}

    seen = []
    for i, (x, batch) in enumerate(parallel.prefetch_to_device(gen(), mesh)):
        # depth=2 lookahead: item i+1 has been pulled (and its device_put
        # issued) before the consumer touches item i.
        assert len(pulled) >= min(i + 2, 6), (i, pulled)
        assert isinstance(x, jax.Array)
        seen.append(int(np.asarray(x)[0, 0]))
    assert seen == list(range(6))


def test_prefetch_depth_zero_is_rejected_or_empty():
    """depth<1 cannot prefetch; the generator yields nothing (documents the
    degenerate case so nobody wires depth=0 and silently trains on no data)."""
    mesh = _mesh1()
    items = list(
        parallel.prefetch_to_device(
            ({"act": np.zeros((4, 4), np.float32)} for _ in range(3)),
            mesh,
            depth=0,
        )
    )
    assert items == []


@pytest.mark.slow
def test_pipeline_overlaps_loader_and_step():
    """Wall time of the prefetch pipeline ~ max(loader, step) per item, not
    the sum: the async-dispatched step computes while the host iterator
    blocks in its sleep (the loader's I/O analog)."""
    mesh = _mesh1()
    n, d = 512, 512
    w = jnp.eye(d) * 0.5

    @jax.jit
    def step(x):
        y = x
        for _ in range(30):
            y = jnp.tanh(y @ w)
        return y.sum()

    x0 = jnp.zeros((n, d), jnp.float32)
    step(x0).block_until_ready()  # compile
    t0 = time.perf_counter()
    for _ in range(3):
        step(x0).block_until_ready()
    step_s = (time.perf_counter() - t0) / 3
    # Loader sleep matched to the step so overlap is visible; floor keeps the
    # test meaningful if the step is very fast on this host.
    sleep_s = max(step_s, 0.02)
    n_items = 8

    def loader():
        for i in range(n_items):
            time.sleep(sleep_s)
            yield {"act": np.zeros((n, d), np.float32)}

    # Serial reference: load -> put -> step -> block, one at a time.
    t0 = time.perf_counter()
    acc = None
    for batch in loader():
        x = parallel.shard_batch(mesh, batch["act"])
        acc = step(x)
        acc.block_until_ready()
    serial_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    acc = None
    for x, batch in parallel.prefetch_to_device(loader(), mesh):
        acc = step(x)
    acc.block_until_ready()
    pipe_s = time.perf_counter() - t0

    # Perfect overlap ~ serial/2 here (loader ~ step by construction); 75%
    # leaves headroom for dispatch overhead and host noise while still
    # failing hard if the pipeline serializes.
    assert pipe_s < 0.75 * serial_s, (pipe_s, serial_s, step_s)
