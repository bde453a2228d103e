"""Optimizer parity tests against torch.optim (the reference's optimizers)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from saev_tpu.framework import train as T


def test_adam_matches_torch():
    rng = np.random.default_rng(0)
    p0 = rng.normal(size=(1, 8, 4)).astype(np.float32)
    grads_seq = [rng.normal(size=(1, 8, 4)).astype(np.float32) for _ in range(5)]
    lr = 3e-3

    # torch
    pt = torch.nn.Parameter(torch.from_numpy(p0[0].copy()))
    opt = torch.optim.Adam([pt], lr=lr)
    for g in grads_seq:
        pt.grad = torch.from_numpy(g[0].copy())
        opt.step()

    # ours
    params = {"w": jnp.asarray(p0)}
    state = T._adam_init(params)
    lr_arr = jnp.asarray([lr], jnp.float32)
    for g in grads_seq:
        updates, state = T._adam_update({"w": jnp.asarray(g)}, state, lr_arr)
        params = jax.tree.map(lambda p, u: p + u, params, updates)

    np.testing.assert_allclose(
        np.asarray(params["w"][0]), pt.detach().numpy(), rtol=1e-5, atol=1e-6
    )


def test_muon_matches_torch():
    if not hasattr(torch.optim, "Muon"):
        pytest.skip("torch.optim.Muon not available")
    rng = np.random.default_rng(1)
    p2d = rng.normal(size=(1, 16, 8)).astype(np.float32)  # stacked 2-D -> Muon
    p1d = rng.normal(size=(1, 8)).astype(np.float32)  # 1-D -> Adam
    grads2 = [rng.normal(size=(1, 16, 8)).astype(np.float32) for _ in range(4)]
    grads1 = [rng.normal(size=(1, 8)).astype(np.float32) for _ in range(4)]
    lr = 1e-2

    # torch: Muon on the 2-D param, Adam on the 1-D (reference train.py:296-306)
    ptm = torch.nn.Parameter(torch.from_numpy(p2d[0].copy()))
    pta = torch.nn.Parameter(torch.from_numpy(p1d[0].copy()))
    muon = torch.optim.Muon([ptm], lr=lr)
    adam = torch.optim.Adam([pta], lr=lr)
    for g2, g1 in zip(grads2, grads1):
        ptm.grad = torch.from_numpy(g2[0].copy())
        pta.grad = torch.from_numpy(g1[0].copy())
        muon.step()
        adam.step()

    params = {"w2": jnp.asarray(p2d), "w1": jnp.asarray(p1d)}
    state = T._muon_init(params)
    lr_arr = jnp.asarray([lr], jnp.float32)
    for g2, g1 in zip(grads2, grads1):
        grads = {"w2": jnp.asarray(g2), "w1": jnp.asarray(g1)}
        updates, state = T._muon_update(params, grads, state, lr_arr)
        params = jax.tree.map(lambda p, u: p + u, params, updates)

    # torch's Newton-Schulz runs in bf16; ours in f32 — loose tolerance.
    np.testing.assert_allclose(
        np.asarray(params["w2"][0]), ptm.detach().numpy(), rtol=0.05, atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(params["w1"][0]), pta.detach().numpy(), rtol=1e-5, atol=1e-6
    )
