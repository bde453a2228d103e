"""Round-2 step profiler: attribute the fused train step across components.
Each timed unit is ONE jitted carry->carry function with the perturbation
inside the jit (the dev tunnel dedups identical in-flight dispatches and acks
before completion — NOTES.md measurement gotchas)."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from saev_tpu.framework import train as train_mod
from saev_tpu.nn import modeling, objectives
from saev_tpu.ops import matryoshka as fused
from saev_tpu.ops import pallas_topk

B, D, S = 16384, 1024, 16384
J = 10


def chain_time(step, carry, n=12, warmup=3):
    for _ in range(warmup):
        carry = step(carry)
    jax.block_until_ready(carry)
    t0 = time.perf_counter()
    for _ in range(n):
        carry = step(carry)
    _ = float(np.asarray(jax.tree.leaves(carry)[0]).ravel()[0])  # true sync
    return (time.perf_counter() - t0) / n


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    sae_cfg = modeling.SparseAutoencoderConfig(
        d_model=D, d_sae=S, activation=modeling.TopK(top_k=32)
    )
    params, state = modeling.init(sae_cfg, jax.random.key(0))
    obj_cfg = objectives.Matryoshka(n_prefixes=J)
    obj_state = objectives.init_state(sae_cfg)
    prefixes = jnp.asarray(
        np.sort(rng.integers(512, S, size=J - 1)).tolist() + [S], jnp.int32
    )

    @jax.jit
    def enc_step(c):
        h = jnp.dot(x * (1 + 1e-12 * c), params["W_enc"],
                    preferred_element_type=jnp.float32) + params["b_enc"]
        return h.ravel()[0]

    t = chain_time(enc_step, jnp.float32(0))
    print(f"encode mm fwd         : {t*1e3:7.2f} ms")

    h0 = jnp.dot(x, params["W_enc"], preferred_element_type=jnp.float32) + params["b_enc"]

    @jax.jit
    def kth_step(c):
        k = pallas_topk.kth_value(h0 * (1 + 1e-12 * c), 32)
        return k.ravel()[0]

    t = chain_time(kth_step, jnp.float32(0))
    print(f"pallas kth            : {t*1e3:7.2f} ms")

    f0 = jax.jit(lambda h: modeling.topk_activation(h, 32, fast=True))(h0)

    @jax.jit
    def pm_fwd_step(c):
        loss, _ = fused.prefix_mse(
            params["W_dec"], params["b_dec"], f0 * (1 + 1e-12 * c), x, prefixes, 1024, None
        )
        return loss

    t = chain_time(pm_fwd_step, jnp.float32(0))
    print(f"prefix_mse fwd        : {t*1e3:7.2f} ms")

    @jax.jit
    def pm_grad_step(c):
        def lf(f):
            loss, _ = fused.prefix_mse(
                params["W_dec"], params["b_dec"], f, x, prefixes, 1024, None
            )
            return loss
        g = jax.grad(lf)(f0 * (1 + 1e-12 * c))
        return g.ravel()[0]

    t = chain_time(pm_grad_step, jnp.float32(0))
    print(f"prefix_mse fwd+df     : {t*1e3:7.2f} ms")

    @jax.jit
    def pm_gradw_step(c):
        def lf(p):
            loss, _ = fused.prefix_mse(p["W_dec"], p["b_dec"], f0, x, prefixes, 1024, None)
            return loss * (1 + 1e-12 * c)
        g = jax.grad(lf)(params)
        return g["W_dec"].ravel()[0]

    t = chain_time(pm_gradw_step, jnp.float32(0))
    print(f"prefix_mse fwd+full bwd: {t*1e3:6.2f} ms")

    def loss_fn(p, x, training_prefixes):
        loss, *_ = objectives.matryoshka_loss(
            obj_cfg, sae_cfg, p, state, obj_state, x, training_prefixes, training=True,
        )
        return loss.mse + loss.sparsity + loss.aux

    @jax.jit
    def obj_step(c):
        g = jax.grad(loss_fn)(
            jax.tree.map(lambda a: a * (1 + 1e-12 * c), params), x, prefixes
        )
        return g["W_dec"].ravel()[0]

    t_obj = chain_time(obj_step, jnp.float32(0))
    print(f"objective fwd+bwd     : {t_obj*1e3:7.2f} ms")

    @jax.jit
    def obj1_step(c):
        g = jax.grad(loss_fn)(
            jax.tree.map(lambda a: a * (1 + 1e-12 * c), params), x, prefixes[-1:]
        )
        return g["W_dec"].ravel()[0]

    t_aux = chain_time(obj1_step, jnp.float32(0))
    print(f"objective 1-prefix    : {t_aux*1e3:7.2f} ms (encode+kth+aux+decode1)")

    # full train step (1-SAE sweep)
    stack = lambda trees: jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
    inits = [modeling.init(sae_cfg, jax.random.key(1))]
    params_s = stack([p for p, _ in inits])
    ts0 = train_mod.SweepState(
        params=params_s,
        sae_state=stack([s for _, s in inits]),
        obj_state=stack([objectives.init_state(sae_cfg)]),
        opt_state=train_mod._adam_init(params_s),
        step=jnp.zeros((), jnp.int32),
    )
    hp = {
        "lr": jnp.full((1,), 4e-4, jnp.float32),
        "n_lr_warmup": jnp.full((1,), 500.0, jnp.float32),
        "grad_clip": jnp.ones((1,), jnp.float32),
        "sparsity_coeff": jnp.zeros((1,), jnp.float32),
        "aux_alpha": jnp.full((1,), 1 / 32, jnp.float32),
        "momentum": jnp.zeros((1,), jnp.float32),
    }
    step = train_mod.make_train_step(sae_cfg, obj_cfg, n_steps=6000, optim="adam")
    pfx = jnp.tile(prefixes[None], (1, 1))

    def one(ts):
        ts, _ = step(ts, x, pfx, hp)
        return ts

    t_step = chain_time(one, ts0)
    print(f"full train step       : {t_step*1e3:7.2f} ms -> {B/t_step:9.0f} patches/s")


if __name__ == "__main__":
    main()
