"""Attribute train-step time across components (encode/topk/decode/full step)
at the bench shape, per matmul precision. Dev tool; run on the real chip."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from saev_tpu.framework import train as train_mod
from saev_tpu.nn import modeling, objectives


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    batch, d_model, d_sae = 16384, 1024, 16384
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, d_model)).astype(np.float32))

    for prec_name in ["default", "high"]:
        precision = modeling.PRECISIONS[prec_name]
        sae_cfg = modeling.SparseAutoencoderConfig(
            d_model=d_model, d_sae=d_sae, activation=modeling.TopK(top_k=32)
        )
        params, state = modeling.init(sae_cfg, jax.random.key(0))

        # 1. encode matmul only (fwd)
        enc_mm = jax.jit(lambda p, x: jnp.dot(x, p["W_enc"], preferred_element_type=jnp.float32, precision=precision))
        t_enc = timeit(enc_mm, params, x)

        # 2. topk threshold on h_x
        h = enc_mm(params, x)
        tk = jax.jit(lambda h: modeling.topk_activation(h, 32))
        t_topk = timeit(tk, h)

        # 3. grouped matryoshka decode fwd (10 prefixes)
        f = tk(h)
        prefixes = jnp.asarray(np.sort(rng.integers(512, d_sae, size=9)).tolist() + [d_sae], dtype=jnp.int32)
        dec = jax.jit(lambda p, f: modeling.decode(sae_cfg, p, f, prefixes, precision=precision))
        t_dec = timeit(dec, params, f)

        # 4. fwd+bwd of the full objective (single SAE, no vmap)
        obj_cfg = objectives.Matryoshka(n_prefixes=10)
        obj_state = objectives.init_state(sae_cfg)

        def loss_fn(p, x):
            loss, *_ = objectives.matryoshka_loss(
                obj_cfg, sae_cfg, p, state, obj_state, x, prefixes,
                training=True, precision=precision,
            )
            return loss.mse + loss.sparsity + loss.aux

        grad = jax.jit(jax.grad(loss_fn))
        t_grad = timeit(grad, params, x)

        # 5. full train step via the framework (1-SAE sweep)
        step_fn, hp, ts = None, None, None
        keys = jax.random.split(jax.random.key(0), 1)
        inits = [modeling.init(sae_cfg, k) for k in keys]
        stack = lambda trees: jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
        params_s = stack([p for p, _ in inits])
        ts = train_mod.SweepState(
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
        step = train_mod.make_train_step(
            sae_cfg, obj_cfg, n_steps=1000, optim="adam", matmul_precision=prec_name
        )
        pfx = jnp.tile(prefixes[None], (1, 1))
        for _ in range(3):
            ts, _stats = step(ts, x, pfx, hp)
        jax.block_until_ready(ts.params)
        n_it = 10
        t0 = time.perf_counter()
        for _ in range(n_it):
            ts, _stats = step(ts, x, pfx, hp)
        jax.block_until_ready(ts.params)
        t_step = (time.perf_counter() - t0) / n_it

        flop_mm = 2 * batch * d_model * d_sae
        print(f"--- precision={prec_name} ---")
        print(f"encode mm fwd : {t_enc*1e3:8.2f} ms  {flop_mm/t_enc/1e12:6.1f} TF/s")
        print(f"topk threshold: {t_topk*1e3:8.2f} ms")
        print(f"decode 10pfx  : {t_dec*1e3:8.2f} ms")
        print(f"obj fwd+bwd   : {t_grad*1e3:8.2f} ms")
        print(f"full step     : {t_step*1e3:8.2f} ms  -> {batch/t_step:9.0f} patches/s")


if __name__ == "__main__":
    main()
