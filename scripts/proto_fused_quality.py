"""Does the fused Matryoshka prefix-MSE path change training QUALITY vs
autodiff-through-decode? Same data, same init, same bf16 precision, 400
steps; only the gradient implementation differs (objectives.FUSED_ENABLED).
Single-step gradients agree to bf16 noise (tests); this checks nothing
accumulates over many optimizer steps."""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
from saev_tpu.framework import train as train_mod
from saev_tpu.nn import modeling, objectives

batch, d_model, d_sae, n_sae = 8192, 512, 4096, 1
n_steps = 400
rng = np.random.default_rng(0)
A = rng.normal(size=(2048, d_model)).astype(np.float32) / np.sqrt(d_model)

def make_batch(i):
    r = np.random.default_rng(1000 + i)
    z = (r.random(size=(batch, 2048)) < 0.01) * r.exponential(1.0, size=(batch, 2048))
    return jnp.asarray((z.astype(np.float32) @ A) + 0.01 * r.normal(size=(batch, d_model)).astype(np.float32))

xs = [make_batch(i) for i in range(40)]

results = {}
for fused in [True, False]:
    objectives.FUSED_ENABLED = fused
    sae_cfg = modeling.SparseAutoencoderConfig(d_model=d_model, d_sae=d_sae, activation=modeling.TopK(top_k=32))
    obj_cfg = objectives.Matryoshka(n_prefixes=10)
    inits = [modeling.init(sae_cfg, k) for k in jax.random.split(jax.random.key(0), n_sae)]
    stack = lambda trees: jax.tree.map(lambda *t: jnp.stack(t), *trees)
    params = stack([p for p, _ in inits])
    ts = train_mod.SweepState(params=params, sae_state=stack([s for _, s in inits]),
        obj_state=stack([objectives.init_state(sae_cfg) for _ in range(n_sae)]),
        opt_state=train_mod._adam_init(params), step=jnp.zeros((), jnp.int32))
    hp = {k: jnp.full((n_sae,), v, jnp.float32) for k, v in
          dict(lr=1e-3, n_lr_warmup=50.0, grad_clip=1.0, sparsity_coeff=0.0, aux_alpha=1/32, momentum=0.0).items()}
    step = train_mod.make_train_step(sae_cfg, obj_cfg, n_steps=n_steps, optim="adam")
    losses = []
    for i in range(n_steps):
        pfx = jnp.asarray(np.stack([objectives.sample_prefixes(d_sae, 10, rng=np.random.default_rng(i))]))
        ts, stats = step(ts, xs[i % len(xs)], pfx, hp)
        if (i + 1) % 100 == 0:
            losses.append(float(np.asarray(stats["mse"])[0]))
    xe = make_batch(999)
    p1 = jax.tree.map(lambda a: a[0], ts.params)
    s1 = jax.tree.map(lambda a: a[0], ts.sae_state)
    enc, _ = modeling.encode(sae_cfg, p1, s1, xe, training=False)
    xh = modeling.decode(sae_cfg, p1, enc.f_x)[:, 0, :]
    sse = float(jnp.sum((xh - xe) ** 2)); ssb = float(jnp.sum((xe - xe.mean(0)) ** 2))
    results[fused] = (losses, sse / ssb)
    name = "fused" if fused else "autodiff"
    print(f"{name:8s} mse@100..400: {['%.5f' % l for l in losses]}  eval NMSE: {sse/ssb:.5f}", flush=True)

objectives.FUSED_ENABLED = True
f, a = results[True][1], results[False][1]
print(f"NMSE fused={f:.5f} autodiff={a:.5f} rel diff={(f-a)/a:+.3%}")
