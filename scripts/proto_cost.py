import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
from saev_tpu.framework import train as train_mod
from saev_tpu.nn import modeling, objectives

batch, d_model, d_sae, n_sae = 16384, 1024, 16384, 1
sae_cfg = modeling.SparseAutoencoderConfig(d_model=d_model, d_sae=d_sae, activation=modeling.TopK(top_k=32))
obj_cfg = objectives.Matryoshka(n_prefixes=10)
keys = jax.random.split(jax.random.key(0), n_sae)
inits = [modeling.init(sae_cfg, k) for k in keys]
stack = lambda trees: jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
params = stack([p for p, _ in inits])
ts = train_mod.SweepState(params=params, sae_state=stack([s for _, s in inits]),
    obj_state=stack([objectives.init_state(sae_cfg) for _ in range(n_sae)]),
    opt_state=train_mod._adam_init(params), step=jnp.zeros((), jnp.int32))
hp = {k: jnp.full((n_sae,), v, jnp.float32) for k, v in
      dict(lr=4e-4, n_lr_warmup=500.0, grad_clip=1.0, sparsity_coeff=0.0, aux_alpha=1/32, momentum=0.0).items()}
step = train_mod.make_train_step(sae_cfg, obj_cfg, n_steps=6000, optim="adam")
x = jnp.zeros((batch, d_model), jnp.float32)
pfx = jnp.asarray(np.stack([objectives.sample_prefixes(d_sae, 10, rng=np.random.default_rng(0))]))
lowered = jax.jit(step, donate_argnums=()).lower(ts, x, pfx, hp)
comp = lowered.compile()
ca = comp.cost_analysis()
if isinstance(ca, list): ca = ca[0]
flops = ca.get("flops", 0); bytes_acc = ca.get("bytes accessed", 0)
print(f"flops: {flops/1e12:.2f} TF   bytes accessed: {bytes_acc/1e9:.1f} GB")
for k, v in sorted(ca.items(), key=lambda kv: -abs(kv[1]) if isinstance(kv[1], float) else 0)[:18]:
    print(f"  {k}: {v:.3e}")
ma = comp.memory_analysis()
print(ma)
