"""End-to-end training throughput benchmark: shards on disk -> shuffled host
loader -> device prefetch -> jitted train step on the real accelerator.

The headline bench (bench.py) isolates compute by keeping batches resident in
HBM; this script measures the whole pipeline the way the reference measured
its 3.5k patches/s number (reference docs/internal/archive/experiments/
throughput.md:775-820: loader-bound end-to-end rate).

Subcommands:
    synth   Write production-shape synthetic shards (default ~17 GB: 16k
            examples x 256 content tokens x d_model 1024 f32). Idempotent:
            skips if the target dir already exists with the same metadata.
    run     Measure (a) loader-only patches/s + MB/s and (b) end-to-end
            patches/s of loader -> prefetch_to_device -> train step.

Usage:
    python scripts/bench_e2e.py synth --root /root/bench_data
    python scripts/bench_e2e.py run --root /root/bench_data
"""

import dataclasses
import json
import logging
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

log_format = "[%(asctime)s] [%(levelname)s] [%(name)s] %(message)s"
logging.basicConfig(level=logging.INFO, format=log_format)
logger = logging.getLogger("bench_e2e")

D_MODEL = 1024
CONTENT_TOKENS = 256


@dataclasses.dataclass(frozen=True)
class SynthArgs:
    root: pathlib.Path = pathlib.Path("/root/bench_data")
    n_examples: int = 16_000
    """16k examples x 257 tokens x 1024 d x 4 B ~= 16.8 GB."""
    max_tokens_per_shard: int = 1_000_000
    """~1 GB shards -> ~17 files (exercises shard rollover + the work queue)."""


@dataclasses.dataclass(frozen=True)
class RunArgs:
    root: pathlib.Path = pathlib.Path("/root/bench_data")
    batch_size: int = 16_384
    n_threads: int = 4
    buffer_size: int = 32
    """Reservoir capacity in batches (32 x 16384 x 4 KB = 2.1 GB pool)."""
    loader_batches: int = 60
    """Batches for the loader-only phase."""
    train_steps: int = 60
    """Steps for the end-to-end phase."""
    d_sae: int = 16_384
    min_buffer_fill: float = 0.5


def _shards_root(root: pathlib.Path) -> pathlib.Path:
    p = root / "saev" / "shards"
    p.mkdir(parents=True, exist_ok=True)
    return p


def _make_metadata(args: SynthArgs):
    from saev_tpu.data import datasets, shards

    data_cfg = datasets.FakeImg(n_examples=args.n_examples)
    return shards.Metadata(
        family="fake-clip",
        ckpt="synthetic-bench",
        layers=(0,),
        content_tokens_per_example=CONTENT_TOKENS,
        cls_token=True,
        d_model=D_MODEL,
        n_examples=args.n_examples,
        max_tokens_per_shard=args.max_tokens_per_shard,
        data=shards.encode_dataset_cfg(data_cfg),
        dataset=pathlib.Path("/synthetic"),
    )


def synth(args: SynthArgs) -> pathlib.Path:
    from saev_tpu.data import shards

    md = _make_metadata(args)
    root = _shards_root(args.root)
    out = root / md.hash
    if (out / "shards.json").exists():
        logger.info("Shards already exist at %s; skipping synth.", out)
        return out

    # One reusable random block: content doesn't matter for throughput, and
    # np RNG at ~300 MB/s would dominate the 17 GB write otherwise.
    batch = 64
    rng = np.random.default_rng(0)
    block = rng.standard_normal(
        size=(batch, 1, CONTENT_TOKENS + 1, D_MODEL), dtype=np.float32
    )

    t0 = time.perf_counter()
    md.dump(root)
    with shards.ShardWriter(root, md) as writer:
        for start in range(0, args.n_examples, batch):
            n = min(batch, args.n_examples - start)
            writer.write_batch(block[:n], start)
            if start % (batch * 50) == 0:
                logger.info("Wrote %d/%d examples.", start + n, args.n_examples)
    dt = time.perf_counter() - t0
    gb = args.n_examples * (CONTENT_TOKENS + 1) * D_MODEL * 4 / 1e9
    logger.info("Synthesized %.1f GB in %.1f s (%.2f GB/s) at %s.", gb, dt, gb / dt, out)
    return out


def run(args: RunArgs) -> dict:
    import jax

    from saev_tpu import parallel
    from saev_tpu.data import shuffled
    from saev_tpu.framework import train as train_mod
    from saev_tpu.nn import modeling, objectives

    shards_root = _shards_root(args.root)
    dirs = [p for p in shards_root.iterdir() if (p / "metadata.json").exists()]
    assert dirs, f"No shards under {shards_root}; run `synth` first."
    shards_dir = dirs[0]

    loader_cfg = shuffled.Config(
        shards=shards_dir,
        layer=0,
        batch_size=args.batch_size,
        n_threads=args.n_threads,
        buffer_size=args.buffer_size,
        min_buffer_fill=args.min_buffer_fill,
        batch_timeout_s=120.0,
        seed=0,
    )
    results: dict = {
        "batch_size": args.batch_size,
        "n_threads": args.n_threads,
        "buffer_size": args.buffer_size,
    }
    batch_mb = args.batch_size * D_MODEL * 4 / 1e6

    # ---- Phase A: loader-only ----------------------------------------------
    loader = shuffled.DataLoader(loader_cfg)
    it = iter(loader)
    for _ in range(5):  # warm up threads, fill reservoir
        next(it)
    t0 = time.perf_counter()
    for _ in range(args.loader_batches):
        next(it)
    dt = time.perf_counter() - t0
    loader.shutdown()
    results["loader_patches_per_s"] = args.batch_size * args.loader_batches / dt
    results["loader_mb_per_s"] = batch_mb * args.loader_batches / dt
    logger.info(
        "Loader-only: %.0f patches/s (%.0f MB/s).",
        results["loader_patches_per_s"], results["loader_mb_per_s"],
    )

    # ---- Phase B: end-to-end train loop ------------------------------------
    sae_cfg = modeling.SparseAutoencoderConfig(
        d_model=D_MODEL, d_sae=args.d_sae, activation=modeling.TopK(top_k=32)
    )
    obj_cfg = objectives.Matryoshka(n_prefixes=10)
    params, sae_state = modeling.init(sae_cfg, jax.random.key(0))
    import jax.numpy as jnp

    stack1 = lambda tree: jax.tree.map(lambda x: jnp.asarray(x)[None], tree)
    ts = train_mod.SweepState(
        params=stack1(params),
        sae_state=stack1(sae_state),
        obj_state=stack1(objectives.init_state(sae_cfg)),
        opt_state=None,
        step=jnp.zeros((), jnp.int32),
    )
    ts = ts._replace(opt_state=train_mod._adam_init(ts.params))
    hp = {
        "lr": jnp.full((1,), 4e-4, jnp.float32),
        "n_lr_warmup": jnp.full((1,), 500.0, jnp.float32),
        "grad_clip": jnp.ones((1,), jnp.float32),
        "sparsity_coeff": jnp.zeros((1,), jnp.float32),
        "aux_alpha": jnp.full((1,), 1 / 32, jnp.float32),
        "momentum": jnp.zeros((1,), jnp.float32),
    }
    step_fn = train_mod.make_train_step(sae_cfg, obj_cfg, n_steps=6000, optim="adam")
    mesh = parallel.make_mesh(n_devices=1)
    prefix_rng = np.random.default_rng(0)

    loader = shuffled.DataLoader(loader_cfg)
    warmup = 5
    n_done = 0
    t0 = None
    for x, _batch in parallel.prefetch_to_device(loader, mesh, depth=2):
        prefixes = jnp.asarray(
            objectives.sample_prefixes(args.d_sae, 10, rng=prefix_rng)
        )[None]
        ts, stats = step_fn(ts, x, prefixes, hp)
        n_done += 1
        if n_done == warmup:
            jax.block_until_ready(ts.params)
            t0 = time.perf_counter()
        if n_done == warmup + args.train_steps:
            break
    jax.block_until_ready(ts.params)
    dt = time.perf_counter() - t0
    loader.shutdown()

    results["e2e_patches_per_s"] = args.batch_size * args.train_steps / dt
    results["e2e_mb_per_s"] = batch_mb * args.train_steps / dt
    results["e2e_step_ms"] = dt / args.train_steps * 1e3
    logger.info(
        "End-to-end: %.0f patches/s (%.1f ms/step, loader feed %.0f MB/s).",
        results["e2e_patches_per_s"], results["e2e_step_ms"], results["e2e_mb_per_s"],
    )
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    from saev_tpu.utils import cli

    cli.run({"synth": synth, "run": run})
