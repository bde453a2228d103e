"""Mid-training checkpoint/resume tests (an improvement over the reference,
which has no optimizer-state checkpointing — SURVEY.md §5.4)."""

import dataclasses

import numpy as np
import pytest

from conftest import _Helpers as helpers


def _cfg(tmp_path, shards_dir, runs_root, **kw):
    from saev_tpu.data import ShuffledConfig, fake_vit
    from saev_tpu.framework import train as train_mod
    from saev_tpu.nn import modeling, objectives

    data_cfg = ShuffledConfig(
        shards=shards_dir, layer=0, batch_size=32, n_threads=2, seed=7
    )
    return train_mod.Config(
        train_data=data_cfg,
        val_data=data_cfg,
        n_train=320,
        n_val=64,
        sae=modeling.SparseAutoencoderConfig(
            d_model=fake_vit.D_MODEL, d_sae=32, activation=modeling.TopK(top_k=4)
        ),
        objective=objectives.Matryoshka(n_prefixes=3),
        lr=1e-3,
        n_lr_warmup=2,
        log_every=5,
        track=False,
        runs_root=runs_root,
        device="cpu",
        seed=1,
        **kw,
    )


def test_checkpoint_save_and_resume(tmp_path):
    import jax

    from saev_tpu.framework import checkpoints
    from saev_tpu.framework import train as train_mod

    shards_dir = helpers.write_shards(tmp_path, n_examples=16, layers=(0,))
    runs_root = helpers.tmp_runs_root(tmp_path)

    # Run 1: train with checkpointing every 4 steps (10 steps total).
    cfg = _cfg(tmp_path, shards_dir, runs_root, ckpt_every=4)
    runtimes, run, steps = train_mod.train([cfg])
    run.finish()
    # 16 examples x 16 tokens = 256-token epochs; BatchLimiter's partial-epoch
    # drift adjustment yields 11 batches for n_train=320 @ bsz 32.
    assert steps == 11
    state_root = runs_root / ".train_state"
    assert state_root.exists()
    group_dirs = list(state_root.iterdir())
    assert len(group_dirs) == 1
    # Only the latest checkpoint is kept.
    kept = sorted(p.name for p in group_dirs[0].glob("step_*"))
    assert kept == ["step_00000008"]

    # Run 2: resume picks up at step 8 and only runs the remaining 2 steps.
    cfg2 = _cfg(tmp_path, shards_dir, runs_root, ckpt_every=0, resume=True)
    runtimes2, run2, steps2 = train_mod.train([cfg2])
    run2.finish()
    # Remaining budget = len(limited)=10 minus restored step 8 -> 2 more steps.
    assert steps2 == 10
    assert int(runtimes2[0].ts.step) == 10

    # Restored params at step 8 differ from fresh init (training happened).
    w = np.asarray(runtimes2[0].ts.params["W_dec"][0])
    assert np.isfinite(w).all()


def test_resume_without_state_starts_fresh(tmp_path):
    from saev_tpu.framework import train as train_mod

    shards_dir = helpers.write_shards(tmp_path, n_examples=16, layers=(0,))
    runs_root = helpers.tmp_runs_root(tmp_path)
    cfg = _cfg(tmp_path, shards_dir, runs_root, resume=True)
    runtimes, run, steps = train_mod.train([cfg])
    run.finish()
    assert steps == 11
    assert int(runtimes[0].ts.step) == 11


def test_checkpoint_roundtrip_exact(tmp_path):
    """save/restore preserves every leaf bitwise."""
    import jax.numpy as jnp

    from saev_tpu.framework import checkpoints
    from saev_tpu.framework.train import SweepState, _adam_init

    params = {
        "W_dec": jnp.arange(12.0).reshape(1, 4, 3),
        "b_dec": jnp.ones((1, 3)),
        "W_enc": jnp.arange(12.0).reshape(1, 3, 4) * 2,
        "b_enc": jnp.zeros((1, 4)),
    }
    ts = SweepState(
        params=params,
        sae_state={"threshold": jnp.asarray([0.5])},
        obj_state={"toks_since_active": jnp.zeros((1, 4), jnp.int32)},
        opt_state=_adam_init(params),
        step=jnp.asarray(5, jnp.int32),
    )
    runs_root = helpers.tmp_runs_root(tmp_path)
    checkpoints.save(runs_root, "testgroup", 5, ts)
    assert checkpoints.latest_step(runs_root, "testgroup") == 5
    restored = checkpoints.restore(runs_root, "testgroup", 5, ts)
    import jax

    for a, b in zip(jax.tree.leaves(ts), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_accepts_sharded_device_template(tmp_path):
    """restore() reads only the template's structure/shapes — a device
    template sharded over a mesh (multi-host leaves aren't even
    host-addressable) must work, and place_like must return the restored
    values onto the template's exact shardings (the train.py resume path)."""
    import jax.numpy as jnp

    from saev_tpu import parallel
    from saev_tpu.framework import checkpoints

    rng = np.random.default_rng(0)
    state = {
        "w": rng.normal(size=(4, 3)).astype(np.float32),
        "step": np.asarray(3, np.int32),
    }
    runs_root = helpers.tmp_runs_root(tmp_path)
    checkpoints.save(runs_root, "g", 3, state)

    mesh = parallel.make_mesh(sweep=2)
    template = parallel.shard_sweep(
        mesh,
        {"w": jnp.zeros((4, 3), jnp.float32), "step": jnp.zeros((), jnp.int32)},
    )
    restored = checkpoints.restore(runs_root, "g", 3, template)
    placed = parallel.place_like(template, restored)
    assert placed["w"].sharding == template["w"].sharding
    np.testing.assert_array_equal(np.asarray(placed["w"]), state["w"])
    assert int(placed["step"]) == 3


def test_crash_between_cohort_saves_resumes_from_common_step(tmp_path, monkeypatch):
    """Per-cohort checkpoints are saved sequentially; a crash between them
    must leave a step restorable by ALL cohorts. Pruning is deferred until
    every cohort saved the step, and resume picks the latest COMMON step
    (a max-over-cohort-0 choice would demand a step cohort 1 never saved)."""
    import dataclasses as dc

    from saev_tpu.framework import checkpoints
    from saev_tpu.framework import train as train_mod
    from saev_tpu.nn import modeling

    shards_dir = helpers.write_shards(tmp_path, n_examples=16, layers=(0,))
    runs_root = helpers.tmp_runs_root(tmp_path)
    base = _cfg(tmp_path, shards_dir, runs_root, ckpt_every=4)
    # A second cohort: same data stream, different compiled step (top_k is a
    # static of the traced step; d_sae/d_model are CANNOT_PARALLELIZE).
    cfgs = [
        base,
        dc.replace(
            base, sae=dc.replace(base.sae, activation=modeling.TopK(top_k=8))
        ),
    ]

    real_save = checkpoints.save
    calls = {"n": 0}

    def crashing_save(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 4:  # step 8: after c0's save, BEFORE c1's
            raise RuntimeError("simulated preemption between cohort saves")
        return real_save(*args, **kwargs)

    monkeypatch.setattr(checkpoints, "save", crashing_save)
    with pytest.raises(RuntimeError, match="simulated preemption"):
        train_mod.train(cfgs)
    monkeypatch.setattr(checkpoints, "save", real_save)

    # Crash state: c0 has {4, 8} (step-8 prune never ran), c1 has {4} only.
    state_root = runs_root / ".train_state"
    groups = sorted(p.name for p in state_root.iterdir())
    assert len(groups) == 2
    steps_per_group = {
        g: [int(p.name.split("_")[1]) for p in sorted((state_root / g).iterdir())]
        for g in groups
    }
    assert sorted(map(tuple, steps_per_group.values())) == [(4,), (4, 8)]

    # Resume must restore the common step 4 (NOT c0's latest, 8) for every
    # cohort and complete the run.
    restore_steps = []
    real_restore = checkpoints.restore

    def spy_restore(root, gk, step, template):
        restore_steps.append(step)
        return real_restore(root, gk, step, template)

    monkeypatch.setattr(checkpoints, "restore", spy_restore)
    resumed = [dc.replace(c, resume=True) for c in cfgs]
    runtimes, run, steps = train_mod.train(resumed)
    run.finish()
    assert restore_steps == [4, 4], restore_steps
    # 11 batches total minus the 4 already done, modulo BatchLimiter's
    # partial-epoch drift on the reshuffled stream.
    assert steps in (10, 11), steps
    assert all(int(rt.ts.step) == steps for rt in runtimes)
    # The completed run prunes everything below the final saved step.
    for g in groups:
        left = [int(p.name.split("_")[1]) for p in (state_root / g).iterdir()]
        assert left == [8], left
