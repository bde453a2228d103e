"""Mid-training checkpoint/resume for the SAE train loop.

The reference has NO optimizer-state checkpointing and no resume-from-step
(SURVEY.md §5.4; reference recovery granularity = re-run the Slurm job). This
module adds step checkpointing of the full `SweepState` (params + optimizer
moments + BatchTopK thresholds + dead-latent counters + step) via orbax, keyed
by a stable hash of the training-group config so a re-submitted job resumes
where it crashed.

The data stream is NOT checkpointed: on resume the shuffled loader restarts
with its seeded RNG, which re-reads data in a new random order. This is
statistically benign for i.i.d.-shuffled token streams (each step still sees a
uniform sample of the corpus) and keeps the checkpoint format tiny.
"""

import logging
import pathlib
import typing as tp

import jax
import numpy as np

logger = logging.getLogger("checkpoints")


def state_dir(runs_root: pathlib.Path, group_key: str) -> pathlib.Path:
    return pathlib.Path(runs_root) / ".train_state" / group_key


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save(
    runs_root: pathlib.Path,
    group_key: str,
    step: int,
    state: tp.Any,
    *,
    prune: bool = True,
) -> pathlib.Path:
    """Write the sweep state at `step`; by default keeps only the latest
    checkpoint.

    Multi-host: EVERY process must call this (orbax's Checkpointer
    synchronizes all processes internally and gates the actual file writes to
    the primary host); the pruning of older steps is ours and runs on process
    0 only. Callers saving SEVERAL groups that must stay resumable together
    (the train loop's cohorts) pass prune=False and call `prune_below` only
    after every group's save at `step` succeeded — pruning inside each save
    would leave no common restorable step if a crash lands between them."""
    root = state_dir(runs_root, group_key)
    root.mkdir(parents=True, exist_ok=True)
    path = root / f"step_{step:08d}"
    ckptr = _checkpointer()
    host_state = jax.tree.map(np.asarray, state)
    ckptr.save(path, host_state, force=True)
    # ckptr.save ends with a global barrier, so pruning from process 0 cannot
    # race a reader.
    if prune and jax.process_index() == 0:
        for old in sorted(root.glob("step_*"))[:-1]:
            import shutil

            shutil.rmtree(old, ignore_errors=True)
    logger.info("Saved train state at step %d to '%s'.", step, path)
    return path


def prune_below(runs_root: pathlib.Path, group_key: str, step: int) -> None:
    """Delete checkpoints older than `step` (process 0 only). Call after all
    cooperating groups saved at `step` — see `save(prune=False)`."""
    if jax.process_index() != 0:
        return
    root = state_dir(runs_root, group_key)
    if not root.exists():
        return
    import shutil

    for p in root.glob("step_*"):
        if int(p.name.split("_")[1]) < step:
            shutil.rmtree(p, ignore_errors=True)


def available_steps(runs_root: pathlib.Path, group_key: str) -> list[int]:
    """Sorted steps with a saved checkpoint for this group."""
    root = state_dir(runs_root, group_key)
    if not root.exists():
        return []
    return sorted(int(p.name.split("_")[1]) for p in root.glob("step_*"))


def latest_step(runs_root: pathlib.Path, group_key: str) -> int | None:
    steps = available_steps(runs_root, group_key)
    return steps[-1] if steps else None


def restore(
    runs_root: pathlib.Path, group_key: str, step: int, template: tp.Any
) -> tp.Any:
    """Restore the sweep state saved at `step`, shaped like `template`.

    Returns full GLOBAL host (numpy) values; callers re-place them onto the
    template's device shardings with `parallel.place_like`. Multi-host, every
    process calls this (reading the shared checkpoint dir). The template is
    reduced to shape/dtype zeros — orbax only reads its structure, and
    np.asarray on a cross-process-sharded device leaf would raise."""
    path = state_dir(runs_root, group_key) / f"step_{step:08d}"
    ckptr = _checkpointer()
    host_template = jax.tree.map(
        lambda l: np.zeros(l.shape, l.dtype)
        if isinstance(l, jax.Array)
        else np.asarray(l),
        template,
    )
    restored = ckptr.restore(path, item=host_template)
    logger.info("Restored train state from '%s'.", path)
    return restored
