"""Runtime shape/type guards at public API boundaries (reference §5.2:
beartype+jaxtyping on nearly every function; here guards.check + GuardError)."""

import dataclasses

import numpy as np
import pytest

import jax

from saev_tpu import guards
from saev_tpu.nn import modeling, serialize
from conftest import _Helpers as helpers


def _sae(d_model=16, d_sae=32):
    cfg = modeling.SparseAutoencoderConfig(
        d_model=d_model, d_sae=d_sae, activation=modeling.TopK(top_k=4)
    )
    params, state = modeling.init(cfg, jax.random.key(0))
    return cfg, params, state


def test_check_names_the_argument():
    with pytest.raises(guards.GuardError, match="x: expected trailing dimension 8"):
        guards.check("x", np.zeros((2, 4)), last_dim=8)
    with pytest.raises(guards.GuardError, match="acts: expected 2 dimensions"):
        guards.check("acts", np.zeros((2, 4, 3)), ndim=2)
    with pytest.raises(guards.GuardError, match="expected an array"):
        guards.check("w", [1, 2, 3])
    # Passing checks are silent.
    guards.check("ok", np.zeros((3, 8)), ndim=2, last_dim=8, axis0=3)


def test_encode_rejects_wrong_d_model():
    cfg, params, state = _sae(d_model=16)
    bad = np.zeros((4, 17), np.float32)
    with pytest.raises(guards.GuardError, match="x: expected trailing dimension 16"):
        modeling.encode(cfg, params, state, bad, training=False)
    with pytest.raises(guards.GuardError, match="x: expected 2 dimensions"):
        modeling.encode(
            cfg, params, state, np.zeros((4, 2, 16), np.float32), training=False
        )


def test_decode_rejects_wrong_d_sae():
    cfg, params, _ = _sae(d_sae=32)
    with pytest.raises(guards.GuardError, match="f_x: expected trailing dimension 32"):
        modeling.decode(cfg, params, np.zeros((4, 33), np.float32))


def test_guard_fires_at_trace_time_under_jit():
    cfg, params, state = _sae()

    @jax.jit
    def fwd(x):
        out, _ = modeling.encode(cfg, params, state, x, training=False)
        return out.f_x

    with pytest.raises(guards.GuardError):
        fwd(np.zeros((4, cfg.d_model + 1), np.float32))


def test_load_rejects_mismatched_checkpoint(tmp_path):
    cfg, params, state = _sae(d_model=16, d_sae=32)
    fpath = tmp_path / "sae.pt"
    serialize.dump(fpath, cfg, params, state)
    # Corrupt the header's d_sae so it disagrees with the tensors.
    raw = fpath.read_bytes()
    head, _, rest = raw.partition(b"\n")
    head = head.replace(b'"d_sae":32', b'"d_sae":64')
    assert b'"d_sae":64' in head, head
    fpath.write_bytes(head + b"\n" + rest)
    with pytest.raises(guards.GuardError, match="W_dec"):
        serialize.load(fpath)


def test_train_rejects_mismatched_shards(tmp_path):
    from saev_tpu.data import ShuffledConfig
    from saev_tpu.framework import train as train_mod

    shards_dir = helpers.write_shards(tmp_path, n_examples=8, layers=(0,))
    data_cfg = ShuffledConfig(shards=shards_dir, layer=0, batch_size=16)
    cfg = train_mod.Config(
        train_data=data_cfg, val_data=data_cfg, n_train=32, n_val=16,
        sae=modeling.SparseAutoencoderConfig(
            d_model=64,  # fake_vit shards are d_model=128
            d_sae=32, activation=modeling.TopK(top_k=4),
        ),
        track=False, runs_root=helpers.tmp_runs_root(tmp_path), device="cpu",
    )
    with pytest.raises(guards.GuardError, match="d_model=64 does not match"):
        train_mod.train([cfg])


def test_typed_decorator_checks_jaxtyping_annotations():
    jaxtyping = pytest.importorskip("jaxtyping")
    pytest.importorskip("typeguard")
    from jaxtyping import Float

    @guards.typed
    def f(x: Float[np.ndarray, "b d"]) -> Float[np.ndarray, "b d"]:
        return x

    f(np.zeros((2, 3), np.float32))
    with pytest.raises(Exception):  # TypeCheckError from typeguard
        f(np.zeros((2,), np.float32))
