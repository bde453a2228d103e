"""Tests against real assets, supplied via CLI options (mirror of reference
conftest.py:11-105: the suite degrades gracefully to hermetic tests when no
real shards/checkpoints are available).

    python -m pytest tests/test_real_assets.py --shards <dir> \
        --ckpt-path <sae.pt> --dinov3-ckpt <pth>
"""

import numpy as np


def test_real_shards_load_and_stream(real_shards):
    from saev_tpu.data import Metadata, ShuffledConfig, ShuffledDataLoader

    md = Metadata.load(real_shards)
    dl = ShuffledDataLoader(
        ShuffledConfig(
            shards=real_shards, layer=md.layers[0], batch_size=1024, n_threads=4
        )
    )
    batch = next(iter(dl))
    dl.shutdown()
    assert batch["act"].shape == (1024, md.d_model)
    assert np.isfinite(batch["act"]).all()


def test_real_checkpoint_roundtrip(real_ckpt_path):
    import jax.numpy as jnp

    from saev_tpu import nn
    from saev_tpu.nn import modeling

    cfg, params, state = nn.load(real_ckpt_path)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(8, cfg.d_model)).astype(np.float32)
    )
    out, _ = modeling.forward(cfg, params, state, x)
    assert np.isfinite(np.asarray(out.f_x)).all()


def test_real_dinov3_checkpoint(real_dinov3_ckpt):
    from saev_tpu.models import dinov3

    model = dinov3.Vit(str(real_dinov3_ckpt))
    x = np.random.default_rng(0).normal(
        size=(1, 196, 3 * 16 * 16)
    ).astype(np.float32)
    out, taps = model.forward_recorded(x, (model.n_layers - 2,))
    assert taps.shape[-1] == model.d_model
    assert np.isfinite(taps).all()
