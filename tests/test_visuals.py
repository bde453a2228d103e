"""End-to-end visuals test: shards → inference → top-k latent image grids
(mirror of reference contrib/trait_discovery visuals coverage)."""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(
    0, str(pathlib.Path(__file__).parent.parent / "contrib" / "trait_discovery" / "src")
)

from conftest import _Helpers as helpers


def test_visuals_worker_end_to_end(tmp_path):
    pytest.importorskip("pandas")
    import jax

    from saev_tpu import disk, nn
    from saev_tpu.data import Metadata, OrderedConfig, fake_vit
    from saev_tpu.framework import inference
    from saev_tpu.nn import modeling
    from tdiscovery import visuals

    shards_dir = helpers.write_shards(tmp_path, n_examples=10, layers=(0,))
    md = Metadata.load(shards_dir)
    runs_root = helpers.tmp_runs_root(tmp_path)
    run = disk.Run.new(
        "vizrun", train_shards_dir=shards_dir, val_shards_dir=shards_dir,
        runs_root=runs_root,
    )
    cfg = modeling.SparseAutoencoderConfig(
        d_model=fake_vit.D_MODEL, d_sae=16, activation=modeling.TopK(top_k=2)
    )
    params, state = modeling.init(cfg, jax.random.key(0))
    nn.dump(run.ckpt, cfg, params, state)

    inference.worker_fn(
        inference.Config(
            run=run.run_dir,
            data=OrderedConfig(shards=shards_dir, layer=0, batch_size=32),
            device="cpu",
        )
    )

    viz_cfg = visuals.Config(
        run=run.run_dir,
        shards=shards_dir,
        top_k=3,
        n_latents=4,
        latents=(0,),
        log_freq_range=(-12.0, 2.0),
        log_value_range=(-12.0, 6.0),
        save_seg=False,
    )
    visuals.worker_fn(viz_cfg)

    art = run.inference / md.hash
    assert (art / "var.parquet").exists()
    import pandas as pd

    var = pd.read_parquet(art / "var.parquet")
    assert len(var) == 16
    assert "log10_freq" in var.columns

    img_root = art / "images"
    feature_dirs = sorted(img_root.iterdir())
    assert (img_root / "0").exists()
    pngs = list((img_root / "0").glob("*.png"))
    assert pngs, "expected top-k images for latent 0"
    from PIL import Image

    img = Image.open(pngs[0])
    assert img.size == (8, 8)  # fake-clip image size
    assert len(feature_dirs) >= 1


def test_visuals_reference_file_layout_and_seg(tmp_path):
    """Reference artifact names per example: {j}_img.png, {j}_sae_img.png,
    {j}_seg.png, {j}_sae_seg.png (reference visuals.py:337-364), plus the
    activation-distribution grid figure (:98-149)."""
    pytest.importorskip("pandas")
    import jax

    from saev_tpu import disk, nn
    from saev_tpu.data import Metadata, OrderedConfig, fake_vit
    from saev_tpu.framework import inference
    from saev_tpu.nn import modeling
    from tdiscovery import visuals

    shards_dir = helpers.write_shards(tmp_path, n_examples=8, layers=(0,), seg=True)
    md = Metadata.load(shards_dir)
    runs_root = helpers.tmp_runs_root(tmp_path)
    run = disk.Run.new(
        "vizrun2", train_shards_dir=shards_dir, val_shards_dir=shards_dir,
        runs_root=runs_root,
    )
    cfg = modeling.SparseAutoencoderConfig(
        d_model=fake_vit.D_MODEL, d_sae=16, activation=modeling.TopK(top_k=2)
    )
    params, state = modeling.init(cfg, jax.random.key(1))
    nn.dump(run.ckpt, cfg, params, state)
    inference.worker_fn(
        inference.Config(
            run=run.run_dir,
            data=OrderedConfig(shards=shards_dir, layer=0, batch_size=32),
            device="cpu",
        )
    )

    visuals.worker_fn(visuals.Config(
        run=run.run_dir, shards=shards_dir, top_k=2, n_latents=2, latents=(0,),
        log_freq_range=(-12.0, 2.0), log_value_range=(-12.0, 6.0),
        save_seg=True, n_distributions=4,
    ))

    art = run.inference / md.hash
    d0 = art / "images" / "0"
    assert (d0 / "0_img.png").exists()
    assert (d0 / "0_sae_img.png").exists()
    assert (d0 / "0_seg.png").exists()
    assert (d0 / "0_sae_seg.png").exists()
    assert (art / "4_activation_distributions.png").exists()


def test_feature_gallery_picks_highlighted_images(tmp_path):
    """The gallery engine must select ONE image per example (the {j}_sae_img
    highlight), not all four visuals variants (round-3 review fix)."""
    import json
    import re

    import jax

    from saev_tpu import disk, nn
    from saev_tpu.data import Metadata, OrderedConfig, fake_vit
    from saev_tpu.framework import inference
    from saev_tpu.interactive import features
    from saev_tpu.nn import modeling
    from tdiscovery import visuals

    shards_dir = helpers.write_shards(tmp_path, n_examples=8, layers=(0,), seg=True)
    md = Metadata.load(shards_dir)
    runs_root = helpers.tmp_runs_root(tmp_path)
    run = disk.Run.new(
        "galrun", train_shards_dir=shards_dir, val_shards_dir=shards_dir,
        runs_root=runs_root,
    )
    cfg = modeling.SparseAutoencoderConfig(
        d_model=fake_vit.D_MODEL, d_sae=16, activation=modeling.TopK(top_k=2)
    )
    params, state = modeling.init(cfg, jax.random.key(2))
    nn.dump(run.ckpt, cfg, params, state)
    inference.worker_fn(inference.Config(
        run=run.run_dir,
        data=OrderedConfig(shards=shards_dir, layer=0, batch_size=32),
        device="cpu",
    ))
    visuals.worker_fn(visuals.Config(
        run=run.run_dir, shards=shards_dir, top_k=2, n_latents=2, latents=(0,),
        log_freq_range=(-12.0, 2.0), log_value_range=(-12.0, 6.0),
        save_seg=True, save_distributions=False,
    ))

    out = features.generate(features.Config(
        run=run.run_dir, shards=shards_dir, n_features=4,
        out=tmp_path / "features.html",
    ))
    payload = json.loads(
        re.search(r"window.SAEV = (\{.*?\});</script>", out.read_text(), re.S).group(1)
    )
    for ckpt in payload["ckpts"]:
        for latent in ckpt["latents"]:
            # top_k=2 examples -> at most 2 highlighted images, never the
            # 4-variant spread (2 examples x img/sae_img/seg/sae_seg = 8).
            assert 1 <= len(latent["imgs"]) <= 2, len(latent["imgs"])
