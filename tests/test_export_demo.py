"""End-to-end tests for the static web demo exporters (scripts/export_demo.py),
the TPU rebuild's equivalent of the reference's Elm/Gradio demos
(reference src/web/src/{Semseg,Classification,Comparison}.elm)."""

import dataclasses
import importlib.util
import json
import pathlib
import sys

import numpy as np
import pytest

from conftest import _Helpers as helpers

REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def export_demo():
    spec = importlib.util.spec_from_file_location(
        "export_demo", REPO / "scripts" / "export_demo.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _make_run_with_inference(tmp_path, shards_dir, run_id="demorun1"):
    import jax

    from saev_tpu import disk, nn
    from saev_tpu.data import Metadata, OrderedConfig
    from saev_tpu.framework import inference
    from saev_tpu.nn import modeling

    md = Metadata.load(shards_dir)
    runs_root = helpers.tmp_runs_root(tmp_path)
    run = disk.Run.new(
        run_id,
        train_shards_dir=shards_dir,
        val_shards_dir=shards_dir,
        runs_root=runs_root,
    )
    cfg = modeling.SparseAutoencoderConfig(
        d_model=md.d_model, d_sae=32, activation=modeling.Relu()
    )
    params, state = modeling.init(cfg, jax.random.key(0))
    nn.dump(run.ckpt, cfg, params, state)
    inference.worker_fn(
        inference.Config(
            run=run.run_dir,
            data=OrderedConfig(shards=shards_dir, layer=int(md.layers[0]), batch_size=16),
            n_dists=4,
            device="cpu",
        )
    )
    return run


def _write_img_folder(root: pathlib.Path, n_per_class=4):
    """Tiny 2-class ImgFolder: class 'dark' near-black, class 'light' near-white,
    so a linear head on pooled activations is actually learnable."""
    from PIL import Image

    rng = np.random.default_rng(0)
    for cls, base in [("dark", 32), ("light", 224)]:
        d = root / cls
        d.mkdir(parents=True)
        for i in range(n_per_class):
            arr = np.clip(
                base + rng.integers(-30, 30, size=(16, 16, 3)), 0, 255
            ).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{cls}{i}.png")


def _write_imgfolder_shards(tmp_path: pathlib.Path, folder: pathlib.Path):
    from saev_tpu.data import datasets, extract, fake_vit
    from conftest import FAKE_CKPT

    return extract.worker_fn(
        family="fake-clip",
        ckpt=FAKE_CKPT,
        content_tokens_per_example=fake_vit.N_PATCHES,
        cls_token=True,
        d_model=fake_vit.D_MODEL,
        layers=[0],
        data=datasets.ImgFolder(root=folder),
        batch_size=4,
        n_workers=2,
        max_tokens_per_shard=512,
        shards_root=helpers.tmp_shards_root(tmp_path),
        device="cpu",
    )


def test_export_semseg(tmp_path, export_demo):
    shards_dir = helpers.write_shards(tmp_path, n_examples=6, layers=(0,))
    run = _make_run_with_inference(tmp_path, shards_dir)
    out = export_demo.export(
        export_demo.Args(
            run=run.run_dir, shards=shards_dir, n_images=4, n_latents=8,
            out=tmp_path / "site",
        )
    )
    demo = json.loads((out / "demo.json").read_text())
    assert (out / "index.html").exists() and (out / "app.js").exists()
    assert len(demo["images"]) == 4
    assert demo["grid_h"] * demo["grid_w"] > 0
    for latent in demo["latents"]:
        acts = demo["activations"][str(latent)]
        assert len(acts) == 4
        assert all(len(row) == demo["grid_h"] * demo["grid_w"] for row in acts)


def test_export_classification(tmp_path, export_demo):
    folder = tmp_path / "imgs"
    _write_img_folder(folder)
    shards_dir = _write_imgfolder_shards(tmp_path, folder)
    run = _make_run_with_inference(tmp_path, shards_dir)
    out = export_demo.export_classification(
        export_demo.Args(
            run=run.run_dir, shards=shards_dir, n_images=4, n_latents=8,
            out=tmp_path / "cls_site",
        )
    )
    demo = json.loads((out / "demo.json").read_text())
    n_classes = len(demo["class_names"])
    assert n_classes == 2 and set(demo["class_names"]) == {"dark", "light"}
    d_model = len(demo["x_pool"][0])
    assert len(demo["head_w"]) == n_classes
    assert all(len(row) == d_model for row in demo["head_w"])
    assert len(demo["head_b"]) == n_classes
    for latent in demo["latents"]:
        assert len(demo["w_dec"][str(latent)]) == d_model

    # The client-side intervention math must be self-consistent: the head
    # should separate the two classes on the exported pooled activations.
    w = np.array(demo["head_w"])
    b = np.array(demo["head_b"])
    x = np.array(demo["x_pool"])
    pred = (x @ w.T + b).argmax(axis=1)
    # ImgFolder sorts class dirs, so the first 4 exported examples are 'dark'
    # (class 0); the head fit on all 8 must classify them correctly.
    assert (pred == 0).all(), pred


def test_export_classification_rejects_single_class(tmp_path, export_demo):
    shards_dir = helpers.write_shards(tmp_path, n_examples=6, layers=(0,))
    run = _make_run_with_inference(tmp_path, shards_dir)
    with pytest.raises(ValueError, match="2 classes"):
        export_demo.export_classification(
            export_demo.Args(
                run=run.run_dir, shards=shards_dir, out=tmp_path / "x",
            )
        )


def test_export_comparison(tmp_path, export_demo):
    shards_a = helpers.write_shards(tmp_path / "a", n_examples=6, layers=(0,))
    shards_b = helpers.write_shards(tmp_path / "b", n_examples=6, layers=(0,))
    run_a = _make_run_with_inference(tmp_path / "a", shards_a, "runa0001")
    run_b = _make_run_with_inference(tmp_path / "b", shards_b, "runb0001")
    out = export_demo.export_comparison(
        export_demo.ComparisonArgs(
            runs=[run_a.run_dir, run_b.run_dir],
            shards_list=[shards_a, shards_b],
            n_images=3, n_latents=6, out=tmp_path / "cmp_site",
        )
    )
    demo = json.loads((out / "demo.json").read_text())
    assert len(demo["images"]) == 3
    assert len(demo["models"]) == 2
    for m in demo["models"]:
        assert m["family"] == "fake-clip"
        assert m["grid_h"] * m["grid_w"] > 0
        for latent in m["latents"]:
            acts = m["activations"][str(latent)]
            assert len(acts) == 3
