"""Run-gallery discovery + browser assembly (mirror of reference
contrib/trait_discovery/notebooks/visuals.py: has_images run discovery,
checkpoint/shards selection, latent galleries)."""

import json
import pathlib
import sys

import pytest

sys.path.insert(
    0, str(pathlib.Path(__file__).parent.parent / "contrib" / "trait_discovery" / "src")
)

from conftest import _Helpers as helpers
from tdiscovery import browse


def _fake_gallery_run(root, rid, shards_names, with_images=True, valid=True):
    """root is a `.../saev/runs` runs root (the disk.Run path contract)."""
    run_dir = root / rid
    if valid:
        for sub in ("checkpoint", "links", "inference"):
            (run_dir / sub).mkdir(parents=True, exist_ok=True)
    for shards_name in shards_names:
        art = run_dir / "inference" / shards_name
        art.mkdir(parents=True, exist_ok=True)
        if with_images:
            (art / "images" / "0").mkdir(parents=True, exist_ok=True)
    return run_dir


def test_discover_runs_filters_and_dedupes(tmp_path):
    root_a = tmp_path / "a" / "saev" / "runs"
    root_b = tmp_path / "b" / "saev" / "runs"
    _fake_gallery_run(root_a, "run1", ["shardsA", "shardsB"])
    _fake_gallery_run(root_a, "run2", ["shardsA"], with_images=False)
    _fake_gallery_run(root_b, "run1", ["shardsC"])  # duplicate id: first root wins
    _fake_gallery_run(root_b, "run3", ["shardsA"])
    # Images but a broken run layout (no checkpoint/links): skipped, the
    # same contract build_browsers later requires.
    _fake_gallery_run(root_b, "run4", ["shardsA"], valid=False)
    (root_a / "not_a_dir.txt").write_text("x")

    galleries = browse.discover_runs([root_a, root_b, tmp_path / "missing"])
    by_id = {g.run_dir.name: g for g in galleries}
    assert set(by_id) == {"run1", "run3"}
    assert by_id["run1"].run_dir == root_a / "run1"
    assert by_id["run1"].shards == ("shardsA", "shardsB")
    assert by_id["run3"].shards == ("shardsA",)


def test_shards_with_images_requires_images_dir(tmp_path):
    root = tmp_path / "saev" / "runs"
    run_dir = _fake_gallery_run(root, "r", ["s1"], with_images=False)
    assert browse.shards_with_images(run_dir) == ()
    assert browse.shards_with_images(root / "nope") == ()


def test_build_browsers_end_to_end(tmp_path):
    """Full pipeline: shards -> inference -> visuals -> discovered gallery ->
    browser HTML pages + index."""
    pytest.importorskip("pandas")
    import jax

    from saev_tpu import disk, nn
    from saev_tpu.data import OrderedConfig, fake_vit
    from saev_tpu.framework import inference
    from saev_tpu.nn import modeling
    from tdiscovery import visuals

    shards_dir = helpers.write_shards(tmp_path, n_examples=8, layers=(0,))
    runs_root = helpers.tmp_runs_root(tmp_path)
    run = disk.Run.new(
        "browserun", train_shards_dir=shards_dir, val_shards_dir=shards_dir,
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
    visuals.worker_fn(
        visuals.Config(
            run=run.run_dir, shards=shards_dir, top_k=2, n_latents=3,
            log_freq_range=(-12, 2), log_value_range=(-12, 6), save_seg=False,
        )
    )

    galleries = browse.discover_runs([runs_root])
    assert [g.run_dir.name for g in galleries] == ["browserun"]
    assert galleries[0].shards == (shards_dir.name,)

    out_dir = tmp_path / "site"
    written = browse.build_browsers([runs_root], out_dir, n_features=5)
    index = out_dir / "index.html"
    assert index in written and index.exists()
    assert f"browserun / {shards_dir.name}" in index.read_text()
    pages = [p for p in written if p != index]
    assert len(pages) == 1
    html = pages[0].read_text()
    payload = json.loads(
        html.split("window.SAEV = ", 1)[1].split(";</script>", 1)[0]
    )
    assert payload["ckpts"][0]["id"] == "browserun"
    assert payload["ckpts"][0]["latents"]
