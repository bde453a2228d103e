"""Tests for the interactive_interp additions: semseg quantitative
intervention eval, probe validation ranking, latent proposal visuals, and the
classification CLS-probe grid."""

import json
import pathlib
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from contrib.interactive_interp.classification import training as cls_training  # noqa: E402
from contrib.interactive_interp.semseg import quantitative, training, validation, visuals  # noqa: E402

from saev_tpu.data import OrderedConfig  # noqa: E402


@pytest.fixture(scope="module")
def seg_setup(tmp_path_factory, helpers):
    """Labeled shards + a tiny SAE ckpt + a trained probe grid."""
    import jax

    from saev_tpu import nn
    from saev_tpu.nn import modeling

    tmp = tmp_path_factory.mktemp("ii_extras")
    shards = helpers.write_shards(
        tmp, n_examples=10, layers=(1,), seg=True, max_tokens_per_shard=4096
    )
    sae_cfg = modeling.SparseAutoencoderConfig(
        d_model=128, d_sae=64, activation=modeling.TopK(top_k=8)
    )
    params, state = modeling.init(sae_cfg, jax.random.key(0))
    sae_ckpt = tmp / "sae.pt"
    nn.dump(sae_ckpt, sae_cfg, params, state)

    probe_cfgs = [
        training.Train(
            shards=shards, layer=1, n_classes=3, learning_rate=lr,
            n_train=256, batch_size=64,
        )
        for lr in (1e-3, 1e-4)
    ]
    probe_params = training.train(probe_cfgs)
    probe_ckpt = tmp / "probes"
    training.dump(probe_ckpt, probe_cfgs, probe_params)
    return shards, sae_ckpt, probe_ckpt


def _acts(shards):
    return OrderedConfig(shards=shards, layer=1, batch_size=64)


def test_quantitative_interventions(seg_setup, tmp_path):
    shards, sae_ckpt, probe_ckpt = seg_setup
    cfg = quantitative.Config(
        sae_ckpt=sae_ckpt, probe_ckpt=probe_ckpt, acts=_acts(shards),
        n_classes=3, scale=-1.0, dump_to=tmp_path,
    )
    reports = quantitative.worker_fn(cfg)
    assert [r.method for r in reports] == ["auto-feat", "rand-feat", "rand-vec"]
    for r in reports:
        assert 0.0 <= r.mean_target_change <= 1.0
        assert 0.0 <= r.mean_other_change <= 1.0
        assert r.class_results, "non-background classes must be represented"
    csv_text = (tmp_path / "results.csv").read_text()
    assert csv_text.startswith(
        "method,target_change,other_change,target_std,other_std,scale"
    )
    assert len(csv_text.strip().splitlines()) == 4


def test_count_fn_shows_specificity():
    """A latent aligned with one class's probe direction flips that class's
    patches and leaves the others alone — the discrimination the per-class
    intervention form exists to measure (a class-specific latent must yield
    target_change >> other_change)."""
    import jax.numpy as jnp

    from saev_tpu.nn import modeling

    d_model, d_sae, n_classes = 2, 2, 3
    sae_cfg = modeling.SparseAutoencoderConfig(
        d_model=d_model, d_sae=d_sae, activation=modeling.TopK(top_k=1)
    )
    params = {
        "W_enc": jnp.eye(d_model, d_sae, dtype=jnp.float32),
        "b_enc": jnp.zeros((d_sae,), jnp.float32),
        "W_dec": jnp.eye(d_sae, d_model, dtype=jnp.float32),
        "b_dec": jnp.zeros((d_model,), jnp.float32),
    }
    state = modeling.init_state(sae_cfg)
    # Probe: class 1 reads x[0], class 2 reads x[1], background logit 0.
    probe_w = np.array([[0.0, 10.0, 0.0], [0.0, 0.0, 10.0]], np.float32)
    probe_b = np.zeros((n_classes,), np.float32)

    run = quantitative._count_fn(
        sae_cfg, params, state, probe_w, probe_b, scale=-5.0,
        n_classes=n_classes,
    )
    # 4 class-1 patches and 4 class-2 patches.
    x = np.array([[1.0, 0.0]] * 4 + [[0.0, 1.0]] * 4, np.float32)
    lookup = np.array([-1, 0, 1], np.int32)  # class c -> latent c-1
    top_values = jnp.ones((d_sae,), jnp.float32)
    counts = np.stack(
        [np.asarray(c) for c in run(x, lookup, top_values, None)], axis=1
    )
    # Class 1: suppressing latent 0 everywhere flips all 4 class-1 patches
    # (orig logit 10 -> -50) and none of the class-2 patches (their logit 1
    # drops but logit 2 still wins).
    n_orig, n_changed, n_other, n_other_changed = counts[1]
    assert (n_orig, n_changed) == (4, 4)
    assert (n_other, n_other_changed) == (4, 0)
    n_orig, n_changed, n_other, n_other_changed = counts[2]
    assert (n_orig, n_changed) == (4, 4)
    assert (n_other, n_other_changed) == (4, 0)
    # Background (lookup -1) never intervenes.
    assert counts[0][1] == 0 and counts[0][3] == 0


def test_latent_lookup_shapes(seg_setup):
    from saev_tpu import nn

    shards, sae_ckpt, _ = seg_setup
    sae_cfg, params, state = nn.load(sae_ckpt)
    f1, top = quantitative.latent_class_stats(
        sae_cfg, params, state, _acts(shards), n_classes=3
    )
    assert f1.shape == (3, len(quantitative.THRESHOLDS), 64)
    assert (f1 >= 0).all() and (f1 <= 1).all()
    assert top.shape == (64,)
    lookup = quantitative.get_latent_lookup(f1)
    assert lookup[0] == -1
    assert ((lookup[1:] >= 0) & (lookup[1:] < 64)).all()


def test_validation_ranks_probes(seg_setup, tmp_path):
    shards, _, probe_ckpt = seg_setup
    cfg = validation.Config(
        probe_ckpt=probe_ckpt, acts=_acts(shards), n_classes=3, dump_to=tmp_path
    )
    rows = validation.worker_fn(cfg)
    assert len(rows) == 2
    assert rows[0]["mean_iou"] >= rows[1]["mean_iou"]
    for row in rows:
        assert 0.0 <= row["accuracy"] <= 1.0
        assert row["val_loss"] > 0
        assert "learning_rate" in row
    assert (tmp_path / "validation.csv").exists()


def test_visuals_proposals(seg_setup, tmp_path):
    shards, sae_ckpt, _ = seg_setup
    cfg = visuals.Config(
        sae_ckpt=sae_ckpt, acts=_acts(shards), n_classes=3, top_k=3,
        dump_to=tmp_path,
    )
    proposals = visuals.worker_fn(cfg)
    dumped = json.loads((tmp_path / "proposed_latents.json").read_text())
    assert dumped == {
        k: [dict(d) for d in v] for k, v in proposals.items()
    }
    for _cls, cands in proposals.items():
        assert 1 <= len(cands) <= 3
        f1s = [c["f1"] for c in cands]
        assert f1s == sorted(f1s, reverse=True)


@pytest.fixture(scope="module")
def cls_shards(tmp_path_factory, helpers):
    train = helpers.write_shards(
        tmp_path_factory.mktemp("cls_train"), n_examples=12, layers=(1,),
        cls_token=True, max_tokens_per_shard=4096,
    )
    val = helpers.write_shards(
        tmp_path_factory.mktemp("cls_val"), n_examples=8, layers=(1,),
        cls_token=True, max_tokens_per_shard=4096,
    )
    return train, val


def test_classification_probe_grid(cls_shards, tmp_path):
    train_shards, val_shards = cls_shards
    base = cls_training.Train(
        train_shards=train_shards, val_shards=val_shards, layer=1,
        n_epochs=3, batch_size=8, ckpt_path=tmp_path / "ckpt",
    )
    cfgs, errs = cls_training.grid(
        base, {"learning_rate": [1e-3, 1e-4], "weight_decay": [1e-4]}
    )
    assert not errs and len(cfgs) == 2
    assert cfgs[0].seed != cfgs[1].seed

    accs = cls_training.main(cfgs)
    assert accs.shape == (2,)
    assert ((accs >= 0) & (accs <= 1)).all()
    report = json.loads((tmp_path / "ckpt" / "report.json").read_text())
    assert len(report) == 2
    assert "val_accuracy" in report[0]


def test_load_cls_features_shape(cls_shards):
    train_shards, _ = cls_shards
    x = cls_training.load_cls_features(train_shards, 1)
    assert x.shape == (12, 128)
    assert np.isfinite(x).all()


# ---------------------------------------------------------------------------
# classification.transforms: shared object-centric crop geometry
# ---------------------------------------------------------------------------


def test_webapp_transform_geometry():
    from PIL import Image

    from contrib.interactive_interp.classification import transforms

    for size in [(800, 600), (600, 800), (512, 512), (449, 2000)]:
        out = transforms.for_webapp(Image.new("RGB", size))
        assert out.size == (448, 448), (size, out.size)


def test_figures_transform_matches_webapp():
    """for_figures must be the webapp geometry as an array (the shared-crop
    contract that keeps patch coordinates aligned across surfaces)."""
    from PIL import Image

    from contrib.interactive_interp.classification import transforms

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (600, 800, 3), dtype=np.uint8))
    arr = transforms.for_figures(img)
    assert arr.shape == (448, 448, 3)
    np.testing.assert_array_equal(arr, np.asarray(transforms.for_webapp(img)))


def test_resize_shortest_preserves_aspect():
    from PIL import Image

    from contrib.interactive_interp.classification import transforms

    out = transforms.resize_shortest(Image.new("L", (1000, 500)))
    assert out.size == (1024, 512)


def test_classification_cli_help_lists_commands(capsys):
    from saev_tpu.utils import cli as cli_mod

    from contrib.interactive_interp.classification import __main__ as cls_main  # noqa: F401

    with pytest.raises(SystemExit):
        cli_mod.run(
            {"train": cls_main.train, "flowers": lambda c: None}, argv=["--help"]
        )
    assert "train" in capsys.readouterr().out


def test_report_std_fields():
    """Per-class change stds (reference quantitative.py:110-136)."""
    res = [
        quantitative.ClassResults(1, 10, 10, 100, 0),   # 100% target change
        quantitative.ClassResults(2, 10, 0, 100, 50),   # 0% target change
    ]
    rep = quantitative.Report(method="sae", class_results=res,
                              intervention_scale=-1.0)
    assert rep.mean_target_change == 0.5
    assert rep.target_change_std == 0.5   # std of [1.0, 0.0]
    assert rep.other_change_std == 0.25   # std of [0.0, 0.5]
    row = rep.to_csv_row()
    assert row["target_std"] == 0.5 and row["other_std"] == 0.25


def test_load_latest_prefers_step_suffix(tmp_path):
    from contrib.interactive_interp.semseg import training as semseg_training

    for name, w in [("probe_step5", 5.0), ("probe_step20", 20.0), ("other", -1.0)]:
        d = tmp_path / name
        d.mkdir()
        np.savez(d / "probes.npz", w=np.full((1, 2, 3), w), b=np.zeros((1, 3)))
    params = semseg_training.load_latest(tmp_path)
    assert params["w"][0, 0, 0] == 20.0
    with pytest.raises(FileNotFoundError):
        semseg_training.load_latest(tmp_path / "empty")
