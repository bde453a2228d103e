"""Smoke-run the last notebook drivers (fourth batch): 004_fishbase trait
scoring, 004_fishbase_cls classification explorer, 006_proposal_audit
propose→audit pipeline. All three need shards whose images carry REAL
multi-class labels (the drivers call classification.load_image_labels in a
subprocess, where the engine tests' monkeypatch can't reach), so the shared
fixture extracts an ImgSegFolder dataset with a species/habitat labels.csv
through the full fake-clip pipeline.
"""

import json
import pathlib
import subprocess
import sys

import numpy as np
import pytest

from conftest import _Helpers as helpers

REPO = pathlib.Path(__file__).parent.parent
TD_NOTEBOOKS = REPO / "contrib" / "trait_discovery" / "notebooks"

sys.path.insert(0, str(REPO / "contrib" / "trait_discovery" / "src"))

SPECIES = ("Aidae_Gena_one", "Bidae_Genb_two")
HABITATS = ("pelagic-oceanic", "reef-associated")


def _run(script: pathlib.Path, env: dict, cwd: pathlib.Path, timeout=280):
    return subprocess.run(
        [sys.executable, str(script)],
        capture_output=True, text=True,
        env=helpers.subprocess_env(**env), cwd=cwd, timeout=timeout,
    )


@pytest.fixture(scope="module")
def seg_study(tmp_path_factory):
    """ImgSegFolder dataset (species + habitat labels) -> fake-clip seg
    shards -> SAE run with inference artifacts."""
    import jax
    from PIL import Image

    from saev_tpu import disk, nn
    from saev_tpu.data import OrderedConfig, datasets, extract, fake_vit
    from saev_tpu.framework import inference
    from saev_tpu.nn import modeling

    tmp = tmp_path_factory.mktemp("seg_study")
    root = tmp / "fishds"
    (root / "images" / "training").mkdir(parents=True)
    (root / "annotations" / "training").mkdir(parents=True)
    rng = np.random.default_rng(0)
    rows = ["stem,species,habitat"]
    n = 12
    for i in range(n):
        img = Image.fromarray(
            rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8), "RGB"
        )
        img.save(root / "images" / "training" / f"img{i}.png")
        mask = Image.fromarray(
            rng.integers(0, 3, size=(32, 32), dtype=np.uint8), "L"
        )
        mask.save(root / "annotations" / "training" / f"img{i}.png")
        rows.append(f"img{i},{SPECIES[i % 2]},{HABITATS[i % 2]}")
    (root / "labels.csv").write_text("\n".join(rows) + "\n")

    data_cfg = datasets.ImgSegFolder(root=root, split="training")
    shards_dir = extract.worker_fn(
        family="fake-clip", ckpt=helpers.fake_ckpt,
        content_tokens_per_example=fake_vit.N_PATCHES, cls_token=True,
        d_model=fake_vit.D_MODEL, layers=[0], data=data_cfg,
        shards_root=helpers.tmp_shards_root(tmp), batch_size=4, n_workers=0,
        max_tokens_per_shard=fake_vit.N_PATCHES * 64, device="cpu",
    )
    runs_root = helpers.tmp_runs_root(tmp)
    run = disk.Run.new(
        "fishrun", train_shards_dir=shards_dir, val_shards_dir=shards_dir,
        runs_root=runs_root,
    )
    cfg = modeling.SparseAutoencoderConfig(
        d_model=fake_vit.D_MODEL, d_sae=16, activation=modeling.TopK(top_k=3)
    )
    params, state = modeling.init(cfg, jax.random.key(0))
    nn.dump(run.ckpt, cfg, params, state)
    # Train-config sidecar (the audit/analysis layers read run.config).
    (run.run_dir / "checkpoint" / "config.json").write_text(json.dumps({
        "train_data": {"shards": str(shards_dir), "layer": 0},
        "val_data": {"shards": str(shards_dir), "layer": 0},
        "sae": {"d_model": fake_vit.D_MODEL, "d_sae": 16,
                "activation": {"key": "top-k", "top_k": 3}},
        "objective": {"n_prefixes": 1},
        "lr": 1e-3,
    }))
    inference.worker_fn(inference.Config(
        run=run.run_dir,
        data=OrderedConfig(shards=shards_dir, layer=0, batch_size=32),
        device="cpu",
    ))
    return tmp, shards_dir, run, runs_root


def test_004_fishbase_driver(seg_study, tmp_path):
    tmp, shards_dir, run, _ = seg_study
    traits = tmp_path / "traits.csv"
    traits.write_text(
        "genus,species,habitat\n"
        "Gena,one,pelagic-oceanic\n"
        "Genb,two,reef-associated\n"
    )
    proc = _run(
        TD_NOTEBOOKS / "004_fishbase.py",
        {"FISHBASE_SHARDS": str(shards_dir), "FISHBASE_RUN": str(run.run_dir),
         "FISHBASE_TRAITS": str(traits)},
        tmp_path,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "pelagic-oceanic" in proc.stdout and "reef-associated" in proc.stdout


def test_006_proposal_audit_driver(seg_study, tmp_path):
    """Full propose -> audit -> tables -> hypothesis battery, with real
    classifier heads trained in the subprocess on the habitat labels."""
    _, shards_dir, run, _ = seg_study
    out = tmp_path / "figs006"
    proc = _run(
        TD_NOTEBOOKS / "006_proposal_audit.py",
        {"TD_RUN": str(run.run_dir), "TD_TRAIN_SHARDS": str(shards_dir),
         "TD_TEST_SHARDS": str(shards_dir), "TD_SOURCE_COL": "habitat",
         "TD_OUT": str(out)},
        tmp_path, timeout=560,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert (run.run_dir / "inference" / shards_dir.name /
            "audit_results.json").exists()
    assert "h1" in proc.stdout or "proposal_audit" in proc.stdout


def test_004_fishbase_cls_driver(seg_study, tmp_path):
    from tdiscovery import classification as cls_mod

    _, shards_dir, run, runs_root = seg_study
    task = cls_mod.LabelGrouping(name="species_task", source_col="species")
    for head in (cls_mod.SparseLinear(C=1.0), cls_mod.DecisionTree(max_depth=3)):
        cls_mod.train_worker_fn(cls_mod.TrainConfig(
            run=run.run_dir, train_shards=shards_dir, test_shards=shards_dir,
            task=task, cls=head,
        ))
        cls_mod.eval_worker_fn(cls_mod.EvalConfig(
            run=run.run_dir, test_shards=shards_dir, task=task, cls=head,
        ))
    proc = _run(
        TD_NOTEBOOKS / "004_fishbase_cls.py",
        {"TD_RUNS_ROOT": str(runs_root)},
        tmp_path,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "species_task" in proc.stdout
    assert "Best run for" in proc.stdout
