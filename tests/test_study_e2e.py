"""End-to-end study test: the 003_auxk protocol on the REAL pipeline.

Train a miniature AuxK-vs-NoAux sweep through framework.train.worker_fn (fake
shards, tiny shapes), then drive the analysis layer over the ACTUAL run dirs
and tracker files it wrote — `audit_analysis.load_audit_frames` →
`ablations.completeness` / `dead_units` / `variant_effect` — and assert the
tables contain the trained runs. This pins the training→tracker→analysis
wiring the notebooks rely on (the reference's equivalent chain runs through
the wandb API)."""

import dataclasses
import pathlib
import sys

import pytest

REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(
    0, str(REPO / "contrib" / "trait_discovery" / "src")
)

from conftest import _Helpers as helpers  # noqa: E402


@pytest.fixture(scope="module")
def trained_study(tmp_path_factory):
    import os

    tmp_path = tmp_path_factory.mktemp("study")
    cwd = os.getcwd()
    os.chdir(tmp_path)  # the offline tracker writes to ./.wandb
    try:
        from saev_tpu.data import ShuffledConfig
        from saev_tpu.framework import train as ftrain
        from saev_tpu.nn import modeling

        shards_dir = helpers.write_shards(tmp_path, n_examples=24, layers=(0,))
        runs_root = helpers.tmp_runs_root(tmp_path)
        data = ShuffledConfig(
            shards=shards_dir, layer=0, batch_size=32, min_buffer_fill=0.1
        )
        base = ftrain.Config(
            train_data=data, val_data=dataclasses.replace(data),
            n_train=160, n_val=64, runs_root=runs_root, device="cpu",
            log_every=2, track=False,
        )
        cfgs = []
        for aux in (modeling.AuxK(), modeling.NoAux()):
            for lr in (1e-3, 4e-4):
                sae = modeling.SparseAutoencoderConfig(
                    d_model=128, d_sae=32,
                    activation=modeling.TopK(top_k=4, aux=aux),
                )
                cfgs.append(dataclasses.replace(base, sae=sae, lr=lr))
        run_ids = ftrain.worker_fn(cfgs)
        assert len(run_ids) == 4
        return tmp_path, runs_root, run_ids
    finally:
        os.chdir(cwd)


def test_tracker_summary_carries_eval_metrics(trained_study):
    """The wiring this file exists for: eval metrics land in summary.json."""
    import json

    tmp_path, _, run_ids = trained_study
    for rid in run_ids:
        summary_fpath = tmp_path / ".wandb" / "saev" / rid / "summary.json"
        assert summary_fpath.exists(), f"no tracker summary for {rid}"
        summary = json.loads(summary_fpath.read_text())
        assert "eval/l0" in summary, sorted(summary)[:10]
        assert "eval/normalized_mse" in summary
        assert 0 < summary["eval/l0"] <= 4.0  # TopK(4)


def test_audit_frames_from_real_runs(trained_study):
    from tdiscovery import ablations, audit_analysis

    tmp_path, runs_root, run_ids = trained_study
    run_dirs = [runs_root / rid for rid in run_ids]
    sae_df, _ = audit_analysis.load_audit_frames(
        run_dirs, tracker_root=tmp_path / ".wandb"
    )
    assert sorted(sae_df["run_id"]) == sorted(run_ids)
    assert "summary/eval/l0" in sae_df.columns
    assert sae_df["config/sae/d_sae"].eq(32).all()
    aux_keys = set(sae_df["config/sae/activation/aux/key"])
    assert aux_keys == {"auxk", "no-aux"}

    # The ablations battery runs on the real frame and keeps both variants.
    comp = ablations.completeness(sae_df, expected=2)
    assert len(comp) == 2 and all(r["done"] for r in comp)

    dead = ablations.dead_units(sae_df, pareto_only=False)
    assert len(dead) == 2
    for row in dead:
        assert 0.0 <= row["eval_mean"] <= 100.0

    effects = ablations.variant_effect(
        sae_df[sae_df["summary/eval/normalized_mse"].notna()],
        baseline="no-aux",
    )
    assert effects and effects[0]["variant"] == "auxk"
    assert effects[0]["n_pairs"] == 1


NOTEBOOKS = REPO / "contrib" / "trait_discovery" / "notebooks"


@pytest.mark.parametrize("driver", ["005_butterflies.py", "007_cambridge_sae.py",
                                    "009_pe_core.py"])
def test_study_drivers_run_on_real_runs(trained_study, tmp_path, driver):
    """The study driver notebooks execute end-to-end against runs the real
    pipeline trained (no mocks): frames assemble, figures save."""
    import os
    import subprocess
    import sys as _sys

    study_tmp, runs_root, run_ids = trained_study
    out = tmp_path / "figs"
    env = {
        "TD_RUNS_ROOT": str(runs_root),
        "TD_TRACKER": str(study_tmp / ".wandb"),
        "TD_OUT": str(out),
        **helpers.subprocess_env(),
    }
    proc = subprocess.run(
        [_sys.executable, str(NOTEBOOKS / driver)],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert f"{len(run_ids)} runs" in proc.stdout
    assert list(out.glob("*.pdf")), "driver saved no figures"


def test_auxk_ablation_driver_runs(trained_study, tmp_path):
    """The 003_auxk ablation driver runs the full analysis battery on the
    real AuxK-vs-NoAux study the fixture trained."""
    import os
    import subprocess
    import sys as _sys

    study_tmp, runs_root, run_ids = trained_study
    env = {
        "AUXK_RUNS": str(runs_root),
        "AUXK_TRACKER": str(study_tmp / ".wandb"),
        "AUXK_EXPECTED": "2",
        **helpers.subprocess_env(),
    }
    proc = subprocess.run(
        [_sys.executable, str(NOTEBOOKS / "003_auxk.py")],
        capture_output=True, text=True, env=env, timeout=600,
        cwd=tmp_path,  # the driver saves auxk_pareto_grid.png into CWD
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "auxk" in proc.stdout and "no-aux" in proc.stdout
    assert (tmp_path / "auxk_pareto_grid.png").exists()


def test_actfn_driver_runs(trained_study, tmp_path):
    """The 001_actfn pareto driver groups the real study's tracker runs by
    activation function and prints frontiers."""
    import os
    import subprocess
    import sys as _sys

    study_tmp, _, run_ids = trained_study
    env = {
        "SAEV_TRACKER": str(study_tmp / ".wandb" / "saev"),
        **helpers.subprocess_env(),
    }
    proc = subprocess.run(
        [_sys.executable, str(NOTEBOOKS / "001_actfn.py")],
        capture_output=True, text=True, env=env, timeout=600, cwd=tmp_path,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert f"{len(run_ids)} runs loaded" in proc.stdout
    assert "top-k(k=4)" in proc.stdout
    assert "frontier" in proc.stdout


def test_ablations_driver_runs(trained_study, tmp_path):
    """The 002_ablations variant driver groups the real study's runs by
    optimizer and AuxK variant."""
    import os
    import subprocess
    import sys as _sys

    study_tmp, _, run_ids = trained_study
    env = {
        "SAEV_TRACKER": str(study_tmp / ".wandb" / "saev"),
        **helpers.subprocess_env(),
    }
    proc = subprocess.run(
        [_sys.executable, str(NOTEBOOKS / "002_ablations.py")],
        capture_output=True, text=True, env=env, timeout=600, cwd=tmp_path,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert f"{len(run_ids)} runs loaded" in proc.stdout
    assert "auxk" in proc.stdout and "no-aux" in proc.stdout
