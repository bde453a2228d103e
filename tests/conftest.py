"""Shared pytest fixtures and helpers.

Forces JAX onto CPU with 8 virtual devices so pjit/shard_map multi-chip tests run
hermetically (the reference's analog is spawned-process dataloader tests; our "fake
cluster" is XLA's host-platform device-count flag — SURVEY.md §4).
"""

import os

# Must run before jax is imported anywhere.
# The image presets JAX_PLATFORMS=axon (real TPU tunnel); tests must override it.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib  # noqa: E402

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The image's site hook (PYTHONPATH=.axon_site) re-selects the axon TPU plugin even
# when JAX_PLATFORMS=cpu is in the env, so force the config directly too.
jax.config.update("jax_platforms", "cpu")

FAKE_CKPT = "hf-hub:hf-internal-testing/tiny-open-clip-model"


def tmp_shards_root(tmp_path: pathlib.Path) -> pathlib.Path:
    """Create a path of the required .../saev/shards shape."""
    root = tmp_path / "saev" / "shards"
    root.mkdir(parents=True, exist_ok=True)
    return root


def tmp_runs_root(tmp_path: pathlib.Path) -> pathlib.Path:
    """Create a path of the required .../saev/runs shape."""
    root = tmp_path / "saev" / "runs"
    root.mkdir(parents=True, exist_ok=True)
    return root


def write_shards(
    tmp_path: pathlib.Path,
    *,
    n_examples: int = 10,
    layers: tuple[int, ...] = (0, 1),
    max_tokens_per_shard: int = 128,
    cls_token: bool = True,
    batch_size: int = 4,
    seg: bool = False,
) -> pathlib.Path:
    """Generate a real shard dir by running the full extraction pipeline with the
    fake backends (FakeImg dataset + fake-clip JAX ViT). Returns the shards dir.
    """
    from saev_tpu.data import datasets, extract, fake_vit

    root = tmp_shards_root(tmp_path)
    if seg:
        data = datasets.FakeImgSeg(
            n_examples=n_examples, content_tokens_per_example=fake_vit.N_PATCHES
        )
    else:
        data = datasets.FakeImg(n_examples=n_examples)

    return extract.worker_fn(
        family="fake-clip",
        ckpt=FAKE_CKPT,
        content_tokens_per_example=fake_vit.N_PATCHES,
        cls_token=cls_token,
        d_model=fake_vit.D_MODEL,
        layers=list(layers),
        data=data,
        batch_size=batch_size,
        n_workers=2,
        max_tokens_per_shard=max_tokens_per_shard,
        shards_root=root,
        device="cpu",
    )


def write_token_labels(
    shards_dir: pathlib.Path, labels: np.ndarray
) -> pathlib.Path:
    """Write a labels.bin file into an existing shard dir."""
    from saev_tpu.data import shards as shards_mod

    md = shards_mod.Metadata.load(shards_dir)
    assert labels.shape == (md.n_examples, md.content_tokens_per_example)
    fpath = shards_dir / "labels.bin"
    mm = np.memmap(fpath, mode="w+", dtype=np.uint8, shape=labels.shape)
    mm[:] = labels.astype(np.uint8)
    mm.flush()
    del mm
    return fpath


def load_reference_module(dotted: str):
    """Import `saev.<dotted>` (e.g. "disk", "configs", "data.shards",
    "utils.scheduling") from the read-only reference checkout WITHOUT
    executing heavy package __init__s (saev/data pulls open_clip/timm, absent
    here). The real `saev` package is imported (dependency-light; parity
    tests rely on its __version__/helpers), intermediate packages are seeded
    as shell packages, and modules load from their files with the test-only
    dependency stubs on sys.path. Honors $SAEV_REFERENCE; skips when the
    checkout is absent."""
    import importlib.util
    import os
    import sys
    import types

    import pytest as _pytest

    root = pathlib.Path(os.environ.get("SAEV_REFERENCE", "/root/reference")) / "src"
    parts = dotted.split(".")
    fpath = root.joinpath("saev", *parts[:-1], f"{parts[-1]}.py")
    if not fpath.exists():
        _pytest.skip(f"reference module {dotted} not found under {root}")
    stubs = str(pathlib.Path(__file__).parent / "refstubs")
    for p in (stubs, str(root)):
        if p not in sys.path:
            sys.path.insert(0, p)

    import saev  # noqa: F401  (real package; its __init__ is light)

    def shell(pkg_name: str, pkg_path: pathlib.Path) -> None:
        if pkg_name not in sys.modules:
            mod = types.ModuleType(pkg_name)
            mod.__path__ = [str(pkg_path)]
            sys.modules[pkg_name] = mod

    def load(full: str, mod_fpath: pathlib.Path, package: str):
        if full in sys.modules:
            return sys.modules[full]
        spec = importlib.util.spec_from_file_location(full, mod_fpath)
        mod = importlib.util.module_from_spec(spec)
        mod.__package__ = package
        sys.modules[full] = mod
        spec.loader.exec_module(mod)
        return mod

    pkg = "saev"
    pkg_path = root / "saev"
    for part in parts[:-1]:
        pkg = f"{pkg}.{part}"
        pkg_path = pkg_path / part
        shell(pkg, pkg_path)

    if parts[0] == "data":
        # dinov3/shards/etc. do `from . import models, transforms` at import.
        for dep in ("models", "transforms"):
            if parts[-1] != dep:
                load(f"saev.data.{dep}", root / "saev" / "data" / f"{dep}.py", "saev.data")

    return load(f"saev.{dotted}", fpath, pkg)


def load_reference_data_module(name: str):
    """Back-compat alias: `saev.data.<name>`."""
    return load_reference_module(f"data.{name}")


def subprocess_env(**extra: str) -> dict:
    """Minimal clean environment for driver-script subprocesses that still
    propagates PYTHONPATH and the smallcov subprocess-coverage hook vars
    (scripts/smallcov.py) — without these, driver files executed via
    subprocess report 0% coverage in REGRESSIONS.md despite being tested."""
    env = {
        "PATH": "/usr/bin:/bin",
        "JAX_PLATFORMS": "cpu",
        "HOME": os.environ.get("HOME", "/root"),
    }
    for key in ("PYTHONPATH", "SMALLCOV_PREFIXES", "SMALLCOV_DUMP_DIR"):
        if os.environ.get(key):
            env[key] = os.environ[key]
    env.update(extra)
    return env


class _Helpers:
    tmp_shards_root = staticmethod(tmp_shards_root)
    tmp_runs_root = staticmethod(tmp_runs_root)
    write_shards = staticmethod(write_shards)
    write_token_labels = staticmethod(write_token_labels)
    load_reference_module = staticmethod(load_reference_module)
    load_reference_data_module = staticmethod(load_reference_data_module)
    subprocess_env = staticmethod(subprocess_env)
    fake_ckpt = FAKE_CKPT


@pytest.fixture(scope="session")
def helpers():
    return _Helpers


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: slow tests")
    config.addinivalue_line("markers", "integration: integration tests")


def pytest_addoption(parser):
    """Optional real-asset paths (mirror of reference conftest.py:11-43); tests
    that need them skip gracefully when absent."""
    parser.addoption("--shards", default=None, help="Real activation shards dir.")
    parser.addoption("--ckpt-path", default=None, help="Real sae.pt checkpoint.")
    parser.addoption("--dinov3-ckpt", default=None, help="Local DINOv3 .pth file.")
    parser.addoption("--imgfolder", default=None, help="Real ImgFolder root.")
    parser.addoption("--segfolder", default=None, help="Real ImgSegFolder root.")


def _path_fixture(name):
    @pytest.fixture(scope="session")
    def fixture(request):
        value = request.config.getoption(name)
        if value is None:
            pytest.skip(f"--{name.replace('_', '-')} not provided")
        p = pathlib.Path(value)
        if not p.exists():
            pytest.skip(f"--{name.replace('_', '-')} path does not exist: {p}")
        return p

    return fixture


real_shards = _path_fixture("shards")
real_ckpt_path = _path_fixture("ckpt_path")
real_dinov3_ckpt = _path_fixture("dinov3_ckpt")
real_imgfolder = _path_fixture("imgfolder")
real_segfolder = _path_fixture("segfolder")
