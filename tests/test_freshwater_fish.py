"""freshwater_fish contrib tests: TOL extraction over synthetic h5/parquet
stores and the species-labeled gallery (mirror of reference
contrib/freshwater_fish/scripts/{extract_tol,make_gallery}.py)."""

import importlib.util
import io
import pathlib
import sys

import numpy as np
import pytest

pytest.importorskip("pyarrow")
pytest.importorskip("h5py")

from conftest import _Helpers as helpers

REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(REPO / "contrib" / "trait_discovery" / "src"))


def _load(name: str):
    fpath = REPO / "contrib" / "freshwater_fish" / "scripts" / f"{name}.py"
    spec = importlib.util.spec_from_file_location(f"fish_{name}", fpath)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _png_bytes(color):
    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (16, 16), color).save(buf, format="PNG")
    return np.frombuffer(buf.getvalue(), dtype=np.uint8)


def _make_tol_store(tmp_path):
    """Synthetic TOL-200M layout: resolved taxa parquet + lookup + h5 images."""
    import h5py
    import pyarrow as pa
    import pyarrow.parquet as pq

    taxa_dir = tmp_path / "resolved_taxa" / "source=gbif"
    taxa_dir.mkdir(parents=True)
    pq.write_table(
        pa.table({
            "uuid": ["u1", "u2", "u3", "u4"],
            "order": ["Cypriniformes", "Perciformes", "Coleoptera", "Cypriniformes"],
            "family": ["Cyprinidae", "Percidae", "Carabidae", "Cyprinidae"],
            "species": ["Danio rerio", "Perca fluviatilis", "Carabus auratus", None],
        }),
        taxa_dir / "part0.parquet",
    )

    lookup_dir = tmp_path / "lookup_tables"
    lookup_dir.mkdir()
    h5_fpath = tmp_path / "images0.h5"
    pq.write_table(
        pa.table({
            "uuid": ["u1", "u2", "u3"],
            "h5_file": [str(h5_fpath)] * 3,
        }),
        lookup_dir / "lookup0.parquet",
    )

    with h5py.File(h5_fpath, "w") as fd:
        g = fd.create_group("images")
        g.create_dataset("u1", data=_png_bytes((255, 0, 0)))
        g.create_dataset("u2", data=_png_bytes((0, 255, 0)))
        g.create_dataset("u3", data=_png_bytes((0, 0, 255)))
    return tmp_path


class TestExtractTol:
    def test_order_filter(self, tmp_path):
        mod = _load("extract_tol")
        store = _make_tol_store(tmp_path)
        out = tmp_path / "out"
        n = mod.worker_fn(mod.Config(
            resolved_taxa_dpath=store / "resolved_taxa",
            lookup_tables_dpath=store / "lookup_tables",
            output_dpath=out,
            order_filter=("Cypriniformes", "Perciformes"),
            sources=("gbif",),
            n_workers=2,
        ))
        # u1 + u2 match (u3 is a beetle, u4 has a null species label).
        assert n == 2
        assert (out / "Danio_rerio" / "u1.jpg").exists()
        assert (out / "Perca_fluviatilis" / "u2.jpg").exists()
        assert not list(out.glob("Carabus*"))

        # Idempotent: existing files are skipped, nothing re-extracted.
        assert mod.worker_fn(mod.Config(
            resolved_taxa_dpath=store / "resolved_taxa",
            lookup_tables_dpath=store / "lookup_tables",
            output_dpath=out,
            order_filter=("Cypriniformes", "Perciformes"),
            sources=("gbif",),
        )) == 0

    def test_taxa_file_filter(self, tmp_path):
        mod = _load("extract_tol")
        store = _make_tol_store(tmp_path)
        taxa_csv = tmp_path / "taxa.csv"
        taxa_csv.write_text("Family,notes\nCyprinidae,freshwater\n")
        out = tmp_path / "out2"
        n = mod.worker_fn(mod.Config(
            taxa_file=taxa_csv,
            resolved_taxa_dpath=store / "resolved_taxa",
            lookup_tables_dpath=store / "lookup_tables",
            output_dpath=out,
            sources=("gbif",),
        ))
        assert n == 1  # only u1 (u4 matches the family but has no species)
        assert (out / "Danio_rerio" / "u1.jpg").exists()

    def test_label_column_family(self, tmp_path):
        mod = _load("extract_tol")
        store = _make_tol_store(tmp_path)
        out = tmp_path / "out3"
        n = mod.worker_fn(mod.Config(
            resolved_taxa_dpath=store / "resolved_taxa",
            lookup_tables_dpath=store / "lookup_tables",
            output_dpath=out,
            order_filter=("Cypriniformes",),
            label_column="family",
            sources=("gbif",),
        ))
        assert n == 1  # u1 (u4 resolves no h5 file)
        assert (out / "Cyprinidae" / "u1.jpg").exists()


def test_gallery_species_labels(tmp_path):
    """End-to-end: visuals artifacts -> species-labeled paginated gallery."""
    pytest.importorskip("pandas")
    import jax

    from saev_tpu import disk, nn
    from saev_tpu.data import Metadata, OrderedConfig, fake_vit
    from saev_tpu.framework import inference
    from saev_tpu.nn import modeling
    from tdiscovery import visuals

    mod = _load("make_gallery")

    shards_dir = helpers.write_shards(tmp_path, n_examples=8, layers=(0,))
    md = Metadata.load(shards_dir)
    runs_root = helpers.tmp_runs_root(tmp_path)
    run = disk.Run.new(
        "fishrun", train_shards_dir=shards_dir, val_shards_dir=shards_dir,
        runs_root=runs_root,
    )
    cfg = modeling.SparseAutoencoderConfig(
        d_model=fake_vit.D_MODEL, d_sae=16, activation=modeling.TopK(top_k=2)
    )
    params, state = modeling.init(cfg, jax.random.key(0))
    nn.dump(run.ckpt, cfg, params, state)
    inference.worker_fn(inference.Config(
        run=run.run_dir,
        data=OrderedConfig(shards=shards_dir, layer=0, batch_size=32),
        device="cpu",
    ))
    visuals.worker_fn(visuals.Config(
        run=run.run_dir, shards=shards_dir, top_k=2, n_latents=3, latents=(0,),
        log_freq_range=(-12.0, 2.0), log_value_range=(-12.0, 6.0),
        save_seg=False, save_distributions=False,
    ))

    # Fake dataset dir whose sorted stems define example-index -> species.
    from PIL import Image

    ds_root = tmp_path / "fishds"
    (ds_root / "images" / "validation").mkdir(parents=True)
    for i in range(md.n_examples):
        Image.new("RGB", (8, 8)).save(
            ds_root / "images" / "validation" / f"img{i:02d}.png"
        )
    (ds_root / "labels.csv").write_text(
        "stem,label\n"
        + "\n".join(f"img{i:02d},(Cyprinidae) Danio sp{i}" for i in range(md.n_examples))
    )

    out = mod.gallery(mod.Config(
        run=run.run_dir, shards=shards_dir, dataset=ds_root,
        split="validation", out=tmp_path / "gallery.html",
    ))
    html = out.read_text()
    assert "Danio sp" in html  # species captions made it in
    assert "data:image/jpeg;base64," in html
    for needle in ("sortBy", "perPage", "Feature ID", "Previous"):
        assert needle in html, needle
