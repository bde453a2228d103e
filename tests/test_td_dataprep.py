"""Hermetic tests for the trait-discovery data-prep scripts: FishVista
formatting, ADE20K formatting, butterfly materialization, FishBase parsing,
and the checkpoint-push pareto selection."""

import csv
import importlib.util
import json
import pathlib
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).parent.parent
SCRIPTS = REPO / "contrib" / "trait_discovery" / "scripts"
sys.path.insert(0, str(REPO))


def _load(name: str):
    spec = importlib.util.spec_from_file_location(name, SCRIPTS / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------------------
# format_fishvista
# ---------------------------------------------------------------------------


def _fake_fishvista(root: pathlib.Path, species: list[tuple[str, str]]):
    """Images/ + segmentation_masks/images/ + per-split CSVs for the given
    (filename, 'Genus species') pairs, split round-robin."""
    from PIL import Image

    (root / "Images").mkdir(parents=True)
    (root / "segmentation_masks" / "images").mkdir(parents=True)
    splits = {"train": [], "val": [], "test": []}
    for i, (fname, sp) in enumerate(species):
        Image.new("RGB", (8, 8), (i, i, i)).save(root / "Images" / fname)
        stem = pathlib.Path(fname).stem
        Image.new("L", (8, 8), i).save(
            root / "segmentation_masks" / "images" / f"{stem}.png"
        )
        splits[["train", "val", "test"][i % 3]].append((fname, sp))
    for split, rows in splits.items():
        for kind in ("segmentation", "classification"):
            with open(root / f"{kind}_{split}.csv", "w", newline="") as fd:
                writer = csv.writer(fd)
                writer.writerow(["filename", "family", "standardized_species"])
                for fname, sp in rows:
                    writer.writerow([fname, "Testidae", sp])


SPECIES = [
    ("fish_a.jpg", "Thunnus albacares"),
    ("fish_b.jpg", "Amphiprion ocellaris"),
    ("fish_c.jpg", "Nomatchus nada"),
]


def _fishbase_csv(fpath: pathlib.Path, fv):
    cols = ["genus", "species"] + list(fv.HABITAT_COLS) + \
        list(fv.MIGRATION_COLS) + list(fv.ENV_COLS)
    rows = [
        {"genus": "thunnus", "species": "albacares",
         "pelagic-oceanic": "1.0", "oceanodromous": "1.0", "marine": "1.0"},
        {"genus": "amphiprion", "species": "ocellaris",
         "reef-associated": "1.0", "non-migratory": "1.0", "marine": "1.0"},
    ]
    with open(fpath, "w", newline="") as fd:
        writer = csv.DictWriter(fd, fieldnames=cols)
        writer.writeheader()
        for row in rows:
            writer.writerow({c: row.get(c, "") for c in cols})


def test_format_fishvista_segfolder_with_traits(tmp_path):
    fv = _load("format_fishvista")
    _fake_fishvista(tmp_path / "fv", SPECIES)
    _fishbase_csv(tmp_path / "traits.csv", fv)
    cfg = fv.Config(fv_root=tmp_path / "fv", dump_to=tmp_path / "seg",
                    fishbase_csv=tmp_path / "traits.csv", n_threads=2)
    assert fv.segfolder(cfg) == 0

    with open(tmp_path / "seg" / "labels.csv", newline="") as fd:
        rows = {r["stem"]: r for r in csv.DictReader(fd)}
    # fish_c has no FishBase record -> dropped
    assert set(rows) == {"fish_a", "fish_b"}
    assert rows["fish_a"]["habitat"] == "pelagic-oceanic"
    assert rows["fish_a"]["migration"] == "oceanodromous"
    assert rows["fish_b"]["habitat"] == "reef-associated"
    assert rows["fish_a"]["marine"] == "yes"
    assert rows["fish_a"]["freshwater"] == "no"

    copied = sorted(p.name for p in (tmp_path / "seg" / "images").rglob("*.jpg"))
    assert copied == ["fish_a.jpg", "fish_b.jpg"]
    masks = sorted(p.name for p in (tmp_path / "seg" / "annotations").rglob("*.png"))
    assert masks == ["fish_a.png", "fish_b.png"]


def test_format_fishvista_join_rate_gate(tmp_path):
    """>50% of species must match FishBase or the run aborts."""
    fv = _load("format_fishvista")
    species = [(f"f{i}.jpg", f"Unknownus sp{i}") for i in range(4)] + [
        ("fish_a.jpg", "Thunnus albacares")
    ]
    _fake_fishvista(tmp_path / "fv", species)
    _fishbase_csv(tmp_path / "traits.csv", fv)
    cfg = fv.Config(fv_root=tmp_path / "fv", dump_to=tmp_path / "seg",
                    fishbase_csv=tmp_path / "traits.csv")
    with pytest.raises(AssertionError, match="matched only"):
        fv.write_labels_csv(cfg)


def test_format_fishvista_imgfolder(tmp_path):
    fv = _load("format_fishvista")
    _fake_fishvista(tmp_path / "fv", SPECIES)
    cfg = fv.Config(fv_root=tmp_path / "fv", dump_to=tmp_path / "img",
                    n_threads=2)
    assert fv.imgfolder(cfg) == 0
    copied = sorted(str(p.relative_to(tmp_path / "img"))
                    for p in (tmp_path / "img").rglob("*.jpg"))
    assert "train/Thunnus albacares/fish_a.jpg" in copied
    assert len(copied) == 3


# ---------------------------------------------------------------------------
# format_ade20k
# ---------------------------------------------------------------------------


def _fake_ade20k(root: pathlib.Path, stems: dict[str, str]):
    from PIL import Image

    for i, stem in enumerate(stems):
        split = "training" if i % 2 == 0 else "validation"
        (root / "images" / split).mkdir(parents=True, exist_ok=True)
        (root / "annotations" / split).mkdir(parents=True, exist_ok=True)
        Image.new("RGB", (4, 4)).save(root / "images" / split / f"{stem}.jpg")
        Image.new("L", (4, 4)).save(root / "annotations" / split / f"{stem}.png")
    (root / "sceneCategories.txt").write_text(
        "".join(f"{stem} {label}\n" for stem, label in stems.items())
    )


def test_format_ade20k_in_place(tmp_path):
    ade = _load("format_ade20k")
    stems = {"ADE_train_1": "kitchen", "ADE_val_2": "beach", "ADE_train_3": "kitchen"}
    _fake_ade20k(tmp_path / "src", stems)
    cfg = ade.Config(src_root=tmp_path / "src")
    assert ade.format_ade20k(cfg) == 0
    lines = (tmp_path / "src" / "image_labels.txt").read_text().splitlines()
    assert lines == sorted(f"{s} {v}" for s, v in stems.items())


def test_format_ade20k_materialize_copy(tmp_path):
    ade = _load("format_ade20k")
    stems = {"a_1": "x", "b_2": "y"}
    _fake_ade20k(tmp_path / "src", stems)
    cfg = ade.Config(src_root=tmp_path / "src", dump_to=tmp_path / "dst",
                     link_mode="copy", n_threads=2)
    assert ade.format_ade20k(cfg) == 0
    assert (tmp_path / "dst" / "image_labels.txt").exists()
    files = sorted(p.name for p in (tmp_path / "dst").rglob("*.jpg"))
    assert files == ["a_1.jpg", "b_2.jpg"]
    assert not (tmp_path / "dst" / "images" / "training" / "a_1.jpg").is_symlink()


def test_format_ade20k_stem_mismatch(tmp_path):
    ade = _load("format_ade20k")
    _fake_ade20k(tmp_path / "src", {"only_img": "x"})
    (tmp_path / "src" / "sceneCategories.txt").write_text("other_stem x\n")
    with pytest.raises(AssertionError, match="stems"):
        ade.format_ade20k(ade.Config(src_root=tmp_path / "src"))


def test_format_ade20k_prefers_labels_csv(tmp_path):
    ade = _load("format_ade20k")
    _fake_ade20k(tmp_path / "src", {"s1": "wrong"})
    (tmp_path / "src" / "labels.csv").write_text("stem,scene\ns1,right\n")
    cfg = ade.Config(src_root=tmp_path / "src")
    assert ade.read_labels(cfg) == {"s1": "right"}


# ---------------------------------------------------------------------------
# download_butterflies.materialize (offline)
# ---------------------------------------------------------------------------


def test_butterflies_materialize(tmp_path):
    from PIL import Image

    bfly = _load("download_butterflies")
    rows = []
    for i, (ssp, view) in enumerate(
        [("lativitta", "dorsal"), ("malleti", "ventral"), ("lativitta", "dorsal")]
    ):
        rows.append({
            "stem": f"img_{i}", "subspecies": ssp, "view": view,
            "image": Image.new("RGB", (6, 6), (i, 0, 0)),
            "mask": Image.new("L", (6, 6), i),
        })
    cfg = bfly.Config(out=tmp_path / "out")
    counts = bfly.materialize(cfg, rows)
    assert counts == {"labels": 3, "written": 3, "skipped": 0}
    with open(tmp_path / "out" / "labels.csv", newline="") as fd:
        got = list(csv.DictReader(fd))
    assert got[0]["subspecies_view"] == "lativitta_dorsal"
    assert got[1]["subspecies_view"] == "malleti_ventral"
    assert (tmp_path / "out" / "images" / "training" / "img_0.jpg").exists()
    assert (tmp_path / "out" / "annotations" / "training" / "img_1.png").exists()
    # Re-run skips every existing file (resumability).
    counts = bfly.materialize(cfg, rows)
    assert counts["skipped"] == 3 and counts["written"] == 0


def test_butterflies_column_aliases(tmp_path):
    from PIL import Image

    bfly = _load("download_butterflies")
    rows = [{
        "stem": "x", "subspecies": "a", "view": "dorsal",
        "img": Image.new("RGB", (4, 4)), "annotation": Image.new("L", (4, 4)),
    }]
    counts = bfly.materialize(bfly.Config(out=tmp_path / "o"), rows)
    assert counts["written"] == 1


def test_butterflies_unknown_column():
    bfly = _load("download_butterflies")
    with pytest.raises(ValueError, match="not found"):
        bfly.find_column({"a", "b"}, "image", bfly.IMAGE_COL_ALIASES)


# ---------------------------------------------------------------------------
# scrape_fishbase parsing + species loading (offline)
# ---------------------------------------------------------------------------

FISHBASE_HTML = """
<html><head><script>var x = "pelagic nonsense";</script></head><body>
<h1>Thunnus albacares</h1>
<div>Environment: milieu / climate zone / depth range / distribution range
Marine; brackish; pelagic-oceanic; oceanodromous; depth range 1 - 250 m,
usually 1 - 100 m.</div></body></html>
"""


def test_parse_environment_traits():
    sf = _load("scrape_fishbase")
    traits = sf.parse_environment(FISHBASE_HTML)
    assert traits["marine"] == 1.0
    assert traits["brackish"] == 1.0
    assert traits["pelagic-oceanic"] == 1.0
    assert traits["oceanodromous"] == 1.0
    assert traits["freshwater"] == ""  # absent from the page text
    assert traits["min_depth_m"] == 1.0 and traits["max_depth_m"] == 250.0
    assert traits["usual_min_depth_m"] == 1.0
    assert traits["usual_max_depth_m"] == 100.0
    # script-tag text must NOT count ("pelagic nonsense" would match pelagic)
    sf2 = sf.parse_environment(
        FISHBASE_HTML.replace("pelagic-oceanic", "reef-associated")
    )
    assert sf2["pelagic"] == ""


def test_parse_environment_invalid_page():
    sf = _load("scrape_fishbase")
    page = "<html><body>This species is not in the public version of FishBase.</body></html>"
    assert sf.parse_environment(page) is None


def test_load_species_and_resume(tmp_path):
    sf = _load("scrape_fishbase")
    with open(tmp_path / "segmentation_train.csv", "w", newline="") as fd:
        writer = csv.writer(fd)
        writer.writerow(["filename", "family", "standardized_species"])
        writer.writerow(["a.jpg", "Scombridae", "Thunnus albacares"])
        writer.writerow(["b.jpg", "Scombridae", "Thunnus albacares"])  # dup
        writer.writerow(["c.jpg", "Pomacentridae", "Amphiprion ocellaris"])
        writer.writerow(["d.jpg", "X", "badformat"])
    species = sf.load_species(tmp_path)
    assert species == [
        ("Scombridae", "Thunnus", "albacares"),
        ("Pomacentridae", "Amphiprion", "ocellaris"),
    ]
    out = tmp_path / "out.csv"
    out.write_text("family,genus,species\nScombridae,thunnus,albacares\n")
    assert sf.load_existing(out) == {("thunnus", "albacares")}


def test_mirror_url():
    sf = _load("scrape_fishbase")
    worker = sf.MirrorWorker("org", 0, 1, 1)
    assert worker.url_for("thunnus", "Albacares") == (
        "https://www.fishbase.org/summary/Thunnus_albacares.html"
    )


# ---------------------------------------------------------------------------
# push_dinov3 pareto selection + staging (offline)
# ---------------------------------------------------------------------------


def test_select_pareto_frontier_and_spacing():
    pd3 = _load("push_dinov3")
    metrics = [
        pd3.RunMetrics(f"r{i}", 13, float(l0), float(mse))
        for i, (l0, mse) in enumerate([
            (8, 0.9), (16, 0.7), (16, 0.8),   # (16, 0.8) dominated
            (32, 0.5), (64, 0.4), (128, 0.35), (256, 0.3), (512, 0.28),
        ])
    ]
    selected = pd3.select_pareto(metrics, max_n=4)
    assert len(selected) == 4
    ids = [s.run_id for s in selected]
    assert ids[0] == "r0" and ids[-1] == "r7"  # endpoints kept
    assert "r2" not in ids  # dominated point never selected
    ls = [s.l0 for s in selected]
    assert ls == sorted(ls)


def test_push_stages_and_manifests(tmp_path, monkeypatch):
    pd3 = _load("push_dinov3")
    runs_root = tmp_path / "runs"
    for run_id, l0, mse in [("aaa", 16.0, 0.5), ("bbb", 64.0, 0.3)]:
        ckpt = runs_root / run_id / "checkpoint"
        ckpt.mkdir(parents=True)
        (ckpt / "sae.pt").write_bytes(b"fake-bytes-" + run_id.encode())
        (runs_root / run_id / "metrics.json").write_text(
            json.dumps({"l0": l0, "mse": mse})
        )
    run_ids = tmp_path / "ids.json"
    run_ids.write_text(json.dumps({"13": ["aaa", "bbb"]}))
    monkeypatch.setattr(pd3, "preflight", lambda sel, root: None)
    cfg = pd3.Config(runs_root=runs_root, run_ids=run_ids,
                     staging=tmp_path / "staging", dry_run=True)
    staged = pd3.push(cfg)
    assert [s.run_id for s in staged] == ["aaa", "bbb"]
    manifest = json.loads((tmp_path / "staging" / "manifest.json").read_text())
    assert manifest[0]["sha256"] == pd3.sha256_file(
        tmp_path / "staging" / manifest[0]["path"]
    )
    readme = (tmp_path / "staging" / "README.md").read_text()
    assert "| aaa | 13 | 16.0 | 0.5000 |" in readme


def test_formatted_segfolder_feeds_extraction(tmp_path):
    """The format_fishvista segfolder output must stream through the REAL
    extraction pipeline: ImgSegFolder dataset -> fake-clip ViT -> shards with
    per-patch labels.bin — data prep wired to the pipeline, not just files."""
    from saev_tpu.data import datasets, extract, fake_vit

    fv = _load("format_fishvista")
    _fake_fishvista(tmp_path / "fv", SPECIES)
    _fishbase_csv(tmp_path / "traits.csv", fv)
    seg_root = tmp_path / "seg"
    assert fv.segfolder(fv.Config(
        fv_root=tmp_path / "fv", dump_to=seg_root,
        fishbase_csv=tmp_path / "traits.csv", n_threads=2,
    )) == 0

    # Splits are round-robin; find one with a kept image.
    data_cfg = None
    for split in ("training", "validation", "test"):
        cand = datasets.ImgSegFolder(root=seg_root, split=split)
        if cand.n_examples:
            data_cfg = cand
            break
    assert data_cfg is not None, "no split kept any image"

    ds = datasets.get_dataset(data_cfg)
    sample = ds[0]
    assert "patch_labels" not in sample  # raw dataset: labels come via extract

    shards_root = tmp_path / "saev" / "shards"
    shards_root.mkdir(parents=True)
    shards_dir = extract.worker_fn(
        family="fake-clip", ckpt=fake_vit.CKPT,
        content_tokens_per_example=fake_vit.N_PATCHES,
        cls_token=True, d_model=fake_vit.D_MODEL, layers=[0],
        data=data_cfg, batch_size=2, n_workers=0,
        max_tokens_per_shard=4096, shards_root=shards_root, device="cpu",
    )
    assert (shards_dir / "labels.bin").exists()
    md_n = len(ds)
    labels = np.memmap(shards_dir / "labels.bin", mode="r", dtype=np.uint8,
                       shape=(md_n, fake_vit.N_PATCHES))
    assert labels.shape[0] == data_cfg.n_examples


# ---------------------------------------------------------------------------
# Review-fix regressions (round-4 code review findings)
# ---------------------------------------------------------------------------


def test_trait_join_is_case_insensitive(tmp_path):
    """The scraper writes lowercase keys; FishVista labels carry capitalized
    genus — the join must not miss on case (review finding)."""
    from tdiscovery import fishbase

    csv_fpath = tmp_path / "traits.csv"
    csv_fpath.write_text(
        "genus,species,habitat\nthunnus,albacares,pelagic-oceanic\n"
    )
    table = fishbase.load_trait_table(csv_fpath)
    idx = fishbase.example_traits(
        ["Scombridae_Thunnus_albacares"], table, "habitat"
    )
    assert idx[0] == fishbase.HABITATS.index("pelagic-oceanic")


def test_scrape_resume_is_case_insensitive(tmp_path):
    sf = _load("scrape_fishbase")
    with open(tmp_path / "segmentation_train.csv", "w", newline="") as fd:
        writer = csv.writer(fd)
        writer.writerow(["filename", "family", "standardized_species"])
        writer.writerow(["a.jpg", "Scombridae", "Thunnus albacares"])
    out = tmp_path / "out.csv"
    out.write_text("family,genus,species\nScombridae,thunnus,albacares\n")
    species = sf.load_species(tmp_path)
    done = sf.load_existing(out)
    todo = [
        (f, g, e) for f, g, e in species if (g.lower(), e.lower()) not in done
    ]
    assert todo == []  # already scraped -> nothing to re-fetch


def test_fishvista_species_epithet_is_second_word(tmp_path):
    """Trinomial names must key on the epithet (second word), matching the
    scraper's key (review finding)."""
    fv = _load("format_fishvista")
    _fake_fishvista(tmp_path / "fv", [("a.jpg", "Genus species subsp")])
    rows = fv._seg_rows(tmp_path / "fv")
    assert rows[0]["species"] == "species"


def test_butterflies_labels_merge_across_splits(tmp_path):
    from PIL import Image

    bfly = _load("download_butterflies")

    def rows(stems, ssp):
        return [{
            "stem": s, "subspecies": ssp, "view": "dorsal",
            "image": Image.new("RGB", (4, 4)), "mask": Image.new("L", (4, 4)),
        } for s in stems]

    bfly.materialize(
        bfly.Config(out=tmp_path / "o", target_split="training"),
        rows(["t1", "t2"], "lativitta"),
    )
    bfly.materialize(
        bfly.Config(out=tmp_path / "o", target_split="validation"),
        rows(["v1"], "malleti"),
    )
    with open(tmp_path / "o" / "labels.csv", newline="") as fd:
        got = {r["stem"]: r for r in csv.DictReader(fd)}
    assert set(got) == {"t1", "t2", "v1"}  # training rows survived
    assert got["v1"]["subspecies_view"] == "malleti_dorsal"


def test_push_reads_flat_tracker_summary(tmp_path):
    pd3 = _load("push_dinov3")
    tracker = tmp_path / ".wandb" / "saev" / "abc"
    tracker.mkdir(parents=True)
    (tracker / "summary.json").write_text(
        json.dumps({"eval/l0": 32.0, "eval/mse": 0.5, "loss/mse": 0.6})
    )
    cfg = pd3.Config(runs_root=tmp_path / "runs",
                     tracker_root=tmp_path / ".wandb")
    summary = pd3._eval_summary(cfg, "abc")
    assert summary == {"l0": 32.0, "mse": 0.5}


def test_probe1d_cli_rejects_empty_sweep(tmp_path):
    from tdiscovery import probe1d

    bad = tmp_path / "broken.py"
    bad.write_text("this is not python (")
    with pytest.raises(SystemExit) as exc:
        probe1d.cli(probe1d.Config(), sweep=bad)
    assert exc.value.code == 1
