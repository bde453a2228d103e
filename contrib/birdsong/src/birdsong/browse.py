"""Audio-gallery discovery + browser-site assembly for birdsong clips.

Capability mirror of reference contrib/birdsong/notebooks/clips.py
(has_clips/make_ckpt_dropdown :28-56 + the per-latent clip navigation): scan
runs roots for runs whose inference artifacts include per-latent clip
galleries (written by `birdsong.visuals.worker_fn`: spectrogram pngs +
time/time-freq filtered audio), and assemble the static clip-gallery HTML
(`scripts/make_html.py`) for each (run, shards) pair plus an index page.
"""

import dataclasses
import importlib.util
import logging
import pathlib

logger = logging.getLogger("birdsong.browse")


@dataclasses.dataclass(frozen=True)
class ClipRun:
    """A run with at least one browsable clip gallery."""

    run_dir: pathlib.Path
    shards: tuple[str, ...]


def shards_with_clips(run_dir: pathlib.Path) -> tuple[str, ...]:
    """Inference shard dirs under `run_dir` that have a clips/ gallery
    (reference clips.py has_clips :28-39)."""
    inference = run_dir / "inference"
    if not inference.is_dir():
        return ()
    return tuple(
        sorted(p.name for p in inference.iterdir() if (p / "clips").is_dir())
    )


def discover_runs(
    roots: list[pathlib.Path] | tuple[pathlib.Path, ...],
) -> list[ClipRun]:
    """All runs under the given roots with clip galleries; first root wins on
    duplicate run ids (reference clips.py make_ckpt_dropdown :40-56).
    Discovery pre-applies the disk.Run validity contract make_html later
    requires, so a broken run layout is skipped, not crashed on."""
    import saev_tpu.disk

    seen: dict[str, ClipRun] = {}
    for root in roots:
        root = pathlib.Path(root)
        if not root.is_dir():
            logger.info("Skipping missing runs root %s.", root)
            continue
        for run_dir in sorted(p for p in root.iterdir() if p.is_dir()):
            if run_dir.name in seen:
                continue
            shards = shards_with_clips(run_dir)
            if not shards:
                continue
            try:
                saev_tpu.disk.Run(run_dir)
            except (ValueError, FileNotFoundError) as err:
                logger.info("Skipping %s: invalid run layout (%s).", run_dir, err)
                continue
            seen[run_dir.name] = ClipRun(run_dir=run_dir, shards=shards)
    return sorted(seen.values(), key=lambda c: c.run_dir.name)


def _make_html():
    """The gallery generator from scripts/make_html.py (loaded by path — the
    scripts dir is not a package)."""
    fpath = (
        pathlib.Path(__file__).resolve().parents[2] / "scripts" / "make_html.py"
    )
    spec = importlib.util.spec_from_file_location("birdsong_make_html", fpath)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def build_browsers(
    roots: list[pathlib.Path] | tuple[pathlib.Path, ...],
    out_dir: pathlib.Path,
    *,
    embed: bool = True,
    runs: list[ClipRun] | None = None,
) -> list[pathlib.Path]:
    """One self-contained clip-gallery HTML per (run, shards) plus an
    index.html linking them all. Pass `runs` (from discover_runs) to skip a
    second discovery walk."""
    import html as html_mod

    make_html = _make_html()
    out_dir = pathlib.Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    written, index_rows = [], []
    for clip_run in discover_runs(roots) if runs is None else runs:
        for shards_name in clip_run.shards:
            out = out_dir / f"{clip_run.run_dir.name}__{shards_name}.html"
            cfg = make_html.Config(
                run=clip_run.run_dir,
                shards=pathlib.Path(shards_name),
                embed=embed,
                out=out,
            )
            written.append(make_html.make(cfg))
            index_rows.append(
                f'<li><a href="{out.name}">{html_mod.escape(clip_run.run_dir.name)}'
                f" / {html_mod.escape(shards_name)}</a></li>"
            )
    index = out_dir / "index.html"
    index.write_text(
        "<!doctype html><meta charset='utf-8'><title>birdsong galleries</title>"
        f"<h1>Clip galleries ({len(written)})</h1><ul>"
        + "".join(index_rows)
        + "</ul>"
    )
    written.append(index)
    logger.info("Wrote %d browser pages to %s.", len(written), out_dir)
    return written
