"""Static HTML browser over birdsong latent clips (capability mirror of
reference contrib/birdsong/scripts/make_html.py): one page per run linking
spectrograms + audio players per latent.

Usage:
    python contrib/birdsong/scripts/make_html.py make --run runs/<id> --shards <dir>
"""

import dataclasses
import html
import logging
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[3]))

logger = logging.getLogger("birdsong.html")


@dataclasses.dataclass(frozen=True)
class Config:
    run: pathlib.Path = pathlib.Path("./runs/abcdefg")
    shards: pathlib.Path = pathlib.Path("./shards/abcdef01")
    out: pathlib.Path | None = None


def make(cfg: Config) -> pathlib.Path:
    import saev_tpu.disk

    run = saev_tpu.disk.Run(cfg.run)
    clips_root = run.inference / cfg.shards.name / "clips"
    assert clips_root.exists(), f"No clips at {clips_root}; run birdsong.visuals."

    sections = []
    for latent_dir in sorted(clips_root.iterdir(), key=lambda p: int(p.name)):
        rows = []
        specs = sorted(latent_dir.glob("*_sae_spectrogram.png"))
        for spec in specs:
            j = spec.name.split("_")[0]
            cells = [f'<img src="clips/{latent_dir.name}/{spec.name}">']
            for kind in ("time_clip", "time_freq_clip"):
                wav = latent_dir / f"{j}_{kind}.wav"
                if wav.exists():
                    cells.append(
                        f'<audio controls src="clips/{latent_dir.name}/{wav.name}">'
                        "</audio>"
                    )
            rows.append("<div class=clip>" + "".join(cells) + "</div>")
        sections.append(
            f"<section><h2>Latent {html.escape(latent_dir.name)}</h2>"
            + "".join(rows)
            + "</section>"
        )

    doc = f"""<!doctype html><meta charset="utf-8"><title>birdsong latents</title>
<style>body{{font-family:system-ui;margin:1rem}}img{{image-rendering:pixelated;
height:128px;margin-right:8px}}.clip{{margin:6px 0;display:flex;align-items:center;
gap:8px}}</style>
<h1>Bird-MAE SAE latents — {html.escape(run.run_id)}</h1>
{"".join(sections)}"""
    out = cfg.out or (run.inference / cfg.shards.name / "birdsong.html")
    out.write_text(doc)
    logger.info("Wrote %s (%d latents).", out, len(sections))
    return out


if __name__ == "__main__":
    from saev_tpu.utils import cli as cli_mod

    logging.basicConfig(level=logging.INFO)
    cli_mod.run({"make": make})
