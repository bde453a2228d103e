"""Feature browser: static HTML gallery over precomputed latent visuals.

Capability mirror of reference `src/saev/interactive/features.py` (marimo
notebook, 686 LoC): browse per-latent top-k image grids, sorted by firing
frequency, mean value, or latent id.

Usage:
    python -m saev_tpu.interactive.features --run runs/<id> --shards <dir>
"""

import base64
import dataclasses
import html
import io
import logging
import pathlib

logger = logging.getLogger("interactive.features")


@dataclasses.dataclass(frozen=True)
class Config:
    run: pathlib.Path = pathlib.Path("./runs/abcdefg")
    """Run directory."""
    shards: pathlib.Path = pathlib.Path("./shards/abcdef01")
    """Shards dir whose inference artifacts to browse."""
    sort_by: str = "log10_freq"
    """One of: latent, log10_freq, log10_value."""
    descending: bool = True
    """Sort order."""
    n_features: int = 100
    """Max features to include."""
    max_imgs_per_feature: int = 8
    """Images per feature row."""
    embed_images: bool = True
    """Inline images as base64 (single self-contained file)."""
    out: pathlib.Path | None = None
    """Output HTML path (defaults to <inference>/features.html)."""


def _img_tag(fpath: pathlib.Path, embed: bool) -> str:
    if embed:
        data = base64.b64encode(fpath.read_bytes()).decode()
        return f'<img src="data:image/png;base64,{data}" loading="lazy">'
    return f'<img src="{html.escape(str(fpath))}" loading="lazy">'


def generate(cfg: Config) -> pathlib.Path:
    import pandas as pd

    from .. import disk

    run = disk.Run(cfg.run)
    art = run.inference / cfg.shards.name
    var = pd.read_parquet(art / "var.parquet")
    img_root = art / "images"
    assert img_root.exists(), f"No images at {img_root}; run tdiscovery.visuals first."

    have_imgs = {int(p.name) for p in img_root.iterdir() if p.name.isdigit()}
    var = var[var["feature"].isin(have_imgs)]
    if cfg.sort_by != "latent":
        var = var.sort_values(cfg.sort_by, ascending=not cfg.descending)
    var = var.head(cfg.n_features)

    rows = []
    for _, row in var.iterrows():
        f = int(row["feature"])
        imgs = sorted((img_root / str(f)).glob("*.png"))[: cfg.max_imgs_per_feature]
        img_html = "".join(_img_tag(p, cfg.embed_images) for p in imgs)
        rows.append(
            f"<tr><td class=m>#{f}</td>"
            f"<td class=m>{row['log10_freq']:.2f}</td>"
            f"<td class=m>{row['log10_value']:.2f}</td>"
            f"<td class=imgs>{img_html}</td></tr>"
        )

    doc = f"""<!doctype html><meta charset="utf-8">
<title>saev features — {html.escape(run.run_id)}</title>
<style>
 body {{ font-family: system-ui, sans-serif; margin: 1rem; }}
 table {{ border-collapse: collapse; width: 100%; }}
 td, th {{ border-bottom: 1px solid #ddd; padding: 4px 8px; vertical-align: top; }}
 td.m {{ font-variant-numeric: tabular-nums; white-space: nowrap; }}
 td.imgs img {{ height: 96px; margin: 2px; image-rendering: pixelated; }}
</style>
<h1>Latent features — run {html.escape(run.run_id)}</h1>
<p>{len(rows)} features, sorted by {html.escape(cfg.sort_by)}
({"desc" if cfg.descending else "asc"}).</p>
<table><tr><th>latent</th><th>log10 freq</th><th>log10 value</th>
<th>top activating examples</th></tr>
{"".join(rows)}
</table>"""

    out = cfg.out or (art / "features.html")
    out.write_text(doc)
    logger.info("Wrote %d features to '%s'.", len(rows), out)
    return out


def cli(cfg: Config) -> None:
    logging.basicConfig(level=logging.INFO)
    generate(cfg)


if __name__ == "__main__":
    from ..utils import cli as cli_mod

    cli_mod.run({"features": cli})
