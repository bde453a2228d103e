"""Assemble the deployable docs+demos site.

Capability mirror of reference `scripts/deploy.py` (copies built web apps into
docs/demos/ for publishing). Ours additionally regenerates the API docs and
copies the static web demos (src/web/*) so `docs/` is a complete publishable
site after one command.

Usage:
    python scripts/deploy.py [--skip-api]
"""

import argparse
import pathlib
import shutil
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent

STEPS = [
    ("src/web/classification", "docs/demos/classification"),
    ("src/web/semseg", "docs/demos/semseg"),
    ("src/web/comparison", "docs/demos/comparison"),
]


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--skip-api", action="store_true", help="Skip regenerating docs/api."
    )
    args = parser.parse_args()

    if not args.skip_api:
        subprocess.run(
            [sys.executable, str(ROOT / "scripts" / "docs.py")], check=True, cwd=ROOT
        )

    for src, dst in STEPS:
        src_p = ROOT / src
        dst_p = ROOT / dst
        if not src_p.exists():
            print(f"skip {src} (missing)")
            continue
        dst_p.parent.mkdir(parents=True, exist_ok=True)
        if dst_p.exists():
            shutil.rmtree(dst_p)
        shutil.copytree(src_p, dst_p)
        print(f"{src} -> {dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
