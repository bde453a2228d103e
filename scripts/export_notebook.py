"""Export examples/inference.py to examples/inference.ipynb (Jupyter).

Capability mirror of reference `scripts/export_notebook.py` (marimo → ipynb
export with a pip-install cell pinned to the current commit and a Colab
badge). Ours has no marimo dependency: an .ipynb file is plain JSON, so the
exporter builds it directly from the Python source.

Cell splitting: if the source contains `# %%` percent-format markers they
define the cells (`# %% [markdown]` for prose). Otherwise the module is split
structurally: module docstring → markdown cell, the import block → one cell,
then each top-level class/function/statement group → its own cell.

Usage:
    python scripts/export_notebook.py [src] [-o dst]
"""

import argparse
import ast
import json
import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
REPO = "saev-tpu"


def get_commit_hash() -> str:
    result = subprocess.run(
        ["git", "rev-parse", "HEAD"], capture_output=True, text=True, cwd=ROOT
    )
    if result.returncode != 0:
        return "main"
    return result.stdout.strip()


def md_cell(text: str) -> dict:
    return {
        "cell_type": "markdown",
        "metadata": {},
        "source": text.splitlines(keepends=True),
    }


def code_cell(src: str) -> dict:
    return {
        "cell_type": "code",
        "execution_count": None,
        "metadata": {},
        "outputs": [],
        "source": src.splitlines(keepends=True),
    }


def split_percent(source: str) -> list[dict]:
    """Split a `# %%` percent-format script into cells."""
    cells: list[dict] = []
    chunk: list[str] = []
    kind = "code"

    def flush():
        body = "\n".join(chunk).strip("\n")
        if not body:
            return
        if kind == "markdown":
            # Strip exactly one leading comment marker ("# " or "#").
            text = "\n".join(
                line[2:] if line.startswith("# ") else line.removeprefix("#")
                for line in body.splitlines()
            )
            cells.append(md_cell(text))
        else:
            cells.append(code_cell(body))

    for line in source.splitlines():
        if line.startswith("# %%"):
            flush()
            chunk = []
            kind = "markdown" if "[markdown]" in line else "code"
        else:
            chunk.append(line)
    flush()
    return cells


def split_structural(source: str) -> list[dict]:
    """Split a plain module into cells: docstring, imports, then one cell per
    top-level definition or statement group."""
    tree = ast.parse(source)
    lines = source.splitlines()
    cells: list[dict] = []
    body = list(tree.body)

    if body and isinstance(body[0], ast.Expr) and isinstance(
        body[0].value, ast.Constant
    ) and isinstance(body[0].value.value, str):
        cells.append(md_cell(body[0].value.value.strip()))
        body = body[1:]

    groups: list[list[ast.stmt]] = []
    for node in body:
        is_import = isinstance(node, (ast.Import, ast.ImportFrom))
        if groups and is_import and isinstance(
            groups[-1][-1], (ast.Import, ast.ImportFrom)
        ):
            groups[-1].append(node)
        elif groups and not is_import and not isinstance(
            node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
        ) and not isinstance(
            groups[-1][-1],
            (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef, ast.Import, ast.ImportFrom),
        ):
            groups[-1].append(node)
        else:
            groups.append([node])

    for group in groups:
        start = group[0].lineno - 1
        # include decorators
        deco = getattr(group[0], "decorator_list", [])
        if deco:
            start = min(d.lineno for d in deco) - 1
        end = group[-1].end_lineno
        cells.append(code_cell("\n".join(lines[start:end])))
    return cells


def export(src: pathlib.Path, dst: pathlib.Path) -> None:
    source = src.read_text()
    commit = get_commit_hash()

    try:
        rel = dst.relative_to(ROOT)
    except ValueError:
        rel = dst.name
    badge = md_cell(
        f"[![Open In Colab](https://colab.research.google.com/assets/colab-badge.svg)]"
        f"(https://colab.research.google.com/github/{REPO}/blob/{commit}/{rel})"
    )
    install = code_cell(
        f"# Install {REPO} pinned to the commit this notebook was exported from.\n"
        f"%pip install git+https://github.com/{REPO}.git@{commit}"
    )

    if "# %%" in source:
        cells = split_percent(source)
    else:
        cells = split_structural(source)

    nb = {
        "cells": [badge, install, *cells],
        "metadata": {
            "kernelspec": {
                "display_name": "Python 3",
                "language": "python",
                "name": "python3",
            },
            "language_info": {"name": "python", "version": "3.12"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }
    dst.write_text(json.dumps(nb, indent=1))
    print(f"Exported {src} -> {dst} ({len(nb['cells'])} cells, commit {commit[:8]})")


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "src", nargs="?", default=ROOT / "examples" / "inference.py", type=pathlib.Path
    )
    parser.add_argument("-o", "--out", default=None, type=pathlib.Path)
    args = parser.parse_args()
    dst = args.out or args.src.with_suffix(".ipynb")
    export(args.src, dst)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
