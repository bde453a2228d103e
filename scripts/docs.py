"""Generate markdown API docs for the saev_tpu package (capability mirror of
reference scripts/docs.py, which builds a pdoc site; this uses only the stdlib
so the docs build anywhere the package imports).

Walks every module under saev_tpu/, collects public classes/functions with
their signatures and docstrings, and writes one markdown file per module under
docs/api/ plus an index.

Usage:
    python scripts/docs.py [--out docs/api]
"""

import argparse
import dataclasses
import importlib
import inspect
import pathlib
import pkgutil
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def iter_modules(pkg_name: str = "saev_tpu"):
    pkg = importlib.import_module(pkg_name)
    yield pkg_name, pkg
    for info in pkgutil.walk_packages(pkg.__path__, prefix=pkg_name + "."):
        if "._" in info.name or info.name.rsplit(".", 1)[-1].startswith("_"):
            continue
        try:
            yield info.name, importlib.import_module(info.name)
        except Exception as err:  # optional deps may be absent
            print(f"skip {info.name}: {err}", file=sys.stderr)


def doc_symbol(name: str, obj) -> list[str]:
    lines = []
    try:
        sig = str(inspect.signature(obj))
    except (ValueError, TypeError):
        sig = ""
    kind = "class" if inspect.isclass(obj) else "def"
    lines.append(f"### `{kind} {name}{sig}`\n")
    doc = inspect.getdoc(obj)
    if doc:
        lines.append(doc + "\n")
    if inspect.isclass(obj) and dataclasses.is_dataclass(obj):
        lines.append("| field | type | default |")
        lines.append("|---|---|---|")
        for f in dataclasses.fields(obj):
            default = (
                "—" if f.default is dataclasses.MISSING
                and f.default_factory is dataclasses.MISSING
                else repr(f.default) if f.default is not dataclasses.MISSING
                else "(factory)"
            )
            tname = getattr(f.type, "__name__", str(f.type))
            lines.append(f"| `{f.name}` | `{tname}` | `{default}` |")
        lines.append("")
    return lines


def doc_module(mod_name: str, mod) -> str:
    lines = [f"# `{mod_name}`\n"]
    if mod.__doc__:
        lines.append(inspect.cleandoc(mod.__doc__) + "\n")
    public = getattr(mod, "__all__", None)
    members = inspect.getmembers(mod)
    for name, obj in members:
        if name.startswith("_"):
            continue
        if public is not None and name not in public:
            continue
        if not (inspect.isclass(obj) or inspect.isfunction(obj)):
            continue
        if getattr(obj, "__module__", None) != mod_name:
            continue  # re-exports documented where they live
        lines.extend(doc_symbol(name, obj))
    return "\n".join(lines) + "\n"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=pathlib.Path, default=pathlib.Path("docs/api"))
    args = parser.parse_args()
    args.out.mkdir(parents=True, exist_ok=True)

    index = ["# saev_tpu API reference\n"]
    for mod_name, mod in iter_modules():
        text = doc_module(mod_name, mod)
        fname = mod_name.replace(".", "_") + ".md"
        (args.out / fname).write_text(text)
        summary = (inspect.cleandoc(mod.__doc__).splitlines()[0] if mod.__doc__ else "")
        index.append(f"- [`{mod_name}`]({fname}) — {summary}")
    (args.out / "index.md").write_text("\n".join(index) + "\n")
    print(f"Wrote API docs to {args.out}")


if __name__ == "__main__":
    main()
