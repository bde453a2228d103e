"""Zero-dependency line coverage via `sys.monitoring` (PEP 669, CPython 3.12).

The image has no `coverage` package, so this is a minimal stand-in good
enough to publish the suite's line coverage in REGRESSIONS.md (the
reference's pipeline publishes the same number, reference REGRESSIONS.md).

How it works: a LINE-event callback records (filename, line) and returns
`sys.monitoring.DISABLE`, which turns that exact code location off — so each
executable line costs one callback for the whole run and the suite runs at
near-native speed. Executable-line totals come from walking compiled code
objects' `co_lines()` per file, which tracks what the optimizer kept (not
identical to coverage.py's parser-based statement count, but stable and
self-consistent).

Usage (in-process, so the monitored code is this interpreter):

    python scripts/smallcov.py --out coverage.json --include saev_tpu \
        -- -m pytest tests/ -q

Everything after `--` is handed to `python` semantics: `-m module args...`
or `script.py args...`.

Subprocess coverage: a temp `sitecustomize.py` is prepended to PYTHONPATH
and `SMALLCOV_PREFIXES`/`SMALLCOV_DUMP_DIR` are exported, so any child
interpreter that inherits them (tests launching driver scripts must pass
PYTHONPATH + SMALLCOV_* through — `conftest._Helpers.subprocess_env` does)
records its own executed lines and dumps them at exit; the parent merges
the dumps into the report. Without inheritance a child simply goes
unmeasured, as before.
"""

import argparse
import json
import pathlib
import runpy
import sys
import types

REPO = pathlib.Path(__file__).resolve().parent.parent

# Injected into child interpreters via a temp dir on PYTHONPATH (see main).
_SITECUSTOMIZE = '''
import atexit, json, os, sys, tempfile

# Chain to any sitecustomize this hook shadows (conda/venv site config):
# exec the next sitecustomize.py on sys.path under a private name, so the
# environment's own site setup still runs during coverage runs.
_here = os.path.dirname(os.path.abspath(__file__))
try:
    import importlib.util

    for _p in sys.path:
        _ap = os.path.abspath(_p or ".")
        if _ap == _here:
            continue
        _cand = os.path.join(_ap, "sitecustomize.py")
        if os.path.isfile(_cand):
            _spec = importlib.util.spec_from_file_location(
                "_smallcov_chained_sitecustomize", _cand
            )
            _mod = importlib.util.module_from_spec(_spec)
            _spec.loader.exec_module(_mod)
            break
except Exception:
    pass

_prefixes = tuple(
    p for p in os.environ.get("SMALLCOV_PREFIXES", "").split(os.pathsep) if p
)
_dump = os.environ.get("SMALLCOV_DUMP_DIR")
if _dump and _prefixes and hasattr(sys, "monitoring"):
    _executed = {}
    _mon = sys.monitoring
    _tool = _mon.COVERAGE_ID

    def _on_line(code, line):
        f = code.co_filename
        if f.startswith(_prefixes):
            _executed.setdefault(f, set()).add(line)
        return _mon.DISABLE

    try:
        _mon.use_tool_id(_tool, "smallcov-child")
        _mon.register_callback(_tool, _mon.events.LINE, _on_line)
        _mon.set_events(_tool, _mon.events.LINE)
    except Exception:
        pass
    else:
        def _dump_cov():
            try:
                fd, _p = tempfile.mkstemp(suffix=".json", dir=_dump)
                with os.fdopen(fd, "w") as fh:
                    json.dump({k: sorted(v) for k, v in _executed.items()}, fh)
            except Exception:
                pass

        atexit.register(_dump_cov)
'''


def executable_lines(fpath: pathlib.Path) -> set[int]:
    """All line numbers the compiled module can report events for."""
    try:
        code = compile(fpath.read_text(), str(fpath), "exec")
    except (SyntaxError, UnicodeDecodeError, OSError):
        return set()
    lines: set[int] = set()
    stack = [code]
    while stack:
        c = stack.pop()
        for _, _, line in c.co_lines():
            if line is not None and line > 0:
                lines.add(line)
        stack.extend(k for k in c.co_consts if isinstance(k, types.CodeType))
    return lines


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="coverage.json")
    ap.add_argument(
        "--include",
        nargs="+",
        default=["saev_tpu"],
        help="repo-relative dirs (or files) whose .py files are measured",
    )
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- -m pytest tests/ -q   (or)   -- script.py args")
    args = ap.parse_args()
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("nothing to run; pass `-- -m pytest ...`")

    roots = [(REPO / inc).resolve() for inc in args.include]
    prefixes = tuple(str(r) + ("" if r.is_file() else "/") for r in roots)

    executed: dict[str, set[int]] = {}
    mon = sys.monitoring
    tool = mon.COVERAGE_ID

    def on_line(code, line):
        fname = code.co_filename
        if fname.startswith(prefixes):
            executed.setdefault(fname, set()).add(line)
        return mon.DISABLE

    mon.use_tool_id(tool, "smallcov")
    mon.register_callback(tool, mon.events.LINE, on_line)
    mon.set_events(tool, mon.events.LINE)

    # `python -m X` puts the cwd on sys.path; runpy from this script puts
    # scripts/ there instead, so restore the normal behavior explicitly.
    import os
    import tempfile

    if os.getcwd() not in sys.path:
        sys.path.insert(0, os.getcwd())

    # Subprocess hook: children that inherit PYTHONPATH + SMALLCOV_* load the
    # sitecustomize below, self-monitor, and dump executed lines at exit.
    hook_dir = tempfile.mkdtemp(prefix="smallcov_hook_")
    dump_dir = tempfile.mkdtemp(prefix="smallcov_dump_")
    pathlib.Path(hook_dir, "sitecustomize.py").write_text(_SITECUSTOMIZE)
    os.environ["SMALLCOV_PREFIXES"] = os.pathsep.join(prefixes)
    os.environ["SMALLCOV_DUMP_DIR"] = dump_dir
    os.environ["PYTHONPATH"] = os.pathsep.join(
        [hook_dir] + ([os.environ["PYTHONPATH"]] if os.environ.get("PYTHONPATH") else [])
    )

    rc = 0
    try:
        if cmd[0] == "-m":
            sys.argv = cmd[1:]
            runpy.run_module(cmd[1], run_name="__main__", alter_sys=True)
        else:
            sys.argv = cmd
            runpy.run_path(cmd[0], run_name="__main__")
    except SystemExit as exc:
        rc = int(exc.code or 0) if isinstance(exc.code, (int, type(None))) else 1
    finally:
        mon.set_events(tool, 0)
        mon.free_tool_id(tool)

    # Merge the children's dumps, then drop both temp dirs.
    import shutil

    n_children = 0
    for dump in pathlib.Path(dump_dir).glob("*.json"):
        try:
            child = json.loads(dump.read_text())
        except (OSError, ValueError):
            continue
        n_children += 1
        for fname, lines in child.items():
            executed.setdefault(fname, set()).update(lines)
    if n_children:
        print(f"smallcov: merged {n_children} subprocess dumps", file=sys.stderr)
    shutil.rmtree(hook_dir, ignore_errors=True)
    shutil.rmtree(dump_dir, ignore_errors=True)

    # Totals over every .py under the include roots, imported or not.
    files: dict[str, dict] = {}
    covered_total = 0
    num_total = 0
    for root in roots:
        pyfiles = [root] if root.is_file() else sorted(root.rglob("*.py"))
        for fpath in pyfiles:
            stmts = executable_lines(fpath)
            if not stmts:
                continue
            hit = executed.get(str(fpath), set()) & stmts
            covered_total += len(hit)
            num_total += len(stmts)
            rel = str(fpath.relative_to(REPO))
            files[rel] = {
                "summary": {
                    "covered_lines": len(hit),
                    "num_statements": len(stmts),
                    "percent_covered": 100.0 * len(hit) / len(stmts),
                },
                "missing_lines": sorted(stmts - hit),
            }

    report = {
        "meta": {"collector": "smallcov (sys.monitoring)"},
        "files": files,
        "totals": {
            "covered_lines": covered_total,
            "num_statements": num_total,
            "percent_covered": (
                100.0 * covered_total / num_total if num_total else 0.0
            ),
        },
    }
    pathlib.Path(args.out).write_text(json.dumps(report, indent=1))
    print(
        f"smallcov: {covered_total}/{num_total} lines "
        f"({report['totals']['percent_covered']:.1f}%) -> {args.out}",
        file=sys.stderr,
    )
    return rc


if __name__ == "__main__":
    sys.exit(main())
