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
or `script.py args...`. Caveat: subprocesses spawned by tests are not
monitored (same as bare coverage.py without its subprocess hooks).
"""

import argparse
import json
import pathlib
import runpy
import sys
import types

REPO = pathlib.Path(__file__).resolve().parent.parent


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

    if os.getcwd() not in sys.path:
        sys.path.insert(0, os.getcwd())

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
