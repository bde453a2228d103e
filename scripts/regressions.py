"""Convert pytest-json + coverage-json reports into REGRESSIONS.md
(capability mirror of reference scripts/regressions.py).

Usage:
    python -m pytest tests/ --json-report --json-report-file=pytest.json \
        --cov=saev_tpu --cov-report=json
    python scripts/regressions.py pytest.json coverage.json > REGRESSIONS.md
"""

import json
import pathlib
import sys


def main(pytest_json: pathlib.Path, coverage_json: pathlib.Path | None = None) -> str:
    report = json.loads(pathlib.Path(pytest_json).read_text())
    lines = ["# Regressions", ""]

    failed = [
        t["nodeid"]
        for t in report.get("tests", [])
        if t.get("outcome") in ("failed", "error")
    ]
    summary = report.get("summary", {})
    lines.append(
        f"{summary.get('passed', 0)} passed, {summary.get('failed', 0)} failed, "
        f"{summary.get('skipped', 0)} skipped."
    )
    lines.append("")
    if failed:
        lines.append("## Known-failing tests")
        lines.append("")
        lines.extend(f"- `{nodeid}`" for nodeid in failed)
        lines.append("")

    if coverage_json is not None and pathlib.Path(coverage_json).exists():
        cov = json.loads(pathlib.Path(coverage_json).read_text())
        totals = cov.get("totals", {})
        covered = totals.get("covered_lines", 0)
        total = totals.get("num_statements", 0)
        pct = totals.get("percent_covered", 0.0)
        lines.append("## Coverage")
        lines.append("")
        lines.append(f"{covered}/{total} lines ({pct:.1f}%).")
        lines.append("")

    return "\n".join(lines)


if __name__ == "__main__":
    args = [pathlib.Path(a) for a in sys.argv[1:]]
    assert args, "usage: regressions.py pytest.json [coverage.json]"
    print(main(*args))
