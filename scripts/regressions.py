"""Convert pytest reports into REGRESSIONS.md
(capability mirror of reference scripts/regressions.py).

Accepts pytest-json-report JSON or built-in junit XML:

    python -m pytest tests/ --junitxml=pytest.xml
    python scripts/regressions.py pytest.xml [coverage.json] > REGRESSIONS.md
"""

import json
import pathlib
import sys


def _parse_junit(fpath: pathlib.Path) -> tuple[dict, list[str]]:
    import xml.etree.ElementTree as ET

    root = ET.parse(fpath).getroot()
    suite = root if root.tag == "testsuite" else root.find("testsuite")
    n_tests = int(suite.get("tests", 0))
    n_failed = int(suite.get("failures", 0)) + int(suite.get("errors", 0))
    n_skipped = int(suite.get("skipped", 0))
    failed = [
        f"{tc.get('classname')}::{tc.get('name')}"
        for tc in suite.iter("testcase")
        if tc.find("failure") is not None or tc.find("error") is not None
    ]
    summary = {
        "passed": n_tests - n_failed - n_skipped,
        "failed": n_failed,
        "skipped": n_skipped,
    }
    return summary, failed


def main(pytest_report: pathlib.Path, coverage_json: pathlib.Path | None = None) -> str:
    pytest_report = pathlib.Path(pytest_report)
    if pytest_report.suffix == ".xml":
        summary, failed = _parse_junit(pytest_report)
    else:
        report = json.loads(pytest_report.read_text())
        failed = [
            t["nodeid"]
            for t in report.get("tests", [])
            if t.get("outcome") in ("failed", "error")
        ]
        summary = report.get("summary", {})
    lines = ["# Regressions", ""]
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
        worst = sorted(
            (
                (f["summary"]["percent_covered"], name, f["summary"])
                for name, f in cov.get("files", {}).items()
                if f["summary"]["num_statements"] >= 20
            ),
        )[:10]
        if worst:
            lines.append("Least-covered files (>=20 lines):")
            lines.append("")
            for pct_f, name, s in worst:
                lines.append(
                    f"- `{name}` — {s['covered_lines']}/{s['num_statements']} "
                    f"({pct_f:.0f}%)"
                )
            lines.append("")

    return "\n".join(lines)


if __name__ == "__main__":
    args = [pathlib.Path(a) for a in sys.argv[1:]]
    assert args, "usage: regressions.py pytest.json [coverage.json]"
    print(main(*args))
