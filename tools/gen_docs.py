"""Regenerate the mechanically-derived parts of README.md.

Round-3 verdict ("What's wrong" #4, "Next round" #4/#5): query counts
and driver-row provenance were hand-maintained and drifted (80 vs 94 vs
97 in different docs). This script derives them from the one source of
truth — the registered catalog (``plans.QUERIES``) and the committed
``CORRECTNESS_r*.json`` driver artifacts — and rewrites README.md
in place:

- every ``N catalog queries`` / ``N queries, M oracle-checked`` count;
- the ``## Correctness provenance`` section between the AUTOGEN
  markers: per-round green counts plus the enumeration the driver will
  check next round (first 50 of the generated priority order).

Run after adding queries or after a new CORRECTNESS artifact lands:

    python tools/gen_docs.py

``tests/test_catalog_oracle.py::test_readme_counts_are_generated``
fails if README drifts from the registry.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

BEGIN = "<!-- AUTOGEN:provenance (tools/gen_docs.py) -->"
END = "<!-- /AUTOGEN:provenance -->"


def counts() -> tuple[int, int]:
    from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.plans import (
        QUERIES,
    )

    n = len(QUERIES)
    n_oracle = sum(1 for q in QUERIES.values() if q.oracle is not None)
    return n, n_oracle


def provenance_md() -> str:
    from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.plans import (
        QUERIES,
        driver_priority,
        last_green_rounds,
    )

    green = last_green_rounds()
    order = driver_priority()
    n = len(QUERIES)
    per_round: dict[int, list[str]] = {}
    for name in QUERIES:
        per_round.setdefault(green.get(name, 0), []).append(name)
    lines = [
        BEGIN,
        "",
        f"Registered catalog queries: **{n}** "
        f"({sum(1 for q in QUERIES.values() if q.oracle is not None)} with "
        "DuckDB value oracles). Last fully-green driver row "
        "(rows+schema+hash) per query, derived from the committed "
        "`CORRECTNESS_r*.json` artifacts:",
        "",
        "| Last green round | Queries |",
        "|---|---|",
    ]
    for rnd in sorted(per_round):
        label = "never (red or not yet checked)" if rnd == 0 else f"r{rnd}"
        names = ", ".join(f"`{q}`" for q in sorted(per_round[rnd]))
        lines.append(f"| {label} | {names} |")
    head = ", ".join(f"`{q}`" for q in order[:10])
    lines += [
        "",
        "Next driver run checks the first ≤50 entries of the generated "
        "priority order (never-green first, then stalest green round "
        "first — `plans/__init__.py::driver_priority`), beginning: "
        f"{head}, …",
        "",
        END,
    ]
    return "\n".join(lines)


def regenerate(readme: str) -> str:
    n, n_oracle = counts()
    readme = re.sub(r"\d+(\s+)catalog queries", rf"{n}\1catalog queries", readme)
    # E2E replay number comes from the committed artifact, not prose
    import json

    e2e = ROOT / "E2E_BENCH.json"
    if e2e.exists():
        wall = json.loads(e2e.read_text())["value"]
        readme = re.sub(
            r"counts pass in ~\d+ s vs",
            f"counts pass in ~{round(wall)} s vs",
            readme,
        )
    readme = re.sub(
        r"query catalog \(\d+ queries, \d+ oracle-checked\)",
        f"query catalog ({n} queries, {n_oracle} oracle-checked)",
        readme,
    )
    block = provenance_md()
    if BEGIN in readme:
        readme = re.sub(
            re.escape(BEGIN) + r".*?" + re.escape(END),
            block.replace("\\", r"\\"),
            readme,
            flags=re.S,
        )
    else:
        raise SystemExit(
            f"README.md is missing the {BEGIN} marker — add it inside the "
            "'## Correctness provenance' section first"
        )
    return readme


def main() -> None:
    p = ROOT / "README.md"
    p.write_text(regenerate(p.read_text()))
    n, n_oracle = counts()
    print(f"README.md regenerated: {n} queries, {n_oracle} with oracles")


if __name__ == "__main__":
    main()
