#!/usr/bin/env python
"""Regenerate QUERIES.md: the full query catalog from the live registry.

One row per `__spark_entry__.queries()` entry: module, oracle status, and
the registered doc string — the navigable index tying SURVEY.md §2 and
COVERAGE.md to the actual implementations. Regenerate after adding queries:
``python tools/dump_catalog.py`` (no Spark session needed).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    specs = entry._all_specs()
    out = [
        "# QUERIES — full catalog (auto-generated)",
        "",
        f"{len(specs)} registered queries; regenerate with "
        "`python tools/dump_catalog.py`. \"oracle\" means the driver "
        "hash-compares the Spark result against the DuckDB SQL at sf0.01; "
        "rows-only entries document why no SQL twin exists.",
        "",
        "| # | query | module | check | what it covers |",
        "|---|---|---|---|---|",
    ]
    for i, (name, spec) in enumerate(specs.items(), 1):
        mod = spec.fn.__module__.replace(
            "hri_flink_validation_passthrough_spark.", ""
        )
        check = "oracle" if spec.oracle else "rows-only"
        doc = " ".join((spec.doc or "").split())
        out.append(f"| {i} | `{name}` | `{mod}` | {check} | {doc} |")
    with open(os.path.join(REPO, "QUERIES.md"), "w") as fh:
        fh.write("\n".join(out) + "\n")
    print(f"wrote QUERIES.md with {len(specs)} entries")


if __name__ == "__main__":
    main()
