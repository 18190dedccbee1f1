"""Run any registered query from the command line.

The reference-parity CLI (``cli.py``) is frozen to the picocli contract, so
the analytics surface gets its own entry point::

    python -m hri_flink_validation_passthrough_spark.run_query --list
    python -m hri_flink_validation_passthrough_spark.run_query q1_pricing_summary
    python -m hri_flink_validation_passthrough_spark.run_query dedup_minhash_lsh \
        --sf-dir /root/testdata/sf0.1 --limit 20 --explain

Output is line-delimited JSON rows (machine-consumable); ``--explain`` prints
the formatted physical plan to stderr instead of executing.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None, stop_session: bool = True) -> int:
    """``stop_session=False`` for in-process callers (tests, notebooks):
    ``build_session`` getOrCreates, so stopping here would kill a session
    the caller still owns."""
    p = argparse.ArgumentParser(prog="run_query", description=__doc__)
    p.add_argument("name", nargs="?", help="registered query name")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--limit", type=int, default=50, help="max rows printed (0 = all)")
    p.add_argument("--cpus", type=int, default=None)
    p.add_argument("--list", action="store_true", help="list registered queries")
    p.add_argument(
        "--explain", action="store_true", help="print the physical plan, don't run"
    )
    a = p.parse_args(argv)

    import __spark_entry__ as entry  # repo-root driver contract

    specs = entry._all_specs()
    if a.list or not a.name:
        for name, spec in sorted(specs.items()):
            kind = "oracle" if spec.oracle else "rows-only"
            print(f"{name}\t{kind}")
        return 0
    if a.name not in specs:
        print(f"unknown query: {a.name!r} (see --list)", file=sys.stderr)
        return 2

    from .session import build_session

    spark = build_session("hri_run_query", cpus=a.cpus)
    try:
        df = specs[a.name].fn(spark, a.sf_dir)
        if a.explain:
            print(
                df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                ),
                file=sys.stderr,
            )
            return 0
        rows = df.limit(a.limit).collect() if a.limit else df.collect()
        for r in rows:
            print(json.dumps(r.asDict(recursive=True), default=str))
        return 0
    finally:
        if stop_session:
            spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
