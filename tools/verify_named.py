#!/usr/bin/env python
"""Driver-style correctness check for NAMED queries (vs verify_window's
first-N prefix): same vanilla session, same compare.

Usage: python tools/verify_named.py name1 name2 ... [--sf DIR]
Exit code 0 iff every named query passes.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    names = args

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from tests.oracle import assert_matches_oracle

    specs = entrymod._all_specs()
    ok = fail = 0
    for name in names:
        spec = specs.get(name)
        if spec is None:
            print(f"FAIL {name}: not registered", file=sys.stderr)
            fail += 1
            continue
        t0 = time.time()
        try:
            df = spec.fn(spark, sf_dir)
            if spec.oracle:
                assert_matches_oracle(df, spec.oracle, sf_dir, name=name)
                tag = "oracle-ok"
            else:
                cnt = df.count()
                assert cnt >= 0 and len(df.schema.fields) > 0
                tag = f"rows-only ({cnt})"
            ok += 1
            print(f"  ok {name}: {tag} {time.time() - t0:.1f}s", file=sys.stderr)
        except Exception as ex:  # noqa: BLE001 - report and continue
            fail += 1
            print(
                f"FAIL {name}: {type(ex).__name__}: {str(ex)[:300]}",
                file=sys.stderr,
            )
    print(f"named[{len(names)}] @ {sf_dir}: {ok} ok, {fail} fail")
    return 1 if fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
