#!/usr/bin/env python
"""Deterministically scale the driver testdata up N× for scaling benchmarks.

The driver ships sf0.001/sf0.01/sf0.1 only (TESTDATA.md, read-only). The
BASELINE.md scaling table wants one more decade, so this tool synthesizes
sf{0.1*N} from sf0.1 by unioning N key-shifted replicas per fact table —
preserving key density, join fan-out, and value distributions, while
perturbing document text / embedding vectors per replica so the dedup and
ANN workloads don't degenerate into an N×-exact-duplicate corpus (which
would grow in-bucket pair counts by N² instead of N and distort the
scaling signal).

Dimensions with fixed TPC-H cardinality (region=5, nation=25) are copied
verbatim; every other table scales linearly like TPC-H does.

Usage: python tools/make_scale.py [reps=10] [src=/root/testdata/sf0.1] [dst=/tmp/sfgen/sf1]

Output is for LOCAL scaling measurements only — never registered as driver
testdata, never used by correctness oracles.
"""

from __future__ import annotations

import os
import sys

import duckdb

COPY_VERBATIM = ("region", "nation")

# per-replica consonant rotation so replica texts are genuinely distinct at
# the shingle level (rep 0 = identity keeps sf0.1 itself as replica zero)
_ALPHA = "etaoinshrd"


def _rot(s: str, k: int) -> str:
    k %= len(s)
    return s[k:] + s[:k]


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sfgen/sf1"
    if reps > len(_ALPHA):
        # the consonant rotation wraps at len(_ALPHA): replica N would carry
        # byte-identical text to replica N-10, reintroducing the N² duplicate
        # -pair growth the perturbation exists to prevent
        print(
            f"WARNING: reps={reps} > {len(_ALPHA)} distinct text rotations — "
            "replicas beyond the alphabet repeat earlier texts exactly; "
            "dedup scaling numbers above 10x are NOT trustworthy",
            file=sys.stderr,
        )
    os.makedirs(dst, exist_ok=True)

    con = duckdb.connect()
    rep = f"(SELECT unnest(range({reps})) AS rep)"

    def off(tbl: str, key: str) -> int:
        return con.execute(
            f"SELECT max({key}) + 1 FROM '{src}/{tbl}.parquet'"
        ).fetchone()[0]

    o_cust = off("customer", "c_custkey")
    o_supp = off("supplier", "s_suppkey")
    o_part = off("part", "p_partkey")
    o_ord = off("orders", "o_orderkey")
    o_evt = off("events", "event_id")
    o_usr = off("events", "user_id")
    o_doc = off("documents", "doc_id")
    o_vec = off("embeddings", "vec_id")

    selects = {
        "customer": f"""
            SELECT c_custkey + rep * {o_cust} AS c_custkey, c_name,
                   c_nationkey, c_acctbal, c_mktsegment
            FROM '{src}/customer.parquet', {rep}""",
        "supplier": f"""
            SELECT s_suppkey + rep * {o_supp} AS s_suppkey, s_name,
                   s_nationkey, s_acctbal
            FROM '{src}/supplier.parquet', {rep}""",
        "part": f"""
            SELECT p_partkey + rep * {o_part} AS p_partkey, p_name, p_brand,
                   p_type, p_size, p_retailprice
            FROM '{src}/part.parquet', {rep}""",
        "orders": f"""
            SELECT o_orderkey + rep * {o_ord} AS o_orderkey,
                   o_custkey + rep * {o_cust} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM '{src}/orders.parquet', {rep}""",
        "lineitem": f"""
            SELECT l_orderkey + rep * {o_ord} AS l_orderkey,
                   l_partkey + rep * {o_part} AS l_partkey,
                   l_suppkey + rep * {o_supp} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM '{src}/lineitem.parquet', {rep}""",
        # same time range at N× event density == N× ingest throughput; user
        # cardinality scales with the data like a real growing product
        "events": f"""
            SELECT event_id + rep * {o_evt} AS event_id, ts,
                   user_id + rep * {o_usr} AS user_id,
                   event_type, value, props
            FROM '{src}/events.parquet', {rep}""",
    }
    # replica texts get a rotated-consonant translation (identity at rep 0):
    # near-dup structure WITHIN each replica matches sf0.1; across replicas
    # shingles diverge, so LSH buckets grow ~N×, not N²×
    trans_cases = " ".join(
        f"WHEN rep % {len(_ALPHA)} = {k} THEN "
        f"translate(text, '{_ALPHA}', '{_rot(_ALPHA, k)}')"
        for k in range(len(_ALPHA))
    )
    selects["documents"] = f"""
        SELECT doc_id + rep * {o_doc} AS doc_id,
               CASE {trans_cases} END AS text,
               lang, source, n_chars
        FROM '{src}/documents.parquet', {rep}"""
    # constant per-replica offset vector shifts direction (cosine is NOT
    # invariant under additive shift), so replicas aren't exact ANN twins
    selects["embeddings"] = f"""
        SELECT vec_id + rep * {o_vec} AS vec_id,
               list_transform(embedding, x -> x + rep * 0.003::FLOAT)
                   AS embedding,
               label
        FROM '{src}/embeddings.parquet', {rep}"""

    for tbl in COPY_VERBATIM:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{tbl}.parquet') TO "
            f"'{dst}/{tbl}.parquet' (FORMAT PARQUET)"
        )
        print(f"{tbl}: copied", file=sys.stderr)
    for tbl, sel in selects.items():
        con.execute(
            f"COPY ({sel}) TO '{dst}/{tbl}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM '{dst}/{tbl}.parquet'").fetchone()[0]
        print(f"{tbl}: {n} rows", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
