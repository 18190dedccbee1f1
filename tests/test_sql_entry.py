"""The plain-SQL entry point: register_views + spark.sql must agree with the
same DuckDB oracles the DataFrame plans are checked against — proving the
catalog names, timestamp normalization, and SQL dialect subset line up."""

from __future__ import annotations

from hri_flink_validation_passthrough_spark.session import TABLES, register_views
from tests.conftest import SF_ORACLE
from tests.oracle import assert_matches_oracle

SQL_CASES = {
    # (spark-sql text, duckdb oracle text) — ANSI-portable subset
    "revenue_by_returnflag": (
        """
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem GROUP BY l_returnflag
        """,
        """
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem GROUP BY l_returnflag
        """,
    ),
    "urgent_customers_semi": (
        """
        SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
        FROM customer WHERE c_custkey IN (
          SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        GROUP BY c_mktsegment
        """,
        """
        SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
        FROM customer WHERE c_custkey IN (
          SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        GROUP BY c_mktsegment
        """,
    ),
    "events_hourly_sql": (
        """
        SELECT date_format(date_trunc('hour', ts), 'yyyy-MM-dd HH:mm:ss') AS hr,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1
        """,
        """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hr,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1
        """,
    ),
}


def test_all_tables_registered(spark):
    register_views(spark, SF_ORACLE)
    cat = {t.name for t in spark.catalog.listTables()}
    assert set(TABLES) <= cat


def test_sql_entry_matches_oracles(spark):
    register_views(spark, SF_ORACLE)
    for name, (spark_sql, oracle) in SQL_CASES.items():
        assert_matches_oracle(spark.sql(spark_sql), oracle, SF_ORACLE, name=name)
