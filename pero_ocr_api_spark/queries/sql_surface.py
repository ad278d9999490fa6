"""The ``spark.sql`` surface: ONE ANSI SQL string per query, executed
verbatim by BOTH engines — Spark SQL over temp views (the ``queries()``
side) and DuckDB over the same parquet (the ``oracle_sql()`` side).

This is the strongest possible oracle form: there is no second
implementation to drift — the Spark entry runs the literal oracle
string, so the gate verifies Spark's SQL engine itself (parser,
optimizer, execution) against DuckDB on identical text.  Dialect
constraint: only queries whose oracle SQL is ANSI-portable appear here
(window-ordered string_agg, for example, is DuckDB-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import make_registry
from ..session import load_table
from .controlplane import REGISTRY as _CP

REGISTRY, _reg_pair = make_registry()

_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events",
]

# (new name, controlplane entry whose oracle SQL is dual-dialect)
_PORTABLE = [
    ("cp_sql_j1_three_way_join", "cp_j1_three_way_join"),
    ("cp_sql_tpch_q1_pricing", "cp_tpch_q1_pricing"),
    ("cp_sql_a5_counts_24h", "cp_a5_counts_24h"),
    ("cp_sql_a1_a3_request_status", "cp_a1_a3_request_status"),
    ("cp_sql_j6_rank_fallback", "cp_j6_rank_fallback"),
    ("cp_sql_a5a6_cube", "cp_a5a6_state_engine_cube"),
    ("cp_sql_tpch_q5_region_volume", "cp_tpch_q5_region_volume"),
]


def _sparksql_runner(sql: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        import os

        for t in _TABLES:
            # register what exists — a query must not fail because an
            # unrelated table's parquet is absent from the fixture dir
            if os.path.exists(os.path.join(sf_dir, f"{t}.parquet")):
                load_table(spark, sf_dir, t).createOrReplaceTempView(t)
        return spark.sql(sql)

    return run


for _name, _src in _PORTABLE:
    _sql = _CP[_src][1]
    REGISTRY[_name] = (_sparksql_runner(_sql), _sql)


# Correlated-subquery shapes, defined directly as dual-dialect SQL:
# these exercise Catalyst's subquery decorrelation (rewrite to
# joins/aggregates) on the SAME literal text DuckDB runs.
_CORRELATED = {
    # TPC-H Q4 shape: EXISTS correlated on the outer key plus an outer
    # column in the inner predicate (late-shipping lineitems).
    "cp_sql_exists_late_ship": """
SELECT o.o_orderpriority AS priority, count(*) AS n
FROM orders o
WHERE o.o_orderdate >= DATE '1996-01-01'
  AND o.o_orderdate < DATE '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
GROUP BY o.o_orderpriority""",
    # Correlated scalar subquery: each customer's maximal order(s).
    # max() equality compares identical stored doubles — no arithmetic,
    # no rounding boundary.
    "cp_sql_corr_max_order": """
SELECT o.o_custkey AS custkey, o.o_orderkey AS orderkey,
       o.o_totalprice AS totalprice
FROM orders o
WHERE o.o_totalprice = (SELECT max(o2.o_totalprice) FROM orders o2
                        WHERE o2.o_custkey = o.o_custkey)""",
}

for _name, _sql in _CORRELATED.items():
    REGISTRY[_name] = (_sparksql_runner(_sql), _sql)
