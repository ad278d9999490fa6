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


# TPC-H-shape dual-dialect queries over the driver's simplified TPC-H
# tables (no partsupp/shipmode columns, dates span 1995-2001 —
# TESTDATA.md).  Money sums are rounded to WHOLE currency units (a 2dp grid sits
# close enough to float summation-order error that midpoint flips are
# observable; the 1.0 grid is 3 orders of magnitude safer), ratios at
# 4dp — in the ONE literal string both engines run.
_TPCH_EXTRA = {
    # Q6: forecasting revenue change — pure scan+filter+agg; the filter
    # trio must reach the parquet scan (plan-linted via PushedFilters
    # checks in PLANS.md §3).
    "cp_sql_tpch_q6_revenue": """
SELECT CAST(round(sum(l_extendedprice * l_discount), 0) AS BIGINT) AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24""",
    # Q14: promo revenue share — join to the part dim + conditional agg.
    "cp_sql_tpch_q14_promo": """
SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= DATE '1996-03-01' AND l.l_shipdate < DATE '1996-06-01'""",
    # Q10: returned-item revenue by customer — 4-way FK join + grouped
    # money agg + deterministic top-20 (rounded revenue, custkey tiebreak).
    "cp_sql_tpch_q10_returns": """
SELECT c.c_custkey AS custkey, c.c_name AS name, n.n_name AS nation,
       CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)), 0) AS BIGINT)
         AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= DATE '1996-01-01' AND o.o_orderdate < DATE '1996-07-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, custkey
LIMIT 20""",
    # Q7: volume shipping between two nations, by ship year — the
    # 6-table join with two roles for the nation dim.
    "cp_sql_tpch_q7_volume": """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       year(l.l_shipdate) AS l_year,
       CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)), 0) AS BIGINT)
         AS volume
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
WHERE sn.n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
  AND cn.n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
  AND sn.n_name <> cn.n_name
GROUP BY sn.n_name, cn.n_name, year(l.l_shipdate)""",
    # Q15: top supplier by period revenue — CTE + scalar-subquery max
    # over 2dp-rounded totals (tie-safe across engines).
    "cp_sql_tpch_q15_top_supplier": """
WITH rev AS (
  SELECT l_suppkey AS suppkey,
         CAST(round(sum(l_extendedprice * (1 - l_discount)), 0) AS BIGINT) AS total
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
  GROUP BY l_suppkey)
SELECT s.s_suppkey AS suppkey, s.s_name AS name, r.total AS total_revenue
FROM supplier s JOIN rev r ON s.s_suppkey = r.suppkey
WHERE r.total = (SELECT max(total) FROM rev)""",
    # Q13: customer order-count distribution — the LEFT OUTER join with
    # an extra non-key ON predicate, then a two-level aggregation that
    # must keep zero-order customers (c_count = 0).
    "cp_sql_tpch_q13_custdist": """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey AS ck, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                    AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey) t
GROUP BY c_count""",
    # Q19: disjunctive brand/size/quantity predicate — an OR of
    # conjunct triples spanning BOTH join sides; the per-side common
    # factors (p_size lower bound, quantity envelope) must still be
    # pushed below the join (CNF extraction) for the scan to stay
    # selective at scale.
    "cp_sql_tpch_q19_disjunct": """
SELECT CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)), 0) AS BIGINT)
         AS revenue,
       count(*) AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 15)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 25)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 35)""",
    # Q8: national market share — the deepest join the driver schema
    # supports (8 relations; nation twice, region gating the customer
    # side only), then a conditional-share ratio per order year.
    "cp_sql_tpch_q8_mkt_share": """
SELECT o_year,
       round(sum(CASE WHEN nation = 'NATION_7' THEN volume ELSE 0 END)
             / sum(volume), 4) AS mkt_share
FROM (
  SELECT EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         sn.n_name AS nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation cn ON cn.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = cn.n_regionkey
  JOIN nation sn ON sn.n_nationkey = s.s_nationkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    AND o.o_orderdate >= DATE '1996-01-01'
    AND o.o_orderdate < DATE '1998-01-01') t
GROUP BY o_year""",
    # GROUPING SETS with grouping() markers: detail, one-dim subtotal,
    # and grand total in one pass — Catalyst expands to a single
    # Expand+Aggregate, not three scans.
    "cp_sql_grouping_sets": """
SELECT l_returnflag, l_linestatus,
       grouping(l_returnflag) AS g_rf, grouping(l_linestatus) AS g_ls,
       count(*) AS n,
       CAST(round(sum(l_extendedprice), 0) AS BIGINT) AS rev
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""",
}

for _name, _sql in _TPCH_EXTRA.items():
    REGISTRY[_name] = (_sparksql_runner(_sql), _sql)


# Round 4: the remaining TPC-H shapes expressible over the driver's
# simplified schema (q2/q9/q11/q16/q20 need partsupp, which the
# testdata does not ship; q4's EXISTS shape is cp_sql_exists_late_ship
# above).  Where an original column is absent the query keeps the
# SHAPE (the plan pattern Catalyst must get right) with the available
# columns — noted per query.
_TPCH_ROUND4 = {
    # Q3: shipping-priority revenue — segment-filtered 3-way join,
    # grouped money agg, deterministic top-10 (no o_shippriority
    # column; rounded-revenue + orderkey ordering).
    "cp_sql_tpch_q3_shipping": """
SELECT o.o_orderkey AS orderkey, o.o_orderdate AS orderdate,
       CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)), 0) AS BIGINT)
         AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < DATE '1997-01-01'
  AND l.l_shipdate > DATE '1997-01-01'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, orderkey
LIMIT 10""",
    # Q12 shape: late-shipment priority mix — join + conditional
    # two-way count split (l_linestatus stands in for the absent
    # l_shipmode; lateness is shipdate vs orderdate+90d instead of the
    # absent commit/receipt dates).
    "cp_sql_tpch_q12_late_mix": """
SELECT l.l_linestatus AS linestatus,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  AND l.l_shipdate >= DATE '1996-01-01' AND l.l_shipdate < DATE '1997-01-01'
GROUP BY l.l_linestatus""",
    # Q17: small-quantity-order revenue — correlated scalar AVG
    # subquery per part.  l_quantity is integer-valued, so sum/avg are
    # EXACT in double (order-independent) — no cross-engine float
    # boundary at the 0.5*avg comparison.
    "cp_sql_tpch_q17_small_qty": """
SELECT CAST(round(sum(l.l_extendedprice) / 7.0, 0) AS BIGINT) AS avg_yearly,
       count(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND l.l_quantity < (SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
                      WHERE l2.l_partkey = l.l_partkey)""",
    # Q18: large-volume customers — IN over a grouped HAVING subquery,
    # then re-aggregate with the customer dim; integer quantity sums.
    "cp_sql_tpch_q18_big_orders": """
SELECT c.c_name AS name, o.o_orderkey AS orderkey,
       o.o_orderdate AS orderdate,
       CAST(sum(l.l_quantity) AS BIGINT) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
GROUP BY c.c_name, o.o_orderkey, o.o_orderdate
ORDER BY total_qty DESC, orderkey
LIMIT 20""",
    # Q21 shape: suppliers who kept orders waiting — EXISTS (another
    # supplier in the order) + NOT EXISTS (anyone shipped later), i.e.
    # the sole latest shipper in a multi-supplier order (shipdate vs
    # orderdate+60d replaces the absent commit/receipt pair).
    "cp_sql_tpch_q21_late_supplier": """
SELECT s.s_name AS supp_name, count(DISTINCT l1.l_orderkey) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > l1.l_shipdate)
GROUP BY s.s_name
ORDER BY numwait DESC, supp_name
LIMIT 10""",
    # Q22 shape: well-funded customers gone idle — scalar-subquery
    # balance floor (floor() of an exact-ish mean: integer grid, 3
    # orders of magnitude from float summation noise) + windowed
    # NOT EXISTS anti-join on recent orders (every sf0.01 customer has
    # SOME order, so the original "never ordered" predicate is empty
    # by construction; "no order since 1999" keeps the anti shape).
    "cp_sql_tpch_q22_idle_funded": """
SELECT n.n_name AS nation, count(*) AS numcust,
       CAST(round(sum(c.c_acctbal), 0) AS BIGINT) AS totacctbal
FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE c.c_acctbal > (SELECT floor(avg(c2.c_acctbal)) FROM customer c2
                     WHERE c2.c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= DATE '1999-01-01')
GROUP BY n.n_name""",
}

for _name, _sql in _TPCH_ROUND4.items():
    REGISTRY[_name] = (_sparksql_runner(_sql), _sql)


# Round 4b: the five TPC-H shapes that need partsupp (q2/q9/q11/q16/
# q20).  The testdata ships no partsupp table, so each query DERIVES
# one inside the SQL from pure key arithmetic (4 suppliers per part,
# integer availqty, integer-cents supplycost) — deterministic and
# engine-identical, so the oracle hash is meaningful while the PLAN
# SHAPE (correlated min subquery, NOT IN anti, nested IN + scalar
# 0.5*sum, profit multi-join) is exactly the TPC-H one.
_PARTSUPP_CTE = """partsupp AS (
  SELECT p_partkey AS ps_partkey,
         CAST((p_partkey + g.i * 25) % 100 AS BIGINT) AS ps_suppkey,
         CAST((p_partkey * 7 + g.i * 13) % 1000 + 1 AS BIGINT)
           AS ps_availqty,
         CAST((p_partkey * 31 + g.i * 17) % 9000 + 1000 AS BIGINT)
           AS ps_supplycost_cents
  FROM part CROSS JOIN (VALUES (0), (1), (2), (3)) AS g(i))"""

_TPCH_PARTSUPP = {
    # Q2: min-cost supplier per part within a region — correlated MIN
    # subquery over the region-restricted costs relation.
    "cp_sql_tpch_q2_min_cost": f"""
WITH {_PARTSUPP_CTE},
costs AS (
  SELECT ps.ps_partkey, ps.ps_suppkey, ps.ps_supplycost_cents
  FROM partsupp ps
  JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'EUROPE')
SELECT s.s_acctbal AS acctbal, s.s_name AS supp_name, n.n_name AS nation,
       p.p_partkey AS partkey, c.ps_supplycost_cents AS cost_cents
FROM part p
JOIN costs c ON c.ps_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = c.ps_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_type = 'ECONOMY'
  AND c.ps_supplycost_cents = (SELECT min(c2.ps_supplycost_cents)
                               FROM costs c2
                               WHERE c2.ps_partkey = p.p_partkey)
ORDER BY acctbal DESC, nation, supp_name, partkey
LIMIT 20""",
    # Q9: product-type profit by nation and order year.  Profit terms
    # are exact on the cents grid (supplycost integer cents × integer
    # quantity); the extendedprice side rounds at 0dp like q3.
    "cp_sql_tpch_q9_profit": f"""
WITH {_PARTSUPP_CTE}
SELECT n.n_name AS nation,
       CAST(extract(year FROM o.o_orderdate) AS INT) AS o_year,
       CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)
                      - ps.ps_supplycost_cents / 100.0 * l.l_quantity),
                  0) AS BIGINT) AS profit
FROM part p
JOIN partsupp ps ON ps.ps_partkey = p.p_partkey
JOIN lineitem l ON l.l_partkey = ps.ps_partkey
                AND l.l_suppkey = ps.ps_suppkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%red%'
GROUP BY n.n_name, extract(year FROM o.o_orderdate)""",
    # Q11: important-stock identification — per-part stock value for
    # one nation's suppliers, above a scalar-subquery bound.  The
    # original's fraction-of-total threshold is scale-DEPENDENT (the
    # spec retunes it per SF); 2x the mean keeps the scalar-subquery
    # plan shape and stays selective-but-nonempty at every SF.  Values
    # are exact BIGINT cents; avg of exact integers is the same double
    # in both engines.
    "cp_sql_tpch_q11_stock": f"""
WITH {_PARTSUPP_CTE},
stock AS (
  SELECT ps.ps_partkey,
         CAST(sum(ps.ps_supplycost_cents * ps.ps_availqty) AS BIGINT)
           AS value_cents
  FROM partsupp ps
  JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_1'
  GROUP BY ps.ps_partkey)
SELECT ps_partkey AS partkey, value_cents
FROM stock
WHERE value_cents > (SELECT 2.0 * avg(value_cents) FROM stock)
ORDER BY value_cents DESC, partkey
LIMIT 25""",
    # Q16: supplier count per (brand, type, size) excluding
    # blacklisted suppliers via NOT IN (the anti shape; the original
    # blacklists on comment text — here a deterministic key predicate).
    "cp_sql_tpch_q16_supp_count": f"""
WITH {_PARTSUPP_CTE}
SELECT p.p_brand AS brand, p.p_type AS type, p.p_size AS size,
       count(DISTINCT ps.ps_suppkey) AS supplier_cnt
FROM partsupp ps
JOIN part p ON p.p_partkey = ps.ps_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type NOT IN ('PROMO', 'LARGE')
  AND p.p_size IN (11, 14, 23, 45, 49, 3, 36, 9)
  AND ps.ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_suppkey % 13 = 0)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, brand, type, size
LIMIT 30""",
    # Q20: suppliers holding excess stock of shipped parts — nested
    # IN subqueries with a correlated scalar 0.5*sum bound.
    # l_quantity is integer so the half-sum comparison is exact.
    "cp_sql_tpch_q20_excess_stock": f"""
WITH {_PARTSUPP_CTE}
SELECT s.s_name AS supp_name, n.n_name AS nation
FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE s.s_suppkey IN (
  SELECT ps.ps_suppkey FROM partsupp ps
  WHERE ps.ps_partkey IN (SELECT p_partkey FROM part
                          WHERE p_name LIKE 'red%')
    AND ps.ps_availqty > (
      SELECT 0.5 * coalesce(sum(l.l_quantity), 0) FROM lineitem l
      WHERE l.l_partkey = ps.ps_partkey AND l.l_suppkey = ps.ps_suppkey
        AND l.l_shipdate >= DATE '1997-01-01'
        AND l.l_shipdate < DATE '1998-01-01'))
ORDER BY supp_name""",
}

for _name, _sql in _TPCH_PARTSUPP.items():
    REGISTRY[_name] = (_sparksql_runner(_sql), _sql)
