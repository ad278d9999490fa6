"""Control-plane query library — SURVEY §2.2-§2.7 operator inventory
re-expressed over the driver's TPC-H-ish tables so DuckDB can verify
each one.  Each registry entry is (spark_fn, oracle_sql); names carry
the survey row ids they cover.

Semantics mapping (reference → here):
- pages/requests/api_keys state machine → orders/lineitem/customer
  with the same operator shapes (equality/IN/range filters, FK joins,
  semi/anti existence, grouped counts, conditional averages, medians,
  latest-per-group, reading-order concat, top-k, union+rank fallback).
- Float aggregates are rounded (2dp money, 6dp ratios) in BOTH engines
  so shuffle-order summation noise cannot flip the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..constants import PINNED_NOW
from ..session import load_table

from ..registry import make_registry

REGISTRY, _reg = make_registry()


# ---- P2: IN-list filter + grouped count (general.py:46,56) ----
@_reg(
    "cp_p2_state_in_filter",
    """SELECT o_orderstatus AS state, count(*) AS n
       FROM orders WHERE o_orderstatus IN ('O', 'F')
       GROUP BY o_orderstatus""",
)
def q_p2(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    return (
        orders.filter(F.col("o_orderstatus").isin("O", "F"))
        .groupBy(F.col("o_orderstatus").alias("state"))
        .agg(F.count("*").alias("n"))
    )


# ---- P5/W4/A5: 24h-lookback timestamp window + per-state counts ----
@_reg(
    "cp_a5_counts_24h",
    f"""SELECT event_type AS state, count(*) AS n, round(sum(value), 2) AS total
        FROM events
        WHERE ts > TIMESTAMP '{PINNED_NOW}' - INTERVAL 24 HOUR
          AND ts <= TIMESTAMP '{PINNED_NOW}'
        GROUP BY event_type""",
)
def q_a5(spark: SparkSession, sf: str) -> DataFrame:
    events = load_table(spark, sf, "events")
    now = F.lit(PINNED_NOW).cast("timestamp")
    return (
        events.filter(
            (F.col("ts") > now - F.expr("INTERVAL 24 HOURS")) & (F.col("ts") <= now)
        )
        .groupBy(F.col("event_type").alias("state"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
    )


# ---- P6: compound-key predicate chain (general.py:194-197) ----
@_reg(
    "cp_p6_compound_filter",
    """SELECT count(*) AS n, round(sum(l_quantity), 2) AS qty
       FROM lineitem
       WHERE l_returnflag = 'R' AND l_linestatus = 'F' AND l_quantity > 30""",
)
def q_p6(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_returnflag") == "R")
            & (F.col("l_linestatus") == "F")
            & (F.col("l_quantity") > 30)
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
    )


# ---- J1: 3-way FK join with broadcast dims (general.py:88-93) ----
@_reg(
    "cp_j1_three_way_join",
    """SELECT c.c_mktsegment AS segment, count(*) AS n_lines,
              round(sum(l.l_extendedprice), 2) AS revenue
       FROM lineitem l
       JOIN orders o ON l.l_orderkey = o.o_orderkey
       JOIN customer c ON o.o_custkey = c.c_custkey
       GROUP BY c.c_mktsegment""",
)
def q_j1(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
    )


# ---- J2: left outer join incl. empty groups (app/__init__.py:129-132) ----
@_reg(
    "cp_j2_left_outer",
    """SELECT c.c_custkey AS custkey, count(o.o_orderkey) AS n_orders
       FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
       GROUP BY c.c_custkey""",
)
def q_j2(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    return (
        cust.join(orders, orders.o_custkey == cust.c_custkey, "left")
        .groupBy(F.col("c_custkey").alias("custkey"))
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


# ---- J5: existence semi-join (general.py:106-109) ----
@_reg(
    "cp_j5_semi_join",
    """SELECT c_mktsegment AS segment, count(*) AS n
       FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
       GROUP BY c_mktsegment""",
)
def q_j5(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    cust = load_table(spark, sf, "customer")
    return (
        cust.join(orders, orders.o_custkey == cust.c_custkey, "left_semi")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count("*").alias("n"))
    )


# ---- O3: anti-join = "work not done yet" resume set (retrieve_ocr_results.py:62-64) ----
@_reg(
    "cp_o3_anti_join",
    """SELECT count(*) AS n_without_orders
       FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""",
)
def q_o3(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    return (
        cust.join(orders, orders.o_custkey == cust.c_custkey, "left_anti")
        .agg(F.count("*").alias("n_without_orders"))
    )


# ---- J6: preferred-engine fallback as one rank, no retry loop (general.py:87-96) ----
@_reg(
    "cp_j6_rank_fallback",
    """SELECT custkey, orderkey FROM (
         SELECT o_custkey AS custkey, o_orderkey AS orderkey,
                row_number() OVER (
                  PARTITION BY o_custkey
                  ORDER BY (o_orderpriority = '1-URGENT') DESC,
                           o_orderdate ASC, o_orderkey ASC) AS rn
         FROM orders) t
       WHERE rn = 1""",
)
def q_j6(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        (F.col("o_orderpriority") == "1-URGENT").desc(),
        F.col("o_orderdate").asc(),
        F.col("o_orderkey").asc(),
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
        )
    )


# ---- A1-A3: request completeness/ratio aggregate (general.py:44-51) ----
@_reg(
    "cp_a1_a3_request_status",
    """SELECT l_orderkey AS orderkey, count(*) AS n_total,
              count(*) FILTER (WHERE l_returnflag <> 'N') AS n_done,
              round(count(*) FILTER (WHERE l_returnflag <> 'N')
                    / CAST(count(*) AS DOUBLE), 6) AS status
       FROM lineitem GROUP BY l_orderkey""",
)
def q_a1(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    done = F.count(F.when(F.col("l_returnflag") != "N", 1))
    return li.groupBy(F.col("l_orderkey").alias("orderkey")).agg(
        F.count("*").alias("n_total"),
        done.alias("n_done"),
        F.round(done / F.count("*").cast("double"), 6).alias("status"),
    )


# ---- A2: conditional average (avg score of PROCESSED pages, general.py:49) ----
@_reg(
    "cp_a2_conditional_avg",
    """SELECT l_returnflag AS flag,
              round(avg(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 6) AS avg_done_qty
       FROM lineitem GROUP BY l_returnflag""",
)
def q_a2(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.round(
            F.avg(F.when(F.col("l_linestatus") == "F", F.col("l_quantity"))), 6
        ).alias("avg_done_qty")
    )


# ---- A6: per-engine queue depth via join + group count (general.py:134-142) ----
@_reg(
    "cp_a6_group_by_dim",
    """SELECT n.n_name AS nation, count(*) AS n_orders
       FROM orders o
       JOIN customer c ON o.o_custkey = c.c_custkey
       JOIN nation n ON c.c_nationkey = n.n_nationkey
       GROUP BY n.n_name""",
)
def q_a6(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count("*").alias("n_orders"))
    )


# ---- A7: exact median per group (page score, run_client.py:77-85) ----
@_reg(
    "cp_a7_median",
    """SELECT l_returnflag AS flag, count(*) AS n,
              median(l_quantity) AS median_qty
       FROM lineitem GROUP BY l_returnflag""",
)
def q_a7(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.count("*").alias("n"),
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
    )


# ---- W1: latest-per-group (latest engine version, general.py:210) ----
@_reg(
    "cp_w1_latest_per_group",
    """SELECT user_id, event_id, event_type FROM (
         SELECT user_id, event_id, event_type,
                row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
         FROM events) t
       WHERE rn = 1""",
)
def q_w1(spark: SparkSession, sf: str) -> DataFrame:
    events = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


# ---- W2: reading-order concat per group (run_client.py:70-74) ----
@_reg(
    "cp_w2_ordered_concat",
    """SELECT l_orderkey AS orderkey,
              string_agg(CAST(l_partkey AS VARCHAR), ','
                         ORDER BY l_linenumber, l_partkey) AS parts
       FROM lineitem GROUP BY l_orderkey""",
)
def q_w2(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return li.groupBy(F.col("l_orderkey").alias("orderkey")).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("l_linenumber", "l_partkey"))),
                lambda s: s["l_partkey"].cast("string"),
            ),
            ",",
        ).alias("parts")
    )


# ---- W4: tumbling time-window aggregation ----
@_reg(
    "cp_w4_hourly_window",
    """SELECT date_trunc('hour', ts) AS hour, count(*) AS n,
              round(sum(value), 2) AS total
       FROM events GROUP BY 1""",
)
def q_w4(spark: SparkSession, sf: str) -> DataFrame:
    events = load_table(spark, sf, "events")
    return events.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total")
    )


# ---- O1: deterministic top-k ----
@_reg(
    "cp_o1_topk",
    """SELECT o_orderkey AS orderkey, o_totalprice AS totalprice
       FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",
)
def q_o1(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
        )
    )


# ---- O4: union of candidate sets + dedup (general.py:87-96 fallback) ----
@_reg(
    "cp_o4_union_distinct",
    """SELECT count(DISTINCT o_orderkey) AS n FROM (
         SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
         UNION ALL
         SELECT o_orderkey FROM orders WHERE o_totalprice > 300000) t""",
)
def q_o4(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    a = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    b = orders.filter(F.col("o_totalprice") > 300000).select("o_orderkey")
    return a.unionByName(b).agg(F.count_distinct("o_orderkey").alias("n"))


# ---- F1: extension extract + lowercase (routes.py:89,264) ----
@_reg(
    "cp_f1_string_extract",
    """SELECT lower(regexp_extract(p_type, '([^ ]+)$', 1)) AS ext, count(*) AS n
       FROM part GROUP BY 1""",
)
def q_f1(spark: SparkSession, sf: str) -> DataFrame:
    part = load_table(spark, sf, "part")
    return (
        part.select(
            F.lower(F.regexp_extract("p_type", r"([^ ]+)$", 1)).alias("ext")
        )
        .groupBy("ext")
        .agg(F.count("*").alias("n"))
    )


# ---- F2: URL parse/format (routes.py:93-94, helper.py:1-9) ----
@_reg(
    "cp_f2_url_parse",
    """WITH u AS (
         SELECT p_partkey,
                'http://' || lower(p_brand) || '.example.com/parts/'
                  || p_partkey || '.html' AS url
         FROM part)
       SELECT p_partkey AS partkey,
              regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
              regexp_extract(url, '^[a-z]+://[^/]+(/.*)$', 1) AS path,
              lower(regexp_extract(url, '\\.([^./]+)$', 1)) AS ext
       FROM u""",
)
def q_f2(spark: SparkSession, sf: str) -> DataFrame:
    part = load_table(spark, sf, "part")
    url = F.concat(
        F.lit("http://"), F.lower("p_brand"), F.lit(".example.com/parts/"),
        F.col("p_partkey").cast("string"), F.lit(".html"),
    )
    u = part.select(F.col("p_partkey").alias("partkey"), url.alias("url"))
    return u.select(
        "partkey",
        F.regexp_extract("url", r"^[a-z]+://([^/]+)", 1).alias("host"),
        F.regexp_extract("url", r"^[a-z]+://[^/]+(/.*)$", 1).alias("path"),
        F.lower(F.regexp_extract("url", r"\.([^./]+)$", 1)).alias("ext"),
    )


# ---- F3/F4: timestamp arithmetic window + scaling (general.py:130, routes.py:241) ----
@_reg(
    "cp_f3_f4_daily_scaled",
    f"""SELECT date_trunc('day', ts) AS day, count(*) AS n,
               round(avg(value) * 100, 2) AS score_scaled
        FROM events
        WHERE ts > TIMESTAMP '{PINNED_NOW}' - INTERVAL 7 DAY
          AND ts <= TIMESTAMP '{PINNED_NOW}'
        GROUP BY 1""",
)
def q_f3(spark: SparkSession, sf: str) -> DataFrame:
    events = load_table(spark, sf, "events")
    now = F.lit(PINNED_NOW).cast("timestamp")
    return (
        events.filter(
            (F.col("ts") > now - F.expr("INTERVAL 7 DAYS")) & (F.col("ts") <= now)
        )
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("value") * 100, 2).alias("score_scaled"),
        )
    )


# ---- F5: artifact-name formatting (routes.py:252-254) ----
@_reg(
    "cp_f5_format_artifact",
    """SELECT p_partkey AS partkey, printf('%s_%d.xml', p_brand, p_size) AS artifact
       FROM part""",
)
def q_f5(spark: SparkSession, sf: str) -> DataFrame:
    part = load_table(spark, sf, "part")
    return part.select(
        F.col("p_partkey").alias("partkey"),
        F.format_string("%s_%d.xml", "p_brand", "p_size").alias("artifact"),
    )


# ---- F9: JSON payload decode (routes.py:42,51) ----
@_reg(
    "cp_f9_json_extract",
    """SELECT event_type,
              CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum
       FROM events GROUP BY event_type""",
)
def q_f9(spark: SparkSession, sf: str) -> DataFrame:
    events = load_table(spark, sf, "events")
    return events.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("k_sum")
    )


# ---- N1: explode map/array into rows (general.py:33-38) ----
@_reg(
    "cp_n1_explode",
    """SELECT tok, count(*) AS n FROM (
         SELECT unnest(list_slice(string_split(text, ' '), 1, 3)) AS tok
         FROM documents) t
       GROUP BY tok""",
)
def q_n1(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return (
        docs.select(
            F.explode(F.slice(F.split("text", " "), 1, 3)).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
    )


# ---- N4: nested catalog assembly (general.py:66-73) ----
@_reg(
    "cp_n4_catalog",
    """SELECT r.r_name AS region,
              string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
       FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
       GROUP BY r.r_name""",
)
def q_n4(spark: SparkSession, sf: str) -> DataFrame:
    nation = load_table(spark, sf, "nation")
    region = load_table(spark, sf, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "nations"
            )
        )
    )


# ---- TPC-H Q1 shape: the headline pricing-summary aggregate ----
@_reg(
    "cp_tpch_q1_pricing",
    """SELECT l_returnflag, l_linestatus,
              round(sum(l_quantity), 2) AS sum_qty,
              round(sum(l_extendedprice), 2) AS sum_base_price,
              round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
              round(avg(l_quantity), 6) AS avg_qty,
              round(avg(l_discount), 6) AS avg_disc,
              count(*) AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
       GROUP BY l_returnflag, l_linestatus""",
)
def q_tpch_q1(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---- A5×A6 matrix with margins: the engine-by-state statistics grid
# (general.py:129-144 builds the per-state dict and general.py:134-142
# the per-engine dict; SURVEY §2.4 notes both margins in one pass via
# CUBE).  Rollup/cube is a single shuffle with partial aggregation. ----
@_reg(
    "cp_a5a6_state_engine_cube",
    """SELECT o_orderstatus AS state, o_orderpriority AS engine,
              count(*) AS n, round(sum(o_totalprice), 2) AS total
       FROM orders
       GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
)
def q_a5a6_cube(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    return (
        orders.cube(
            F.col("o_orderstatus").alias("state"),
            F.col("o_orderpriority").alias("engine"),
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


# ---- N3: higher-order array filter (run_client.py:210-216 drops
# nested lines below the confidence threshold without exploding;
# Spark primitive F.filter(array, lambda) / DuckDB list_filter).
# Exercised on the embeddings array column: per-vector count and sum
# of components above a threshold — same filter-inside-array shape. ----
@_reg(
    "cp_n3_array_filter",
    """SELECT vec_id,
              len(list_filter(embedding, x -> x > 0.5)) AS n_high,
              round(coalesce(list_sum(list_filter(embedding, x -> CAST(x AS DOUBLE) > 0.5)), 0.0), 4) AS sum_high
       FROM embeddings""",
)
def q_n3_array_filter(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings")
    high = F.filter(F.col("embedding"), lambda x: x > F.lit(0.5))
    return emb.select(
        "vec_id",
        F.size(high).alias("n_high"),
        F.round(
            F.coalesce(
                F.aggregate(
                    high, F.lit(0.0),
                    lambda acc, x: acc + x.cast("double"),
                ),
                F.lit(0.0),
            ),
            4,
        ).alias("sum_high"),
    )


# ---- TPC-H Q3 shape: join + filtered agg + top-k ordering (the
# "most valuable pending work" query — reference analog: pick the
# oldest WAITING pages for the busiest requests, general.py:87-96). ----
@_reg(
    "cp_tpch_q3_topk_join",
    """SELECT l_orderkey,
              round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
              o_orderdate AS orderdate,
              o_orderpriority AS priority
       FROM customer JOIN orders ON c_custkey = o_custkey
                     JOIN lineitem ON l_orderkey = o_orderkey
       WHERE c_mktsegment = 'BUILDING'
         AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
         AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
       GROUP BY l_orderkey, o_orderdate, o_orderpriority
       ORDER BY revenue DESC, orderdate, l_orderkey
       LIMIT 10""",
)
def q_tpch_q3(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    cut = F.lit("1995-03-15 00:00:00").cast("timestamp")
    orders = load_table(spark, sf, "orders").filter(F.col("o_orderdate") < cut)
    li = load_table(spark, sf, "lineitem").filter(F.col("l_shipdate") > cut)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey", "revenue",
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_orderpriority").alias("priority"),
        )
        .orderBy(F.desc("revenue"), "orderdate", "l_orderkey")
        .limit(10)
    )


# ---- TPC-H Q5 shape: 5-way join + group-by volume (engine×region
# throughput rollup analog).  Dims broadcast; fact joins shuffle once. ----
@_reg(
    "cp_tpch_q5_region_volume",
    """SELECT n_name AS nation,
              round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
       FROM region JOIN nation ON n_regionkey = r_regionkey
                   JOIN supplier ON s_nationkey = n_nationkey
                   JOIN lineitem ON l_suppkey = s_suppkey
                   JOIN orders ON o_orderkey = l_orderkey
       WHERE r_name = 'ASIA'
         AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       GROUP BY n_name""",
)
def q_tpch_q5(spark: SparkSession, sf: str) -> DataFrame:
    region = load_table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf, "nation")
    supplier = load_table(spark, sf, "supplier")
    orders = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf, "lineitem")
    dims = (
        supplier.join(
            F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
        ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), li.l_suppkey == dims.s_suppkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# ---- TPC-H Q6 shape: tight filter + single agg — the pushdown
# showcase (all three predicates reach the scan, PLANS.md §3). ----
@_reg(
    "cp_tpch_q6_forecast_revenue",
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
              count(*) AS n_lines
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         AND l_discount BETWEEN 0.05 AND 0.07
         AND l_quantity < 24""",
)
def q_tpch_q6(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
            .alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# ---- TPC-H Q18 shape: large-order customers — aggregate, HAVING-style
# semi filter, join back, deterministic top-k. ----
@_reg(
    "cp_tpch_q18_large_orders",
    """WITH big AS (
         SELECT l_orderkey, sum(l_quantity) AS total_qty
         FROM lineitem GROUP BY l_orderkey
         HAVING sum(l_quantity) > 250)
       SELECT c_name, o_orderkey,
              CAST(o_orderdate AS TIMESTAMP) AS orderdate,
              round(o_totalprice, 2) AS totalprice,
              round(total_qty, 2) AS total_qty
       FROM big JOIN orders ON o_orderkey = l_orderkey
                JOIN customer ON c_custkey = o_custkey
       ORDER BY totalprice DESC, o_orderkey
       LIMIT 20""",
)
def q_tpch_q18(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name", "o_orderkey",
            F.col("o_orderdate").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("total_qty", 2).alias("total_qty"),
        )
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(20)
    )
