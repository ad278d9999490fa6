"""Event-stream operators Spark has no native batch primitive for —
as-of join and gap sessionization — in their scale-correct
distributed shapes, oracled by DuckDB's native implementations.

The reference's closest analogs are its timestamp bookkeeping
(Page.processing_timestamp vs finish_timestamp,
/root/reference/app/db/model.py:56-60) and the 60 s requeue sweep that
compares "latest state change" timestamps (/root/reference/app/
__init__.py:71-119) — per-entity latest-prior-event reasoning, which
is exactly the as-of relation.

Scale shapes (100 TB):
- **as-of join**: the naive formulation is a per-key inequality join —
  a BNLJ that goes quadratic on active users.  The distributed shape
  used here is union-tag + one window: tag both sides, union, ONE
  shuffle on the key, and a running `last(when(side=left, ...))` over
  the (ts, side) sort order picks each right row's latest preceding
  left row.  O(n log n) per partition, no product anywhere.  (DuckDB
  oracles it with its native ASOF LEFT JOIN.)
- **sessionization**: lag-gap flag + running sum assigns session ids
  in the same single user_id shuffle, then one partial-agg groupBy
  builds session stats.  In Structured Streaming the same semantics is
  `F.session_window(ts, '30 minutes')`; this is the batch twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import make_registry
from ..session import load_table

REGISTRY, _reg = make_registry()

SESSION_GAP_SECS = 1800  # 30-minute inactivity gap


def _secs(col):
    """Epoch seconds with microsecond fraction.  The parquet ts column
    is TIMESTAMP_NTZ, which Spark 4 refuses to cast straight to double;
    NTZ→TIMESTAMP is exact under the session's pinned UTC zone, and
    matches DuckDB's epoch(naive-as-UTC)."""
    return col.cast("timestamp").cast("double")


@_reg(
    "td_asof_attribution",
    """WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
c AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
SELECT p.event_id AS purchase_id,
       p.user_id,
       p.ts AS purchase_ts,
       c.event_id AS click_id,
       round(epoch(p.ts) - epoch(c.ts), 3) AS secs_since_click
FROM p ASOF LEFT JOIN c
  ON p.user_id = c.user_id AND p.ts >= c.ts""",
)
def q_asof_attribution(spark: SparkSession, sf: str) -> DataFrame:
    """Last-touch attribution: each purchase joined to the user's most
    recent click at-or-before it (inclusive >=) — the canonical as-of
    join.  Implemented as union-tag + one user_id window: clicks sort
    BEFORE purchases at equal ts (side asc) so the inclusive bound
    holds, and `last(..., ignorenulls)` over the running frame carries
    the latest click struct to each purchase row.  Purchases with no
    prior click keep NULL click columns (left semantics)."""
    return asof_attribution(load_table(spark, sf, "events"))


def asof_attribution(ev: DataFrame) -> DataFrame:
    """DataFrame-level core of `td_asof_attribution`.  The side tag is
    derived in a SINGLE scan (a Union of two filtered scans would read
    the source twice AND discard the child partitioning — Spark does
    not propagate hash partitioning through Union — forcing a shuffle
    even over a bucketed table).  With one scan, an input bucketed by
    user_id runs the whole as-of with NO Exchange
    (`test_bucketed_events_windows_shuffle_free`)."""
    both = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("side"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("side").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_click = F.last(
        F.when(
            F.col("side") == 0,
            F.struct(F.col("ts").alias("ts"), F.col("event_id").alias("event_id")),
        ),
        ignorenulls=True,
    ).over(w)
    return (
        both.withColumn("_lc", last_click)
        .filter(F.col("side") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("_lc.event_id").alias("click_id"),
            F.round(
                _secs(F.col("ts")) - _secs(F.col("_lc.ts")), 3
            ).alias("secs_since_click"),
        )
    )


@_reg(
    "td_sessionize",
    f"""WITH g AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > {SESSION_GAP_SECS}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, event_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM g)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       count(*) AS n_events,
       min(ts) AS start_ts, max(ts) AS end_ts,
       round(epoch(max(ts)) - epoch(min(ts)), 3) AS duration_secs
FROM s GROUP BY user_id, session_idx""",
)
def q_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based sessionization ({SESSION_GAP_SECS}s inactivity): the
    lag-gap/new-session flag and its running sum share ONE user_id
    window partitioning, and the per-session aggregate reuses the same
    distribution — one shuffle end-to-end.  Streaming twin:
    `F.session_window(ts, '30 minutes')` in a watermarked agg."""
    return sessionize_events(load_table(spark, sf, "events"))


def sessionize_events(events: DataFrame) -> DataFrame:
    """DataFrame-level core of `td_sessionize`.  Both windows and the
    final per-session aggregate need only a user_id clustering, so over
    an input bucketed by user_id the WHOLE operator is shuffle-free
    (`test_bucketed_events_windows_shuffle_free`)."""
    ev = events.select("user_id", "event_id", "ts")
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    w_lag = Window.partitionBy("user_id").orderBy(*order)
    w_run = w_lag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = _secs(F.col("ts")) - _secs(F.lag("ts").over(w_lag))
    new_session = F.when(
        gap.isNull() | (gap > SESSION_GAP_SECS), 1
    ).otherwise(0)
    sess = ev.withColumn(
        "session_idx", F.sum(new_session).over(w_run).cast("bigint")
    )
    return sess.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("start_ts"),
        F.max("ts").alias("end_ts"),
        F.round(
            _secs(F.max("ts")) - _secs(F.min("ts")), 3
        ).alias("duration_secs"),
    )


RANGE_WINDOW_SECS = 3600  # signup attribution window (1 h)


@_reg(
    "td_range_join",
    f"""WITH w AS (
  SELECT event_id AS window_id, user_id, ts AS start_ts
  FROM events WHERE event_type = 'signup'),
c AS (
  SELECT user_id, ts, event_id, value
  FROM events WHERE event_type = 'click')
SELECT w.window_id, w.user_id, w.start_ts,
       count(c.event_id) AS n_clicks,
       round(coalesce(sum(c.value), 0), 3) AS click_value
FROM w LEFT JOIN c
  ON w.user_id = c.user_id
 AND epoch(c.ts) >= epoch(w.start_ts)
 AND epoch(c.ts) <  epoch(w.start_ts) + {RANGE_WINDOW_SECS}
GROUP BY w.window_id, w.user_id, w.start_ts""",
)
def q_range_join(spark: SparkSession, sf: str) -> DataFrame:
    """Range (interval) join: every click falling inside the 1-hour
    window each signup opens, per user — left semantics (windows with
    zero clicks survive with n_clicks = 0).

    Spark has no range-join optimization: the naive `ON user AND ts
    BETWEEN` formulation plans as a per-key inequality join that goes
    quadratic on active users.  The scale shape used here is **bucketed
    interval join**: time is binned at the window duration, each
    interval explodes into the 1-2 bins it overlaps, each point carries
    its single bin, and the join becomes an EQUI-join on
    (user_id, bin) + a residual epoch filter.  Join fan-out is bounded
    by ceil(duration/bin)+1 = 2 regardless of data volume, the shuffle
    key is (user, bin) — fine-grained, skew-resistant — and since a
    point's bin is unique, no pair can appear twice (no dedup pass).
    DuckDB oracles it with its native inequality join (IEJoin)."""
    ev = load_table(spark, sf, "events")
    width = F.lit(RANGE_WINDOW_SECS)
    win = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("window_id"),
        "user_id",
        F.col("ts").alias("start_ts"),
        _secs(F.col("ts")).alias("s_lo"),
    )
    # a NULL-ts window must SURVIVE with n_clicks=0 (left semantics,
    # matching the oracle's plain LEFT JOIN): explode of a NULL
    # sequence would silently drop the row, so NULL maps to a one-row
    # NULL bin that joins nothing
    bins = F.when(
        F.col("s_lo").isNull(), F.array(F.lit(None).cast("long"))
    ).otherwise(
        F.sequence(
            F.floor(F.col("s_lo") / width),
            F.floor((F.col("s_lo") + width) / width),
        )
    )
    win = win.withColumn("bin", F.explode(bins))
    clk = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        _secs(F.col("ts")).alias("c_s"),
        F.col("event_id").alias("click_id"),
        "value",
        F.floor(_secs(F.col("ts")) / width).alias("bin"),
    )
    hits = win.join(
        clk,
        (win.user_id == clk.c_user)
        & (win.bin == clk.bin)
        & (clk.c_s >= win.s_lo)
        & (clk.c_s < win.s_lo + width),
        "left",
    )
    return hits.groupBy("window_id", "user_id", "start_ts").agg(
        F.count("click_id").alias("n_clicks"),
        F.round(F.coalesce(F.sum("value"), F.lit(0.0)), 3).alias("click_value"),
    )


@_reg(
    "td_ts_rollup",
    """SELECT 'minute' AS grain, date_trunc('minute', ts) AS bucket_ts,
       count(*) AS n_events, round(sum(value), 3) AS sum_value
FROM events GROUP BY 2
UNION ALL
SELECT 'hour', date_trunc('hour', ts), count(*), round(sum(value), 3)
FROM events GROUP BY 2
UNION ALL
SELECT 'day', date_trunc('day', ts), count(*), round(sum(value), 3)
FROM events GROUP BY 2""",
)
def q_ts_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-resolution time-series rollup (the hypertable
    continuous-aggregate shape): minute / hour / day event counts and
    value sums.  Only the MINUTE grain ever reads the raw table; hour
    re-aggregates the minute partials and day re-aggregates hour — at
    100 TB the coarse grains cost shuffles over the (tiny) finer
    aggregate instead of three full scans, which is exactly how
    continuous aggregates refresh.  Counts are exact under
    re-aggregation; sums are floating-point reassociations of the same
    addends (rounded for the oracle compare)."""
    ev = load_table(spark, sf, "events").select("ts", "value")
    minute = ev.groupBy(
        F.date_trunc("minute", "ts").alias("bucket_ts")
    ).agg(F.count("*").alias("n"), F.sum("value").alias("sv"))
    # lazy cache (NOT an eager localCheckpoint: building the plan must
    # not run a job, and cached blocks stay evictable) — the minute
    # partials materialize once and both coarser grains re-aggregate
    # the in-memory copy
    minute = minute.persist()
    hour = minute.groupBy(
        F.date_trunc("hour", "bucket_ts").alias("bucket_ts")
    ).agg(F.sum("n").alias("n"), F.sum("sv").alias("sv"))
    day = hour.groupBy(
        F.date_trunc("day", "bucket_ts").alias("bucket_ts")
    ).agg(F.sum("n").alias("n"), F.sum("sv").alias("sv"))

    def shape(df: DataFrame, grain: str) -> DataFrame:
        return df.select(
            F.lit(grain).alias("grain"),
            "bucket_ts",
            F.col("n").cast("bigint").alias("n_events"),
            F.round("sv", 3).alias("sum_value"),
        )

    return (
        shape(minute, "minute")
        .unionByName(shape(hour, "hour"))
        .unionByName(shape(day, "day"))
    )


@_reg(
    "td_funnel",
    """WITH s AS (
  SELECT user_id, min(ts) AS signup_ts
  FROM events WHERE event_type = 'signup' GROUP BY user_id),
c AS (
  SELECT e.user_id, min(e.ts) AS click_ts
  FROM events e JOIN s USING (user_id)
  WHERE e.event_type = 'click' AND e.ts >= s.signup_ts
  GROUP BY e.user_id),
p AS (
  SELECT e.user_id, min(e.ts) AS purchase_ts
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= c.click_ts
  GROUP BY e.user_id)
SELECT s.user_id, s.signup_ts, c.click_ts, p.purchase_ts,
       1 + CAST(c.user_id IS NOT NULL AS INT)
         + CAST(p.user_id IS NOT NULL AS INT) AS stage
FROM s LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)""",
)
def q_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered funnel analysis (signup → first click at-or-after it →
    first purchase at-or-after that click), per user.  Each stage is a
    per-user MIN aggregate joined to the next stage's events on the
    user key — every join is an equi-join whose build side is one row
    per user (the previous stage's aggregate), so fan-out is the
    user's own event count and the shuffle key is the natural user_id.
    Never a self-BNLJ over event pairs."""
    ev = load_table(spark, sf, "events")

    def stage(etype: str, lower: DataFrame | None, bound: str) -> DataFrame:
        e = ev.filter(F.col("event_type") == etype).select("user_id", "ts")
        if lower is not None:
            e = e.join(lower, "user_id").filter(F.col("ts") >= F.col(bound))
        return e.groupBy("user_id").agg(F.min("ts").alias(f"{etype}_ts"))

    s = stage("signup", None, "")
    c = stage("click", s, "signup_ts")
    p = stage("purchase", c, "click_ts")
    return (
        s.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "signup_ts",
            "click_ts",
            "purchase_ts",
            (
                F.lit(1)
                + F.col("click_ts").isNotNull().cast("int")
                + F.col("purchase_ts").isNotNull().cast("int")
            ).alias("stage"),
        )
    )


@_reg(
    "td_retention_cohorts",
    """WITH f AS (
  SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
  FROM events GROUP BY user_id)
SELECT f.cohort_day,
       date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset,
       count(DISTINCT e.user_id) AS n_users
FROM events e JOIN f USING (user_id)
GROUP BY f.cohort_day, day_offset""",
)
def q_retention_cohorts(spark: SparkSession, sf: str) -> DataFrame:
    """Retention cohort triangle: users grouped by first-seen day, and
    for each (cohort, day-offset) the count of distinct users active
    that day.  Two shuffles: the per-user first-event aggregate, and
    the (cohort, offset) count-distinct — the join between them keys on
    user_id with a one-row-per-user build side.  The cohort dimension
    is bounded by calendar days, so the final agg is small no matter
    the corpus size."""
    ev = load_table(spark, sf, "events").select("user_id", "ts")
    f = ev.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("cohort_day")
    )
    return (
        ev.join(f, "user_id")
        .select(
            "cohort_day",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_day")).alias(
                "day_offset"
            ),
            "user_id",
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


# ---- trailing range-frame rolling aggregate ----

ROLL_WINDOW_S = 7 * 86400  # 7 days


@_reg(
    "td_rolling_7d",
    f"""SELECT user_id, event_id,
       count(*) OVER w AS n_7d,
       round(sum(value) OVER w, 4) AS sum_7d
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch(ts)
             RANGE BETWEEN {ROLL_WINDOW_S} PRECEDING AND CURRENT ROW)""",
)
def q_rolling_7d(spark: SparkSession, sf: str) -> DataFrame:
    """Trailing-7-day rolling count/sum per user — the RANGE frame
    (value-based, so same-timestamp rows share one frame and gaps in
    time shrink it) rather than a ROWS frame.  Ordering on epoch
    seconds keeps the frame arithmetic identical in both engines.

    Scale shape: one user_id shuffle + an in-partition ordered scan;
    the frame is bounded by the retention window, so state per key is
    O(events-in-7-days), never the full history.  Sum rounded at 4dp:
    Spark re-evaluates frames linearly while DuckDB uses segment trees
    — association order differs at the last ulp."""
    ev = load_table(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(_secs(F.col("ts")))
        .rangeBetween(-ROLL_WINDOW_S, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.count("*").over(w).alias("n_7d"),
        F.round(F.sum("value").over(w), 4).alias("sum_7d"),
    )


# ---- event-type transition matrix (Markov chain estimation) ----
@_reg(
    "td_event_markov",
    """WITH ordered AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events),
pairs AS (
  SELECT prev_type, event_type AS next_type, count(*) AS n
  FROM ordered WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type)
SELECT prev_type, next_type, n,
       round(n / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE), 6)
         AS p
FROM pairs""",
)
def q_event_markov(spark: SparkSession, sf: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences — the behavioral-model estimation step behind funnel
    design and anomaly scoring (which observed chains are improbable).

    Scale shape: ONE user_id shuffle for the lag window (the same
    partitioning sessionize and the rolling window already use — on a
    user-bucketed layout it is shuffle-free), then a combine-shuffled
    count over at most |types|² keys and a window over that tiny
    aggregate.  Probabilities are exact integer ratios rounded at 6dp,
    so cross-engine summation order cannot flip the hash."""
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id", "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
    )
    wp = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type", "next_type", "n",
        F.round(F.col("n") / F.sum("n").over(wp).cast("double"), 6).alias("p"),
    )


# ---- semi-structured props via VariantType (Spark 4) ----
@_reg(
    "td_event_props_variant",
    """SELECT event_type,
       CAST(floor(CAST(json_extract(props, '$.k') AS INTEGER) / 10.0)
            AS INTEGER) AS k_bucket,
       count(*) AS n,
       CAST(sum(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT)
         AS k_sum
FROM events
GROUP BY event_type,
         CAST(floor(CAST(json_extract(props, '$.k') AS INTEGER) / 10.0)
              AS INTEGER)""",
)
def q_event_props_variant(spark: SparkSession, sf: str) -> DataFrame:
    """Aggregate over a semi-structured payload column through Spark
    4's VariantType: ``parse_json`` once into the binary variant
    encoding, then typed ``try_variant_get`` path extraction — the
    open-lakehouse answer to schemaless event properties (vs. string
    re-parsing per access or a rigid struct migration).

    Scale shape: parse + extract are per-row codegen expressions (no
    Python, no shuffle); the group-by is an ordinary combine-shuffled
    aggregate over |types|×|buckets| keys.  At 100 TB the variant
    column prunes and pushes like any other — and a real deployment
    parses ONCE at ingest and stores variant, making every downstream
    path access shredding-cheap; this query is that downstream shape.
    (DuckDB oracles the same result from its native JSON extraction —
    integer k, so bucket arithmetic is exact in both engines.)"""
    ev = load_table(spark, sf, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy(
            "event_type",
            # EXPLICIT floor on both sides: neither engine's native
            # idiom agrees for negative k (Spark (k/10).cast('int')
            # truncates toward zero; DuckDB `//` ALSO truncates,
            # verified (-5)//10 = 0 — not floor as r4 ADVICE claimed),
            # so both dialects spell floor(k / 10.0) literally
            F.floor(F.col("k") / F.lit(10)).cast("int").alias("k_bucket"),
        )
        .agg(F.count("*").alias("n"), F.sum("k").cast("long").alias("k_sum"))
    )


# ---- event-type co-occurrence (market-basket over user baskets) ----


@_reg(
    "td_event_cooccurrence",
    """WITH baskets AS (
  SELECT DISTINCT user_id, event_type FROM events),
user_n AS (SELECT count(DISTINCT user_id) AS n_users FROM events),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         count(*) AS n_both
  FROM baskets a JOIN baskets b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type),
singles AS (
  SELECT event_type, count(*) AS n FROM baskets GROUP BY event_type)
SELECT p.type_a, p.type_b, p.n_both,
       round(p.n_both / CAST(u.n_users AS DOUBLE), 6) AS support,
       round(p.n_both / CAST(sa.n AS DOUBLE), 6) AS confidence_a_b,
       round((p.n_both * CAST(u.n_users AS DOUBLE)) / (sa.n * sb.n), 6)
         AS lift
FROM pairs p
JOIN singles sa ON sa.event_type = p.type_a
JOIN singles sb ON sb.event_type = p.type_b
CROSS JOIN user_n u""",
)
def q_event_cooccurrence(spark: SparkSession, sf: str) -> DataFrame:
    """Market-basket association mining over user event baskets:
    support, confidence and lift for every event-type pair that
    co-occurs in at least one user's history — the co-engagement /
    cross-sell query of a product-analytics plane (and the A-priori
    first pass: pairs above a support floor seed longer itemsets).

    Scale shape: the basket relation is DISTINCT (user, type) — one
    combine-shuffled dedup, after which each user contributes at most
    |types| rows, so the per-user self-join fans out to at most
    |types|² rows per user (bounded constant, never corpus-quadratic;
    the same per-key-bounded-build contract as td_funnel's per-user
    MIN chains).  Pair counts collapse to ≤|types|² rows; the
    singles/user_n enrichments are tiny broadcasts onto that bounded
    relation.  Events are scanned once."""
    ev = load_table(spark, sf, "events")
    baskets = ev.select("user_id", "event_type").distinct()
    user_n = ev.agg(F.count_distinct("user_id").alias("n_users"))
    a = baskets.select("user_id", F.col("event_type").alias("type_a"))
    b = baskets.select("user_id", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_both"))
    )
    singles = baskets.groupBy("event_type").agg(F.count("*").alias("n"))
    sa = singles.select(
        F.col("event_type").alias("type_a"), F.col("n").alias("n_a")
    )
    sb = singles.select(
        F.col("event_type").alias("type_b"), F.col("n").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .crossJoin(F.broadcast(user_n))
        .select(
            "type_a", "type_b", "n_both",
            F.round(F.col("n_both") / F.col("n_users").cast("double"), 6)
            .alias("support"),
            F.round(F.col("n_both") / F.col("n_a").cast("double"), 6)
            .alias("confidence_a_b"),
            F.round(
                (F.col("n_both") * F.col("n_users").cast("double"))
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )


# ---- robust outlier ranking (median/MAD z-scores per event type) ----
OUTLIER_TOP_K = 5


@_reg(
    "td_event_robust_outliers",
    f"""WITH med AS (
  SELECT event_type, median(value) AS med FROM events GROUP BY event_type),
dev AS (
  SELECT e.event_id, e.event_type, e.value, abs(e.value - m.med) AS ad,
         m.med
  FROM events e JOIN med m ON m.event_type = e.event_type),
mad AS (
  SELECT event_type, median(ad) AS mad FROM dev GROUP BY event_type),
scored AS (
  SELECT d.event_id, d.event_type, d.value,
         round(abs(d.value - d.med) / (1.4826 * m.mad), 6) AS robust_z
  FROM dev d JOIN mad m ON m.event_type = d.event_type
  WHERE m.mad > 0),
ranked AS (
  SELECT event_type, event_id, value, robust_z,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY robust_z DESC, event_id) AS rank
  FROM scored)
SELECT event_type, rank, event_id, round(value, 6) AS value, robust_z
FROM ranked WHERE rank <= {OUTLIER_TOP_K}""",
)
def q_robust_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """Median/MAD outlier detection per event type: the top-{OUTLIER_TOP_K}
    most extreme events by robust z-score |v - median| / (1.4826·MAD).
    Unlike mean/std z-scores, the estimator itself is immune to the
    outliers it hunts — the standard data-quality screen for metric
    streams.

    Scale shape: two grouped EXACT medians over the |types|-bounded key
    (Spark's percentile is a mergeable typed aggregate; at 100 TB the
    documented swap is percentile_approx, the same GK-sketch trade
    recorded for td_length_deciles), each broadcast back onto the
    events relation; scoring is per-row codegen and the final rank is
    a per-type top-k window over a relation the score filter keeps
    full-size — the one full shuffle is the rank's partitionBy, on the
    same low-cardinality key a salted two-phase top-k would use if
    |types| were ever hot."""
    ev = load_table(spark, sf, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_id", "event_type", "value", "med",
        F.abs(F.col("value") - F.col("med")).alias("ad"),
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(ad, 0.5)").alias("mad")
    )
    scored = (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("mad") > 0)
        .select(
            "event_id", "event_type", "value",
            F.round(
                F.abs(F.col("value") - F.col("med"))
                / (F.lit(1.4826) * F.col("mad")),
                6,
            ).alias("robust_z"),
        )
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("robust_z"), "event_id"
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= OUTLIER_TOP_K)
        .select(
            "event_type", "rank", "event_id",
            F.round("value", 6).alias("value"), "robust_z",
        )
    )
