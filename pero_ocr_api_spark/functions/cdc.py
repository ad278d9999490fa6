"""Change-data-capture shapes: MERGE-style upsert and SCD2 history.

The reference mutates rows in place (SQLAlchemy UPDATEs on page state,
/root/reference/app/db/model.py; processing_client re-uploads results
over prior ones).  A lakehouse expresses the same lifecycle as
set-based operations over immutable snapshots:

- **upsert (MERGE INTO ... WHEN MATCHED UPDATE / NOT MATCHED INSERT)**
  = source ∪ (target ⟕anti source): one anti join on the key — the
  runtime bloom filter (tests/test_runtime_filter.py) cuts the target
  scan when the change set is selective, and the result commits as a
  new snapshot via the checkpoint manifest plane;
- **SCD2 versioning** = change-point detection per key (lag) + validity
  intervals (lead) — one keyed window shuffle, never a self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import make_registry
from ..session import load_table

REGISTRY, _reg = make_registry()


def merge_upsert(target: DataFrame, source: DataFrame, key: str) -> DataFrame:
    """MERGE semantics over whole rows: source rows win on key match,
    unmatched target rows survive, unmatched source rows insert.
    Equivalent to MERGE INTO t USING s ON t.key = s.key
    WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *.

    Scale shape: ONE left-anti join on the key (AQE picks broadcast
    when the change set is small, shuffle otherwise; the runtime bloom
    filter prunes the target scan either way) + a union.  No window,
    no full outer join — the matched rows never need pairing because
    the source row IS the result."""
    return source.unionByName(target.join(source.select(key), key, "left_anti"))


# deterministic synthetic change set over `documents`: every 10th doc
# gets re-texted (UPDATE), and 5 brand-new docs insert
_UPSERT_SRC_SQL = """src AS (
  SELECT doc_id, upper(text) AS text, lang, source,
         CAST(length(upper(text)) AS BIGINT) AS n_chars
  FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, 'new doc ' || doc_id AS text,
         'en' AS lang, 'ingest' AS source,
         CAST(length('new doc ' || doc_id) AS BIGINT) AS n_chars
  FROM documents WHERE doc_id < 5)"""


@_reg(
    "td_merge_upsert",
    f"""WITH {_UPSERT_SRC_SQL}
SELECT doc_id, text, lang, source, n_chars FROM src
UNION ALL
SELECT t.doc_id, t.text, t.lang, t.source, t.n_chars
FROM documents t
WHERE NOT EXISTS (SELECT 1 FROM src WHERE src.doc_id = t.doc_id)""",
)
def q_merge_upsert(spark: SparkSession, sf: str) -> DataFrame:
    """Registry probe of :func:`merge_upsert` with a deterministic
    change set: updates (every 10th doc re-texted) + inserts (5 new
    ids).  The oracle is the literal MERGE expansion in SQL."""
    target = load_table(spark, sf, "documents")
    updates = target.filter(F.col("doc_id") % 10 == 0).select(
        "doc_id",
        F.upper("text").alias("text"),
        "lang",
        "source",
        F.length(F.upper("text")).cast("long").alias("n_chars"),
    )
    inserts = target.filter(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.lit("new doc "), F.col("doc_id").cast("string")).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("ingest").alias("source"),
        F.length(
            F.concat(F.lit("new doc "), F.col("doc_id").cast("string"))
        ).cast("long").alias("n_chars"),
    )
    source = updates.unionByName(inserts)
    return merge_upsert(
        target.select("doc_id", "text", "lang", "source", "n_chars"),
        source,
        "doc_id",
    )


def scd2_versions(
    events: DataFrame,
    key: str = "user_id",
    attr: str = "event_type",
    ts: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Slowly-changing-dimension type-2 history of ``attr`` per ``key``:
    one row per change point, with [valid_from, valid_to) intervals
    (valid_to NULL = current) and a dense version number.

    Scale shape: one window shuffle on the key; change-point detection
    is lag() != current (a row-local comparison after the sort), and
    validity intervals come from lead() over the ALREADY-FILTERED
    change points — never a self-join or a global sort."""
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    chg = (
        events.select(key, attr, ts, tiebreak)
        .withColumn("_prev", F.lag(attr).over(w))
        .filter(F.col("_prev").isNull() | (F.col(attr) != F.col("_prev")))
    )
    w2 = Window.partitionBy(key).orderBy(ts, tiebreak)
    return chg.select(
        F.col(key),
        F.col(attr),
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
    )


@_reg(
    "td_scd2_versions",
    """WITH chg AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events),
cp AS (
  SELECT user_id, event_type, ts, event_id FROM chg
  WHERE prev IS NULL OR event_type <> prev)
SELECT user_id, event_type,
       ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id) AS valid_to,
       CAST(row_number() OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS BIGINT) AS version
FROM cp""",
)
def q_scd2_versions(spark: SparkSession, sf: str) -> DataFrame:
    """SCD2 history of each user's event_type over the events table."""
    return scd2_versions(load_table(spark, sf, "events"))
