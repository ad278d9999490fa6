"""State-machine lifecycle transforms exposed through the driver's
oracle gate: both engines run over the same inline VALUES fixture (no
parquet dependency), so claim/requeue/expire/completion semantics are
hash-verified like every other operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.statemachine import (
    claim_pages, expire_old, request_completion, requeue_timed_out,
)

NOW = "2024-02-01 00:00:00"

_ROWS = [
    ("p1", "r1", 1, "WAITING", None, "2024-01-31 23:00:00", None, None),
    ("p2", "r1", 2, "WAITING", None, "2024-01-31 22:00:00", None, None),
    ("p3", "r1", 1, "PROCESSING", None, "2024-01-31 21:00:00", "2024-01-31 23:58:00", None),
    ("p4", "r2", 1, "PROCESSING", None, "2024-01-31 21:00:00", "2024-01-31 23:59:30", None),
    ("p5", "r2", 1, "PROCESSED", 93.5, "2024-01-20 10:00:00", None, "2024-01-31 12:00:00"),
    ("p6", "r3", 2, "PROCESSED", 81.0, "2024-01-20 10:00:00", None, "2024-01-21 12:00:00"),
    ("p7", "r3", 2, "NOT_FOUND", None, "2024-01-20 10:00:00", None, "2024-01-21 12:00:00"),
    ("p8", "r4", 3, "WAITING", None, "2024-01-31 20:00:00", None, None),
    ("p9", "r4", 1, "CANCELED", None, "2024-01-10 09:00:00", None, "2024-01-10 10:00:00"),
]

_SCHEMA = (
    "page_id string, request_id string, engine_id int, state string, "
    "score double, creation_ts string, processing_ts string, finish_ts string"
)


def pages_fixture(spark: SparkSession) -> DataFrame:
    df = spark.createDataFrame(_ROWS, _SCHEMA)
    for c in ("creation_ts", "processing_ts", "finish_ts"):
        df = df.withColumn(c, df[c].cast("timestamp"))
    return df


def _sql_rows() -> str:
    vals = []
    for r in _ROWS:
        cells = []
        for v in r:
            if v is None:
                cells.append("NULL")
            elif isinstance(v, str):
                cells.append(f"'{v}'")
            else:
                cells.append(str(v))
        vals.append("(" + ", ".join(cells) + ")")
    return ",\n    ".join(vals)


_SQL_PAGES = f"""pages_raw(page_id, request_id, engine_id, state, score,
             creation_ts_s, processing_ts_s, finish_ts_s) AS (
  VALUES
    {_sql_rows()}
),
pages AS (
  SELECT page_id, request_id, engine_id, state, CAST(score AS DOUBLE) AS score,
         CAST(creation_ts_s AS TIMESTAMP) AS creation_ts,
         CAST(processing_ts_s AS TIMESTAMP) AS processing_ts,
         CAST(finish_ts_s AS TIMESTAMP) AS finish_ts
  FROM pages_raw
)"""

from ..registry import make_registry

REGISTRY, _reg = make_registry()


def q_claim(spark: SparkSession, sf: str) -> DataFrame:
    return claim_pages(pages_fixture(spark), engine_id=1, now=NOW, max_claims=2).select(
        "page_id", "request_id", "engine_id", "state", "processing_ts"
    )


REGISTRY["cp_sm_claim"] = (
    q_claim,
    f"""WITH {_SQL_PAGES}
SELECT page_id, request_id, engine_id,
       'PROCESSING' AS state,
       TIMESTAMP '{NOW}' AS processing_ts
FROM (
  SELECT *, row_number() OVER (
    ORDER BY (engine_id = 1) DESC, creation_ts ASC, page_id ASC) AS rn
  FROM pages WHERE state = 'WAITING') t
WHERE rn <= 2""",
)


def q_requeue(spark: SparkSession, sf: str) -> DataFrame:
    return requeue_timed_out(pages_fixture(spark), NOW).select(
        "page_id", "state", "processing_ts"
    )


REGISTRY["cp_sm_requeue"] = (
    q_requeue,
    f"""WITH {_SQL_PAGES}
SELECT page_id,
       CASE WHEN state = 'PROCESSING'
                 AND processing_ts < TIMESTAMP '{NOW}' - INTERVAL 60 SECOND
            THEN 'WAITING' ELSE state END AS state,
       CASE WHEN state = 'PROCESSING'
                 AND processing_ts < TIMESTAMP '{NOW}' - INTERVAL 60 SECOND
            THEN NULL ELSE processing_ts END AS processing_ts
FROM pages""",
)


def q_expire(spark: SparkSession, sf: str) -> DataFrame:
    return expire_old(pages_fixture(spark), NOW).select("page_id", "state")


REGISTRY["cp_sm_expire"] = (
    q_expire,
    f"""WITH {_SQL_PAGES}
SELECT page_id,
       CASE WHEN state IN ('PROCESSED','NOT_FOUND','INVALID_FILE','PROCESSING_FAILED')
                 AND finish_ts IS NOT NULL
                 AND finish_ts < TIMESTAMP '{NOW}' - INTERVAL 7 DAY
            THEN 'EXPIRED' ELSE state END AS state
FROM pages""",
)


def q_completion(spark: SparkSession, sf: str) -> DataFrame:
    return request_completion(pages_fixture(spark))


REGISTRY["cp_sm_completion"] = (
    q_completion,
    f"""WITH {_SQL_PAGES}
SELECT request_id,
       count(*) AS n_total,
       count(*) FILTER (WHERE state IN
         ('PROCESSED','NOT_FOUND','INVALID_FILE','PROCESSING_FAILED',
          'EXPIRED','CANCELED')) AS n_terminal,
       round(count(*) FILTER (WHERE state IN
         ('PROCESSED','NOT_FOUND','INVALID_FILE','PROCESSING_FAILED',
          'EXPIRED','CANCELED')) / CAST(count(*) AS DOUBLE), 6) AS status,
       (count(*) FILTER (WHERE state IN
         ('PROCESSED','NOT_FOUND','INVALID_FILE','PROCESSING_FAILED',
          'EXPIRED','CANCELED')) = count(*)) AS done,
       round(avg(CASE WHEN state = 'PROCESSED' THEN score END), 6) AS avg_quality
FROM pages GROUP BY request_id""",
)
