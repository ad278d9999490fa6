"""State-machine lifecycle transforms exposed through the driver's
oracle gate: both engines run over the same inline VALUES fixture (no
parquet dependency), so claim/requeue/expire/completion semantics are
hash-verified like every other operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.admin import suspend_keys, validate_downloads
from ..plans.statemachine import (
    cancel_pages,
    claim_pages,
    claim_pages_authorized,
    expire_old,
    finish_requests,
    request_completion,
    requeue_timed_out,
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
    ("p10", "r3", 2, "EXPIRED", None, "2024-01-01 08:00:00", None, "2024-01-02 09:00:00"),
    ("p11", "r6", 1, "PROCESSED", 77.0, "2024-01-24 10:00:00", None, "2024-01-26 00:00:00"),
]

# Auth dimensions for the composed claim / finish / download surfaces:
# requests → owning api key (+ any pre-existing request finish_ts),
# api_keys → suspension flag (general.py:90-96, suspend_users.py:36-46).
_REQ_ROWS = [
    ("r1", "k1", 1, None),
    ("r2", "k1", 1, None),
    ("r3", "k2", 2, None),
    ("r4", "k3", 3, None),                      # owned by a suspended key
    ("r5", "k2", 1, None),                      # zero pages
    ("r6", "k2", 2, "2024-01-25 00:00:00"),     # already stamped
]
_REQ_SCHEMA = "request_id string, api_key_id string, engine_id int, finish_ts string"

_KEY_ROWS = [
    ("k1", "alpha", False),
    ("k2", "bravo", False),
    ("k3", "charlie", True),
]
_KEY_SCHEMA = "key_id string, api_string string, suspension boolean"

# One download probe per branch of the routes.py:136-166 taxonomy.
_DL_ROWS = [
    ("alpha", "r2", "p5", "txt"),       # 200 ok
    ("alpha", "r9", "p1", "txt"),       # 404 request_not_found
    ("bravo", "r1", "p1", "txt"),       # 401 wrong_api_key (r1 is alpha's)
    ("alpha", "r1", "pX", "txt"),       # 404 page_not_found
    ("bravo", "r3", "p10", "page"),     # 404 page_expired
    ("alpha", "r1", "p1", "alto"),      # 404 page_not_processed (WAITING)
    ("bravo", "r3", "p6", "pdf"),       # 400 bad_format
]
_DL_SCHEMA = "api_string string, request_id string, page_name string, format string"

_SCHEMA = (
    "page_id string, request_id string, engine_id int, state string, "
    "score double, creation_ts string, processing_ts string, finish_ts string"
)


def pages_fixture(spark: SparkSession) -> DataFrame:
    df = spark.createDataFrame(_ROWS, _SCHEMA)
    for c in ("creation_ts", "processing_ts", "finish_ts"):
        df = df.withColumn(c, df[c].cast("timestamp"))
    return df


def requests_fixture(spark: SparkSession) -> DataFrame:
    df = spark.createDataFrame(_REQ_ROWS, _REQ_SCHEMA)
    return df.withColumn("finish_ts", df["finish_ts"].cast("timestamp"))


def keys_fixture(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(_KEY_ROWS, _KEY_SCHEMA)


def downloads_fixture(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(_DL_ROWS, _DL_SCHEMA)


def _sql_values(rows) -> str:
    vals = []
    for r in rows:
        cells = []
        for v in r:
            if v is None:
                cells.append("NULL")
            elif isinstance(v, bool):
                cells.append("TRUE" if v else "FALSE")
            elif isinstance(v, str):
                cells.append(f"'{v}'")
            else:
                cells.append(str(v))
        vals.append("(" + ", ".join(cells) + ")")
    return ",\n    ".join(vals)


def _sql_rows() -> str:
    return _sql_values(_ROWS)


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


# ---- Round-2 lifecycle surfaces: cancel, suspension-aware claim,
# request finish propagation, key-suspension sweep, download
# validation (VERDICT r1 "What's missing" #1-#5). ----

_SQL_REQUESTS = f"""requests_raw(request_id, api_key_id, engine_id, finish_ts_s) AS (
  VALUES
    {_sql_values(_REQ_ROWS)}
),
requests AS (
  SELECT request_id, api_key_id, engine_id,
         CAST(finish_ts_s AS TIMESTAMP) AS finish_ts
  FROM requests_raw
)"""

_SQL_KEYS = f"""api_keys(key_id, api_string, suspension) AS (
  VALUES
    {_sql_values(_KEY_ROWS)}
)"""

_SQL_DOWNLOADS = f"""downloads(api_string, request_id, page_name, format) AS (
  VALUES
    {_sql_values(_DL_ROWS)}
)"""

_TERMINAL_SQL = ("('PROCESSED','NOT_FOUND','INVALID_FILE',"
                 "'PROCESSING_FAILED','EXPIRED','CANCELED')")


def q_cancel(spark: SparkSession, sf: str) -> DataFrame:
    return cancel_pages(pages_fixture(spark), "r1", NOW).select(
        "page_id", "state", "finish_ts"
    )


REGISTRY["cp_sm_cancel"] = (
    q_cancel,
    f"""WITH {_SQL_PAGES}
SELECT page_id,
       CASE WHEN request_id = 'r1'
                 AND state IN ('CREATED','WAITING','PROCESSING')
            THEN 'CANCELED' ELSE state END AS state,
       CASE WHEN request_id = 'r1'
                 AND state IN ('CREATED','WAITING','PROCESSING')
            THEN TIMESTAMP '{NOW}' ELSE finish_ts END AS finish_ts
FROM pages""",
)


def q_claim_auth(spark: SparkSession, sf: str) -> DataFrame:
    return claim_pages_authorized(
        pages_fixture(spark),
        requests_fixture(spark),
        keys_fixture(spark),
        engine_id=1,
        now=NOW,
        max_claims=3,
    ).select("page_id", "request_id", "engine_id", "state", "processing_ts")


REGISTRY["cp_sm_claim_auth"] = (
    q_claim_auth,
    f"""WITH {_SQL_PAGES},
{_SQL_REQUESTS},
{_SQL_KEYS}
SELECT page_id, request_id, engine_id,
       'PROCESSING' AS state,
       TIMESTAMP '{NOW}' AS processing_ts
FROM (
  SELECT p.*, row_number() OVER (
    ORDER BY (p.engine_id = 1) DESC, p.creation_ts ASC, p.page_id ASC) AS rn
  FROM pages p
  JOIN requests r ON p.request_id = r.request_id
  JOIN api_keys k ON r.api_key_id = k.key_id AND NOT k.suspension
  WHERE p.state = 'WAITING') t
WHERE rn <= 3""",
)


def q_finish(spark: SparkSession, sf: str) -> DataFrame:
    return finish_requests(pages_fixture(spark), requests_fixture(spark), NOW)


REGISTRY["cp_sm_finish"] = (
    q_finish,
    f"""WITH {_SQL_PAGES},
{_SQL_REQUESTS},
done AS (
  SELECT request_id FROM pages GROUP BY request_id
  HAVING count(*) FILTER (WHERE state IN {_TERMINAL_SQL}) = count(*)
)
SELECT r.request_id, r.api_key_id, r.engine_id,
       CASE WHEN d.request_id IS NOT NULL AND r.finish_ts IS NULL
            THEN TIMESTAMP '{NOW}' ELSE r.finish_ts END AS finish_ts
FROM requests r LEFT JOIN done d ON r.request_id = d.request_id""",
)


def q_suspend(spark: SparkSession, sf: str) -> DataFrame:
    return suspend_keys(keys_fixture(spark), ["alpha"])


REGISTRY["cp_admin_suspend"] = (
    q_suspend,
    f"""WITH {_SQL_KEYS}
SELECT key_id, api_string, api_string NOT IN ('alpha') AS suspension
FROM api_keys""",
)


def q_dl_validate(spark: SparkSession, sf: str) -> DataFrame:
    return validate_downloads(
        downloads_fixture(spark),
        requests_fixture(spark),
        pages_fixture(spark),
        keys_fixture(spark),
    )


REGISTRY["cp_dl_validate"] = (
    q_dl_validate,
    f"""WITH {_SQL_PAGES},
{_SQL_REQUESTS},
{_SQL_KEYS},
{_SQL_DOWNLOADS}
SELECT d.api_string, d.request_id, d.page_name, d.format,
       CASE WHEN r.request_id IS NULL THEN 404
            WHEN r.api_key_id IS DISTINCT FROM k.key_id THEN 401
            WHEN p.page_id IS NULL THEN 404
            WHEN p.state = 'EXPIRED' THEN 404
            WHEN p.state <> 'PROCESSED' THEN 404
            WHEN d.format NOT IN ('alto', 'page', 'txt') THEN 400
            ELSE 200 END AS http_status,
       CASE WHEN r.request_id IS NULL THEN 'request_not_found'
            WHEN r.api_key_id IS DISTINCT FROM k.key_id THEN 'wrong_api_key'
            WHEN p.page_id IS NULL THEN 'page_not_found'
            WHEN p.state = 'EXPIRED' THEN 'page_expired'
            WHEN p.state <> 'PROCESSED' THEN 'page_not_processed'
            WHEN d.format NOT IN ('alto', 'page', 'txt') THEN 'bad_format'
            ELSE 'ok' END AS reason
FROM downloads d
LEFT JOIN requests r ON d.request_id = r.request_id
LEFT JOIN api_keys k ON d.api_string = k.api_string
LEFT JOIN pages p ON d.request_id = p.request_id AND d.page_name = p.page_id""",
)


# ---- Catalog admin analogs: add_new_user.py / add_new_engine_version.py ----

from ..plans.admin import add_api_key, add_engine_version

_KEY5_ROWS = [
    ("k1", "alpha", "alice", "USER", False),
    ("k2", "bravo", "bob", "SUPER_USER", False),
    ("k3", "charlie", "carol", "USER", True),
]
_KEY5_SCHEMA = (
    "key_id string, api_string string, owner string, "
    "permission string, suspension boolean"
)

_ENGINE_ROWS = [(1, "pero_printed", "printed models"), (2, "pero_hand", None)]
_VERSION_ROWS = [(1, 1, "2023-01-01", None), (2, 2, "2023-06-01", "v2")]
_MODEL_ROWS = [(1, "layout_base"), (2, "ocr_base")]
_LINK_ROWS = [(1, 1), (1, 2), (2, 1), (2, 2)]


def q_add_key(spark: SparkSession, sf: str) -> DataFrame:
    keys = spark.createDataFrame(_KEY5_ROWS, _KEY5_SCHEMA)
    return add_api_key(keys, "dora", "USER")


REGISTRY["cp_admin_add_key"] = (
    q_add_key,
    f"""WITH keys5(key_id, api_string, owner, permission, suspension) AS (
  VALUES
    {_sql_values(_KEY5_ROWS)}
)
SELECT * FROM keys5
UNION ALL
SELECT 'k4',
       rtrim(to_base64(unhex(sha256('dora:USER:4'))), '='),
       'dora', 'USER', FALSE""",
)


def q_add_engine(spark: SparkSession, sf: str) -> DataFrame:
    engines = spark.createDataFrame(
        _ENGINE_ROWS, "engine_id int, name string, description string"
    )
    versions = spark.createDataFrame(
        _VERSION_ROWS,
        "version_id int, engine_id int, version string, description string",
    )
    models = spark.createDataFrame(_MODEL_ROWS, "model_id int, name string")
    links = spark.createDataFrame(_LINK_ROWS, "version_id int, model_id int")
    dims = add_engine_version(
        engines, versions, models, links,
        engine_name="great_ocr",
        version_name="2024-02-01",
        new_model_names=["ocr_great", "layout_great"],
    )
    return (
        dims["links"]
        .join(dims["versions"].select("version_id", "engine_id", "version"), "version_id")
        .join(
            dims["engines"].select(
                "engine_id", F.col("name").alias("engine_name")
            ),
            "engine_id",
        )
        .join(
            dims["models"].select(
                "model_id", F.col("name").alias("model_name")
            ),
            "model_id",
        )
        .select("engine_id", "engine_name", "version", "model_name")
    )


REGISTRY["cp_admin_add_engine"] = (
    q_add_engine,
    f"""WITH engines(engine_id, name, description) AS (
  VALUES {_sql_values(_ENGINE_ROWS)}
),
versions(version_id, engine_id, version, description) AS (
  VALUES {_sql_values(_VERSION_ROWS)}
),
models(model_id, name) AS (
  VALUES {_sql_values(_MODEL_ROWS)}
),
links(version_id, model_id) AS (
  VALUES {_sql_values(_LINK_ROWS)}
),
new_engine AS (
  SELECT (SELECT max(engine_id) + 1 FROM engines) AS engine_id,
         'great_ocr' AS name, NULL AS description
),
all_engines AS (SELECT * FROM engines UNION ALL SELECT * FROM new_engine),
new_version AS (
  SELECT (SELECT max(version_id) + 1 FROM versions) AS version_id,
         (SELECT engine_id FROM new_engine) AS engine_id,
         '2024-02-01' AS version, NULL AS description
),
all_versions AS (SELECT * FROM versions UNION ALL SELECT * FROM new_version),
new_models AS (
  SELECT (SELECT max(model_id) FROM models)
           + row_number() OVER (ORDER BY name) AS model_id,
         name
  FROM (VALUES ('ocr_great'), ('layout_great')) AS t(name)
),
all_models AS (SELECT * FROM models UNION ALL SELECT * FROM new_models),
all_links AS (
  SELECT * FROM links
  UNION ALL
  SELECT v.version_id, m.model_id FROM new_version v CROSS JOIN new_models m
)
SELECT e.engine_id, e.name AS engine_name, v.version, m.name AS model_name
FROM all_links l
JOIN all_versions v USING (version_id)
JOIN all_engines e USING (engine_id)
JOIN all_models m USING (model_id)""",
)
