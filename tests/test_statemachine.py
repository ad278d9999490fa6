"""State-machine lifecycle sweeps (reference background jobs,
app/__init__.py:71-151) as deterministic batch transforms."""

from pero_ocr_api_spark.constants import (
    STATE_EXPIRED, STATE_PROCESSED, STATE_PROCESSING, STATE_WAITING,
)
from pero_ocr_api_spark.plans.statemachine import (
    claim_pages, expire_old, request_completion, requeue_timed_out,
)

NOW = "2024-02-01 00:00:00"

ROWS = [
    # page_id, request_id, engine_id, state, score, creation_ts, processing_ts, finish_ts
    ("p1", "r1", 1, "WAITING", None, "2024-01-31 23:00:00", None, None),
    ("p2", "r1", 2, "WAITING", None, "2024-01-31 22:00:00", None, None),
    ("p3", "r1", 1, "PROCESSING", None, "2024-01-31 21:00:00", "2024-01-31 23:58:00", None),
    ("p4", "r2", 1, "PROCESSING", None, "2024-01-31 21:00:00", "2024-01-31 23:59:30", None),
    ("p5", "r2", 1, "PROCESSED", 93.5, "2024-01-20 10:00:00", None, "2024-01-31 12:00:00"),
    ("p6", "r3", 2, "PROCESSED", 81.0, "2024-01-20 10:00:00", None, "2024-01-21 12:00:00"),
    ("p7", "r3", 2, "NOT_FOUND", None, "2024-01-20 10:00:00", None, "2024-01-21 12:00:00"),
]
SCHEMA = (
    "page_id string, request_id string, engine_id int, state string, "
    "score double, creation_ts string, processing_ts string, "
    "finish_ts string"
)


def _pages(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    for c in ("creation_ts", "processing_ts", "finish_ts"):
        df = df.withColumn(c, df[c].cast("timestamp"))
    return df


def test_claim_prefers_engine_then_falls_back(spark):
    pages = _pages(spark)
    got = claim_pages(pages, engine_id=1, now=NOW, max_claims=2).collect()
    ids = [r.page_id for r in got]
    # p1 (engine 1, preferred) first despite p2 being older; then fallback p2
    assert ids == ["p1", "p2"]
    assert all(r.state == STATE_PROCESSING for r in got)
    assert all(str(r.processing_ts) == NOW for r in got)


def test_requeue_timed_out(spark):
    after = {r.page_id: r for r in requeue_timed_out(_pages(spark), NOW).collect()}
    assert after["p3"].state == STATE_WAITING         # 120s > 60s timeout
    assert after["p3"].processing_ts is None
    assert after["p4"].state == STATE_PROCESSING      # 30s, still in flight
    assert after["p1"].state == STATE_WAITING         # untouched


def test_expire_old(spark):
    after = {r.page_id: r for r in expire_old(_pages(spark), NOW).collect()}
    assert after["p6"].state == STATE_EXPIRED          # finished 11 days ago
    assert after["p7"].state == STATE_EXPIRED          # errors expire too
    assert after["p5"].state == STATE_PROCESSED        # finished yesterday


def test_request_completion(spark):
    got = {r.request_id: r for r in request_completion(_pages(spark)).collect()}
    assert got["r1"].n_total == 3 and got["r1"].n_terminal == 0
    assert got["r1"].done is False
    assert got["r2"].status == 0.5
    assert got["r3"].done is True
    assert got["r3"].avg_quality == 81.0  # errors excluded from quality
    assert got["r2"].avg_quality == 93.5
