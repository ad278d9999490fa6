"""State-machine lifecycle sweeps (reference background jobs,
app/__init__.py:71-151) as deterministic batch transforms."""

from pyspark.sql import functions as F

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


def test_claim_plan_is_distributed_topk(spark):
    """W3 scale guard (VERDICT r1 #2): the claim must compile to
    TakeOrderedAndProject (per-partition local top-k, driver merge),
    never a single-partition global Sort over every WAITING row."""
    plan = (
        claim_pages(_pages(spark), engine_id=1, now=NOW, max_claims=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan, plan
    assert "Window" not in plan, plan


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


def test_lifecycle_invariants_random(spark):
    """Property-style sweep over a randomized page table: the lifecycle
    transforms must (a) be idempotent (applying a sweep twice equals
    once), (b) claim at most max_claims previously-WAITING rows,
    (c) only ever move states along legal edges."""
    import random

    from pero_ocr_api_spark.plans.statemachine import (
        TERMINAL_STATES, claim_pages, expire_old, requeue_timed_out,
    )

    from datetime import datetime

    rng = random.Random(7)
    states = ["CREATED", "WAITING", "PROCESSING", "PROCESSED",
              "NOT_FOUND", "INVALID_FILE", "PROCESSING_FAILED",
              "EXPIRED", "CANCELED"]
    now = "2024-06-01 12:00:00"
    rows = []
    for i in range(300):
        st = rng.choice(states)
        proc_ts = (
            datetime(2024, 6, 1, 11, 50 + rng.randint(0, 9), rng.randint(0, 59))
            if st == "PROCESSING" else None
        )
        fin_ts = (
            datetime(2024, rng.randint(1, 6), rng.randint(1, 9), 1, 0, 0)
            if st in ("PROCESSED", "NOT_FOUND") else None
        )
        rows.append(
            (f"p{i:04d}", f"r{i % 37}", rng.randint(1, 3), st,
             datetime(2024, 5, 31, rng.randint(0, 23), 0, 0),
             proc_ts, fin_ts, float(rng.randint(0, 100)))
        )
    pages = spark.createDataFrame(
        rows,
        "page_id string, request_id string, engine_id int, state string, "
        "creation_ts timestamp, processing_ts timestamp, "
        "finish_ts timestamp, score double",
    )

    def snap(df):
        return sorted(tuple(r) for r in df.collect())

    # (a) idempotence
    once = requeue_timed_out(pages, now)
    assert snap(requeue_timed_out(once, now)) == snap(once)
    eonce = expire_old(pages, now)
    assert snap(expire_old(eonce, now)) == snap(eonce)

    # (b) claim bounds + provenance
    before = {r.page_id: r.state for r in pages.collect()}
    claimed = claim_pages(pages, engine_id=2, now=now, max_claims=7).collect()
    assert len(claimed) <= 7
    for r in claimed:
        assert before[r.page_id] == "WAITING"
        assert r.state == "PROCESSING" and r.processing_ts is not None
    # preferred engine ranks first: if any engine-2 WAITING exists, the
    # first claimed row must be engine 2
    if any(s == "WAITING" for p, s in before.items()) and claimed:
        waiting_engines = {
            r.engine_id for r in pages.filter("state = 'WAITING'").collect()
        }
        if 2 in waiting_engines:
            assert claimed[0].engine_id == 2

    # (c) legal edges only, for both sweeps
    legal = {("PROCESSING", "WAITING"), ("PROCESSED", "EXPIRED"),
             ("NOT_FOUND", "EXPIRED"), ("INVALID_FILE", "EXPIRED"),
             ("PROCESSING_FAILED", "EXPIRED")}
    for df in (once, eonce):
        after = {r.page_id: r.state for r in df.collect()}
        for pid, st0 in before.items():
            st1 = after[pid]
            assert st0 == st1 or (st0, st1) in legal, (pid, st0, st1)
    # terminal states never leave terminal-hood under any sweep
    for df in (once, eonce):
        for r in df.collect():
            if before[r.page_id] in TERMINAL_STATES:
                assert r.state in TERMINAL_STATES


def _auth_dims(spark):
    requests = spark.createDataFrame(
        [("r1", "k1", None), ("r2", "k1", None), ("r3", "k2", None)],
        "request_id string, api_key_id string, finish_ts string",
    ).withColumn("finish_ts", F.col("finish_ts").cast("timestamp"))
    keys = spark.createDataFrame(
        [("k1", "alpha", False), ("k2", "bravo", True)],
        "key_id string, api_string string, suspension boolean",
    )
    return requests, keys


def test_cancel_request_flips_queued_and_inflight(spark):
    from pero_ocr_api_spark.plans.statemachine import cancel_pages

    after = {r.page_id: r for r in cancel_pages(_pages(spark), "r1", NOW).collect()}
    # r1's WAITING (p1) and in-flight PROCESSING (p3) both cancel —
    # general.py:56 includes PROCESSING in the cancelable set
    for pid in ("p1", "p3"):
        assert after[pid].state == "CANCELED"
        assert str(after[pid].finish_ts) == NOW
    # other requests untouched, terminal pages keep their finish_ts
    assert after["p4"].state == STATE_PROCESSING
    assert after["p5"].state == STATE_PROCESSED
    assert str(after["p5"].finish_ts) == "2024-01-31 12:00:00"


def test_cancel_is_idempotent(spark):
    from pero_ocr_api_spark.plans.statemachine import cancel_pages

    once = cancel_pages(_pages(spark), "r1", NOW)
    twice = cancel_pages(once, "r1", "2024-03-01 00:00:00")
    snap = lambda df: sorted(tuple(r) for r in df.collect())
    assert snap(once) == snap(twice)  # CANCELED is terminal; no re-stamp


def test_claim_authorized_skips_suspended_keys(spark):
    from pero_ocr_api_spark.plans.statemachine import claim_pages_authorized

    requests, keys = _auth_dims(spark)
    # suspend k1 instead: r1's WAITING pages become unclaimable
    keys = spark.createDataFrame(
        [("k1", "alpha", True), ("k2", "bravo", False)],
        "key_id string, api_string string, suspension boolean",
    )
    got = claim_pages_authorized(
        _pages(spark), requests, keys, engine_id=1, now=NOW, max_claims=5
    ).collect()
    assert got == []  # only r1 has WAITING pages and its key is out


def test_finish_requests_stamps_done_only_once(spark):
    from pero_ocr_api_spark.plans.statemachine import finish_requests

    pre = "2024-01-25 00:00:00"
    requests = spark.createDataFrame(
        [("r1", "k1", None), ("r2", "k1", None), ("r3", "k2", pre),
         ("r9", "k2", None)],
        "request_id string, api_key_id string, finish_ts string",
    ).withColumn("finish_ts", F.col("finish_ts").cast("timestamp"))
    got = {
        r.request_id: r
        for r in finish_requests(_pages(spark), requests, NOW).collect()
    }
    assert got["r1"].finish_ts is None            # still has WAITING pages
    assert got["r2"].finish_ts is None            # p4 in flight
    assert str(got["r3"].finish_ts) == pre        # done but already stamped
    assert got["r9"].finish_ts is None            # zero pages ≠ done


def test_suspend_keys_allowlist_semantics(spark):
    from pero_ocr_api_spark.plans.admin import suspend_keys

    keys = spark.createDataFrame(
        [("k1", "alpha", True), ("k2", "bravo", False), ("k3", "charlie", False)],
        "key_id string, api_string string, suspension boolean",
    )
    with_list = {
        r.api_string: r.suspension
        for r in suspend_keys(keys, ["bravo"]).collect()
    }
    assert with_list == {"alpha": True, "bravo": False, "charlie": True}
    none_given = {
        r.api_string: r.suspension for r in suspend_keys(keys, None).collect()
    }
    assert none_given == {"alpha": False, "bravo": False, "charlie": False}


def test_add_engine_version_existing_engine(spark):
    """The -e path of add_new_engine_version.py:96-99: attach a new
    version (+models) to an existing engine; no engine row is added."""
    from pero_ocr_api_spark.plans.admin import add_engine_version

    engines = spark.createDataFrame(
        [(1, "pero_printed", None)], "engine_id int, name string, description string"
    )
    versions = spark.createDataFrame(
        [(1, 1, "2023-01-01", None)],
        "version_id int, engine_id int, version string, description string",
    )
    models = spark.createDataFrame([(1, "ocr_base")], "model_id int, name string")
    links = spark.createDataFrame([(1, 1)], "version_id int, model_id int")
    dims = add_engine_version(
        engines, versions, models, links,
        engine_id=1, version_name="2024-02-01", new_model_names=["ocr_v2"],
    )
    assert dims["engines"].count() == 1
    vrows = {r.version: r for r in dims["versions"].collect()}
    assert vrows["2024-02-01"].engine_id == 1 and vrows["2024-02-01"].version_id == 2
    assert {r.name for r in dims["models"].collect()} == {"ocr_base", "ocr_v2"}
    assert (2, 2) in {(r.version_id, r.model_id) for r in dims["links"].collect()}


def test_claim_authorized_plan_no_pages_shuffle(spark):
    """The claim compiles to a distributed top-k, and at dimension-sized
    inputs AQE still picks broadcast semi-joins (no shuffle Exchange) —
    WITHOUT a forced broadcast on the requests side.  Only ``api_keys``
    may carry a broadcast hint: requests scale with job count, and a
    forced broadcast there is the VERDICT-r2 scale bug this test pins
    against reintroduction (source-level hint count == 1)."""
    import inspect

    from pero_ocr_api_spark.plans import statemachine as sm

    requests, keys = _auth_dims(spark)
    df = sm.claim_pages_authorized(
        _pages(spark), requests, keys, engine_id=1, now=NOW, max_claims=2
    )
    df.collect()  # materialize so AQE finalizes its runtime re-plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    # the user-sized api_keys dim is the hinted broadcast
    assert "BroadcastHashJoin" in plan, plan
    # the requests semi-join is whatever AQE picks from runtime stats
    # (broadcast on small deployments, shuffled semi at scale) — the
    # pin is that no one re-forces it in source
    src = inspect.getsource(sm.claim_pages_authorized)
    assert src.count("F.broadcast") == 1, (
        "claim_pages_authorized must hint broadcast ONLY on api_keys"
    )
