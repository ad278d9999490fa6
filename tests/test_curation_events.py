"""Behavior pins for the round-3 events operators (range join,
hierarchical rollup) and the curation plane (decontamination,
stratified sampling, PII redaction) — edge semantics the sf-parity
test can't isolate."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pero_ocr_api_spark.functions.curation import (
    PII_PATTERNS,
    SAMPLE_DEFAULT_RATE,
    SAMPLE_RATES,
    redact_pii,
)
from pero_ocr_api_spark.functions.events import (
    RANGE_WINDOW_SECS,
    q_range_join,
    q_ts_rollup,
)
from pero_ocr_api_spark.functions.curation import (
    q_decontaminate,
    q_stratified_sample,
)


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_range_join_boundaries(spark, tmp_path):
    """Click at exactly the window start is IN, at start+window is OUT,
    a click in the window's second time-bucket still matches, and a
    window with zero clicks survives with n_clicks=0."""
    t0 = dt.datetime(2024, 1, 1, 0, 30, 0)  # mid-bucket so window spans 2 bins

    def sec(s):
        return t0 + dt.timedelta(seconds=s)

    rows = [
        (1, t0, 7, "signup", 0.0, ""),
        (2, sec(0), 7, "click", 1.0, ""),              # at start: IN
        (3, sec(RANGE_WINDOW_SECS - 1), 7, "click", 2.0, ""),  # 2nd bin: IN
        (4, sec(RANGE_WINDOW_SECS), 7, "click", 4.0, ""),      # at end: OUT
        (5, sec(-1), 7, "click", 8.0, ""),              # before: OUT
        (6, t0, 9, "signup", 0.0, ""),                  # no clicks at all
        (7, sec(10), 8, "click", 16.0, ""),             # other user: OUT
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {r["window_id"]: r for r in q_range_join(spark, sf).collect()}
    assert got[1]["n_clicks"] == 2 and got[1]["click_value"] == 3.0
    assert got[6]["n_clicks"] == 0 and got[6]["click_value"] == 0.0


def test_ts_rollup_grains_consistent(spark, sf_smoke):
    out = q_ts_rollup(spark, sf_smoke)
    agg = {
        r["grain"]: (r["n"], r["buckets"])
        for r in out.groupBy("grain")
        .agg(F.sum("n_events").alias("n"), F.count("*").alias("buckets"))
        .collect()
    }
    # every grain re-aggregates the same events: totals identical
    assert agg["minute"][0] == agg["hour"][0] == agg["day"][0]
    # strictly coarser granularity
    assert agg["minute"][1] > agg["hour"][1] > agg["day"][1]


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_decontaminate_flags_copied_heldout_doc(spark, tmp_path):
    """A heldout doc that copies 8+ consecutive tokens from a train doc
    is flagged; a disjoint heldout doc is not.  doc_ids are chosen so
    the md5 split puts them on the intended side of the fence."""
    from pero_ocr_api_spark.functions.curation import _split_col

    probe = spark.range(0, 200).select(
        F.col("id").alias("doc_id"), _split_col().alias("split")
    )
    sides = {r["doc_id"]: r["split"] for r in probe.collect()}
    train_id = next(i for i in sides if sides[i] == "train")
    held_ids = [i for i in sides if sides[i] == "heldout"]
    copied_id, clean_id = held_ids[0], held_ids[1]

    shared = " ".join(f"tok{i}" for i in range(12))
    clean = " ".join(f"other{i}" for i in range(12))
    rows = [
        (train_id, shared, "en", "s", len(shared)),
        (copied_id, "prefix " + shared, "en", "s", len(shared) + 7),
        (clean_id, clean, "en", "s", len(clean)),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in q_decontaminate(spark, sf).collect()}
    assert train_id not in got  # only heldout docs are scored
    assert got[copied_id]["contaminated"] is True
    assert got[copied_id]["n_contaminated"] == 5  # 12-token overlap → 5 shared 8-windows
    assert got[clean_id]["contaminated"] is False
    assert got[clean_id]["n_contaminated"] == 0


def test_stratified_sample_rates_and_weights(spark, sf_correct):
    out = q_stratified_sample(spark, sf_correct)
    rows = out.groupBy("lang").agg(
        F.count("*").alias("kept"), F.first("weight").alias("w")
    ).collect()
    from pero_ocr_api_spark.session import load_table

    totals = {
        r["lang"]: r["n"]
        for r in load_table(spark, sf_correct, "documents")
        .groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for r in rows:
        rate = SAMPLE_RATES.get(r["lang"], SAMPLE_DEFAULT_RATE) / 256.0
        # md5 is uniform: observed keep-rate within a wide binomial band
        assert abs(r["kept"] / totals[r["lang"]] - rate) < 0.2
        assert r["w"] == pytest.approx(1.0 / rate, abs=1e-4)
    # deterministic: identical doc_id set on a re-run
    a = {r["doc_id"] for r in out.collect()}
    b = {r["doc_id"] for r in q_stratified_sample(spark, sf_correct).collect()}
    assert a == b


def test_pii_redaction_fixture(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at john.doe+x@example.co.uk or call 555-123-4567"),
            (2, "server at 10.0.255.7 went down; contact ops@corp.io"),
            (3, "no pii here at all"),
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert got[1]["n_email"] == 1 and got[1]["n_phone"] == 1
    assert got[1]["redacted"] == "mail me at <EMAIL> or call <PHONE>"
    assert got[2]["n_ipv4"] == 1 and got[2]["n_email"] == 1
    assert got[2]["redacted"] == "server at <IPV4> went down; contact <EMAIL>"
    assert got[3]["redacted"] == "no pii here at all"
    assert all(got[3][f"n_{k}"] == 0 for k in PII_PATTERNS)


def test_range_join_plan_is_equi_join(spark, sf_smoke):
    """The bucketed formulation must plan as a hash EQUI-join (bin key
    in the join condition), never BroadcastNestedLoop/Cartesian."""
    plan = q_range_join(spark, sf_smoke)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_funnel_ordering_semantics(spark, tmp_path):
    """A purchase BEFORE the user's first post-signup click does not
    complete the funnel; a click at exactly the signup timestamp does
    count (inclusive at-or-after)."""
    t0 = dt.datetime(2024, 1, 5, 12, 0, 0)

    def sec(s):
        return t0 + dt.timedelta(seconds=s)

    rows = [
        # user 1: purchase precedes the click -> stage 2, purchase AFTER
        # the click at +20 completes via the later purchase at +30
        (1, t0, 1, "signup", 0.0, ""),
        (2, sec(10), 1, "purchase", 0.0, ""),
        (3, sec(20), 1, "click", 0.0, ""),
        # user 2: click exactly at signup ts counts; no purchase
        (4, t0, 2, "signup", 0.0, ""),
        (5, t0, 2, "click", 0.0, ""),
        # user 3: click before signup does NOT count -> stage 1
        (6, sec(-5), 3, "click", 0.0, ""),
        (7, t0, 3, "signup", 0.0, ""),
        # user 1 completing purchase
        (8, sec(30), 1, "purchase", 0.0, ""),
    ]
    sf = _write_events(spark, tmp_path, rows)
    from pero_ocr_api_spark.functions.events import q_funnel

    got = {r["user_id"]: r for r in q_funnel(spark, sf).collect()}
    assert got[1]["stage"] == 3
    assert got[1]["purchase_ts"] == sec(30)  # not the pre-click purchase
    assert got[2]["stage"] == 2 and got[2]["click_ts"] == t0
    assert got[3]["stage"] == 1 and got[3]["click_ts"] is None


def test_retention_cohort_day_zero_covers_all_users(spark, sf_smoke):
    """Every user is active on their own cohort day, so summing
    day_offset=0 counts across cohorts equals the distinct user count."""
    from pero_ocr_api_spark.functions.events import q_retention_cohorts
    from pero_ocr_api_spark.session import load_table

    out = q_retention_cohorts(spark, sf_smoke)
    day0 = (
        out.filter(F.col("day_offset") == 0)
        .agg(F.sum("n_users").alias("n"))
        .collect()[0]["n"]
    )
    total = (
        load_table(spark, sf_smoke, "events")
        .select("user_id").distinct().count()
    )
    assert day0 == total
    assert out.filter(F.col("day_offset") < 0).count() == 0


def test_winsorize_clamps_into_band(spark, sf_smoke):
    from pero_ocr_api_spark.functions.curation import q_length_winsorize

    rows = q_length_winsorize(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert r["lo"] <= r["clamped"] <= r["hi"]
        if r["lo"] <= r["n_chars"] <= r["hi"]:
            assert r["clamped"] == float(r["n_chars"])


def test_pq_encode_codebook_vectors_are_exact(spark, sf_smoke):
    """The PQ_K codebook seed vectors encode to themselves: codes
    m->own cid with zero quantization error; every other vector's
    error is >= 0 and codes parse as PQ_M dash-joined ints."""
    from pero_ocr_api_spark.functions.similarity import (
        PQ_K,
        PQ_M,
        q_pq_encode,
    )

    got = {r["vec_id"]: r for r in q_pq_encode(spark, sf_smoke).collect()}
    for cid in range(PQ_K):
        assert got[cid]["codes"] == "-".join([str(cid)] * PQ_M)
        assert got[cid]["quant_err"] == 0.0
    for r in got.values():
        parts = r["codes"].split("-")
        assert len(parts) == PQ_M
        assert all(0 <= int(p) < PQ_K for p in parts)
        assert r["quant_err"] >= 0.0


def test_rolling_range_frame_semantics(spark):
    """RANGE (not ROWS) frame pins: same-timestamp rows share one
    frame (both see both), an event exactly at the 7-day boundary is
    included, one second past it is excluded."""
    from datetime import datetime, timedelta

    from pero_ocr_api_spark.functions.events import ROLL_WINDOW_S, q_rolling_7d

    base = datetime(2024, 1, 10, 12, 0, 0)
    rows = [
        (1, 100, base - timedelta(seconds=ROLL_WINDOW_S + 1), 1.0),  # too old
        (1, 101, base - timedelta(seconds=ROLL_WINDOW_S), 2.0),      # boundary: in
        (1, 102, base, 4.0),   # same ts as 103
        (1, 103, base, 8.0),   # same ts as 102
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    import os as _os
    import tempfile
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(_os.path.join(d, "events.parquet"))
    got = {r.event_id: (r.n_7d, r.sum_7d) for r in q_rolling_7d(spark, d).collect()}
    assert got[100] == (1, 1.0)
    assert got[101] == (2, 3.0)              # sees 100 (within ITS window)
    # 102/103 share the frame: 101 (exactly 7d back) + both same-ts rows
    assert got[102] == (3, 14.0)
    assert got[103] == (3, 14.0)


def test_lang_rebalance_hits_target_mixture(spark, sf_correct):
    """Downsampling-only waterfill: the achieved output shares track
    TARGET_MIX within 256-bucket quantization noise, the binding
    language (scarcest relative to its target) is kept whole
    (weight exactly 1.0), and the sample is deterministic."""
    from pero_ocr_api_spark.functions.curation import (
        TARGET_MIX,
        q_lang_rebalance,
    )

    out = q_lang_rebalance(spark, sf_correct).cache()
    total = out.count()
    shares = {
        r["lang"]: r["cnt"] / total
        for r in out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()
    }
    assert set(shares) == set(TARGET_MIX)
    for lang, w in TARGET_MIX.items():
        # 256-bucket quantization + hash noise at a few hundred docs
        # per lang: ±6 share points is far tighter than the raw corpus
        # skew (en is ~40% of documents, target 30%)
        assert abs(shares[lang] - w) < 0.06, (lang, shares[lang], w)
    # binding language keeps everything: some lang has weight 1.0
    weights = {r["lang"]: r["weight"] for r in
               out.select("lang", "weight").distinct().collect()}
    assert min(weights.values()) == pytest.approx(1.0)
    # deterministic: identical result set on a re-run
    again = q_lang_rebalance(spark, sf_correct)
    assert out.exceptAll(again).count() == 0
    assert again.exceptAll(out).count() == 0
    out.unpersist()


def test_props_variant_bucket_floors_negative_k(spark):
    """k_bucket must agree between the Spark floor expression and the
    oracle's explicit floor(k/10.0) for NEGATIVE k — neither engine's
    native integer-division idiom does: Spark (k/10).cast('int')
    truncates toward zero AND DuckDB's `//` also truncates
    ((-5)//10 = 0, verified), which is why both dialects spell floor
    literally.  Latent-divergence guard: testdata k is 0..99 today."""
    import duckdb

    from pyspark.sql import functions as F

    ks = [-25, -15, -5, -1, 0, 5, 15]
    sdf = spark.createDataFrame([(k,) for k in ks], "k int")
    got = sorted(
        (r["k"], r["b"])
        for r in sdf.select(
            "k", F.floor(F.col("k") / F.lit(10)).cast("int").alias("b")
        ).collect()
    )
    want = sorted(
        duckdb.sql(
            "SELECT k, CAST(floor(k/10.0) AS INTEGER) b FROM (VALUES "
            + ",".join(f"({k})" for k in ks)
            + ") t(k)"
        ).fetchall()
    )
    assert got == want
    assert dict(got)[-5] == -1 and dict(got)[-15] == -2
