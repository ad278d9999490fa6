"""Watermarked stream-stream interval join — the streaming analog of
the reference's claim-then-upload page lifecycle (a page claimed by one
processing-client HTTP call, `get_processing_request` at
routes.py:215-230, is finished by a LATER independent call,
`upload_results` at routes.py:232-272 / `failed_processing` at
routes.py:318-374).  Batch analytics over that lifecycle exist in
plans/statemachine.py; this operator is the live view: two independent
event streams (claims, results) joined on page_id with the result
constrained to land within JOIN_WINDOW of the claim.

Scale notes (the reason this is a *watermarked* join): a stream-stream
inner join must buffer unmatched rows in the state store.  The
event-time range condition plus watermarks on BOTH sides let Spark
prove when a buffered claim can never match again (claim_ts older than
the results watermark minus the window) and evict it — state is
O(events inside the watermark horizon), not O(stream).  Without the
range condition the state store grows unboundedly and a 10^9-event/day
feed OOMs the cluster.  The join itself is a keyed shuffle on page_id,
the same partitioning both input topics would already carry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CLAIMS_SCHEMA = "page_id string, engine_id bigint, claim_ts timestamp"
RESULTS_SCHEMA = "page_id string, status string, finish_ts timestamp"

# A claim the worker has not answered within this bound is a timeout
# (the reference requeues it — general.py change_page_to_processed /
# the timeout sweep); matches past it are NOT the same processing
# attempt, so the join excludes them.
JOIN_WINDOW_SECS = 3600

# Watermarks: how late each feed's events may arrive.  The results
# side's horizon must cover claim lateness + the join window for the
# inner join to be complete (Structured Streaming's correctness rule
# for interval joins).
CLAIM_LATENESS = "10 minutes"
RESULT_LATENESS = "70 minutes"


def joined_frame(claims: DataFrame, results: DataFrame) -> DataFrame:
    """The join itself — shared verbatim by the streaming operator and
    the batch twin (tests assert set-equality between the two), so the
    interval semantics cannot drift: result within
    [claim_ts, claim_ts + JOIN_WINDOW_SECS], matched on page_id."""
    cond = (
        (F.col("c.page_id") == F.col("r.page_id"))
        & (F.col("r.finish_ts") >= F.col("c.claim_ts"))
        & (
            F.col("r.finish_ts")
            <= F.col("c.claim_ts")
            + F.expr(f"INTERVAL {JOIN_WINDOW_SECS} SECONDS")
        )
    )
    return (
        claims.alias("c")
        .join(results.alias("r"), cond)
        .select(
            F.col("c.page_id").alias("page_id"),
            "engine_id",
            "claim_ts",
            "status",
            "finish_ts",
            (
                F.col("finish_ts").cast("long")
                - F.col("claim_ts").cast("long")
            ).alias("latency_secs"),
        )
    )


def claim_result_stream(
    spark: SparkSession,
    claims_dir: str,
    results_dir: str,
    output_dir: str,
    checkpoint_dir: str,
):
    """availableNow drain: join the claims feed to the results feed,
    append matches to parquet.  maxFilesPerTrigger=1 forces claims and
    their results into DIFFERENT micro-batches, so the test exercises
    real cross-batch state buffering, not a single-batch join."""
    claims = (
        spark.readStream.schema(CLAIMS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(claims_dir)
        .withWatermark("claim_ts", CLAIM_LATENESS)
    )
    results = (
        spark.readStream.schema(RESULTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(results_dir)
        .withWatermark("finish_ts", RESULT_LATENESS)
    )
    out = joined_frame(claims, results)

    query = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query


def timeout_frame(claims: DataFrame, results: DataFrame) -> DataFrame:
    """Batch twin of the timeout detector: claims with NO result inside
    the join window (left anti on the same interval condition).  The
    reference finds these with a periodic sweep over the pages table
    (the timeout requeue job, app/__init__.py:71-151); relationally it
    is the complement of joined_frame."""
    cond = (
        (F.col("c.page_id") == F.col("r.page_id"))
        & (F.col("r.finish_ts") >= F.col("c.claim_ts"))
        & (
            F.col("r.finish_ts")
            <= F.col("c.claim_ts")
            + F.expr(f"INTERVAL {JOIN_WINDOW_SECS} SECONDS")
        )
    )
    return (
        claims.alias("c")
        .join(results.alias("r"), cond, "left_anti")
        .select("page_id", "engine_id", "claim_ts")
    )


def claim_timeout_stream(
    spark: SparkSession,
    claims_dir: str,
    results_dir: str,
    output_dir: str,
    checkpoint_dir: str,
):
    """Streaming timeout detector: LEFT OUTER watermarked interval join
    — a claim row whose result columns are NULL is a timeout.  Outer
    stream-stream joins are the one place Structured Streaming *delays*
    emission by design: an unmatched claim is held in state until the
    RESULTS watermark passes claim_ts + JOIN_WINDOW (only then is "no
    result will ever arrive in the window" provable), so timeouts emit
    exactly once, late by the results-side lateness bound.  State and
    output are both bounded by the watermark horizon — the property
    that lets this run forever over a 10^9-event/day feed.
    """
    claims = (
        spark.readStream.schema(CLAIMS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(claims_dir)
        .withWatermark("claim_ts", CLAIM_LATENESS)
    )
    results = (
        spark.readStream.schema(RESULTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(results_dir)
        .withWatermark("finish_ts", RESULT_LATENESS)
    )
    cond = (
        (F.col("c.page_id") == F.col("r.page_id"))
        & (F.col("r.finish_ts") >= F.col("c.claim_ts"))
        & (
            F.col("r.finish_ts")
            <= F.col("c.claim_ts")
            + F.expr(f"INTERVAL {JOIN_WINDOW_SECS} SECONDS")
        )
    )
    out = (
        claims.alias("c")
        .join(results.alias("r"), cond, "leftOuter")
        .filter(F.col("r.page_id").isNull())
        .select(
            F.col("c.page_id").alias("page_id"), "engine_id", "claim_ts"
        )
    )
    query = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query


def enriched_claim_stream(
    spark: SparkSession,
    claims_dir: str,
    engines: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
):
    """Stream-static enrichment: the claims feed joined to the static
    engines dimension (the reference resolves every claim's engine row
    the same way, routes.py:215-230 loading Engine by id before
    answering the worker).  The static side is broadcast — per
    micro-batch the join is map-side, STATELESS (nothing buffers in the
    state store, unlike the stream-stream joins above), and the dim is
    re-resolvable per batch so slowly-changing dims pick up updates at
    micro-batch granularity.  At 10^9 events/day this is the canonical
    enrich shape: the fact stream never shuffles for the join."""
    claims = (
        spark.readStream.schema(CLAIMS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(claims_dir)
    )
    out = claims.join(
        F.broadcast(engines.select("engine_id", "engine_name")), "engine_id"
    )
    query = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query
