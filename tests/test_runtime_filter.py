"""Runtime bloom-filter join reduction — the 100 TB scan-cut evidence.

When a fact table shuffle-joins a selectively-filtered dimension,
Spark (3.4+, `spark.sql.optimizer.runtime.bloomFilter.enabled`, on by
default and inherited by our sessions) builds a bloom filter from the
dim's join keys at runtime and injects a `BloomFilterMightContain`
predicate on the fact side — rows that cannot match are dropped at the
scan/filter stage, BEFORE paying the shuffle.  On a 1000-executor
cluster joining a 100 TB lineitem to a 0.1%-selective orders subset,
this is the difference between shuffling 100 TB and shuffling ~100 GB.

The production thresholds (creation side ≤ 10 MB plan-size estimate,
application side ≥ 10 GB scan) are deliberately untouched in
session.py — they are sized for real clusters.  The test lowers the
application-side gate on its tiny fixture ONLY to make the optimizer
take the same decision it would take at scale, then asserts the
injected shape.
"""

from pyspark.sql import functions as F

from pero_ocr_api_spark.session import load_table

_CONFS = {
    # tiny fixture stands in for the ≥10GB fact scan of a real cluster
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    # force the shuffle-join path: a broadcast join needs no runtime
    # filter (the build side IS the filter)
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def _with_confs(spark, confs):
    old = {}
    for k, v in confs.items():
        old[k] = spark.conf.get(k)
        spark.conf.set(k, v)
    return old


def test_runtime_bloom_filter_injected_on_fact_side(spark, sf_correct):
    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    ), "session must inherit the runtime-filter default"
    old = _with_confs(spark, _CONFS)
    try:
        dim = (
            load_table(spark, sf_correct, "orders")
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .filter(F.col("o_totalprice") > 400000)
        )
        fact = load_table(spark, sf_correct, "lineitem")
        q = (
            fact.join(dim, fact.l_orderkey == dim.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.sum("l_extendedprice").alias("s"))
        )
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, plan[:2000]
        # the might-contain probe must sit on the FACT (lineitem) key,
        # BELOW the join's exchange (filter-before-shuffle)
        probe = [ln for ln in plan.splitlines() if "might_contain" in ln]
        assert probe and all("l_orderkey" in ln for ln in probe), probe
    finally:
        _with_confs(spark, old)


def test_broadcast_join_skips_runtime_filter(spark, sf_correct):
    """Control: when the dim broadcasts (the session default for small
    dims), no bloom filter is injected — the broadcast hash table
    already filters at the probe, so an extra runtime filter would be
    pure overhead.  Pins that our default config doesn't pay twice."""
    old = _with_confs(
        spark,
        {
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold": "0"
        },
    )
    try:
        dim = load_table(spark, sf_correct, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        fact = load_table(spark, sf_correct, "lineitem")
        q = fact.join(
            F.broadcast(dim), fact.l_orderkey == dim.o_orderkey
        ).agg(F.count("*").alias("n"))
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "might_contain" not in plan
    finally:
        _with_confs(spark, old)
