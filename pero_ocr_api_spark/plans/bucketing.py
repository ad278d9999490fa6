"""Bucketed storage for shuffle-free doc_id joins.

The reference leans on relational secondary indexes for its hot
lookups (index=True on request_id/state/name,
/root/reference/app/db/model.py:33,47-49,62-71).  At 10^12-document
scale the Spark analog is bucketed layout: `documents` and
`extractions` both bucketed (and sorted) by doc_id means every
doc-level join — resume's left-anti of input vs done, status lookups,
spans-for-doc reads — is co-located: a SortMergeJoin with ZERO
exchanges on either side (tests assert the physical plan).  With a
real Iceberg catalog this is `bucket(N, doc_id)` partition transforms;
the sandbox uses Spark's native datasource bucketing (saveAsTable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, n_buckets: int = 16, key: str = "doc_id"
) -> None:
    """Persist bucketed+sorted by ``key`` — the layout every downstream
    doc-level join expects."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str = "doc_id",
    how: str = "inner",
) -> DataFrame:
    """Join two identically-bucketed tables on the bucket key.  The
    merge hint pins SortMergeJoin (a tiny test table would otherwise
    broadcast, which hides the point); with matching bucket specs
    Spark plans it with no Exchange on either side."""
    left = spark.table(left_table)
    right = spark.table(right_table).hint("merge")
    return left.join(right, key, how)


def plan_has_no_exchange(df: DataFrame) -> bool:
    """True iff the physical plan contains no shuffle (Exchange) at all
    — the co-location proof used by tests and PLANS.md."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan
