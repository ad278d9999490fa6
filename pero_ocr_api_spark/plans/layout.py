"""Partitioned, size-bounded write layout — the read-side pruning and
small-file story for a 100 TB corpus.

The reference writes one results zip per request into a flat directory
(/root/reference/app/main/general.py:21-38); at 10^12 documents the
Spark analog is a Hive-partitioned lake layout:

- ``partitionBy(lang)`` (any low-cardinality dimension) so that every
  per-stratum read — curation sweeps, per-language training mixes —
  prunes whole directories at planning time (``PartitionFilters`` in
  the scan, zero I/O for excluded strata);
- ``maxRecordsPerFile`` so a skewed partition (one dominant language)
  still emits bounded-size files instead of one 10 TB file no executor
  can split on the write side;
- a z-value clustering column for the within-file ordering: bit-
  interleaving two filter dimensions keeps BOTH selective at the
  row-group level (min/max stats stay tight on each), which is what
  Iceberg's ``zorder`` rewrite does — here as a pure column expression
  usable in ``sortWithinPartitions``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

Z_BITS = 16  # bits kept per dimension → 32-bit z-value


def z_value(a: Column, b: Column, bits: int = Z_BITS) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns (a even positions, b odd) into one z-order key.  Pure
    integer column arithmetic — shifts and masks, codegen'd, portable
    to the DuckDB oracle verbatim."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1))
        z = (
            z.bitwiseOR(F.shiftleft(abit, 2 * i))
            .bitwiseOR(F.shiftleft(bbit, 2 * i + 1))
        )
    return z


def z_value_sql(a: str, b: str, bits: int = Z_BITS) -> str:
    """DuckDB twin of :func:`z_value`, generated from the same loop."""
    terms = []
    for i in range(bits):
        terms.append(f"(((CAST({a} AS BIGINT) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((CAST({b} AS BIGINT) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_col: str = "lang",
    order_cols: tuple[str, ...] = ("doc_id",),
    max_records_per_file: int = 1_000_000,
) -> None:
    """Write a Hive-partitioned, within-partition-ordered parquet lake.

    ``sortWithinPartitions`` (not ``orderBy``!) keeps the write
    shuffle-free — each task sorts only its own rows, so parquet
    row-group min/max stats are tight on ``order_cols`` without a
    global range exchange.  ``maxRecordsPerFile`` splits oversized
    tasks' output; at 100 TB this is what keeps file sizes inside the
    128 MB-1 GB band scans schedule well against."""
    (
        df.sortWithinPartitions(partition_col, *order_cols)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(partition_col)
        .parquet(path)
    )


def read_stratum(
    spark: SparkSession, path: str, partition_col: str, value
) -> DataFrame:
    """Read ONE stratum of a partitioned lake.  The equality predicate
    lands in the scan's ``PartitionFilters`` (directory pruning at
    planning time), never in post-scan ``Filter`` — tests pin this."""
    return spark.read.parquet(path).filter(F.col(partition_col) == value)


def scan_partition_filters(df: DataFrame) -> str:
    """The PartitionFilters clause of the df's scan node (pruning
    evidence for tests/PLANS.md)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "PartitionFilters" in line:
            return line
    return ""


# ---- registry query: z-order clustering key over documents ----

from ..registry import make_registry  # noqa: E402
from ..session import load_table  # noqa: E402

REGISTRY, _reg = make_registry()


@_reg(
    "td_zorder_key",
    f"""SELECT doc_id,
       {z_value_sql('n_chars', 'doc_id % 65536')} AS z
FROM documents""",
)
def q_zorder_key(spark: SparkSession, sf: str) -> DataFrame:
    """The z-order clustering key for (n_chars, doc_id) — what
    `write_partitioned(order_cols=('z',))` sorts by so row-group
    min/max stats stay tight on BOTH dimensions.  Pure bit arithmetic,
    zero shuffle, dual-dialect."""
    docs = load_table(spark, sf, "documents")
    return docs.select(
        "doc_id",
        z_value(F.col("n_chars"), F.col("doc_id") % 65536).alias("z"),
    )
