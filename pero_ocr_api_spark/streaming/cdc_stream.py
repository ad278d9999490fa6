"""Streaming MERGE sink: a change stream continuously upserted into a
snapshot-versioned target table.

The reference applies state changes row-by-row as they arrive
(SQLAlchemy UPDATEs inside request handlers); the streaming lakehouse
analog is foreachBatch + MERGE: each micro-batch of change rows folds
into the target as one set-based upsert, and the new table version
becomes visible atomically.  Without a transactional table format in
the sandbox, the snapshot is modeled exactly like the checkpoint
plane: every batch writes a full new version directory ``v=<batch>``
and flips a ``_LATEST`` pointer via atomic rename — a retried
micro-batch (crash between write and stream-checkpoint commit)
rewrites its own version and re-flips the pointer to the same content,
so the sink is idempotent.

Scale note: rewriting the full target per batch is the sandbox
stand-in; on a real lakehouse the same ``merge_upsert`` plan commits
as an Iceberg/Delta MERGE that rewrites only matched files.  The
within-batch last-writer-wins fold and the anti-join shape are the
part that carries over unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.cdc import merge_upsert


def _latest_path(target_dir: str) -> str:
    return os.path.join(target_dir, "_LATEST")


def read_target(spark: SparkSession, target_dir: str) -> DataFrame | None:
    """The current committed snapshot, or None before the first one."""
    p = _latest_path(target_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        version = f.read().strip()
    return spark.read.parquet(os.path.join(target_dir, version))


def _commit_pointer(target_dir: str, version: str) -> None:
    tmp = _latest_path(target_dir) + ".tmp"
    with open(tmp, "w") as f:
        f.write(version)
    os.replace(tmp, _latest_path(target_dir))  # atomic flip


def streaming_upsert(
    spark: SparkSession,
    input_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    schema,
    key: str = "doc_id",
    seq: str = "seq",
):
    """Drain all available change files (availableNow) and MERGE each
    micro-batch into the target.  Within a batch, the highest ``seq``
    per key wins (last-writer-wins fold — deterministic, pinned by
    tests); across batches, later batches win by construction."""
    stream = spark.readStream.schema(schema).parquet(input_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        # seq ties resolve deterministically via the payload columns —
        # never partition order (same fix as merge_cdc_ops' op tiebreak)
        others = [c for c in batch_df.columns if c not in (key, seq)]
        w = Window.partitionBy(key).orderBy(
            F.col(seq).desc(), *[F.col(c).asc() for c in others]
        )
        folded = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        target = read_target(s, target_dir)
        merged = folded if target is None else merge_upsert(target, folded, key)
        version = f"v={batch_id}"
        merged.write.mode("overwrite").parquet(
            os.path.join(target_dir, version)
        )
        _commit_pointer(target_dir, version)

    query = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query
