"""Streaming MERGE sink: a change stream continuously upserted into a
snapshot-versioned target table.

The reference applies state changes row-by-row as they arrive
(SQLAlchemy UPDATEs inside request handlers); the streaming lakehouse
analog is foreachBatch + MERGE: each micro-batch of change rows folds
into the target as one set-based upsert, and the new table version
becomes visible atomically.  Without a transactional table format in
the sandbox, the snapshot is modeled exactly like the checkpoint
plane: every batch writes a full new version directory
``v=<batch>-<attempt>`` and flips a ``_LATEST`` pointer via atomic
rename.  The attempt suffix makes every write land in a FRESH dir:
a retried micro-batch (crash between write and stream-checkpoint
commit) may find the pointer already at its own batch's output and
must never overwrite the directory it is simultaneously reading the
target from (Spark's overwrite deletes input files mid-read — a real
bug this plane's kill-mid-foreachBatch test caught).  Re-applying a
batch the target already contains is a fixed point of merge_upsert,
so the retry's fresh version has identical content and the re-flip is
idempotent; superseded version dirs are unreferenced garbage (a real
lakehouse GCs them via snapshot expiry).

Scale note: rewriting the full target per batch is the sandbox
stand-in; on a real lakehouse the same ``merge_upsert`` plan commits
as an Iceberg/Delta MERGE that rewrites only matched files.  The
within-batch last-writer-wins fold and the anti-join shape are the
part that carries over unchanged.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.cdc import merge_upsert


def _orderable(dt) -> bool:
    """True iff Spark accepts the type in an ORDER BY / window ordering
    (TypeUtils.checkForOrderingExpr semantics): maps are not orderable,
    and a struct/array is only as orderable as its children."""
    from pyspark.sql import types as T

    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    if dt.typeName() == "variant":
        return False
    return True


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
        # never partition order (same fix as merge_cdc_ops' op tiebreak).
        # Only ORDERABLE columns may enter the window ordering: a map
        # (or map-bearing struct/array) payload column would fail
        # analysis ("cannot be used in order specification") and crash
        # the sink on schemas plain append accepted.
        orderable = {
            f.name for f in batch_df.schema.fields if _orderable(f.dataType)
        }
        others = [
            c for c in batch_df.columns
            if c not in (key, seq) and c in orderable
        ]
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
        # unique per attempt: a retry must never overwrite a version dir
        # the pointer may already reference (it would be deleting the
        # files the merge is reading)
        version = f"v={batch_id}-{uuid.uuid4().hex[:8]}"
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
