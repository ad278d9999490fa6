"""Structured Streaming variant of the extraction pipeline.

The reference is a polling pull-queue (client polls every 10 s,
/root/reference/processing_client/run_client.py:244; daemon every 600 s,
/root/reference/processing_client/processing_deamon.py:46,64).  The
Spark-native equivalent is a file-source stream with
``trigger(availableNow=True)``: each invocation drains whatever new
document files have arrived, exactly once, then stops — no polling loop,
no redelivery sweep (Spark's checkpoint + write-ahead offsets replace the
60 s PROCESSING-timeout re-queue of /root/reference/app/__init__.py:71-119).

The per-doc window sort (reading order) is not stream-expressible
(non-time window), so the pipeline runs inside ``foreachBatch`` — each
micro-batch is a bounded DataFrame processed by the SAME batch plan
(plans/pipeline.extract), then appended to the sink.  Output equality
with the pure batch run is asserted in tests/test_streaming.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType, IntegerType, StringType, StructField, StructType,
)

from ..plans.pipeline import extract

SPAN_STRUCT = StructType(
    [
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("offset", IntegerType()),
    ]
)
DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("spans", ArrayType(SPAN_STRUCT)),
    ]
)


def incremental_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    salt_partitions: int | None = None,
):
    """Drain all currently-available document parquet files through the
    extraction pipeline exactly once (availableNow) and append the span
    output to ``output_dir``.  Re-invoking later processes only files
    that arrived since (offsets tracked in ``checkpoint_dir``)."""
    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )

    spans_out = os.path.join(output_dir, "spans")
    docs_out = os.path.join(output_dir, "docs")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        res = extract(
            batch_df.sparkSession,
            batch_df,
            salt_partitions=salt_partitions,
            with_metrics=False,
            persist_inference=True,
        )
        # batch-scoped overwrite: a retried micro-batch (crash between
        # the parquet write and the checkpoint commit) rewrites its own
        # batch_id directory instead of appending duplicates; batch_id
        # surfaces as a partition column on read
        res.spans.write.mode("overwrite").parquet(
            os.path.join(spans_out, f"batch_id={batch_id}")
        )
        res.docs.write.mode("overwrite").parquet(
            os.path.join(docs_out, f"batch_id={batch_id}")
        )
        res.unpersist()

    query = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query
