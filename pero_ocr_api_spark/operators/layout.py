"""Layout-region segmentation — the north_rule's "PDF/layout parse"
plane: group a document's ordered spans into homogeneous layout
regions, the batch analog of the reference PageParser's region
detection (text regions vs image regions) feeding reading order
(/root/reference/processing_client/run_client.py:150-170 runs layout
analysis before line transcription; regions are what PAGE XML nests
lines under).

Boundary rule (sessionization): a new region starts at a kind change
(text↔media — layout regions are homogeneous) or where the offset gap
exceeds ``gap`` (vertical-whitespace analog; the synthetic corpus is
gap-free, so there the kind rule drives segmentation — the gap path is
exercised by unit test).

Plan shape: one Exchange on doc_id feeds BOTH windows (the lag
boundary flags and the running-sum region ids share partitioning and
ordering) and the downstream per-region aggregate — the same
single-shuffle property as the reading-order sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def segment_regions(spans: DataFrame, gap: int = 1) -> DataFrame:
    """(doc_id, offset, kind, ...) → same rows + ``region_id``
    (0-based, in offset order per doc)."""
    w = Window.partitionBy("doc_id").orderBy("offset")
    prev_off = F.lag("offset").over(w)
    prev_kind = F.lag("kind").over(w)
    boundary = (
        prev_off.isNull()
        | ((F.col("offset") - prev_off) > gap)
        | (F.col("kind") != prev_kind)
    )
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        spans.withColumn("_boundary", boundary.cast("int"))
        .withColumn("region_id", (F.sum("_boundary").over(running) - 1).cast("int"))
        .drop("_boundary")
    )


def region_summary(spans: DataFrame, gap: int = 1) -> DataFrame:
    """Per-region rollup: kind (regions are homogeneous by
    construction), span count, and offset extent."""
    return (
        segment_regions(spans, gap=gap)
        .groupBy("doc_id", "region_id")
        .agg(
            F.min("kind").alias("region_kind"),
            F.count("*").alias("n_spans"),
            F.min("offset").alias("start_offset"),
            F.max("offset").alias("end_offset"),
        )
    )
