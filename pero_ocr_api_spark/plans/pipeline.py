"""The end-to-end extraction plan — the Spark re-expression of the
reference's whole worker loop (claim → fetch → decode → PageParser →
confidence filter → arabic fix → serialize → score;
/root/reference/processing_client/run_client.py:112-244) as ONE lazy
DataFrame program:

    documents
      → explode(spans)
      → [text branch: whitespace normalize, drop empties]          (X10)
      ⊎ [media branch: salt-repartition → mapInPandas(inference)   (X2-X5)
         → arabic fix (F10) → confidence filter (N3)]
      → window sort by (offset, line_idx) per doc                  (W2)
      → output spans (kind, text, media_ref, order)
      + per-doc score (A7/X8: median conf ×100, 2dp) and status    (X9)

Scale notes (100 TB):
- the only Python crossing is the Arrow channel of mapInPandas on the
  media branch; everything else is whole-stage codegen.
- the media branch is repartitioned on xxhash64(doc_id, offset) before
  inference, so a heavy multi-page doc's media spans spread across the
  cluster (explicit skew handling per north_rule); the window sort then
  shuffles once on doc_id.
- no driver-side collect anywhere; counters are Spark accumulators.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..constants import (
    DEFAULT_SCORE,
    KIND_MEDIA,
    KIND_TEXT,
    SCORE_DP,
    SCORE_SCALE,
    STATE_PROCESSED,
)
from ..operators.inference import INFER_SCHEMA, make_infer_fn
from ..operators.normalize import (
    filter_confident_lines,
    normalize_text_spans,
    normalize_transcriptions,
)

DEFAULT_ENGINE_CONFIG = {"engine": "stub-ocr", "version": 1}


@dataclass
class ExtractMetrics:
    pages_decoded: object = None
    lines_emitted: object = None
    decode_failures: object = None

    def as_dict(self) -> dict:
        return {
            "pages_decoded": self.pages_decoded.value if self.pages_decoded else 0,
            "lines_emitted": self.lines_emitted.value if self.lines_emitted else 0,
            "decode_failures": self.decode_failures.value if self.decode_failures else 0,
        }


@dataclass
class ExtractResult:
    spans: DataFrame       # doc_id, order, kind, text, media_ref
    docs: DataFrame        # doc_id, score, status
    spans_conf: DataFrame = None  # spans + conf (internal/serialization use)
    raw_spans: DataFrame = None   # pre-strip/pre-arabic-fix lines for the
                                  # ALTO path (run_client.py:210-211 builds
                                  # ALTO before the confidence strip and
                                  # before arabic normalization)
    metrics: ExtractMetrics = field(default_factory=ExtractMetrics)
    persisted: DataFrame = None   # set when persist_inference=True

    def unpersist(self) -> None:
        if self.persisted is not None:
            self.persisted.unpersist()


def explode_spans(docs: DataFrame) -> DataFrame:
    """documents(doc_id, spans[]) → one row per span (N1/N2)."""
    return docs.select(
        "doc_id", F.explode("spans").alias("s")
    ).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("offset"),
    )


def extract(
    spark: SparkSession,
    documents: DataFrame,
    engine_config: Optional[dict] = None,
    salt_partitions: Optional[int] = None,
    with_metrics: bool = True,
    persist_inference: bool = False,
) -> ExtractResult:
    sc = spark.sparkContext
    config = engine_config or DEFAULT_ENGINE_CONFIG
    bconf = sc.broadcast(config)

    metrics = ExtractMetrics()
    if with_metrics:
        metrics = ExtractMetrics(
            pages_decoded=sc.accumulator(0),
            lines_emitted=sc.accumulator(0),
            decode_failures=sc.accumulator(0),
        )
        # accumulators are only exact if the Python stage runs once:
        # without a persist, the spans and docs branches would each
        # re-execute mapInPandas and inflate every counter by the
        # number of actions taken (2-3x measured)
        persist_inference = True

    spans = explode_spans(documents)

    # ---- text branch: pure codegen ----
    text_branch = (
        spans.filter(F.col("kind") == KIND_TEXT)
        .select("doc_id", "offset", "text")
    )
    text_branch = normalize_text_spans(text_branch).select(
        "doc_id",
        "offset",
        F.lit(0).cast("int").alias("line_idx"),
        F.lit(KIND_TEXT).alias("kind"),
        "text",
        F.lit(None).cast("string").alias("media_ref"),
        F.lit(None).cast("double").alias("conf"),
        F.lit(None).cast("string").alias("error"),
    )

    # ---- media branch: salted repartition → Arrow-batched inference ----
    media_in = spans.filter(F.col("kind") == KIND_MEDIA).select(
        "doc_id", "offset", "media_ref"
    )
    if salt_partitions:
        media_in = media_in.repartition(
            salt_partitions, F.xxhash64("doc_id", "offset")
        )
    infer_fn = make_infer_fn(
        bconf,
        metrics.pages_decoded,
        metrics.lines_emitted,
        metrics.decode_failures,
    )
    inferred = media_in.mapInPandas(infer_fn, schema=INFER_SCHEMA)
    if persist_inference:
        # one traversal of the Python stage even when several actions
        # (spans write + docs write) consume it; also keeps accumulator
        # metrics exact instead of recompute-inflated
        inferred = inferred.persist()

    errors = inferred.filter(F.col("error").isNotNull()).select(
        "doc_id", "offset", "error"
    )
    ok_lines = inferred.filter(F.col("error").isNull())
    media_raw = ok_lines.select(
        "doc_id", "offset", "line_idx",
        F.lit(KIND_MEDIA).alias("kind"),
        "text", "media_ref", "conf",
    )
    raw_spans = text_branch.select(
        "doc_id", "offset", "line_idx", "kind", "text", "media_ref", "conf"
    ).unionByName(media_raw)
    media_lines = ok_lines
    media_lines = normalize_transcriptions(media_lines)
    media_lines = filter_confident_lines(media_lines)
    media_branch = media_lines.select(
        "doc_id", "offset", "line_idx",
        F.lit(KIND_MEDIA).alias("kind"),
        "text", "media_ref", "conf",
        F.lit(None).cast("string").alias("error"),
    )

    merged = text_branch.unionByName(media_branch)

    # ---- reading-order recovery (W2): one shuffle on doc_id ----
    w = Window.partitionBy("doc_id").orderBy("offset", "line_idx")
    out_spans = merged.select(
        "doc_id",
        (F.row_number().over(w) - 1).cast("int").alias("order"),
        "kind", "text", "media_ref", "conf",
    )

    # ---- per-doc score (A7/X8) + status (X9) ----
    scores = out_spans.groupBy("doc_id").agg(
        F.coalesce(
            F.round(F.expr("percentile(conf, 0.5)") * SCORE_SCALE, SCORE_DP),
            F.lit(DEFAULT_SCORE),
        ).alias("score")
    )
    statuses = errors.groupBy("doc_id").agg(
        F.min_by("error", "offset").alias("first_error")
    )
    docs_out = (
        documents.select("doc_id")
        .join(scores, "doc_id", "left")
        .join(statuses, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("score", F.lit(DEFAULT_SCORE)).alias("score"),
            F.coalesce("first_error", F.lit(STATE_PROCESSED)).alias("status"),
        )
    )

    return ExtractResult(
        spans=out_spans.select("doc_id", "order", "kind", "text", "media_ref"),
        docs=docs_out,
        spans_conf=out_spans,
        raw_spans=raw_spans,
        metrics=metrics,
        persisted=inferred if persist_inference else None,
    )
