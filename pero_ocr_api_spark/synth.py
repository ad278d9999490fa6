"""Deterministic synthesis of the interleaved text+media `documents`
table (BASELINE.json input_hint shape) from the driver's flat
``documents.parquet`` — and the *equivalent DuckDB SQL* so the driver's
oracle can reproduce the exact same rows with no Python.

Shape (FIXTURES.md §1):
    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

Rules (all constants in constants.py, shared with the oracle SQL):
- tokens = non-empty split(text, ' '); T = ceil(len/5) text spans of 5
  tokens each; K = T + T//2 interleaved positions; position k is a
  media span iff (k+1) % 3 == 0, else text span j = k - (k+1)//3.
- media_ref = 'img://<doc_id>/p<m>' (m = (k+1)//3, 1-based).
- noise for the normalize stage: whitespace-only spans when
  (doc_num*7 + j) % 13 == 0; whitespace-wrapped spans when
  (doc_num + j) % 4 == 0.
- spans are STORED SHUFFLED (sorted by md5(doc_id:k)) so reading-order
  recovery by the offset window sort is actually exercised
  (reference analog: reading order from lines_iterator(),
  /root/reference/processing_client/run_client.py:72).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .constants import (
    EMPTY_SPAN_MOD,
    KIND_MEDIA,
    KIND_TEXT,
    MEDIA_EVERY,
    WORDS_PER_SPAN,
    WRAP_NOISE_MOD,
)
from .session import load_table


def exploded_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per (doc_id, offset) span, in deterministic semantics.

    Columns: doc_id:string, doc_num:long, offset:int, kind:string,
    text:string, media_ref:string.
    """
    flat = load_table(spark, sf_dir, "documents")
    base = flat.select(
        F.format_string("doc-%06d", F.col("doc_id")).alias("doc_id"),
        F.col("doc_id").alias("doc_num"),
        F.filter(F.split("text", " "), lambda t: t != F.lit("")).alias("tokens"),
    )
    base = base.withColumn(
        "T", F.ceil(F.size("tokens") / F.lit(WORDS_PER_SPAN)).cast("int")
    ).filter(F.col("T") >= 1)
    base = base.withColumn(
        "K", (F.col("T") + F.floor(F.col("T") / 2)).cast("int")
    )
    pos = base.select(
        "doc_id", "doc_num", "tokens",
        F.explode(F.sequence(F.lit(0), F.col("K") - 1)).alias("k"),
    )
    is_media = ((F.col("k") + 1) % MEDIA_EVERY) == 0
    m_idx = F.floor((F.col("k") + 1) / MEDIA_EVERY).cast("int")
    j = (F.col("k") - F.floor((F.col("k") + 1) / MEDIA_EVERY)).cast("int")
    raw = F.array_join(
        F.slice(F.col("tokens"), j * WORDS_PER_SPAN + 1, WORDS_PER_SPAN), " "
    )
    empty_noise = ((F.col("doc_num") * 7 + j) % EMPTY_SPAN_MOD) == 0
    wrap_noise = ((F.col("doc_num") + j) % WRAP_NOISE_MOD) == 0
    text = (
        F.when(is_media, F.lit(None).cast("string"))
        .when(empty_noise, F.lit("   "))
        .when(wrap_noise, F.concat(F.lit("  "), raw, F.lit(" \n ")))
        .otherwise(raw)
    )
    media_ref = F.when(
        is_media, F.format_string("img://%s/p%d", F.col("doc_id"), m_idx)
    ).otherwise(F.lit(None).cast("string"))
    return pos.select(
        "doc_id",
        "doc_num",
        F.col("k").cast("int").alias("offset"),
        F.when(is_media, F.lit(KIND_MEDIA)).otherwise(F.lit(KIND_TEXT)).alias("kind"),
        text.alias("text"),
        media_ref.alias("media_ref"),
    )


def interleaved_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The input-hint table: (doc_id, spans array) with spans stored
    shuffled (md5 order) so offset-sort is load-bearing downstream."""
    spans = exploded_spans(spark, sf_dir)
    shuffled = spans.select(
        "doc_id",
        F.md5(F.concat_ws(":", "doc_id", "offset")).alias("sort_key"),
        F.struct(
            F.col("kind"), F.col("text"), F.col("media_ref"), F.col("offset")
        ).alias("span"),
    )
    return shuffled.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sort_key", "span"))),
            lambda s: s["span"],
        ).alias("spans")
    )


# --------------------------------------------------------------------------
# DuckDB oracle SQL fragments.  The driver registers the flat parquet as
# view `documents`; these CTEs rebuild the same exploded spans in SQL.
# --------------------------------------------------------------------------

SQL_EXPLODED_SPANS_CTE = f"""
toks AS (
  SELECT printf('doc-%06d', doc_id) AS doc_id,
         doc_id AS doc_num,
         list_filter(string_split(text, ' '), x -> x <> '') AS tokens
  FROM documents
),
dims AS (
  SELECT doc_id, doc_num, tokens,
         CAST(ceil(len(tokens) / {WORDS_PER_SPAN}.0) AS INT) AS T
  FROM toks
),
dims2 AS (
  SELECT doc_id, doc_num, tokens, T,
         CAST(T + T // 2 AS INT) AS K
  FROM dims WHERE T >= 1
),
pos AS (
  SELECT doc_id, doc_num, tokens,
         CAST(unnest(range(0, K)) AS INT) AS k
  FROM dims2
),
pos2 AS (
  SELECT doc_id, doc_num, k,
         ((k + 1) % {MEDIA_EVERY} = 0) AS is_media,
         CAST((k + 1) // {MEDIA_EVERY} AS INT) AS m_idx,
         CAST(k - (k + 1) // {MEDIA_EVERY} AS INT) AS j,
         array_to_string(
           list_slice(tokens, (k - (k + 1) // {MEDIA_EVERY}) * {WORDS_PER_SPAN} + 1,
                              (k - (k + 1) // {MEDIA_EVERY}) * {WORDS_PER_SPAN} + {WORDS_PER_SPAN}),
           ' ') AS raw
  FROM pos
),
spans AS (
  SELECT doc_id, doc_num, k AS "offset",
         CASE WHEN is_media THEN 'media' ELSE 'text' END AS kind,
         CASE WHEN is_media THEN NULL
              WHEN (doc_num * 7 + j) % {EMPTY_SPAN_MOD} = 0 THEN '   '
              WHEN (doc_num + j) % {WRAP_NOISE_MOD} = 0
                THEN '  ' || raw || ' ' || chr(10) || ' '
              ELSE raw END AS text,
         CASE WHEN is_media THEN printf('img://%s/p%d', doc_id, m_idx)
              ELSE NULL END AS media_ref
  FROM pos2
)
"""
