"""Multimodal-plumbing queries with full DuckDB oracles.

The sandbox media stages (operators/multimodal.py) are deterministic
functions of ``media_ref`` — synth payloads are md5-derived — so even
the Arrow-batched decode stage has an exact SQL twin:

- the fake payload is the 16 md5 bytes tiled (128-byte buffer, then
  ``np.resize`` tiling again), so byte ``j`` of the decoded image is
  ``md5_byte(j % 16)`` and the mean intensity has the closed form
  ``((n // 16) * sum16 + prefix(n % 16)) / n`` with ``n = w*h*3``;
- width/height/format are ascii arithmetic over the md5 hex;
- frame keys are md5 of ``ref#f{i}`` at stride ``every_n``.

Integer sums are exact in float64 on both engines, so the division
matches bit-for-bit (compare.py uses atol=0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    decode_images,
    resize_images,
    sample_frames,
    synth_media_bytes,
)
from ..synth import SQL_EXPLODED_SPANS_CTE, exploded_spans
from .extraction_sql import _hexval_sql

from ..registry import make_registry

REGISTRY, _reg = make_registry()

# COUPLED INVARIANTS with operators/multimodal.py — revisit BOTH sides
# if any change:
# - the MAX_MEGAPIXELS=5 downscale in _decode_fake is unreachable for
#   synth dims (max 1696x880 = 1.49 MP), so SQL_MM_DECODE omits it;
# - SQL_MM_FRAMES hardcodes stride 10 (= sample_frames default) and
#   SQL_MM_RESIZE hardcodes 512 (= resize_images default).


def _media_refs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct media refs, REPARTITIONED to cluster width after the
    dedup: the distinct's shuffle output is a few MB of ref strings, so
    AQE coalesces it toward one partition — and the downstream
    mapInPandas stages then decode EVERY image on one Python worker
    (measured: td_mm_features 15+ min single-core at sf0.1 vs seconds
    wide).  Same rows-expand-after-redistribute rule as shingles_df and
    the extraction salt: repartition BEFORE the per-row work explodes,
    because AQE sizes partitions by bytes-at-shuffle, not by downstream
    cost.  The repartition must be ROUND-ROBIN (no column): a hash
    repartition on media_ref matches the distinct's existing
    partitioning, so Catalyst removes it as redundant and the surviving
    ENSURE_REQUIREMENTS exchange stays AQE-coalescible — exactly the
    single-worker plan again.  Round-robin is a distinct partitioning
    with REPARTITION_BY_NUM origin, which AQE never coalesces."""
    return (
        exploded_spans(spark, sf_dir)
        .filter(F.col("kind") == "media")
        .select("media_ref")
        .distinct()
        .repartition(spark.sparkContext.defaultParallelism)
    )


# Shared oracle CTE: distinct media refs + synth metadata
# (mirrors operators/multimodal.synth_media_bytes).
_META_CTE = f"""
refs AS (
  SELECT DISTINCT media_ref FROM spans WHERE kind = 'media'
),
meta AS (
  SELECT media_ref, md5(media_ref) AS h,
         CAST(64 + ascii(substr(md5(media_ref), 2, 1)) * 16 AS INT) AS width,
         CAST(64 + ascii(substr(md5(media_ref), 3, 1)) * 8 AS INT) AS height
  FROM refs
)
"""


def q_mm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_images(synth_media_bytes(_media_refs(spark, sf_dir)))


_BYTE_K = (
    f"({_hexval_sql('substr(h, 2*k + 1, 1)')} * 16"
    f" + {_hexval_sql('substr(h, 2*k + 2, 1)')})"
)

SQL_MM_DECODE = f"""WITH {SQL_EXPLODED_SPANS_CTE.strip()},
{_META_CTE.strip()},
bytes AS (
  SELECT media_ref, width, height,
         list_transform(range(0, 16), k -> {_BYTE_K}) AS bl
  FROM meta
),
calc AS (
  SELECT media_ref, width, height,
         CAST(width AS BIGINT) * height * 3 AS n,
         list_sum(bl) AS s16,
         coalesce(list_sum(bl[1:(CAST(width AS BIGINT) * height * 3) % 16]), 0)
           AS prefix
  FROM bytes
)
SELECT media_ref, width, height, 3 AS channels,
       ((n // 16) * s16 + prefix) / CAST(n AS DOUBLE) AS mean_intensity,
       TRUE AS ok
FROM calc
"""
REGISTRY["td_mm_decode"] = (q_mm_decode, SQL_MM_DECODE)


def q_mm_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return resize_images(synth_media_bytes(_media_refs(spark, sf_dir)))


SQL_MM_RESIZE = f"""WITH {SQL_EXPLODED_SPANS_CTE.strip()},
{_META_CTE.strip()},
scaled AS (
  SELECT media_ref, width, height,
         least(1.0, 512.0 / greatest(width, height)) AS scale
  FROM meta
)
SELECT media_ref,
       CAST(round(width * scale, 0) AS INT) AS out_width,
       CAST(round(height * scale, 0) AS INT) AS out_height,
       round(scale, 6) AS scale
FROM scaled
"""
REGISTRY["td_mm_resize_plan"] = (q_mm_resize_plan, SQL_MM_RESIZE)


def q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_frames(synth_media_bytes(_media_refs(spark, sf_dir)))


SQL_MM_FRAMES = f"""WITH {SQL_EXPLODED_SPANS_CTE.strip()},
{_META_CTE.strip()},
counts AS (
  SELECT media_ref, 1 + ascii(substr(h, 1, 1)) % 30 AS n_frames FROM meta
)
SELECT media_ref,
       CAST(unnest(range(0, n_frames, 10)) AS INT) AS frame_idx,
       substr(md5(media_ref || '#f' || CAST(unnest(range(0, n_frames, 10)) AS INT)), 1, 12) AS frame_key
FROM counts
"""
REGISTRY["td_mm_frame_sample"] = (q_mm_frame_sample, SQL_MM_FRAMES)


def q_mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import extract_features

    return extract_features(synth_media_bytes(_media_refs(spark, sf_dir)))


# Same tiling closed form as SQL_MM_DECODE, extended to per-position
# weights: byte k of the 16-byte md5 cycle occurs n//16 times plus one
# more when k < n % 16.  Histogram bins are the >>6 buckets; std comes
# from exact integer sums of values and squares (sqrt and the one
# division are exactly-rounded IEEE ops on identical inputs).
SQL_MM_FEATURES = f"""WITH {SQL_EXPLODED_SPANS_CTE.strip()},
{_META_CTE.strip()},
bytes AS (
  SELECT media_ref, width, height,
         list_transform(range(0, 16), k -> {_BYTE_K}) AS bl
  FROM meta
),
calc AS (
  SELECT media_ref,
         CAST(width AS BIGINT) * height * 3 AS n,
         bl,
         list_transform(range(0, 16),
           k -> (CAST(width AS BIGINT) * height * 3) // 16
                + CASE WHEN k < (CAST(width AS BIGINT) * height * 3) % 16
                       THEN 1 ELSE 0 END) AS wts
  FROM bytes
),
agg AS (
  SELECT media_ref, n,
         list_sum(list_transform(range(0, 16),
           k -> CASE WHEN bl[k+1] // 64 = 0 THEN wts[k+1] ELSE 0 END)) AS b0,
         list_sum(list_transform(range(0, 16),
           k -> CASE WHEN bl[k+1] // 64 = 1 THEN wts[k+1] ELSE 0 END)) AS b1,
         list_sum(list_transform(range(0, 16),
           k -> CASE WHEN bl[k+1] // 64 = 2 THEN wts[k+1] ELSE 0 END)) AS b2,
         list_sum(list_transform(range(0, 16),
           k -> CASE WHEN bl[k+1] // 64 = 3 THEN wts[k+1] ELSE 0 END)) AS b3,
         list_sum(list_transform(range(0, 16), k -> bl[k+1] * wts[k+1])) AS s,
         list_sum(list_transform(range(0, 16),
           k -> bl[k+1] * bl[k+1] * wts[k+1])) AS s2
  FROM calc
)
SELECT media_ref,
       CAST(b0 AS BIGINT) AS b0, CAST(b1 AS BIGINT) AS b1,
       CAST(b2 AS BIGINT) AS b2, CAST(b3 AS BIGINT) AS b3,
       s / CAST(n AS DOUBLE) AS mean_intensity,
       sqrt(s2 / CAST(n AS DOUBLE)
            - (s / CAST(n AS DOUBLE)) * (s / CAST(n AS DOUBLE)))
         AS std_intensity
FROM agg
"""
REGISTRY["td_mm_features"] = (q_mm_features, SQL_MM_FEATURES)
