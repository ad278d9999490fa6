"""DuckDB oracle SQL for the extraction pipeline — the SQL twin of
plans/pipeline.py, built from the same constants so the two cannot
drift independently.  The driver runs these against its pre-registered
`documents` view and hash-compares with the Spark results.
"""

from __future__ import annotations

from ..constants import (
    WS_CLASS,
    ARABIC_BASE_CP,
    ARABIC_MOD,
    CONF_MOD,
    DEFAULT_SCORE,
    ERROR_MOD,
    MAX_LINES,
    MIN_CONFIDENCE,
    SCORE_DP,
    SCORE_SCALE,
    STATE_INVALID_FILE,
    STATE_NOT_FOUND,
    STATE_PROCESSED,
    STATE_PROCESSING_FAILED,
)
from ..synth import SQL_EXPLODED_SPANS_CTE


def _hexval_sql(expr: str) -> str:
    """hex char -> nibble value, portable ascii arithmetic."""
    a = f"ascii({expr})"
    return f"({a} - CASE WHEN {a} >= 97 THEN 87 ELSE 48 END)"


def _arabic_sql(g: str) -> str:
    chars = " || ".join(
        f"chr({ARABIC_BASE_CP} + {_hexval_sql(f'substr({g}, {i}, 1)')})"
        for i in range(1, 5)
    )
    return f"'ar-' || {chars}"


# CTEs that re-run the whole pipeline in SQL on top of the synthesized
# `spans` CTE.  The oracle computes the *logical* Arabic form directly
# (the engine's stub emits visual order and the normalize stage
# reverses it back — a no-op round trip by construction).
PIPELINE_CTES = f"""
media AS (
  SELECT doc_id, "offset", media_ref, md5(media_ref) AS h
  FROM spans WHERE kind = 'media'
),
media2 AS (
  SELECT doc_id, "offset", media_ref, h,
         (ascii(substr(h,1,1)) * 16 + ascii(substr(h,2,1))) % {ERROR_MOD} AS code,
         1 + ascii(substr(h,3,1)) % {MAX_LINES} AS n_lines
  FROM media
),
media_err AS (
  SELECT doc_id, "offset",
         CASE code WHEN 0 THEN '{STATE_NOT_FOUND}'
                   WHEN 1 THEN '{STATE_INVALID_FILE}'
                   ELSE '{STATE_PROCESSING_FAILED}' END AS error
  FROM media2 WHERE code <= 2
),
lines0 AS (
  SELECT doc_id, "offset", media_ref,
         CAST(unnest(range(1, n_lines + 1)) AS INT) AS line_idx
  FROM media2 WHERE code > 2
),
lines1 AS (
  SELECT doc_id, "offset", media_ref, line_idx,
         md5(media_ref || ':' || line_idx) AS g
  FROM lines0
),
lines2 AS (
  SELECT doc_id, "offset", media_ref, line_idx,
         ((ascii(substr(g,1,1)) * 16 + ascii(substr(g,2,1))) % {CONF_MOD}) / 100.0 AS conf,
         CASE WHEN ascii(substr(g,3,1)) % {ARABIC_MOD} = 0
              THEN {_arabic_sql('g')}
              ELSE 'line-' || substr(g, 1, 8) END AS text,
         CASE WHEN ascii(substr(g,3,1)) % {ARABIC_MOD} = 0
              THEN reverse({_arabic_sql('g')})
              ELSE 'line-' || substr(g, 1, 8) END AS stored_text
  FROM lines1
),
kept AS (
  SELECT * FROM lines2 WHERE conf > {MIN_CONFIDENCE}
),
text_kept AS (
  SELECT doc_id, "offset",
         trim(regexp_replace(text, '{WS_CLASS}+', ' ', 'g')) AS text
  FROM spans WHERE kind = 'text'
),
merged AS (
  SELECT doc_id, "offset", 0 AS line_idx, 'text' AS kind, text,
         CAST(NULL AS VARCHAR) AS media_ref, CAST(NULL AS DOUBLE) AS conf
  FROM text_kept WHERE text <> ''
  UNION ALL
  SELECT doc_id, "offset", line_idx, 'media' AS kind, text, media_ref, conf
  FROM kept
),
ordered AS (
  SELECT doc_id,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY "offset", line_idx) - 1 AS INT) AS "order",
         kind, text, media_ref, conf
  FROM merged
)
"""

_PREFIX = f"WITH {SQL_EXPLODED_SPANS_CTE.strip()},\n{PIPELINE_CTES.strip()}"

SQL_INPUT_SPANS = f"""WITH {SQL_EXPLODED_SPANS_CTE.strip()}
SELECT doc_id, "offset", kind, text, media_ref FROM spans
"""

SQL_PIPELINE_SPANS = f"""{_PREFIX}
SELECT doc_id, "order", kind, text, media_ref FROM ordered
"""

SQL_DOC_RESULTS = f"""{_PREFIX},
scores AS (
  SELECT doc_id, round(median(conf) * {SCORE_SCALE}, {SCORE_DP}) AS mscore
  FROM ordered GROUP BY doc_id
),
errs AS (
  SELECT doc_id, min_by(error, "offset") AS first_error
  FROM media_err GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(s.mscore, {DEFAULT_SCORE}) AS score,
       coalesce(e.first_error, '{STATE_PROCESSED}') AS status
FROM (SELECT DISTINCT doc_id FROM spans) d
LEFT JOIN scores s USING (doc_id)
LEFT JOIN errs e USING (doc_id)
"""

SQL_SERIALIZE_TXT = f"""{_PREFIX}
SELECT doc_id,
       string_agg(text, chr(10) ORDER BY "order") AS txt
FROM ordered GROUP BY doc_id
"""

SQL_CONF_HISTOGRAM = f"""{_PREFIX}
SELECT kind, count(*) AS n_spans,
       round(round(sum(conf), 4) / count(conf), 6) AS avg_conf
FROM ordered GROUP BY kind
"""

_XML_ESC = (
    "replace(replace(replace(replace({c}, '&', '&amp;'), "
    "'<', '&lt;'), '>', '&gt;'), '\"', '&quot;')"
)

# ALTO path (run_client.py:210-211): built from the pre-strip,
# pre-arabic-fix transcriptions (stored_text = visual order), threshold
# applied inside serialization, WC attribute per OCR line.  Mirrors
# operators/serialize.py::serialize_alto.
SQL_SERIALIZE_ALTO = f"""{_PREFIX},
alto_src AS (
  SELECT doc_id, "offset", 0 AS line_idx, 'text' AS kind, text,
         CAST(NULL AS DOUBLE) AS conf
  FROM text_kept WHERE text <> ''
  UNION ALL
  SELECT doc_id, "offset", line_idx, 'media' AS kind, stored_text AS text, conf
  FROM lines2 WHERE conf > {MIN_CONFIDENCE}
),
alto_lines AS (
  SELECT doc_id,
         string_agg(
           '    <TextLine ID="l' || ("offset" * 1000 + line_idx) || '"'
           || CASE WHEN kind = 'media'
                   THEN ' WC="' || printf('%.2f', conf) || '"'
                   ELSE '' END
           || '><String CONTENT="' || {_XML_ESC.format(c='text')}
           || '"/></TextLine>',
           chr(10) ORDER BY "offset", line_idx) AS body
  FROM alto_src GROUP BY doc_id
)
SELECT doc_id,
       doc_id || '_alto.xml' AS alto_name,
       '<alto><Layout><Page ID="' || doc_id || '">' || chr(10)
         || body || chr(10) || '</Page></Layout></alto>' AS alto_xml
FROM alto_lines
"""

# PAGE-XML + txt artifacts from the final (stripped, arabic-fixed,
# reading-ordered) spans — the 3-format fan-out (routes.py:252-254)
# minus the ALTO member, which comes from SQL_SERIALIZE_ALTO.
SQL_SERIALIZE_ARTIFACTS = f"""{_PREFIX},
page_lines AS (
  SELECT doc_id,
         string_agg(
           '    <TextLine id="l' || "order" || '" kind="' || kind
           || '"><Unicode>' || {_XML_ESC.format(c='text')}
           || '</Unicode></TextLine>',
           chr(10) ORDER BY "order") AS page_body,
         string_agg(text, chr(10) ORDER BY "order") AS txt
  FROM ordered GROUP BY doc_id
)
SELECT doc_id,
       doc_id || '_page.xml' AS page_name,
       '<PcGts><Page imageFilename="' || doc_id || '">' || chr(10)
         || page_body || chr(10) || '</Page></PcGts>' AS page_xml,
       doc_id || '.txt' AS txt_name,
       txt
FROM page_lines
"""


SQL_REGIONS = f"""WITH {SQL_EXPLODED_SPANS_CTE.strip()},
b AS (
  SELECT doc_id, "offset", kind,
         CASE WHEN lag("offset") OVER w IS NULL
                   OR "offset" - lag("offset") OVER w > 1
                   OR kind <> lag(kind) OVER w
              THEN 1 ELSE 0 END AS nb
  FROM spans WINDOW w AS (PARTITION BY doc_id ORDER BY "offset")),
r AS (
  SELECT doc_id, kind, "offset",
         CAST(sum(nb) OVER (PARTITION BY doc_id ORDER BY "offset") - 1
              AS INT) AS region_id
  FROM b)
SELECT doc_id, region_id, min(kind) AS region_kind, count(*) AS n_spans,
       min("offset") AS start_offset, max("offset") AS end_offset
FROM r GROUP BY doc_id, region_id
"""
