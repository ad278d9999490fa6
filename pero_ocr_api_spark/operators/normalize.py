r"""Normalization stages — all JVM-side built-ins (no Python in the hot
path; whole-stage codegen applies end-to-end).

- ``normalize_text_spans``: the text-branch boilerplate strip (SURVEY
  §2.9 X10): collapse whitespace runs, trim, drop empty spans.
  Whitespace is the EXPLICIT class ``[ \t\n\r\f\x0b]`` in all three
  engines: Java's ASCII ``\s``, Python's ``re.ASCII \s`` and RE2's
  ``\s`` disagree on \x0B (RE2 excludes it), and all of them exclude
  unicode whitespace like NBSP — so the engine pins the exact char
  set rather than trusting any ``\s``.  NBSP is content.  (Both
  divergences were found by the hypothesis property test + review.)
- ``normalize_transcriptions``: the Arabic visual→logical fix (SURVEY
  §2.7 F10; reference: arabic_helper at
  /root/reference/processing_client/run_client.py:218-220).  Arabic
  detection is a char-class rlike; the fix is reverse() — both built-in
  expressions, which beats the survey's pandas_udf suggestion (stays in
  codegen, no Arrow crossing).
- ``filter_confident_lines``: the PAGE/txt-path strip
  (run_client.py:36-37,213-216): with a positive threshold the
  reference keeps only lines where ``l.transcription_confidence and
  l.transcription_confidence > min_conf`` — i.e. NULL/zero-confidence
  lines are dropped too; with threshold <= 0 the strip is skipped
  entirely (``if args.min_confidence > 0``) and every line passes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..constants import MIN_CONFIDENCE, WS_CLASS

ARABIC_CHARCLASS = "[؀-ۿ]"


def normalized_text(col: Column) -> Column:
    return F.trim(F.regexp_replace(col, WS_CLASS + "+", " "))


def normalize_text_spans(df: DataFrame, text_col: str = "text") -> DataFrame:
    out = df.withColumn(text_col, normalized_text(F.col(text_col)))
    return out.filter(F.col(text_col) != "")


def fix_arabic(col: Column) -> Column:
    return F.when(col.rlike(ARABIC_CHARCLASS), F.reverse(col)).otherwise(col)


def normalize_transcriptions(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn(text_col, fix_arabic(F.col(text_col)))


def filter_confident_lines(
    df: DataFrame, conf_col: str = "conf", threshold: float = MIN_CONFIDENCE
) -> DataFrame:
    if threshold <= 0:
        return df
    c = F.col(conf_col)
    return df.filter(c.isNotNull() & (c > F.lit(threshold)))
