"""The one shared definition of the md5 hex-byte bucket idiom.

Deterministic hash-bucketing (corpus splits, sampling rates, pack
groups) decodes two md5 hex nibbles into a uniform 0-255 byte with
ascii arithmetic — portable across Spark and DuckDB (no conv(), no
from_hex).  Its cross-engine equivalence is load-bearing for every
oracle pair that uses it, so both dialects are generated HERE and
nowhere else.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_byte_col(expr: Column, pos: int = 1) -> Column:
    """Spark Column: hex nibbles at (pos, pos+1) of md5(expr) decoded
    to a uniform 0-255 integer.  ``expr`` must already be a string
    column (cast upstream, so both dialects cast identically)."""
    h = F.md5(expr)

    def nibble(p: int) -> Column:
        a = F.ascii(F.substring(h, p, 1))
        return a - F.when(a >= 97, 87).otherwise(48)

    return nibble(pos) * 16 + nibble(pos + 1)


def md5_byte_sql(expr: str, pos: int = 1) -> str:
    """The DuckDB-SQL twin of md5_byte_col, over a SQL expression
    string (pre-cast to VARCHAR by the caller, same as the Column
    form)."""

    def nibble(p: int) -> str:
        a = f"ascii(substr(md5({expr}), {p}, 1))"
        return f"({a} - CASE WHEN {a} >= 97 THEN 87 ELSE 48 END)"

    return f"({nibble(pos)} * 16 + {nibble(pos + 1)})"


def md5_u16_col(expr: Column) -> Column:
    """Spark Column: the first FOUR md5 hex nibbles of ``expr`` decoded
    to a uniform 0-65535 integer (two md5_byte pairs) — the feature-
    weight domain of the hashed linear classifier.  Kept here so the
    Spark and DuckDB dialects decode identically."""
    return (md5_byte_col(expr, 1) * 256 + md5_byte_col(expr, 3)).cast("long")


def md5_u16_sql(expr: str) -> str:
    """The DuckDB-SQL twin of md5_u16_col."""
    return f"({md5_byte_sql(expr, 1)} * 256 + {md5_byte_sql(expr, 3)})"
