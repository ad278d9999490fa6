"""Local replica of the driver's correctness gate: run a Spark query
and its DuckDB oracle SQL over the same parquet tables, compare
row-count + schema + order-insensitive values.  Strict cell-level
equality here implies any reasonable value-hash comparison passes.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(path):
            # a Spark-written table is a DIRECTORY of part files
            # (test fixtures); the driver's testdata ships single files
            path = os.path.join(path, "*.parquet")
        elif not os.path.exists(path):
            continue
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_localize(None)
            except TypeError:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif s.dtype == object:
            # Spark DateType comes back as object-dtype datetime.date
            # while DuckDB DATE is datetime64 — the driver hash treats
            # them alike (td_retention_cohorts was driver-green), so
            # canonicalize dates to datetime64 before the dtype-kind
            # strictness check below.
            import datetime as _dt

            nonnull = s.dropna()
            if len(nonnull) and all(
                isinstance(v, _dt.date) and not isinstance(v, _dt.datetime)
                for v in nonnull
            ):
                df[c] = pd.to_datetime(s).astype("datetime64[us]")
            else:
                df[c] = s.where(~s.isna(), None)
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(
        drop=True
    )
    return df


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Returns a list of human-readable mismatch descriptions (empty = pass)."""
    problems = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"columns: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}"
        )
        return problems
    a, b = _canon(spark_pdf), _canon(oracle_pdf)
    # The driver's value-hash is dtype-sensitive: a Spark BIGINT 339 vs
    # a DuckDB float64 339.0 hash-mismatches even though == passes.
    # Replicate that strictness here so the local gate catches the same
    # class of bug (r04's two reds were exactly this).
    def _kind(s: pd.Series) -> str:
        if pd.api.types.is_bool_dtype(s):
            return "bool"
        if pd.api.types.is_integer_dtype(s):
            return "int"
        if pd.api.types.is_float_dtype(s):
            return "float"
        if pd.api.types.is_datetime64_any_dtype(s):
            return "ts"
        return "obj"

    for c in a.columns:
        # A column with zero non-null cells has no hashable values, and
        # its pandas dtype is an artifact of the transfer path (Spark
        # DateType -> object vs DuckDB DATE -> datetime64 on an empty /
        # all-NULL column): no kind verdict is possible, and an actual
        # all-null-vs-values divergence is caught by the value loop.
        if a[c].notna().sum() == 0 or b[c].notna().sum() == 0:
            continue
        ka, kb = _kind(a[c]), _kind(b[c])
        if ka != kb:
            problems.append(
                f"col {c}: dtype kind mismatch spark={ka} oracle={kb} "
                f"(driver value-hash would differ)"
            )
    if problems:
        return problems
    if len(a) != len(b):
        return problems
    for c in a.columns:
        sa, sb = a[c], b[c]
        if pd.api.types.is_float_dtype(sa) and pd.api.types.is_float_dtype(sb):
            import numpy as np
            ok = np.isclose(
                sa.to_numpy(), sb.to_numpy(), rtol=0, atol=0, equal_nan=True
            )
            if not ok.all():
                i = int((~ok).argmax())
                problems.append(
                    f"col {c}: first diff row {i}: {sa.iloc[i]!r} vs {sb.iloc[i]!r}"
                )
        else:
            eq = (sa == sb) | (sa.isna() & sb.isna())
            if not eq.all():
                i = int((~eq).argmax())
                problems.append(
                    f"col {c}: first diff row {i}: {sa.iloc[i]!r} vs {sb.iloc[i]!r}"
                )
    return problems


def run_pair(spark, sf_dir: str, query_fn, sql: str) -> list[str]:
    spark_pdf = query_fn(spark, sf_dir).toPandas()
    con = duckdb_con(sf_dir)
    try:
        oracle_pdf = con.execute(sql).fetchdf()
    finally:
        con.close()
    return compare_frames(spark_pdf, oracle_pdf)
