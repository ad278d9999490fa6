"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pero_ocr_api_spark.queries import extraction as _qx
from pero_ocr_api_spark.queries import extraction_sql as _sx
from pero_ocr_api_spark.functions.dedup import REGISTRY as _DEDUP
from pero_ocr_api_spark.functions.similarity import REGISTRY as _SIM
from pero_ocr_api_spark.functions.text import REGISTRY as _TEXT
from pero_ocr_api_spark.queries.controlplane import REGISTRY as _CP
from pero_ocr_api_spark.queries.multimodal_q import REGISTRY as _MM
from pero_ocr_api_spark.queries.sql_surface import REGISTRY as _SQL
from pero_ocr_api_spark.queries.statemachine_q import REGISTRY as _SM


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extraction over the interleaved documents table
    synthesized from sf0.001 — per-doc span sequences in reading order."""
    return _qx.q_pipeline_spans(spark, "/root/testdata/sf0.001")


_EXTRACTION_QUERIES = {
    "extract_input_spans": (_qx.q_input_spans, _sx.SQL_INPUT_SPANS),
    "extract_pipeline_spans": (_qx.q_pipeline_spans, _sx.SQL_PIPELINE_SPANS),
    "extract_doc_results": (_qx.q_doc_results, _sx.SQL_DOC_RESULTS),
    "extract_serialize_txt": (_qx.q_serialize_txt, _sx.SQL_SERIALIZE_TXT),
    "extract_serialize_alto": (_qx.q_serialize_alto, _sx.SQL_SERIALIZE_ALTO),
    "extract_serialize_page": (
        _qx.q_serialize_artifacts, _sx.SQL_SERIALIZE_ARTIFACTS),
    "extract_conf_histogram": (_qx.q_conf_histogram, _sx.SQL_CONF_HISTOGRAM),
}


def _registry() -> dict[str, tuple]:
    reg = dict(_EXTRACTION_QUERIES)
    reg.update(_CP)
    reg.update(_SM)
    reg.update(_TEXT)
    reg.update(_DEDUP)
    reg.update(_SIM)
    reg.update(_MM)
    reg.update(_SQL)
    return reg


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_fn, sql) in _registry().items() if sql is not None
    }
