"""availableNow streaming variant must equal the batch run, and a second
invocation must process only newly-arrived files (incremental, no
duplicates)."""

import os

from pero_ocr_api_spark.plans.pipeline import extract
from pero_ocr_api_spark.streaming.stream import incremental_extract
from pero_ocr_api_spark.synth import interleaved_documents


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.select(
        "doc_id", "order", "kind", "text", "media_ref").collect())


def test_streaming_equals_batch(spark, sf_smoke, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    in_dir = str(base / "in")
    out_dir = str(base / "out")
    ckpt = str(base / "ckpt")

    docs = interleaved_documents(spark, sf_smoke)
    first = docs.filter("doc_id < 'doc-000250'")
    second = docs.filter("doc_id >= 'doc-000250'")

    os.makedirs(in_dir, exist_ok=True)
    first.write.mode("append").parquet(in_dir)
    incremental_extract(spark, in_dir, out_dir, ckpt)

    got_first = _sorted_rows(spark.read.parquet(os.path.join(out_dir, "spans")))
    exp_first = _sorted_rows(extract(spark, first, with_metrics=False).spans)
    assert got_first == exp_first

    # late-arriving files: only the delta is processed on re-trigger
    second.write.mode("append").parquet(in_dir)
    incremental_extract(spark, in_dir, out_dir, ckpt)

    got_all = _sorted_rows(spark.read.parquet(os.path.join(out_dir, "spans")))
    exp_all = _sorted_rows(extract(spark, docs, with_metrics=False).spans)
    assert got_all == exp_all  # no duplicates, nothing missing
