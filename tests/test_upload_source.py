"""The custom Python DataSource (Spark 4 API): an upload directory as
a relational table, batch and streaming (routes.py:27-133 analog)."""

import os

import pytest

from pero_ocr_api_spark.sources import register_upload_source


def _write(d, name, payload: bytes):
    with open(os.path.join(d, name), "wb") as f:
        f.write(payload)


@pytest.fixture()
def inbox(tmp_path):
    d = tmp_path / "uploads"
    d.mkdir()
    _write(d, "page_001.jpg", b"\x01\x02\x03")
    _write(d, "page_002.png", b"\x04\x05")
    _write(d, "notes.txt", b"not an image")
    _write(d, "noext", b"")
    return str(d)


def test_upload_batch_read(spark, inbox):
    register_upload_source(spark)
    df = spark.read.format("pero_uploads").option("path", inbox).load()
    rows = {r.page_id: r for r in df.collect()}
    assert set(rows) == {"page_001", "page_002", "notes", "noext"}
    assert rows["page_001"].valid and rows["page_001"].ext == "jpg"
    assert bytes(rows["page_001"].payload) == b"\x01\x02\x03"
    assert rows["page_001"].size_bytes == 3
    # the 422 branch: wrong extension surfaces as valid=false, not a drop
    assert not rows["notes"].valid
    assert not rows["noext"].valid and rows["noext"].ext == ""
    # relational composition: the source is a normal DataFrame
    assert df.filter("valid").count() == 2


def test_upload_stream_incremental(spark, inbox, tmp_path):
    register_upload_source(spark)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")

    def drain():
        q = (
            spark.readStream.format("pero_uploads")
            .option("path", inbox)
            .load()
            .drop("payload")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    first = {r.page_id for r in spark.read.parquet(out).collect()}
    assert first == {"page_001", "page_002", "notes", "noext"}

    # new uploads land; a re-drain reads ONLY them (offset cursor)
    _write(inbox, "page_003.tif", b"\x09")
    drain()
    rows = spark.read.parquet(out).collect()
    assert {r.page_id for r in rows} == first | {"page_003"}
    assert len(rows) == 5  # no re-reads: exactly-once per file

    # idle re-drain appends nothing
    drain()
    assert spark.read.parquet(out).count() == 5


def test_upload_stream_offset_survives_deletes_and_mtime_ties(
    spark, tmp_path
):
    """The ADVICE scenario: a positional offset skips/duplicates when
    the inbox shrinks (reference cleans processed uploads) or when a
    new file's mtime ties an already-committed one.  The watermark
    offset must read each file exactly once through both."""
    inbox = tmp_path / "uploads"
    inbox.mkdir()
    _write(inbox, "a.jpg", b"\x01")
    _write(inbox, "c.jpg", b"\x02")
    t0 = os.stat(os.path.join(inbox, "a.jpg")).st_mtime_ns
    # pin both to the same mtime
    os.utime(os.path.join(inbox, "a.jpg"), ns=(t0, t0))
    os.utime(os.path.join(inbox, "c.jpg"), ns=(t0, t0))

    register_upload_source(spark)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")

    def drain():
        q = (
            spark.readStream.format("pero_uploads")
            .option("path", str(inbox))
            .load()
            .drop("payload")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    assert {r.page_id for r in spark.read.parquet(out).collect()} == {"a", "c"}

    # a NEW file whose (mtime, name) ties the committed frontier: same
    # mtime as a/c, name sorts between them — a positional cursor would
    # skip it or re-read c; the names-at-frontier set catches it
    _write(inbox, "b.jpg", b"\x03")
    os.utime(os.path.join(inbox, "b.jpg"), ns=(t0, t0))
    # AND the already-processed file is cleaned up (reference behavior)
    os.remove(os.path.join(inbox, "a.jpg"))
    drain()
    rows = spark.read.parquet(out).collect()
    assert sorted(r.page_id for r in rows) == ["a", "b", "c"]  # exactly once

    # emptying the inbox entirely must not regress the offset or emit
    os.remove(os.path.join(inbox, "b.jpg"))
    os.remove(os.path.join(inbox, "c.jpg"))
    drain()
    assert spark.read.parquet(out).count() == 3

    # and a genuinely newer file after the purge still flows
    _write(inbox, "d.jpg", b"\x04")
    os.utime(
        os.path.join(inbox, "d.jpg"), ns=(t0 + 1_000_000, t0 + 1_000_000)
    )
    drain()
    assert sorted(
        r.page_id for r in spark.read.parquet(out).collect()
    ) == ["a", "b", "c", "d"]


def test_upload_stream_frontier_survives_restart(spark, tmp_path):
    """The monotonicity guard must hold across query RESTARTS (a fresh
    reader instance): after the inbox is cleaned and the query
    restarted, latestOffset must return the persisted committed
    frontier — not initialOffset — and a processed file re-landed with
    its original mtime (mv preserves mtime; the reference re-uploads
    failed requests under the same name) must NOT produce a duplicate
    row."""
    from pero_ocr_api_spark.sources.upload_source import (
        UploadStreamReader,
    )

    inbox = tmp_path / "uploads"
    inbox.mkdir()
    _write(inbox, "a.jpg", b"\x01")
    t0 = os.stat(os.path.join(inbox, "a.jpg")).st_mtime_ns
    os.utime(os.path.join(inbox, "a.jpg"), ns=(t0, t0))

    register_upload_source(spark)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")

    def drain():
        q = (
            spark.readStream.format("pero_uploads")
            .option("path", str(inbox))
            .load()
            .drop("payload")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    assert spark.read.parquet(out).count() == 1
    payload = open(os.path.join(inbox, "a.jpg"), "rb").read()

    # inbox cleaned (reference behavior), then RESTART: a brand-new
    # reader must seed its guard from the persisted frontier
    os.remove(os.path.join(inbox, "a.jpg"))
    fresh = UploadStreamReader(str(inbox))
    off = fresh.latestOffset()
    assert off["m"] == t0 and "a.jpg" in off["names"]

    # old upload re-lands with its original mtime: behind the
    # committed watermark -> exactly-once holds through the restart
    with open(os.path.join(inbox, "a.jpg"), "wb") as f:
        f.write(payload)
    os.utime(os.path.join(inbox, "a.jpg"), ns=(t0, t0))
    drain()
    assert spark.read.parquet(out).count() == 1
