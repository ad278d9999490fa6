"""E1 submit-path tests: JSON request → exploded page rows → state
machine → documents shape (reference: routes.py:37-57, general.py:25-41)."""

import json

from pero_ocr_api_spark.constants import STATE_CREATED, STATE_WAITING
from pero_ocr_api_spark.plans.ingest import (
    complete_uploads, explode_pages, pages_to_documents, parse_requests,
)


def _requests_df(spark):
    payloads = [
        ("req-1", json.dumps({
            "engine": 1,
            "images": {
                "page_a": "http://x/scan_a.jpg",
                "page_b": None,                      # upload later → CREATED
                "page_c": "http://x/scan_c.bmp",     # bad extension
            },
        })),
        ("req-2", json.dumps({"engine": 2, "images": {"p1": "http://y/p1.png"}})),
    ]
    return spark.createDataFrame(payloads, "request_id string, payload string")


def test_parse_and_explode(spark):
    pages = explode_pages(parse_requests(_requests_df(spark)))
    rows = {(r.request_id, r.name): r for r in pages.collect()}
    assert len(rows) == 4
    assert rows[("req-1", "page_a")].state == STATE_WAITING
    assert rows[("req-1", "page_a")].ext == "jpg"
    assert rows[("req-1", "page_b")].state == STATE_CREATED
    assert rows[("req-1", "page_c")].state == "INVALID_FILE"
    assert rows[("req-2", "p1")].engine_id == 2
    # deterministic ids
    ids1 = {r.page_id for r in pages.collect()}
    ids2 = {r.page_id for r in explode_pages(parse_requests(_requests_df(spark))).collect()}
    assert ids1 == ids2 and len(ids1) == 4


def test_upload_completion_flips_state(spark):
    pages = explode_pages(parse_requests(_requests_df(spark)))
    uploads = spark.createDataFrame(
        [("req-1", "page_b", "file:///up/req-1/page_b.png")],
        "request_id string, name string, new_url string",
    )
    after = complete_uploads(pages, uploads)
    rows = {(r.request_id, r.name): r for r in after.collect()}
    assert rows[("req-1", "page_b")].state == STATE_WAITING
    assert rows[("req-1", "page_b")].url.endswith("page_b.png")
    # untouched rows unchanged
    assert rows[("req-1", "page_c")].state == "INVALID_FILE"


def test_pages_to_documents_shape(spark):
    pages = explode_pages(parse_requests(_requests_df(spark)))
    docs = pages_to_documents(pages)
    rows = docs.collect()
    assert len(rows) == 2  # only WAITING pages
    for r in rows:
        assert len(r.spans) == 1
        assert r.spans[0].kind == "media"
        assert r.spans[0].media_ref.startswith("http")
        assert r.spans[0].offset == 0
