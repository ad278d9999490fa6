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


def test_upload_rejections_leave_page_retryable(spark):
    """Reference parity (routes.py:80-81,96-102): a 400-class upload —
    wrong page state or disallowed extension — changes NOTHING on the
    page row, so a later valid upload still applies; rejected uploads
    surface with a reason."""
    from pero_ocr_api_spark.plans.ingest import rejected_uploads

    pages = explode_pages(parse_requests(_requests_df(spark)))

    # bad-extension upload to a CREATED page: rejected, page untouched
    bad = spark.createDataFrame(
        [("req-1", "page_b", "file:///up/req-1/page_b.bmp")],
        "request_id string, name string, new_url string",
    )
    after_bad = {(r.request_id, r.name): r
                 for r in complete_uploads(pages, bad).collect()}
    assert after_bad[("req-1", "page_b")].state == STATE_CREATED
    assert after_bad[("req-1", "page_b")].url is None
    rej = {(r.request_id, r.name): r.reason
           for r in rejected_uploads(pages, bad).collect()}
    assert rej[("req-1", "page_b")] == "BAD_EXTENSION"

    # upload to a non-CREATED page: rejected, url NOT rewritten
    wrong = spark.createDataFrame(
        [("req-1", "page_a", "file:///up/req-1/page_a.png")],
        "request_id string, name string, new_url string",
    )
    after_wrong = {(r.request_id, r.name): r
                   for r in complete_uploads(pages, wrong).collect()}
    assert after_wrong[("req-1", "page_a")].url == "http://x/scan_a.jpg"
    assert rejected_uploads(pages, wrong).collect()[0].reason == "WRONG_STATE"

    # retry with a good extension after the bad one: applies
    good = spark.createDataFrame(
        [("req-1", "page_b", "file:///up/req-1/page_b.png")],
        "request_id string, name string, new_url string",
    )
    pages_after_bad = complete_uploads(pages, bad)
    after_retry = {(r.request_id, r.name): r
                   for r in complete_uploads(pages_after_bad, good).collect()}
    assert after_retry[("req-1", "page_b")].state == STATE_WAITING
    assert after_retry[("req-1", "page_b")].ext == "png"

    # duplicate upload rows collapse to ONE page row (idempotence)
    dup = spark.createDataFrame(
        [("req-1", "page_b", "file:///up/v1/page_b.png"),
         ("req-1", "page_b", "file:///up/v2/page_b.png")],
        "request_id string, name string, new_url string",
    )
    out = complete_uploads(pages, dup)
    assert out.filter("request_id = 'req-1' AND name = 'page_b'").count() == 1


def test_url_ext_ignores_query_and_fragment(spark):
    import json as _json

    raw = spark.createDataFrame(
        [("rq", _json.dumps({"engine": 1, "images": {
            "q": "http://x/scan.jpg?token=abc",
            "f": "http://x/deep/v1.2/scan.png#frag",
        }}))],
        "request_id string, payload string",
    )
    rows = {r.name: r for r in explode_pages(parse_requests(raw)).collect()}
    assert rows["q"].ext == "jpg" and rows["q"].state == STATE_WAITING
    assert rows["f"].ext == "png" and rows["f"].state == STATE_WAITING


def test_engineless_payload_invalid(spark):
    import json as _json

    from pero_ocr_api_spark.plans.ingest import invalid_requests

    raw = spark.createDataFrame(
        [("r-ok", _json.dumps({"engine": 1, "images": {"a": "http://x/a.jpg"}})),
         ("r-noeng", _json.dumps({"images": {"a": "http://x/a.jpg"}})),
         ("r-badjson", "{{{")],
        "request_id string, payload string",
    )
    reqs = parse_requests(raw)
    assert sorted(r.request_id for r in invalid_requests(reqs).collect()) == [
        "r-badjson", "r-noeng",
    ]
    # invalid requests emit no pages
    assert explode_pages(reqs).filter("request_id <> 'r-ok'").count() == 0


def test_page_id_delimiter_unambiguous(spark):
    import json as _json

    raw = spark.createDataFrame(
        [("r:1", _json.dumps({"engine": 1, "images": {"p.jpg": "http://x/p.jpg"}})),
         ("r", _json.dumps({"engine": 1, "images": {"1:p.jpg": "http://x/p.jpg"}}))],
        "request_id string, payload string",
    )
    ids = [r.page_id for r in explode_pages(parse_requests(raw)).collect()]
    assert len(ids) == 2 and ids[0] != ids[1]


def test_valid_upload_not_shadowed_by_invalid_retry(spark):
    """Same-batch retries for one page: the valid-extension candidate
    must win even when an invalid one sorts lexicographically later —
    the reference applies uploads sequentially, so the valid file
    lands (ADVICE r1: max(new_url) alone let 'z.pdf' shadow 'a.png')."""
    pages = explode_pages(parse_requests(_requests_df(spark)))
    uploads = spark.createDataFrame(
        [
            ("req-1", "page_b", "file:///up/a.png"),     # valid
            ("req-1", "page_b", "file:///up/z.pdf"),     # invalid, sorts last
        ],
        "request_id string, name string, new_url string",
    )
    after = {(r.request_id, r.name): r for r in complete_uploads(pages, uploads).collect()}
    assert after[("req-1", "page_b")].state == STATE_WAITING
    assert after[("req-1", "page_b")].url == "file:///up/a.png"
    assert after[("req-1", "page_b")].ext == "png"
