"""Ingestion: the Spark re-expression of the reference's submit path
(E1): ``POST /post_processing_request`` with payload
``{engine: int, images: {name → url|null}}``
(/root/reference/app/main/routes.py:37-57,
 /root/reference/app/main/general.py:25-41,
 /root/reference/docs.swaggerhub:721-733).

The ORM insert-per-page loop becomes one declarative plan:
parse JSON → explode the images map (N1) → initial state CREATED when
the url is null (upload expected later) else WAITING → deterministic
page ids (F8: component-wise sha2, delimiter-ambiguity-free) → append
to the work table.

Upload-completion (S5: multipart image upload rewrites page.url and
flips CREATED→WAITING, /root/reference/app/main/routes.py:88-95,
general.py:223-227) is ``complete_uploads``; uploads the reference
would reject — unknown page 404 (routes.py:74-77), wrong page state
400 (routes.py:78-81), disallowed extension 422 (routes.py:99-103) —
leave the page row UNTOUCHED (so a retry with a valid file still
works) and surface via ``rejected_uploads``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, MapType, StringType, StructField, StructType

from ..constants import STATE_CREATED, STATE_WAITING

REQUEST_SCHEMA = StructType(
    [
        StructField("engine", IntegerType()),
        StructField("images", MapType(StringType(), StringType())),
    ]
)

ALLOWED_IMAGE_EXTENSIONS = ["jpg", "jpeg", "png", "tif", "tiff"]  # config-example.py:8

# extension = chars after the last dot of the path, before any ?query
# or #fragment ('scan.jpg?token=x' → jpg, 'a/v1.2/scan.png' → png)
EXT_RE = r"\.([^./?#]+)(?:[?#].*)?$"


def _page_id(request_col, name_col):
    """Deterministic, delimiter-ambiguity-free id: hash the components
    separately before combining, so ('r:1','p') and ('r','1:p') cannot
    collide the way a plain concat_ws(':') would."""
    return F.sha2(F.concat(F.sha2(request_col, 256), F.sha2(name_col, 256)), 256)


def parse_requests(raw: DataFrame, json_col: str = "payload") -> DataFrame:
    """(request_id, payload json-string) → (request_id, engine_id,
    images, valid).  Malformed JSON, a payload without an images map,
    or a missing/non-numeric engine yields valid=false — the reference
    rejects such submissions with an explicit error (routes.py:37-57:
    missing engine → 422, unparseable body → 400), so they must stay
    visible as rows, not vanish in a null-map explode."""
    parsed = raw.select(
        "request_id", F.from_json(F.col(json_col), REQUEST_SCHEMA).alias("r")
    )
    return parsed.select(
        "request_id",
        F.col("r.engine").alias("engine_id"),
        F.col("r.images").alias("images"),
        (F.col("r.images").isNotNull() & F.col("r.engine").isNotNull()).alias(
            "valid"
        ),
    )


def invalid_requests(requests: DataFrame) -> DataFrame:
    """Submissions the reference would have rejected at the API
    boundary (invalid JSON / missing images map / missing engine)."""
    return requests.filter(~F.col("valid")).select("request_id")


def explode_pages(requests: DataFrame) -> DataFrame:
    """One page row per images-map entry; CREATED iff url is null
    (general.py:33-38); deterministic page_id (guid.py analog)."""
    pages = requests.filter("valid").select(
        "request_id",
        "engine_id",
        F.explode("images").alias("name", "url"),
    )
    ext = F.lower(F.regexp_extract(F.coalesce("url", "name"), EXT_RE, 1))
    return pages.select(
        _page_id(F.col("request_id"), F.col("name")).alias("page_id"),
        "request_id",
        "engine_id",
        "name",
        "url",
        ext.alias("ext"),
        F.when(F.col("url").isNull(), F.lit(STATE_CREATED))
        .when(~ext.isin(ALLOWED_IMAGE_EXTENSIONS), F.lit("INVALID_FILE"))
        .otherwise(F.lit(STATE_WAITING))
        .alias("state"),
    )


def _dedup_uploads(uploads: DataFrame) -> DataFrame:
    """Reference upload is idempotent per page (the file overwrites,
    page.url is rewritten, routes.py:88-95) — collapse client retries
    to one deterministic row per (request_id, name), PREFERRING
    candidates that would pass extension validation: the reference
    processes uploads sequentially, so a valid upload applies even if
    an invalid retry also arrived; a plain max(new_url) would let the
    invalid one shadow it.  Tie-break among equally-valid candidates
    stays max(new_url)."""
    new_ext = F.lower(F.regexp_extract("new_url", EXT_RE, 1))
    preference = F.struct(
        new_ext.isin(ALLOWED_IMAGE_EXTENSIONS).alias("valid"),
        F.col("new_url").alias("url"),
    )
    return uploads.groupBy("request_id", "name").agg(
        F.max_by("new_url", preference).alias("_new_url")
    )


def complete_uploads(pages: DataFrame, uploads: DataFrame) -> DataFrame:
    """Apply (request_id, name, new_url) uploads: rewrite url + ext and
    flip CREATED→WAITING.  An upload the reference would 400 — page not
    in CREATED state (routes.py:80-81) or disallowed extension
    (routes.py:96-102) — changes NOTHING on the page row, so a later
    valid upload still applies."""
    joined = pages.join(_dedup_uploads(uploads), ["request_id", "name"], "left")
    new_ext = F.lower(F.regexp_extract("_new_url", EXT_RE, 1))
    applied = (
        F.col("_new_url").isNotNull()
        & (F.col("state") == STATE_CREATED)
        & new_ext.isin(ALLOWED_IMAGE_EXTENSIONS)
    )
    return joined.select(
        "page_id", "request_id", "engine_id", "name",
        F.when(applied, F.col("_new_url")).otherwise(F.col("url")).alias("url"),
        F.when(applied, new_ext).otherwise(F.col("ext")).alias("ext"),
        F.when(applied, F.lit(STATE_WAITING)).otherwise(F.col("state")).alias("state"),
    )


def rejected_uploads(pages: DataFrame, uploads: DataFrame) -> DataFrame:
    """Uploads the reference rejects: unknown page (404), page not
    CREATED (400), or disallowed extension (422) — the batch analog of
    the error responses (surfaced, never silently dropped)."""
    up = _dedup_uploads(uploads)
    joined = up.join(
        pages.select("request_id", "name", "state"), ["request_id", "name"], "left"
    )
    new_ext = F.lower(F.regexp_extract("_new_url", EXT_RE, 1))
    reason = (
        F.when(F.col("state").isNull(), F.lit("UNKNOWN_PAGE"))
        .when(F.col("state") != STATE_CREATED, F.lit("WRONG_STATE"))
        .when(~new_ext.isin(ALLOWED_IMAGE_EXTENSIONS), F.lit("BAD_EXTENSION"))
    )
    return (
        joined.withColumn("reason", reason)
        .filter(F.col("reason").isNotNull())
        .select("request_id", "name", F.col("_new_url").alias("new_url"), "reason")
    )


def pages_to_documents(pages: DataFrame) -> DataFrame:
    """Ready pages → the interleaved documents shape: each page becomes
    a one-media-span document keyed by page_id (a request is then the
    set of docs sharing request_id — batch analog of the page queue)."""
    ready = pages.filter(F.col("state") == STATE_WAITING)
    span = F.struct(
        F.lit("media").alias("kind"),
        F.lit(None).cast("string").alias("text"),
        F.col("url").alias("media_ref"),
        F.lit(0).cast("int").alias("offset"),
    )
    return ready.select(
        F.col("page_id").alias("doc_id"), F.array(span).alias("spans")
    )
