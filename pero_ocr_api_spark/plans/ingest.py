"""Ingestion: the Spark re-expression of the reference's submit path
(E1): ``POST /post_processing_request`` with payload
``{engine: int, images: {name → url|null}}``
(/root/reference/app/main/routes.py:37-57,
 /root/reference/app/main/general.py:25-41,
 /root/reference/docs.swaggerhub:721-733).

The ORM insert-per-page loop becomes one declarative plan:
parse JSON → explode the images map (N1) → initial state CREATED when
the url is null (upload expected later) else WAITING → deterministic
page ids (F8: sha2 of request+name, no RNG) → append to the work table.

Upload-completion (S5: multipart image upload rewrites page.url and
flips CREATED→WAITING, /root/reference/app/main/routes.py:88-95,
general.py:223-227) is ``complete_uploads``.
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


def parse_requests(raw: DataFrame, json_col: str = "payload") -> DataFrame:
    """(request_id, payload json-string) → (request_id, engine_id,
    images, valid).  Malformed JSON or a payload without an images map
    yields valid=false — the reference rejects such submissions with an
    explicit error (routes.py:37-57), so they must stay visible as
    rows, not vanish in a null-map explode."""
    parsed = raw.select(
        "request_id", F.from_json(F.col(json_col), REQUEST_SCHEMA).alias("r")
    )
    return parsed.select(
        "request_id",
        F.col("r.engine").alias("engine_id"),
        F.col("r.images").alias("images"),
        F.col("r.images").isNotNull().alias("valid"),
    )


def invalid_requests(requests: DataFrame) -> DataFrame:
    """Submissions the reference would have rejected at the API
    boundary (invalid JSON / missing images map)."""
    return requests.filter(~F.col("valid")).select("request_id")


def explode_pages(requests: DataFrame) -> DataFrame:
    """One page row per images-map entry; CREATED iff url is null
    (general.py:33-38); deterministic page_id (guid.py analog)."""
    pages = requests.select(
        "request_id",
        "engine_id",
        F.explode("images").alias("name", "url"),
    )
    ext = F.lower(F.regexp_extract(F.coalesce("url", "name"), r"\.([^.]+)$", 1))
    return pages.select(
        F.sha2(F.concat_ws(":", "request_id", "name"), 256).alias("page_id"),
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


def complete_uploads(pages: DataFrame, uploads: DataFrame) -> DataFrame:
    """Apply (request_id, name, new_url) uploads: rewrite url, flip
    CREATED→WAITING — but an upload with a disallowed extension goes to
    INVALID_FILE instead, exactly like the submit path (the reference
    checks ALLOWED_EXTENSIONS on the uploaded filename, routes.py:89-90).
    The ext column is recomputed from the post-upload url."""
    up = uploads.select(
        "request_id", "name", F.col("new_url").alias("_new_url")
    )
    joined = pages.join(up, ["request_id", "name"], "left")
    new_url = F.coalesce("_new_url", "url")
    new_ext = F.lower(F.regexp_extract(F.coalesce(new_url, F.col("name")), r"\.([^.]+)$", 1))
    applied = F.col("_new_url").isNotNull() & (F.col("state") == STATE_CREATED)
    return joined.select(
        "page_id", "request_id", "engine_id", "name",
        new_url.alias("url"),
        new_ext.alias("ext"),
        F.when(
            applied & ~new_ext.isin(ALLOWED_IMAGE_EXTENSIONS),
            F.lit("INVALID_FILE"),
        )
        .when(applied, F.lit(STATE_WAITING))
        .otherwise(F.col("state"))
        .alias("state"),
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
