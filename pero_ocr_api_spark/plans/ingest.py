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
    """(request_id, payload json-string) → (request_id, engine_id, images)."""
    parsed = raw.select(
        "request_id", F.from_json(F.col(json_col), REQUEST_SCHEMA).alias("r")
    )
    return parsed.select(
        "request_id",
        F.col("r.engine").alias("engine_id"),
        F.col("r.images").alias("images"),
    )


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
    CREATED→WAITING (routes.py:88-95)."""
    up = uploads.select(
        "request_id", "name", F.col("new_url").alias("_new_url")
    )
    joined = pages.join(up, ["request_id", "name"], "left")
    became_ready = F.col("_new_url").isNotNull() & (F.col("state") == STATE_CREATED)
    return joined.select(
        "page_id", "request_id", "engine_id", "name",
        F.coalesce("_new_url", "url").alias("url"),
        "ext",
        F.when(became_ready, F.lit(STATE_WAITING)).otherwise(F.col("state")).alias("state"),
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
