"""Admin-plane transforms: API-key suspension sweep and the
download-request validation surface.

- ``suspend_keys`` is the batch analog of the reference's
  ``scripts/suspend_users.py:36-46``: with no allowlist every key is
  un-suspended; with one, keys on the list are un-suspended and every
  other key is suspended.
- ``validate_downloads`` reproduces the ordered rejection taxonomy of
  ``/root/reference/app/main/routes.py:136-166`` (download_results):
  request-missing 404 → wrong-key 401 → page-missing 404 →
  expired 404 → not-processed 404 → bad-format 400 → ok 200, with the
  same precedence, as one declarative multi-join + CASE plan.

Both stay entirely JVM-side (no UDFs).  The auth dimensions
(api_keys, requests) scale with user count, not data volume, so they
broadcast; the downloads fact is never shuffled for validation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import STATE_EXPIRED, STATE_PROCESSED

DOWNLOAD_FORMATS = ["alto", "page", "txt"]  # routes.py:163


def suspend_keys(api_keys: DataFrame, allowlist: list[str] | None) -> DataFrame:
    """Set ``suspension`` per the allowlist semantics of
    suspend_users.py: ``None`` → everyone un-suspended; otherwise only
    listed ``api_string`` values stay active."""
    if allowlist is None:
        return api_keys.withColumn("suspension", F.lit(False))
    return api_keys.withColumn(
        "suspension", ~F.col("api_string").isin(allowlist)
    )


def validate_downloads(
    downloads: DataFrame,
    requests: DataFrame,
    pages: DataFrame,
    api_keys: DataFrame,
) -> DataFrame:
    """Validate a batch of download requests
    (api_string, request_id, page_name, format) and attach
    (http_status, reason) per row, in the reference's precedence order.

    Join shape: downloads ⟕ requests (request existence + owning key)
    ⟕ api_keys (key identity) ⟕ pages (page state).  requests/api_keys
    are broadcast; pages joins on (request_id, page_name) — at scale
    that join is the only shuffle, and it co-partitions with any
    bucketing of the pages table on request_id."""
    req = requests.select(
        F.col("request_id").alias("_req_id"),
        F.col("api_key_id").alias("_req_key_id"),
    )
    keys = api_keys.select(
        F.col("key_id").alias("_key_id"),
        F.col("api_string").alias("_key_string"),
    )
    pg = pages.select(
        F.col("request_id").alias("_pg_req_id"),
        F.col("page_id").alias("_pg_name"),
        F.col("state").alias("_pg_state"),
    )
    joined = (
        downloads.join(
            F.broadcast(req), downloads.request_id == req._req_id, "left"
        )
        .join(F.broadcast(keys), downloads.api_string == keys._key_string, "left")
        .join(
            pg,
            (downloads.request_id == pg._pg_req_id)
            & (downloads.page_name == pg._pg_name),
            "left",
        )
    )
    def _v(code: int, reason: str):
        return F.struct(
            F.lit(code).alias("code"), F.lit(reason).alias("reason")
        )

    # eqNullSafe: an unknown api_string (null _key_id) must 401, not
    # fall through the null-propagating != to the page checks.
    verdict = (
        F.when(F.col("_req_id").isNull(), _v(404, "request_not_found"))
        .when(
            ~F.col("_req_key_id").eqNullSafe(F.col("_key_id")),
            _v(401, "wrong_api_key"),
        )
        .when(F.col("_pg_name").isNull(), _v(404, "page_not_found"))
        .when(F.col("_pg_state") == STATE_EXPIRED, _v(404, "page_expired"))
        .when(
            F.col("_pg_state") != STATE_PROCESSED, _v(404, "page_not_processed")
        )
        .when(~F.col("format").isin(DOWNLOAD_FORMATS), _v(400, "bad_format"))
        .otherwise(_v(200, "ok"))
    )
    return joined.withColumn("_verdict", verdict).select(
        "api_string",
        "request_id",
        "page_name",
        "format",
        F.col("_verdict.code").alias("http_status"),
        F.col("_verdict.reason").alias("reason"),
    )


def add_api_key(api_keys: DataFrame, owner: str, permission: str = "USER") -> DataFrame:
    """Append a new API key — the batch analog of
    ``scripts/add_new_user.py:26-30`` + ``app/db/api_key.py:11-16``.
    The reference derives the key from 256 random bits; a deterministic
    engine derives it from (owner, permission, current key count) via
    the same sha256→base64→strip-padding shape (standard alphabet; the
    reference's random altchars exist only to vary the '+/' glyphs).

    The id/count aggregate runs over the api_keys user dimension —
    rows ∝ users, not data; one tiny agg, no driver collect.

    The digest input is built with column functions (F.concat_ws over
    literals), never interpolated into a SQL string — an owner name
    containing a quote is data, not syntax."""
    digest_input = F.concat_ws(
        ":", F.lit(owner), F.lit(permission), (F.col("_n") + 1).cast("string")
    )
    new_row = api_keys.agg(F.count("*").alias("_n")).select(
        F.concat(F.lit("k"), (F.col("_n") + 1).cast("string")).alias("key_id"),
        F.regexp_replace(
            F.base64(F.unhex(F.sha2(digest_input, 256))), "=+$", ""
        ).alias("api_string"),
        F.lit(owner).alias("owner"),
        F.lit(permission).alias("permission"),
        F.lit(False).alias("suspension"),
    )
    return api_keys.unionByName(new_row)


def add_engine_version(
    engines: DataFrame,
    versions: DataFrame,
    models: DataFrame,
    links: DataFrame,
    *,
    engine_id: int | None = None,
    engine_name: str | None = None,
    engine_description: str | None = None,
    version_name: str,
    new_model_names: list[str],
    version_description: str | None = None,
) -> dict[str, DataFrame]:
    """Catalog maintenance — the batch analog of
    ``scripts/add_new_engine_version.py:79-118``: get-or-create the
    engine, insert one engine_version (name defaults to a date string
    in the reference), insert the new models, and link them through
    the version⋈model bridge.  Returns the four updated dimensions.

    Ids are assigned max+1 (the reference's autoincrement), computed
    with single-row aggregates cross-joined in — all four dims are
    fixed-size catalogs, so every step is broadcast-sized."""
    if engine_id is None:
        new_engine = engines.agg(
            (F.coalesce(F.max("engine_id"), F.lit(0)) + 1).alias("engine_id")
        ).select(
            "engine_id",
            F.lit(engine_name).alias("name"),
            F.lit(engine_description).cast("string").alias("description"),
        )
        engines_out = engines.unionByName(new_engine)
        target_engine = new_engine.select("engine_id")
    else:
        engines_out = engines
        target_engine = engines.filter(
            F.col("engine_id") == engine_id
        ).select("engine_id")

    new_version = (
        versions.agg(
            (F.coalesce(F.max("version_id"), F.lit(0)) + 1).alias("version_id")
        )
        .crossJoin(F.broadcast(target_engine))
        .select(
            "version_id",
            "engine_id",
            F.lit(version_name).alias("version"),
            F.lit(version_description).cast("string").alias("description"),
        )
    )
    versions_out = versions.unionByName(new_version)

    # model ids: max + rank over the (sorted) new names — deterministic
    names = (
        F.posexplode(
            F.array_sort(F.array(*[F.lit(n) for n in new_model_names]))
        )
    )
    new_models = (
        models.agg(
            (F.coalesce(F.max("model_id"), F.lit(0))).alias("_base")
        )
        .select("_base", names.alias("_pos", "name"))
        .select(
            (F.col("_base") + F.col("_pos") + 1).alias("model_id"), "name"
        )
    )
    models_out = models.unionByName(new_models)

    new_links = (
        new_version.select("version_id")
        .crossJoin(F.broadcast(new_models.select("model_id")))
    )
    links_out = links.unionByName(new_links)
    return {
        "engines": engines_out,
        "versions": versions_out,
        "models": models_out,
        "links": links_out,
    }
