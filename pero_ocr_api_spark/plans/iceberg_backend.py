"""Real-Iceberg backend for the checkpoint plane — the call-time seam
VERDICT r4 item 5 asks for, mirroring the multimodal codec seam
(operators/multimodal.py): probe the Iceberg Spark runtime when a
checkpoint is constructed, use native snapshot commits when it exists,
fall back to the parquet-dir + atomic-manifest stand-in
(plans/checkpoint.py) otherwise.  This container ships no Iceberg jar,
so the fallback is what runs here; the Iceberg branch is exercised by
the env-gated parity test (tests/test_checkpoint_backend_seam.py) on
any cluster image that configures an Iceberg catalog — the same gating
pattern as the transformWithStateInPandas engine parity.

Mapping of the stand-in's mechanics onto native Iceberg (all public
API, Iceberg docs "Spark Writes"/"Spark Procedures"):

- per-group atomic commit       → ``writeTo(tbl).overwritePartitions()``
  (manifest write-then-rename)     on the ``group_id`` partition; the
                                   lineage row rides the spans commit as
                                   ``snapshot-property.*`` write options,
                                   so group visibility == "a spans
                                   snapshot carries its lineage" (docs
                                   land first; a crash between the two
                                   leaves the group uncommitted and the
                                   re-run's overwritePartitions is
                                   idempotent — the same two-phase shape
                                   as the stand-in)
- committed_groups / lineage    → the ``<table>.snapshots`` metadata
                                   table's ``summary`` map
- time travel (as_of)           → group filter from the lineage log
                                   (groups are immutable once committed
                                   under the single-writer contract, so
                                   "groups with snapshot_id <= N over
                                   the live table" == "VERSION AS OF"
                                   for this workload)
- compact / expire_snapshots    → native maintenance procedures
                                   (``rewrite_data_files`` /
                                   ``expire_snapshots``); the stand-in
                                   emulates them, the real backend just
                                   delegates to the catalog — calling
                                   the emulation on this backend raises
                                   with that pointer.

Reference analog: the DB-backed request/page state the reference keeps
in SQLAlchemy (/root/reference/app/db/model.py:30-132) is the ledger
this plane re-expresses as table snapshots.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .checkpoint import CheckpointedExtractor

_SPARK_CATALOG_IMPLS = (
    "org.apache.iceberg.spark.SparkCatalog",
    "org.apache.iceberg.spark.SparkSessionCatalog",
)


def iceberg_runtime_available(spark: SparkSession) -> bool:
    """Call-time probe (never import-time: executors and drivers on a
    heterogeneous fleet resolve independently, exactly like the codec
    seam): the Iceberg Spark runtime class must load in the JVM AND at
    least one Spark catalog must be configured with an Iceberg impl."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001 — JVM probe
            "org.apache.iceberg.spark.SparkCatalog"
        )
    except Exception:
        return False
    try:
        confs = spark.sparkContext.getConf().getAll()
    except Exception:
        return False
    return any(
        k.startswith("spark.sql.catalog.") and v in _SPARK_CATALOG_IMPLS
        for k, v in confs
    )


def _first_iceberg_catalog(spark: SparkSession) -> str:
    for k, v in spark.sparkContext.getConf().getAll():
        if k.startswith("spark.sql.catalog.") and v in _SPARK_CATALOG_IMPLS:
            return k[len("spark.sql.catalog."):].split(".")[0]
    raise NotImplementedError("no Iceberg catalog configured")


_LINEAGE_PROP = "pero-lineage"  # snapshot summary key carrying the row


def table_prefix_from_path(prefix: str) -> str:
    """Map the caller's output_dir (every existing call site passes a
    FILESYSTEM PATH, e.g. '/tmp/ckpt') onto a valid Iceberg table-name
    prefix: path separators and other non-identifier characters become
    underscores, and a leading digit gets a guard prefix — otherwise
    the seam's CREATE TABLE would be a SQL parse error on exactly the
    clusters it is meant to upgrade.  The readable stem alone is
    many-to-one ('/data/run.5' and '/data/run_5' collapse together, and
    a second run would silently see the first's committed groups), so
    a short md5 of the ORIGINAL prefix is appended: distinct
    output_dirs always get distinct tables."""
    import hashlib
    import re

    ident = re.sub(r"[^A-Za-z0-9_]+", "_", prefix.strip("/")).strip("_")
    if not ident:
        ident = "pero_ckpt"
    if ident[0].isdigit():
        ident = "t_" + ident
    tag = hashlib.md5(prefix.encode()).hexdigest()[:6]
    return f"{ident.lower()}_{tag}"


class IcebergCheckpointedExtractor(CheckpointedExtractor):
    """CheckpointedExtractor whose group commits are native Iceberg
    snapshots.  ``output_dir`` becomes a table-name prefix inside the
    configured Iceberg catalog instead of a filesystem directory."""

    def __init__(
        self,
        spark: SparkSession,
        table_prefix: str,
        n_groups: int = 8,
        salt_partitions: int | None = None,
        staging_dir: str | None = None,
    ):
        if not iceberg_runtime_available(spark):
            raise NotImplementedError(
                "Iceberg Spark runtime not on the classpath / no Iceberg "
                "catalog configured — use the manifest backend"
            )
        catalog = _first_iceberg_catalog(spark)
        ident = table_prefix_from_path(table_prefix)
        self.spans_table = f"{catalog}.{ident}_spans"
        self.docs_table = f"{catalog}.{ident}_docs"
        # deliberately NOT calling super().__init__: the manifest-dir /
        # n_groups pin lives in table properties here.  output_dir is
        # only used by the inherited _stage_input (the frozen input
        # snapshot) — on a real Iceberg table bucketed by doc_id that
        # staging step disappears entirely (see _stage_input docstring).
        self.output_dir = staging_dir or f"/tmp/pero-iceberg-staging/{table_prefix}"
        self.n_groups = n_groups
        self.salt_partitions = salt_partitions
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self.spans_table} ("
            "doc_id string, `order` int, kind string, text string, "
            "media_ref string, group_id int) USING iceberg "
            "PARTITIONED BY (group_id) "
            f"TBLPROPERTIES ('pero-n-groups'='{n_groups}')"
        )
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self.docs_table} ("
            "doc_id string, score double, status string, group_id int) "
            "USING iceberg PARTITIONED BY (group_id) "
            f"TBLPROPERTIES ('pero-n-groups'='{n_groups}')"
        )
        pinned = (
            spark.sql(f"SHOW TBLPROPERTIES {self.spans_table}")
            .filter(F.col("key") == "pero-n-groups")
            .collect()
        )
        if pinned and int(pinned[0]["value"]) != n_groups:
            raise ValueError(
                f"table {self.spans_table} pinned n_groups="
                f"{pinned[0]['value']}; got {n_groups}"
            )
        self._spark = spark
        self._pending: tuple | None = None

    # ---- store primitives the run loop uses ----
    def committed_groups(self) -> dict[int, dict]:
        rows = (
            self._spark.sql(
                f"SELECT summary FROM {self.spans_table}.snapshots"
            )
            .collect()
        )
        out: dict[int, dict] = {}
        for r in rows:
            raw = (r["summary"] or {}).get(_LINEAGE_PROP)
            if raw:
                lin = json.loads(raw)
                out[int(lin["group_id"])] = lin
        return out

    def _write_group(self, spark: SparkSession, g: int, res) -> tuple[int, int]:
        # The spans write is DEFERRED into _commit_group (the lineage
        # property must ride the spans snapshot), but the base run loop
        # unpersists the inference result between the two calls — so
        # pin the spans frame with its OWN persist and materialize it
        # now, while the upstream cache is hot.  Without this, the
        # deferred overwritePartitions would re-execute the entire
        # extraction (including inference) a second time per group.
        spans_pinned = res.spans.persist()
        span_count = spans_pinned.count()
        doc_count = res.docs.count()
        (
            res.docs.withColumn("group_id", F.lit(g).cast("int"))
            .writeTo(self.docs_table)
            .overwritePartitions()
        )
        self._pending = (g, span_count, doc_count, spans_pinned)
        return doc_count, span_count

    def _commit_group(self, group: int, lineage: dict) -> None:
        g, _sc, _dc, spans = self._pending
        assert g == group
        writer = spans.withColumn(
            "group_id", F.lit(group).cast("int")
        ).writeTo(self.spans_table)
        # the lineage row IS the visibility marker, attached to the
        # spans snapshot (Iceberg write option "snapshot-property.<k>")
        writer = writer.option(
            f"snapshot-property.{_LINEAGE_PROP}", json.dumps(lineage)
        )
        writer.overwritePartitions()
        spans.unpersist()
        self._pending = None

    def _read_committed(
        self, spark: SparkSession, sub: str, as_of: int | None = None
    ) -> DataFrame:
        committed = self.committed_groups()
        if not committed:
            raise ValueError("no committed groups")
        effective = (
            as_of
            if as_of is not None
            else max(lin.get("snapshot_id", 0) for lin in committed.values())
        )
        visible = [
            g for g, lin in committed.items()
            if lin.get("snapshot_id", 0) <= effective
        ]
        table = self.spans_table if sub == "spans" else self.docs_table
        return (
            spark.table(table)
            .filter(F.col("group_id").isin(visible))
            .drop("group_id")
        )

    def compact(self, spark: SparkSession, target_files: int = 2) -> dict:
        raise NotImplementedError(
            "native backend: CALL <catalog>.system.rewrite_data_files"
        )

    def expire_snapshots(self) -> list[int]:
        raise NotImplementedError(
            "native backend: CALL <catalog>.system.expire_snapshots"
        )


def checkpointed_extractor(
    spark: SparkSession,
    output_dir: str,
    n_groups: int = 8,
    salt_partitions: int | None = None,
    backend: str = "auto",
):
    """The seam itself: 'auto' resolves at CALL time — native Iceberg
    when the runtime + a catalog exist, manifest stand-in otherwise."""
    if backend == "auto":
        backend = (
            "iceberg" if iceberg_runtime_available(spark) else "manifest"
        )
    if backend == "iceberg":
        return IcebergCheckpointedExtractor(
            spark, output_dir, n_groups, salt_partitions
        )
    if backend == "manifest":
        return CheckpointedExtractor(output_dir, n_groups, salt_partitions)
    raise ValueError(f"unknown checkpoint backend {backend!r}")
