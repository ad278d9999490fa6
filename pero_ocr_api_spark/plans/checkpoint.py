"""Snapshot-checkpointed extraction runs — the sandbox realization of
Iceberg snapshot commits (north_rule: resumable from checkpoint at
partition granularity with per-partition lineage + metrics).

Reference analog: the page state machine is the reference's implicit
checkpoint (/root/reference/app/db/model.py:13-22 states; re-queue of
timed-out work /root/reference/app/__init__.py:71-119; idempotent
download-skip /root/reference/user_scripts/retrieve_ocr_results.py:62-64).

Mechanics:
- documents are hash-bucketed into ``n_groups`` partition-groups
  (pmod(xxhash64(doc_id), n_groups)) — the commit granularity;
- each group's results land under ``spans/group=G/`` + ``docs/group=G/``
  (dynamic overwrite per group = idempotent re-run);
- a group becomes VISIBLE only when its manifest file
  ``_manifest/group-G.json`` is atomically renamed into place with its
  lineage row (doc/span counts, wall_ms, metrics) — write-then-rename
  gives the atomic results+lineage commit of an Iceberg snapshot;
- resume = skip committed groups (the left-anti of work vs manifest);
  a killed job re-runs only the uncommitted remainder and the final
  table is byte-identical to an uninterrupted run (tests prove it).

On a real cluster the same code commits to an Iceberg catalog
(writeTo(...).append() inside a snapshot) — only _commit_group changes.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pipeline import extract


class SimulatedFailure(RuntimeError):
    """Raised by run(fail_after=...) to model a mid-job crash in tests."""


def _fingerprint(documents: DataFrame, cols: list[str] | None = None) -> tuple[int, int]:
    """(row count, order-insensitive xor of per-row hashes) — identity
    check between a live source and the frozen snapshot.  The hash
    covers EVERY column (xxhash64 handles arrays/structs), not just
    doc_id: a source whose *content* changed under identical doc_ids
    must be refused too, or resume would silently process the stale
    snapshot.  bit_xor rather than sum: commutative AND overflow-free
    under ANSI."""
    cols = cols if cols is not None else documents.columns
    col_list = ", ".join(f"`{c}`" for c in cols)
    row = documents.agg(
        F.count("*").alias("n"),
        F.expr(f"bit_xor(xxhash64({col_list}))").alias("h"),
    ).first()
    return (row["n"], row["h"])


class CheckpointedExtractor:
    def __init__(self, output_dir: str, n_groups: int = 8, salt_partitions: int | None = None):
        self.output_dir = output_dir
        self.n_groups = n_groups
        self.salt_partitions = salt_partitions
        self.manifest_dir = os.path.join(output_dir, "_manifest")
        os.makedirs(self.manifest_dir, exist_ok=True)
        # n_groups is part of the on-disk layout (hash-bucket width):
        # resuming with a different value would silently skip or
        # empty-commit groups, so the first run pins it and every later
        # construction must match.
        meta_path = os.path.join(self.manifest_dir, "_meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                committed_n = json.load(f)["n_groups"]
            if committed_n != n_groups:
                raise ValueError(
                    f"checkpoint at {output_dir} was created with "
                    f"n_groups={committed_n}; got {n_groups} — resuming "
                    "with a different bucket width would lose groups"
                )
        else:
            # No pin yet.  If manifests already exist (a checkpoint
            # from before the _meta.json pin), the constructor argument
            # must NOT silently become the pin — a wrong value would be
            # backfilled as truth.  Derive the width from the lineage
            # rows (recorded per-commit since round 2) or refuse.
            legacy = self._legacy_manifest_n_groups()
            if legacy is not None:
                if legacy != n_groups:
                    raise ValueError(
                        f"checkpoint at {output_dir} has committed "
                        f"manifests recording n_groups={legacy}; got "
                        f"{n_groups}"
                    )
            elif any(
                f.startswith("group-") and f.endswith(".json")
                for f in os.listdir(self.manifest_dir)
            ):
                raise ValueError(
                    f"checkpoint at {output_dir} has committed manifests "
                    "but no recorded n_groups (pre-pin layout) — cannot "
                    "verify the bucket width; start a fresh output_dir"
                )
            tmp = meta_path + f".tmp-{uuid.uuid4().hex}"
            with open(tmp, "w") as f:
                json.dump({"n_groups": n_groups}, f)
            os.replace(tmp, meta_path)

    def _legacy_manifest_n_groups(self) -> int | None:
        """The n_groups recorded in committed lineage rows, if any
        manifest carries one (single consistent value required)."""
        seen = set()
        for fname in os.listdir(self.manifest_dir):
            if fname.startswith("group-") and fname.endswith(".json"):
                with open(os.path.join(self.manifest_dir, fname)) as f:
                    lin = json.load(f)
                if "n_groups" in lin:
                    seen.add(lin["n_groups"])
        if len(seen) > 1:
            raise ValueError(
                f"manifests disagree on n_groups: {sorted(seen)}"
            )
        return seen.pop() if seen else None

    # ---- manifest (snapshot log) ----
    def _manifest_path(self, group: int) -> str:
        return os.path.join(self.manifest_dir, f"group-{group}.json")

    def committed_groups(self) -> dict[int, dict]:
        out = {}
        for g in range(self.n_groups):
            p = self._manifest_path(g)
            if os.path.exists(p):
                with open(p) as f:
                    out[g] = json.load(f)
        return out

    def _commit_group(self, group: int, lineage: dict) -> None:
        tmp = self._manifest_path(group) + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(lineage, f)
        os.replace(tmp, self._manifest_path(group))  # atomic snapshot commit

    def _write_group(self, spark: SparkSession, g: int, res) -> tuple[int, int]:
        """Land one group's spans/docs (NOT yet visible — visibility is
        the manifest commit); returns (doc_count, span_count) read back
        from the landed files.  The Iceberg backend overrides this with
        writeTo().overwritePartitions() (plans/iceberg_backend.py)."""
        spans_path = os.path.join(self.output_dir, "spans", f"group={g}")
        docs_path = os.path.join(self.output_dir, "docs", f"group={g}")
        res.spans.write.mode("overwrite").parquet(spans_path)
        res.docs.write.mode("overwrite").parquet(docs_path)
        span_count = spark.read.parquet(spans_path).count()
        doc_count = spark.read.parquet(docs_path).count()
        return doc_count, span_count

    # ---- run / resume ----
    def _grouped(self, documents: DataFrame) -> DataFrame:
        return documents.withColumn(
            "group_id", F.pmod(F.xxhash64("doc_id"), F.lit(self.n_groups)).cast("int")
        )

    def _stage_input(self, spark: SparkSession, documents: DataFrame) -> DataFrame:
        """Write the grouped input ONCE, partitioned by group_id, so each
        group iteration reads only its own partition (partition pruning)
        instead of rescanning + rehashing the whole source per group
        (n_groups × full-scan → 1 write + n_groups pruned reads).  Also
        freezes the input snapshot: a resume after crash processes the
        same rows even if the source moved.  On a real Iceberg table
        bucketed by doc_id this staging step disappears — the layout
        already is the grouping."""
        staged = os.path.join(self.output_dir, "_staged")
        if not os.path.exists(os.path.join(staged, "_SUCCESS")):
            self._grouped(documents).write.mode("overwrite").partitionBy(
                "group_id"
            ).parquet(staged)
            return spark.read.parquet(staged)
        # Resuming over an existing snapshot: refuse if the caller's
        # documents differ from what was frozen — silently processing
        # the stale snapshot is the same divergence class the n_groups
        # pin guards against.  A changed source needs a fresh
        # output_dir.  (Two cheap single-agg scans, resume-only.)
        frozen = spark.read.parquet(staged)
        # same column LIST and ORDER on both sides (frozen carries the
        # extra group_id partition column; xxhash64 is order-sensitive)
        fp_new = _fingerprint(documents, documents.columns)
        fp_old = _fingerprint(frozen, documents.columns)
        if fp_new != fp_old:
            raise ValueError(
                f"checkpoint at {self.output_dir} froze an input snapshot "
                f"of {fp_old[0]} docs (doc_id xor {fp_old[1]}); the "
                f"documents passed now fingerprint as {fp_new[0]} docs "
                f"(xor {fp_new[1]}) — resuming would silently process "
                "stale data; use a fresh output_dir for a changed source"
            )
        return frozen

    def run(
        self,
        spark: SparkSession,
        documents: DataFrame,
        run_id: str | None = None,
        fail_after: int | None = None,
    ) -> dict:
        """Process all uncommitted groups; returns the manifest.  If
        ``fail_after`` is set, raises SimulatedFailure after that many
        fresh commits (kill/resume testing)."""
        run_id = run_id or uuid.uuid4().hex[:12]
        grouped = self._stage_input(spark, documents)
        done = self.committed_groups()
        # snapshot_id is a per-commit sequence number (Iceberg snapshot
        # lineage): time travel reads "the table as of snapshot N".
        # Single-writer is the checkpoint contract, so resuming
        # continues the sequence.
        snapshot = max(
            (lin.get("snapshot_id", 0) for lin in done.values()), default=0
        )
        fresh = 0
        for g in range(self.n_groups):
            if g in done:
                continue
            t0 = time.monotonic()
            sub = grouped.filter(F.col("group_id") == g).drop("group_id")
            res = extract(
                spark, sub,
                salt_partitions=self.salt_partitions,
                persist_inference=True,
            )
            doc_count, span_count = self._write_group(spark, g, res)
            res.unpersist()
            snapshot += 1
            lineage = {
                "run_id": run_id,
                "n_groups": self.n_groups,  # makes the pin derivable
                "snapshot_id": snapshot,
                "group_id": g,
                "doc_count": doc_count,
                "span_count": span_count,
                "wall_ms": int((time.monotonic() - t0) * 1000),
                "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                "metrics": res.metrics.as_dict(),
            }
            self._commit_group(g, lineage)
            fresh += 1
            if fail_after is not None and fresh >= fail_after:
                raise SimulatedFailure(
                    f"injected failure after {fresh} group commits"
                )
        return self.committed_groups()

    # ---- reads (only committed groups are visible) ----
    def _read_committed(
        self, spark: SparkSession, sub: str, as_of: int | None = None
    ) -> DataFrame:
        """Union of committed group partitions; ``as_of`` is Iceberg
        time travel — only groups committed at snapshot_id <= as_of are
        visible (pre-snapshot manifests count as snapshot 0, i.e.
        always visible).  If a compaction manifest covers part of the
        requested horizon, the compacted rewrite is read INSTEAD of the
        per-group files it covers (Iceberg: a rewrite-data-files
        snapshot replaces the small files in every later read); groups
        committed after the compaction point are unioned on top."""
        committed = self.committed_groups()
        effective = (
            as_of
            if as_of is not None
            else max(
                (lin.get("snapshot_id", 0) for lin in committed.values()),
                default=0,
            )
        )
        comp = self._best_compaction(effective)
        floor = comp["covers_up_to"] if comp else -1
        groups = sorted(
            g for g, lin in committed.items()
            if floor < lin.get("snapshot_id", 0) <= effective
        )
        paths = []
        if comp:
            paths.append(os.path.join(self.output_dir, comp["paths"][sub]))
        for g in groups:
            p = os.path.join(self.output_dir, sub, f"group={g}")
            if not os.path.exists(p):
                raise ValueError(
                    f"snapshot {effective} needs group {g} whose files "
                    "were expired by a later compaction — history below "
                    "the expiry horizon is gone (expire_snapshots)"
                )
            paths.append(p)
        if not paths:
            raise ValueError("no committed groups")
        return spark.read.parquet(*paths)

    # ---- compaction (rewrite-data-files) + snapshot expiry ----
    def _compaction_manifests(self) -> list[dict]:
        out = []
        for fname in sorted(os.listdir(self.manifest_dir)):
            if fname.startswith("compaction-") and fname.endswith(".json"):
                with open(os.path.join(self.manifest_dir, fname)) as f:
                    out.append(json.load(f))
        return sorted(out, key=lambda c: c["covers_up_to"])

    def _best_compaction(self, effective: int) -> dict | None:
        """The newest compaction whose coverage fits inside the
        requested snapshot horizon (a compaction covering snapshots the
        reader must not see cannot be used for that read)."""
        fit = [
            c for c in self._compaction_manifests()
            if c["covers_up_to"] <= effective
        ]
        return fit[-1] if fit else None

    def compact(self, spark: SparkSession, target_files: int = 2) -> dict:
        """Rewrite every committed group's spans/docs into
        ``target_files`` files each — the Iceberg rewrite-data-files
        action.  At 10^12-doc scale the per-group commit layout
        accumulates one file set per group per run; readers pay the
        small-file tax (open cost, no row-group locality) forever
        unless the table is periodically compacted.  The rewrite is
        atomic: data lands first, the compaction manifest second
        (os.replace), so a reader either sees the old group files or
        the complete rewrite, never half.  Time travel BELOW the
        compaction point keeps reading the original group files until
        `expire_snapshots` reclaims them."""
        committed = self.committed_groups()
        if not committed:
            raise ValueError("nothing committed to compact")
        covers = max(lin.get("snapshot_id", 0) for lin in committed.values())
        for c in self._compaction_manifests():
            if c["covers_up_to"] == covers:
                return c  # already compacted at this snapshot
        manifest = {
            "covers_up_to": covers,
            "target_files": target_files,
            "created_at": time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
            ),
            "paths": {
                "spans": os.path.join("spans_compact", f"snap={covers}"),
                "docs": os.path.join("docs_compact", f"snap={covers}"),
            },
        }
        for sub in ("spans", "docs"):
            df = self._read_committed(spark, sub)
            df.repartition(target_files).write.mode("overwrite").parquet(
                os.path.join(self.output_dir, manifest["paths"][sub])
            )
        mpath = os.path.join(self.manifest_dir, f"compaction-{covers}.json")
        tmp = mpath + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, mpath)
        return manifest

    def expire_snapshots(self) -> list[int]:
        """Delete the original per-group files superseded by the newest
        compaction (Iceberg expire_snapshots): reclaims the small files
        and REMOVES time-travel capability below the compaction point —
        reads with as_of under the horizon raise.  Lineage manifests are
        kept (history metadata survives; only data files go)."""
        comps = self._compaction_manifests()
        if not comps:
            raise ValueError("no compaction to expire against")
        horizon = comps[-1]["covers_up_to"]
        expired = []
        for g, lin in self.committed_groups().items():
            if lin.get("snapshot_id", 0) <= horizon:
                for sub in ("spans", "docs"):
                    p = os.path.join(self.output_dir, sub, f"group={g}")
                    if os.path.exists(p):
                        shutil.rmtree(p)
                        expired.append(g)
        return sorted(set(expired))

    def read_spans(self, spark: SparkSession, as_of: int | None = None) -> DataFrame:
        return self._read_committed(spark, "spans", as_of)

    def read_docs(self, spark: SparkSession, as_of: int | None = None) -> DataFrame:
        return self._read_committed(spark, "docs", as_of)

    _LINEAGE_SCHEMA = (
        "run_id string, n_groups long, snapshot_id long, group_id int, "
        "doc_count long, span_count long, wall_ms long, committed_at string"
    )

    def lineage_df(self, spark: SparkSession) -> DataFrame:
        # Normalize every manifest row to the SAME field set: manifests
        # written before the n_groups pin lack that key, and a mixed
        # old/new checkpoint would otherwise hand createDataFrame dicts
        # with inconsistent keys (schema-merge-dependent behavior).
        keys = [f.split()[0] for f in self._LINEAGE_SCHEMA.split(", ")]
        rows = [
            {k: lin.get(k, self.n_groups if k == "n_groups" else None)
             for k in keys}
            for lin in self.committed_groups().values()
        ]
        return spark.createDataFrame(rows, self._LINEAGE_SCHEMA)

    def remaining_docs(self, spark: SparkSession, documents: DataFrame) -> DataFrame:
        """Doc-level resume view: documents not yet in any committed
        group — the left-anti of input vs extracted output."""
        try:
            done = self.read_docs(spark).select("doc_id")
        except ValueError:
            return documents
        return documents.join(done, "doc_id", "left_anti")
