"""Lifecycle tests (SURVEY §5.3): kill-and-resume produces a final table
identical to an uninterrupted run, with no duplicate lineage and no
partially-visible (uncommitted) results."""

import pytest

from pero_ocr_api_spark.plans.checkpoint import CheckpointedExtractor, SimulatedFailure
from pero_ocr_api_spark.synth import interleaved_documents


@pytest.fixture(scope="module")
def docs(spark, sf_smoke):
    return interleaved_documents(spark, sf_smoke)


def _collect_sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_kill_and_resume_identical(spark, docs, tmp_path_factory):
    base = tmp_path_factory.mktemp("ckpt")

    # uninterrupted reference run
    full = CheckpointedExtractor(str(base / "full"), n_groups=4)
    full.run(spark, docs, run_id="full")
    expected_spans = _collect_sorted(full.read_spans(spark))
    expected_docs = _collect_sorted(full.read_docs(spark))

    # killed after 2 of 4 group commits
    half = CheckpointedExtractor(str(base / "half"), n_groups=4)
    with pytest.raises(SimulatedFailure):
        half.run(spark, docs, run_id="try1", fail_after=2)
    committed = half.committed_groups()
    assert len(committed) == 2

    # only committed groups are visible mid-crash
    partial = _collect_sorted(half.read_spans(spark))
    assert 0 < len(partial) < len(expected_spans)

    # resume completes the remainder; final state identical
    half.run(spark, docs, run_id="try2")
    assert len(half.committed_groups()) == 4
    assert _collect_sorted(half.read_spans(spark)) == expected_spans
    assert _collect_sorted(half.read_docs(spark)) == expected_docs

    # lineage: one row per group, no duplicates, counts add up
    lineage = half.lineage_df(spark).collect()
    assert sorted(r.group_id for r in lineage) == [0, 1, 2, 3]
    assert sum(r.span_count for r in lineage) == len(expected_spans)
    assert sum(r.doc_count for r in lineage) == len(expected_docs)
    # resumed groups carry the resume run_id
    assert {r.run_id for r in lineage} == {"try1", "try2"}


def test_remaining_docs_left_anti(spark, docs, tmp_path_factory):
    base = tmp_path_factory.mktemp("ckpt2")
    ck = CheckpointedExtractor(str(base / "out"), n_groups=4)
    total = docs.count()
    assert ck.remaining_docs(spark, docs).count() == total
    with pytest.raises(SimulatedFailure):
        ck.run(spark, docs, fail_after=2)
    remaining = ck.remaining_docs(spark, docs).count()
    done = ck.read_docs(spark).count()
    assert remaining + done == total
    ck.run(spark, docs)
    assert ck.remaining_docs(spark, docs).count() == 0


def test_n_groups_mismatch_refused(spark, sf_smoke, tmp_path_factory):
    """Resuming a checkpoint with a different hash-bucket width would
    silently skip groups — the constructor must refuse."""
    import pytest as _pytest

    from pero_ocr_api_spark.plans.checkpoint import CheckpointedExtractor
    from pero_ocr_api_spark.synth import interleaved_documents

    out = str(tmp_path_factory.mktemp("ckmeta"))
    docs = interleaved_documents(spark, sf_smoke).orderBy("doc_id").limit(20)
    CheckpointedExtractor(out, n_groups=4).run(spark, docs)
    with _pytest.raises(ValueError, match="n_groups=4"):
        CheckpointedExtractor(out, n_groups=8)
    # same width re-opens fine and is a no-op resume
    m = CheckpointedExtractor(out, n_groups=4).run(spark, docs)
    assert len(m) == 4


def test_changed_input_on_resume_refused(spark, sf_smoke, tmp_path_factory):
    """ADVICE r1: resuming a partially-committed checkpoint with a
    different documents DataFrame must refuse, not silently process
    the frozen stale snapshot."""
    from pero_ocr_api_spark.synth import interleaved_documents

    out = str(tmp_path_factory.mktemp("ckfp"))
    docs = interleaved_documents(spark, sf_smoke).orderBy("doc_id").limit(20)
    ck = CheckpointedExtractor(out, n_groups=4)
    with pytest.raises(SimulatedFailure):
        ck.run(spark, docs, fail_after=1)
    with pytest.raises(ValueError, match="fingerprint"):
        CheckpointedExtractor(out, n_groups=4).run(spark, docs.limit(10))
    # the unchanged source still resumes to completion
    m = CheckpointedExtractor(out, n_groups=4).run(spark, docs)
    assert len(m) == 4


def test_changed_content_on_resume_refused(spark, sf_smoke, tmp_path_factory):
    """ADVICE r2: the fingerprint must cover CONTENT, not just the
    doc_id set — resuming after the source's span text changed under
    identical doc_ids must refuse, not process the stale snapshot."""
    from pyspark.sql import functions as F

    from pero_ocr_api_spark.synth import interleaved_documents

    out = str(tmp_path_factory.mktemp("ckcontent"))
    docs = interleaved_documents(spark, sf_smoke).orderBy("doc_id").limit(20)
    ck = CheckpointedExtractor(out, n_groups=4)
    with pytest.raises(SimulatedFailure):
        ck.run(spark, docs, fail_after=1)
    mutated = docs.withColumn(
        "spans",
        F.expr(
            "transform(spans, s -> named_struct("
            "'kind', s.kind, 'text', upper(s.text), "
            "'media_ref', s.media_ref, 'offset', s.offset))"
        ),
    )
    assert mutated.count() == docs.count()  # same ids, same row count
    with pytest.raises(ValueError, match="fingerprint"):
        CheckpointedExtractor(out, n_groups=4).run(spark, mutated)
    m = CheckpointedExtractor(out, n_groups=4).run(spark, docs)
    assert len(m) == 4


def test_mixed_legacy_lineage_rows_normalized(spark, sf_smoke, tmp_path_factory):
    """ADVICE r2: a checkpoint holding pre-pin manifests (no n_groups
    key) mixed with new ones must still yield a consistent lineage_df —
    missing n_groups is backfilled from the instance pin."""
    import json
    import os

    from pero_ocr_api_spark.synth import interleaved_documents

    out = str(tmp_path_factory.mktemp("ckmixed"))
    docs = interleaved_documents(spark, sf_smoke).orderBy("doc_id").limit(20)
    ck = CheckpointedExtractor(out, n_groups=4)
    ck.run(spark, docs)
    # age one manifest back to the pre-pin shape
    p = os.path.join(out, "_manifest", "group-0.json")
    lin = json.load(open(p))
    lin.pop("n_groups")
    json.dump(lin, open(p, "w"))
    rows = ck.lineage_df(spark).collect()
    assert len(rows) == 4
    assert all(r.n_groups == 4 for r in rows)


def test_prepin_checkpoint_derives_or_refuses(spark, sf_smoke, tmp_path_factory):
    """A checkpoint whose _meta.json is missing but whose manifests
    exist must derive n_groups from the lineage rows (recorded
    per-commit) — and refuse a contradicting constructor value —
    instead of backfilling whatever the caller passed."""
    import json
    import os

    from pero_ocr_api_spark.synth import interleaved_documents

    out = str(tmp_path_factory.mktemp("cklegacy"))
    docs = interleaved_documents(spark, sf_smoke).orderBy("doc_id").limit(20)
    CheckpointedExtractor(out, n_groups=4).run(spark, docs)
    meta = os.path.join(out, "_manifest", "_meta.json")
    os.remove(meta)  # simulate a pre-pin checkpoint
    # wrong width is caught via the lineage-recorded value
    with pytest.raises(ValueError, match="n_groups=4"):
        CheckpointedExtractor(out, n_groups=8)
    # matching width re-pins and resumes
    m = CheckpointedExtractor(out, n_groups=4).run(spark, docs)
    assert len(m) == 4 and os.path.exists(meta)
    # truly legacy (no n_groups in any lineage row): refuse outright
    os.remove(meta)
    for g in range(4):
        p = os.path.join(out, "_manifest", f"group-{g}.json")
        lin = json.load(open(p))
        lin.pop("n_groups")
        json.dump(lin, open(p, "w"))
    with pytest.raises(ValueError, match="pre-pin"):
        CheckpointedExtractor(out, n_groups=4)


def test_snapshot_time_travel(spark, sf_smoke, tmp_path_factory):
    """Iceberg-style time travel: every commit gets a monotonically
    increasing snapshot_id (continuing across resume), and
    read_docs/read_spans(as_of=N) shows exactly the groups committed at
    snapshots <= N — the state a reader at that moment saw."""
    from pero_ocr_api_spark.synth import interleaved_documents

    out = str(tmp_path_factory.mktemp("cktt"))
    docs = interleaved_documents(spark, sf_smoke).orderBy("doc_id").limit(20)
    ck = CheckpointedExtractor(out, n_groups=4)
    with pytest.raises(SimulatedFailure):
        ck.run(spark, docs, run_id="try1", fail_after=2)
    manifest = ck.run(spark, docs, run_id="try2")

    snaps = {g: lin["snapshot_id"] for g, lin in manifest.items()}
    assert sorted(snaps.values()) == [1, 2, 3, 4]  # resume continues
    # as_of the crash point: exactly the first two committed groups
    first_two = {g for g, s in snaps.items() if s <= 2}
    asof = ck.read_docs(spark, as_of=2)
    full = ck.read_docs(spark)
    expect = sum(manifest[g]["doc_count"] for g in first_two)
    assert asof.count() == expect < full.count()
    # spans agree with the docs snapshot
    span_expect = sum(manifest[g]["span_count"] for g in first_two)
    assert ck.read_spans(spark, as_of=2).count() == span_expect
    # as_of beyond head == current table
    assert ck.read_docs(spark, as_of=99).count() == full.count()
    # lineage carries the snapshot column
    rows = ck.lineage_df(spark).collect()
    assert sorted(r.snapshot_id for r in rows) == [1, 2, 3, 4]


def test_lineage_records_n_groups(spark, sf_smoke, tmp_path_factory):
    from pero_ocr_api_spark.synth import interleaved_documents

    out = str(tmp_path_factory.mktemp("cklin"))
    docs = interleaved_documents(spark, sf_smoke).orderBy("doc_id").limit(20)
    ck = CheckpointedExtractor(out, n_groups=4)
    ck.run(spark, docs)
    rows = ck.lineage_df(spark).collect()
    assert len(rows) == 4
    assert all(r.n_groups == 4 for r in rows)


def test_compaction_and_snapshot_expiry(spark, sf_smoke, tmp_path_factory):
    """Iceberg rewrite-data-files semantics: compaction rewrites the
    committed table into few files, reads are value-identical before
    and after, time travel below the compaction point keeps working
    from the original group files until expire_snapshots reclaims them
    (after which sub-horizon reads raise), and groups committed AFTER
    a compaction union on top of the rewrite."""
    import glob
    import os

    from pero_ocr_api_spark.synth import interleaved_documents

    out = str(tmp_path_factory.mktemp("ckcompact"))
    docs = interleaved_documents(spark, sf_smoke).orderBy("doc_id").limit(20)
    ck = CheckpointedExtractor(out, n_groups=4)

    # commit the first two groups, compact, then finish the run: the
    # final table must union the rewrite with the post-compaction groups
    with pytest.raises(SimulatedFailure):
        ck.run(spark, docs, run_id="r1", fail_after=2)
    before = _collect_sorted(ck.read_spans(spark))
    comp = ck.compact(spark, target_files=1)
    assert comp["covers_up_to"] == 2
    assert _collect_sorted(ck.read_spans(spark)) == before

    ck.run(spark, docs, run_id="r2")
    full_spans = _collect_sorted(ck.read_spans(spark))
    full_docs = _collect_sorted(ck.read_docs(spark))
    n_small = len(glob.glob(os.path.join(out, "spans", "group=*", "*.parquet")))

    comp2 = ck.compact(spark, target_files=1)
    assert comp2["covers_up_to"] == 4
    # reads identical through the rewrite
    assert _collect_sorted(ck.read_spans(spark)) == full_spans
    assert _collect_sorted(ck.read_docs(spark)) == full_docs
    # the rewrite actually consolidated files
    n_compact = len(glob.glob(
        os.path.join(out, "spans_compact", "snap=4", "*.parquet")))
    assert n_compact == 1 < n_small
    # time travel below the horizon still works (original files intact)
    asof2 = ck.read_docs(spark, as_of=2).count()
    assert 0 < asof2 < ck.read_docs(spark).count()

    expired = ck.expire_snapshots()
    assert expired  # originals reclaimed
    # current reads still serve from the rewrite
    assert _collect_sorted(ck.read_spans(spark)) == full_spans
    # as_of=2 STILL works: the first compaction (covers_up_to=2) is a
    # complete rewrite of that snapshot and survives expiry
    assert ck.read_docs(spark, as_of=2).count() == asof2
    # but below every rewrite the history is truly gone
    with pytest.raises(ValueError, match="expired"):
        ck.read_docs(spark, as_of=1).count()
    # lineage metadata survives expiry
    assert ck.lineage_df(spark).count() == 4
