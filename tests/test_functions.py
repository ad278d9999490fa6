"""Property checks for the training-data ops (oracle parity is covered
in test_oracle_parity; these assert semantic invariants)."""

from pyspark.sql import functions as F

from pero_ocr_api_spark.functions.dedup import minhash_pairs, shingles_df
from pero_ocr_api_spark.functions.similarity import (
    N_QUERIES, TOP_K, ann_topk_lsh, q_bruteforce_topk, q_lsh_signature,
)
from pero_ocr_api_spark.operators.multimodal import (
    decode_images, resize_images, sample_frames, synth_media_bytes,
)
from pero_ocr_api_spark.synth import exploded_spans


def test_jaccard_bounds(spark, sf_smoke):
    pairs = minhash_pairs(spark, sf_smoke, threshold=0.0).collect()
    for r in pairs:
        assert 0.0 <= r.jaccard <= 1.0
        assert r.doc_a < r.doc_b


def test_shingles_shape(spark, sf_smoke):
    sh = shingles_df(spark, sf_smoke)
    row = sh.first()
    assert len(row.sh.split(" ")) == 3


def test_bruteforce_topk_shape(spark, sf_smoke):
    got = q_bruteforce_topk(spark, sf_smoke).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.q_id, []).append(r)
    assert set(by_q) == set(range(N_QUERIES))
    for q, rows in by_q.items():
        assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == list(
            range(1, TOP_K + 1)
        )
        cosines = [r.cosine for r in sorted(rows, key=lambda r: r.rank)]
        assert cosines == sorted(cosines, reverse=True)
        assert all(r.n_id != q for r in rows)


def test_ann_lsh_subset_of_bucket(spark, sf_smoke):
    sigs = {r.vec_id: r.signature for r in q_lsh_signature(spark, sf_smoke).collect()}
    ann = ann_topk_lsh(spark, sf_smoke).collect()
    for r in ann:
        assert sigs[r.n_id] == sigs[r.q_id]  # candidates from own bucket only


def test_multimodal_plumbing(spark, sf_smoke):
    refs = (
        exploded_spans(spark, sf_smoke)
        .filter(F.col("kind") == "media")
        .select("media_ref")
        .distinct()
        .limit(50)
    )
    media = synth_media_bytes(refs)
    assert media.schema["payload"].dataType.typeName() == "binary"
    decoded = decode_images(media)
    rows = decoded.collect()
    assert all(r.ok and r.channels == 3 for r in rows)
    assert all(r.width * r.height <= 5_000_000 for r in rows)

    resized = resize_images(media, target_long_edge=128).collect()
    for r in resized:
        assert max(r.out_width, r.out_height) <= 128
        assert 0 < r.scale <= 1.0

    frames = sample_frames(media).collect()
    assert len(frames) >= 50  # at least one frame per ref
    assert all(len(r.frame_key) == 12 for r in frames)

    # determinism: same refs → same decode output
    again = decode_images(synth_media_bytes(refs)).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
