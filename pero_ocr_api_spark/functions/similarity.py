"""Similarity search over the embedding column (array<float>, dim 64):

- brute-force cosine top-k (the correctness baseline): broadcast the
  query set, JVM-side dot products via zip_with/aggregate — no Python
  in the scoring loop;
- random-hyperplane LSH bucketing (the scale path): deterministic
  md5-derived hyperplanes, signature = sign-bit string, so at 100 TB
  the candidate set for a query is one bucket (equi-join), not a scan.

Scores are rounded to 6dp in both engines before ranking/compare so
summation-order float noise cannot flip the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import make_registry
from ..session import load_table

REGISTRY, _reg = make_registry()

N_QUERIES = 5     # vec_id < 5 are the query vectors
TOP_K = 5
LSH_PLANES = 8
DIM = 64


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def _with_nonzero_norm(emb: DataFrame) -> DataFrame:
    """Project the L2 norm and exclude degenerate vectors from the
    cosine plane (the quantize op's `scale > 0` guard, applied
    plane-wide): a zero vector has no direction, so its cosine is
    0/0 — undefined semantically and a TASK-KILLING
    SparkArithmeticException under ANSI mode, not a row-level error.
    At corpus scale zero embeddings are routine encoder failures;
    they are excluded here (both engines, see _NZ_EMB_SQL) instead
    of crashing the job.  A NULL embedding or a NULL component also
    NULLs the norm fold and is excluded — the SQL twin spells that
    predicate out because DuckDB's list_sum silently SKIPS NULLs.
    The norm is computed ONCE and kept as the `norm` column the
    scoring stage reuses."""
    return emb.withColumn("norm", _norm(F.col("embedding"))).filter(
        F.col("norm") > F.lit(0.0)
    )


def _sumsq_sql(col: str) -> str:
    """DuckDB sum-of-squares of an embedding column (compact
    list_transform form; > 0 iff the L2 norm is > 0)."""
    return (
        f"list_sum(list_transform(range(1, {DIM} + 1), "
        f"i -> CAST({col}[i] AS DOUBLE) * CAST({col}[i] AS DOUBLE)))"
    )


def _nz_pred_sql(col: str = "embedding") -> str:
    """The SQL twin of _with_nonzero_norm's filter: positive norm AND
    no NULL component (DuckDB's list_sum ignores NULL elements where
    Spark's aggregate fold propagates them — without the explicit
    NULL check the engines would keep different vectors)."""
    return (
        f"({_sumsq_sql(col)} > 0 AND NOT coalesce(list_contains("
        f"list_transform({col}, x -> x IS NULL), true), true))"
    )


# shared CTE: embeddings with degenerate vectors excluded
_NZ_EMB_SQL = f"nz AS (SELECT * FROM embeddings WHERE {_nz_pred_sql()})"


def _cosine_topk(cand, queries, k, on=None):
    """Shared score→rank→filter block: join candidates to (broadcast)
    queries, exact cosine from PRE-COMPUTED norm columns (computing the
    norm once per vector instead of once per pair is ~3x less scoring
    work — the norm expression is identical, so values and rounding are
    unchanged), deterministic rank, top-k.

    cand: (n_id, n_emb, n_norm [, on]); queries: (q_id, q_emb, q_norm
    [, on]).  on=None means cross join (brute force)."""
    j = (
        cand.join(F.broadcast(queries), on)
        if on is not None
        else cand.join(F.broadcast(queries))
    )
    scored = j.filter(F.col("n_id") != F.col("q_id")).select(
        "q_id", "n_id",
        F.round(
            _dot(F.col("q_emb"), F.col("n_emb"))
            / (F.col("q_norm") * F.col("n_norm")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "n_id", "cosine")
    )


def q_bruteforce_topk(spark: SparkSession, sf: str) -> DataFrame:
    emb = _with_nonzero_norm(load_table(spark, sf, "embeddings"))
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    cand = emb.select(
        F.col("vec_id").alias("n_id"), F.col("embedding").alias("n_emb"),
        F.col("norm").alias("n_norm"),
    )
    return _cosine_topk(cand, queries, TOP_K)


SQL_BRUTEFORCE_TOPK = f"""
WITH {_NZ_EMB_SQL},
q AS (
  SELECT vec_id AS q_id, embedding AS q_emb FROM nz WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.q_id, e.vec_id AS n_id,
         round(
           list_sum(list_transform(range(1, {DIM} + 1),
             i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
           / (sqrt(list_sum(list_transform(range(1, {DIM} + 1),
                i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(q.q_emb[i] AS DOUBLE))))
              * sqrt(list_sum(list_transform(range(1, {DIM} + 1),
                i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))),
           6) AS cosine
  FROM nz e CROSS JOIN q
  WHERE e.vec_id <> q.q_id),
ranked AS (
  SELECT q_id, n_id, cosine,
         row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id ASC) AS rank
  FROM scored)
SELECT q_id, rank, n_id, cosine FROM ranked WHERE rank <= {TOP_K}
"""

REGISTRY["td_sim_bruteforce_topk"] = (q_bruteforce_topk, SQL_BRUTEFORCE_TOPK)


# ------------------------------------------------- LSH signature buckets
def _plane_weight(p: int, i: int) -> float:
    """Deterministic pseudo-random weight in [-7.5, 7.5]: the value of
    hex digit i of md5('hp:p:block') minus 7.5.  Engine-portable (md5 +
    ascii only) and zero-mean."""
    # one md5 per (plane, 32-digit block); digit index within the block
    import hashlib

    block = i // 32
    h = hashlib.md5(f"hp:{p}:{block}".encode()).hexdigest()
    c = h[i % 32]
    v = ord(c) - (87 if ord(c) >= 97 else 48)
    return v - 7.5


def _plane_weights(p: int) -> list[float]:
    return [_plane_weight(p, i) for i in range(DIM)]


def _signature_expr():
    """LSH signature as a pure column expression over `embedding` — a
    derived column, never a self-join (attaching it via join would
    rescan + shuffle the corpus at scale for no reason)."""
    sig = None
    for p in range(LSH_PLANES):
        w = F.array(*[F.lit(x) for x in _plane_weights(p)])
        dot = _dot(F.col("embedding"), w)
        bit = F.when(dot > 0, F.lit("1")).otherwise(F.lit("0"))
        sig = bit if sig is None else F.concat(sig, bit)
    return sig


def q_lsh_signature(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings")
    return emb.select("vec_id", _signature_expr().alias("signature"))


def _lsh_sql() -> str:
    sig_parts = []
    for p in range(LSH_PLANES):
        ws = _plane_weights(p)
        terms = " + ".join(
            f"CAST(embedding[{i + 1}] AS DOUBLE) * ({w})" for i, w in enumerate(ws)
        )
        sig_parts.append(f"(CASE WHEN ({terms}) > 0 THEN '1' ELSE '0' END)")
    sig = " || ".join(sig_parts)
    return f"SELECT vec_id, {sig} AS signature FROM embeddings"


REGISTRY["td_sim_lsh_signature"] = (q_lsh_signature, _lsh_sql())


def q_lsh_bucket_counts(spark: SparkSession, sf: str) -> DataFrame:
    return (
        q_lsh_signature(spark, sf)
        .groupBy("signature")
        .agg(F.count("*").alias("n"))
    )


REGISTRY["td_sim_lsh_buckets"] = (
    q_lsh_bucket_counts,
    f"SELECT signature, count(*) AS n FROM ({_lsh_sql()}) t GROUP BY signature",
)


def ann_topk_lsh(spark: SparkSession, sf: str, k: int = TOP_K) -> DataFrame:
    """The scale-path ANN: candidates restricted to the query's LSH
    bucket, then exact cosine within the bucket.  Approximate relative
    to brute force, but fully DETERMINISTIC given the md5-derived
    hyperplanes — so it carries a complete DuckDB oracle (signature →
    bucket equi-join → exact cosine → rank), closing the registry's
    last recall-only entry (VERDICT r3 #3)."""
    e = _with_nonzero_norm(load_table(spark, sf, "embeddings")).withColumn(
        "sig", _signature_expr()
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"), "sig",
    )
    c = e.select(
        F.col("vec_id").alias("n_id"), F.col("embedding").alias("n_emb"),
        F.col("norm").alias("n_norm"), "sig",
    )
    return _cosine_topk(c, q, k, on="sig")


def _ann_lsh_sql() -> str:
    def _l2(col: str) -> str:
        return (
            f"sqrt(list_sum(list_transform(range(1, {DIM} + 1), "
            f"i -> CAST({col}[i] AS DOUBLE) * CAST({col}[i] AS DOUBLE))))"
        )

    dot = (
        f"list_sum(list_transform(range(1, {DIM} + 1), "
        f"i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))"
    )
    return f"""WITH {_NZ_EMB_SQL},
sigs AS ({_lsh_sql()}),
e AS (SELECT s.vec_id, s.signature, m.embedding
      FROM sigs s JOIN nz m ON m.vec_id = s.vec_id),
q AS (SELECT vec_id AS q_id, signature, embedding AS q_emb
      FROM e WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.q_id, c.vec_id AS n_id,
         round({dot} / ({_l2('q.q_emb')} * {_l2('c.embedding')}), 6) AS cosine
  FROM e c JOIN q ON c.signature = q.signature AND c.vec_id <> q.q_id),
ranked AS (
  SELECT q_id, n_id, cosine,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY cosine DESC, n_id ASC) AS rank
  FROM scored)
SELECT q_id, rank, n_id, cosine FROM ranked WHERE rank <= {TOP_K}"""


REGISTRY["td_sim_ann_lsh_topk"] = (ann_topk_lsh, _ann_lsh_sql())



# ---------------------------------------- cross-encoder-style rerank
RERANK_K = 3           # final results per query after rescoring
RERANK_W_COS = 0.8     # first-stage (bi-encoder) score weight
RERANK_W_LEX = 0.2     # pairwise lexical-overlap weight


def rerank_after_ann(spark: SparkSession, sf: str) -> DataFrame:
    """Two-stage retrieval (VERDICT r4 item 8a): LSH-ANN top-k recall →
    feature join onto `documents` → cross-encoder-style pairwise
    rescore → final top-RERANK_K window.  The "cross encoder" stand-in
    is a genuinely PAIRWISE feature a bi-encoder cannot express: token
    Jaccard between the query document's text and the candidate's,
    blended with the first-stage cosine.

    Scale shape — the whole point of a rerank stage: the expensive
    pairwise scorer touches only |Q| x k rows (the ANN output), never
    the corpus.  The candidate list (tiny) BROADCASTS into the
    documents scan, so attaching text costs one pruned scan and zero
    shuffle of the corpus; the rescore window partitions by q_id over
    k rows per query."""
    cands = ann_topk_lsh(spark, sf)  # (q_id, rank, n_id, cosine)
    docs = load_table(spark, sf, "documents").select(
        F.col("doc_id"), F.col("text")
    )
    # NULL text tokenizes as the EMPTY list on both engines: Spark's
    # array_union(NULL, x) is NULL (jacc -> 0.0 via otherwise) where
    # DuckDB's list_concat ignores NULL (jacc -> NULL), which silently
    # reorders the final top-k (fuzz-gate find)
    toks = lambda c: F.array_distinct(
        F.filter(
            F.split(F.coalesce(c, F.lit("")), " "),
            lambda t: t != F.lit(""),
        )
    )
    # broadcast the |Q|xk candidate pairs into BOTH text attachments:
    # the corpus-side table is scanned once per attach, pruned to
    # (doc_id, text), and never shuffled
    paired = (
        docs.join(F.broadcast(cands), docs.doc_id == cands.n_id)
        .select("q_id", "n_id", "cosine", F.col("text").alias("n_text"))
    )
    paired = (
        docs.withColumnRenamed("text", "q_text")
        .join(F.broadcast(paired), docs.doc_id == paired.q_id)
        .select("q_id", "n_id", "cosine", "q_text", "n_text")
    )
    qt, nt = toks(F.col("q_text")), toks(F.col("n_text"))
    inter = F.size(F.array_intersect(qt, nt)).cast("double")
    union = F.size(F.array_union(qt, nt)).cast("double")
    jacc = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    scored = paired.select(
        "q_id", "n_id", "cosine",
        F.round(jacc, 6).alias("lex_overlap"),
        F.round(
            F.lit(RERANK_W_COS) * F.col("cosine") + F.lit(RERANK_W_LEX) * jacc,
            6,
        ).alias("rerank_score"),
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("rerank_score").desc(), F.col("n_id")
    )
    return (
        scored.withColumn("final_rank", F.row_number().over(w))
        .filter(F.col("final_rank") <= RERANK_K)
        .select("q_id", "final_rank", "n_id", "cosine", "lex_overlap",
                "rerank_score")
    )


def _rerank_sql() -> str:
    tok = (
        "list_distinct(list_filter(string_split({c}, ' '), t -> t <> ''))"
    )
    qt = tok.format(c="coalesce(dq.text, '')")
    nt = tok.format(c="coalesce(dn.text, '')")
    return f"""WITH ann AS ({_ann_lsh_sql()}),
paired AS (
  SELECT a.q_id, a.n_id, a.cosine, dq.text AS q_text, dn.text AS n_text,
         CAST(len(list_intersect({qt}, {nt})) AS DOUBLE) AS inter,
         CAST(len(list_distinct(list_concat({qt}, {nt}))) AS DOUBLE) AS un
  FROM ann a
  JOIN documents dq ON dq.doc_id = a.q_id
  JOIN documents dn ON dn.doc_id = a.n_id),
scored AS (
  SELECT q_id, n_id, cosine,
         round(CASE WHEN un > 0 THEN inter / un ELSE 0.0 END, 6)
           AS lex_overlap,
         round({RERANK_W_COS} * cosine
               + {RERANK_W_LEX} * (CASE WHEN un > 0 THEN inter / un
                                        ELSE 0.0 END), 6) AS rerank_score
  FROM paired)
SELECT q_id,
       CAST(row_number() OVER (PARTITION BY q_id
                               ORDER BY rerank_score DESC, n_id)
            AS INTEGER) AS final_rank,
       n_id, cosine, lex_overlap, rerank_score
FROM scored
QUALIFY final_rank <= {RERANK_K}"""


REGISTRY["td_sim_rerank"] = (rerank_after_ann, _rerank_sql())

# ------------------------------------------- embedding-cosine near-dup
NEAR_DUP_THRESHOLD = 0.35  # synthetic gaussian vectors: cos ~ N(0, 1/8)


def q_embedding_near_dup(spark: SparkSession, sf: str) -> DataFrame:
    """Near-duplicate pairs by embedding cosine, blocked by LSH bucket:
    candidates are same-signature pairs only (equi-join, never the
    all-pairs product).  Scale note: LSH_PLANES must grow with corpus
    size (buckets = 2^planes; within-bucket pairing is quadratic), so
    at 10^12 rows this runs with ~40+ planes / multi-band signatures —
    the constant here is sized for the test corpus."""
    e = _with_nonzero_norm(load_table(spark, sf, "embeddings")).withColumn(
        "sig", _signature_expr()
    )
    a = e.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("emb_a"),
        F.col("norm").alias("norm_a"), "sig",
    )
    b = e.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("emb_b"),
        F.col("norm").alias("norm_b"), "sig",
    )
    pairs = a.join(b, "sig").filter(F.col("id_a") < F.col("id_b"))
    cos = F.round(
        _dot(F.col("emb_a"), F.col("emb_b"))
        / (F.col("norm_a") * F.col("norm_b")),
        6,
    )
    return (
        pairs.select("id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= NEAR_DUP_THRESHOLD)
    )


def _near_dup_sql() -> str:
    dot = " + ".join(
        f"CAST(a.embedding[{i}] AS DOUBLE) * CAST(b.embedding[{i}] AS DOUBLE)"
        for i in range(1, DIM + 1)
    )
    na = " + ".join(
        f"CAST(a.embedding[{i}] AS DOUBLE) * CAST(a.embedding[{i}] AS DOUBLE)"
        for i in range(1, DIM + 1)
    )
    nb = " + ".join(
        f"CAST(b.embedding[{i}] AS DOUBLE) * CAST(b.embedding[{i}] AS DOUBLE)"
        for i in range(1, DIM + 1)
    )
    return f"""WITH {_NZ_EMB_SQL},
sigs AS ({_lsh_sql()}),
e AS (SELECT s.vec_id, s.signature, m.embedding
      FROM sigs s JOIN nz m ON m.vec_id = s.vec_id),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round(({dot}) / (sqrt({na}) * sqrt({nb})), 6) AS cosine
  FROM e a JOIN e b ON a.signature = b.signature AND a.vec_id < b.vec_id)
SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= {NEAR_DUP_THRESHOLD}
"""


REGISTRY["td_dedup_embedding_cosine"] = (q_embedding_near_dup, _near_dup_sql())


# --------------------------------------------------- IVF ANN (scale path)
N_CENTROIDS = 8  # deterministic "training": centroids = vec_id < 8


def _assignments(spark: SparkSession, sf: str) -> DataFrame:
    """Assign every vector to its max-cosine centroid (IVF cell).
    Zero-norm vectors (and zero centroids) are unassignable — no
    direction means no nearest-by-cosine cell — and are excluded
    (see _with_nonzero_norm); this covers every _assignments consumer
    (IVF, SemDeDup, IVF-PQ) in one place."""
    emb = _with_nonzero_norm(load_table(spark, sf, "embeddings"))
    cents = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_emb"),
        F.col("norm").alias("c_norm"),
    )
    scored = emb.join(F.broadcast(cents)).select(
        "vec_id", "embedding", "c_id",
        F.round(
            _dot(F.col("embedding"), F.col("c_emb"))
            / (F.col("norm") * F.col("c_norm")),
            6,
        ).alias("cs"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cs").desc(), F.col("c_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", F.col("c_id").alias("cell"))
    )


def q_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF(nprobe=1) top-k: each query searches only its own cell — the
    canonical inverted-file ANN layout (cells = partitions at scale)."""
    assigned = _assignments(spark, sf).withColumn(
        "norm", _norm(F.col("embedding"))
    )
    q = assigned.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"), "cell",
    )
    c = assigned.select(
        F.col("vec_id").alias("n_id"), F.col("embedding").alias("n_emb"),
        F.col("norm").alias("n_norm"), "cell",
    )
    return _cosine_topk(c, q, TOP_K, on="cell")


def _ivf_sql() -> str:
    def dot(x, y):
        return " + ".join(
            f"CAST({x}.embedding[{i}] AS DOUBLE) * CAST({y}.embedding[{i}] AS DOUBLE)"
            for i in range(1, DIM + 1)
        )

    return f"""WITH {_NZ_EMB_SQL},
cents AS (
  SELECT vec_id AS c_id, embedding FROM nz WHERE vec_id < {N_CENTROIDS}),
scored AS (
  SELECT e.vec_id, c.c_id,
         round(({dot('e', 'c')})
               / (sqrt({dot('e', 'e')}) * sqrt({dot('c', 'c')})), 6) AS cs
  FROM nz e CROSS JOIN cents c),
assigned AS (
  SELECT vec_id, c_id AS cell FROM (
    SELECT vec_id, c_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id) AS rn
    FROM scored) t WHERE rn = 1),
e AS (SELECT a.vec_id, a.cell, m.embedding
      FROM assigned a JOIN embeddings m ON m.vec_id = a.vec_id),
qs AS (SELECT vec_id AS q_id, cell, embedding FROM e WHERE vec_id < {N_QUERIES}),
pairs AS (
  SELECT q.q_id, e.vec_id AS n_id,
         round(({dot('e', 'q')})
               / (sqrt({dot('e', 'e')}) * sqrt({dot('q', 'q')})), 6) AS cosine
  FROM e JOIN qs q ON e.cell = q.cell AND e.vec_id <> q.q_id)
SELECT q_id, rank, n_id, cosine FROM (
  SELECT q_id, n_id, cosine,
         row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS rank
  FROM pairs) t WHERE rank <= {TOP_K}
"""


REGISTRY["td_sim_ivf_topk"] = (q_ivf_topk, _ivf_sql())


# --------------------------------------------- int8 symmetric quantization
@_reg(
    "td_emb_quantize",
    """WITH t AS (
  SELECT vec_id,
         embedding,
         list_aggregate(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))),
                        'max') AS scale
  FROM embeddings)
SELECT vec_id,
       round(scale, 6) AS scale,
       array_to_string(
         list_transform(
           embedding,
           x -> CAST(floor(round((CAST(x AS DOUBLE) / scale) * 127.0, 3)
                           + 0.5) AS INT)),
         ',') AS q8
FROM t WHERE scale > 0""",
)
def q_quantize(spark: SparkSession, sf: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column — the 4×
    storage/shuffle reduction step before ANN indexing at corpus scale.
    Per-vector max-abs scale; codes are floor(round(v/scale*127, 3)
    + 0.5): the 3-decimal snap before the floor absorbs engine-level
    ulp differences (the synthetic vectors sit exactly on half-code
    boundaries, where a bare floor(y+0.5) flipped between engines —
    same trap class as the round-before-divide float-avg rule).  The
    code string is the full
    vector, so the hash gate verifies every component of every vector.
    All JVM-side higher-order functions; one narrow projection, no
    shuffle at all."""
    emb = load_table(spark, sf, "embeddings")
    scale = F.array_max(
        F.transform("embedding", lambda x: F.abs(x.cast("double")))
    )
    t = emb.select("vec_id", "embedding", scale.alias("scale")).filter(
        F.col("scale") > 0
    )
    q8 = F.concat_ws(
        ",",
        F.transform(
            "embedding",
            lambda x: F.floor(
                F.round((x.cast("double") / F.col("scale")) * 127.0, 3) + 0.5
            )
            .cast("int")
            .cast("string"),
        ),
    )
    # q8 is materialized BEFORE the select that aliases round(scale, 6)
    # back to the name "scale": Spark 4's lateral-column-alias
    # resolution would otherwise bind the lambda's `scale` to the
    # sibling ROUNDED alias, silently quantizing against the wrong
    # scale (caught by the oracle: one code flipped at a .5005
    # boundary).
    return t.withColumn("q8", q8).select(
        "vec_id", F.round("scale", 6).alias("scale"), "q8"
    )


# ------------------------------------------------ one Lloyd (k-means) step
@_reg(
    "td_sim_kmeans_step",
    f"""WITH cents AS (
  SELECT vec_id AS c_id, embedding AS cvec FROM embeddings
  WHERE vec_id < {{n_cells}}
),
scored AS (
  SELECT e.vec_id, c.c_id,
         list_sum(list_transform(range(1, len(e.embedding) + 1),
           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE)))
           AS cs
  FROM embeddings e CROSS JOIN cents c),
assigned AS (
  SELECT vec_id, c_id AS cell FROM (
    SELECT vec_id, c_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id) AS rn
    FROM scored) t WHERE rn = 1),
comp AS (
  SELECT a.cell, u.i AS idx, CAST(e.embedding[u.i + 1] AS DOUBLE) AS v
  FROM assigned a
  JOIN embeddings e ON e.vec_id = a.vec_id
  CROSS JOIN (SELECT unnest(range(0, {{dim}})) AS i) u)
SELECT cell, idx,
       count(*) AS n_members,
       round(round(sum(v), 4) / count(*), 6) AS centroid
FROM comp GROUP BY cell, idx""".format(n_cells=8, dim=64),
)
def q_kmeans_step(spark: SparkSession, sf: str) -> DataFrame:
    """One Lloyd iteration of k-means over the embedding corpus:
    assign every vector to its max-dot-product seed centroid (the IVF
    assignment shape), then recompute each centroid component as the
    member mean — posexplode to (cell, component) rows, a partial-agg
    combined groupBy, never a per-cell collect.  The float mean uses
    the round(sum,4)/count discipline so summation order can't flip
    the hash.  Iterating this transform IS distributed k-means; one
    verified step pins the recurrence."""
    emb = load_table(spark, sf, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("cvec")
    )
    dot = F.aggregate(
        F.zip_with(
            "embedding", "cvec", lambda x, y: x.cast("double") * y.cast("double")
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cs").desc(), F.col("c_id").asc()
    )
    assigned = (
        emb.crossJoin(F.broadcast(cents))
        .withColumn("cs", dot)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("c_id").alias("cell"), "embedding")
    )
    comp = assigned.select(
        "cell", F.posexplode(F.col("embedding")).alias("idx", "v")
    ).withColumn("v", F.col("v").cast("double"))
    return comp.groupBy("cell", "idx").agg(
        F.count("*").alias("n_members"),
        F.round(F.round(F.sum("v"), 4) / F.count("*"), 6).alias("centroid"),
    )


# ---- product quantization (PQ) encoding ----

PQ_M = 4        # subspaces
PQ_SUB = 16     # dims per subspace (EMB_DIM / PQ_M)
PQ_K = 16       # centroids per subspace codebook


def _pq_sql() -> str:
    return f"""WITH ms AS (SELECT unnest(range({PQ_M})) AS m),
c AS (SELECT vec_id AS cid, embedding AS cemb
      FROM embeddings WHERE vec_id < {PQ_K}),
e_sub AS (SELECT e.vec_id, ms.m,
                 list_slice(e.embedding, ms.m*{PQ_SUB}+1, ms.m*{PQ_SUB}+{PQ_SUB}) AS sub
          FROM embeddings e CROSS JOIN ms),
c_sub AS (SELECT ms.m, c.cid,
                 list_slice(c.cemb, ms.m*{PQ_SUB}+1, ms.m*{PQ_SUB}+{PQ_SUB}) AS csub
          FROM c CROSS JOIN ms),
pairs AS (SELECT vec_id, e_sub.m, cid,
                 list_sum([(CAST(sub[i] AS DOUBLE) - CAST(csub[i] AS DOUBLE))
                           * (CAST(sub[i] AS DOUBLE) - CAST(csub[i] AS DOUBLE))
                           for i in range(1, {PQ_SUB + 1})]) AS dist
          FROM e_sub JOIN c_sub ON e_sub.m = c_sub.m),
best AS (SELECT vec_id, m, min({{'d': dist, 'c': cid}}) AS b
         FROM pairs GROUP BY vec_id, m)
SELECT vec_id,
       array_to_string(list(b.c ORDER BY m), '-') AS codes,
       round(sum(b.d), 6) AS quant_err
FROM best GROUP BY vec_id"""


def q_pq_encode(spark: SparkSession, sf: str) -> DataFrame:
    """Product-quantization encoding: each 64-dim vector becomes
    PQ_M={PQ_M} one-byte codes (nearest of PQ_K={PQ_K} codebook
    centroids per 16-dim subspace, deterministic codebook = the first
    PQ_K vectors by vec_id as seeds), plus the total quantization
    error.  This is the memory layer under IVF-PQ ANN search: 64 floats
    → 4 codes is a 64× compression, and ADC distance against a query
    becomes 4 table lookups.

    Scale shape: the codebook is PQ_M×PQ_K = 64 tiny rows broadcast and
    joined on the subspace id m (an EQUI join with fixed fan-out PQ_K,
    never a full cross product over vectors); argmin is an aggregate of
    min(struct(dist, cid)) — deterministic under ties — and the codes
    re-assemble with one vec_id shuffle.  Distances are computed in
    float64 from the float32 inputs in BOTH engines, so the oracle
    compare is exact."""
    emb = load_table(spark, sf, "embeddings")
    ms = F.array(*[F.lit(m) for m in range(PQ_M)])
    sub = F.slice("embedding", F.col("m") * PQ_SUB + 1, PQ_SUB)
    e_sub = (
        emb.select("vec_id", "embedding", F.explode(ms).alias("m"))
        .select("vec_id", "m", sub.alias("sub"))
    )
    c_sub = (
        emb.filter(F.col("vec_id") < PQ_K)
        .select(
            F.col("vec_id").alias("cid"),
            "embedding",
            F.explode(ms).alias("m"),
        )
        .select("m", "cid", sub.alias("csub"))
    )
    diff2 = F.zip_with(
        "sub",
        "csub",
        lambda a, b: (a.cast("double") - b.cast("double"))
        * (a.cast("double") - b.cast("double")),
    )
    dist = F.aggregate(diff2, F.lit(0.0), lambda acc, v: acc + v)
    best = (
        e_sub.join(F.broadcast(c_sub), "m")
        .select("vec_id", "m", dist.alias("dist"), "cid")
        .groupBy("vec_id", "m")
        .agg(
            F.min(
                F.struct(F.col("dist").alias("d"), F.col("cid").alias("c"))
            ).alias("b")
        )
    )
    codes = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("m").alias("m"), F.col("b.c").alias("c"))
                )
            ),
            lambda s: s["c"].cast("string"),
        ),
        "-",
    )
    return best.groupBy("vec_id").agg(
        codes.alias("codes"),
        F.round(F.sum("b.d"), 6).alias("quant_err"),
    )


REGISTRY["td_sim_pq_encode"] = (q_pq_encode, _pq_sql())


# ---- PQ ADC search (asymmetric distance over the encoded corpus) ----


def _pq_codes(emb: DataFrame):
    """(vec_id, m, code): nearest codebook centroid per subspace — the
    `best` stage of q_pq_encode, shared so search scores exactly the
    codes encode emits."""
    ms = F.array(*[F.lit(m) for m in range(PQ_M)])
    sub = F.slice("embedding", F.col("m") * PQ_SUB + 1, PQ_SUB)
    e_sub = emb.select("vec_id", "embedding", F.explode(ms).alias("m")).select(
        "vec_id", "m", sub.alias("sub")
    )
    c_sub = (
        emb.filter(F.col("vec_id") < PQ_K)
        .select(F.col("vec_id").alias("cid"), "embedding", F.explode(ms).alias("m"))
        .select("m", "cid", sub.alias("csub"))
    )
    diff2 = F.zip_with(
        "sub",
        "csub",
        lambda a, b: (a.cast("double") - b.cast("double"))
        * (a.cast("double") - b.cast("double")),
    )
    dist = F.aggregate(diff2, F.lit(0.0), lambda acc, v: acc + v)
    return (
        e_sub.join(F.broadcast(c_sub), "m")
        .select("vec_id", "m", dist.alias("dist"), "cid")
        .groupBy("vec_id", "m")
        .agg(
            F.min(
                F.struct(F.col("dist").alias("d"), F.col("cid").alias("c"))
            ).alias("b")
        )
        .select("vec_id", "m", F.col("b.c").alias("code"))
    ), c_sub


def _pq_search_sql() -> str:
    def sub_dist(a: str, b: str) -> str:
        return (
            f"""list_sum([(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))
                      * (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))
                      for i in range(1, {PQ_SUB + 1})])"""
        )

    return f"""WITH ms AS (SELECT unnest(range({PQ_M})) AS m),
c AS (SELECT vec_id AS cid, embedding AS cemb
      FROM embeddings WHERE vec_id < {PQ_K}),
e_sub AS (SELECT e.vec_id, ms.m,
                 list_slice(e.embedding, ms.m*{PQ_SUB}+1, ms.m*{PQ_SUB}+{PQ_SUB}) AS sub
          FROM embeddings e CROSS JOIN ms),
c_sub AS (SELECT ms.m, c.cid,
                 list_slice(c.cemb, ms.m*{PQ_SUB}+1, ms.m*{PQ_SUB}+{PQ_SUB}) AS csub
          FROM c CROSS JOIN ms),
pairs AS (SELECT vec_id, e_sub.m, cid,
                 {sub_dist('sub', 'csub')} AS dist
          FROM e_sub JOIN c_sub ON e_sub.m = c_sub.m),
codes AS (SELECT vec_id, m, min({{'d': dist, 'c': cid}}).c AS code
          FROM pairs GROUP BY vec_id, m),
q_sub AS (SELECT vec_id AS q_id, m, sub AS qsub FROM e_sub
          WHERE vec_id < {N_QUERIES}),
dtab AS (SELECT q_id, q_sub.m, cid,
                {sub_dist('qsub', 'csub')} AS d
         FROM q_sub JOIN c_sub ON q_sub.m = c_sub.m),
scored AS (SELECT d.q_id, codes.vec_id AS n_id, round(sum(d.d), 6) AS adist
           FROM codes JOIN dtab d ON d.m = codes.m AND d.cid = codes.code
           WHERE codes.vec_id <> d.q_id
           GROUP BY d.q_id, codes.vec_id),
ranked AS (SELECT q_id, n_id, adist,
                  row_number() OVER (PARTITION BY q_id
                                     ORDER BY adist ASC, n_id ASC) AS rank
           FROM scored)
SELECT q_id, rank, n_id, adist FROM ranked WHERE rank <= {TOP_K}"""


def q_pq_search(spark: SparkSession, sf: str) -> DataFrame:
    """ADC (asymmetric distance computation) top-k over the PQ-encoded
    corpus: the query stays un-quantized; each subspace contributes a
    looked-up distance from a per-query distance table, so the distance
    to candidate x is exactly L2²(query, reconstruct(codes(x))).

    Scale shape: the distance table is queries × PQ_M × PQ_K rows
    (tiny for any realistic query batch) built off the broadcast
    codebook and itself broadcast into the code join — the corpus-side
    work is ONE equi-join on (m, code) against per-vector code rows, a
    (q_id, vec_id) re-aggregation of PQ_M=4 partials, and a per-query
    top-k window.  No full-dimension scoring ever touches the corpus:
    at 100 TB the 64-float vectors stay in cold storage and search runs
    over the 4-byte codes — the IVF-PQ memory story."""
    emb = load_table(spark, sf, "embeddings")
    codes, c_sub = _pq_codes(emb)
    q_sub = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("q_id"),
            "embedding",
            F.explode(F.array(*[F.lit(m) for m in range(PQ_M)])).alias("m"),
        )
        .select(
            "q_id",
            "m",
            F.slice("embedding", F.col("m") * PQ_SUB + 1, PQ_SUB).alias("qsub"),
        )
    )
    diff2 = F.zip_with(
        "qsub",
        "csub",
        lambda a, b: (a.cast("double") - b.cast("double"))
        * (a.cast("double") - b.cast("double")),
    )
    d = F.aggregate(diff2, F.lit(0.0), lambda acc, v: acc + v)
    dtab = q_sub.join(F.broadcast(c_sub), "m").select(
        "q_id", "m", "cid", d.alias("d")
    )
    scored = codes.alias("k").join(
        F.broadcast(dtab).alias("t"),
        (F.col("k.m") == F.col("t.m")) & (F.col("k.code") == F.col("t.cid")),
    )
    agg = (
        scored.filter(F.col("k.vec_id") != F.col("t.q_id"))
        .groupBy(F.col("t.q_id").alias("q_id"), F.col("k.vec_id").alias("n_id"))
        .agg(F.round(F.sum("t.d"), 6).alias("adist"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("adist").asc(), F.col("n_id").asc())
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("q_id", "rank", "n_id", "adist")
    )


REGISTRY["td_sim_pq_search"] = (q_pq_search, _pq_search_sql())


# ------------------------------------------------- SemDeDup (semantic dedup)
SEMANTIC_DUP_THRESHOLD = NEAR_DUP_THRESHOLD  # same synthetic-cosine scale as the LSH near-dup plane


def q_semantic_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): embedding-space deduplication
    blocked by k-means cell — cluster the corpus, then inside each
    cluster drop every vector that has a LOWER-id neighbor with cosine
    >= threshold (one survivor per near-dup neighborhood; downstream
    connected-components in functions/cluster.py restores full
    transitive groups when needed).  Returns every assigned vector
    with its cell and a keep/drop verdict.

    Scale shape: the cell assignment is the IVF broadcast-centroid
    argmin (corpus never shuffles for it), and candidate pairs are
    generated per-cell (equi-join on cell), never all-pairs.
    Within-cell pairing is quadratic in cell size, so k must grow with
    the corpus (cells ~ sqrt(N) keeps buckets bounded) — same contract
    as the LSH near-dup blocker; the constant here is sized for the
    test corpus.  The drop verdict is a broadcast-size DISTINCT of
    dropped ids left-joined back — the corpus relation is touched
    twice, shuffled never."""
    a = _assignments(spark, sf).withColumn("norm", _norm(F.col("embedding")))
    lhs = a.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("emb_a"),
        F.col("norm").alias("norm_a"), "cell",
    )
    rhs = a.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("emb_b"),
        F.col("norm").alias("norm_b"), "cell",
    )
    cos = F.round(
        _dot(F.col("emb_a"), F.col("emb_b"))
        / (F.col("norm_a") * F.col("norm_b")),
        6,
    )
    dropped = (
        lhs.join(rhs, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(F.col("id_b").alias("vec_id"), cos.alias("cosine"))
        .filter(F.col("cosine") >= SEMANTIC_DUP_THRESHOLD)
        .select("vec_id")
        .distinct()
        .withColumn("dup", F.lit(1))
    )
    return a.select("vec_id", "cell").join(dropped, "vec_id", "left").select(
        "vec_id", "cell",
        F.when(F.col("dup").isNull(), 1).otherwise(0).alias("keep"),
    )


def _semantic_dedup_sql() -> str:
    def dot(x, y):
        return " + ".join(
            f"CAST({x}.embedding[{i}] AS DOUBLE) * CAST({y}.embedding[{i}] AS DOUBLE)"
            for i in range(1, DIM + 1)
        )

    return f"""WITH {_NZ_EMB_SQL},
cents AS (
  SELECT vec_id AS c_id, embedding FROM nz WHERE vec_id < {N_CENTROIDS}),
scored AS (
  SELECT e.vec_id, c.c_id,
         round(({dot('e', 'c')})
               / (sqrt({dot('e', 'e')}) * sqrt({dot('c', 'c')})), 6) AS cs
  FROM nz e CROSS JOIN cents c),
assigned AS (
  SELECT vec_id, c_id AS cell FROM (
    SELECT vec_id, c_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id) AS rn
    FROM scored) t WHERE rn = 1),
e AS (SELECT a.vec_id, a.cell, m.embedding
      FROM assigned a JOIN embeddings m ON m.vec_id = a.vec_id),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM e a JOIN e b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE round(({dot('a', 'b')})
              / (sqrt({dot('a', 'a')}) * sqrt({dot('b', 'b')})), 6)
        >= {SEMANTIC_DUP_THRESHOLD})
SELECT e.vec_id, e.cell,
       CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS keep
FROM e LEFT JOIN dropped d ON d.vec_id = e.vec_id"""


REGISTRY["td_dedup_semantic"] = (q_semantic_dedup, _semantic_dedup_sql())


# ---- IVF-PQ search: cell-restricted ADC (the composed FAISS shape) ----


def _ivfpq_sql() -> str:
    def dot(x, y):
        return " + ".join(
            f"CAST({x}.embedding[{i}] AS DOUBLE) * CAST({y}.embedding[{i}] AS DOUBLE)"
            for i in range(1, DIM + 1)
        )

    def sub_dist(a: str, b: str) -> str:
        return (
            f"""list_sum([(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))
                      * (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))
                      for i in range(1, {PQ_SUB + 1})])"""
        )

    return f"""WITH {_NZ_EMB_SQL},
cents AS (
  SELECT vec_id AS c_id, embedding FROM nz WHERE vec_id < {N_CENTROIDS}),
cellscore AS (
  SELECT e.vec_id, c.c_id,
         round(({dot('e', 'c')})
               / (sqrt({dot('e', 'e')}) * sqrt({dot('c', 'c')})), 6) AS cs
  FROM nz e CROSS JOIN cents c),
assigned AS (
  SELECT vec_id, c_id AS cell FROM (
    SELECT vec_id, c_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id) AS rn
    FROM cellscore) t WHERE rn = 1),
ms AS (SELECT unnest(range({PQ_M})) AS m),
c AS (SELECT vec_id AS cid, embedding AS cemb
      FROM embeddings WHERE vec_id < {PQ_K}),
e_sub AS (SELECT e.vec_id, ms.m,
                 list_slice(e.embedding, ms.m*{PQ_SUB}+1, ms.m*{PQ_SUB}+{PQ_SUB}) AS sub
          FROM embeddings e CROSS JOIN ms),
c_sub AS (SELECT ms.m, c.cid,
                 list_slice(c.cemb, ms.m*{PQ_SUB}+1, ms.m*{PQ_SUB}+{PQ_SUB}) AS csub
          FROM c CROSS JOIN ms),
pairs AS (SELECT vec_id, e_sub.m, cid,
                 {sub_dist('sub', 'csub')} AS dist
          FROM e_sub JOIN c_sub ON e_sub.m = c_sub.m),
codes AS (SELECT p.vec_id, p.m, a.cell,
                 min({{'d': p.dist, 'c': p.cid}}).c AS code
          FROM pairs p JOIN assigned a ON a.vec_id = p.vec_id
          GROUP BY p.vec_id, p.m, a.cell),
q_sub AS (SELECT e_sub.vec_id AS q_id, a.cell, e_sub.m, e_sub.sub AS qsub
          FROM e_sub JOIN assigned a ON a.vec_id = e_sub.vec_id
          WHERE e_sub.vec_id < {N_QUERIES}),
dtab AS (SELECT q_id, q_sub.cell, q_sub.m, cid,
                {sub_dist('qsub', 'csub')} AS d
         FROM q_sub JOIN c_sub ON q_sub.m = c_sub.m),
scored AS (SELECT d.q_id, codes.vec_id AS n_id, round(sum(d.d), 6) AS adist
           FROM codes JOIN dtab d
             ON d.m = codes.m AND d.cid = codes.code AND d.cell = codes.cell
           WHERE codes.vec_id <> d.q_id
           GROUP BY d.q_id, codes.vec_id),
ranked AS (SELECT q_id, n_id, adist,
                  row_number() OVER (PARTITION BY q_id
                                     ORDER BY adist ASC, n_id ASC) AS rank
           FROM scored)
SELECT q_id, rank, n_id, adist FROM ranked WHERE rank <= {TOP_K}"""


def q_ivfpq_search(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-PQ (nprobe=1): the composed FAISS index shape — each query's
    ADC scan is restricted to ITS OWN IVF cell, over PQ codes only.
    Combines td_sim_ivf_topk's cell pruning with td_sim_pq_search's
    asymmetric distance; both components are independently oracled,
    this pins their composition.

    Scale shape: the corpus is touched as (vec_id, m, code, cell) rows
    — 4-byte codes plus a cell label, laid out bucketed/partitioned BY
    CELL at production scale, so a query batch probes only matching
    cell partitions (partition pruning on the scan, no shuffle).  The
    per-query distance table (queries x PQ_M x PQ_K, built off the
    broadcast codebook) carries the query's cell and broadcasts into
    the (cell, m, code) equi-join; candidate volume per query is
    |cell|, not |corpus| — the two multiplicative reductions (cell
    fraction x code compression) are exactly why IVF-PQ is the
    standard billion-vector layout."""
    emb = load_table(spark, sf, "embeddings")
    cells = _assignments(spark, sf).select("vec_id", "cell")
    codes, c_sub = _pq_codes(emb)
    codes = codes.join(cells, "vec_id")
    q_sub = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .join(cells, "vec_id")
        .select(
            F.col("vec_id").alias("q_id"),
            "cell",
            "embedding",
            F.explode(F.array(*[F.lit(m) for m in range(PQ_M)])).alias("m"),
        )
        .select(
            "q_id", "cell", "m",
            F.slice("embedding", F.col("m") * PQ_SUB + 1, PQ_SUB).alias("qsub"),
        )
    )
    diff2 = F.zip_with(
        "qsub",
        "csub",
        lambda a, b: (a.cast("double") - b.cast("double"))
        * (a.cast("double") - b.cast("double")),
    )
    d = F.aggregate(diff2, F.lit(0.0), lambda acc, v: acc + v)
    dtab = q_sub.join(F.broadcast(c_sub), "m").select(
        "q_id", "cell", "m", "cid", d.alias("d")
    )
    scored = codes.alias("k").join(
        F.broadcast(dtab).alias("t"),
        (F.col("k.m") == F.col("t.m"))
        & (F.col("k.code") == F.col("t.cid"))
        & (F.col("k.cell") == F.col("t.cell")),
    )
    agg = (
        scored.filter(F.col("k.vec_id") != F.col("t.q_id"))
        .groupBy(F.col("t.q_id").alias("q_id"), F.col("k.vec_id").alias("n_id"))
        .agg(F.round(F.sum("t.d"), 6).alias("adist"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("adist").asc(), F.col("n_id").asc())
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("q_id", "rank", "n_id", "adist")
    )


REGISTRY["td_sim_ivfpq_search"] = (q_ivfpq_search, _ivfpq_sql())


# ---- per-dimension embedding statistics (normalization table) ----


@_reg(
    "td_emb_dim_stats",
    f"""WITH dims AS (
  SELECT e.vec_id, u.i AS dim, CAST(e.embedding[u.i] AS DOUBLE) AS v
  FROM embeddings e
  CROSS JOIN (SELECT unnest(range(1, {DIM + 1})) AS i) u)
SELECT dim,
       count(*) AS n,
       round(avg(v), 6) AS mean_v,
       round(stddev_pop(v), 6) AS std_v,
       round(min(v), 6) AS min_v,
       round(max(v), 6) AS max_v
FROM dims GROUP BY dim""",
)
def q_emb_dim_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-dimension corpus statistics of the embedding column — the
    normalization / whitening table (mean, std, range per dim) an
    embedding pipeline fits before standardizing, and the drift
    monitor a production index re-checks per ingest batch.

    Scale shape: posexplode is a per-row generator (no shuffle to
    expand); the aggregate's key domain is exactly DIM={DIM} — map-side
    partials collapse every partition to ≤{DIM} rows before the one
    tiny exchange, so the stats cost one corpus scan regardless of
    corpus size, and the output table is a broadcast-sized artifact
    downstream standardization joins in.  mean/std use Spark's
    mergeable moment aggregates (sum/sum-of-squares partials);
    stddev_pop on identical doubles matches DuckDB bit-for-bit at the
    6dp round."""
    emb = load_table(spark, sf, "embeddings")
    dims = emb.select(
        F.posexplode("embedding").alias("pos", "v")
    ).select((F.col("pos") + 1).alias("dim"), F.col("v").cast("double").alias("v"))
    return dims.groupBy("dim").agg(
        F.count("*").alias("n"),
        F.round(F.avg("v"), 6).alias("mean_v"),
        F.round(F.stddev_pop("v"), 6).alias("std_v"),
        F.round(F.min("v"), 6).alias("min_v"),
        F.round(F.max("v"), 6).alias("max_v"),
    )



def standardize_embeddings(
    emb: DataFrame, stats: DataFrame, min_std: float = 1e-9
) -> DataFrame:
    """Whiten vectors with a fitted per-dimension stats table (the
    output of td_emb_dim_stats): z[i] = (x[i] - mean[i]) / std[i].

    The stats table is a DIM-row ARTIFACT (like k-means centroids or
    BPE merges), so it collects to the driver once and is inlined as
    literal arrays into a single transform() expression — the corpus
    is rewritten in one codegen projection: no join, no shuffle, no
    Python.  Constant dims (std < min_std) pass through as 0."""
    rows = {r["dim"]: (r["mean_v"], r["std_v"]) for r in stats.collect()}
    dim = max(rows)
    means = F.array(*[F.lit(float(rows[i + 1][0])) for i in range(dim)])
    stds = F.array(*[F.lit(float(rows[i + 1][1])) for i in range(dim)])
    z = F.zip_with(
        F.zip_with("embedding", means, lambda x, m: x.cast("double") - m),
        stds,
        lambda d, s: F.when(s >= min_std, d / s).otherwise(F.lit(0.0)),
    )
    return emb.withColumn("z_embedding", z)


# ------------------------------------------------- hard-negative mining
def q_hard_negatives(spark: SparkSession, sf: str) -> DataFrame:
    """Hard-negative mining for contrastive embedding training: for
    each query vector, the top-k most-similar corpus vectors whose
    LABEL differs — the negatives that actually move the loss.  Emits
    both labels so a training run can audit its negative pool.

    Scale shape: identical to td_sim_bruteforce_topk (the 5-row query
    set broadcasts into one pass over the corpus; the label predicate
    filters BEFORE the rank window so the shuffle carries only
    differing-label pairs).  At corpus scale the candidate generator
    swaps to the LSH/IVF plane (rerank_after_ann's stage 1) and this
    label filter + window apply unchanged to its output — mining cost
    is then O(|Q| x k'), never O(|Q| x corpus).

    Reference scope: no embedding-training plane in the reference;
    SURVEY §2 extras (training-data toolkit)."""
    emb = _with_nonzero_norm(load_table(spark, sf, "embeddings"))
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"), F.col("label").alias("q_label"),
    )
    cand = emb.select(
        F.col("vec_id").alias("n_id"), F.col("embedding").alias("n_emb"),
        F.col("norm").alias("n_norm"), F.col("label").alias("n_label"),
    )
    scored = (
        cand.join(F.broadcast(queries))
        .filter(
            (F.col("n_id") != F.col("q_id"))
            & (F.col("n_label") != F.col("q_label"))
        )
        .select(
            "q_id", "q_label", "n_id", "n_label",
            F.round(
                _dot(F.col("q_emb"), F.col("n_emb"))
                / (F.col("q_norm") * F.col("n_norm")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("q_id", "rank", "n_id", "q_label", "n_label", "cosine")
    )


SQL_HARD_NEGATIVES = f"""
WITH {_NZ_EMB_SQL},
q AS (
  SELECT vec_id AS q_id, embedding AS q_emb, label AS q_label
  FROM nz WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.q_id, q.q_label, e.vec_id AS n_id, e.label AS n_label,
         round(
           list_sum(list_transform(range(1, {DIM} + 1),
             i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
           / (sqrt(list_sum(list_transform(range(1, {DIM} + 1),
                i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(q.q_emb[i] AS DOUBLE))))
              * sqrt(list_sum(list_transform(range(1, {DIM} + 1),
                i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))),
           6) AS cosine
  FROM nz e CROSS JOIN q
  WHERE e.vec_id <> q.q_id AND e.label <> q.q_label),
ranked AS (
  SELECT q_id, q_label, n_id, n_label, cosine,
         row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id ASC) AS rank
  FROM scored)
SELECT q_id, rank, n_id, q_label, n_label, cosine
FROM ranked WHERE rank <= {TOP_K}"""

REGISTRY["td_sim_hard_negatives"] = (q_hard_negatives, SQL_HARD_NEGATIVES)


# ---------------------------------------- multi-probe LSH ANN
def _probe_sigs_col():
    """The 1 + LSH_PLANES probe signatures of a query's own `sig`: the
    bucket itself plus every Hamming-distance-1 neighbor (one bit
    flipped).  A derived column — probes are string surgery, never a
    join."""
    probes = [F.col("sig")]
    for p in range(LSH_PLANES):
        bit = F.substring("sig", p + 1, 1)
        flipped = F.when(bit == "1", F.lit("0")).otherwise(F.lit("1"))
        probes.append(
            F.concat(
                F.substring("sig", 1, p),
                flipped,
                F.substring("sig", p + 2, LSH_PLANES - p - 1),
            )
        )
    return F.array(*probes)


def ann_topk_lsh_multiprobe(
    spark: SparkSession, sf: str, k: int = TOP_K
) -> DataFrame:
    """Multi-probe LSH ANN: single-bucket LSH on isotropic gaussians
    has ~2% recall by geometry (README boundary note) because the true
    neighbor usually differs in one or two hyperplane bits; probing
    the query's bucket PLUS its 8 Hamming-1 neighbors recovers the
    one-bit misses: measured recall@5 0.04 -> 0.16 at sf0.01 (the
    P(<=1 of 8 bits differ) geometry predicts ~0.18).  Cost: candidate
    volume grows ~9x the (tiny) bucket occupancy, nothing quadratic;
    the high-cosine near-dup regime (its actual use, like the
    single-probe path) sits far above these isotropic-gaussian floors.

    Scale shape: identical to ann_topk_lsh — the probe list is a
    derived column on the (broadcast) query side only, exploded to 9
    rows per query; the CORPUS side still carries its single signature
    and the candidate join stays a plain equi-join on sig.  Each
    (query, candidate) pair matches at most one probe (probe sigs are
    distinct), so no post-join dedup exists.

    Deterministic given the md5-derived hyperplanes, so fully
    DuckDB-oracled like the single-probe path."""
    e = _with_nonzero_norm(load_table(spark, sf, "embeddings")).withColumn(
        "sig", _signature_expr()
    )
    q = (
        e.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"),
            F.col("norm").alias("q_norm"),
            F.explode(_probe_sigs_col()).alias("sig"),
        )
    )
    c = e.select(
        F.col("vec_id").alias("n_id"), F.col("embedding").alias("n_emb"),
        F.col("norm").alias("n_norm"), "sig",
    )
    return _cosine_topk(c, q, k, on="sig")


def _ann_lsh_mp_sql() -> str:
    def _l2(col: str) -> str:
        return (
            f"sqrt(list_sum(list_transform(range(1, {DIM} + 1), "
            f"i -> CAST({col}[i] AS DOUBLE) * CAST({col}[i] AS DOUBLE))))"
        )

    dot = (
        f"list_sum(list_transform(range(1, {DIM} + 1), "
        f"i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))"
    )
    flips = ["signature"]
    for p in range(LSH_PLANES):
        bit = f"substr(signature, {p + 1}, 1)"
        flipped = f"(CASE WHEN {bit} = '1' THEN '0' ELSE '1' END)"
        flips.append(
            f"(substr(signature, 1, {p}) || {flipped} || "
            f"substr(signature, {p + 2}, {LSH_PLANES - p - 1}))"
        )
    probe_list = "[" + ", ".join(flips) + "]"
    return f"""WITH {_NZ_EMB_SQL},
sigs AS ({_lsh_sql()}),
e AS (SELECT s.vec_id, s.signature, m.embedding
      FROM sigs s JOIN nz m ON m.vec_id = s.vec_id),
q AS (SELECT vec_id AS q_id, unnest({probe_list}) AS probe,
             embedding AS q_emb
      FROM e WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.q_id, c.vec_id AS n_id,
         round({dot} / ({_l2('q.q_emb')} * {_l2('c.embedding')}), 6) AS cosine
  FROM e c JOIN q ON c.signature = q.probe AND c.vec_id <> q.q_id),
ranked AS (
  SELECT q_id, n_id, cosine,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY cosine DESC, n_id ASC) AS rank
  FROM scored)
SELECT q_id, rank, n_id, cosine FROM ranked WHERE rank <= {TOP_K}"""


REGISTRY["td_sim_lsh_multiprobe"] = (ann_topk_lsh_multiprobe, _ann_lsh_mp_sql())
