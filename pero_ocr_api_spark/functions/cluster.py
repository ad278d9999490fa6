"""Duplicate-cluster assignment — connected components over near-dup
pairs, so a pipeline can keep one canonical document per duplicate
group (the step after pair generation in every dedup recipe).

Spark side: iterative min-label propagation (the Pregel/GraphX
connected-components recurrence) — each iteration is one distributed
join + aggregate; the driver loop only checks the converged flag
(a scalar count), never touches row data.  ``localCheckpoint`` after
each iteration truncates lineage so plans don't grow with iteration
count (on a cluster, ``spark.sparkContext.setCheckpointDir`` +
``checkpoint()`` is the durable variant).  Convergence needs
O(component diameter) iterations; near-dup components are shallow
(dozens of docs), so this is a handful of rounds even at 100 TB.

Oracle: a DuckDB ``WITH RECURSIVE`` reachability closure over the SAME
pair SQL (functions/dedup.NGRAM_JACCARD_SQL) — min reachable id per
node — proving the iterative Spark fixpoint equals the declarative
transitive closure.  This is the one genuinely iterative algorithm in
the library, and it still carries a full value-hash oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import make_registry
from .dedup import NGRAM_JACCARD_SQL, q_ngram_jaccard

REGISTRY, _reg = make_registry()

MAX_CC_ITERATIONS = 25


def connected_components(pairs: DataFrame, max_iter: int = MAX_CC_ITERATIONS) -> DataFrame:
    """(doc_a, doc_b) undirected edges → (doc_id, cluster_id) where
    cluster_id is the lexicographic min doc_id of the component.
    Only documents that appear in a pair are returned (every other doc
    is trivially its own singleton cluster)."""
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint()
    )
    changed = 0
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        updated = (
            labels.join(neighbor_min, labels.doc_id == neighbor_min.src, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("label"), F.coalesce("nlabel", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            updated.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = updated
        if changed == 0:
            break
    if changed != 0:
        # A deep duplicate chain that outlives the iteration budget would
        # otherwise be SILENTLY split into several clusters (extra
        # "canonical" docs downstream) — fail loudly instead.
        raise RuntimeError(
            f"connected_components did not converge after {max_iter} "
            f"iterations ({changed} labels still changing); raise max_iter"
        )
    return labels.select("doc_id", F.col("label").alias("cluster_id"))


@_reg(
    "td_dedup_clusters",
    f"""WITH RECURSIVE pairs AS ({NGRAM_JACCARD_SQL}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs),
nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
walk(doc_id, reach) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT w.doc_id, e.dst FROM walk w JOIN edges e ON e.src = w.reach)
SELECT doc_id, min(reach) AS cluster_id FROM walk GROUP BY doc_id""",
)
def q_clusters(spark: SparkSession, sf: str) -> DataFrame:
    pairs = q_ngram_jaccard(spark, sf).select("doc_a", "doc_b")
    return connected_components(pairs)


@_reg(
    "td_dedup_canonical",
    f"""WITH RECURSIVE pairs AS ({NGRAM_JACCARD_SQL}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs),
nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
walk(doc_id, reach) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT w.doc_id, e.dst FROM walk w JOIN edges e ON e.src = w.reach),
clusters AS (
  SELECT doc_id, min(reach) AS cluster_id FROM walk GROUP BY doc_id),
ranked AS (
  SELECT c.cluster_id, c.doc_id, d.n_chars,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY d.n_chars DESC, c.doc_id ASC) AS rn,
         count(*) OVER (PARTITION BY c.cluster_id) AS n_members
  FROM clusters c JOIN documents d ON d.doc_id = c.doc_id)
SELECT cluster_id, doc_id AS canonical_doc, n_chars AS kept_chars, n_members
FROM ranked WHERE rn = 1""",
)
def q_canonical(spark: SparkSession, sf: str) -> DataFrame:
    """Canonical-document selection per duplicate cluster: keep the
    longest member (ties → lexicographic-min doc_id) — the compaction
    step that turns dup pairs into a deduplicated corpus.  One
    cluster-partitioned window over the (tiny) clustered-doc set."""
    from pyspark.sql import Window

    from ..session import load_table

    clusters = q_clusters(spark, sf)
    docs = load_table(spark, sf, "documents").select("doc_id", "n_chars")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return (
        clusters.join(docs, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_members", F.count("*").over(Window.partitionBy("cluster_id")))
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("canonical_doc"),
            F.col("n_chars").alias("kept_chars"),
            "n_members",
        )
    )


def _leakage_safe_split_sql() -> str:
    from .hashing import md5_byte_sql

    b = md5_byte_sql("CAST(split_key AS VARCHAR)")
    return f"""WITH RECURSIVE pairs AS ({NGRAM_JACCARD_SQL}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs),
nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
walk(doc_id, reach) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT w.doc_id, e.dst FROM walk w JOIN edges e ON e.src = w.reach),
clusters AS (
  SELECT doc_id, min(reach) AS cluster_id FROM walk GROUP BY doc_id),
keyed AS (
  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS split_key
  FROM documents d LEFT JOIN clusters c ON c.doc_id = d.doc_id)
SELECT doc_id, split_key,
       CASE WHEN {b} < 205 THEN 'train'
            WHEN {b} < 230 THEN 'val'
            ELSE 'test' END AS split
FROM keyed"""


@_reg("td_split_leakage_safe", _leakage_safe_split_sql())
def q_leakage_safe_split(spark: SparkSession, sf: str) -> DataFrame:
    """Dedup-AWARE train/val/test split: the split hash is keyed on a
    document's near-dup CLUSTER id (its own id for singletons), so two
    near-duplicates can never land on opposite sides of the train/test
    boundary — the leakage td_corpus_split's per-doc hash permits and
    the decontamination literature flags (near-dups of heldout text in
    train inflate eval).  Same 205/25/26 md5-byte waterfall as
    td_corpus_split, applied to the cluster key.

    Scale shape: the cluster relation is corpus-SUBLINEAR (only docs
    appearing in a near-dup pair; the iterative component step is the
    documented td_dedup_clusters plan), the left join back to
    documents is a plain equi-join on doc_id (shuffle-free on the
    bucketed layout), and the split itself is per-row codegen.

    Reference scope: SURVEY §2 extras (training-data toolkit; composes
    the dedup plane with the curation plane)."""
    from ..session import load_table
    from .hashing import md5_byte_col

    docs = load_table(spark, sf, "documents")
    pairs = q_ngram_jaccard(spark, sf).select("doc_a", "doc_b")
    clusters = connected_components(pairs)
    keyed = docs.select("doc_id").join(clusters, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cluster_id", F.col("doc_id")).alias("split_key"),
    )
    b = md5_byte_col(F.col("split_key").cast("string"))
    split = (
        F.when(b < 205, "train").when(b < 230, "val").otherwise("test")
    )
    return keyed.select("doc_id", "split_key", split.alias("split"))
