"""Distributed BPE tokenizer training — the full merge loop.

``td_text_bpe_pairs`` (functions/text.py) oracles ONE pair-count step;
this module iterates it: count weighted adjacent symbol pairs over the
distinct-word table, pick the most frequent pair (ties broken
lexicographically), merge it greedily left-to-right in every word, and
repeat.  The reference has no tokenizer (it transcribes page images,
/root/reference/app/main/general.py:13-245); this is the
training-data-pipeline capability a 100 TB corpus engine needs.

Scale shapes:
- Training state lives in TWO places only: the distributed distinct-word
  table (corpus-sublinear — word frequencies, the classic BPE training
  input) and the merge list on the driver (n_merges rows — the trained
  ARTIFACT, not data).  The corpus itself is read once, to build the
  word-frequency table.
- Each iteration is one bounded-key pair-count aggregate (map-side
  partials collapse every partition to ≤|vocab|² live pairs, in
  practice ≪) + a 1-row top-1 collect + a per-row column rewrite of the
  word table.  ``localCheckpoint`` truncates the plan each round so the
  lineage never grows with n_merges (same contract as
  functions/cluster.py's label propagation).
- The greedy left-to-right merge is a pure ``aggregate`` higher-order
  function over the symbol array — zero shuffle, whole-stage codegen,
  no Python crossing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def words_with_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n): the distinct-word frequency table BPE trains on."""
    from .text import tokens_col

    return (
        docs.select(F.explode(tokens_col(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _init_symbols(word: Column) -> Column:
    """Split a word into single-character symbols."""
    return F.split(word, "")


def _merge_expr(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right non-overlapping merge of the symbol pair
    (a, b) -> a||b inside one symbol array: fold each symbol in; when
    the accumulator's last element is `a` and the incoming symbol is
    `b`, replace the tail with the merged symbol.  After a merge the
    tail is `a||b` (never `a` again, since `b` is non-empty), so
    overlapping occurrences cannot chain — matching the scan-from-left
    semantics of the classic trainer."""
    merged = F.lit(a + b)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the word table: each distinct
    word contributes (its pair multiset) x (its corpus count)."""
    pair = F.explode(
        F.when(
            F.size("syms") >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size("syms") - 1),
                lambda i: F.struct(
                    F.element_at("syms", i).alias("a"),
                    F.element_at("syms", i + F.lit(1)).alias("b"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    )
    return (
        words.select("n", pair.alias("p"))
        .groupBy("p.a", "p.b")
        .agg(F.sum("n").alias("cnt"))
    )


def bpe_train(
    docs: DataFrame, n_merges: int, text_col: str = "text"
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Train ``n_merges`` BPE merges over the corpus.  Returns the
    ordered merge list [(a, b, weighted_count)] and the final symbolized
    word table (word, n, syms).  Stops early if no pair occurs twice."""
    words = (
        words_with_counts(docs, text_col)
        .withColumn("syms", _init_symbols(F.col("word")))
        .localCheckpoint()
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(words)
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < 2:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], top[0]["cnt"]
        merges.append((a, b, int(cnt)))
        words = words.withColumn(
            "syms", _merge_expr(F.col("syms"), a, b)
        ).localCheckpoint()
    return merges, words


def bpe_apply(
    df: DataFrame, merges: list[tuple[str, str, int]], word_col: str = "word"
) -> DataFrame:
    """Tokenize ``word_col`` with a trained merge list: the same greedy
    fold applied in merge order — one codegen projection per merge, no
    shuffle, no Python.  Adds a ``syms`` column."""
    out = df.withColumn("syms", _init_symbols(F.col(word_col)))
    for a, b, _cnt in merges:
        out = out.withColumn("syms", _merge_expr(F.col("syms"), a, b))
    return out
