"""Property-based span-sequence equality (SURVEY §5.4): hypothesis
generates arbitrary interleaved documents — unicode text, whitespace
runs, empty spans, arabic-looking content, error-triggering media refs,
heavy docs — and the Spark pipeline must match a direct per-span oracle
built from the same stub/constants.  Offsets are unique per doc (the
input_hint's document-order position; ordering is undefined otherwise).
"""

import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pero_ocr_api_spark.constants import KIND_MEDIA, KIND_TEXT
from pero_ocr_api_spark.plans.pipeline import extract

DOC_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)

# text spans: printable-ish unicode incl. whitespace runs and arabic chars
_text = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=32, max_codepoint=0x2FF),
        st.sampled_from(" \t\nابتث١"),
    ),
    max_size=40,
)
# media refs: non-empty printable ascii (md5-keyed stub; any string works)
_ref = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1,
    max_size=24,
)

_span = st.one_of(
    st.tuples(st.just(KIND_TEXT), _text, st.none()),
    st.tuples(st.just(KIND_MEDIA), st.none(), _ref),
)


@st.composite
def documents(draw):
    n_docs = draw(st.integers(min_value=1, max_value=8))
    rows = []
    for d in range(n_docs):
        n_spans = draw(st.integers(min_value=0, max_value=12))
        spans = []
        offsets = draw(
            st.lists(
                st.integers(min_value=0, max_value=10_000),
                min_size=n_spans, max_size=n_spans, unique=True,
            )
        )
        for off, (kind, text, ref) in zip(
            offsets, draw(st.lists(_span, min_size=n_spans, max_size=n_spans))
        ):
            spans.append({"kind": kind, "text": text, "media_ref": ref,
                          "offset": off})
        rows.append((f"pdoc-{d}", spans))
    return rows


def _oracle(rows):
    """Direct oracle over arbitrary spans — delegates to
    oracle.extract_spans, the single source of per-span semantics."""
    from pero_ocr_api_spark.oracle import extract_spans

    out = {}
    for doc_id, spans in rows:
        flat = [(s["offset"], s["kind"], s["text"], s["media_ref"])
                for s in spans]
        spans_out, score, status = extract_spans(flat)
        out[doc_id] = (spans_out, score, status)
    return out


@settings(
    max_examples=int(__import__("os").environ.get("PROPERTY_MAX_EXAMPLES", "12")),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(rows=documents())
def test_random_documents_match_oracle(spark, rows):
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    res = extract(spark, docs, with_metrics=False, salt_partitions=8)

    got_spans = {}
    for r in res.spans.collect():
        got_spans.setdefault(r.doc_id, []).append(
            (r.order, r.kind, r.text, r.media_ref)
        )
    for v in got_spans.values():
        v.sort()
    got_docs = {r.doc_id: (r.score, r.status) for r in res.docs.collect()}

    exp = _oracle(rows)
    assert set(got_docs) == set(exp)
    for doc_id, (spans_out, score, status) in exp.items():
        assert got_spans.get(doc_id, []) == spans_out, doc_id
        assert got_docs[doc_id] == (score, status), doc_id


# ---- main-content classifier vs an independent pure-Python oracle ----

_vocab = ["the", "a", "of", "to", "and", "tok", "alpha", "beta", "x9",
          "https://ex.am/p", "data", "row", ""]


def _py_main_content(text: str):
    """Independent reimplementation of functions/maincontent.py
    semantics (jusText-style) in plain Python."""
    from pero_ocr_api_spark.constants import STOPWORDS
    from pero_ocr_api_spark.functions.maincontent import (
        BLOCK_TOKENS, LINK_DENSITY_BAD, MIN_BLOCK_TOKENS, STOPWORD_GOOD,
    )

    toks = [t for t in text.split(" ") if t != ""]
    if not toks:
        return None
    blocks = [
        toks[i: i + BLOCK_TOKENS] for i in range(0, len(toks), BLOCK_TOKENS)
    ]
    cf = []
    for b in blocks:
        n = len(b)
        sw = sum(1 for t in b if t in STOPWORDS)
        lk = sum(1 for t in b if t.startswith(("http://", "https://")))
        if lk / n > LINK_DENSITY_BAD:
            cf.append("bad")
        elif n < MIN_BLOCK_TOKENS:
            cf.append("short")
        elif sw / n >= STOPWORD_GOOD:
            cf.append("good")
        else:
            cf.append("near_good")
    final = []
    for i, c in enumerate(cf):
        if c in ("good", "bad"):
            final.append(c)
        else:
            prev_good = i > 0 and cf[i - 1] == "good"
            next_good = i + 1 < len(cf) and cf[i + 1] == "good"
            final.append("good" if prev_good or next_good else "bad")
    content = " ".join(
        " ".join(b) for b, c in zip(blocks, final) if c == "good"
    )
    return {"content": content,
            "n_good": sum(1 for c in final if c == "good"),
            "n_blocks": len(blocks)}


@given(
    docs=st.lists(
        st.lists(st.sampled_from(_vocab), min_size=0, max_size=80).map(
            " ".join
        ),
        min_size=1, max_size=6,
    )
)
@settings(
    max_examples=int(__import__("os").environ.get("PROPERTY_MAX_EXAMPLES", "12")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_main_content_matches_python_oracle(spark, docs):
    from pero_ocr_api_spark.functions.maincontent import main_content

    df = spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(docs)],
        "doc_id string, text string",
    )
    got = {r.doc_id: r for r in main_content(df).collect()}
    for i, text in enumerate(docs):
        expect = _py_main_content(text)
        rid = f"d{i}"
        if expect is None:
            assert rid not in got          # empty docs are filtered out
            continue
        assert got[rid].content == expect["content"], (text,)
        assert got[rid].n_good == expect["n_good"]
        assert got[rid].n_blocks == expect["n_blocks"]


@settings(
    max_examples=int(os.environ.get("PROPERTY_MAX_EXAMPLES", "25")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lengths=st.lists(st.integers(min_value=0, max_value=200), min_size=1,
                     max_size=8),
    chunk=st.integers(min_value=2, max_value=64),
    overlap_frac=st.floats(min_value=0.0, max_value=0.9),
)
def test_chunking_coverage_property(spark, lengths, chunk, overlap_frac):
    """For ANY doc lengths and chunk geometry: every token of every
    non-empty doc appears in ≥1 chunk, chunk k starts at k*stride+1,
    consecutive chunks share exactly `overlap` tokens (when the next
    chunk is long enough), and no chunk is empty."""
    from pero_ocr_api_spark.functions.text import chunk_documents

    overlap = min(int(chunk * overlap_frac), chunk - 1)
    stride = chunk - overlap
    df = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(n))) for i, n in enumerate(lengths)],
        "doc_id long, text string",
    )
    out = chunk_documents(df, chunk_size=chunk, overlap=overlap).collect()
    by_doc: dict[int, dict[int, list[str]]] = {}
    for r in out:
        assert r.n_tokens > 0
        assert r.start_tok == r.chunk_id * stride + 1
        by_doc.setdefault(r.doc_id, {})[r.chunk_id] = r.chunk_text.split(" ")
    for i, n in enumerate(lengths):
        if n == 0:
            assert i not in by_doc
            continue
        chunks = by_doc[i]
        assert sorted(chunks) == list(range(len(chunks)))
        covered = set()
        for k in sorted(chunks):
            toks = chunks[k]
            assert len(toks) <= chunk
            covered.update(toks)
            if overlap and k + 1 in chunks and len(chunks[k + 1]) >= overlap:
                assert toks[-overlap:] == chunks[k + 1][:overlap]
        assert covered == {f"w{j}" for j in range(n)}, (n, chunk, overlap)


# ---- cross-engine fuzz: random corpora through the REAL parity gate ----
_doc_text = st.one_of(
    st.none(),
    st.text(alphabet=list("abcdefgh "), max_size=60),
)


@settings(
    max_examples=int(os.environ.get("PROPERTY_MAX_EXAMPLES", "8")),
    deadline=None,
    # derandomized: the gate compares engine-computed doubles at 6 dp
    # with atol=0, and over an UNBOUNDED random input space some corpus
    # eventually lands within 1 ulp of a rounding boundary where
    # Spark's and DuckDB's round() legitimately disagree in the last
    # digit — a flake, not a bug.  A fixed seed keeps the input
    # diversity while making every run reproduce the same examples
    # (grow coverage deliberately via PROPERTY_MAX_EXAMPLES).
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(_doc_text, min_size=1, max_size=30),
    data=st.data(),
)
def test_fuzz_new_ops_cross_engine(spark, tmp_path_factory, texts, data):
    """The round-5 ops' Spark/DuckDB twins must agree on ARBITRARY
    small corpora, not just the frozen testdata: random texts (incl.
    NULLs, empties, whitespace runs, dup-heavy samples) land in a tmp
    parquet dir and each op runs through the real run_pair gate."""
    from pero_ocr_api_spark.compare import run_pair
    from pero_ocr_api_spark.functions.cdc import REGISTRY as CDC
    from pero_ocr_api_spark.functions.curation import REGISTRY as CUR
    from pero_ocr_api_spark.functions.text import REGISTRY as TXT

    rows = []
    for i, t in enumerate(texts):
        # bias toward duplicate content so diff/cluster paths light up
        if t is not None and data.draw(st.booleans(), label=f"dup{i}"):
            t = texts[0] if texts[0] is not None else t
        rows.append(
            (
                i,
                t,
                data.draw(st.sampled_from(["en", "de", "fr"]), label=f"l{i}"),
                f"s{i % 3}",
                0 if t is None else len(t),
            )
        )
    d = tmp_path_factory.mktemp("fuzz")
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))

    from pero_ocr_api_spark.functions.cluster import REGISTRY as CL
    from pero_ocr_api_spark.functions.dedup import REGISTRY as DD

    for name, reg in [
        # round-5 ops
        ("td_text_hash_classifier", TXT),
        ("td_corpus_report", TXT),
        ("td_token_budget_select", TXT),
        ("td_text_postings", TXT),
        ("td_corpus_diff", CDC),
        ("td_curation_funnel", CUR),
        ("td_dedup_lines", DD),
        ("td_text_bigram_ce", TXT),
        ("td_shard_plan", TXT),
        ("td_blocklist_filter", CUR),
        ("td_text_winnowing", TXT),
        ("td_decontam_winnow", CUR),
        # established documents-table ops: random corpora harden the
        # whole text/dedup plane, not just this round's additions
        ("td_text_tokens", TXT),
        ("td_text_quality", TXT),
        ("td_text_langid", TXT),
        ("td_text_fingerprint", TXT),
        ("td_text_vocab", TXT),
        ("td_corpus_filter", TXT),
        ("td_corpus_split", TXT),
        ("td_text_repetition", TXT),
        ("td_text_novelty", TXT),
        ("td_dedup_exact", DD),
        ("td_dedup_ngram_jaccard", DD),
        ("td_dedup_simhash", DD),
        ("td_dedup_clusters", CL),
        # the rest of the documents-table planes: every op whose only
        # input is the documents table goes through the same gate, so
        # the whole text/dedup/curation surface is fuzz-hardened.
        # log()-based scores (bm25/idf/zipf/CE/DSIR/gumbel) are
        # last-ulp platform-dependent but deterministic per input; the
        # fixed seed keeps any straddle reproducible, not flaky.
        ("td_chunk_documents", TXT),
        ("td_length_deciles", TXT),
        ("td_pack_sequences", TXT),
        ("td_text_bm25", TXT),
        ("td_text_bpe_pairs", TXT),
        ("td_text_idf", TXT),
        ("td_text_unigram_ce", TXT),
        ("td_text_zipf", TXT),
        ("td_curation_dsir", CUR),
        ("td_curation_gumbel_sample", CUR),
        ("td_decontaminate", CUR),
        ("td_lang_rebalance", CUR),
        ("td_length_winsorize", CUR),
        ("td_pii_redact", CUR),
        ("td_stratified_sample", CUR),
        ("td_dedup_incremental", DD),
        ("td_dedup_minhash_lsh", DD),
        ("td_dedup_source_matrix", DD),
        ("td_dedup_substring", DD),
        ("td_dedup_substring_spans", DD),
        ("td_dedup_substring_apply", DD),
        ("td_dedup_tfidf_cosine", DD),
        ("td_dedup_canonical", CL),
        ("td_split_leakage_safe", CL),
        ("td_merge_upsert", CDC),
        ("td_merge_cdc_delete", CDC),
    ]:
        fn, sql = reg[name]
        errs = run_pair(spark, str(d), fn, sql)
        assert errs == [], (name, errs, rows)


_event_type = st.sampled_from(
    ["signup", "click", "purchase", "view", "error"]
)


@settings(
    max_examples=int(os.environ.get("PROPERTY_MAX_EXAMPLES", "8")),
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(n=st.integers(min_value=1, max_value=40), data=st.data())
def test_fuzz_event_ops_cross_engine(spark, tmp_path_factory, n, data):
    """The whole events plane (asof, sessionize, range join, rollup,
    funnel, cohorts, rolling window, markov, variant props,
    co-occurrence, robust outliers) must agree with its DuckDB twins on
    ARBITRARY event streams, not just the frozen testdata.

    Determinism contract encoded in the generator: timestamps are
    globally UNIQUE (ASOF/lag tie order at equal ts is engine-defined,
    same as the cdc seq-uniqueness contract) and never NULL (window
    ORDER BY null placement differs: Spark NULLS FIRST asc, DuckDB
    NULLS LAST).  Values are dyadic rationals (k/8) so every sum is
    exact in float64 and the 3/4 dp rounds cannot straddle a boundary;
    value and props may be NULL."""
    from datetime import datetime, timedelta

    from pero_ocr_api_spark.compare import run_pair
    from pero_ocr_api_spark.functions.events import REGISTRY as EV

    offsets = data.draw(
        st.lists(
            st.integers(0, 2_000_000), min_size=n, max_size=n, unique=True
        ),
        label="offsets",
    )
    base = datetime(2026, 1, 1)
    rows = []
    for i in range(n):
        val = data.draw(
            st.one_of(st.none(), st.integers(0, 64)), label=f"v{i}"
        )
        k = data.draw(
            st.one_of(st.none(), st.integers(-30, 99)), label=f"k{i}"
        )
        rows.append(
            (
                i,
                base + timedelta(seconds=offsets[i]),
                data.draw(st.integers(0, 3), label=f"u{i}"),
                data.draw(_event_type, label=f"t{i}"),
                None if val is None else val / 8.0,
                None if k is None else '{"k": %d}' % k,
            )
        )
    d = tmp_path_factory.mktemp("fuzz_ev")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))

    # td_scd2_versions (cdc registry) and td_profile_key_skew
    # (sketches registry) also read the events table — same
    # determinism contract (unique non-NULL ts)
    from pero_ocr_api_spark.functions.cdc import REGISTRY as CDC
    from pero_ocr_api_spark.functions.sketches import REGISTRY as SK

    for name, reg in [(n, EV) for n in sorted(EV)] + [
        ("td_scd2_versions", CDC),
        ("td_profile_key_skew", SK),
    ]:
        fn, sql = reg[name]
        errs = run_pair(spark, str(d), fn, sql)
        assert errs == [], (name, errs, rows)


@settings(
    # half the shared budget: each example runs all 16 ops x 2 engines
    # (~25 s); the corpus STRUCTURE (sizes, dups, labels) is the fuzz
    # surface, so fewer, more varied examples beat many similar ones
    max_examples=max(
        2, int(os.environ.get("PROPERTY_MAX_EXAMPLES", "8")) // 2
    ),
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(n=st.integers(min_value=6, max_value=20), data=st.data())
def test_fuzz_similarity_ops_cross_engine(spark, tmp_path_factory, n, data):
    """The similarity/embedding plane (brute-force cosine, LSH sig/
    buckets/top-k/multi-probe, rerank, embedding near-dup, IVF, PQ
    encode/search, IVF-PQ, SemDeDup, k-means step, quantize, dim
    stats, whitening, hard negatives) must agree with its DuckDB twins
    on ARBITRARY embedding corpora, not just the frozen testdata.

    Determinism contract encoded in the generator: components are
    dyadic rationals k/8 with |k| <= 16, so every dot product and
    squared norm is an exact multiple of 1/64 well inside float64 —
    sums are exact in ANY summation order, and the downstream sqrt /
    divide / 6-dp round are IEEE-deterministic on identical operands.
    Zero vectors are excluded by the cosine plane itself on both
    engines (see similarity._nonzero; pinned by
    test_similarity_zero_vector_excluded) — the generator still
    repairs them so every drawn vector contributes candidate mass;
    n >= 6 keeps a non-empty candidate set past the N_QUERIES=5 split.
    stddev_pop (td_emb_dim_stats, whitening) is the one non-plain-sum
    aggregate: intermediate M2 rounding differs between engines, but
    the fixed hypothesis seed makes any last-ulp straddle reproducible
    rather than flaky."""
    from pero_ocr_api_spark.compare import run_pair
    from pero_ocr_api_spark.functions.similarity import DIM
    from pero_ocr_api_spark.functions.similarity import REGISTRY as SIM

    import random as _random

    rows, doc_rows, raw = [], [], []
    for i in range(n):
        # one drawn seed per vector, expanded by a local PRNG: 64
        # component draws per vector through hypothesis dominate the
        # test's wall clock without adding shrink value — the fuzz
        # surface here is corpus STRUCTURE, not component values
        seed = data.draw(st.integers(0, 2**32 - 1), label=f"vec{i}")
        ks = [_random.Random(seed + j).randint(-16, 16) for j in range(DIM)]
        if not any(ks):
            ks[0] = 1
        # bias toward near-duplicate vectors so the near-dup/SemDeDup
        # branches produce rows (random +/-16 vectors are ~orthogonal)
        if i > 0 and data.draw(st.booleans(), label=f"dupv{i}"):
            ks = list(raw[data.draw(st.integers(0, i - 1), label=f"src{i}")])
            j = data.draw(st.integers(0, DIM - 1), label=f"flip{i}")
            ks[j] = min(16, ks[j] + 1)
        raw.append(ks)
        rows.append(
            (i, [k / 8.0 for k in ks], data.draw(st.integers(0, 3),
                                                 label=f"lab{i}"))
        )
        doc_rows.append(
            (
                i,
                data.draw(
                    st.one_of(
                        st.none(),
                        st.text(alphabet=list("abcd "), max_size=24),
                    ),
                    label=f"txt{i}",
                ),
                "en",
                f"s{i % 3}",
            )
        )
    d = tmp_path_factory.mktemp("fuzz_sim")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "embeddings.parquet"))
    # td_sim_rerank attaches documents.text onto the ANN candidates
    spark.createDataFrame(
        doc_rows, "doc_id long, text string, lang string, source string"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))

    for name in sorted(SIM):
        fn, sql = SIM[name]
        errs = run_pair(spark, str(d), fn, sql)
        assert errs == [], (name, errs, rows)

def _write_tpch_fuzz_dir(spark, d, seed: int, size: int) -> None:
    """Deterministically expand one drawn seed into a CONSISTENT random
    TPC-H-ish snowflake (plus events/documents/embeddings) with the
    cross-engine determinism contract: money and rates are dyadic
    (quarters / 64ths — every sum exact in float64), order dates are
    globally unique (window/rank tie order at equal ts is
    engine-defined), and ~10% of FKs dangle so outer/anti/semi paths
    light up.  Domains mirror the frozen testdata so the cp_* literal
    predicates actually select rows."""
    import random as _random
    from datetime import datetime, timedelta

    R = _random.Random(seed)
    base = datetime(1995, 1, 1)

    region = [(i, nm) for i, nm in enumerate(
        ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"])]
    nation = [(i, f"NATION_{i}", R.randint(0, 4)) for i in range(8)]
    n_cust = max(3, size)
    customer = [
        (i, f"Customer#{i:09d}", R.randint(0, 9),  # 8,9 dangle
         R.randint(-4000, 40000) / 4.0,
         R.choice(["MACHINERY", "BUILDING", "AUTOMOBILE", "HOUSEHOLD",
                   "FURNITURE"]))
        for i in range(n_cust)
    ]
    supplier = [
        (i, f"Supplier#{i:09d}", R.randint(0, 9),
         R.randint(-4000, 40000) / 4.0)
        for i in range(max(2, size // 3))
    ]
    part = [
        (i,
         f"{R.choice(['small','blue','cold','new','hot'])} "
         f"{R.choice(['widget','rod','ring','anvil','bolt'])}",
         f"Brand#{R.randint(1, 25)}",
         R.choice(["ECONOMY", "LARGE", "STANDARD", "PROMO", "MEDIUM",
                   "SMALL"]),
         R.randint(1, 50), R.randint(100, 8000) / 4.0)
        for i in range(max(3, size // 2))
    ]
    n_ord = max(5, size * 2)
    odates = R.sample(range(0, 200_000_000), n_ord)  # unique, ~6.3y span
    orders, lineitem = [], []
    for i in range(n_ord):
        orders.append(
            (i, R.randint(0, n_cust + 1), R.choice("POF"),
             R.randint(400, 2_000_000) / 4.0,
             base + timedelta(seconds=odates[i]),
             R.choice(["1-URGENT", "2-HIGH", "3-MEDIUM",
                       "4-NOT SPECIFIED", "5-LOW"]))
        )
        for j in range(R.randint(0, 4)):
            lineitem.append(
                (i, R.randint(0, len(part)), R.randint(0, len(supplier)),
                 j + 1, float(R.randint(1, 50)),
                 R.randint(100, 400_000) / 4.0,
                 R.randint(0, 6) / 64.0, R.randint(0, 5) / 64.0,
                 R.choice("NAR"), R.choice("FO"),
                 base + timedelta(seconds=odates[i] + j,
                                  days=R.randint(1, 120)))
            )
    ev_base = datetime(2024, 1, 1)
    ev_offsets = R.sample(range(0, 5_000_000), max(5, size * 3))
    events = [
        (i, ev_base + timedelta(seconds=off), R.randint(0, 5),
         R.choice(["signup", "click", "purchase", "view", "error"]),
         None if R.random() < 0.15 else R.randint(0, 2000) / 8.0,
         None if R.random() < 0.15 else '{"k": %d}' % R.randint(-30, 99))
        for i, off in enumerate(ev_offsets)
    ]
    documents = [
        (i,
         None if R.random() < 0.15 else
         "".join(R.choice("abcd ") for _ in range(R.randint(0, 30))),
         R.choice(["en", "de", "fr"]), f"s{i % 3}")
        for i in range(max(2, size))
    ]
    documents = [t + (0 if t[1] is None else len(t[1]),) for t in documents]
    embeddings = [
        (i, [R.randint(-16, 16) / 8.0 for _ in range(64)], R.randint(0, 3))
        for i in range(max(6, size))
    ]

    for name, rows, schema in [
        ("region", region, "r_regionkey int, r_name string"),
        ("nation", nation,
         "n_nationkey int, n_name string, n_regionkey int"),
        ("customer", customer,
         "c_custkey long, c_name string, c_nationkey int, "
         "c_acctbal double, c_mktsegment string"),
        ("supplier", supplier,
         "s_suppkey long, s_name string, s_nationkey int, "
         "s_acctbal double"),
        ("part", part,
         "p_partkey long, p_name string, p_brand string, p_type string, "
         "p_size int, p_retailprice double"),
        ("orders", orders,
         "o_orderkey long, o_custkey long, o_orderstatus string, "
         "o_totalprice double, o_orderdate timestamp_ntz, "
         "o_orderpriority string"),
        ("lineitem", lineitem,
         "l_orderkey long, l_partkey long, l_suppkey long, "
         "l_linenumber int, l_quantity double, l_extendedprice double, "
         "l_discount double, l_tax double, l_returnflag string, "
         "l_linestatus string, l_shipdate timestamp_ntz"),
        ("events", events,
         "event_id long, ts timestamp_ntz, user_id long, "
         "event_type string, value double, props string"),
        ("documents", documents,
         "doc_id long, text string, lang string, source string, "
         "n_chars long"),
        ("embeddings", embeddings,
         "vec_id long, embedding array<float>, label int"),
    ]:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(d / f"{name}.parquet"))


@settings(
    max_examples=max(
        2, int(os.environ.get("PROPERTY_MAX_EXAMPLES", "8")) // 4
    ),
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(0, 2**32 - 1),
    size=st.integers(min_value=3, max_value=15),
)
def test_fuzz_controlplane_cross_engine(spark, tmp_path_factory, seed, size):
    """Every oracled cp_* query (the whole control plane: filters,
    joins, aggs, windows, state machine, admin, and the 22-shape ANSI
    SQL surface) must agree with DuckDB on ARBITRARY consistent
    TPC-H-ish snapshots, not just the frozen testdata.  The hand-
    translated DataFrame queries are where dialect divergence can
    hide; the cp_sql_* twins run ONE string on both engines, so any
    failure there is an engine-semantics difference on identical SQL."""
    import __spark_entry__ as entrymod
    from pero_ocr_api_spark.compare import run_pair

    d = tmp_path_factory.mktemp("fuzz_cp")
    _write_tpch_fuzz_dir(spark, d, seed, size)
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    for name in sorted(n for n in qs if n.startswith("cp_") and n in osql):
        errs = run_pair(spark, str(d), qs[name], osql[name])
        assert errs == [], (name, errs, seed, size)

# the extraction gate feeds XML serializers and the md5 stub: stress
# XML-specials, quotes, unicode (incl. arabic) alongside the plain
# alphabet — escaping and UTF-8 hashing must agree cross-engine
_xml_text = st.one_of(
    st.none(),
    _doc_text,
    st.text(alphabet=list("ab &<>\"'\t\n ةاب١€漢"), max_size=60),
)


@settings(
    # extraction runs the emulated-latency inference stage per example,
    # so this gate gets the quarter budget
    max_examples=max(
        2, int(os.environ.get("PROPERTY_MAX_EXAMPLES", "8")) // 4
    ),
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(_xml_text, min_size=1, max_size=20),
    data=st.data(),
)
def test_fuzz_extraction_mm_cross_engine(spark, tmp_path_factory, texts, data):
    """The flagship extraction pipeline, its serializers, and the
    multimodal/main-content/profiler planes must agree with their
    DuckDB twins on ARBITRARY corpora — the spans table derives
    deterministically from documents (synth.exploded_spans ==
    SQL_EXPLODED_SPANS_CTE), so random text fuzzes the whole
    interleaved-span derivation, the md5-stub inference, reading
    order, and the XML serializers on both engines.  With this gate
    every oracled query in the registry is fuzz-covered."""
    import __spark_entry__ as entrymod
    from pero_ocr_api_spark.compare import run_pair

    rows = []
    for i, t in enumerate(texts):
        if t is not None and data.draw(st.booleans(), label=f"dup{i}"):
            t = texts[0] if texts[0] is not None else t
        rows.append(
            (
                i,
                t,
                data.draw(st.sampled_from(["en", "de", "fr"]), label=f"l{i}"),
                f"s{i % 3}",
                0 if t is None else len(t),
            )
        )
    d = tmp_path_factory.mktemp("fuzz_xt")
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))

    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    for name in [
        "extract_input_spans", "extract_pipeline_spans",
        "extract_doc_results", "extract_regions",
        "extract_serialize_txt", "extract_serialize_alto",
        "extract_serialize_page", "extract_conf_histogram",
        "td_mm_decode", "td_mm_features", "td_mm_resize_plan",
        "td_mm_frame_sample",
        "td_mc_blocks", "td_mc_extract",
        "td_profile_documents",
    ]:
        errs = run_pair(spark, str(d), qs[name], osql[name])
        assert errs == [], (name, errs, rows)
