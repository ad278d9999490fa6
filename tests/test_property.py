"""Property-based span-sequence equality (SURVEY §5.4): hypothesis
generates arbitrary interleaved documents — unicode text, whitespace
runs, empty spans, arabic-looking content, error-triggering media refs,
heavy docs — and the Spark pipeline must match a direct per-span oracle
built from the same stub/constants.  Offsets are unique per doc (the
input_hint's document-order position; ordering is undefined otherwise).
"""

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
