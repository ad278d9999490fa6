"""Property-based span-sequence equality (SURVEY §5.4): hypothesis
generates arbitrary interleaved documents — unicode text, whitespace
runs, empty spans, arabic-looking content, error-triggering media refs,
heavy docs — and the Spark pipeline must match a direct per-span oracle
built from the same stub/constants.  Offsets are unique per doc (the
input_hint's document-order position; ordering is undefined otherwise).
"""

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pero_ocr_api_spark.constants import (
    DEFAULT_SCORE,
    KIND_MEDIA,
    KIND_TEXT,
    MIN_CONFIDENCE,
    SCORE_DP,
    SCORE_SCALE,
    STATE_PROCESSED,
)
from pero_ocr_api_spark.operators.inference import stub_infer_one
from pero_ocr_api_spark.plans.pipeline import extract

_WS = re.compile(r"\s+", re.ASCII)  # Java/RE2 semantics, see oracle.py
_ARABIC = re.compile("[؀-ۿ]")

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
    """Direct per-span reimplementation of the worker semantics over
    arbitrary spans (run_client.py:139-234 order of operations)."""
    out = {}
    for doc_id, spans in rows:
        lines = []   # (offset, line_idx, kind, text, ref)
        confs = []
        first_error = None
        for s in sorted(spans, key=lambda s: s["offset"]):
            if s["kind"] == KIND_TEXT:
                norm = _WS.sub(" ", s["text"] or "").strip(" ")
                if norm:
                    lines.append((s["offset"], 0, KIND_TEXT, norm, None))
            else:
                err, inferred = stub_infer_one(s["media_ref"])
                if err is not None:
                    if first_error is None:
                        first_error = err
                    continue
                for idx, stored, conf in inferred:
                    if MIN_CONFIDENCE > 0 and not (conf and conf > MIN_CONFIDENCE):
                        continue
                    logical = stored[::-1] if _ARABIC.search(stored) else stored
                    lines.append(
                        (s["offset"], idx, KIND_MEDIA, logical, s["media_ref"])
                    )
                    confs.append(conf)
        lines.sort(key=lambda r: (r[0], r[1]))
        spans_out = [
            (i, kind, text, ref)
            for i, (_, _, kind, text, ref) in enumerate(lines)
        ]
        if confs:
            srt = sorted(confs)
            n = len(srt)
            med = srt[n // 2] if n % 2 else (srt[n // 2 - 1] + srt[n // 2]) / 2.0
            score = round(med * SCORE_SCALE, SCORE_DP)
        else:
            score = DEFAULT_SCORE
        out[doc_id] = (spans_out, score, first_error or STATE_PROCESSED)
    return out


@settings(
    max_examples=12,
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
