"""Single-threaded pure-Python oracle for the extraction pipeline.

Mirrors the reference worker semantics
(/root/reference/processing_client/run_client.py:139-234) over the
synthesized interleaved documents: fetch/decode stub → per-line
transcription+confidence → confidence filter → Arabic fix → reading
order → score.  Shares constants.py and stub_infer_one() with the Spark
engine so any divergence is a real pipeline bug, not oracle drift.

Used by tests/test_extraction.py for 100% span-sequence equality
(BASELINE.json metric).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

from .constants import (
    DEFAULT_SCORE,
    EMPTY_SPAN_MOD,
    KIND_MEDIA,
    KIND_TEXT,
    MEDIA_EVERY,
    MIN_CONFIDENCE,
    SCORE_DP,
    SCORE_SCALE,
    STATE_PROCESSED,
    WORDS_PER_SPAN,
    WRAP_NOISE_MOD,
)
from .operators.inference import stub_infer_one

from .constants import WS_CLASS

# \s is never trusted (see constants.WS_CLASS)
_WS = re.compile(WS_CLASS + "+")
_ARABIC = re.compile("[؀-ۿ]")


def synth_spans(doc_num: int, text: str) -> list[tuple[int, str, str, str]]:
    """Mirror synth.exploded_spans for one flat document row:
    returns [(offset, kind, text, media_ref)]."""
    tokens = [t for t in (text or "").split(" ") if t != ""]
    n_text = math.ceil(len(tokens) / WORDS_PER_SPAN)
    if n_text < 1:
        return []
    total = n_text + n_text // 2
    doc_id = f"doc-{doc_num:06d}"
    out = []
    for k in range(total):
        if (k + 1) % MEDIA_EVERY == 0:
            m = (k + 1) // MEDIA_EVERY
            out.append((k, KIND_MEDIA, None, f"img://{doc_id}/p{m}"))
        else:
            j = k - (k + 1) // MEDIA_EVERY
            raw = " ".join(tokens[j * WORDS_PER_SPAN: (j + 1) * WORDS_PER_SPAN])
            if (doc_num * 7 + j) % EMPTY_SPAN_MOD == 0:
                t = "   "
            elif (doc_num + j) % WRAP_NOISE_MOD == 0:
                t = "  " + raw + " \n "
            else:
                t = raw
            out.append((k, KIND_TEXT, t, None))
    return out


@dataclass
class OracleDoc:
    doc_id: str
    spans: list = field(default_factory=list)  # (order, kind, text, media_ref)
    score: float = DEFAULT_SCORE
    status: str = STATE_PROCESSED


def _median(vals: list[float]) -> float:
    s = sorted(vals)
    n = len(s)
    mid = n // 2
    if n % 2 == 1:
        return s[mid]
    return (s[mid - 1] + s[mid]) / 2.0


def extract_spans(
    spans: list[tuple[int, str, str, str]],
) -> tuple[list, float, str]:
    """The single source of truth for the per-span worker semantics
    (run_client.py:139-234 order of operations) over arbitrary spans
    [(offset, kind, text, media_ref)].  Returns (ordered_spans, score,
    status) with ordered_spans = [(order, kind, text, media_ref)].
    Used by extract_doc and directly by the property / skew tests so
    the semantics live in exactly one place."""
    out_rows = []   # (offset, line_idx, kind, text, media_ref, conf)
    first_error = None
    confs = []
    # document order, not list order: first_error is the error of the
    # LOWEST-OFFSET failed span (Spark: min_by(error, offset)),
    # regardless of how the input list happens to be arranged
    for (offset, kind, t, ref) in sorted(spans, key=lambda s: s[0]):
        if kind == KIND_TEXT:
            norm = _WS.sub(" ", t or "").strip(" ")
            if norm == "":
                continue
            out_rows.append((offset, 0, KIND_TEXT, norm, None))
        else:
            err, lines = stub_infer_one(ref)
            if err is not None:
                if first_error is None:
                    first_error = err
                continue
            for (idx, stored, conf) in lines:
                # reference strip (run_client.py:213-216): with a positive
                # threshold, keep only lines with a truthy confidence above it
                if MIN_CONFIDENCE > 0 and not (conf and conf > MIN_CONFIDENCE):
                    continue
                logical = stored[::-1] if _ARABIC.search(stored) else stored
                out_rows.append((offset, idx, KIND_MEDIA, logical, ref))
                confs.append(conf)
    out_rows.sort(key=lambda r: (r[0], r[1]))
    ordered = [
        (order, kind, t, ref)
        for order, (_, _, kind, t, ref) in enumerate(out_rows)
    ]
    score = round(_median(confs) * SCORE_SCALE, SCORE_DP) if confs else DEFAULT_SCORE
    return ordered, score, first_error or STATE_PROCESSED


def extract_doc(doc_num: int, text: str) -> OracleDoc:
    doc_id = f"doc-{doc_num:06d}"
    ordered, score, status = extract_spans(synth_spans(doc_num, text))
    return OracleDoc(doc_id=doc_id, spans=ordered, score=score, status=status)


def extract_all(flat_rows: list[tuple[int, str]]) -> dict[str, OracleDoc]:
    """flat_rows: [(doc_id:int, text)] from documents.parquet.  Docs
    whose text yields no synthesized spans (zero tokens) are excluded —
    the engine's synthesis filters them too (synth.py T >= 1), so the
    Spark docs output has no row for them."""
    out = {}
    for doc_num, text in flat_rows:
        spans = synth_spans(doc_num, text)
        if not spans:
            continue
        ordered, score, status = extract_spans(spans)
        out[f"doc-{doc_num:06d}"] = OracleDoc(
            doc_id=f"doc-{doc_num:06d}", spans=ordered, score=score,
            status=status)
    return out
