"""Output serializers (SURVEY §2.9 X7, §2.8 N5) — the Spark analog of
the reference's per-page ALTO XML / PAGE XML / plain-text artifacts
(/root/reference/processing_client/run_client.py:204-222, zip member
naming /root/reference/app/main/routes.py:252-254).

All three are pure JVM-side string assembly over the ordered span rows:
collect_list(struct(order, ...)) → array_sort → transform/format_string
→ array_join.  No UDFs; exact-match testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ordered_texts(col_struct):
    return F.transform(F.array_sort(col_struct), lambda s: s["text"])


def serialize_txt(spans: DataFrame) -> DataFrame:
    """(doc_id, order, text, ...) → (doc_id, txt): newline-joined text in
    reading order (run_client.py:70-74)."""
    return spans.groupBy("doc_id").agg(
        F.array_join(
            _ordered_texts(F.collect_list(F.struct("order", "text"))), "\n"
        ).alias("txt")
    )


def serialize_artifacts(spans: DataFrame) -> DataFrame:
    """Per-doc 3-format fan-out: txt + ALTO-like + PAGE-like XML strings,
    with artifact names '{doc}_alto.xml' / '{doc}_page.xml' / '{doc}.txt'
    (routes.py:252-254).  The XML shapes are simplified but deterministic
    line-per-span documents in reading order."""
    lines = F.array_sort(
        F.collect_list(F.struct("order", "kind", "text", "media_ref"))
    )
    alto_body = F.array_join(
        F.transform(
            lines,
            lambda s: F.format_string(
                '    <TextLine ID="l%d"><String CONTENT="%s"/></TextLine>',
                s["order"],
                s["text"],
            ),
        ),
        "\n",
    )
    page_body = F.array_join(
        F.transform(
            lines,
            lambda s: F.format_string(
                '    <TextLine id="l%d" kind="%s"><Unicode>%s</Unicode></TextLine>',
                s["order"],
                s["kind"],
                s["text"],
            ),
        ),
        "\n",
    )
    txt_body = F.array_join(F.transform(lines, lambda s: s["text"]), "\n")
    out = spans.groupBy("doc_id").agg(
        alto_body.alias("alto_lines"),
        page_body.alias("page_lines"),
        txt_body.alias("txt"),
    )
    return out.select(
        "doc_id",
        F.format_string("%s_alto.xml", "doc_id").alias("alto_name"),
        F.concat(
            F.format_string('<alto><Layout><Page ID="%s">\n', "doc_id"),
            F.col("alto_lines"),
            F.lit("\n</Page></Layout></alto>"),
        ).alias("alto_xml"),
        F.format_string("%s_page.xml", "doc_id").alias("page_name"),
        F.concat(
            F.format_string('<PcGts><Page imageFilename="%s">\n', "doc_id"),
            F.col("page_lines"),
            F.lit("\n</Page></PcGts>"),
        ).alias("page_xml"),
        F.format_string("%s.txt", "doc_id").alias("txt_name"),
        "txt",
    )
