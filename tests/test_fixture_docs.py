"""FIXTURES.md §3.2 edge-case documents through the FULL Spark pipeline.

Per-pass semantics are pinned by tests/test_passes.py; these runs prove the
same behavior survives the Arrow boundary and the span interleaving — exact
(offset, kind, text, media_ref) equality vs the pure-Python fold.
"""

import pandas as pd
import pytest

from fast_pdf_parser_spark.operators.pipeline import extract_documents
from fast_pdf_parser_spark.sources.pdf_builder import build_pdf_span
from fast_pdf_parser_spark.sources.synth import SPANS_DDL
from tests.test_pipeline_e2e import golden_sequence


def text_span(text, off):
    return {"kind": "text", "text": text, "media_ref": None, "offset": off}


def media_span(ref, off):
    return {"kind": "media", "text": None, "media_ref": ref, "offset": off}


EDGE_DOCS = [
    {"doc_id": "edge_blank_only_page",
     "spans": [text_span("   \n\t\n  ", 0), text_span("# H\nreal body", 1)]},
    {"doc_id": "edge_blank_before_heading",
     "spans": [text_span("intro text line\n\n# Heading\nbody follows", 0)]},
    {"doc_id": "edge_list_and_code",
     "spans": [text_span("- item one\n1. numbered\n```code fence\n  indented",
                         0)]},
    {"doc_id": "edge_unicode",
     "spans": [text_span("# Ünïcode Tëst\nnaïve — café résumé ß 中文 🎉", 0)]},
    {"doc_id": "edge_oversized_unit",
     "spans": [text_span("word " * 900, 0)]},
    {"doc_id": "edge_pdf_and_media",
     "spans": [media_span("media://a", 0),
               {"kind": "pdf", "text": build_pdf_span(3, 0), "media_ref": None,
                "offset": 1},
               media_span("media://b", 2)]},
    {"doc_id": "edge_pdf_corrupt",
     "spans": [{"kind": "pdf", "text": build_pdf_span(4, 0, corrupt=True),
                "media_ref": None, "offset": 0},
               text_span("# After the corrupt page\ncontent continues here", 1)]},
]


@pytest.mark.parametrize("doc", EDGE_DOCS, ids=lambda d: d["doc_id"])
def test_edge_doc_span_equality(spark, doc):
    df = spark.createDataFrame(pd.DataFrame([doc]), schema=SPANS_DDL)
    got = sorted(
        (r.offset, r.kind, r.text, r.media_ref)
        for r in extract_documents(df).collect()
    )
    assert got == golden_sequence(doc), doc["doc_id"]


def test_corrupt_pdf_counts_failure_but_doc_survives(spark):
    doc = EDGE_DOCS[-1]
    df = spark.createDataFrame(pd.DataFrame([doc]), schema=SPANS_DDL)
    rows = extract_documents(df).collect()
    assert rows, "doc must still produce the text-span chunk"
    assert rows[0].doc_parse_failures == 1
    assert "page 0" in rows[0].doc_error
    assert any("corrupt page" in (r.text or "") for r in rows)
