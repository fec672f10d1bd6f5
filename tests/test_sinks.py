"""Sink tests: docling JSON chunks and observe()-based parser stats."""

import json

import pandas as pd

from fast_pdf_parser_spark.operators.pipeline import extract_documents
from fast_pdf_parser_spark.operators.sinks import (
    docling_chunks,
    observed_extract,
)
from fast_pdf_parser_spark.sources.synth import SPANS_DDL, iter_docs


def _result(spark):
    docs = list(iter_docs(10, seed=11))
    df = spark.createDataFrame(pd.DataFrame(docs), schema=SPANS_DDL)
    return extract_documents(df)


def test_docling_chunk_json(spark):
    out = docling_chunks(_result(spark)).collect()
    assert out
    doc = json.loads(out[0].chunk_json)
    meta = doc["meta"]
    # docling meta fields (src/hierarchical_chunker.cpp:655-677)
    assert meta["schema_name"] == "docling_core.transforms.chunker.DocMeta"
    assert meta["version"] == "1.0.0"
    assert {"start_page", "end_page", "page_count", "chunk_index",
            "total_chunks", "token_count", "has_major_heading",
            "min_heading_level"} <= set(meta)
    assert meta["origin"]["mimetype"] == "application/pdf"
    assert isinstance(meta["origin"]["binary_hash"], int)
    assert doc["text"]

    # chunk_index is 0..n-1 per doc and total_chunks consistent
    per_doc = {}
    for r in out:
        per_doc.setdefault(r.doc_id, []).append(json.loads(r.chunk_json)["meta"])
    for metas in per_doc.values():
        idx = sorted(m["chunk_index"] for m in metas)
        assert idx == list(range(len(metas)))
        assert all(m["total_chunks"] == len(metas) for m in metas)


def test_observe_parser_stats(spark):
    observed, obs = observed_extract(_result(spark))
    n = observed.count()  # any action materializes the metrics
    stats = obs.get
    assert stats["docs_processed"] == 10
    assert stats["chunks_emitted"] <= n
    assert stats["pages_processed"] > 0
    assert stats["bytes_decoded"] > 0
    assert stats["parse_failures"] == 0


def test_iceberg_gate_falls_back_to_parquet(spark, tmp_path):
    from fast_pdf_parser_spark.sources.iceberg import (
        iceberg_available,
        read_documents,
        write_results,
    )

    assert iceberg_available(spark) is False  # no jars in this image
    out = str(tmp_path / "res")
    res = _result(spark)
    write_results(res, out, mode="replace")
    back = read_documents(spark, out)
    assert back.count() == res.count()
