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


def test_chunk_distribution_reference_semantics(spark):
    # hand-computed mirror of analyze_chunk_distribution
    # (src/hierarchical_chunker.cpp:464-533) on a known token-count multiset
    import pandas as pd
    from pyspark.sql import functions as F

    from fast_pdf_parser_spark.operators.sinks import chunk_distribution

    counts = [40, 120, 120, 160, 250, 350, 450, 505, 512, 600]
    pdf = pd.DataFrame({
        "doc_id": [str(i) for i in range(len(counts))],
        "kind": ["chunk"] * len(counts),
        "token_count": counts,
    })
    # plus a media row that must be ignored
    pdf.loc[len(pdf)] = ["m", "media", None]
    df = spark.createDataFrame(
        pdf, schema="doc_id string, kind string, token_count int")
    row = chunk_distribution(df, min_tokens=150).first()

    n = len(counts)
    s = sorted(counts)
    assert row.n_chunks == n
    assert row.min_tokens == 40 and row.max_tokens == 600
    assert row.avg_tokens == sum(counts) // n  # C++ integer division
    # index quintiles: sorted[floor(p*(n-1))] (:480-482)
    for p, col in [(0.2, "p20"), (0.4, "p40"), (0.6, "p60"), (0.8, "p80")]:
        assert getattr(row, col) == s[int(p * (n - 1))], (p, col)
    # the 9 buckets (:498-509)
    assert (row.b1_50, row.b51_100, row.b101_150, row.b151_200,
            row.b201_300, row.b301_400, row.b401_500, row.b501_512,
            row.b513_plus) == (1, 0, 2, 1, 1, 1, 1, 2, 1)
    assert row.below_min == 3  # tokens < 150 (:519-524)


def test_chunk_distribution_empty_input_zero_counts(spark):
    # zero-chunk corpus: counts are 0 (not NULL); min/max/quintiles NULL
    from fast_pdf_parser_spark.operators.sinks import chunk_distribution

    df = spark.createDataFrame(
        [("d", "media", None)],
        schema="doc_id string, kind string, token_count int")
    row = chunk_distribution(df).first()
    assert row.n_chunks == 0 and row.below_min == 0
    assert row.b1_50 == 0 and row.b513_plus == 0
    assert row.min_tokens is None and row.p20 is None
