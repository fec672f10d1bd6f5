"""Structured-Streaming ingest test: files land, micro-batches extract,
results match the batch pipeline exactly."""

import os

import pandas as pd

from fast_pdf_parser_spark.operators.pipeline import extract_documents
from fast_pdf_parser_spark.sources.synth import SPANS_DDL, iter_docs
from fast_pdf_parser_spark.streaming.ingest import stream_extract


def test_stream_extract_matches_batch(spark, tmp_path):
    docs = list(iter_docs(12, seed=5))
    in_dir = str(tmp_path / "landing")
    out_dir = str(tmp_path / "out")
    os.makedirs(in_dir)

    # two "arrivals"
    for i, part in enumerate([docs[:7], docs[7:]]):
        spark.createDataFrame(pd.DataFrame(part), schema=SPANS_DDL) \
            .coalesce(1).write.mode("overwrite") \
            .parquet(os.path.join(in_dir, f"arrival={i}"))

    q = stream_extract(spark, in_dir + "/*", out_dir, max_files_per_trigger=1)
    q.awaitTermination(120)

    streamed = spark.read.parquet(os.path.join(out_dir, "spans"))
    batch = extract_documents(
        spark.createDataFrame(pd.DataFrame(docs), schema=SPANS_DDL)
    )
    key = ["doc_id", "offset", "kind", "text", "media_ref"]
    a = sorted(tuple(r) for r in streamed.select(*key).collect())
    b = sorted(tuple(r) for r in batch.select(*key).collect())
    assert a == b
    assert streamed.select("doc_id").distinct().count() == len(docs)
