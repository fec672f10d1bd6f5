"""Output sinks: docling-format JSON chunks and parquet result tables.

Replicates the reference's JSON chunk sink ``process_pdf_to_json``
(src/hierarchical_chunker.cpp:636-691): each chunk carries docling meta
(schema_name/version, page range, chunk_index/total_chunks, token_count,
heading flags) and an origin struct (mimetype, binary_hash, filename/doc_id).
Differences by design (SURVEY.md §3.2, §7 non-goals):

- the reference re-parses the whole PDF a second time to write JSON (:638);
  we serialize the already-computed DataFrame — same output, half the work;
- ``binary_hash`` uses the portable 60-bit md5 hash instead of
  ``std::hash`` (platform-dependent, SURVEY.md §7).

All serialization is built-in (``to_json`` over nested structs) — JVM-side,
no Python in the sink path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def docling_chunks(result: DataFrame) -> DataFrame:
    """Pipeline output rows → one docling-JSON text row per chunk.

    chunk_index/total_chunks are per-document over chunk rows in output
    order (src/hierarchical_chunker.cpp:649-661).
    """
    chunks = result.filter(F.col("kind") == "chunk")
    w = Window.partitionBy("doc_id").orderBy("offset")
    indexed = chunks.withColumn(
        "chunk_index", F.row_number().over(w) - 1
    ).withColumn(
        "total_chunks",
        F.count("*").over(Window.partitionBy("doc_id")),
    )

    meta = F.struct(
        F.lit("docling_core.transforms.chunker.DocMeta").alias("schema_name"),
        F.lit("1.0.0").alias("version"),
        F.col("start_page"),
        F.col("end_page"),
        (F.col("end_page") - F.col("start_page") + 1).alias("page_count"),
        F.col("chunk_index"),
        F.col("total_chunks").cast("int").alias("total_chunks"),
        F.col("token_count"),
        F.col("has_major_heading"),
        F.col("min_heading_level"),
        F.struct(
            F.lit("application/pdf").alias("mimetype"),
            F.conv(F.substring(F.md5(F.col("doc_id")), 1, 15), 16, 10)
            .cast("bigint").alias("binary_hash"),
            F.col("doc_id").alias("filename"),
            F.lit(None).cast("string").alias("uri"),
        ).alias("origin"),
    )
    return indexed.select(
        "doc_id",
        "chunk_index",
        F.to_json(F.struct(F.col("text"), meta.alias("meta"))).alias("chunk_json"),
    )


def write_results(result: DataFrame, out_dir: str, fmt: str = "parquet") -> None:
    """Durable result write. Parquet by default; 'json' emits the docling
    chunk documents (S6)."""
    if fmt == "json":
        docling_chunks(result).write.mode("overwrite").json(out_dir)
    else:
        result.write.mode("overwrite").parquet(out_dir)


def observed_extract(result: DataFrame):
    """A4 global parser stats via df.observe (src/fast_pdf_parser.cpp:161-175
    analogue): docs/pages/chunks/bytes/failures accumulated by the JVM during
    whatever action consumes the returned DataFrame. Returns (df, observation)
    — read ``observation.get`` after an action completes."""
    from pyspark.sql import Observation

    obs = Observation("parser_stats")
    # observed metrics forbid DISTINCT aggregates; every doc with output has
    # exactly one offset==0 row, so count those
    observed = result.observe(
        obs,
        F.sum(F.when(F.col("offset") == 0, 1).otherwise(0))
        .alias("docs_processed"),
        F.sum(F.when(F.col("offset") == 0, F.col("doc_total_pages"))
              .otherwise(0)).alias("pages_processed"),
        F.sum(F.when(F.col("kind") == "chunk", 1).otherwise(0))
        .alias("chunks_emitted"),
        F.sum(F.when(F.col("offset") == 0, F.col("doc_bytes_decoded"))
              .otherwise(0)).alias("bytes_decoded"),
        F.sum(F.when(F.col("offset") == 0, F.col("doc_parse_failures"))
              .otherwise(0)).alias("parse_failures"),
    )
    return observed, obs
