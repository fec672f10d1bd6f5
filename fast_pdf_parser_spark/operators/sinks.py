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


def chunk_distribution(result: DataFrame, min_tokens: int = 150) -> DataFrame:
    """The reference's full distribution report as ONE row
    (src/hierarchical_chunker.cpp:464-533): count/min/max/avg, index
    quintiles p20/40/60/80 (``sorted[floor(p*(n-1))]``, :480-482), the 9
    token-range buckets (:498-509), and the below-minimum count (:519-524).

    Scale shape: token counts are bounded by ~1.1*max_tokens, so instead of
    globally sorting 1e12 chunk rows the quintiles come from a VALUE
    HISTOGRAM — groupBy(token_count) (bounded distinct values) + cumulative
    sums over that tiny table. One shuffle of at most a few hundred rows
    after the map-side combine, whatever the corpus size.
    """
    counts = result.filter(F.col("kind") == "chunk").select("token_count")
    hist = counts.groupBy("token_count").agg(F.count("*").alias("cnt"))

    wcum = Window.orderBy("token_count").rowsBetween(
        Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("cnt").over(wcum))
    total = cum.agg(F.sum("cnt").alias("n"))
    joined = cum.crossJoin(F.broadcast(total))

    def quintile(p: float):
        # sorted[idx], idx = floor(p*(n-1)): the smallest value whose
        # cumulative count exceeds idx (hierarchical_chunker.cpp:480-482)
        idx = F.floor(F.lit(p) * (F.col("n") - 1))
        return F.min(
            F.when(F.col("cum") >= idx + 1, F.col("token_count")))

    def bucket(lo: int, hi: int | None):
        cond = F.col("token_count") >= lo if hi is None else (
            (F.col("token_count") >= lo) & (F.col("token_count") <= hi))
        # coalesce: a zero-chunk corpus must report 0 counts (the reference
        # prints "No chunks to analyze"; NULL counts would break consumers),
        # while min/max/quintiles stay legitimately NULL
        return F.coalesce(
            F.sum(F.when(cond, F.col("cnt")).otherwise(0)), F.lit(0)
        ).cast("bigint")

    return joined.agg(
        F.coalesce(F.first("n"), F.lit(0)).cast("bigint").alias("n_chunks"),
        F.min("token_count").alias("min_tokens"),
        F.max("token_count").alias("max_tokens"),
        # int sum / int n, truncating like the C++ integer division (:489)
        F.floor(F.sum(F.col("token_count") * F.col("cnt")) / F.first("n"))
        .cast("bigint").alias("avg_tokens"),
        quintile(0.2).alias("p20"),
        quintile(0.4).alias("p40"),
        quintile(0.6).alias("p60"),
        quintile(0.8).alias("p80"),
        bucket(0, 50).alias("b1_50"),
        bucket(51, 100).alias("b51_100"),
        bucket(101, 150).alias("b101_150"),
        bucket(151, 200).alias("b151_200"),
        bucket(201, 300).alias("b201_300"),
        bucket(301, 400).alias("b301_400"),
        bucket(401, 500).alias("b401_500"),
        bucket(501, 512).alias("b501_512"),
        bucket(513, None).alias("b513_plus"),
        F.coalesce(
            F.sum(F.when(F.col("token_count") < min_tokens, F.col("cnt"))
                  .otherwise(0)), F.lit(0)
        ).cast("bigint").alias("below_min"),
    )


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
