"""Skew/partitioning tests: salted repartition balances the skewed corpus."""

import pandas as pd
from pyspark.sql import functions as F

from fast_pdf_parser_spark.operators.pipeline import repartition_for_skew
from fast_pdf_parser_spark.sources.synth import SPANS_DDL, iter_docs


def test_salted_repartition_balances_bytes(spark):
    # heavily skewed synthetic docs (1..108 pages)
    docs = list(iter_docs(300, seed=42))
    df = spark.createDataFrame(pd.DataFrame(docs), schema=SPANS_DDL)
    est = F.aggregate(
        F.col("spans"), F.lit(0).cast("bigint"),
        lambda acc, s: acc + F.coalesce(F.octet_length(s["text"]),
                                        F.lit(0)).cast("bigint"),
    )
    n = 8
    parts = (
        repartition_for_skew(df, n)
        .select(F.spark_partition_id().alias("pid"), est.alias("bytes"))
        .groupBy("pid").agg(F.sum("bytes").alias("b"), F.count("*").alias("docs"))
        .collect()
    )
    assert len(parts) == n
    sizes = [r.b for r in parts]
    # statistically uniform: no partition more than 3x the mean
    mean = sum(sizes) / len(sizes)
    assert max(sizes) <= 3 * mean, sizes
    # every partition non-empty
    assert min(r.docs for r in parts) > 0


def test_bucket_estimate_uses_fast_token_estimate():
    # A2 fast path is for sizing only (SURVEY.md §4: never for boundaries)
    from fast_pdf_parser_spark.functions.tokenizer import estimate_tokens

    assert estimate_tokens("x" * 400) == 100
