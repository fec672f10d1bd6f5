"""Similarity-search tests: brute-force baseline, LSH and IVF scale paths,
recall against the exact answer, plan shape."""

import pytest
from pyspark.sql import functions as F

from fast_pdf_parser_spark.operators.similarity import (
    brute_force_topk,
    fit_ivf_cells,
    ivf_topk,
    lsh_topk,
    recall_at_k,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet")
    corpus = df.filter("vec_id >= 10")
    queries = df.filter("vec_id < 10").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return corpus, queries


def test_brute_force_topk_exact_and_deterministic(spark, emb):
    corpus, queries = emb
    out = brute_force_topk(corpus, queries, k=5)
    rows = out.collect()
    assert len(rows) == queries.count() * 5
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append((r.rank, r.cos))
    for ranks in per_q.values():
        ranks.sort()
        assert [r for r, _ in ranks] == [1, 2, 3, 4, 5]
        coss = [c for _, c in ranks]
        assert coss == sorted(coss, reverse=True)
    # deterministic across repartitionings
    again = brute_force_topk(corpus.repartition(7), queries, k=5).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # plan: query side broadcast
    plan = brute_force_topk(corpus, queries, 5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan


def test_lsh_topk_subset_of_bucket(spark, emb):
    corpus, queries = emb
    out = lsh_topk(corpus, queries, k=5, bits=4)
    # every returned neighbor shares the query's 4-bit sign bucket
    from fast_pdf_parser_spark.operators.similarity import sign_bucket

    qb = {r.query_id: r.b for r in queries.select(
        "query_id", sign_bucket(F.col("embedding"), 4).alias("b")).collect()}
    cb = {r.vec_id: r.b for r in corpus.select(
        "vec_id", sign_bucket(F.col("embedding"), 4).alias("b")).collect()}
    for r in out.collect():
        assert cb[r.neighbor_id] == qb[r.query_id]


def test_ivf_recall_beats_probe_fraction(spark, emb):
    corpus, queries = emb
    exact = brute_force_topk(corpus, queries, k=10)
    assigned, centroids = fit_ivf_cells(corpus, n_cells=8, seed=42)
    assert centroids.count() == 8
    approx = ivf_topk(assigned, centroids, queries, k=10, n_probe=4)
    r = recall_at_k(approx, exact, k=10)
    # probing half the cells of random-ish data must recover well over the
    # naive expectation; and probing all cells must be exact
    assert r >= 0.4, r
    full = ivf_topk(assigned, centroids, queries, k=10, n_probe=8)
    assert recall_at_k(full, exact, k=10) == 1.0
