"""Similarity search over an embedding column (array<float>).

Three tiers, all expressed with built-in functions (no Python in the hot
path):

- ``brute_force_topk`` — exact cosine top-k; the query side is broadcast
  (BroadcastNestedLoopJoin), the corpus streams. Baseline and the verifier
  for the approximate tiers. O(|queries| x |corpus|).
- ``lsh_topk`` — coordinate-hyperplane sign buckets (operators/relational.py
  ann_lsh_topk is the SQL twin): candidate generation becomes an equi-join.
- ``ivf_topk`` — IVF with a KMeans coarse quantizer (pyspark.ml): corpus
  vectors are assigned to cells once; a query probes its ``n_probe``
  nearest cells only, so the scan cost drops by ~n_cells/n_probe. The cell
  assignment is the 1e9-vector scale path: the expensive join is an
  equi-join on cell id, and the centroid table (k x dim floats) broadcasts.

Cosine is computed with ``zip_with`` + ``aggregate`` in whole-stage-codegen
territory; scores are rounded to 6dp and ties broken by id so results are
deterministic across partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _cos(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"), lambda acc, x: acc + x,
    )
    norm_a = F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0).cast("double"), lambda acc, x: acc + x))
    norm_b = F.sqrt(F.aggregate(
        F.transform(b, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0).cast("double"), lambda acc, x: acc + x))
    return F.round(dot / (norm_a * norm_b), 6)


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int").alias("rank"),
                "neighbor_id", "cos")
    )


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 10) -> DataFrame:
    """corpus(vec_id, embedding), queries(query_id, embedding) → top-k rows.

    The small query side is broadcast explicitly — the right plan at any
    corpus size.
    """
    q = F.broadcast(queries.select(
        F.col("query_id"), F.col("embedding").alias("qe")))
    c = corpus.select(F.col("vec_id").alias("neighbor_id"),
                      F.col("embedding").alias("ce"))
    scored = c.crossJoin(q).select(
        "query_id", "neighbor_id", _cos(F.col("qe"), F.col("ce")).alias("cos")
    )
    return _rank_topk(scored, k)


def sign_bucket(col, bits: int = 8):
    """Coordinate-hyperplane LSH key: sign bits of the first ``bits`` dims."""
    return F.concat(*[
        F.when(F.element_at(col, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(bits)
    ])


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             bits: int = 8) -> DataFrame:
    """Bucketed ANN: candidates share the query's sign bucket (equi-join)."""
    q = queries.select("query_id", F.col("embedding").alias("qe"),
                       sign_bucket(F.col("embedding"), bits).alias("bucket"))
    c = corpus.select(F.col("vec_id").alias("neighbor_id"),
                      F.col("embedding").alias("ce"),
                      sign_bucket(F.col("embedding"), bits).alias("bucket"))
    scored = c.join(F.broadcast(q), "bucket").select(
        "query_id", "neighbor_id", _cos(F.col("qe"), F.col("ce")).alias("cos")
    )
    return _rank_topk(scored, k)


def fit_ivf_cells(corpus: DataFrame, n_cells: int = 16, seed: int = 42):
    """KMeans coarse quantizer: returns (assigned corpus, centroid rows).

    At 1e9 vectors you fit on a sample and transform the full corpus — both
    are single passes; the centroid table is tiny and broadcastable.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    vecs = corpus.withColumn(
        "features", array_to_vector(F.col("embedding").cast("array<double>"))
    )
    model = KMeans(k=n_cells, seed=seed, featuresCol="features",
                   predictionCol="cell").fit(vecs)
    assigned = model.transform(vecs).select(
        "vec_id", "embedding", F.col("cell").cast("int").alias("cell")
    )
    centers = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    centroids = corpus.sparkSession.createDataFrame(
        centers, schema="cell int, centroid array<double>"
    )
    _ = vector_to_array  # imported for parity with array_to_vector; unused
    return assigned, centroids


def ivf_topk(assigned: DataFrame, centroids: DataFrame, queries: DataFrame,
             k: int = 10, n_probe: int = 4) -> DataFrame:
    """IVF search: probe the n_probe nearest cells per query only."""
    q = queries.select("query_id", F.col("embedding").alias("qe"))
    # rank cells per query by centroid cosine (centroid table is tiny)
    qc = q.crossJoin(F.broadcast(centroids)).select(
        "query_id", "qe", "cell",
        _cos(F.col("qe"), F.col("centroid")).alias("cell_cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cell_cos").desc(), F.col("cell").asc())
    probes = (qc.withColumn("cell_rank", F.row_number().over(w))
              .filter(F.col("cell_rank") <= n_probe)
              .select("query_id", "qe", "cell"))
    c = assigned.select(F.col("vec_id").alias("neighbor_id"),
                        F.col("embedding").alias("ce"), "cell")
    scored = c.join(F.broadcast(probes), "cell").select(
        "query_id", "neighbor_id", _cos(F.col("qe"), F.col("ce")).alias("cos")
    )
    return _rank_topk(scored, k)


def recall_at_k(approx: DataFrame, exact: DataFrame, k: int = 10) -> float:
    """Fraction of exact top-k pairs the approximate result found."""
    a = approx.filter(F.col("rank") <= k).select("query_id", "neighbor_id")
    e = exact.filter(F.col("rank") <= k).select("query_id", "neighbor_id")
    hit = a.join(e, ["query_id", "neighbor_id"]).count()
    total = e.count()
    return hit / total if total else 1.0
