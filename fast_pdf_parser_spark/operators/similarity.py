"""Similarity search over an embedding column (array<float>).

Three tiers, all expressed with built-in functions (no Python in the hot
path):

- ``brute_force_topk`` — exact cosine top-k; the query side is broadcast
  (BroadcastNestedLoopJoin), the corpus streams. Baseline and the verifier
  for the approximate tiers. O(|queries| x |corpus|).
- ``lsh_topk`` — banded random-hyperplane LSH (operators/relational.py
  ann_lsh_topk is the SQL twin): B independent bands of sign bits over
  sparse ±1 hyperplanes; candidate generation is an equi-join on
  (band, band_key) with a mega-bucket cap, so the within-bucket pairing
  stays bounded no matter how skewed the corpus is. A single fixed key
  (the round-1 design) caps the bucket count and goes quadratic at 1e9
  vectors; banding + the cap is the same shape dedup_lsh_pairs uses.
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

import hashlib

from pyspark.sql import DataFrame, Window, functions as F

# Banded random-hyperplane LSH parameters (shared with the SQL twins in
# operators/relational.py so the DataFrame and SQL paths bucket identically).
LSH_BANDS = 6
LSH_BITS = 12
LSH_TERMS = 8
LSH_BUCKET_CAP = 100
EMB_DIM = 64


def hyperplane_terms(band: int, bit: int, dim: int = EMB_DIM,
                     n_terms: int = LSH_TERMS) -> list[tuple[int, int]]:
    """Deterministic sparse ±1 hyperplane for (band, bit): ``n_terms``
    distinct 1-based dims with signs, derived from md5 so the Spark and
    DuckDB SQL twins embed byte-identical literal expressions.

    Sparse sign projections (Achlioptas-style) keep the unrolled SQL small
    while preserving the sign-LSH collision geometry.
    """
    terms: list[tuple[int, int]] = []
    used: set[int] = set()
    k = 0
    while len(terms) < n_terms:
        h = hashlib.md5(f"hp:{band}:{bit}:{k}".encode("ascii")).digest()
        k += 1
        d = 1 + int.from_bytes(h[:4], "big") % dim
        if d in used:
            continue
        used.add(d)
        terms.append((d, 1 if h[4] % 2 == 0 else -1))
    return terms


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


def band_key(col, band: int, bits: int = LSH_BITS):
    """One band's LSH key: ``bits`` sign bits of sparse ±1 hyperplane
    projections (hyperplane_terms picks the dims deterministically)."""
    bit_cols = []
    for bit in range(bits):
        proj = F.lit(0.0).cast("double")
        for d, sign in hyperplane_terms(band, bit):
            term = F.element_at(col, d).cast("double")
            proj = (proj + term) if sign > 0 else (proj - term)
        bit_cols.append(
            F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bit_cols)


def banded_keys(df: DataFrame, id_col: str, emb_col: str,
                n_bands: int = LSH_BANDS, bits: int = LSH_BITS) -> DataFrame:
    """(id, embedding) → one row per (id, band, band_key): the LSH index
    rows. Linear in |df| — a projection plus a ``bits``-way explode of
    per-row computed keys, no shuffle."""
    entries = F.array(*[
        F.struct(F.lit(b).cast("int").alias("band"),
                 band_key(F.col(emb_col), b, bits).alias("band_key"))
        for b in range(n_bands)
    ])
    return (
        df.select(id_col, emb_col, F.explode(entries).alias("bk"))
        .select(id_col, emb_col, F.col("bk.band").alias("band"),
                F.col("bk.band_key").alias("band_key"))
    )


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             n_bands: int = LSH_BANDS, bits: int = LSH_BITS,
             bucket_cap: int = LSH_BUCKET_CAP) -> DataFrame:
    """Banded ANN: candidates share any of the query's band keys.

    The equi-join runs on (band, band_key); corpus buckets larger than
    ``bucket_cap`` are skipped first (a bucket that popular is degenerate
    geometry, and pairing inside it is quadratic — same rule as
    relational.py dedup_lsh_pairs), so per-bucket work is O(cap) however
    skewed the corpus.
    """
    cb = banded_keys(
        corpus.select(F.col("vec_id").alias("neighbor_id"),
                      F.col("embedding").alias("ce")),
        "neighbor_id", "ce", n_bands, bits)
    qb = banded_keys(queries.select("query_id",
                                    F.col("embedding").alias("qe")),
                     "query_id", "qe", n_bands, bits)
    small = (cb.groupBy("band", "band_key")
             .agg(F.count("*").alias("n"))
             .filter(F.col("n") <= bucket_cap)
             .select("band", "band_key"))
    capped = cb.join(small, ["band", "band_key"])
    cand = (capped.join(F.broadcast(qb), ["band", "band_key"])
            .select("query_id", "qe", "neighbor_id", "ce")
            .dropDuplicates(["query_id", "neighbor_id"]))
    scored = cand.select(
        "query_id", "neighbor_id", _cos(F.col("qe"), F.col("ce")).alias("cos")
    )
    return _rank_topk(scored, k)


def ivf_fit_input(corpus: DataFrame, fit_max_rows: int = 100_000,
                  seed: int = 42) -> DataFrame:
    """Bounded KMeans fit input: the full corpus when small, else a
    ``sample(fraction)`` targeting ``fit_max_rows`` rows. KMeans iterates
    over its fit input several times — at 1e9 vectors that must be a
    sample, never the corpus."""
    n = corpus.count()
    if n <= fit_max_rows:
        return corpus
    return corpus.sample(fraction=fit_max_rows / n, seed=seed)


def _with_features(df: DataFrame) -> DataFrame:
    from pyspark.ml.functions import array_to_vector

    return df.withColumn(
        "features", array_to_vector(F.col("embedding").cast("array<double>"))
    )


def fit_ivf_cells(corpus: DataFrame, n_cells: int = 16, seed: int = 42,
                  fit_max_rows: int = 100_000):
    """KMeans coarse quantizer: returns (assigned corpus, centroid rows).

    The multi-pass KMeans fit runs on a bounded sample (ivf_fit_input);
    the single-pass transform assigns the FULL corpus. The centroid table
    is tiny and broadcastable.
    """
    from pyspark.ml.clustering import KMeans

    model = KMeans(k=n_cells, seed=seed, featuresCol="features",
                   predictionCol="cell").fit(
        _with_features(ivf_fit_input(corpus, fit_max_rows, seed)))
    assigned = model.transform(_with_features(corpus)).select(
        "vec_id", "embedding", F.col("cell").cast("int").alias("cell")
    )
    centers = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    centroids = corpus.sparkSession.createDataFrame(
        centers, schema="cell int, centroid array<double>"
    )
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


# Deterministic coarse quantizer: GRID_BITS hyperplane sign bits = the cell
# id (2^GRID_BITS cells). Same IVF *search* pattern as the KMeans tier —
# probe a handful of cells, equi-join on cell id — but the quantizer is a
# closed-form expression, so the whole query is SQL-expressible and gets a
# DuckDB oracle (relational.py ann_ivf_grid); the KMeans tier stays the
# data-adaptive variant. GRID_BAND is a hyperplane band index reserved for
# the grid (the LSH tiers use bands 0..LSH_BANDS-1).
GRID_BITS = 4
GRID_BAND = LSH_BANDS


def grid_cell(col, bits: int = GRID_BITS):
    """The grid-quantizer cell id of an embedding column: ``bits`` sign
    bits over hyperplane_terms(GRID_BAND, bit)."""
    bit_cols = []
    for bit in range(bits):
        proj = F.lit(0.0).cast("double")
        for d, sign in hyperplane_terms(GRID_BAND, bit):
            term = F.element_at(col, d).cast("double")
            proj = (proj + term) if sign > 0 else (proj - term)
        bit_cols.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bit_cols)


def ivf_grid_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                  bits: int = GRID_BITS) -> DataFrame:
    """Grid-IVF search: each query probes its own cell plus the ``bits``
    cells at Hamming distance 1 (multi-probe — sign bits near a hyperplane
    are the ones most likely to flip for a true neighbor), so the scan
    covers (bits+1)/2^bits of the corpus. Candidate generation is an
    equi-join on cell id; exact cosine verifies."""
    c = corpus.select(F.col("vec_id").alias("neighbor_id"),
                      F.col("embedding").alias("ce"),
                      grid_cell(F.col("embedding"), bits).alias("cell"))
    cell0 = grid_cell(F.col("embedding"), bits)
    flips = [
        F.concat(F.substring(F.col("cell0"), 1, i),
                 F.when(F.substring(F.col("cell0"), i + 1, 1) == "1",
                        F.lit("0")).otherwise(F.lit("1")),
                 F.substring(F.col("cell0"), i + 2, bits - i - 1))
        for i in range(bits)
    ]
    probes = (
        queries.select("query_id", F.col("embedding").alias("qe"),
                       cell0.alias("cell0"))
        .select("query_id", "qe",
                F.explode(F.array(F.col("cell0"), *flips)).alias("cell"))
    )
    # a corpus vector lives in exactly one cell and the probe list has no
    # duplicates, so the join yields each (query, neighbor) pair at most once
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
