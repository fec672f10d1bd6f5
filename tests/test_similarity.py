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


def test_lsh_topk_candidates_share_a_band(spark, emb):
    corpus, queries = emb
    out = lsh_topk(corpus, queries, k=5)
    # every returned neighbor shares at least one band key with its query
    from fast_pdf_parser_spark.operators.similarity import banded_keys

    qb = {}
    for r in banded_keys(queries, "query_id", "embedding").collect():
        qb.setdefault(r.query_id, set()).add((r.band, r.band_key))
    cb = {}
    for r in banded_keys(corpus, "vec_id", "embedding").collect():
        cb.setdefault(r.vec_id, set()).add((r.band, r.band_key))
    rows = out.collect()
    assert rows, "banded LSH returned no candidates on clustered data"
    for r in rows:
        assert cb[r.neighbor_id] & qb[r.query_id]


def test_lsh_finds_planted_near_duplicates(spark):
    # sign-LSH's contract is NEAR-duplicates (cos ≈ 1), not weak neighbors:
    # plant queries that are tiny perturbations of corpus vectors and require
    # the banding to recover most planted pairs as rank-1 hits.
    dim, n = 64, 200

    def vec(i):
        return [float(((i * 31 + j * 17) % 19) - 9) for j in range(dim)]

    corpus = spark.createDataFrame(
        [(i, vec(i)) for i in range(n)],
        schema="vec_id bigint, embedding array<float>")
    queries = spark.createDataFrame(
        [(i, [x + 0.01 * ((i + j) % 3 - 1) for j, x in enumerate(vec(i))])
         for i in range(20)],
        schema="query_id bigint, embedding array<float>")
    out = lsh_topk(corpus, queries, k=1).collect()
    hits = sum(1 for r in out
               if r.rank == 1 and r.neighbor_id == r.query_id)
    assert hits >= 16, f"only {hits}/20 planted near-dups recovered"


def test_lsh_bucket_cap_bounds_skew(spark):
    # a pathological corpus: 150 identical vectors (they collide in EVERY
    # band) + a few distinct ones. With bucket_cap=50 the identical block's
    # buckets are skipped, so no surviving bucket exceeds the cap and the
    # within-bucket pairing stays bounded — the 100-TB skew guarantee.
    from fast_pdf_parser_spark.operators.similarity import (
        LSH_BANDS, banded_keys, lsh_topk as lsh,
    )

    dim = 64
    same = [1.0] * dim
    rows = [(i, same) for i in range(150)]
    rows += [(200 + i, [float((i * 7 + j * 3) % 13 - 6) for j in range(dim)])
             for i in range(20)]
    corpus = spark.createDataFrame(
        rows, schema="vec_id bigint, embedding array<float>")
    cap = 50
    cb = banded_keys(corpus.selectExpr("vec_id AS neighbor_id",
                                       "embedding AS ce"),
                     "neighbor_id", "ce")
    surviving = (cb.groupBy("band", "band_key").count()
                 .filter(F.col("count") <= cap))
    # the identical block exceeded the cap in every band → filtered out
    assert surviving.agg(F.max("count")).first()[0] <= cap
    # and lsh_topk with that cap returns no member of the identical block
    # as a candidate for an identical-vector query
    queries = spark.createDataFrame(
        [(0, same)], schema="query_id bigint, embedding array<float>")
    out = lsh(corpus, queries, k=5, bucket_cap=cap).collect()
    assert all(r.neighbor_id >= 200 for r in out)


def test_ivf_fit_runs_on_sample_transform_on_full(spark, emb, monkeypatch):
    # KMeans iterates over its fit input; at 1e9 vectors that must be a
    # bounded sample while transform covers the full corpus. Spy on
    # KMeans.fit to pin what actually reaches it.
    from pyspark.ml.clustering import KMeans

    corpus, _ = emb
    n = corpus.count()
    cap = max(8, n // 3)
    seen = {}
    orig_fit = KMeans.fit

    def spy(self, dataset, *a, **kw):
        seen["rows"] = dataset.count()
        return orig_fit(self, dataset, *a, **kw)

    monkeypatch.setattr(KMeans, "fit", spy)
    assigned, centroids = fit_ivf_cells(corpus, n_cells=4, seed=42,
                                        fit_max_rows=cap)
    # sample(fraction) is binomial — allow slack, but it must be a real
    # subset, and the transform side must still cover every vector
    assert 4 <= seen["rows"] < n
    assert assigned.count() == n
    assert centroids.count() == 4
    # small corpora skip sampling entirely
    fit_ivf_cells(corpus, n_cells=4, seed=42, fit_max_rows=n)
    assert seen["rows"] == n


def test_ivf_grid_matches_sql_twin_and_recall(spark, emb):
    # the DataFrame grid-IVF and the relational.py Spark-SQL twin must be
    # row-identical (same quantizer geometry by construction), and probing
    # 5/16 cells must beat the naive probe fraction on recall
    from fast_pdf_parser_spark.operators.relational import spark_sql
    from fast_pdf_parser_spark.operators.similarity import ivf_grid_topk

    df = spark.read.parquet(f"{SF}/embeddings.parquet")
    corpus = df.filter("vec_id >= 5")
    queries = df.filter("vec_id < 5").select(
        F.col("vec_id").alias("query_id"), "embedding")
    got = ivf_grid_topk(corpus, queries, k=10).drop("cos")
    df.createOrReplaceTempView("embeddings")
    want = spark.sql(spark_sql("ann_ivf_grid"))
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))
    exact = brute_force_topk(corpus, queries, k=10)
    r = recall_at_k(got.withColumn("rank", F.col("rank")), exact, k=10)
    assert r > 5 / 16, r


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


def test_recall_report_planted_structure_vs_noise(spark):
    """ann_recall_report (the driver-visible quality row) must (a) show
    LSH recovering planted near-duplicates when real similarity structure
    exists, and (b) report the honest zero on the noise corpus, where a
    12-bit sign-key collision almost never happens (relational.py comment
    above the query)."""
    from fast_pdf_parser_spark.operators.relational import spark_sql

    # (a) planted: query i (vec_id i < 5) is a tiny perturbation of corpus
    # vector vec_id = 100 + i -> exact rank-1 neighbor AND same LSH bucket
    dim = 64

    def vec(i):
        return [float(((i * 31 + j * 17) % 19) - 9) for j in range(dim)]

    rows = [(100 + i, vec(i)) for i in range(200)]  # corpus >= 5
    rows += [(i, [x + 0.01 * ((i + j) % 3 - 1)
                  for j, x in enumerate(vec(i))]) for i in range(5)]
    spark.createDataFrame(
        rows, schema="vec_id bigint, embedding array<float>"
    ).createOrReplaceTempView("embeddings")
    rep = {(r.tier, r.query_id): r.hits
           for r in spark.sql(spark_sql("ann_recall_report")).collect()}
    lsh_hits = sum(v for (t, _), v in rep.items() if t == "lsh")
    assert lsh_hits >= 4, rep  # planted rank-1 neighbor found per query

    # (b) noise (driver corpus): lsh 0, grid recovers a multi-probe share,
    # int8 quantization preserves the exact top-10 (its error is tiny
    # relative to the cosine gaps even on noise)
    spark.read.parquet(f"{SF}/embeddings.parquet") \
        .createOrReplaceTempView("embeddings")
    rep = [(r.tier, r.query_id, r.hits, r.k)
           for r in spark.sql(spark_sql("ann_recall_report")).collect()]
    assert len(rep) == 25  # 5 tiers x 5 queries
    assert all(h == 0 for t, _, h, _ in rep if t == "lsh")
    grid = [h for t, _, h, _ in rep if t == "grid"]
    assert sum(grid) > 0 and all(h <= 10 for h in grid)
    int8 = [h for t, _, h, _ in rep if t == "int8"]
    assert len(int8) == 5 and all(h >= 8 for h in int8), rep
    # ivf_int8 = the grid probe structure over dequantized-int8 vectors:
    # same probe misses as grid, plus (tiny) quantization error on top
    ivf8 = [h for t, _, h, _ in rep if t == "ivf_int8"]
    assert len(ivf8) == 5 and sum(ivf8) > 0 and all(h <= 10 for h in ivf8)
    # semdedup = survival of the exact top-10 after cell-centroid
    # semantic dedup: most neighbors are kept (the tier removes near-
    # centroid redundancy, not the whole cell), but it must remove
    # SOMETHING on this corpus (threshold tuned so near-groups exist)
    sem = [h for t, _, h, _ in rep if t == "semdedup"]
    assert len(sem) == 5 and all(h <= 10 for h in sem), rep
    assert sum(sem) >= 30, rep  # most of the top-10 survives


def test_semdedup_keeps_one_representative_per_near_group(spark):
    """dedup_semantic_cells semantics: within every cell, vectors at or
    above the cos-to-centroid threshold form ONE near-group of which
    exactly one survives (the highest-cos, vec_id tiebreak); everything
    below threshold is kept untouched; and on the driver corpus the tier
    actually removes something (threshold is tuned to make the operator
    exercise, not vacuously pass)."""
    from fast_pdf_parser_spark.operators.relational import (
        SEMDEDUP_THRESHOLD_X1E4,
        spark_sql,
    )

    spark.read.parquet(f"{SF}/embeddings.parquet") \
        .createOrReplaceTempView("embeddings")
    rows = spark.sql(spark_sql("dedup_semantic_cells")).collect()
    assert len(rows) == 500
    by_cell: dict[str, list] = {}
    for r in rows:
        by_cell.setdefault(r.cell, []).append(r)
    dropped = 0
    for cell, rs in by_cell.items():
        above = [r for r in rs if
                 r.cos_centroid_x1e4 >= SEMDEDUP_THRESHOLD_X1E4]
        below = [r for r in rs if
                 r.cos_centroid_x1e4 < SEMDEDUP_THRESHOLD_X1E4]
        assert all(r.semdedup_keep == 1 for r in below), cell
        if above:
            keepers = [r for r in above if r.semdedup_keep == 1]
            assert len(keepers) == 1, cell
            best = max(above,
                       key=lambda r: (r.cos_centroid_x1e4, -r.vec_id))
            assert keepers[0].vec_id == best.vec_id, cell
            dropped += len(above) - 1
    assert dropped > 0  # the tier removes something on this corpus


def test_ivf_recall_frontier_on_planted_clusters(spark):
    """The n_probe recall/IO frontier pinned at probe scale (r8 verdict
    #5; BENCH/ANN_RECALL_SCALE_r9.json carries the 100k artifact, same
    generator): on planted-cluster geometry where kmeans splits every
    cluster across ~4 cells, kmeans-IVF recall@10 must rise with
    n_probe to >= 0.8 at n_probe=8 while the scanned fraction stays
    ~n_probe/n_cells — and int8 quantization may cost only a few recall
    points against the FLOAT exact baseline at n_probe=8."""
    import sys

    sys.path.insert(0, REPO := __file__.rsplit("/tests/", 1)[0])
    from pyspark.sql import functions as F

    from fast_pdf_parser_spark.operators.similarity import (
        brute_force_topk,
        fit_ivf_cells,
        ivf_topk,
    )
    from tools.ann_recall_probe import (
        planted_corpus,
        quantize_int8_dequant,
        recall_at_k,
        to_df,
    )
    _ = REPO

    import numpy as np

    n, n_cells, nq = 10_000, 64, 25
    vecs, _assign = planted_corpus(n, clusters=16)
    rng = np.random.Generator(np.random.PCG64(11))
    qvecs = (vecs[np.arange(nq) * (n // nq)]
             + rng.normal(scale=0.1, size=(nq, 64))).astype(np.float32)
    corpus = to_df(spark, vecs).localCheckpoint(eager=True)
    queries = to_df(spark, qvecs, "query_id").localCheckpoint(eager=True)
    exact: dict = {}
    for r in brute_force_topk(corpus, queries, k=10).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)

    recalls = {}
    for tier, mat in (("float", vecs), ("int8", quantize_int8_dequant(vecs))):
        tc = corpus if tier == "float" else \
            to_df(spark, mat).localCheckpoint(eager=True)
        assigned, centroids = fit_ivf_cells(tc, n_cells=n_cells, seed=42)
        assigned = assigned.localCheckpoint(eager=True)
        for n_probe in (1, 8):
            recalls[(tier, n_probe)] = recall_at_k(
                ivf_topk(assigned, centroids, queries, k=10,
                         n_probe=n_probe), exact)
        if tier == "float":
            # scanned fraction ~ n_probe/n_cells: probing 8 of 64 cells
            # must not read more than ~3x its share of the corpus
            sizes = {int(r.cell): int(r.n) for r in
                     assigned.groupBy("cell").agg(F.count("*").alias("n"))
                     .collect()}
            top8 = sorted(sizes.values(), reverse=True)[:8]
            assert sum(top8) / n <= 3 * 8 / n_cells

    assert recalls[("float", 8)] >= 0.8, recalls
    assert recalls[("float", 8)] >= recalls[("float", 1)], recalls
    assert recalls[("int8", 8)] >= recalls[("float", 8)] - 0.1, recalls
