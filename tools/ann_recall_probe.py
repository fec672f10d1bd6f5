"""ANN recall at non-toy scale (r8 verdict #5) — BENCH/ANN_RECALL_SCALE_r9.

ann_recall_report's driver row measures 5 queries x 50 vectors — recall
1.0 there says nothing about probe-count tradeoffs. This probe plants
real similarity structure at 100k vectors (dim 64, CLUSTERS gaussian
clusters, unit centers + sigma-noise — the geometry bucketed ANN exists
for; on pure noise every bucketed method reads ~0 recall by design, see
relational.py's ann notes) and sweeps:

- kmeans-IVF (operators/similarity.fit_ivf_cells/ivf_topk), n_probe in
  {1,2,4,8}: recall@10 vs the exact float baseline AND the scanned
  fraction (probed-cell rows / (queries x corpus)) — the
  accuracy-vs-IO frontier the verdict asked for.
- int8-IVF: the same sweep over symmetrically-quantized (amax/127,
  floor-half-up — the embed_quantize_int8 arithmetic) then dequantized
  vectors, fit and searched int8-only, scored against the FLOAT exact
  baseline: quantization error + probe miss in one number.
- semantic-cells dedup: per-kmeans-cell centroid-cosine dedup at the
  probe's threshold — survivor fraction and how much of the exact
  top-10 survives (recall lost = corpus the dedup deleted).

Deterministic: numpy PCG64(seed); thresholds for the pinned pytest live
in tests/test_similarity.py (smaller N, same generator).
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession, functions as F  # noqa: E402

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N = int(os.environ.get("SPARK_GRAFT_ANN_N", "100000"))
DIM = 64
# CLUSTERS << N_CELLS: kmeans SPLITS every cluster across ~4 cells, so
# a query's true top-10 straddles sibling cells and n_probe genuinely
# trades IO for recall (cells == clusters makes every tier read 1.0 at
# n_probe=1 — no frontier to measure)
CLUSTERS = 64
N_CELLS = 256
SIGMA = 0.2
N_QUERIES = 50
K = 10
SEED = 9
SEMDEDUP_THR = 0.5


def planted_corpus(n, dim=DIM, clusters=CLUSTERS, sigma=SIGMA, seed=SEED):
    rng = np.random.Generator(np.random.PCG64(seed))
    centers = rng.normal(size=(clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = np.arange(n) % clusters
    vecs = centers[assign] + rng.normal(scale=sigma, size=(n, dim))
    return vecs.astype(np.float32), assign


def quantize_int8_dequant(vecs: np.ndarray) -> np.ndarray:
    """embed_quantize_int8 arithmetic: symmetric per-vector amax/127
    scale, floor-half-up, dequantized back to float."""
    amax = np.abs(vecs).max(axis=1, keepdims=True)
    amax[amax == 0] = 1.0
    q = np.floor(vecs / amax * 127 + 0.5).clip(-127, 127)
    return (q * amax / 127).astype(np.float32)


def to_df(spark, vecs, id_col="vec_id"):
    import pandas as pd

    pdf = pd.DataFrame({id_col: np.arange(len(vecs), dtype=np.int64),
                        "embedding": [v.tolist() for v in vecs]})
    return spark.createDataFrame(
        pdf, schema=f"{id_col} bigint, embedding array<float>")


def recall_at_k(topk_df, exact: dict) -> float:
    got: dict = {}
    for r in topk_df.collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    return round(sum(
        len(got.get(q, set()) & exact[q]) / len(exact[q])
        for q in exact) / len(exact), 4)


def main() -> None:
    from fast_pdf_parser_spark.operators.similarity import (
        brute_force_topk,
        fit_ivf_cells,
        ivf_topk,
    )

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    vecs, _ = planted_corpus(N)
    rng = np.random.Generator(np.random.PCG64(SEED + 1))
    q_ids = np.arange(N_QUERIES) * (N // N_QUERIES)
    qvecs = (vecs[q_ids]
             + rng.normal(scale=SIGMA / 2, size=(N_QUERIES, DIM))
             ).astype(np.float32)

    corpus = to_df(spark, vecs).localCheckpoint(eager=True)
    queries = to_df(spark, qvecs, "query_id").localCheckpoint(eager=True)

    t0 = time.time()
    exact_df = brute_force_topk(corpus, queries, k=K)
    exact: dict = {}
    for r in exact_df.collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    exact_wall = round(time.time() - t0, 1)

    report = {
        "n_vectors": N, "dim": DIM, "clusters": CLUSTERS,
        "n_cells": N_CELLS, "sigma": SIGMA, "n_queries": N_QUERIES,
        "k": K, "seed": SEED, "exact_wall_sec": exact_wall,
        "tiers": [],
    }

    for tier, mat in (("ivf_float", vecs),
                      ("ivf_int8", quantize_int8_dequant(vecs))):
        tier_corpus = corpus if tier == "ivf_float" else \
            to_df(spark, mat).localCheckpoint(eager=True)
        t0 = time.time()
        assigned, centroids = fit_ivf_cells(
            tier_corpus, n_cells=N_CELLS, seed=42)
        assigned = assigned.localCheckpoint(eager=True)
        fit_wall = round(time.time() - t0, 1)
        sizes = {int(r.cell): int(r.n) for r in
                 assigned.groupBy("cell").agg(F.count("*").alias("n"))
                 .collect()}
        for n_probe in (1, 2, 4, 8):
            t0 = time.time()
            topk = ivf_topk(assigned, centroids, queries, k=K,
                            n_probe=n_probe)
            rec = recall_at_k(topk, exact)
            wall = round(time.time() - t0, 1)
            # scanned fraction: rows in probed cells / (queries x corpus)
            qc = (queries.crossJoin(F.broadcast(centroids)).select(
                "query_id", "cell",
                F.aggregate(
                    F.zip_with("embedding", "centroid",
                               lambda x, y: x.cast("double") * y),
                    F.lit(0.0), lambda a, x: a + x).alias("dot")))
            w_rank = F.expr(
                "row_number() OVER (PARTITION BY query_id "
                "ORDER BY dot DESC, cell ASC)")
            probed = (qc.withColumn("r", w_rank)
                      .filter(F.col("r") <= n_probe)
                      .select("query_id", "cell").collect())
            scanned = sum(sizes.get(int(p.cell), 0) for p in probed)
            frac = round(scanned / (N_QUERIES * N), 4)
            row = {"tier": tier, "n_probe": n_probe,
                   "recall_at_10": rec, "scanned_fraction": frac,
                   "search_wall_sec": wall}
            if n_probe == 1:
                row["fit_wall_sec"] = fit_wall
            report["tiers"].append(row)
            print(json.dumps(row), flush=True)

    # semantic-cells dedup tier over the float kmeans cells
    assigned, centroids = fit_ivf_cells(corpus, n_cells=N_CELLS, seed=42)
    cosc = assigned.join(F.broadcast(centroids), "cell").select(
        "vec_id", "cell",
        F.aggregate(
            F.zip_with("embedding", "centroid",
                       lambda x, y: x.cast("double") * y),
            F.lit(0.0), lambda a, x: a + x).alias("dot"),
        F.sqrt(F.aggregate(
            F.transform("embedding",
                        lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0), lambda a, x: a + x)).alias("nv"),
        F.sqrt(F.aggregate(
            F.transform("centroid", lambda x: x * x),
            F.lit(0.0), lambda a, x: a + x)).alias("nc"))
    cosed = cosc.select(
        "vec_id", "cell",
        (F.col("dot") / (F.col("nv") * F.col("nc"))).alias("cos"))
    w = F.expr("row_number() OVER (PARTITION BY cell, "
               f"CASE WHEN cos >= {SEMDEDUP_THR} THEN 1 ELSE 0 END "
               "ORDER BY cos DESC, vec_id ASC)")
    keep = (cosed.withColumn("grp_rank", w)
            .filter((F.col("cos") < SEMDEDUP_THR)
                    | (F.col("grp_rank") == 1)))
    survivors = {int(r.vec_id) for r in keep.select("vec_id").collect()}
    surv_frac = round(len(survivors) / N, 4)
    rec = round(sum(
        len({n for n in exact[q] if n in survivors}) / len(exact[q])
        for q in exact) / len(exact), 4)
    row = {"tier": "semdedup", "threshold": SEMDEDUP_THR,
           "survivor_fraction": surv_frac,
           "exact_top10_survival": rec}
    report["tiers"].append(row)
    print(json.dumps(row), flush=True)
    report["note"] = (
        "Planted-cluster geometry (unit centers, sigma noise): recall "
        "rises with n_probe while scanned_fraction ~ n_probe/n_cells — "
        "the IO-vs-accuracy frontier; int8 rows price quantization loss "
        "on top of probe loss against the float exact baseline; the "
        "semdedup row prices what cell-centroid dedup deletes from "
        "retrieval (survivor_fraction of the corpus kept, "
        "exact_top10_survival of true neighbors retained).")

    path = os.path.join(REPO, "BENCH", "ANN_RECALL_SCALE_r9.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
