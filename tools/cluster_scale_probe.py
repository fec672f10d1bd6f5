#!/usr/bin/env python3
"""resolve_clusters scale probe: per-doc cost and rounds-to-converge vs
corpus size and clone density (VERDICT r4 #6).

The cluster resolver is the one iterative-join operator in the dedup
family, so its scale story needs the same amortization evidence as
dedup_lsh_pairs (LSH_SCALE): wall per doc must FALL as the corpus grows
(the per-round fixed cost — job scheduling, localCheckpoint materialize,
scalar aggregate — amortizes over more edges), and rounds-to-converge must
track log2(component diameter), not corpus size.

Synthetic graph (deterministic, id-arithmetic only):
- triangle cliques on a fraction ~density of docs (the near-dup shape:
  diameter 1) — roots every int(3/density) ids;
- rare 16-node chains (diameter 15) every 10_000 ids — the adversarial
  shape pointer jumping exists for: naive propagation needs ~15 rounds,
  pointer jumping predicts <= log2(15)+1 ~ 5 changing rounds.

Usage: python3 tools/cluster_scale_probe.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_BASE = 50_000
CHAIN_EVERY = 10_000
CHAIN_LEN = 16  # nodes; diameter 15


def build_graph(spark, n_docs: int, density: float):
    from pyspark.sql import functions as F

    step = max(3, int(3 / density))
    docs = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    tri_roots = spark.range(0, n_docs - 2, step)
    triangles = tri_roots.select(
        F.explode(F.expr(
            "array(named_struct('doc_a', id, 'doc_b', id + 1), "
            "named_struct('doc_a', id, 'doc_b', id + 2), "
            "named_struct('doc_a', id + 1, 'doc_b', id + 2))"
        )).alias("e")
    ).select("e.doc_a", "e.doc_b")
    chain_roots = spark.range(7, n_docs - CHAIN_LEN, CHAIN_EVERY)
    chains = chain_roots.select(
        F.explode(F.expr(
            f"transform(sequence(0, {CHAIN_LEN - 2}), i -> "
            "named_struct('doc_a', id + i, 'doc_b', id + i + 1))"
        )).alias("e")
    ).select("e.doc_a", "e.doc_b")
    return docs, triangles.union(chains)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(REPO, "BENCH", "CLUSTER_SCALE_r5.json")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("cluster_scale_probe")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from fast_pdf_parser_spark.operators.clusters import resolve_clusters
    from fast_pdf_parser_spark.util import ship_package

    ship_package(spark)

    results = []
    # scale ladder at fixed density + density ladder at fixed scale
    grid = [(1, 0.10), (4, 0.10), (10, 0.10), (4, 0.05), (4, 0.30)]
    for mult, density in grid:
        n = N_BASE * mult
        docs, pairs = build_graph(spark, n, density)
        docs = docs.localCheckpoint(eager=True)
        pairs = pairs.localCheckpoint(eager=True)
        n_edges = pairs.count()
        walls, rounds = [], 0
        keeps = 0
        for _ in range(2):  # warm best-of-2, same policy as lsh probe
            stats: dict = {}
            t0 = time.time()
            keeps = resolve_clusters(pairs, docs, stats=stats) \
                .filter("keep = 1").count()
            walls.append(time.time() - t0)
            rounds = stats["changing_rounds"]
        wall = min(walls)
        results.append({
            "docs": n, "mult": mult, "density": density,
            "edges": int(n_edges), "wall_sec": round(wall, 3),
            "ms_per_doc": round(1000 * wall / n, 4),
            "changing_rounds": rounds, "survivors": int(keeps),
        })
        print(json.dumps(results[-1]), flush=True)

    base = next(r for r in results if r["mult"] == 1)
    top = next(r for r in results if r["mult"] == 10)
    out = {
        "probe": "resolve_clusters per-doc amortization + convergence",
        "cpus": cpus,
        "graph": {"n_base": N_BASE, "chain_len": CHAIN_LEN,
                  "chain_every": CHAIN_EVERY,
                  "rounds_bound": "log2(chain diameter 15)+1 ~ 5"},
        "rows": results,
        "per_doc_ratio_10x_vs_1x": round(
            top["ms_per_doc"] / base["ms_per_doc"], 3),
        "max_changing_rounds": max(r["changing_rounds"] for r in results),
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
