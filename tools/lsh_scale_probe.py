#!/usr/bin/env python3
"""dedup_lsh_pairs fixed-cost probe: wall clock vs corpus size.

The round-2 bench showed dedup_lsh_pairs at ~4.7 s for 500 docs — 2.4× the
e2e extraction wall. The claim (VERDICT r2): that is STAGE SETUP (window +
self-join stage fan-out), not a scale term — per-doc cost must fall as the
corpus grows because the signature chain is linear and the mega-bucket cap
bounds within-bucket pairing. This probe runs the same fast path
(relational.dedup_lsh_pairs_df) over the driver's documents table scaled
1× / 4× / 10× (copies get a per-copy salt word so their word sets — and
thus minhash signatures — are perturbed rather than byte-identical; any
still-degenerate buckets are exactly what the cap exists to bound) and
reports wall and per-doc ms at each size.

Usage: python3 tools/lsh_scale_probe.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else \
        os.path.join(REPO, "BENCH", "LSH_SCALE_r3.json")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("lsh_scale_probe")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from fast_pdf_parser_spark.operators.relational import dedup_lsh_pairs_df
    from fast_pdf_parser_spark.util import ship_package

    ship_package(spark)
    base = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")) \
        .select("doc_id", "text")
    n_base = base.count()

    results = []
    for mult in (1, 4, 10):
        if mult == 1:
            docs = base
        else:
            copies = spark.range(mult).select(F.col("id").alias("copy"))
            docs = base.crossJoin(copies).select(
                (F.col("doc_id") + F.col("copy") * 10_000_000)
                .alias("doc_id"),
                F.concat(F.col("text"), F.lit(" salt"),
                         F.col("copy").cast("string")).alias("text"),
            )
        # materialize the scaled corpus so the timed run measures the LSH
        # chain, not corpus synthesis
        docs = docs.localCheckpoint(eager=True)
        docs.createOrReplaceTempView("documents")
        walls = []
        pairs = 0
        for _ in range(2):  # warm best-of-2, same policy as bench.py
            t0 = time.time()
            pairs = dedup_lsh_pairs_df(spark).count()
            walls.append(time.time() - t0)
        wall = min(walls)
        n = n_base * mult
        results.append({
            "docs": n, "mult": mult, "wall_sec": round(wall, 3),
            "ms_per_doc": round(1000 * wall / n, 4), "pairs": int(pairs),
        })
        print(json.dumps(results[-1]))
        spark.catalog.clearCache()

    out = {
        "probe": "dedup_lsh_pairs fixed-cost amortization",
        "sf_dir": sf_dir, "cpus": cpus,
        "rows": results,
        "per_doc_ratio_10x_vs_1x": round(
            results[-1]["ms_per_doc"] / results[0]["ms_per_doc"], 3),
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
