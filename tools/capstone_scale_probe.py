#!/usr/bin/env python3
"""Round-9 addition scale probe: the two e2e capstones and the two late
operators at 1x vs 10x corpus volume (the SUBSTR_SCALE_r8 protocol).

Both corpora are written with an IDENTICAL 32-file layout so the ratio
isolates data volume, not file parallelism (a single-file corpus scans
on one task regardless of size). The 10x corpus replicates sf0.1's
documents ten times with disjoint doc_id ranges and a per-copy unique
suffix token appended to the text — WITHOUT the suffix every replica is
an exact duplicate and the capstones' dedup stages would collapse the
10x run back to 1x volume, which would measure dedup effectiveness, not
scale. (doc_id arithmetic the queries use — %11 planted dups, %5
parents, split coins — keeps its distribution under +5000*k shifts.)

Measured per level, median of N reps + best:
  - train_assembly_e2e     (r8 verdict #2 capstone: mixture -> shuffle ->
                            pack -> batching -> datacard, counts read back)
  - crawl_increment_e2e    (r7 verdict #3 capstone + r9 compaction stages)
  - dedup_soft_weight      (r9 late addition)
  - text_pack_bestfit      (r9 late addition)

Writes BENCH/CAPSTONE_SCALE_r9.json.

Usage: python3 tools/capstone_scale_probe.py [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1/documents.parquet"
WORK = "/tmp/capstone_scale"
N_FILES = 32
QUERIES = ["dedup_soft_weight", "text_pack_bestfit",
           "train_assembly_e2e", "crawl_increment_e2e"]


def build_corpora(spark) -> dict[str, str]:
    from pyspark.sql import functions as F

    base = spark.read.parquet(SRC)
    n = base.count()
    levels = {}
    for tag, copies in (("1x", 1), ("10x", 10)):
        out_dir = os.path.join(WORK, tag)
        path = os.path.join(out_dir, "documents.parquet")
        if not os.path.exists(path):
            df = None
            for k in range(copies):
                part = base.select(
                    (F.col("doc_id") + F.lit(k * n)).alias("doc_id"),
                    (F.concat(F.col("text"), F.lit(f" uniq{k}x"),
                              F.col("doc_id").cast("string"))
                     if k else F.col("text")).alias("text"),
                    "lang", "source", "n_chars")
                df = part if df is None else df.unionByName(part)
            (df.repartition(N_FILES)
               .write.mode("overwrite").parquet(path))
        levels[tag] = out_dir
    return levels


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "8g")
             .appName("capstone-scale-r9").getOrCreate())
    levels = build_corpora(spark)
    qs = entry.queries()
    out = {"corpus_docs": {}, "reps": reps, "levels": {}}
    # the 1x block runs first: sub-1x ratios are warmup ordering, as in
    # SUBSTR_SCALE_r8
    for tag, sf_dir in levels.items():
        out["corpus_docs"][tag] = (spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")).count())
        blk = {}
        for name in QUERIES:
            walls, rows = [], 0
            for _ in range(reps):
                t0 = time.perf_counter()
                rows = len(qs[name](spark, sf_dir).collect())
                walls.append(time.perf_counter() - t0)
            blk[name] = {"wall_sec": round(statistics.median(walls), 2),
                         "rows": rows, "best": round(min(walls), 2)}
            print(json.dumps({tag: {name: blk[name]}}), flush=True)
        out["levels"][tag] = blk
    ratios = {}
    for name in QUERIES:
        w1 = out["levels"]["1x"][name]["wall_sec"]
        w10 = out["levels"]["10x"][name]["wall_sec"]
        ratios[name] = round(w10 / w1, 2) if w1 else None
    out["wall_ratio_10x_over_1x"] = ratios
    out["note"] = (
        "identical 32-file layouts; 10x replicas carry a unique suffix "
        "token so dedup stages cannot collapse the volume. A ratio far "
        "below 10 means the operator is still fixed-cost dominated at "
        "240k docs on local[32]; the capstones' sink IO is included in "
        "their walls.")
    dest = os.path.join(REPO, "BENCH", "CAPSTONE_SCALE_r9.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"ratios": ratios, "written": dest}), flush=True)
    spark.stop()
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
