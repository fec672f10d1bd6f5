#!/usr/bin/env python3
"""TPC-H trio scale probe: Q1 (scan-agg), Q5 (star join), Q14
(broadcast share) at 1x vs 10x lineitem volume — the warehouse-regime
counterpart of CAPSTONE_SCALE_r9 (text ops). Same protocol: both fact
corpora written with an IDENTICAL 32-file layout so the ratio isolates
data volume, not file parallelism; the 10x fact table replicates
lineitem with shifted orderkeys so the orders join keeps its
selectivity (orderkey mod the original range), dimensions stay as
shipped (dimensions don't grow 10x in a real warehouse either).

Writes BENCH/TPCH_SCALE_r9.json.
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

SRC = "/root/testdata/sf0.1"
WORK = "/tmp/tpch_scale"
N_FILES = 32
QUERIES = ["tpch_q1_pricing", "tpch_q5_local_volume", "tpch_q14_promo"]


def build(spark) -> dict[str, str]:
    from pyspark.sql import functions as F

    li = spark.read.parquet(os.path.join(SRC, "lineitem.parquet"))
    levels = {}
    for tag, copies in (("1x", 1), ("10x", 10)):
        out_dir = os.path.join(WORK, tag)
        fact = os.path.join(out_dir, "lineitem.parquet")
        if not os.path.exists(fact):
            os.makedirs(out_dir, exist_ok=True)
            df = None
            for k in range(copies):
                # keep l_orderkey inside the original range: the orders
                # join keeps matching and its selectivity is unchanged;
                # linenumber shifts keep rows distinct
                part = li.withColumn(
                    "l_linenumber",
                    F.col("l_linenumber") + F.lit(k * 100))
                df = part if df is None else df.unionByName(part)
            df.repartition(N_FILES).write.mode("overwrite").parquet(fact)
            for t in ("orders", "customer", "supplier", "nation",
                      "region", "part"):
                s = os.path.join(SRC, f"{t}.parquet")
                d = os.path.join(out_dir, f"{t}.parquet")
                if not os.path.exists(d):
                    shutil.copyfile(s, d)
        levels[tag] = out_dir
    return levels


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .appName("tpch-scale-r9").getOrCreate())
    levels = build(spark)
    qs = entry.queries()
    out = {"reps": reps, "stat": "median", "levels": {}, "fact_rows": {}}
    for tag, sf_dir in levels.items():
        out["fact_rows"][tag] = spark.read.parquet(
            os.path.join(sf_dir, "lineitem.parquet")).count()
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
    out["wall_ratio_10x_over_1x"] = {
        n: round(out["levels"]["10x"][n]["wall_sec"]
                 / out["levels"]["1x"][n]["wall_sec"], 2)
        for n in QUERIES}
    out["note"] = (
        "identical 32-file fact layouts; dimensions unscaled (the real "
        "warehouse shape). Q5/Q14 row counts are level-invariant "
        "aggregates; Q1 stays 6 groups. Ratios far below 10 = still "
        "fixed-cost dominated at 6M fact rows on local[32].")
    dest = os.path.join(REPO, "BENCH", "TPCH_SCALE_r9.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"ratios": out["wall_ratio_10x_over_1x"],
                      "written": dest}), flush=True)
    spark.stop()
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
