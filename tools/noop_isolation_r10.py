#!/usr/bin/env python3
"""Guide §1.4 noop-sink isolation for the heavy benched queries (r10).

`df.write.format("noop")` computes EVERY column of EVERY row and discards
the result — unlike the frozen bench's `.count()`, nothing can be pruned,
so this times the full computation including columns count() lets Catalyst
drop (e.g. the minhash values themselves).  Written to
BENCH/NOOP_ISOLATION_r10.json; jobs labelled for the UI/event log.
"""
from __future__ import annotations

import gc
import json
import os
import sys
import time
from statistics import median

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HEAVY = ["dedup_minhash_signatures", "dedup_lsh_pairs", "warc_extract",
         "text_encode_pack", "events_sessionize", "ann_cosine_topk"]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_NOOP_REPS", "3"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("noop_isolation_r10")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "1m")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qmap = entrymod.queries()
    results = {}
    for name in HEAVY:
        fn = qmap[name]

        def noop_run():
            spark.sparkContext.setJobDescription(f"noop:{name}")
            t0 = time.time()
            (fn(spark, sf_dir).write.format("noop")
             .mode("overwrite").save())
            return time.time() - t0

        noop_run()  # warm pass (worker pools, tries)
        walls = []
        for _ in range(reps):
            spark.catalog.clearCache()
            gc.collect()
            spark._jvm.System.gc()
            walls.append(round(noop_run(), 3))
        results[name] = {"noop_median": round(median(walls), 3),
                         "noop_walls": sorted(walls)}
        print(json.dumps({name: results[name]}), flush=True)

    out = os.path.join(REPO, "BENCH", "NOOP_ISOLATION_r10.json")
    with open(out, "w") as f:
        json.dump({"sf_dir": sf_dir, "cpus": cpus, "reps": reps,
                   "note": "full-materialization walls (noop sink; nothing "
                           "prunable) for the heavy benched queries on the "
                           "final r10 tree",
                   "queries": results}, f, indent=1)
    print("WROTE", out)
    spark.stop()


if __name__ == "__main__":
    main()
