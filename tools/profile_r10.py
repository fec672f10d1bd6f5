#!/usr/bin/env python3
"""Round-10 profiling harness (guide §1: measure first).

Times each benched query with the SAME session config as bench.py, but
splits the wall into _prepare / plan-build / count so the fixed per-query
tax is visible, and writes .explain("formatted") to plans/r10/<q>_before.txt
(or _after.txt with SPARK_GRAFT_PLAN_SUFFIX=after). Not part of the frozen
bench contract — bench.py remains the official meter.
"""
from __future__ import annotations

import json
import os
import sys
import time
from statistics import median

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BENCHED = [
    "text_quality_score", "events_sessionize", "ann_cosine_topk",
    "f4_semantic_units", "dedup_minhash_signatures", "dedup_lsh_pairs",
    "dedup_substring_winnow", "text_gopher_rules", "tpch_q1_pricing",
    "pipeline_clean_corpus", "text_encode_pack", "warc_extract",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_PROFILE_REPS", "3"))
    suffix = os.environ.get("SPARK_GRAFT_PLAN_SUFFIX", "before")
    only = [q for q in os.environ.get("SPARK_GRAFT_PROFILE_ONLY", "").split(",")
            if q]
    names = only or BENCHED

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile_r10")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
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
    # same JIT warmup as bench.py
    spark.range(100000).selectExpr("id", "id % 7 AS k") \
        .groupBy("k").count().count()

    plans_dir = os.path.join(REPO, "plans", "r10")
    os.makedirs(plans_dir, exist_ok=True)

    import gc
    results: dict[str, dict] = {}
    for name in names:
        fn = qmap[name]
        # one discarded warm pass (worker pools, tries) mirroring warm_first
        spark.sparkContext.setJobDescription(f"warm:{name}")
        t_w0 = time.time()
        fn(spark, sf_dir).count()
        warm_wall = time.time() - t_w0
        spark.catalog.clearCache()
        gc.collect()
        spark._jvm.System.gc()

        prep_walls, build_walls, count_walls = [], [], []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.time()
            entrymod._prepare(spark, sf_dir)
            t1 = time.time()
            df = fn(spark, sf_dir)
            t2 = time.time()
            df.count()
            t3 = time.time()
            prep_walls.append(t1 - t0)
            build_walls.append(t2 - t1)
            count_walls.append(t3 - t2)
            spark.catalog.clearCache()
            gc.collect()
            spark._jvm.System.gc()
        # capture the plan once
        import io
        from contextlib import redirect_stdout
        buf = io.StringIO()
        with redirect_stdout(buf):
            fn(spark, sf_dir).explain("formatted")
        plan = buf.getvalue()
        with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        results[name] = {
            "warm_total": round(warm_wall, 3),
            "prepare": round(median(prep_walls), 3),
            "build": round(median(build_walls), 3),
            "count": round(median(count_walls), 3),
            # fn() re-runs _prepare internally, so build already includes
            # one prepare; bench-comparable wall = build + count
            "total": round(median(build_walls) + median(count_walls), 3),
        }
        print(json.dumps({name: results[name]}), flush=True)

    out = os.environ.get(
        "SPARK_GRAFT_PROFILE_OUT",
        os.path.join(REPO, "BENCH", f"PROFILE_r10_{suffix}.json"))
    with open(out, "w") as f:
        json.dump({"sf_dir": sf_dir, "cpus": cpus, "reps": reps,
                   "queries": results}, f, indent=1)
    print("WROTE", out)
    spark.stop()


if __name__ == "__main__":
    main()
