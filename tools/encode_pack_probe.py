#!/usr/bin/env python3
"""text_encode_pack rep-spread probe (r6 verdict #7).

BENCH_DETAIL_sf0.1_4000d.json r6 showed rep walls of 2.87-7.18 s for
text_encode_pack — a 2.5x max/min inside one bench run. Candidate causes:
(a) a JVM full GC landing inside a timed rep, (b) per-worker vocab-trie
first-touch (the tokenizer builds its regex trie once per python worker),
(c) plain box noise. This probe times N reps of the exact bench query and
records, per rep, the wall AND the same-process JVM GC time delta
(GarbageCollectorMXBeans) plus the python-worker pool's reuse behavior,
writing BENCH/ENCODE_PACK_REPS_r7.json so the outlier is attributed
instead of argued about.

Usage: python3 tools/encode_pack_probe.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def gc_stats(spark) -> tuple[int, int]:
    """(total collections, total collection ms) across all JVM GC beans."""
    beans = (spark._jvm.java.lang.management.ManagementFactory
             .getGarbageCollectorMXBeans())
    it = beans.iterator()
    n = ms = 0
    while it.hasNext():
        b = it.next()
        n += b.getCollectionCount()
        ms += b.getCollectionTime()
    return n, ms


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import gc

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("encode_pack_probe")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "1m")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    q = entrymod.queries()["text_encode_pack"]

    # same warmup the bench gives every query
    spark.range(100000).selectExpr("id", "id % 7 AS k") \
        .groupBy("k").count().count()

    rows = []
    for r in range(reps):
        n0, ms0 = gc_stats(spark)
        t0 = time.time()
        q(spark, sf_dir).count()
        wall = time.time() - t0
        n1, ms1 = gc_stats(spark)
        rows.append({"rep": r, "wall_sec": round(wall, 3),
                     "gc_collections": int(n1 - n0),
                     "gc_ms": int(ms1 - ms0)})
        print(json.dumps(rows[-1]), flush=True)
        # the bench's cooldown between reps
        spark.catalog.clearCache()
        gc.collect()
        spark._jvm.System.gc()

    walls = sorted(x["wall_sec"] for x in rows)
    out = {
        "metric": "text_encode_pack_rep_attribution",
        "sf_dir": sf_dir,
        "cpus": cpus,
        "reps": rows,
        "wall_min": walls[0],
        "wall_max": walls[-1],
        "max_over_min": round(walls[-1] / walls[0], 2),
        "note": ("rep 0 carries any per-worker vocab-trie first-touch; "
                 "gc_ms attributes in-rep JVM collection time"),
    }
    with open(os.path.join(REPO, "BENCH", "ENCODE_PACK_REPS_r7.json"),
              "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"wall_min": walls[0], "wall_max": walls[-1],
                      "max_over_min": out["max_over_min"]}))
    spark.stop()


if __name__ == "__main__":
    main()
