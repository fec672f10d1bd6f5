#!/usr/bin/env python3
"""Multi-JVM scaling evidence — the closest local analogue of "N vs 4N
EXECUTORS" the north rule asks for.

tools/scaling_bench.py scales task threads inside ONE JVM (local[8] vs
local[32]); past ~8 threads that measures shared-JVM contention (one GC,
one Arrow path) that a real multi-executor cluster does not have. This
script instead fixes the executor shape (one JVM, local[4], its own Python
workers — i.e. "an executor") and scales the NUMBER of executors: K=2 vs
K=8 JVMs working disjoint file partitions of the same corpus, exactly how
adding executors partitions a 100 TB scan.

Protocol per level:
  - split the bench corpus's parquet part-files round-robin across K workers
  - each worker: own SparkSession local[4] → warmup extract → write a
    'ready' flag → wait for the parent's 'go' → timed full extract of its
    shard → print pages/bytes JSON
  - parent: waits for all 'ready', drops 'go', wall = go→last-exit;
    throughput(K) = total pages / wall
  - efficiency = throughput(4N_jvms) / (4 × throughput(N_jvms))

Usage: python3 tools/multi_jvm_scaling.py [n_docs] [repeats] [lo] [hi]
Per-JVM thread count via SPARK_GRAFT_MJVM_CORES (default 4) — e.g. 2 for a
1v4 x local[2] run, the 2->8-core executor analogue in the host's linear
core-scaling region. Writes BENCH/SCALING_MULTI_JVM.json.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
files = json.load(open(sys.argv[1]))
flagdir = sys.argv[2]
wid = sys.argv[3]
from pyspark.sql import SparkSession, functions as F
cores = os.environ.get("SPARK_GRAFT_MJVM_CORES", "4")
spark = (SparkSession.builder.master("local[" + cores + "]")
         .appName("mjvm_worker_" + wid)
         .config("spark.driver.memory",
                 os.environ.get("SPARK_GRAFT_MJVM_MEM", "3g"))
         .config("spark.sql.shuffle.partitions", cores)
         .config("spark.sql.files.maxPartitionBytes", "8m")
         .config("spark.sql.files.openCostInBytes", "1m")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from fast_pdf_parser_spark.operators.pipeline import extract_documents
from fast_pdf_parser_spark.util import ship_package
ship_package(spark)
spans = spark.read.parquet(*files)
spans.count()
extract_documents(spans.limit(8)).count()  # spawn python workers
open(os.path.join(flagdir, "ready_" + wid), "w").close()
while not os.path.exists(os.path.join(flagdir, "go")):
    time.sleep(0.05)
t0 = time.time()
agg = extract_documents(spans).agg(
    F.sum(F.when(F.col("offset") == 0, F.col("doc_total_pages")).otherwise(0)).alias("pages"),
    F.sum(F.when(F.col("offset") == 0, F.col("doc_bytes_decoded")).otherwise(0)).alias("bytes"),
).collect()[0]
print(json.dumps({"wall": time.time() - t0,
                  "pages": int(agg["pages"]), "bytes": int(agg["bytes"])}))
spark.stop()
"""


def ensure_corpus(n_docs: int) -> str:
    path = f"/tmp/spark_graft_bench_corpus_sf0.1_{n_docs}_pdf"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        # pin SPARK_GRAFT_PDF=1 so bench.py writes exactly this _pdf path
        # even if the caller's environment set it to 0
        env = dict(os.environ, SPARK_GRAFT_NDOCS=str(n_docs),
                   SPARK_GRAFT_SKIP_QUERIES="1", SPARK_GRAFT_PDF="1",
                   SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1")
        res = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, timeout=1200)
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            raise RuntimeError(
                f"bench.py did not produce {path} "
                f"(rc={res.returncode}):\n{res.stderr[-2000:]}")
    return path


def run_level(corpus: str, k: int) -> dict:
    cores = int(os.environ.get("SPARK_GRAFT_MJVM_CORES", "4"))
    files = sorted(glob.glob(os.path.join(corpus, "part-*.parquet")))
    shards = [files[i::k] for i in range(k)]
    with tempfile.TemporaryDirectory() as flagdir:
        procs = []
        for i, shard in enumerate(shards):
            fl = os.path.join(flagdir, f"shard_{i}.json")
            json.dump(shard, open(fl, "w"))
            errlog = open(f"/tmp/mjvm_worker_{i}.stderr", "w")
            cmd = [sys.executable, "-c", WORKER % {"repo": REPO},
                   fl, flagdir, str(i)]
            if os.environ.get("SPARK_GRAFT_PIN_CORES", "0") == "1":
                # pin each executor-JVM (and its python workers) to its
                # OWN 4 cores — a floating 2-JVM level otherwise spreads
                # over all 32 cores and inflates the low leg, exactly the
                # artifact scaling_bench's pinning corrects
                cmd = ["taskset", "-c",
                       f"{cores * i}-{cores * i + cores - 1}"] + cmd
            procs.append(subprocess.Popen(
                cmd,
                stdout=subprocess.PIPE, stderr=errlog,
                text=True, cwd=REPO))
        deadline = time.time() + 600
        while sum(os.path.exists(os.path.join(flagdir, f"ready_{i}"))
                  for i in range(k)) < k:
            dead = [i for i, p in enumerate(procs) if p.poll() is not None]
            if dead:
                raise RuntimeError(
                    f"worker(s) {dead} died before ready — see "
                    f"/tmp/mjvm_worker_N.stderr")
            if time.time() > deadline:
                raise RuntimeError("workers failed to become ready")
            time.sleep(0.1)
        open(os.path.join(flagdir, "go"), "w").close()
        t0 = time.time()
        outs = [p.communicate()[0] for p in procs]
        wall = time.time() - t0
    stats = [json.loads(o.strip().splitlines()[-1]) for o in outs]
    pages = sum(s["pages"] for s in stats)
    byts = sum(s["bytes"] for s in stats)
    return {"jvms": k, "cores_total": cores * k,
            "wall_sec": round(wall, 3),
            "pages": pages,
            "pages_per_sec": round(pages / wall, 1),
            "decoded_mb_per_sec": round(byts / 1e6 / wall, 2),
            "worker_walls": [round(s["wall"], 2) for s in stats]}


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 24000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    levels = ((int(sys.argv[3]), int(sys.argv[4]))
              if len(sys.argv) > 4 else (1, 4))
    cores = int(os.environ.get("SPARK_GRAFT_MJVM_CORES", "4"))
    corpus = ensure_corpus(n_docs)
    best: dict[int, dict] = {}
    for k in levels:
        for r in range(repeats):
            res = run_level(corpus, k)
            print(f"{k} JVMs x local[{cores}] run {r}: {res['wall_sec']}s "
                  f"{res['pages_per_sec']} pages/s", flush=True)
            if k not in best or res["pages_per_sec"] > best[k]["pages_per_sec"]:
                best[k] = res
    n, n4 = levels
    eff = best[n4]["pages_per_sec"] / (
        (n4 / n) * best[n]["pages_per_sec"])
    report = {
        "methodology": f"K disjoint-shard JVMs x local[{cores}] each "
                       "(executor analogue); barrier start; "
                       "wall = go -> last exit",
        "corpus_docs": n_docs,
        "levels": best,
        "scaling_efficiency": round(eff, 3),
        "meets_0.8": eff >= 0.8,
    }
    out = os.path.join(REPO, "BENCH", "SCALING_MULTI_JVM.json")
    json.dump(report, open(out, "w"), indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
