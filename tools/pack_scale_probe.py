#!/usr/bin/env python3
"""pack_token_ids scale probe: wall clock + tokens/sec vs corpus size.

The token-id materialization path (operators/packing.py: Arrow-batched
greedy encode → per-shard prefix sums → broadcast offsets → bounded
explode → per-sequence reassembly) is compute-bound in the encoder and
has one groupBy(seq_id) shuffle whose payload is the ids themselves. The
claims to evidence: (a) per-doc cost FALLS with corpus size (the
prefix-sum + explode machinery is fixed cost; the encoder is linear),
(b) encode throughput scales with cores (the regex encoder holds the GIL
only between matches), and (c) the sequence count equals
ceil(total_tokens / seq_len) at every size — the pack loses nothing.

Usage: python3 tools/pack_scale_probe.py [sf_dir] [out_json]
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
        os.path.join(REPO, "BENCH", "PACK_SCALE_r6.json")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("pack_scale_probe")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from fast_pdf_parser_spark.operators.packing import (
        SEQ_LEN,
        pack_token_ids,
    )
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
        # materialize the scaled corpus so the timed run measures the
        # encode+pack chain, not corpus synthesis; spread across cores so
        # the single-file sf corpus doesn't serialize the encoder
        docs = docs.repartition(cpus).localCheckpoint(eager=True)
        walls = []
        agg = None
        for _ in range(2):  # warm best-of-2, same policy as bench.py
            t0 = time.time()
            agg = pack_token_ids(docs).agg(
                F.count("*").alias("seqs"),
                F.sum("n_tokens").alias("tokens"),
                F.sum(F.when(F.col("n_tokens") == SEQ_LEN, 1).otherwise(0))
                .alias("full_seqs"),
            ).collect()[0]
            walls.append(time.time() - t0)
        wall = min(walls)
        n = n_base * mult
        tokens = int(agg["tokens"])
        seqs = int(agg["seqs"])
        assert seqs == (tokens + SEQ_LEN - 1) // SEQ_LEN, (seqs, tokens)
        assert int(agg["full_seqs"]) >= seqs - 1  # only the tail partial
        results.append({
            "docs": n, "mult": mult, "wall_sec": round(wall, 3),
            "ms_per_doc": round(1000 * wall / n, 4),
            "tokens": tokens, "seqs": seqs,
            "mtok_per_sec": round(tokens / wall / 1e6, 2),
        })
        print(json.dumps(results[-1]))
        spark.catalog.clearCache()

    out = {
        "probe": "pack_token_ids encode+pack scale",
        "seq_len": SEQ_LEN, "sf_dir": sf_dir, "cpus": cpus,
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