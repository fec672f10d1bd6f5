"""Band-table probe-pruning evidence (r8 verdict #1) — BENCH/BAND_PRUNE_r9.

Builds a 10x corpus (sf0.1 documents x 10 id-offset copies, distinct
texts) through the band-writing bucketed sink, then serves incremental
near-dup probes of three batch sizes from the stored band table two
ways over the SAME pre-banded batch:

  full   — corpus_band = read_band_table (the r8 shape: whole-table scan)
  pruned — corpus_band = probe_band_table (bkp PartitionFilters + pushed
           band_key IN + key-sorted row groups + parquet bloom)

and records, per batch size: verdict equality, walls (median of reps),
rows the band scan actually OUTPUT (FileSourceScan numOutputRows — rows
surviving file/row-group/page pruning, i.e. the IO the executor paid),
and for the sub-PARTS batch the directory-level file fraction. Expected
shape: tiny probes read the probed fraction only; as the batch's keys
cover the hash space the scan necessarily degrades toward full — which
is the information-theoretic floor, not a regression.

AQE is disabled for the measured scans so executedPlan exposes the scan
node's metrics directly (bench-only reach-in, guarded).
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
COPIES = 10
REPS = 5
# (n_docs, clones?) — clone batches carry band keys that EXIST across
# the corpus (near-dup candidates everywhere: reading their row groups
# is the information floor, each holds a real candidate); the fresh
# batch's keys are absent, so bloom/page skip is what bounds its IO
BATCHES = {"tiny": (2, True), "daily": (100, True),
           "fresh": (100, False), "bulk": (1000, True)}


def scan_output_rows(df) -> int:
    """Sum of numOutputRows over the plan's FileSourceScan leaves after
    execution — rows that survived parquet file/row-group/page pruning
    (the vectorized reader's per-row residual runs in the Filter node
    ABOVE the scan, so this is the paid-IO row count)."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()
    try:  # unwrap AQE if present despite the probe's conf
        plan = plan.executedPlan()
    except Exception:
        pass
    total = 0
    stack = [plan]
    while stack:
        node = stack.pop()
        if "FileSourceScan" in node.getClass().getName():
            m = node.metrics()
            if m.contains("numOutputRows"):
                total += int(m.apply("numOutputRows").value())
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    return total


def main() -> None:
    from fast_pdf_parser_spark.operators.relational import (
        _HASH60_SPARK,
        band_signatures_spark_sql,
        near_verdict_prebanded_sql,
    )
    from fast_pdf_parser_spark.plans.checkpoint import (
        BAND_PROBE_PARTS,
        _fs_delete,
        probe_band_table,
        read_band_table,
        write_docs_bucketed,
    )
    from fast_pdf_parser_spark.util import ship_package

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "1m")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.adaptive.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    n_base = docs.count()
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    corpus_docs = (
        docs.crossJoin(F.broadcast(copies))
        .select(
            (F.col("doc_id") + F.col("copy") * F.lit(10_000_000))
            .alias("doc_id"),
            F.lit("probe").alias("source"),
            F.lit("train").alias("split"),
            F.concat(F.col("text"), F.lit(" copyword"),
                     F.col("copy").cast("string")).alias("text"),
        )
    )
    corpus_docs = corpus_docs.withColumn(
        "clean_hash",
        F.expr(_HASH60_SPARK.format(x="text"))).withColumnRenamed(
        "text", "clean_text").select(
        "doc_id", "source", "split", "clean_hash", "clean_text")

    out = f"/tmp/spark_graft_bandprune_{os.getpid()}"
    _fs_delete(spark, out)
    t0 = time.time()
    corpus = write_docs_bucketed(spark, corpus_docs, out, run_id="probe",
                                 num_buckets=4, write_bands=True)
    sink_wall = time.time() - t0
    corpus.createOrReplaceTempView("bp_corpus")
    n_corpus = corpus.count()
    full_bands = read_band_table(spark, out)
    n_band_rows = full_bands.count()
    band_files = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(os.path.join(out, "bands"))
        for f in fs if f.endswith(".parquet")
    ]

    report = {
        "corpus_docs": n_corpus, "base_docs": n_base, "copies": COPIES,
        "band_rows": n_band_rows, "band_files": len(band_files),
        "band_probe_parts": BAND_PROBE_PARTS, "reps": REPS,
        "sink_wall_sec": round(sink_wall, 2),
        "note": (
            "scan_rows_fraction = FileSourceScan numOutputRows / band "
            "rows (rows surviving partition+rowgroup+page+bloom "
            "pruning = paid IO). tiny (keys < PARTS): bkp partition "
            "pruning bounds files listed. fresh (keys ABSENT from the "
            "corpus — the bulk of any real crawl increment): the "
            "band_key bloom skips every row group, fraction ~0. "
            "clone-heavy daily/bulk: every row group holds a real "
            "candidate, so a full read IS the information floor — a "
            "real increment's IO interpolates between the fresh and "
            "clone arms by its actual near-dup density. All arms "
            "verdict-equal to the full scan."),
        "batches": {},
    }

    for name, (n_docs, clones) in BATCHES.items():
        # batch: near clones of corpus docs (one appended word) + fresh
        n_clone = n_docs // 2 if clones else 0
        spark.sql(f"""
            SELECT -(doc_id + 1) AS doc_id,
                   concat(clean_text, ' znearq') AS text
            FROM bp_corpus WHERE doc_id < {n_clone}
            UNION ALL
            SELECT doc_id + 900000000 AS doc_id,
                   concat('fresh doc ', CAST(doc_id AS STRING),
                          ' unseen words entirely') AS text
            FROM bp_corpus WHERE doc_id < {n_docs - n_clone}
        """).createOrReplaceTempView("bp_batch")
        bb = spark.sql(band_signatures_spark_sql(
            "bp_batch", text_col="text")).localCheckpoint(eager=True)
        bb.createOrReplaceTempView("bp_batch_bands")
        keys = {int(r.band_key) for r in bb.select("band_key")
                .distinct().collect()}
        bkps = {k % BAND_PROBE_PARTS for k in keys}

        arms = {}
        for arm in ("full", "pruned"):
            if arm == "full":
                full_bands.select("doc_id", "band", "band_key") \
                    .createOrReplaceTempView("bp_corpus_bands")
                rows_scanned = scan_output_rows(
                    spark.table("bp_corpus_bands"))
            else:
                pruned = probe_band_table(spark, out, bb)
                pruned.createOrReplaceTempView("bp_corpus_bands")
                rows_scanned = scan_output_rows(pruned)
            sql = near_verdict_prebanded_sql(
                "bp_batch", "bp_batch_bands",
                "bp_corpus", "bp_corpus_bands")
            walls = []
            for _ in range(REPS):
                t = time.time()
                res = spark.sql(sql).collect()
                walls.append(time.time() - t)
            arms[arm] = {
                "wall_median_sec": round(statistics.median(walls), 3),
                "wall_best_sec": round(min(walls), 3),
                "band_scan_rows": rows_scanned,
                "verdicts": sorted(
                    (r.doc_id, r.near_in_corpus, r.best_jaccard_x1e4)
                    for r in res),
            }
        equal = arms["full"]["verdicts"] == arms["pruned"]["verdicts"]
        for a in arms.values():
            a["n_verdicts"] = len(a.pop("verdicts"))
        entry = {
            "batch_docs": n_docs, "distinct_band_keys": len(keys),
            "bkps_probed": len(bkps),
            "verdicts_equal": equal,
            "scan_rows_fraction": round(
                arms["pruned"]["band_scan_rows"] / max(1, n_band_rows), 4),
            "full": arms["full"], "pruned": arms["pruned"],
        }
        if len(bkps) < BAND_PROBE_PARTS:
            probed_files = [
                f for f in band_files
                if any(f"/bkp={b}/" in f for b in bkps)]
            entry["files_fraction"] = round(
                len(probed_files) / max(1, len(band_files)), 4)
        report["batches"][name] = entry
        print(json.dumps({name: entry["scan_rows_fraction"],
                          "equal": equal}), flush=True)

    _fs_delete(spark, out)
    path = os.path.join(REPO, "BENCH", "BAND_PRUNE_r9.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
