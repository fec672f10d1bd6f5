#!/usr/bin/env python3
"""Benchmark driver: headline extraction throughput + key operator timings.

Prints ONE COMPACT JSON line (the FINAL stdout line, sized well under the
driver's ~2 kB tail-capture window — the r5 full dump outgrew it and the
round's official bench recorded "parsed": null):
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "cpu_control_mops": M, "detail_file": "BENCH/BENCH_DETAIL_last.json"}
Per-query spread and the chunk-size matrix go to ``detail_file`` instead.

``cpu_control_mops`` is a ~1.5 s single-core pure-Python integer control
run BEFORE the JVM starts: this box drifts 15-25% hour-over-hour, so
round-over-round wall comparisons divide by the same round's control
(drift-corrected ratio = (wall_a/ctl_a)/(wall_b/ctl_b) inverted for Mops).
It is a NEW r6 loop — absolute values are not comparable to the ad-hoc
multi-process controls in BENCH/HW_CEILING.json, only to itself.

Env:
  SPARK_GRAFT_SF_DIR  input tables dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] parallelism (default 32)
  SPARK_GRAFT_NDOCS   synthetic corpus size override
  SPARK_GRAFT_PDF     include kind='pdf' spans (default on)

The headline measures the flagship zero-shuffle extraction pipeline
(operators/pipeline.py) over a parquet-backed synthetic interleaved corpus
(sources/synth.py — skewed page distribution, media + pdf spans), reporting
wall sec plus derived docs/sec, pages/sec and MB/sec of decoded bytes — the
BASELINE.json metric. The corpus is generated once per (sf, size) and cached
under /tmp, pre-partitioned uniformly so the measured plan is scan →
mapInPandas with no shuffle. A tiny warmup extract spawns/initializes the
Python workers first, so the number is steady-state throughput (cold JVM +
worker bootstrap is ~6s and amortizes away on any real-size run).

Timing protocol: every reported number is the MEDIAN of
SPARK_GRAFT_BENCH_REPS (default 5) runs, with min/max spread emitted
alongside ("spread" keys) — single-shot wall times on a shared-JVM box
swing ±15% run-to-run, which is wider than the effects being tracked
round-over-round, so sub-spread deltas must not be read as regressions
or wins (round-3 verdict, measurement item).

Headline isolation (r7): the OFFICIAL pipeline_extract number comes from
a FRESH-JVM subprocess (SPARK_GRAFT_SKIP_QUERIES=1 form) that runs
before this process builds any Spark state, so it no longer depends on
the query phase's heap pressure (r6 verdict: a ~24% composition artifact
that drift correction could not remove). The same extraction re-run in
the query-phase JVM is recorded as pipeline_extract_inproc — the
composition effect is measured every round instead of debated.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


from statistics import median  # noqa: E402


def cpu_control_mops(n_iters: int = 12_000_000) -> float:
    """Single-core pure-Python LCG loop: millions of iterations per second.

    Fixed work, no allocation, no syscalls — a stable proxy for the box's
    single-thread integer speed at the moment the bench ran. Runs before
    SparkSession init so the JVM can't steal cycles from it.
    """
    x = 123456789
    t0 = time.perf_counter()
    for _ in range(n_iters):
        x = (x * 1103515245 + 12345) & 0xFFFFFFFFFFFF
    wall = time.perf_counter() - t0
    if x == 0:  # keep the loop un-eliminable
        print("", end="")
    return round(n_iters / 1e6 / wall, 1)


def corpus_docs_for(sf_dir: str) -> int:
    name = os.path.basename(os.path.normpath(sf_dir))
    table = {"sf0.001": 200, "sf0.01": 800, "sf0.1": 4000}
    return int(os.environ.get("SPARK_GRAFT_NDOCS", table.get(name, 800)))


def _headline_subprocess() -> dict | None:
    """Run THIS script headline-only in a FRESH JVM (a subprocess with
    SPARK_GRAFT_SKIP_QUERIES=1) and return its parsed result line.

    Why (r6 verdict, perf #1-2): the official pipeline_extract wall was
    composition-dependent — the in-process query phase's heap pressure
    ahead of the timed reps inflated it 2.057→2.633 s, a ~24% artifact of
    HOW MANY queries happened to precede it, surviving drift correction.
    A fresh JVM gives the quiet-window number by construction; the
    in-process rerun is still recorded (pipeline_extract_inproc) so the
    composition effect itself stays measured, per round, for free."""
    import subprocess

    env = dict(os.environ,
               SPARK_GRAFT_SKIP_QUERIES="1",
               SPARK_GRAFT_MATRIX="0",
               SPARK_GRAFT_HEADLINE_SUBPROC="0")
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=3600)
        if proc.returncode != 0:
            return None  # failed run: never adopt its wall as official
        line = proc.stdout.strip().splitlines()[-1]
        parsed = json.loads(line)
        # shape guard: JVM stdout noise can be JSON-parseable without being
        # a result line; main() dereferences headline["value"] unguarded
        if not (isinstance(parsed, dict)
                and isinstance(parsed.get("value"), (int, float))):
            return None
        return parsed
    except Exception:
        return None  # fall back to the in-process headline


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    include_pdf = os.environ.get("SPARK_GRAFT_PDF", "1") == "1"
    n_docs = corpus_docs_for(sf_dir)
    sf_name = os.path.basename(os.path.normpath(sf_dir))

    # same-day hardware control, measured BEFORE the JVM exists
    control_mops = cpu_control_mops()

    # official headline: fresh-JVM subprocess, BEFORE this process builds
    # any Spark state (its own control rides along in its result line)
    headline = None
    if os.environ.get("SPARK_GRAFT_SKIP_QUERIES", "0") != "1" and \
            os.environ.get("SPARK_GRAFT_HEADLINE_SUBPROC", "1") == "1":
        headline = _headline_subprocess()

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("fast_pdf_parser_spark_bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # split sizing: without this, Spark packs the corpus's small parquet
        # files into ~128MB input splits and the zero-shuffle pipeline gets
        # fewer tasks than cores (at 100 TB splits are naturally plentiful;
        # at bench scale we must ask for them)
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "1m")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from fast_pdf_parser_spark.config import ParseOptions
    from fast_pdf_parser_spark.operators.pipeline import extract_documents
    from fast_pdf_parser_spark.sources.synth import write_corpus
    from fast_pdf_parser_spark.util import ship_package

    ship_package(spark)

    corpus_path = f"/tmp/spark_graft_bench_corpus_{sf_name}_{n_docs}" + (
        "_pdf" if include_pdf else ""
    )
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        # salted uniform pre-partitioning at write time: the timed pipeline
        # below then needs NO repartition (zero-shuffle end to end)
        write_corpus(spark, corpus_path, n_docs, seed=42,
                     include_pdf=include_pdf, num_partitions=128)

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5")))
    queries: dict[str, float] = {}
    queries_spread: dict[str, dict] = {}
    import gc

    def _cooldown():
        # release cached/checkpointed blocks and dropped DataFrames so
        # one run's heap pressure doesn't tax the next (shared
        # local-mode JVM; real clusters isolate executors), and take the
        # JVM GC pause HERE between reps instead of letting it land inside
        # a random timed rep (a single full GC is a large fraction of a
        # rep's wall at this corpus size)
        spark.catalog.clearCache()
        gc.collect()
        spark._jvm.System.gc()

    # --- representative operator queries ------------------------------------
    if os.environ.get("SPARK_GRAFT_SKIP_QUERIES", "0") != "1":
        import __spark_entry__ as entrymod

        qmap = entrymod.queries()
        # warm JVM codegen/shuffle paths so the first query's number is the
        # query, not the JIT
        spark.range(100000).selectExpr("id", "id % 7 AS k") \
            .groupBy("k").count().count()
        # cheapest first: the first query also pays residual one-time costs,
        # so don't let it distort an expensive operator's number
        # queries whose first rep pays a large one-time PER-WORKER cost
        # get one discarded pass (the headline's own protocol):
        # text_encode_pack's 32 python workers each build the tokenizer
        # trie on their first encode — probe attribution in
        # BENCH/ENCODE_PACK_REPS_r7.json: rep 0 = 10.2 s with the LEAST
        # GC (26 ms), reps 1-7 = 2.4-3.2 s — a warmup artifact, not GC
        # and not the operator (at 100 TB the per-worker build amortizes
        # to nothing)
        warm_first = {"text_encode_pack"}
        for name in ["text_quality_score", "events_sessionize",
                     "ann_cosine_topk", "f4_semantic_units",
                     "dedup_minhash_signatures", "dedup_lsh_pairs",
                     "dedup_substring_winnow", "text_gopher_rules",
                     "tpch_q1_pricing",
                     "pipeline_clean_corpus", "text_encode_pack",
                     "warc_extract"]:
            if name in warm_first:
                qmap[name](spark, sf_dir).count()
                _cooldown()
            walls = []
            for _ in range(reps):
                t0 = time.time()
                qmap[name](spark, sf_dir).count()
                walls.append(time.time() - t0)
                _cooldown()
            queries[name] = round(median(walls), 3)
            queries_spread[name] = {
                "min": round(min(walls), 3), "max": round(max(walls), 3),
                "n": reps}

    # --- headline last: its ~GB of result strings pressures the shared
    # local-mode JVM heap, so the light queries run first
    spans = spark.read.parquet(corpus_path)
    popts = ParseOptions(num_partitions=0)

    # warm the scan cache + spawn/initialize Python workers
    spans.count()
    extract_documents(spans.limit(32), parse_options=popts).count()

    def timed_run():
        t0 = time.time()
        out = extract_documents(spans, parse_options=popts)
        agg = out.agg(
            F.countDistinct("doc_id").alias("docs"),
            F.sum(F.when(F.col("kind") == "chunk", 1).otherwise(0))
            .alias("chunks"),
            F.sum(F.when(F.col("offset") == 0, F.col("doc_total_pages"))
                  .otherwise(0)).alias("pages"),
            F.sum(F.when(F.col("offset") == 0, F.col("doc_bytes_decoded"))
                  .otherwise(0)).alias("bytes"),
            F.sum(F.when(F.col("offset") == 0, F.col("doc_parse_failures"))
                  .otherwise(0)).alias("failures"),
        ).collect()[0]
        return time.time() - t0, agg

    # one full-size discarded pass: the first full run pays one-time costs
    # (page cache, JIT at width, worker pool fill) that the limit(32)
    # warmup cannot reach — the claim is steady-state throughput
    timed_run()
    _cooldown()

    walls = []
    agg = None
    for _ in range(reps):
        w, a = timed_run()
        walls.append(w)
        agg = a  # counts are identical across runs
        _cooldown()
    e2e = median(walls)
    if headline is not None:
        # official number = the fresh-JVM run; the in-process rerun stays
        # visible as the composition-effect record
        queries["pipeline_extract"] = headline["value"]
        queries["pipeline_extract_inproc"] = round(e2e, 3)
        queries_spread["pipeline_extract_inproc"] = {
            "min": round(min(walls), 3), "max": round(max(walls), 3),
            "n": reps}
        e2e = headline["value"]
    else:
        queries["pipeline_extract"] = round(e2e, 3)
        queries_spread["pipeline_extract"] = {
            "min": round(min(walls), 3), "max": round(max(walls), 3),
            "n": reps}

    # --- chunk-size matrix: maxTokens ∈ {256, 512, 1024}, minTokens =
    # floor(max*0.3), mirroring the reference's benchmark configs
    # (test/benchmark.js:22-29,42) with its token-distribution stats
    # (test/benchmark.js:78-92: min/max/avg/stddev/consistency)
    chunk_matrix = {}
    if os.environ.get("SPARK_GRAFT_MATRIX", "1") == "1" and \
            os.environ.get("SPARK_GRAFT_SKIP_QUERIES", "0") != "1":
        from fast_pdf_parser_spark.config import ChunkOptions

        # matrix reps match the main protocol: the max512 SF1 leg's 3-rep
        # spread (8.0-12.8 s, BENCH_SELF_r4) was wider than the effects
        # tracked round-over-round; 5 reps make a ~15% config regression
        # visible (r4 verdict, measurement item)
        matrix_reps = int(os.environ.get("SPARK_GRAFT_MATRIX_REPS",
                                         str(reps)))
        for mt in (256, 512, 1024):
            opts = ChunkOptions(max_tokens=mt, min_tokens=mt * 3 // 10)
            mwalls = []
            row = None
            for _ in range(matrix_reps):
                t0 = time.time()
                out = extract_documents(spans, opts, parse_options=popts)
                row = out.agg(
                    F.sum(F.when(F.col("kind") == "chunk", 1).otherwise(0))
                    .alias("chunks"),
                    F.min(F.when(F.col("kind") == "chunk",
                                 F.col("token_count"))).alias("tmin"),
                    F.max(F.when(F.col("kind") == "chunk",
                                 F.col("token_count"))).alias("tmax"),
                    F.avg(F.when(F.col("kind") == "chunk",
                                 F.col("token_count"))).alias("tavg"),
                    F.stddev_pop(F.when(F.col("kind") == "chunk",
                                        F.col("token_count"))).alias("tstd"),
                    F.sum(F.when((F.col("kind") == "chunk")
                                 & (F.col("token_count") >= opts.min_tokens),
                                 1).otherwise(0)).alias("ge_min"),
                    F.sum(F.when(F.col("offset") == 0,
                                 F.col("doc_total_pages")).otherwise(0))
                    .alias("pages"),
                ).collect()[0]
                mwalls.append(time.time() - t0)
                _cooldown()
            wall = median(mwalls)
            chunk_matrix[f"max{mt}"] = {
                "max_tokens": mt, "min_tokens": opts.min_tokens,
                "wall_sec": round(wall, 3),
                "wall_spread": {"min": round(min(mwalls), 3),
                                "max": round(max(mwalls), 3),
                                "n": matrix_reps},
                "pages_per_sec": round(row["pages"] / wall, 1),
                "chunks": int(row["chunks"]),
                "tok_min": int(row["tmin"]), "tok_max": int(row["tmax"]),
                "tok_avg": round(float(row["tavg"]), 1),
                "tok_std": round(float(row["tstd"]), 1),
                "consistency_pct": round(
                    (1 - float(row["tstd"]) / float(row["tavg"])) * 100, 1),
                "pct_ge_min": round(
                    100.0 * int(row["ge_min"]) / int(row["chunks"]), 1),
            }

    result = {
        "metric": "e2e_interleaved_extraction_wall_sec",
        "value": round(e2e, 3),
        "unit": "sec",
        "bench_protocol": {"stat": "median", "reps": reps},
        "queries": queries,
        "sf": sf_name,
        "cpus": cpus,
        "corpus_docs": int(agg["docs"]),
        "corpus_pages": int(agg["pages"]),
        "chunks": int(agg["chunks"]),
        "parse_failures": int(agg["failures"]),
        "decoded_mb": round(agg["bytes"] / 1e6, 2),
        "docs_per_sec": round(agg["docs"] / e2e, 1),
        "pages_per_sec": round(agg["pages"] / e2e, 1),
        "decoded_mb_per_sec": round(agg["bytes"] / 1e6 / e2e, 2),
        "cpu_control_mops": control_mops,
    }
    if headline is not None:
        # the headline's own same-moment control (measured in the fresh
        # process before ITS JVM started) — the pair to drift-correct
        # round-over-round headline ratios with:
        # (wall_a * ctl_a) / (wall_b * ctl_b)
        result["cpu_control_mops_headline"] = headline.get(
            "cpu_control_mops")
        result["headline_jvm"] = "fresh"
    # full detail (spread, chunk matrix) goes to a file; the stdout line
    # must stay compact — the driver tail-captures only the last ~2 kB.
    # The filename carries the config (sf + corpus size): a sf0.001 smoke
    # run must never clobber committed sf0.1 measurement evidence (it did
    # once — review finding, round 6)
    detail_file = os.path.join(
        REPO, "BENCH",
        f"BENCH_DETAIL_{sf_name}_{int(agg['docs'])}d.json")
    if headline is not None:
        # the fresh-JVM subprocess wrote its own detail (same filename,
        # SKIP_QUERIES form) — fold its headline spread in before we
        # overwrite the file with the full-phase detail. Guard: the file
        # must carry THIS subprocess's median (its own "value"); if the
        # subprocess's write failed, the path holds a PREVIOUS round's
        # committed detail and folding its spread in would attach stale
        # min/max evidence to the new headline.
        try:
            with open(detail_file) as f:
                sub_detail = json.load(f)
            sub_spread = sub_detail.get("queries_spread", {})
            if ("pipeline_extract" in sub_spread
                    and sub_detail.get("value") == headline["value"]):
                queries_spread["pipeline_extract"] = \
                    sub_spread["pipeline_extract"]
        except (OSError, ValueError):
            pass
    detail = dict(result, queries_spread=queries_spread,
                  chunk_matrix=chunk_matrix)
    try:
        with open(detail_file, "w") as f:
            json.dump(detail, f, indent=1)
        result["detail_file"] = os.path.relpath(detail_file, REPO)
    except OSError:
        pass  # read-only checkout: the compact line still carries headline
    spark.stop()
    line = json.dumps(result)
    assert len(line) < 1800, f"headline line grew to {len(line)} bytes"
    print(line)


if __name__ == "__main__":
    main()
