"""Checkpoint/resume tests: per-partition lineage rows, crash simulation,
resume-from-partition via anti-join, idempotent re-runs."""

import pandas as pd
import pytest

from fast_pdf_parser_spark.plans.checkpoint import (
    completed_buckets,
    lineage,
    run_with_checkpoint,
    with_bucket,
)
from fast_pdf_parser_spark.sources.synth import SPANS_DDL, iter_docs


@pytest.fixture(scope="module")
def corpus(spark):
    docs = list(iter_docs(30, seed=7))
    return spark.createDataFrame(pd.DataFrame(docs), schema=SPANS_DDL)


def test_bucket_assignment_stable(spark, corpus):
    a = {r.doc_id: r.bucket for r in with_bucket(corpus, 8).collect()}
    b = {r.doc_id: r.bucket
         for r in with_bucket(corpus.repartition(13), 8).collect()}
    assert a == b  # content-derived, independent of physical layout


def test_crash_and_resume(spark, corpus, tmp_path):
    out = str(tmp_path / "run")
    n_buckets = 4

    # first attempt crashes on the 3rd bucket (sequential mode so exactly
    # the buckets before the crash are durable)
    with pytest.raises(RuntimeError, match="simulated failure"):
        run_with_checkpoint(spark, corpus, out, run_id="r1",
                            num_buckets=n_buckets, fail_on_bucket=2,
                            max_concurrent_buckets=1)
    done_before = completed_buckets(spark, out + "/checkpoint", "r1")
    assert done_before == {0, 1}

    # resume completes only the remaining buckets
    result = run_with_checkpoint(spark, corpus, out, run_id="r1",
                                 num_buckets=n_buckets)
    done_after = completed_buckets(spark, out + "/checkpoint", "r1")
    assert done_after == {0, 1, 2, 3}

    # output covers every doc exactly once
    n_docs = result.select("doc_id").distinct().count()
    assert n_docs == corpus.count()

    # lineage metrics are populated and per-bucket
    lin = lineage(spark, out).filter("run_id = 'r1'").collect()
    assert sorted(r.partition_id for r in lin) == [0, 1, 2, 3]
    assert all(r.status == "done" and r.wall_ms >= 0 for r in lin)
    assert sum(r.docs_parsed for r in lin) == n_docs
    assert all(r.bytes_decoded > 0 for r in lin)


def test_rerun_is_noop(spark, corpus, tmp_path):
    out = str(tmp_path / "run2")
    run_with_checkpoint(spark, corpus, out, run_id="r2", num_buckets=2)
    lin1 = lineage(spark, out).count()
    run_with_checkpoint(spark, corpus, out, run_id="r2", num_buckets=2)
    assert lineage(spark, out).count() == lin1  # nothing re-processed


def test_matches_direct_pipeline(spark, corpus, tmp_path):
    from fast_pdf_parser_spark.operators.pipeline import extract_documents

    out = str(tmp_path / "run3")
    ck = run_with_checkpoint(spark, corpus, out, run_id="r3", num_buckets=3)
    direct = extract_documents(corpus)
    key = ["doc_id", "offset", "kind", "text", "media_ref"]
    a = sorted(tuple(r) for r in ck.select(*key).collect())
    b = sorted(tuple(r) for r in direct.select(*key).collect())
    assert a == b


def test_concurrent_crash_and_resume(spark, corpus, tmp_path):
    """With concurrent buckets, a crash still never records a lineage row
    for the failed bucket, and resume completes exactly the missing ones."""
    out = str(tmp_path / "run_cc")
    with pytest.raises(RuntimeError, match="simulated failure"):
        run_with_checkpoint(spark, corpus, out, run_id="cc",
                            num_buckets=4, fail_on_bucket=1,
                            max_concurrent_buckets=3)
    done = completed_buckets(spark, out + "/checkpoint", "cc")
    assert 1 not in done  # the failed bucket is never 'done'

    result = run_with_checkpoint(spark, corpus, out, run_id="cc",
                                 num_buckets=4, max_concurrent_buckets=3)
    assert completed_buckets(spark, out + "/checkpoint", "cc") == {0, 1, 2, 3}
    assert result.select("doc_id").distinct().count() == corpus.count()
    # exactly one lineage row per bucket despite concurrency
    lin = lineage(spark, out).filter("run_id = 'cc'")
    assert sorted(r.partition_id for r in lin.collect()) == [0, 1, 2, 3]


def test_staged_copy_cleaned_up_after_completion(spark, corpus, tmp_path):
    """ADVICE r3: the staged bucketed copy must not outlive the run — it
    doubles input-sized storage per run configuration otherwise."""
    import os

    out = str(tmp_path / "run_clean")
    run_with_checkpoint(spark, corpus, out, run_id="rc", num_buckets=2)
    assert not os.path.exists(os.path.join(out, "staged", "rc_b2"))
    # ...while the actual output and checkpoint remain durable
    assert os.path.exists(os.path.join(out, "spans"))
    assert os.path.exists(os.path.join(out, "checkpoint"))


def test_staged_copy_survives_crash_for_resume(spark, corpus, tmp_path):
    """Cleanup happens only after ALL pending buckets complete: a crashed
    run keeps the staged copy so the resume doesn't pay a second full
    scan+write of the input."""
    import os

    out = str(tmp_path / "run_crash_keep")
    with pytest.raises(RuntimeError, match="simulated failure"):
        run_with_checkpoint(spark, corpus, out, run_id="rk", num_buckets=3,
                            fail_on_bucket=1, max_concurrent_buckets=1)
    assert os.path.exists(os.path.join(out, "staged", "rk_b3", "_SUCCESS"))
    run_with_checkpoint(spark, corpus, out, run_id="rk", num_buckets=3)
    assert not os.path.exists(os.path.join(out, "staged", "rk_b3"))


def test_clean_corpus_write_crash_and_resume(spark, tmp_path):
    """write_clean_corpus end-to-end: a crash mid-write resumes with no
    duplicates and no losses (bucket anti-join idiom), the written corpus
    equals the direct final_keep=1 query, lineage covers every bucket,
    and the gates staging does not outlive the run."""
    import os

    import pytest

    import __spark_entry__ as entrymod
    from fast_pdf_parser_spark.operators.relational import spark_sql
    from fast_pdf_parser_spark.plans.checkpoint import (
        lineage,
        write_clean_corpus,
    )

    sf = "/root/testdata/sf0.001"
    if not os.path.exists(os.path.join(sf, "documents.parquet")):
        pytest.skip("driver testdata not present")
    entrymod._prepare(spark, sf)

    out = str(tmp_path / "clean_run")
    with pytest.raises(RuntimeError, match="simulated failure"):
        write_clean_corpus(spark, out, run_id="cw", num_buckets=3,
                           fail_on_bucket=1)
    # crashed run keeps the staged gates for the resume
    assert os.path.exists(os.path.join(out, "gates", "cw_b3", "_SUCCESS"))

    clean = write_clean_corpus(spark, out, run_id="cw", num_buckets=3)
    got = [r.doc_id for r in clean.select("doc_id").collect()]
    want = {r.doc_id for r in
            spark.sql(spark_sql("pipeline_clean_corpus"))
            .filter("final_keep = 1").select("doc_id").collect()}
    assert len(got) == len(set(got)), "duplicate docs after resume"
    assert set(got) == want, "written corpus != final_keep=1 set"
    # split is a real partition column on the artifact
    assert set(clean.select("split").distinct().toPandas()["split"]) <= {
        "train", "val", "test"}
    # lineage: one done row per bucket; gates staging collected
    done = lineage(spark, out).filter("status = 'done'")
    assert {r.partition_id for r in done.collect()} == {0, 1, 2}
    assert not os.path.exists(os.path.join(out, "gates", "cw_b3"))
    # idempotent no-op rerun: same corpus, nothing rewritten as dupes
    again = write_clean_corpus(spark, out, run_id="cw", num_buckets=3)
    assert again.count() == len(got)


def test_clean_corpus_all_filtered_reads_back_empty(spark, tmp_path):
    """A corpus where NO document reaches final_keep=1 must still complete
    durably and read back as an EMPTY DataFrame with the real schema —
    not crash schema inference over _SUCCESS-only bucket dirs."""
    import pandas as pd

    from fast_pdf_parser_spark.plans.checkpoint import write_clean_corpus

    # every doc fails the >=50-words quality gate
    docs = pd.DataFrame({
        "doc_id": range(6),
        "source": ["s"] * 6,
        "text": ["too short to pass"] * 6,
    })
    spark.createDataFrame(docs).createOrReplaceTempView("documents")
    out = str(tmp_path / "clean_empty")
    clean = write_clean_corpus(spark, out, run_id="ce", num_buckets=2)
    assert clean.count() == 0
    assert set(clean.columns) >= {"doc_id", "source", "split", "clean_text"}


def test_orphaned_staged_dir_collected_on_noop_resume(spark, corpus, tmp_path):
    """ADVICE r4: a crash AFTER the last bucket's lineage append but BEFORE
    staged cleanup leaves pending=[] on resume — the resume must still
    delete the orphaned staged directory, not skip cleanup."""
    import os

    out = str(tmp_path / "run_orphan")
    run_with_checkpoint(spark, corpus, out, run_id="ro", num_buckets=2)
    # simulate the crash window: resurrect the staged dir post-completion
    staged = os.path.join(out, "staged", "ro_b2")
    os.makedirs(staged)
    with open(os.path.join(staged, "_SUCCESS"), "w"):
        pass
    run_with_checkpoint(spark, corpus, out, run_id="ro", num_buckets=2)
    assert not os.path.exists(staged)


def test_fs_probes_are_scheme_aware(spark, tmp_path):
    """The existence probes go through the Hadoop FileSystem API (resolved
    per path scheme) — a driver-local os.path check is blind on HDFS/S3
    and turned missing-visibility into silent empty output (ADVICE r3)."""
    from fast_pdf_parser_spark.plans.checkpoint import (
        _fs_delete,
        _fs_exists,
        _list_staged_buckets,
    )

    d = tmp_path / "probe"
    d.mkdir()
    (d / "bucket=0").mkdir()
    (d / "bucket=3").mkdir()
    (d / "notabucket").mkdir()
    # explicit scheme-qualified path exercises the scheme resolution path
    uri = "file://" + str(d)
    assert _fs_exists(spark, uri)
    assert _list_staged_buckets(spark, uri) == {0, 3}
    _fs_delete(spark, uri)
    assert not d.exists()
    assert not _fs_exists(spark, uri)


def test_empty_bucket_is_known_empty_not_lost(spark, tmp_path):
    """A bucket with no documents still gets a lineage row (docs=0) and
    contributes no rows — distinguishable from data loss because every
    document lands in exactly one bucket of the output."""
    import pandas as pd

    from fast_pdf_parser_spark.sources.synth import SPANS_DDL, iter_docs

    docs = list(iter_docs(3, seed=11))  # 3 docs over 16 buckets
    tiny = spark.createDataFrame(pd.DataFrame(docs), schema=SPANS_DDL)
    out = str(tmp_path / "run_sparse")
    result = run_with_checkpoint(spark, tiny, out, run_id="rs",
                                 num_buckets=16)
    assert result.select("doc_id").distinct().count() == 3
    lin = lineage(spark, out).collect()
    assert len(lin) == 16
    assert sum(r.docs_parsed for r in lin) == 3
    assert sum(1 for r in lin if r.docs_parsed == 0) == 13


def _mini_documents(spark, n=24):
    """Tiny documents view with enough distinct words for band tests."""
    import pandas as pd

    rows = []
    for i in range(n):
        words = [f"w{i}x{j}" for j in range(12)] + ["common", "tail"]
        rows.append({"doc_id": i, "source": f"s{i % 3}",
                     "text": " ".join(words)})
    df = spark.createDataFrame(pd.DataFrame(rows))
    df.createOrReplaceTempView("documents")
    return df


def test_band_sink_stored_equals_derived(spark, tmp_path):
    """write_docs_bucketed(write_bands=True): the persisted band table is
    row-identical to band_signatures_spark_sql derived from the written
    corpus — ONE band definition shared by sink and serve (r7 verdict #1:
    stored bands must never drift from what on-read derivation yields)."""
    from fast_pdf_parser_spark.operators.relational import (
        _HASH60_SPARK,
        band_signatures_spark_sql,
        near_incremental_spark_sql,
        near_incremental_stored_spark_sql,
    )
    from fast_pdf_parser_spark.plans.checkpoint import (
        read_band_table,
        write_docs_bucketed,
    )

    _mini_documents(spark)
    h = _HASH60_SPARK.format(x="text")
    prev = spark.sql(f"""
        SELECT doc_id, source, 'train' AS split,
               {h} AS clean_hash, text AS clean_text
        FROM documents WHERE doc_id % 2 = 0""")
    out = str(tmp_path / "band_sink")
    corpus = write_docs_bucketed(spark, prev, out, run_id="b1",
                                 num_buckets=3, write_bands=True)
    corpus.createOrReplaceTempView("band_corpus")
    stored = read_band_table(spark, out)
    derived = spark.sql(band_signatures_spark_sql("band_corpus"))
    s = sorted((r.doc_id, r.band, r.band_key)
               for r in stored.collect())
    d = sorted((r.doc_id, r.band, r.band_key)
               for r in derived.collect())
    assert s == d and len(s) == corpus.count() * 4  # 16 seeds / 4 per band

    # and the two near-incremental forms (stored-band vs derived-on-read)
    # produce byte-identical verdicts over the same sink
    stored.createOrReplaceTempView("band_corpus_bands")
    via_store = spark.sql(near_incremental_stored_spark_sql(
        "band_corpus", "band_corpus_bands")).collect()
    via_derive = spark.sql(
        near_incremental_spark_sql("band_corpus")).collect()
    key = lambda r: (r.doc_id, r.near_in_corpus, r.best_jaccard_x1e4)  # noqa: E731
    assert sorted(map(key, via_store)) == sorted(map(key, via_derive))

    # and the PRUNED probe (r8 verdict #1 — the serve path the driver
    # row uses) yields the same verdicts as the full-scan form, on both
    # the key-pushdown shape and the big-batch semi-join fallback
    from fast_pdf_parser_spark.operators.relational import (
        near_batch_spark_sql,
        near_verdict_prebanded_sql,
    )
    from fast_pdf_parser_spark.plans.checkpoint import probe_band_table

    spark.sql(near_batch_spark_sql()).createOrReplaceTempView("bc_batch")
    bb = spark.sql(band_signatures_spark_sql("bc_batch", text_col="text"))
    bb.createOrReplaceTempView("bc_batch_bands")
    for max_keys in (4096, 1):  # pushdown path, then semi-join fallback
        probe_band_table(spark, out, bb, max_pushdown_keys=max_keys) \
            .createOrReplaceTempView("bc_bands_pruned")
        via_pruned = spark.sql(near_verdict_prebanded_sql(
            "bc_batch", "bc_batch_bands",
            "band_corpus", "bc_bands_pruned")).collect()
        assert sorted(map(key, via_pruned)) == sorted(map(key, via_store))


def test_band_sink_crash_resume_and_empty_bucket(spark, tmp_path):
    """Bands ride the bucket crash story: a crash re-processes the bucket
    (bands rewritten with the data, no dupes), and an all-empty corpus
    reads back an empty band table with the real schema."""
    import pandas as pd
    import pytest as _pytest

    from fast_pdf_parser_spark.plans.checkpoint import (
        read_band_table,
        write_docs_bucketed,
    )

    _mini_documents(spark)
    from fast_pdf_parser_spark.operators.relational import _HASH60_SPARK
    h = _HASH60_SPARK.format(x="text")
    prev = spark.sql(f"""
        SELECT doc_id, source, 'train' AS split,
               {h} AS clean_hash, text AS clean_text
        FROM documents WHERE doc_id % 2 = 0""")
    out = str(tmp_path / "band_crash")
    with _pytest.raises(RuntimeError, match="simulated failure"):
        write_docs_bucketed(spark, prev, out, run_id="bc", num_buckets=3,
                            write_bands=True, fail_on_bucket=1)
    corpus = write_docs_bucketed(spark, prev, out, run_id="bc",
                                 num_buckets=3, write_bands=True)
    stored = read_band_table(spark, out)
    assert stored.count() == corpus.count() * 4
    per_doc = stored.groupBy("doc_id").count().collect()
    assert all(r["count"] == 4 for r in per_doc), "dupe bands after resume"

    # empty corpus: durable empty band table, real schema
    empty = spark.createDataFrame(
        pd.DataFrame(columns=["doc_id", "source", "split", "clean_hash",
                              "clean_text"]).astype(
            {"doc_id": "int64", "clean_hash": "int64"}),
        schema=("doc_id bigint, source string, split string, "
                "clean_hash bigint, clean_text string"))
    out2 = str(tmp_path / "band_empty")
    write_docs_bucketed(spark, empty, out2, run_id="be", num_buckets=2,
                        write_bands=True)
    eb = read_band_table(spark, out2)
    assert eb.count() == 0
    assert set(eb.columns) == {"doc_id", "band", "band_key", "bkp",
                               "bucket"}


def test_bandless_rewrite_drops_stale_band_buckets(spark, tmp_path):
    """A later write_bands=False run over a sink that previously wrote
    bands must not leave day-old signatures next to the new clean data —
    the invariant is bands-match-clean OR bands-absent, never
    bands-for-documents-that-no-longer-exist."""
    from fast_pdf_parser_spark.operators.relational import _HASH60_SPARK
    from fast_pdf_parser_spark.plans.checkpoint import (
        read_band_table,
        write_docs_bucketed,
    )

    _mini_documents(spark)
    h = _HASH60_SPARK.format(x="text")
    day0 = spark.sql(f"""
        SELECT doc_id, source, 'train' AS split,
               {h} AS clean_hash, text AS clean_text
        FROM documents WHERE doc_id % 2 = 0""")
    out = str(tmp_path / "bandless_rewrite")
    write_docs_bucketed(spark, day0, out, run_id="day0",
                        num_buckets=3, write_bands=True)
    assert read_band_table(spark, out).count() > 0

    day1 = spark.sql(f"""
        SELECT doc_id, source, 'train' AS split,
               {h} AS clean_hash, text AS clean_text
        FROM documents WHERE doc_id % 2 = 1""")
    corpus = write_docs_bucketed(spark, day1, out, run_id="day1",
                                 num_buckets=3, write_bands=False)
    assert corpus.count() > 0
    assert read_band_table(spark, out).count() == 0  # no stale signatures


def _compact_fixture(spark, tmp_path, name):
    """A band-writing sink whose buckets carry MANY small part files
    (the after-N-increments shape compaction exists for)."""
    from fast_pdf_parser_spark.operators.relational import _HASH60_SPARK
    from fast_pdf_parser_spark.plans.checkpoint import write_docs_bucketed

    _mini_documents(spark)
    h = _HASH60_SPARK.format(x="text")
    docs = spark.sql(f"""
        SELECT doc_id, source, 'train' AS split,
               {h} AS clean_hash, text AS clean_text
        FROM documents""").repartition(8)
    out = str(tmp_path / name)
    # tiny split size while writing: the staged bucket read then fans
    # out to many tasks and every bucket lands MANY small part files —
    # the fragmented after-N-increments shape compaction exists for
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
    try:
        write_docs_bucketed(spark, docs, out, run_id="c0", num_buckets=3,
                            write_bands=True)
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
    return out


def _sink_state(spark, out):
    """(sorted clean rows, sorted band rows) — the content identity."""
    from fast_pdf_parser_spark.plans.checkpoint import read_band_table

    clean = spark.read.schema(
        "doc_id bigint, source string, clean_hash bigint, "
        "clean_text string, split string, bucket int"
    ).parquet(out + "/clean")
    rows = sorted((r.doc_id, r.split, r.clean_hash, r.clean_text)
                  for r in clean.collect())
    bands = sorted((r.doc_id, r.band, r.band_key)
                   for r in read_band_table(spark, out).collect())
    return rows, bands


def test_compaction_preserves_content_and_shrinks_files(spark, tmp_path):
    """compact_sink: every row (clean AND bands) survives byte-identically,
    stored==derived band equality holds post-compaction, file counts
    drop to ~target, and the lineage table gains 'compacted' rows that
    do NOT disturb resume (status filter is 'done')."""
    import glob as globmod

    from fast_pdf_parser_spark.operators.relational import (
        band_signatures_spark_sql,
    )
    from fast_pdf_parser_spark.plans.checkpoint import (
        compact_sink,
        completed_buckets,
        lineage,
    )

    out = _compact_fixture(spark, tmp_path, "compact_ok")
    before_rows, before_bands = _sink_state(spark, out)
    files_before = len(globmod.glob(out + "/clean/bucket=*/split=*/*.parquet"))

    compact_sink(spark, out, run_id="opt1")

    after_rows, after_bands = _sink_state(spark, out)
    assert after_rows == before_rows and len(after_rows) > 0
    assert after_bands == before_bands and len(after_bands) > 0
    files_after = len(globmod.glob(out + "/clean/bucket=*/split=*/*.parquet"))
    assert files_after < files_before
    assert files_after <= 3  # target_files(1) per (bucket, lone split)

    # stored == derived still holds over the compacted copy
    spark.read.parquet(out + "/clean").createOrReplaceTempView("cmp_corpus")
    derived = sorted(
        (r.doc_id, r.band, r.band_key)
        for r in spark.sql(
            band_signatures_spark_sql("cmp_corpus")).collect())
    assert derived == after_bands

    lin = lineage(spark, out)
    assert lin.filter("status = 'compacted' AND run_id = 'opt1'").count() == 3
    # resume still sees exactly the original 'done' rows
    assert completed_buckets(spark, out + "/checkpoint", "c0") == {0, 1, 2}


def test_compaction_handles_empty_bucket(spark, tmp_path):
    """compact_sink over a sink containing genuinely-empty buckets (the
    designed marker-only durable state write_docs_bucketed leaves,
    pinned by test_empty_bucket_is_known_empty_not_lost) must COMPLETE:
    the r9 code rewrote 0 rows into a part-less tmp dir whose
    schema-inferred verification read raised AnalysisException before
    the swap, and recovery + rerun re-crashed at the same point forever
    (advice r9). Empty buckets are skipped (nothing to compact, marker
    dir preserved); populated buckets compact normally and all content
    survives byte-identically."""
    from fast_pdf_parser_spark.operators.relational import _HASH60_SPARK
    from fast_pdf_parser_spark.plans.checkpoint import (
        compact_sink,
        lineage,
        write_docs_bucketed,
    )

    _mini_documents(spark, n=3)  # 3 docs over 16 buckets: most empty
    h = _HASH60_SPARK.format(x="text")
    docs = spark.sql(f"""
        SELECT doc_id, source, 'train' AS split,
               {h} AS clean_hash, text AS clean_text
        FROM documents""")
    out = str(tmp_path / "compact_empty")
    write_docs_bucketed(spark, docs, out, run_id="c0", num_buckets=16,
                        write_bands=True)
    before = _sink_state(spark, out)
    assert len(before[0]) == 3

    compact_sink(spark, out, run_id="opt_e")  # crashed pre-fix

    assert _sink_state(spark, out) == before
    # every populated bucket gained a 'compacted' lineage row; rerun of
    # the fleet stays convergent (idempotent over the empty tail)
    assert lineage(spark, out).filter(
        "status = 'compacted' AND run_id = 'opt_e'").count() >= 1
    compact_sink(spark, out, run_id="opt_e2")
    assert _sink_state(spark, out) == before


@pytest.mark.parametrize("fail_at", [
    "clean_staged", "clean_aside", "clean_promoted",
    "bands_staged", "bands_aside", "bands_promoted", "pre_lineage"])
def test_compaction_crash_matrix(spark, tmp_path, fail_at):
    """A crash at EVERY step of the swap protocol must lose nothing: the
    recovery prologue converges the bucket, and a rerun completes the
    compaction with content identical to the pre-crash sink."""
    from fast_pdf_parser_spark.plans.checkpoint import compact_bucket

    out = _compact_fixture(spark, tmp_path, f"compact_{fail_at}")
    before = _sink_state(spark, out)

    with pytest.raises(RuntimeError, match="simulated crash"):
        compact_bucket(spark, out, 1, run_id="opt", fail_at=fail_at)
    # whatever state the crash left, the CONTENT must still be readable
    # after recovery; rerun converges
    compact_bucket(spark, out, 1, run_id="opt")
    assert _sink_state(spark, out) == before


def test_train_bpe_releases_prior_checkpoints(spark):
    """functions/bpe.py: persistent-RDD count must stay bounded across
    merge steps (each iteration releases the previous checkpoint's
    blocks) — a deep vocabulary run is O(1) storage, not O(steps)."""
    from fast_pdf_parser_spark.functions.bpe import train_bpe

    sc = spark.sparkContext
    before = len(sc._jsc.getPersistentRDDs())
    docs = spark.createDataFrame(
        [(0, "low lower lowest low low"), (1, "newer new wide wider")],
        "doc_id long, text string")
    merges = train_bpe(spark, docs, 6)
    assert len(merges) == 6
    after = len(sc._jsc.getPersistentRDDs())
    # at most the final step's checkpoint may remain registered
    assert after - before <= 1
