"""Distributed BPE vocabulary training (Sennrich et al. 2016).

Two forms share one semantics (greedy leftmost-first merges over the
word-frequency table, '·' end-of-word marker, (count DESC, pair ASC)
tiebreak — pinned against an independent imperative reference in
tests/test_bpe_winnow.py):

- ``relational.bpe_train_sql(steps)``: one SQL statement, the
  oracle/driver-row form (``tokenizer_bpe_train``). Spark INLINES
  deterministic CTEs, so each iteration's ~3 references compound: at 3
  steps the plan re-derives the word table ~3^3 times. Fine for a few
  steps and for DuckDB (which materializes CTEs); wrong shape for a real
  vocabulary run.
- ``train_bpe(spark, docs, steps)`` (this module): the production shape —
  the corpus collapses ONCE to the word-frequency table, the symbol table
  is localCheckpoint'ed each iteration (vocabulary-sized: ~O(sqrt corpus)
  rows; the 100 TB corpus is read exactly once), so every step is a
  linear plan over a few-GB relation, and the only driver transfer is the
  ONE-ROW argmax per step. steps=50k is the same loop, not a bigger plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _persistent_ids(spark: SparkSession) -> set[int]:
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        return set(jmap.keySet().toArray())
    except AttributeError:  # API moved: degrade, never fail training
        return set()


def _release_rdds(spark: SparkSession, ids: set[int]) -> None:
    if not ids:
        return
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for i in ids:
            rdd = jmap.get(i)
            if rdd is not None:
                rdd.unpersist()
    except AttributeError:
        pass


def train_bpe(spark: SparkSession, docs: DataFrame,
              steps: int, on_step=None) -> list[tuple[str, int]]:
    """Learn ``steps`` BPE merges from ``docs`` (needs a ``text`` column).

    Returns [(merged_symbol, pair_count), ...] in merge order. Stops
    early if no pair remains (fully merged corpus). ``on_step(k,
    wall_sec)`` — optional instrumentation hook invoked after each
    completed merge (tools/bpe_depth_probe.py records per-step walls and
    executor storage with it; None costs nothing).
    """
    import time
    wfreq = (docs.select(F.explode(F.split("text", " ")).alias("w"))
             .filter("w <> ''")
             .groupBy("w").agg(F.count("*").alias("freq"))
             .selectExpr("w || '·' AS word", "freq"))
    syms = (wfreq
            .select("word", "freq",
                    F.explode(F.expr("sequence(1, length(word))"))
                     .alias("i"))
            .withColumn("sym", F.expr("substr(word, i, 1)")))

    w_doc = Window.partitionBy("word").orderBy("i")
    merges: list[tuple[str, int]] = []
    prev_ids: set[int] = set()
    for _k in range(steps):
        _t0 = time.time()
        # eager, vocab-sized: cuts the per-step lineage so plan depth and
        # re-computation stay constant across iterations. The PREVIOUS
        # step's checkpoint blocks are released explicitly — without this
        # they linger until driver GC + ContextCleaner happen to reclaim
        # them, so a deep vocabulary run (steps=50k) would grow executor
        # storage linearly with steps instead of O(1). DataFrame
        # .unpersist() does NOT release localCheckpoint blocks (it only
        # talks to the SQL cache manager), so the release goes through
        # the persistent-RDD map; a guarded reach-in like clusters.py's
        # pinned _jdf use — if the API moves, we degrade to the old
        # GC-eventually behavior rather than fail the training run.
        before = _persistent_ids(spark)
        syms = syms.localCheckpoint()
        new_ids = _persistent_ids(spark) - before
        _release_rdds(spark, prev_ids)
        prev_ids = new_ids
        e = syms.withColumn("nxt", F.lead("sym").over(w_doc))
        top = (e.where("nxt IS NOT NULL")
               .groupBy("sym", "nxt").agg(F.sum("freq").alias("cnt"))
               .orderBy(F.desc("cnt"), F.asc("sym"), F.asc("nxt"))
               .limit(1).collect())          # the one-row argmax
        if not top:
            break
        b1, b2, cnt = top[0]["sym"], top[0]["nxt"], int(top[0]["cnt"])
        merges.append((b1 + b2, cnt))

        # Greedy leftmost-first merge application as PURE WINDOW algebra
        # over one (word ORDER BY i) pass — deliberately join-free. The
        # original form applied merges via two (word, i) self-joins;
        # correct, but Catalyst's size estimator MULTIPLIES join
        # children's sizeInBytes (BigInt) and localCheckpoint PRESERVES
        # the origin statistics, so the estimate compounds ~squared per
        # step and by merge ~15 the driver spends minutes per step
        # inside BigInteger.multiplyToomCook3 during planning (found by
        # the depth probe, r9). Window/filter/project nodes only scale
        # stats by bounded factors, so this form holds O(1) planning at
        # any merge count — and drops two shuffle joins per step.
        #
        # Semantics (pinned vs the imperative greedy reference at depth
        # 8 and vs the relational twin's oracle at depths 3 and 8):
        # positions i are consecutive within a word (renumbered every
        # step), so a run of consecutive merge candidates starts where
        # flag rises, and within a run the leftmost-first rule keeps
        # even offsets from the run start ('aaaa' overlap rule); the
        # follower of every applied merge is consumed (lag).
        applied = (
            e.withColumn(
                "flag",
                F.coalesce((F.col("sym") == F.lit(b1))
                           & (F.col("nxt") == F.lit(b2)), F.lit(False)))
            .withColumn(
                "run_start",
                F.col("flag") & ~F.coalesce(F.lag("flag").over(w_doc),
                                            F.lit(False)))
            .withColumn(
                "last_start",
                F.max(F.when(F.col("run_start"), F.col("i")))
                .over(w_doc.rowsBetween(Window.unboundedPreceding,
                                        Window.currentRow)))
            .withColumn(
                "is_merge",
                F.col("flag")
                & (((F.col("i") - F.col("last_start")) % 2) == 0))
            .withColumn(
                "after_merge",
                F.coalesce(F.lag("is_merge").over(w_doc), F.lit(False)))
        )
        syms = (applied
                .where(~F.col("after_merge"))  # drop consumed followers
                .select("word", "freq",
                        F.when(F.col("is_merge"), F.concat("sym", "nxt"))
                         .otherwise(F.col("sym")).alias("sym"),
                        F.col("i").alias("old_i"))
                .withColumn("i", F.row_number().over(
                    Window.partitionBy("word").orderBy("old_i")))
                .drop("old_i"))
        if on_step is not None:
            on_step(_k, time.time() - _t0)
    return merges
