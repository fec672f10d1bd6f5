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


def train_bpe(spark: SparkSession, docs: DataFrame,
              steps: int) -> list[tuple[str, int]]:
    """Learn ``steps`` BPE merges from ``docs`` (needs a ``text`` column).

    Returns [(merged_symbol, pair_count), ...] in merge order. Stops
    early if no pair remains (fully merged corpus).
    """
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
    for _ in range(steps):
        # eager, vocab-sized: cuts the per-step lineage so plan depth and
        # re-computation stay constant across iterations
        syms = syms.localCheckpoint()
        e = syms.withColumn("nxt", F.lead("sym").over(w_doc))
        top = (e.where("nxt IS NOT NULL")
               .groupBy("sym", "nxt").agg(F.sum("freq").alias("cnt"))
               .orderBy(F.desc("cnt"), F.asc("sym"), F.asc("nxt"))
               .limit(1).collect())          # the one-row argmax
        if not top:
            break
        b1, b2, cnt = top[0]["sym"], top[0]["nxt"], int(top[0]["cnt"])
        merges.append((b1 + b2, cnt))

        cand = (e.where((F.col("sym") == F.lit(b1))
                        & (F.col("nxt") == F.lit(b2)))
                .select("word", "i")
                .withColumn("grp", F.col("i") - F.row_number().over(w_doc)))
        real = (cand
                .withColumn("off",
                            F.row_number().over(
                                Window.partitionBy("word", "grp")
                                .orderBy("i")) - 1)
                .where("off % 2 = 0").select("word", "i"))
        r_here = real.selectExpr("word AS rw", "i AS ri")
        r_prev = real.selectExpr("word AS pw", "i AS pi")
        syms = (e
                .join(r_here, (F.col("word") == F.col("rw"))
                      & (F.col("i") == F.col("ri")), "left")
                .join(r_prev, (F.col("word") == F.col("pw"))
                      & (F.col("i") == F.col("pi") + 1), "left")
                .where(F.col("pi").isNull())   # drop consumed followers
                .select("word", "freq",
                        F.when(F.col("ri").isNotNull(),
                               F.concat("sym", "nxt"))
                         .otherwise(F.col("sym")).alias("sym"),
                        F.col("i").alias("old_i"))
                .withColumn("i", F.row_number().over(
                    Window.partitionBy("word").orderBy("old_i")))
                .drop("old_i"))
    return merges
