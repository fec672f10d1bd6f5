"""The Spark extraction pipeline: interleaved spans in → ordered chunk/media
spans out.

Spark-first design (SURVEY.md §3.1 "Spark lifecycle equivalent"):

- The input table has ONE ROW PER DOCUMENT with the span array inline, so the
  whole-document locality the 7 sequential passes need (SURVEY.md §2.7) is
  already present — the pipeline is a single ``mapInPandas`` stage with
  **zero shuffles**. No groupBy, no join, no sort: at 100 TB the only data
  movement is the optional salted repartition for skew.
- Everything crossing the JVM↔Python boundary moves as Arrow batches; the
  per-row work inside the UDF is the per-document sequential fold that
  defines the algorithm (the "loops inside a pandas UDF" contract,
  SURVEY.md §4).
- Column pruning: only (doc_id, spans) are selected before the UDF — Catalyst
  prunes the parquet scan to exactly those (the analogue of
  extract_positions=false/extract_fonts=false, hierarchical_chunker.cpp:562-563).
- Page-limit pushdown: offset-ordered ``F.slice(array_sort(spans), 1, N)``
  BEFORE the UDF — true pushdown the reference cannot do (it stops between
  thread-pool batches, src/hierarchical_chunker.cpp:592-594). The slice
  selects exactly the spans process_document would keep, regardless of the
  array's stored order.
- Skew: documents range from 1 to >1000 pages (chunk_test_summary.md:9-44).
  ``repartition_for_skew`` salts doc rows uniformly and AQE re-coalesces;
  ``arrow_max_records_per_batch`` bounds how many docs share one Arrow batch
  (the analogue of the reference's batch_size=10 / 50MB-per-page budget).

Interleaving contract (SURVEY.md §1.3, FIXTURES.md §2): per doc_id the output
is an ordered span sequence where each maximal RUN of text/pdf spans is
replaced by that run's chunks (media spans interrupt the text flow and act as
run boundaries) and media spans pass through unmodified at their
document-order positions. Output offsets are renumbered 0..n-1.

Error semantics: a pdf span that fails to lex never fails the document or the
job — the page is skipped for chunking (src/fast_pdf_parser.cpp:84-91
semantics), the error is counted in ``doc_parse_failures`` and the first
message kept in ``doc_error`` (analogue of the per-page error rows,
src/text_extractor.cpp:108-114). A document whose spans produce NO output
(every page failed, or blank/zero-page inputs only) emits a single
``kind='meta'`` row so its counters still reach ``results_meta`` — a doc
never silently vanishes.
"""

from __future__ import annotations

import base64

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from fast_pdf_parser_spark.config import ChunkOptions, ParseOptions
from fast_pdf_parser_spark.operators.chunker import chunk_pages
from fast_pdf_parser_spark.functions.tokenizer import get_tokenizer

# Output: one row per output span, plus ChunkResult metadata
# (hierarchical_chunker.h:19-26) and doc-level lineage metrics.
OUTPUT_DDL = (
    "doc_id string, offset int, kind string, text string, media_ref string, "
    "token_count int, start_page int, end_page int, "
    "has_major_heading boolean, min_heading_level int, "
    "overlap_text string, overlap_tokens int, "
    "doc_total_pages int, doc_parse_failures int, doc_bytes_decoded bigint, "
    "doc_error string"
)

_COLUMNS = [f.split(" ")[0] for f in OUTPUT_DDL.split(", ")]


def process_document(
    doc_id: str,
    spans,
    tokenizer,
    chunk_options: ChunkOptions,
) -> list[tuple]:
    """Pure-Python per-document fold: spans → output span rows.

    ``spans`` is an iterable of dict-like {kind, text, media_ref, offset}.
    Returns rows matching OUTPUT_DDL. Unit-testable without Spark.
    """
    # (offset, kind, text) — offset is THE document order; the null-safe
    # kind/text tiebreak only matters for (out-of-contract) duplicate
    # offsets and exists so the page-limit pushdown's comparator sort in
    # extract_documents keeps byte-identical span subsets (Spark's
    # comparator sort is not stable; Python's sorted() is)
    ordered = sorted(
        spans,
        key=lambda s: (s["offset"], s["kind"] or "", s["text"] or ""),
    )
    if chunk_options.page_limit > 0:
        ordered = ordered[: chunk_options.page_limit]

    out: list[tuple] = []
    run: list[tuple[str, int]] = []  # (page_text, page_number=input offset)
    total_pages = 0
    parse_failures = 0
    bytes_decoded = 0
    first_error: str | None = None

    def flush_run() -> None:
        nonlocal run
        if not run:
            return
        chunks = chunk_pages(run, tokenizer, chunk_options)
        for c in chunks:
            out.append(
                (doc_id, -1, "chunk", c.text, None,
                 c.tokens, c.start_page, c.end_page,
                 c.has_major_heading, c.min_heading_level,
                 c.overlap_text or None, c.overlap_tokens)
            )
        run = []

    for s in ordered:
        kind = s["kind"]
        if kind == "media":
            flush_run()
            out.append(
                (doc_id, -1, "media", None, s["media_ref"],
                 None, None, None, None, None, None, None)
            )
        elif kind == "pdf":
            try:
                from fast_pdf_parser_spark.sources.pdf_lexer import (
                    extract_pdf_pages,
                )
                raw = base64.b64decode(s["text"])
                bytes_decoded += len(raw)
                pdf_pages = extract_pdf_pages(raw)
                # total_pages counts REAL pdf pages (ChunkingResult
                # semantics, hierarchical_chunker.h:29-35): a multi-page
                # pdf span contributes each page as its own chunking page
                # (page-boundary units), all sharing the span's offset
                total_pages += max(1, len(pdf_pages))
                for page_text in pdf_pages:
                    run.append((page_text, s["offset"]))
            except Exception as exc:  # error containment per page
                total_pages += 1
                parse_failures += 1
                if first_error is None:
                    first_error = f"page {s['offset']}: {exc}"
        elif kind == "text":
            total_pages += 1
            text = s["text"] or ""
            bytes_decoded += len(text.encode("utf-8"))
            run.append((text, s["offset"]))
        elif kind == "html":
            # HTML member of the main-content extraction family:
            # boilerplate strip + DOM heuristics (sources/html_extractor),
            # same per-span error containment as the pdf path
            total_pages += 1
            try:
                from fast_pdf_parser_spark.sources.html_extractor import (
                    html_main_content,
                )
                raw_html = s["text"] or ""
                bytes_decoded += len(raw_html.encode("utf-8"))
                run.append((html_main_content(raw_html), s["offset"]))
            except Exception as exc:
                parse_failures += 1
                if first_error is None:
                    first_error = f"page {s['offset']}: {exc}"
        else:
            # Unknown kinds pass through unmodified (forward-compat: never
            # reinterpret or drop data we don't understand at 10^12 docs).
            flush_run()
            out.append(
                (doc_id, -1, kind, s["text"], s["media_ref"],
                 None, None, None, None, None, None, None)
            )
    flush_run()

    if not out and ordered:
        # a document whose spans produced no output (every page failed to
        # parse, or zero-page/blank pages only) must NOT vanish: its meta
        # counters (pages seen, failures, first error) are the error-
        # containment contract. One kind='meta' row carries them.
        out.append((doc_id, -1, "meta", None, None,
                    None, None, None, None, None, None, None))

    doc_meta = (total_pages, parse_failures, bytes_decoded, first_error)
    return [
        row[:1] + (i,) + row[2:] + doc_meta for i, row in enumerate(out)
    ]


# Output-side memory bound for the fold: accumulated result rows are
# flushed as their own Arrow batch once their text payload crosses this
# many characters (or _FLUSH_ROWS rows). Without it, a 64-doc input batch
# of large documents holds EVERY doc's chunks in the Python worker until
# the whole batch is folded — peak RSS proportional to batch payload, not
# to the largest single document. The input side cannot be bounded below
# one row (a document is one row by design — whole-doc locality); this
# bounds everything the UDF itself adds on top. Measured by
# tools/giant_doc_probe.py (BENCH/GIANT_DOC_r4.json).
_FLUSH_CHARS = 32 << 20
_FLUSH_ROWS = 20_000


def _make_processor(chunk_options: ChunkOptions, vocab_path: str | None):
    def process_batches(batches):
        tokenizer = get_tokenizer(vocab_path)  # per-worker singleton
        for pdf in batches:
            rows: list[tuple] = []
            pending_chars = 0
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                doc_rows = process_document(
                    doc_id, spans, tokenizer, chunk_options
                )
                rows.extend(doc_rows)
                pending_chars += sum(len(r[3]) for r in doc_rows if r[3])
                if pending_chars >= _FLUSH_CHARS or len(rows) >= _FLUSH_ROWS:
                    yield pd.DataFrame(rows, columns=_COLUMNS)
                    rows, pending_chars = [], 0
            if rows:
                yield pd.DataFrame(rows, columns=_COLUMNS)

    return process_batches


def repartition_for_skew(df: DataFrame, num_partitions: int) -> DataFrame:
    """Salted uniform redistribution of doc rows.

    Documents cannot be split (the passes need whole-doc locality), so the
    best general strategy is statistically uniform placement of doc rows —
    ``repartition`` on a hash of doc_id — plus AQE coalescing of the small
    partitions afterwards. The arrow batch cap bounds per-batch memory.

    When the input is already well-distributed parquet, prefer
    ``num_partitions=0`` (no shuffle) and control task granularity with
    ``spark.sql.files.maxPartitionBytes`` instead: Spark packs small files
    into ~128MB splits by default, which can leave a small corpus with fewer
    tasks than cores (at 100 TB splits are plentiful and this is moot).
    """
    return df.repartition(num_partitions, F.xxhash64("doc_id"))


def extract_documents(
    df: DataFrame,
    chunk_options: ChunkOptions = ChunkOptions(),
    parse_options: ParseOptions = ParseOptions(),
    vocab_path: str | None = None,
) -> DataFrame:
    """documents(doc_id, spans) → output span rows (OUTPUT_DDL).

    The flagship operator: the Spark re-expression of
    HierarchicalChunker::chunk_file (src/hierarchical_chunker.cpp:552-634)
    over every document at once.
    """
    chunk_options.validate()
    spark = df.sparkSession
    spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch",
        str(parse_options.arrow_max_records_per_batch),
    )

    pruned = df.select("doc_id", "spans")
    if chunk_options.page_limit > 0:
        # true limit pushdown below the parse UDF (SURVEY.md §4): keep only
        # the first N spans per document before any decoding happens.
        # "First" means offset order — the same order process_document uses —
        # so the array is sorted by offset before slicing (stored order is
        # not guaranteed). Like process_document, the limit counts spans of
        # every kind including media: the limit bounds per-doc work, and a
        # media span occupies a document-order slot just as a page does.
        def span_cmp(a, b):
            # same (offset, kind, text) key as process_document's sorted():
            # a deterministic tiebreak keeps the limited span subset
            # byte-identical to the unlimited path even for duplicate
            # offsets (comparator sorts are not stable)
            ka, kb = (F.coalesce(x["kind"], F.lit("")) for x in (a, b))
            ta, tb = (F.coalesce(x["text"], F.lit("")) for x in (a, b))
            return (
                F.when(a["offset"] < b["offset"], F.lit(-1))
                .when(a["offset"] > b["offset"], F.lit(1))
                .when(ka < kb, F.lit(-1)).when(ka > kb, F.lit(1))
                .when(ta < tb, F.lit(-1)).when(ta > tb, F.lit(1))
                .otherwise(F.lit(0))
            )

        by_offset = F.array_sort("spans", span_cmp)
        pruned = pruned.withColumn(
            "spans", F.slice(by_offset, 1, chunk_options.page_limit)
        )
    if parse_options.num_partitions > 0:
        pruned = repartition_for_skew(pruned, parse_options.num_partitions)

    if vocab_path is None:
        # resolve the vocab ONCE, on the driver, and thread the explicit
        # path into the UDF closure: per-worker discovery (env var / data
        # dir) can resolve differently on executors than on the driver,
        # silently mixing two tokenizations within one job. An explicit
        # path an executor cannot read fails loudly instead.
        from fast_pdf_parser_spark.functions.tokenizer import find_real_vocab

        vocab_path = find_real_vocab()

    return pruned.mapInPandas(
        _make_processor(chunk_options, vocab_path), schema=OUTPUT_DDL
    )


def to_span_table(result: DataFrame) -> DataFrame:
    """Re-nest exploded output rows into the FIXTURES.md §2 golden shape:
    expected_spans(doc_id, spans array<struct<kind,text,media_ref,offset>>)."""
    span = F.struct(
        F.col("kind"), F.col("text"), F.col("media_ref"), F.col("offset")
    )
    return (
        result.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("offset", span.alias("s"))))
             .alias("ordered"))
        .select(
            "doc_id",
            F.transform(F.col("ordered"), lambda x: x["s"]).alias("spans"),
        )
    )


def results_meta(result: DataFrame) -> DataFrame:
    """Per-doc aggregate mirroring ChunkingResult
    (hierarchical_chunker.h:29-35): total_pages, total_chunks."""
    return result.groupBy("doc_id").agg(
        F.first("doc_total_pages").alias("total_pages"),
        F.sum(F.when(F.col("kind") == "chunk", 1).otherwise(0))
        .cast("int").alias("total_chunks"),
        F.first("doc_parse_failures").alias("parse_failures"),
        F.first("doc_bytes_decoded").alias("bytes_decoded"),
    )
