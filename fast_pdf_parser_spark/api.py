"""Convenience API mirroring the reference's public surface (§2.9).

The reference exposes ``chunkPdf(path, opts) -> ChunkingResult`` (index.js:8-11
via HierarchicalChunker.chunkFile, src/binding.cc:66-120) for one-document
use. The Spark engine's unit of work is a DataFrame, but single-document
ergonomics matter for parity and for debugging — these helpers run the exact
same pure-Python core the cluster pipeline runs, no SparkSession needed.

- ``chunk_pdf_bytes(data, options)``  — one PDF → ChunkingResult dict
  (chunkFile analogue; ``page_limit`` honored like
  src/hierarchical_chunker.cpp:592-594).
- ``chunk_markdown(text, options)``   — one markdown/plain-text document.
- ``chunk_document(spans, options)``  — one interleaved span list → output
  span rows (the per-document fold used by the pipeline).

Result shape mirrors ChunkingResult (hierarchical_chunker.h:29-35):
``{chunks: [{text, token_count, start_page, end_page, has_major_heading,
min_heading_level}], total_pages, total_chunks, processing_time_ms, error}``.
"""

from __future__ import annotations

import time

from fast_pdf_parser_spark.config import ChunkOptions
from fast_pdf_parser_spark.functions.tokenizer import get_tokenizer
from fast_pdf_parser_spark.operators.chunker import Chunk, chunk_pages


def _result(chunks: list[Chunk], total_pages: int, t0: float,
            error: str = "") -> dict:
    return {
        "chunks": [
            {
                "text": c.text,
                "token_count": c.tokens,
                "start_page": c.start_page,
                "end_page": c.end_page,
                "has_major_heading": c.has_major_heading,
                "min_heading_level": c.min_heading_level,
            }
            for c in chunks
        ],
        "total_pages": total_pages,
        "total_chunks": len(chunks),
        "processing_time_ms": int((time.time() - t0) * 1000),
        "error": error,
    }


def chunk_pdf_bytes(data: bytes, options: ChunkOptions = ChunkOptions(),
                    vocab_path: str | None = None) -> dict:
    """One PDF byte string → ChunkingResult dict (chunkFile analogue).

    Like the reference, a whole-document failure is reported in ``error``
    rather than raised (src/hierarchical_chunker.cpp:625-627)."""
    t0 = time.time()
    try:
        from fast_pdf_parser_spark.sources.pdf_lexer import (
            PdfDocument,
            extract_text_items,
            reconstruct_lines,
        )

        doc = PdfDocument(data)
        pages = []
        for i, page in enumerate(doc.pages()):
            if options.page_limit > 0 and i >= options.page_limit:
                break
            pages.append((reconstruct_lines(extract_text_items(doc, page)), i))
        chunks = chunk_pages(pages, get_tokenizer(vocab_path), options)
        return _result(chunks, len(pages), t0)
    except Exception as exc:
        return _result([], 0, t0, error=f"Error chunking PDF: {exc}")


def chunk_markdown(text: str, options: ChunkOptions = ChunkOptions(),
                   vocab_path: str | None = None,
                   page_number: int = 0) -> dict:
    """One markdown/plain-text document → ChunkingResult dict."""
    t0 = time.time()
    chunks = chunk_pages([(text, page_number)], get_tokenizer(vocab_path),
                         options)
    return _result(chunks, 1 if text else 0, t0)


def chunk_document(spans: list[dict],
                   options: ChunkOptions = ChunkOptions(),
                   doc_id: str = "doc",
                   vocab_path: str | None = None) -> list[tuple]:
    """One interleaved span list → output span rows (pipeline.OUTPUT_DDL
    order) — exactly what the cluster pipeline computes for this document."""
    from fast_pdf_parser_spark.operators.pipeline import process_document

    return process_document(doc_id, spans, get_tokenizer(vocab_path), options)
