"""StreamingChunker == batch pass chain, byte-for-byte, on arbitrary input.

``chunk_pages`` routes through ``StreamingChunker`` (the memory-bounded
page-at-a-time form); ``chunk_pages_batch`` keeps the literal whole-run
transcription of src/hierarchical_chunker.cpp:417-462. This file pins their
equivalence on adversarial random corpora — headings, blanks, list lines,
oversized single-line pages, every option knob — plus the incremental
contract: chunks returned early by push_page must be a prefix of the final
answer (a chunk, once surfaced, never changes).
"""

import string

from hypothesis import given, settings, strategies as st

from fast_pdf_parser_spark.config import ChunkOptions
from fast_pdf_parser_spark.functions.tokenizer import get_tokenizer
from fast_pdf_parser_spark.operators.chunker import (
    Chunk,
    StreamingChunker,
    chunk_pages,
    chunk_pages_batch,
)

TOK = get_tokenizer()

word = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8)
line = st.one_of(
    st.just(""),
    st.builds(lambda ws: " ".join(ws), st.lists(word, min_size=1, max_size=12)),
    st.builds(lambda lvl, ws: "#" * lvl + " " + " ".join(ws),
              st.integers(1, 4), st.lists(word, min_size=1, max_size=6)),
    st.builds(lambda ws: "- " + " ".join(ws), st.lists(word, min_size=1, max_size=6)),
    # one giant unbreakable line: exercises pass 6's can't-split floor
    st.builds(lambda w, n: w * n, word, st.integers(50, 400)),
)
page = st.builds(lambda ls: "\n".join(ls), st.lists(line, min_size=0, max_size=24))
pages_strategy = st.builds(
    lambda ps: [(p, i) for i, p in enumerate(ps)],
    st.lists(page, min_size=0, max_size=6),
)


def _fields(c: Chunk) -> tuple:
    return (
        c.text, c.tokens, c.start_page, c.end_page,
        c.overlap_text, c.overlap_tokens,
        c.has_major_heading, c.min_heading_level,
    )


@settings(max_examples=120, deadline=None)
@given(
    pages=pages_strategy,
    max_tokens=st.integers(16, 200),
    min_frac=st.floats(0.1, 1.0),
    overlap=st.integers(0, 12),
)
def test_streaming_equals_batch(pages, max_tokens, min_frac, overlap):
    opts = ChunkOptions(
        max_tokens=max_tokens,
        min_tokens=max(1, int(max_tokens * min_frac)),
        overlap_tokens=overlap,
    )
    expected = chunk_pages_batch(pages, TOK, opts)

    chunker = StreamingChunker(TOK, opts)
    streamed = []
    for text, page_num in pages:
        early = chunker.push_page(text, page_num)
        streamed.extend(early)
        # incremental contract: early chunks are a finalized prefix
        assert [_fields(c) for c in streamed] == [
            _fields(c) for c in expected[: len(streamed)]
        ]
    streamed.extend(chunker.finish())

    assert [_fields(c) for c in streamed] == [_fields(c) for c in expected]


@settings(max_examples=40, deadline=None)
@given(pages=pages_strategy, max_tokens=st.integers(16, 128))
def test_chunk_pages_is_streaming(pages, max_tokens):
    """chunk_pages (public driver) agrees with the batch transcription."""
    opts = ChunkOptions(max_tokens=max_tokens, min_tokens=max(1, max_tokens // 3))
    assert [_fields(c) for c in chunk_pages(pages, TOK, opts)] == [
        _fields(c) for c in chunk_pages_batch(pages, TOK, opts)
    ]


@settings(max_examples=80, deadline=None)
@given(
    lines_pages=st.lists(
        st.lists(
            st.one_of(
                line, st.just(""),
                # producer lines may EMBED newlines (PDF \n escapes, cmap
                # → U+000A): join+split flattens them — must round-trip
                st.builds(lambda a, b: a + "\n" + b, line, line),
                st.builds(lambda a: a + "\n", line),
            ),
            min_size=0, max_size=12),
        min_size=0, max_size=5),
    max_tokens=st.integers(16, 128),
)
def test_push_lines_equals_push_page(lines_pages, max_tokens):
    """push_lines(lines) must equal push_page('\\n'.join(lines)) on every
    page — including the join+split edge cases: embedded newlines flatten,
    a trailing empty line is absorbed, [''] and [] are empty pages."""
    opts = ChunkOptions(max_tokens=max_tokens, min_tokens=max(1, max_tokens // 3))
    via_text = StreamingChunker(TOK, opts)
    via_lines = StreamingChunker(TOK, opts)
    got_t, got_l = [], []
    for p, lines in enumerate(lines_pages):
        got_t.extend(via_text.push_page("\n".join(lines), p))
        got_l.extend(via_lines.push_lines(list(lines), p))
    got_t.extend(via_text.finish())
    got_l.extend(via_lines.finish())
    assert [_fields(c) for c in got_l] == [_fields(c) for c in got_t]


def test_streaming_state_is_bounded():
    """Pushing many pages keeps O(1) chunks of state in the chunker: the
    memory claim the pipeline's giant-doc bound rests on."""
    opts = ChunkOptions(max_tokens=64, min_tokens=16)
    chunker = StreamingChunker(TOK, opts)
    emitted = 0
    for i in range(500):
        emitted += len(chunker.push_page(f"# h{i}\n" + "word " * 200, i))
        # buffered-but-unfinalized chunks: cur5 + cur7 + tail7 + chunk3
        assert len(chunker._out) == 0  # push_page drained them
        pending = sum(
            x is not None
            for x in (chunker._cur5, chunker._cur7, chunker._tail7)
        )
        assert pending <= 3
    emitted += len(chunker.finish())
    assert emitted >= 500  # every page's content delivered, none stuck
