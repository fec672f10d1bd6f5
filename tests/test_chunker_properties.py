"""Property-based tests (hypothesis) for the 7-pass chunker.

Invariants that must hold for ARBITRARY input documents — stronger than the
hand-built fixtures:

1. Content preservation: the concatenation of all chunk texts equals the
   concatenation of all semantic-unit texts (chunking moves boundaries, it
   never adds, drops, or reorders content).
2. Cap discipline: every chunk's packing-token count respects the caps the
   passes enforce — a chunk may exceed max_tokens only if it contains an
   unsplittable run (pass 6 splits only at line granularity and only at
   >=0.8*max) or came from pass 5's 1.1x allowance.
3. Page monotonicity: start_page <= end_page for every chunk with pages.
4. Determinism: chunking twice yields identical results.
"""

import string

from hypothesis import given, settings, strategies as st

from fast_pdf_parser_spark.config import ChunkOptions
from fast_pdf_parser_spark.functions.tokenizer import get_tokenizer
from fast_pdf_parser_spark.operators.chunker import (
    annotate_lines,
    chunk_pages,
    create_semantic_units,
)

TOK = get_tokenizer()

word = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8)
line = st.one_of(
    st.just(""),
    st.builds(lambda ws: " ".join(ws), st.lists(word, min_size=1, max_size=12)),
    st.builds(lambda lvl, ws: "#" * lvl + " " + " ".join(ws),
              st.integers(1, 4), st.lists(word, min_size=1, max_size=6)),
    st.builds(lambda ws: "- " + " ".join(ws), st.lists(word, min_size=1, max_size=6)),
    st.builds(lambda ws: "  " + " ".join(ws), st.lists(word, min_size=1, max_size=6)),
)
page = st.builds(lambda ls: "\n".join(ls), st.lists(line, min_size=0, max_size=30))
pages_strategy = st.builds(
    lambda ps: [(p, i) for i, p in enumerate(ps)],
    st.lists(page, min_size=0, max_size=5),
)


@settings(max_examples=60, deadline=None)
@given(pages=pages_strategy, max_tokens=st.integers(24, 200))
def test_content_preserved_and_caps(pages, max_tokens):
    opts = ChunkOptions(max_tokens=max_tokens,
                        min_tokens=max(1, max_tokens // 4),
                        overlap_tokens=0)
    chunks = chunk_pages(pages, TOK, opts)

    non_empty = [(t, p) for t, p in pages if t]
    units = create_semantic_units(annotate_lines(non_empty, TOK))
    expected_text = "".join(u.get_text() for u in units)

    # 1. content preservation
    assert "".join(c.text for c in chunks) == expected_text

    # 3. page monotonicity
    for c in chunks:
        if c.start_page != -1:
            assert c.start_page <= c.end_page

    # 2. cap discipline (the exact pass-6 guarantee,
    # hierarchical_chunker.cpp:324-344): a chunk can only end over max if
    # the line that pushed it past the cap arrived while the running total
    # was still < 0.8*max (split not allowed to fire) — which forces that
    # line to exceed max - 0.8*max = 0.2*max. So every over-cap chunk
    # must contain a witness line > 0.2*max; pass 7 never creates over-cap
    # chunks (strict <= max merges).
    for c in chunks:
        lines = c.text.split("\n")[:-1]
        packing_tokens = sum(TOK.count_tokens(l) for l in lines)
        if packing_tokens > max_tokens:
            assert any(
                TOK.count_tokens(l) > 0.2 * max_tokens for l in lines
            ), (c.text, packing_tokens)

    # 4. determinism
    again = chunk_pages(pages, TOK, opts)
    assert [(c.text, c.tokens, c.start_page, c.end_page) for c in chunks] == \
           [(c.text, c.tokens, c.start_page, c.end_page) for c in again]


@settings(max_examples=30, deadline=None)
@given(pages=pages_strategy)
def test_empty_and_blank_only_docs_yield_no_chunks(pages):
    blank_pages = [("", p) for _, p in pages]
    assert chunk_pages(blank_pages, TOK, ChunkOptions()) == []
