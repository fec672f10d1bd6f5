"""Unit tests for the 7 chunker passes with hand-computed expectations.

A word-count stub tokenizer makes expected token counts trivially
hand-checkable; the passes only call count_tokens/_count_line_cached, so the
stub exercises the exact pass logic of src/hierarchical_chunker.cpp:142-462.
"""

from fast_pdf_parser_spark.config import ChunkOptions
from fast_pdf_parser_spark.operators.chunker import (
    AnnotatedLine,
    Chunk,
    SemanticUnit,
    add_overlap,
    annotate_lines,
    chunk_pages,
    create_initial_chunks,
    create_semantic_units,
    final_merge_pass,
    merge_small_chunks_hierarchically,
    split_oversized_chunks,
)


class WordTok:
    """count_tokens = whitespace word count (hand-computable)."""

    def count_tokens(self, text: str) -> int:
        return len(text.split())

    def _count_line_cached(self, data: bytes) -> int:
        return len(data.split())


def AL(text, type_, tokens, page=0, level=0):
    return AnnotatedLine(text, type_, tokens, page, level)


def unit_of(*lines):
    u = SemanticUnit()
    for l in lines:
        u.add_line(l)
    return u


# --- pass 1 ---------------------------------------------------------------

def test_annotate_lines_pages_and_types():
    tok = WordTok()
    pages = [("# Title\n\nbody text", 3), ("- item\n", 7)]
    lines = annotate_lines(pages, tok)
    assert [(l.text, l.type, l.tokens, l.page, l.heading_level) for l in lines] == [
        ("# Title", "MAJOR_HEADING", 2, 3, 1),
        ("", "BLANK", 0, 3, 0),
        ("body text", "NORMAL", 2, 3, 0),
        ("- item", "LIST_ITEM", 2, 7, 0),
    ]


# --- pass 2 ---------------------------------------------------------------

def test_units_break_on_headings_and_blank_lookahead():
    lines = [
        AL("intro", "NORMAL", 1, page=0),
        AL("", "BLANK", 0, page=0),           # blank directly before heading
        AL("# H", "MAJOR_HEADING", 1, page=0, level=1),
        AL("body", "NORMAL", 1, page=1),
        AL("", "BLANK", 0, page=1),           # blank NOT before heading
        AL("more", "NORMAL", 1, page=1),
    ]
    units = create_semantic_units(lines)
    # break at the blank (lookahead, :154-159); blank skipped at new unit
    # start (:168); second blank stays inside unit 2
    assert [u.get_text() for u in units] == [
        "intro\n",
        "# H\nbody\n\nmore\n",
    ]
    assert units[1].has_major_heading and units[1].max_heading_level == 1
    assert units[1].pages == {0, 1}
    assert units[1].total_tokens == 3


def test_units_leading_blanks_skipped_and_last_unit_kept():
    lines = [
        AL("", "BLANK", 0),
        AL("", "BLANK", 0),
        AL("a", "NORMAL", 1),
        AL("### h", "MINOR_HEADING", 1, level=3),
    ]
    units = create_semantic_units(lines)
    assert [u.get_text() for u in units] == ["a\n", "### h\n"]
    assert not units[1].has_major_heading  # minor headings don't set it


# --- pass 3 ---------------------------------------------------------------

def test_initial_packing_and_oversized_single_unit():
    u1 = unit_of(AL("a b c", "NORMAL", 3, page=1))
    u2 = unit_of(AL("d e", "NORMAL", 2, page=2))
    u3 = unit_of(*[AL("x " * 7, "NORMAL", 7, page=3)])  # 7 > max alone
    u4 = unit_of(AL("# z", "MAJOR_HEADING", 1, page=4, level=2))
    chunks = create_initial_chunks([u1, u2, u3, u4], max_tokens=5)
    # u1+u2 = 5 <= 5 pack together; u3 oversized alone (:189-196); u4 next
    assert [(c.tokens, c.start_page, c.end_page) for c in chunks] == [
        (5, 1, 2),
        (7, 3, 3),
        (1, 4, 4),
    ]
    assert chunks[2].has_major_heading and chunks[2].min_heading_level == 2


# --- pass 4 ---------------------------------------------------------------

def test_overlap_populates_but_never_enters_text():
    tok = WordTok()
    chunks = [
        Chunk(text="one two three four\n", tokens=4),
        Chunk(text="five six\n", tokens=2),
    ]
    out = add_overlap(chunks, overlap_tokens=2, tokenizer=tok)
    assert out[0].overlap_text == ""
    # last 2*5=10 bytes of "one two three four\n" = "hree four\n"
    assert out[1].overlap_text == "hree four\n"
    assert out[1].overlap_tokens == 2
    assert out[1].text == "five six\n"  # text unchanged (:225-246)


def test_overlap_zero_is_noop():
    tok = WordTok()
    chunks = [Chunk(text="a b\n", tokens=2), Chunk(text="c\n", tokens=1)]
    out = add_overlap(chunks, overlap_tokens=0, tokenizer=tok)
    assert out[1].overlap_text == "" and out[1].overlap_tokens == 0


# --- pass 5 ---------------------------------------------------------------

def test_merge_basic_and_11x_rule():
    # min=10, max=20
    chunks = [
        Chunk(text="A", tokens=4),
        Chunk(text="B", tokens=15),   # 4+15=19 <= 20 -> merge
        Chunk(text="C", tokens=9),
        Chunk(text="D", tokens=12),   # 9+12=21 > 20, but <= 22 and 12 >= min/2 -> NO
    ]
    out = merge_small_chunks_hierarchically(chunks, 10, 20)
    assert [(c.text, c.tokens) for c in out] == [("AB", 19), ("C", 9), ("D", 12)]

    # 1.1x allowance: next < min/2 (:276)
    chunks = [Chunk(text="C", tokens=18), Chunk(text="D", tokens=4)]
    out = merge_small_chunks_hierarchically(chunks, 10, 20)
    # C has 18 >= min -> no merge attempted; make C small:
    chunks = [Chunk(text="C", tokens=9), Chunk(text="D", tokens=13)]
    out = merge_small_chunks_hierarchically(chunks, 10, 20)
    assert [(c.text, c.tokens) for c in out] == [("C", 9), ("D", 13)]
    chunks = [Chunk(text="C", tokens=18), Chunk(text="D", tokens=4)]
    # C=18 not small -> untouched even though combined 22 <= 22
    out = merge_small_chunks_hierarchically(chunks, 10, 20)
    assert len(out) == 2
    chunks = [Chunk(text="C", tokens=9), Chunk(text="D", tokens=4),
              Chunk(text="E", tokens=9)]
    # C+D=13 <= 20 merge; 13 >= min stop.
    out = merge_small_chunks_hierarchically(chunks, 10, 20)
    assert [(c.text, c.tokens) for c in out] == [("CD", 13), ("E", 9)]


def test_merge_11x_applies():
    # 1.1x branch (:276) needs combined in (max, 1.1*max] AND next < min/2:
    # min=18, max=20: current=17 < 18; next=4 < 9; combined 21 <= 22 -> merge
    chunks = [Chunk(text="C", tokens=17), Chunk(text="D", tokens=4)]
    out = merge_small_chunks_hierarchically(chunks, 18, 20)
    assert [(c.text, c.tokens) for c in out] == [("CD", 21)]
    # same sizes but next >= min/2 blocks the 1.1x branch
    chunks = [Chunk(text="C", tokens=12), Chunk(text="D", tokens=9)]
    out = merge_small_chunks_hierarchically(chunks, 18, 20)
    assert len(out) == 2


def test_merge_heading_veto():
    # next has major heading level<=2 and current >= min/2 -> veto (:281-283)
    nxt = Chunk(text="H", tokens=6, has_major_heading=True, min_heading_level=1)
    out = merge_small_chunks_hierarchically(
        [Chunk(text="C", tokens=5), nxt], 10, 20
    )
    assert [(c.text,) for c in out] == [("C",), ("H",)]
    # current < min/2 -> veto does not apply -> merge
    out = merge_small_chunks_hierarchically(
        [Chunk(text="C", tokens=4), nxt], 10, 20
    )
    assert [(c.text, c.tokens, c.has_major_heading, c.min_heading_level)
            for c in out] == [("CH", 10, True, 1)]


# --- pass 6 ---------------------------------------------------------------

def test_split_oversized_with_08_threshold():
    tok = WordTok()
    # 6 lines x 2 tokens = 12 > max=5; split fires when adding would exceed
    # AND current >= 0.8*5=4 -> splits at 4 tokens each
    text = "".join("w w\n" for _ in range(6))
    chunk = Chunk(text=text, tokens=12, start_page=2, end_page=9,
                  has_major_heading=True, min_heading_level=1)
    out = split_oversized_chunks([chunk], max_tokens=5, tokenizer=tok)
    assert [(c.text, c.tokens) for c in out] == [
        ("w w\nw w\n", 4), ("w w\nw w\n", 4), ("w w\nw w\n", 4)
    ]
    # approximate page ranges copied from parent (:334,338)
    assert all((c.start_page, c.end_page) == (2, 9) for c in out)
    # heading flags reset on splits (fresh Chunk())
    assert all(not c.has_major_heading for c in out)


def test_split_skips_fitting_chunks():
    tok = WordTok()
    c = Chunk(text="a b\n", tokens=2, has_major_heading=True)
    out = split_oversized_chunks([c], max_tokens=5, tokenizer=tok)
    assert out == [c]


def test_split_below_threshold_runs_long():
    tok = WordTok()
    # one 3-token line then 3-token lines, max=5: adding line 2 would exceed
    # (3+3>5) but current 3 < 4 (0.8*5) -> keeps growing; splits only at >=4
    text = "a b c\na b c\na b c\n"
    out = split_oversized_chunks([Chunk(text=text, tokens=9)], 5, tok)
    assert [(c.tokens,) for c in out] == [(6,), (3,)]


# --- pass 7 ---------------------------------------------------------------

def test_final_merge_forward_strict_and_backward():
    # min=10, max=20
    chunks = [
        Chunk(text="A", tokens=12),
        Chunk(text="B", tokens=4),
        Chunk(text="C", tokens=18),
    ]
    # B: forward merge with C = 22 > 20 -> no; backward into A: 16 <= 20 -> yes
    out = final_merge_pass(chunks, 10, 20)
    assert [(c.text, c.tokens) for c in out] == [("AB", 16), ("C", 18)]


def test_final_merge_forward_chain():
    chunks = [Chunk(text="A", tokens=3), Chunk(text="B", tokens=3),
              Chunk(text="C", tokens=5)]
    out = final_merge_pass(chunks, 10, 20)
    assert [(c.text, c.tokens) for c in out] == [("ABC", 11)]


def test_final_merge_no_11x_allowance():
    chunks = [Chunk(text="A", tokens=9), Chunk(text="B", tokens=13)]
    # 22 > 20 strictly -> stays split (unlike pass 5's 1.1x rule)
    out = final_merge_pass(chunks, 10, 20)
    assert len(out) == 2


# --- driver ----------------------------------------------------------------

def test_chunk_pages_empty_and_filtering():
    tok = WordTok()
    assert chunk_pages([], tok) == []
    assert chunk_pages([("", 0), ("", 1)], tok) == []  # empty-page filter


def test_chunk_pages_end_to_end_wordtok():
    tok = WordTok()
    opts = ChunkOptions(max_tokens=10, min_tokens=3, overlap_tokens=0)
    pages = [
        ("# Title\nalpha beta gamma delta\n\n## Sub\nepsilon zeta", 0),
        ("eta theta iota", 1),
    ]
    chunks = chunk_pages(pages, tok, opts)
    # unit1: "# Title\nalpha beta gamma delta\n" (6 tok)
    # unit2 (break at blank-before-heading): "## Sub\nepsilon zeta\neta theta iota\n"?
    # no: unit2 starts at "## Sub"; blank is skipped at boundary; page 2 line
    # continues the unit (no break) -> unit2 = "## Sub\nepsilon zeta\neta theta iota\n" (7 tok)
    # pass 3: 6+7=13 > 10 -> two chunks; both >= min=3 -> no merges; none oversized
    assert [c.text for c in chunks] == [
        "# Title\nalpha beta gamma delta\n",
        "## Sub\nepsilon zeta\neta theta iota\n",
    ]
    assert [(c.start_page, c.end_page) for c in chunks] == [(0, 0), (0, 1)]
    assert chunks[0].has_major_heading and chunks[0].min_heading_level == 1
    assert chunks[1].has_major_heading and chunks[1].min_heading_level == 2
    # final recount via WordTok counts words of full text
    assert [c.tokens for c in chunks] == [6, 7]
