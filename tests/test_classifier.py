"""Line classifier unit tests — pin detect_line_type
(src/hierarchical_chunker.cpp:82-113) including byte-level regex quirks."""

from fast_pdf_parser_spark.functions.classifier import (
    BLANK,
    CODE_BLOCK,
    LIST_ITEM,
    MAJOR_HEADING,
    MINOR_HEADING,
    NORMAL,
    detect_line_type,
    split_page_lines,
)


def test_blank():
    assert detect_line_type("") == (BLANK, 0)
    assert detect_line_type("   \t ") == (BLANK, 0)
    # non-ASCII whitespace is NOT blank (byte-wise ::isspace,
    # src/hierarchical_chunker.cpp:84-86)
    assert detect_line_type(" ")[0] != BLANK


def test_headings():
    assert detect_line_type("# Title") == (MAJOR_HEADING, 1)
    assert detect_line_type("## Sub") == (MAJOR_HEADING, 2)
    assert detect_line_type("### Deep") == (MINOR_HEADING, 3)
    assert detect_line_type("##### Deeper") == (MINOR_HEADING, 5)
    # needs whitespace + content after the hashes (full match)
    assert detect_line_type("#")[0] != MAJOR_HEADING
    assert detect_line_type("#NoSpace")[0] != MAJOR_HEADING
    assert detect_line_type("not # heading")[0] == NORMAL


def test_list_items():
    assert detect_line_type("- item") == (LIST_ITEM, 0)
    assert detect_line_type("* item") == (LIST_ITEM, 0)
    assert detect_line_type("+ item") == (LIST_ITEM, 0)
    assert detect_line_type("  - indented") == (LIST_ITEM, 0)
    assert detect_line_type("12. numbered") == (LIST_ITEM, 0)
    assert detect_line_type("1.no-space")[0] != LIST_ITEM
    # pinned reference quirk: the multi-byte bullet never matches the
    # byte-oriented std::regex class -> NORMAL (classifier.py docstring)
    assert detect_line_type("• bullet") == (NORMAL, 0)


def test_code_blocks():
    assert detect_line_type("```python") == (CODE_BLOCK, 0)
    assert detect_line_type("x = 1 ``` y") == (CODE_BLOCK, 0)
    assert detect_line_type("  indented code") == (CODE_BLOCK, 0)
    # single leading space is NOT code
    assert detect_line_type(" one space") == (NORMAL, 0)


def test_precedence():
    # list beats code even when indented two spaces (list checked first,
    # src/hierarchical_chunker.cpp:101-108)
    assert detect_line_type("  - item") == (LIST_ITEM, 0)
    # blank beats everything
    assert detect_line_type("  ") == (BLANK, 0)


def test_getline_semantics():
    # std::getline: trailing '\n' yields no empty final line
    assert split_page_lines("") == []
    assert split_page_lines("\n") == [""]
    assert split_page_lines("a\nb") == ["a", "b"]
    assert split_page_lines("a\nb\n") == ["a", "b"]
    assert split_page_lines("a\n\n") == ["a", ""]
