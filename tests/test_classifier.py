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


def test_python_and_sql_classifiers_agree(spark):
    """detect_line_type (UDF path) and the relational CASE expression
    (oracle path) are independent implementations of
    src/hierarchical_chunker.cpp:82-113 — they must agree on any line."""
    import pandas as pd
    from pyspark.sql import functions as F

    lines = [
        "", "   ", "\t", "# Title", "## Sub", "### Deep", "#### x", "#",
        "#NoSpace", "- item", "* item", "+ item", "  - indented",
        "12. numbered", "1.no-space", "```python", "x ``` y",
        "  indented code", " one space", "plain text line", "not # heading",
        "#  double space heading", "-", "- ", "9. ok", "##\ttab heading",
        "  ", "word - dash mid", "*bold* text", "1. a",
    ]
    df = spark.createDataFrame(pd.DataFrame({"line": lines}))
    df.createOrReplaceTempView("lines_probe")
    sql = spark.sql(r"""
      SELECT line,
        CASE
          WHEN line RLIKE '^[ \t]*$' THEN 'BLANK'
          WHEN line RLIKE '^#+[ \t]+.+$' THEN
            CASE WHEN length(regexp_extract(line, '^(#+)[ \t]+', 1)) <= 2
                 THEN 'MAJOR_HEADING' ELSE 'MINOR_HEADING' END
          WHEN line RLIKE '^[ \t]*[-*+][ \t]+.+$'
            OR line RLIKE '^[ \t]*[0-9]+\.[ \t]+.+$' THEN 'LIST_ITEM'
          WHEN line LIKE '%```%' OR line LIKE '  %' THEN 'CODE_BLOCK'
          ELSE 'NORMAL' END AS line_type
      FROM lines_probe""")
    got = {r.line: r.line_type for r in sql.collect()}
    for line in lines:
        assert got[line] == detect_line_type(line)[0], repr(line)
