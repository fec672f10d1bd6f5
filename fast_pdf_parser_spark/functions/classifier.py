"""Line-type classification — exact reference semantics.

Replicates ``detect_line_type`` (src/hierarchical_chunker.cpp:82-113) with
its byte-level ``std::regex``/``::isspace`` behavior pinned:

- BLANK: empty, or every char ASCII whitespace (``::isspace`` is byte-wise,
  src/hierarchical_chunker.cpp:84-86 — U+00A0 etc. are NOT blank).
- MAJOR/MINOR_HEADING: full match of ``^(#+)\\s+(.+)$``
  (src/hierarchical_chunker.cpp:89-98); level = number of '#', level<=2 is
  MAJOR. ``\\s`` is the ASCII class, ``.`` excludes CR/LF (ECMAScript).
- LIST_ITEM: full match of ``^\\s*[-*+•]\\s+(.+)$|^\\s*\\d+\\.\\s+(.+)$``
  (src/hierarchical_chunker.cpp:101-104). Pinned quirk: the reference's
  ``std::regex`` is byte-oriented, so the multi-byte UTF-8 bullet ``•``
  (0xE2 0x80 0xA2) matches only its FIRST byte in the bracket expression and
  the following ``\\s+`` then fails on 0x80 — i.e. ``• item`` lines are
  never LIST_ITEM in the reference; they fall through to NORMAL. We
  replicate that by omitting ``•`` from the class.
- CODE_BLOCK: contains ``````` or starts with two spaces
  (src/hierarchical_chunker.cpp:107-108).
- else NORMAL.

Precedence order is exactly the reference's: BLANK → HEADING → LIST → CODE
→ NORMAL.
"""

from __future__ import annotations

import re

# LineType string enum (src/hierarchical_chunker.cpp:24-31)
NORMAL = "NORMAL"
MAJOR_HEADING = "MAJOR_HEADING"
MINOR_HEADING = "MINOR_HEADING"
LIST_ITEM = "LIST_ITEM"
BLANK = "BLANK"
CODE_BLOCK = "CODE_BLOCK"

# ASCII whitespace, matching byte-wise ::isspace / ECMAScript \s.
_WS = r"[ \t\n\r\f\v]"
_BLANK_RE = re.compile(rf"{_WS}*\Z")
_HEADING_RE = re.compile(rf"(#+){_WS}+([^\n\r]+)\Z")
_LIST_RE = re.compile(
    rf"{_WS}*[-*+]{_WS}+[^\n\r]+\Z|{_WS}*[0-9]+\.{_WS}+[^\n\r]+\Z"
)

# The relational twin of this classifier lives in operators/relational.py
# (_SPARK_CLASSIFY / _DUCK_CLASSIFY); tests/test_classifier.py asserts the
# two implementations agree line-for-line.


def detect_line_type(line: str) -> tuple[str, int]:
    """(type, heading_level) — src/hierarchical_chunker.cpp:82-113."""
    if not line or _BLANK_RE.match(line):
        return BLANK, 0

    m = _HEADING_RE.match(line)
    if m:
        level = len(m.group(1))
        return (MAJOR_HEADING if level <= 2 else MINOR_HEADING), level

    if _LIST_RE.match(line):
        return LIST_ITEM, 0

    if "```" in line or line.startswith("  "):
        return CODE_BLOCK, 0

    return NORMAL, 0


def split_page_lines(page_text: str) -> list[str]:
    """``std::getline`` over a page (src/hierarchical_chunker.cpp:120-135):
    splits on '\\n'; a trailing newline does NOT yield a final empty line;
    an empty page yields no lines."""
    lines = page_text.split("\n")
    if lines and lines[-1] == "":
        lines.pop()
    return lines
