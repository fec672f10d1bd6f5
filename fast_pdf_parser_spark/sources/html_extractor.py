"""HTML main-content extraction: boilerplate strip + DOM heuristics.

The north rule names "HTML boilerplate strip, PDF/layout parse, DOM
heuristics" as the main-content extraction family; the reference repo
itself is the PDF member. This module adds the HTML member with the same
execution contract as the PDF lexer: pure Python, runs inside the
Arrow-batched per-document fold (operators/pipeline.py) for
``kind='html'`` spans, failures contained per span.

Pipeline (readability-style, public heuristics):

1. structural strip — comments, ``<script>``/``<style>`` payloads, and
   boilerplate containers (``nav/header/footer/aside``) are removed
   entirely (applied iteratively so simple nesting unwinds);
2. block extraction — ``h1-h6 / p / li / pre`` elements become candidate
   blocks in document order;
3. boilerplate scoring — a block is dropped when its LINK DENSITY
   (characters inside ``<a>`` / total characters) exceeds 0.5 and it is
   short (<200 chars): menu rows, pagination, "related links" — the
   classic text-to-link-ratio heuristic of readability/boilerpipe
   (public literature);
4. markdown mapping — ``hN`` → ``'#'*N``, ``li`` → ``'- '``, ``pre`` →
   verbatim, ``p`` → plain; entities unescaped (html stdlib). The output
   feeds the SAME line classifier + 7-pass chunker the other span kinds
   use.

Like the PDF path, blank separator lines do not exist in HTML output —
the chunker's heading-break rule provides unit boundaries.
"""

from __future__ import annotations

import html as _html
import re

_COMMENT = re.compile(r"<!--.*?-->", re.S)
_HEAD = re.compile(r"<head\b[^>]*>.*?</head\s*>", re.S | re.I)
_SCRIPT_STYLE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.S | re.I)
_DROP_CONTAINER = re.compile(
    r"<(nav|header|footer|aside)\b[^>]*>.*?</\1\s*>", re.S | re.I)
_BLOCK = re.compile(r"<(h[1-6]|p|li|pre)\b[^>]*>(.*?)</\1\s*>", re.S | re.I)
_ANCHOR = re.compile(r"<a\b[^>]*>(.*?)</a\s*>", re.S | re.I)
_INLINE_TAG = re.compile(r"<[^>]+>")
_WS_RUN = re.compile(r"[ \t\r\n]+")

LINK_DENSITY_MAX = 0.5
LINK_SHORT_CHARS = 200


def _clean_text(fragment: str) -> str:
    """Inner HTML → visible text: drop inline tags, unescape entities,
    collapse whitespace runs (a browser's normal-flow rendering)."""
    text = _INLINE_TAG.sub("", fragment)
    return _WS_RUN.sub(" ", _html.unescape(text)).strip()


def _link_density(fragment: str) -> float:
    total = len(_clean_text(fragment))
    if total == 0:
        return 1.0
    linked = sum(len(_clean_text(m)) for m in _ANCHOR.findall(fragment))
    return linked / total


def html_main_content(html: str) -> str:
    """HTML document/fragment → main-content text in the markdown shape the
    chunker consumes (headings as ``#``-runs, list items as ``- ``,
    ``pre`` verbatim). Boilerplate containers and high-link-density short
    blocks are dropped."""
    s = _COMMENT.sub("", html or "")
    s = _HEAD.sub("", s)  # titles/meta are document metadata, not content
    s = _SCRIPT_STYLE.sub("", s)
    prev = None
    while prev != s:  # unwind simple container nesting
        prev = s
        s = _DROP_CONTAINER.sub("", s)

    lines: list[str] = []
    saw_block = False
    for m in _BLOCK.finditer(s):
        saw_block = True
        tag = m.group(1).lower()
        body = m.group(2)
        if tag == "pre":
            # verbatim: preserve internal spacing/newlines, entities only
            text = _html.unescape(_INLINE_TAG.sub("", body)).strip("\n")
            if text.strip():
                lines.extend(text.split("\n"))
            continue
        if _link_density(body) > LINK_DENSITY_MAX and \
                len(_clean_text(body)) < LINK_SHORT_CHARS:
            continue  # boilerplate: link farm / menu row
        text = _clean_text(body)
        if not text:
            continue
        if tag[0] == "h":
            lines.append("#" * int(tag[1]) + " " + text)
        elif tag == "li":
            lines.append("- " + text)
        else:
            lines.append(text)
    if saw_block:
        # block structure existed: an empty result here means every block
        # was REJECTED as boilerplate — honor that verdict, do not resurrect
        # the rejected text via the fallback
        return "\n".join(lines)
    # No recognized block elements at all (div-soup pages, bare fragments):
    # never silently drop the document — strip every tag and return the
    # visible text, boilerplate containers already removed above. Tags
    # become spaces (adjacent divs must not concatenate words), runs
    # collapse.
    return _WS_RUN.sub(" ", _html.unescape(_INLINE_TAG.sub(" ", s))).strip()
