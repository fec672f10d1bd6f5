"""The 7-pass hierarchical chunker — pure Python, exact reference semantics.

Re-implements every pass of src/hierarchical_chunker.cpp:

- Pass 1  annotate_lines            (:116-139)
- Pass 2  create_semantic_units     (:142-179)
- Pass 3  create_initial_chunks     (:182-222)
- Pass 4  add_overlap               (:225-246)
- Pass 5  merge_small_chunks_hierarchically (:249-304)
- Pass 6  split_oversized_chunks    (:307-354)
- Pass 7  final_merge_pass          (:357-414)
- driver  create_hierarchical_chunks_internal (:417-462)
  (empty-page filter :424-429, final token recount :457-459)

These are sequential per-document folds carrying accumulator state — not
SQL-expressible (SURVEY.md §2.7) — so they live here as plain functions and
run inside a vectorized Arrow UDF with whole-document locality
(operators/pipeline.py). Cross-document they are embarrassingly parallel.

Pinned quirks (fixture-defining):

- Pass 3: a single unit larger than max_tokens becomes its own oversized
  chunk (:189-196).
- Pass 4 runs BEFORE merge/split, so overlap describes pre-merge neighbors;
  overlap never enters ``text`` (:225-246) and the public default is 0.
- Pass 5: merge up to 1.1*max when next < min/2 (:276); veto when next has a
  major heading (level<=2) and current >= min/2 (:281-283).
- Pass 6: split fires only when current >= 0.8*max (:332); split chunks get
  APPROXIMATE page ranges copied from the parent (:334,338) and RESET
  heading flags (fresh ``Chunk()``); per-line token counts exclude the
  newline, like pass 1.
- Pass 7: strict <= max forward merge, then backward merge into the previous
  output chunk (:391-407).
- Final recount: chunk.tokens = count_tokens(full text INCLUDING newlines)
  (:457-459) — this may differ from the sum of per-line counts; boundaries
  are decided by the per-line sums, the reported count by the recount.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from fast_pdf_parser_spark.config import ChunkOptions
from fast_pdf_parser_spark.functions.classifier import (
    BLANK,
    MAJOR_HEADING,
    MINOR_HEADING,
    detect_line_type,
    split_page_lines,
)
from fast_pdf_parser_spark.functions.tokenizer import TiktokenTokenizer

_NO_HEADING_LEVEL = 999  # src/hierarchical_chunker.cpp:48,78


@dataclass
class AnnotatedLine:
    """src/hierarchical_chunker.cpp:34-40"""

    text: str
    type: str
    tokens: int
    page: int
    heading_level: int = 0


@dataclass
class SemanticUnit:
    """src/hierarchical_chunker.cpp:43-67"""

    lines: list[AnnotatedLine] = field(default_factory=list)
    total_tokens: int = 0
    pages: set[int] = field(default_factory=set)
    has_major_heading: bool = False
    max_heading_level: int = _NO_HEADING_LEVEL  # lower = more important

    def add_line(self, line: AnnotatedLine) -> None:
        self.lines.append(line)
        self.total_tokens += line.tokens
        self.pages.add(line.page)
        if line.type == MAJOR_HEADING:
            self.has_major_heading = True
            self.max_heading_level = min(self.max_heading_level, line.heading_level)

    def get_text(self) -> str:
        # one trailing "\n" per line (src/hierarchical_chunker.cpp:60-66)
        return "".join(line.text + "\n" for line in self.lines)


@dataclass
class Chunk:
    """src/hierarchical_chunker.cpp:70-79"""

    text: str = ""
    tokens: int = 0
    start_page: int = -1
    end_page: int = -1
    overlap_text: str = ""
    overlap_tokens: int = 0
    has_major_heading: bool = False
    min_heading_level: int = _NO_HEADING_LEVEL


def annotate_lines(
    pages: list[tuple[str, int]], tokenizer: TiktokenTokenizer
) -> list[AnnotatedLine]:
    """Pass 1 (src/hierarchical_chunker.cpp:116-139)."""
    annotated: list[AnnotatedLine] = []
    count = tokenizer.count_tokens
    for page_text, page_num in pages:
        for line in split_page_lines(page_text):
            line_type, level = detect_line_type(line)
            annotated.append(
                AnnotatedLine(line, line_type, count(line), page_num, level)
            )
    return annotated


def create_semantic_units(lines: list[AnnotatedLine]) -> list[SemanticUnit]:
    """Pass 2 (src/hierarchical_chunker.cpp:142-179)."""
    units: list[SemanticUnit] = []
    current = SemanticUnit()

    n = len(lines)
    for i, line in enumerate(lines):
        should_break = False
        if line.type in (MAJOR_HEADING, MINOR_HEADING):
            should_break = True
        elif line.type == BLANK and i + 1 < n:
            # 1-line lookahead (:154-159)
            if lines[i + 1].type in (MAJOR_HEADING, MINOR_HEADING):
                should_break = True

        if should_break and current.lines:
            units.append(current)
            current = SemanticUnit()

        # skip blank lines at unit boundaries (:168)
        if not (line.type == BLANK and not current.lines):
            current.add_line(line)

    if current.lines:
        units.append(current)
    return units


def create_initial_chunks(units: list[SemanticUnit], max_tokens: int) -> list[Chunk]:
    """Pass 3 (src/hierarchical_chunker.cpp:182-222)."""
    chunks: list[Chunk] = []
    current = Chunk()

    for unit in units:
        if current.text and current.tokens + unit.total_tokens > max_tokens:
            chunks.append(current)
            current = Chunk()

        current.text += unit.get_text()
        current.tokens += unit.total_tokens

        if unit.pages:
            if current.start_page == -1:
                current.start_page = min(unit.pages)
            current.end_page = max(unit.pages)

        if unit.has_major_heading:
            current.has_major_heading = True
            current.min_heading_level = min(
                current.min_heading_level, unit.max_heading_level
            )

    if current.text:
        chunks.append(current)
    return chunks


def add_overlap(
    chunks: list[Chunk], overlap_tokens: int, tokenizer: TiktokenTokenizer
) -> list[Chunk]:
    """Pass 4 (src/hierarchical_chunker.cpp:225-246).

    Byte-oriented like the reference (std::string::substr): the last
    ``overlap_tokens*5`` BYTES are taken, then 10 BYTES are shaved until the
    token count fits. Invalid UTF-8 prefixes from mid-character cuts are
    decoded leniently at the string boundary (fixtures use ASCII overlap
    regions, so this never fires there).
    """
    for i in range(1, len(chunks)):
        prev_bytes = chunks[i - 1].text.encode("utf-8")
        chars_to_take = min(len(prev_bytes), overlap_tokens * 5)
        overlap = prev_bytes[len(prev_bytes) - chars_to_take :]
        while (
            tokenizer._count_line_cached(overlap) > overlap_tokens
            and len(overlap) > 10
        ):
            overlap = overlap[10:]
        chunks[i].overlap_text = overlap.decode("utf-8", errors="replace")
        chunks[i].overlap_tokens = tokenizer._count_line_cached(overlap)
    return chunks


def merge_small_chunks_hierarchically(
    chunks: list[Chunk], min_tokens: int, max_tokens: int
) -> list[Chunk]:
    """Pass 5 (src/hierarchical_chunker.cpp:249-304)."""
    if not chunks:
        return []

    merged: list[Chunk] = []
    i = 0
    n = len(chunks)
    while i < n:
        src = chunks[i]
        current = Chunk(
            src.text, src.tokens, src.start_page, src.end_page,
            src.overlap_text, src.overlap_tokens,
            src.has_major_heading, src.min_heading_level,
        )

        while current.tokens < min_tokens and i + 1 < n:
            nxt = chunks[i + 1]
            combined = current.tokens + nxt.tokens

            should_merge = False
            if combined <= max_tokens:
                should_merge = True
            elif combined <= max_tokens * 1.1 and nxt.tokens < min_tokens // 2:
                # 1.1x allowance (:276); int division matches C++ int/2
                # (hierarchical_chunker.cpp:276 with int min_tokens)
                should_merge = True

            # heading veto (:281-283)
            if (
                nxt.has_major_heading
                and nxt.min_heading_level <= 2
                and current.tokens >= min_tokens // 2  # int div (:281)
            ):
                should_merge = False

            if not should_merge:
                break

            current.text += nxt.text
            current.tokens = combined
            current.end_page = nxt.end_page
            if nxt.has_major_heading:
                current.has_major_heading = True
                current.min_heading_level = min(
                    current.min_heading_level, nxt.min_heading_level
                )
            i += 1

        merged.append(current)
        i += 1
    return merged


def split_oversized_chunks(
    chunks: list[Chunk], max_tokens: int, tokenizer: TiktokenTokenizer
) -> list[Chunk]:
    """Pass 6 (src/hierarchical_chunker.cpp:307-354)."""
    result: list[Chunk] = []
    count = tokenizer.count_tokens

    for chunk in chunks:
        if chunk.tokens <= max_tokens:
            result.append(chunk)
            continue

        current = Chunk(start_page=chunk.start_page)
        for line in split_page_lines(chunk.text):
            line_tokens = count(line)
            if current.text and current.tokens + line_tokens > max_tokens:
                if current.tokens >= max_tokens * 0.8:  # threshold (:332)
                    current.end_page = chunk.end_page  # approximate (:334)
                    result.append(current)
                    current = Chunk(start_page=chunk.start_page)  # approx (:338)
            current.text += line + "\n"
            current.tokens += line_tokens

        if current.text:
            current.end_page = chunk.end_page
            result.append(current)
    return result


def final_merge_pass(
    chunks: list[Chunk], min_tokens: int, max_tokens: int
) -> list[Chunk]:
    """Pass 7 (src/hierarchical_chunker.cpp:357-414)."""
    if not chunks:
        return []

    final_chunks: list[Chunk] = []
    i = 0
    n = len(chunks)
    while i < n:
        src = chunks[i]
        current = Chunk(
            src.text, src.tokens, src.start_page, src.end_page,
            src.overlap_text, src.overlap_tokens,
            src.has_major_heading, src.min_heading_level,
        )

        # forward merge, strict cap (:370-388)
        while current.tokens < min_tokens and i + 1 < n:
            nxt = chunks[i + 1]
            combined = current.tokens + nxt.tokens
            if combined <= max_tokens:
                current.text += nxt.text
                current.tokens = combined
                current.end_page = nxt.end_page
                if nxt.has_major_heading:
                    current.has_major_heading = True
                    current.min_heading_level = min(
                        current.min_heading_level, nxt.min_heading_level
                    )
                i += 1
            else:
                break

        # backward merge into previous output chunk (:391-407)
        if current.tokens < min_tokens and final_chunks:
            prev = final_chunks[-1]
            combined = prev.tokens + current.tokens
            if combined <= max_tokens:
                prev.text += current.text
                prev.tokens = combined
                prev.end_page = current.end_page
                if current.has_major_heading:
                    prev.has_major_heading = True
                    prev.min_heading_level = min(
                        prev.min_heading_level, current.min_heading_level
                    )
                i += 1
                continue

        final_chunks.append(current)
        i += 1
    return final_chunks


class StreamingChunker:
    """Exact streaming form of the 7-pass pipeline with O(1)-chunks state.

    Every pass above is a forward fold whose decisions need at most one
    chunk of lookbehind (pass 7's backward merge into the previous OUTPUT
    chunk) or one line of lookahead (pass 2's blank-before-heading probe),
    so the whole chain runs page-at-a-time: ``push_page`` returns the
    chunks that can never change again, ``finish`` flushes the rest. This
    is the Spark-side analogue of the reference's batch-bounded streaming
    consume (src/fast_pdf_parser.cpp:75-115, batch_size=10 pages): peak
    memory tracks the largest single semantic unit plus a constant number
    of in-flight chunks, never the whole document.

    Exactness contract: composing push_page over a run's non-empty pages +
    finish yields byte-identical chunks to the batch pass chain; pinned by
    ``tests/test_streaming_chunker.py`` (hypothesis fuzz vs the batch
    functions above) and by every existing span-equality fixture, since
    ``chunk_pages`` itself now routes through this class.
    """

    def __init__(
        self,
        tokenizer: TiktokenTokenizer,
        options: ChunkOptions = ChunkOptions(),
    ) -> None:
        self._tok = tokenizer
        self._opt = options
        # pass 1/2: one-line lookahead buffer + accumulating unit
        self._held_line: AnnotatedLine | None = None
        self._unit = SemanticUnit()
        # pass 3: accumulating initial chunk; pass 4: previous pass-3
        # chunk's last overlap_tokens*5 bytes (all add_overlap ever reads)
        self._chunk3 = Chunk()
        self._prev3_tail: bytes | None = None
        # pass 5 / pass 7 accumulators; _tail7 is the last appended final
        # chunk, still mutable until the next append (backward merge)
        self._cur5: Chunk | None = None
        self._cur7: Chunk | None = None
        self._tail7: Chunk | None = None
        self._out: list[Chunk] = []

    # -- public API ---------------------------------------------------

    def push_page(self, page_text: str, page_num: int) -> list[Chunk]:
        """Feed one page; returns chunks finalized by this page."""
        if page_text:  # empty-page filter (:424-429)
            for line in annotate_lines([(page_text, page_num)], self._tok):
                self._push_line(line)
        return self._drain()

    def push_lines(self, lines: list[str], page_num: int) -> list[Chunk]:
        """Feed one page given as its LINE LIST — the join-free hand-off
        for producers that already have lines (the pdf route builds them;
        joining to text only for the chunker to re-split is two string
        copies per line). Exactly ``push_page("\\n".join(lines))``: the
        join+split round trip absorbs one trailing empty line and maps a
        lone [""]/[] to an empty page — replicated here, pinned by
        tests/test_streaming_chunker.py::test_push_lines_equals_push_page.
        """
        for line in lines:
            if "\n" in line:
                # a producer line may itself embed newlines (a PDF show
                # string with a \n escape, or a cmap mapping to U+000A);
                # the joined round trip flattens them into separate lines
                # — replicate exactly, then the single trailing-"" pop
                lines = "\n".join(lines).split("\n")
                break
        if lines and lines[-1] == "":
            lines = lines[:-1]
        if lines:
            count = self._tok.count_tokens
            push = self._push_line
            for line in lines:
                line_type, level = detect_line_type(line)
                push(AnnotatedLine(line, line_type, count(line),
                                   page_num, level))
        return self._drain()

    def finish(self) -> list[Chunk]:
        """End of run: flush every stage in pass order."""
        if self._held_line is not None:
            self._emit_line(self._held_line, None)
            self._held_line = None
        if self._unit.lines:
            self._push_unit(self._unit)
            self._unit = SemanticUnit()
        if self._chunk3.text:
            self._emit_pass3(self._chunk3)
            self._chunk3 = Chunk()
        if self._cur5 is not None:
            self._pass6_push(self._cur5)
            self._cur5 = None
        if self._cur7 is not None:
            self._close7()
        if self._tail7 is not None:
            self._finalize(self._tail7)
            self._tail7 = None
        return self._drain()

    # -- stages -------------------------------------------------------

    def _drain(self) -> list[Chunk]:
        out, self._out = self._out, []
        return out

    def _push_line(self, line: AnnotatedLine) -> None:
        held, self._held_line = self._held_line, line
        if held is not None:
            self._emit_line(held, line)

    def _emit_line(self, line: AnnotatedLine, nxt: AnnotatedLine | None) -> None:
        # pass 2 break rules (:142-179); nxt is None only at end-of-run,
        # matching the batch loop's `i + 1 < n` guard
        should_break = False
        if line.type in (MAJOR_HEADING, MINOR_HEADING):
            should_break = True
        elif line.type == BLANK and nxt is not None:
            if nxt.type in (MAJOR_HEADING, MINOR_HEADING):
                should_break = True
        if should_break and self._unit.lines:
            self._push_unit(self._unit)
            self._unit = SemanticUnit()
        if not (line.type == BLANK and not self._unit.lines):
            self._unit.add_line(line)

    def _push_unit(self, unit: SemanticUnit) -> None:
        # pass 3 (:182-222)
        c = self._chunk3
        if c.text and c.tokens + unit.total_tokens > self._opt.max_tokens:
            self._emit_pass3(c)
            c = self._chunk3 = Chunk()
        c.text += unit.get_text()
        c.tokens += unit.total_tokens
        if unit.pages:
            if c.start_page == -1:
                c.start_page = min(unit.pages)
            c.end_page = max(unit.pages)
        if unit.has_major_heading:
            c.has_major_heading = True
            c.min_heading_level = min(c.min_heading_level, unit.max_heading_level)

    def _emit_pass3(self, chunk: Chunk) -> None:
        # pass 4 (:225-246) applied at the pre-merge boundary it describes:
        # overlap for chunk i reads only the tail of pass-3 chunk i-1
        ot = self._opt.overlap_tokens
        if self._prev3_tail is not None:
            overlap = self._prev3_tail
            count = self._tok._count_line_cached
            while count(overlap) > ot and len(overlap) > 10:
                overlap = overlap[10:]
            chunk.overlap_text = overlap.decode("utf-8", errors="replace")
            chunk.overlap_tokens = count(overlap)
        text_bytes = chunk.text.encode("utf-8")
        keep = min(len(text_bytes), ot * 5)
        self._prev3_tail = text_bytes[len(text_bytes) - keep:]
        self._pass5_push(chunk)

    def _pass5_push(self, c: Chunk) -> None:
        # pass 5 (:249-304); streaming owns each chunk so the batch
        # version's defensive copy is unnecessary
        if self._cur5 is None:
            self._cur5 = c
            return
        cur = self._cur5
        if cur.tokens < self._opt.min_tokens:
            combined = cur.tokens + c.tokens
            should_merge = False
            if combined <= self._opt.max_tokens:
                should_merge = True
            elif (
                combined <= self._opt.max_tokens * 1.1
                and c.tokens < self._opt.min_tokens // 2
            ):
                should_merge = True
            if (
                c.has_major_heading
                and c.min_heading_level <= 2
                and cur.tokens >= self._opt.min_tokens // 2
            ):
                should_merge = False
            if should_merge:
                cur.text += c.text
                cur.tokens = combined
                cur.end_page = c.end_page
                if c.has_major_heading:
                    cur.has_major_heading = True
                    cur.min_heading_level = min(
                        cur.min_heading_level, c.min_heading_level
                    )
                return
        self._pass6_push(cur)
        self._cur5 = c

    def _pass6_push(self, chunk: Chunk) -> None:
        # pass 6 (:307-354) — per-chunk, no cross-chunk state
        max_tokens = self._opt.max_tokens
        if chunk.tokens <= max_tokens:
            self._pass7_push(chunk)
            return
        count = self._tok.count_tokens
        current = Chunk(start_page=chunk.start_page)
        for line in split_page_lines(chunk.text):
            line_tokens = count(line)
            if current.text and current.tokens + line_tokens > max_tokens:
                if current.tokens >= max_tokens * 0.8:
                    current.end_page = chunk.end_page
                    self._pass7_push(current)
                    current = Chunk(start_page=chunk.start_page)
            current.text += line + "\n"
            current.tokens += line_tokens
        if current.text:
            current.end_page = chunk.end_page
            self._pass7_push(current)

    def _pass7_push(self, c: Chunk) -> None:
        # pass 7 forward merge (:370-388)
        if self._cur7 is None:
            self._cur7 = c
            return
        cur = self._cur7
        if (
            cur.tokens < self._opt.min_tokens
            and cur.tokens + c.tokens <= self._opt.max_tokens
        ):
            cur.text += c.text
            cur.tokens += c.tokens
            cur.end_page = c.end_page
            if c.has_major_heading:
                cur.has_major_heading = True
                cur.min_heading_level = min(
                    cur.min_heading_level, c.min_heading_level
                )
            return
        self._close7()
        self._cur7 = c

    def _close7(self) -> None:
        # pass 7 backward merge into the previous OUTPUT chunk (:391-407):
        # only final_chunks[-1] is ever mutated, so chunks before it are
        # immutable and stream out as soon as a new one is appended
        cur, self._cur7 = self._cur7, None
        tail = self._tail7
        if (
            cur.tokens < self._opt.min_tokens
            and tail is not None
            and tail.tokens + cur.tokens <= self._opt.max_tokens
        ):
            tail.text += cur.text
            tail.tokens += cur.tokens
            tail.end_page = cur.end_page
            if cur.has_major_heading:
                tail.has_major_heading = True
                tail.min_heading_level = min(
                    tail.min_heading_level, cur.min_heading_level
                )
            return
        if tail is not None:
            self._finalize(tail)
        self._tail7 = cur

    def _finalize(self, chunk: Chunk) -> None:
        # final token recount (:457-459), applied exactly once, when the
        # chunk can no longer change
        chunk.tokens = self._tok.count_tokens(chunk.text)
        self._out.append(chunk)


def chunk_pages_batch(
    pages: list[tuple[str, int]],
    tokenizer: TiktokenTokenizer,
    options: ChunkOptions = ChunkOptions(),
) -> list[Chunk]:
    """Whole-run pass chain (src/hierarchical_chunker.cpp:417-462), kept as
    the literal transcription of the reference driver: the equivalence
    oracle for StreamingChunker (tests/test_streaming_chunker.py)."""
    # empty-page filter (:424-429)
    non_empty = [(t, p) for t, p in pages if t]
    if not non_empty:
        return []

    lines = annotate_lines(non_empty, tokenizer)
    units = create_semantic_units(lines)
    chunks = create_initial_chunks(units, options.max_tokens)
    chunks = add_overlap(chunks, options.overlap_tokens, tokenizer)
    chunks = merge_small_chunks_hierarchically(
        chunks, options.min_tokens, options.max_tokens
    )
    chunks = split_oversized_chunks(chunks, options.max_tokens, tokenizer)
    chunks = final_merge_pass(chunks, options.min_tokens, options.max_tokens)

    # final token recount (:457-459)
    for chunk in chunks:
        chunk.tokens = tokenizer.count_tokens(chunk.text)
    return chunks


def chunk_pages(
    pages: list[tuple[str, int]],
    tokenizer: TiktokenTokenizer,
    options: ChunkOptions = ChunkOptions(),
) -> list[Chunk]:
    """Pipeline driver (src/hierarchical_chunker.cpp:417-462), routed
    through the streaming form so the memory bound and the batch semantics
    are one implementation."""
    chunker = StreamingChunker(tokenizer, options)
    out: list[Chunk] = []
    for text, page in pages:
        out.extend(chunker.push_page(text, page))
    out.extend(chunker.finish())
    return out
