"""Deterministic minimal-PDF builder for fixtures (FIXTURES.md §3.3).

Builds single-page PDFs from plain text, exercising the closed subset the
lexer (pdf_lexer.py) supports — the fixture-defined analogue of the real
PDFs the reference parses with MuPDF (src/text_extractor.cpp:27-77):

- classic cross-reference table + trailer (``xref`` / ``startxref`` /
  ``%%EOF``),
- FlateDecode-compressed content streams (zlib),
- text operators: ``BT/ET``, ``Tf``, ``Tm`` (first line), ``TD``/``Td``
  (line moves), ``Tj`` and ``TJ`` (with kerning numbers),
- two font flavors: /F1 simple single-byte (latin-1 ≈ WinAnsi subset) and
  /F2 with a /ToUnicode CMap (bfchar + bfrange) over a custom single-byte
  encoding,
- deterministic per-(doc,page) variety: operator choice and font choice are
  seeded so the corpus covers the whole subset,
- an intentionally corrupt variant (truncated stream) to pin per-span error
  capture (src/text_extractor.cpp:108-114 semantics).

Geometry convention (what the lexer's layout reconstruction relies on):
font size 12, line height 14, per-character advance 0.5*size, word gaps are
one advance wide. The page starts at y=800 and grows downward.
"""

from __future__ import annotations

import base64
import random
import zlib

FONT_SIZE = 12
LINE_HEIGHT = 14
CHAR_ADV = 0.5 * FONT_SIZE  # per-character x advance
PAGE_TOP = 800.0
LEFT_MARGIN = 72.0

# /F2's custom encoding: codes 0x20..0x7E map like ASCII via bfrange, plus
# bfchar entries for a few non-ASCII codepoints at high codes.
_F2_SPECIALS = {0xE9: "é", 0xFC: "ü", 0xDF: "ß", 0x80: "—"}
_F2_REVERSE = {ch: code for code, ch in _F2_SPECIALS.items()}


def _esc_literal(data: bytes) -> bytes:
    out = bytearray()
    for b in data:
        if b in (0x28, 0x29, 0x5C):  # ( ) backslash
            out += b"\\" + bytes([b])
        elif b in (0x0A, 0x0D):
            out += b"\\n" if b == 0x0A else b"\\r"
        else:
            out.append(b)
    return bytes(out)


def _encode_f1(text: str) -> bytes:
    return text.encode("latin-1", errors="replace")


def _encode_f2(text: str) -> bytes:
    out = bytearray()
    for ch in text:
        if ch in _F2_REVERSE:
            out.append(_F2_REVERSE[ch])
        else:
            b = ch.encode("latin-1", errors="replace")
            out += b
    return bytes(out)


def _tounicode_cmap() -> bytes:
    """A minimal ToUnicode CMap with one bfrange (ASCII) and bfchar entries."""
    bfchars = "\n".join(
        f"<{code:02X}> <{ord(ch):04X}>" for code, ch in sorted(_F2_SPECIALS.items())
    )
    cmap = f"""/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
/CMapName /Custom-UC def
/CMapType 2 def
1 begincodespacerange
<00> <FF>
endcodespacerange
1 beginbfrange
<20> <7E> <0020>
endbfrange
{len(_F2_SPECIALS)} beginbfchar
{bfchars}
endbfchar
endcmap
CMapName currentdict /CMap defineresource pop
end
end"""
    return cmap.encode("ascii")


def _content_stream(text: str, rng: random.Random) -> tuple[bytes, str]:
    """Render page text into a content stream; returns (stream, font_used)."""
    font = rng.choice(["F1", "F2"])
    enc = _encode_f1 if font == "F1" else _encode_f2
    ops: list[bytes] = [b"BT", f"/{font} {FONT_SIZE} Tf".encode()]

    lines = text.split("\n")
    # first line via Tm (identity scale, translate), subsequent via TD/Td
    ops.append(f"1 0 0 1 {LEFT_MARGIN:.1f} {PAGE_TOP:.1f} Tm".encode())
    for i, line in enumerate(lines):
        if i > 0:
            if rng.random() < 0.5:
                ops.append(f"0 {-LINE_HEIGHT} TD".encode())
            else:
                ops.append(f"0 {-LINE_HEIGHT} Td".encode())
        if not line:
            continue
        style = rng.random()
        if style < 0.4:
            # whole line in one Tj
            ops.append(b"(" + _esc_literal(enc(line)) + b") Tj")
        elif style < 0.7:
            # TJ with word pieces and kerning numbers that realize the
            # inter-word gaps: advance deficit = -gap/size*1000 units
            parts: list[bytes] = []
            words = line.split(" ")
            for j, w in enumerate(words):
                if j:
                    # kern number in thousandths of font size; -500 realizes
                    # one word gap (= one CHAR_ADV = 0.5*size) that the
                    # lexer's x-gap segmentation turns back into a space
                    parts.append(b"-500")
                parts.append(b"(" + _esc_literal(enc(w)) + b")")
            ops.append(b"[" + b" ".join(parts) + b"] TJ")
        else:
            # word-by-word Tj with explicit Td x-positions
            x = LEFT_MARGIN
            y = PAGE_TOP - i * LINE_HEIGHT
            first = True
            for w in line.split(" "):
                if not w:
                    x += CHAR_ADV
                    continue
                ops.append(f"1 0 0 1 {x:.1f} {y:.1f} Tm".encode())
                ops.append(b"(" + _esc_literal(enc(w)) + b") Tj")
                x += (len(w) + 1) * CHAR_ADV
                first = False
            # restore line-relative matrix for the next TD/Td
            if not first:
                ops.append(
                    f"1 0 0 1 {LEFT_MARGIN:.1f} {y:.1f} Tm".encode()
                )
    ops.append(b"ET")
    return b"\n".join(ops), font


def _base_objects(flate: bytes) -> dict[int, bytes]:
    objects: dict[int, bytes] = {}
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objects[2] = b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"
    objects[3] = (
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R /F2 6 0 R >> >> "
        b"/Contents 4 0 R >>"
    )
    objects[4] = (
        b"<< /Length " + str(len(flate)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + flate + b"\nendstream"
    )
    objects[5] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding /WinAnsiEncoding >>"
    )
    cmap = _tounicode_cmap()
    objects[6] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Custom "
        b"/ToUnicode 7 0 R >>"
    )
    objects[7] = (
        b"<< /Length " + str(len(cmap)).encode()
        + b" >>\nstream\n" + cmap + b"\nendstream"
    )
    return objects


def _emit_classic(objects: dict[int, bytes]) -> bytes:
    """PDF 1.4 layout: every object top-level, classic xref table + trailer."""
    buf = bytearray()
    buf += b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n"
    offsets: dict[int, int] = {}
    for num in sorted(objects):
        offsets[num] = len(buf)
        buf += f"{num} 0 obj\n".encode() + objects[num] + b"\nendobj\n"

    xref_pos = len(buf)
    n = max(objects) + 1
    buf += f"xref\n0 {n}\n".encode()
    buf += b"0000000000 65535 f \n"
    for num in range(1, n):
        buf += f"{offsets[num]:010d} 00000 n \n".encode()
    buf += (
        b"trailer\n<< /Size " + str(n).encode() + b" /Root 1 0 R >>\n"
        b"startxref\n" + str(xref_pos).encode() + b"\n%%EOF\n"
    )
    return bytes(buf)


def _emit_xref_stream(objects: dict[int, bytes]) -> bytes:
    """PDF 1.5 layout: non-stream objects (1,2,3,5,6) compressed into one
    object stream (/Type /ObjStm, obj 8); streams (4,7) stay top-level;
    cross references in an xref STREAM (/Type /XRef, obj 9, W=[1,2,2]) whose
    dict doubles as the trailer."""
    in_objstm = [1, 2, 3, 5, 6]
    top_level = [4, 7]

    header_parts = []
    body = bytearray()
    member_offsets: dict[int, int] = {}
    for num in in_objstm:
        member_offsets[num] = len(body)
        body += objects[num] + b"\n"
    for num in in_objstm:
        header_parts.append(f"{num} {member_offsets[num]}".encode())
    header = b" ".join(header_parts) + b"\n"
    objstm_payload = zlib.compress(header + bytes(body))
    objstm = (
        b"<< /Type /ObjStm /N " + str(len(in_objstm)).encode()
        + b" /First " + str(len(header)).encode()
        + b" /Length " + str(len(objstm_payload)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + objstm_payload
        + b"\nendstream"
    )

    buf = bytearray()
    buf += b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n"
    offsets: dict[int, int] = {}
    for num in top_level:
        offsets[num] = len(buf)
        buf += f"{num} 0 obj\n".encode() + objects[num] + b"\nendobj\n"
    offsets[8] = len(buf)
    buf += b"8 0 obj\n" + objstm + b"\nendobj\n"

    # xref stream entries for objects 0..9, W = [1, 2, 2]
    xref_obj_pos = len(buf)
    size = 10
    entries = bytearray()
    for num in range(size):
        if num == 0:
            typ, f2, f3 = 0, 0, 65535
        elif num in member_offsets:
            typ, f2, f3 = 2, 8, in_objstm.index(num)
        elif num == 9:
            typ, f2, f3 = 1, xref_obj_pos, 0
        else:
            typ, f2, f3 = 1, offsets[num], 0
        entries += bytes([typ]) + f2.to_bytes(2, "big") + f3.to_bytes(2, "big")
    xdata = zlib.compress(bytes(entries))
    buf += (
        b"9 0 obj\n<< /Type /XRef /Size " + str(size).encode()
        + b" /W [1 2 2] /Root 1 0 R /Length " + str(len(xdata)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + xdata
        + b"\nendstream\nendobj\n"
    )
    buf += b"startxref\n" + str(xref_obj_pos).encode() + b"\n%%EOF\n"
    return bytes(buf)


def build_pdf(text: str, seed_key: str = "0", corrupt: bool = False,
              style: str | None = None) -> bytes:
    """A complete single-page PDF whose extracted text is ``text``.

    ``style``: 'classic' (PDF 1.4 xref table) or 'xstream' (PDF 1.5 object
    stream + cross-reference stream); default: seeded choice (~30% xstream)
    so the corpus exercises both xref walks.
    """
    rng = random.Random(f"pdf:{seed_key}")
    content, _font = _content_stream(text, rng)
    flate = zlib.compress(content)
    if corrupt:
        flate = flate[: max(1, len(flate) // 2)]  # truncated stream
    objects = _base_objects(flate)
    if style is None:
        style = "xstream" if rng.random() < 0.3 else "classic"
    if style == "xstream":
        return _emit_xref_stream(objects)
    return _emit_classic(objects)


def build_pdf_multi(texts: list[str], seed_key: str = "0") -> bytes:
    """A complete MULTI-page PDF (classic layout): /Pages with one Kid per
    text, each page with its own FlateDecode content stream, fonts shared.
    Object layout: 1 catalog, 2 pages, 5/6 fonts, 7 cmap, then page i →
    obj 8+2i, its content → obj 9+2i."""
    rng = random.Random(f"pdfm:{seed_key}")
    kids = b" ".join(f"{8 + 2 * i} 0 R".encode() for i in range(len(texts)))
    objects: dict[int, bytes] = {}
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objects[2] = (b"<< /Type /Pages /Kids [" + kids + b"] /Count "
                  + str(len(texts)).encode() + b" >>")
    base = _base_objects(b"")  # reuse the shared font/cmap objects
    objects[5], objects[6], objects[7] = base[5], base[6], base[7]
    # 3 and 4 are unused in this layout; keep numbering dense for the
    # classic xref emitter (harmless placeholder objects)
    objects[3] = b"<< >>"
    objects[4] = b"<< >>"
    for i, text in enumerate(texts):
        content, _font = _content_stream(text, rng)
        flate = zlib.compress(content)
        pnum, cnum = 8 + 2 * i, 9 + 2 * i
        objects[pnum] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 5 0 R /F2 6 0 R >> >> "
            b"/Contents " + str(cnum).encode() + b" 0 R >>"
        )
        objects[cnum] = (
            b"<< /Length " + str(len(flate)).encode()
            + b" /Filter /FlateDecode >>\nstream\n" + flate + b"\nendstream"
        )
    return _emit_classic(objects)


def build_pdf_span(doc_idx: int, page_idx: int, seed: int = 42,
                   corrupt: bool = False) -> str:
    """Base64 PDF payload for a ``kind='pdf'`` span (FIXTURES.md §1)."""
    from fast_pdf_parser_spark.sources.synth import page_text

    text = page_text(doc_idx, page_idx, seed)
    raw = build_pdf(text, seed_key=f"{seed}:{doc_idx}:{page_idx}", corrupt=corrupt)
    return base64.b64encode(raw).decode("ascii")
