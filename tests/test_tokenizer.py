"""Tokenizer unit tests — pin the exact reference algorithm
(tiktoken_tokenizer.h:150-186): greedy longest match over BYTES, 20-byte
search window, raw-byte fallback (ids 0-255)."""

import base64

import pytest

from fast_pdf_parser_spark.functions.tokenizer import (
    TiktokenTokenizer,
    estimate_tokens,
    get_tokenizer,
    parse_vocab_text,
)


def make_tok(tokens: dict[str, int]) -> TiktokenTokenizer:
    enc = {t.encode("utf-8"): i for t, i in tokens.items()}
    # always include byte tokens below 256 implicitly via fallback; the
    # explicit encoder holds only the multi-byte merges under test
    return TiktokenTokenizer(encoder=enc)


def test_greedy_longest_match():
    tok = make_tok({"un": 300, "lock": 301, "unlock": 302, "u": 303})
    # longest match wins: "unlock" (302), not "un"+"lock"
    assert tok.encode("unlock") == [302]
    assert tok.encode("unlocka") == [302, ord("a")]


def test_byte_fallback():
    tok = make_tok({"ab": 300})
    # 'x' and 'y' unmatched -> raw byte ids
    assert tok.encode("xaby") == [ord("x"), 300, ord("y")]


def test_multibyte_utf8_fallback_per_byte():
    tok = make_tok({})
    # 'é' = 0xC3 0xA9: two byte-fallback tokens (tiktoken_tokenizer.h:177-181)
    assert tok.encode("é") == [0xC3, 0xA9]
    assert tok.count_tokens("é") == 2


def test_twenty_byte_window_cap():
    long_tok = "a" * 25
    tok = TiktokenTokenizer(
        encoder={long_tok.encode(): 300, b"aaaa": 301}
    )
    # the 25-byte token is dropped at load (can never match in the
    # reference, tiktoken_tokenizer.h:161); greedy uses "aaaa" x6 + "a"
    counts = tok.encode("a" * 25)
    assert counts == [301] * 6 + [ord("a")]


def test_count_equals_encode_len():
    tok = get_tokenizer()
    for s in ["", "hello world", "# Chapter 1", "übermäßig groß", "a\nb\n"]:
        assert tok.count_tokens(s) == len(tok.encode(s))


def test_estimate_tokens_byte_length():
    # (len+3)/4 over BYTES (tiktoken_tokenizer.h:221-223)
    assert estimate_tokens("") == 0
    assert estimate_tokens("a") == 1
    assert estimate_tokens("abcd") == 1
    assert estimate_tokens("abcde") == 2
    assert estimate_tokens("é" * 4) == 2  # 8 bytes


def test_vocab_format_roundtrip():
    text = f"{base64.b64encode(b'hello').decode()} 42\n{base64.b64encode(b' world').decode()} 43\n"
    enc = parse_vocab_text(text)
    assert enc == {b"hello": 42, b" world": 43}


def test_decode_roundtrip_fixture_vocab():
    tok = get_tokenizer()
    s = "Hello, wörld! ## Section 1.2\n- item one\n"
    assert tok.decode(tok.encode(s)) == s


def test_trie_regex_equals_walk_fuzz():
    """The compiled trie regex must agree with the explicit greedy walk on
    arbitrary byte strings (incl. invalid UTF-8 and vocab-word mashups)."""
    import random

    tok = get_tokenizer()
    rnd = random.Random(1234)
    words = list(tok._encoder)[:400]
    for _ in range(400):
        s = b"".join(rnd.choice(words) for _ in range(rnd.randint(0, 25)))
        s += bytes(rnd.randrange(256) for _ in range(rnd.randint(0, 12)))
        assert tok._count_uncached(s) == tok._count_walk(s), s
    # and counts equal encode() length on text
    for text in ["# Chapter 1", "the quick brown fox", "naïve — café"]:
        assert tok.count_tokens(text) == len(tok.encode(text))


def test_encode_regex_equals_walk_fuzz():
    """The regex-driven encode() must produce the IDENTICAL id sequence
    (not just count) as the reference prefix-walk encoder, on vocab-word
    mashups, arbitrary unicode, and byte-fallback-heavy strings."""
    import random

    tok = get_tokenizer()
    rnd = random.Random(4321)
    words = [w.decode("utf-8", errors="ignore") for w in
             list(tok._encoder)[:400]]
    for _ in range(300):
        s = "".join(rnd.choice(words) for _ in range(rnd.randint(0, 25)))
        s += "".join(chr(rnd.randrange(0x2500))
                     for _ in range(rnd.randint(0, 8)))
        assert tok.encode(s) == tok._encode_walk(s), repr(s)
    for text in ["", "naïve — café 日本語 🚀", "\n\n\t mixed \x00 bytes"]:
        assert tok.encode(text) == tok._encode_walk(text)
        assert tok.decode(tok.encode(text)) == text


def test_find_real_vocab_env_and_dropin(tmp_path, monkeypatch):
    from fast_pdf_parser_spark.functions import tokenizer as T

    # absent everywhere → None (and get_tokenizer falls back to the fixture)
    monkeypatch.delenv(T._REAL_VOCAB_ENV, raising=False)
    monkeypatch.setattr(T.os.path, "isfile", lambda p: False)
    assert T.find_real_vocab() is None
    monkeypatch.undo()

    # env var wins when the file exists
    fake = tmp_path / "cl100k_base.tiktoken"
    fake.write_text(f"{base64.b64encode(b'hello').decode()} 1000\n")
    monkeypatch.setenv(T._REAL_VOCAB_ENV, str(fake))
    assert T.find_real_vocab() == str(fake)
    # and get_tokenizer() picks it up (fresh singleton key per path)
    tok = T.get_tokenizer()
    assert tok.count_tokens("hellohello") == 2  # vocab word, not byte-fallback
    assert tok.count_tokens("zzz") == 3  # byte fallback for unknown text


def test_real_cl100k_parity_when_present():
    """Gated parity test — the mirror of the reference's GTEST_SKIP pattern
    (tests/test_parser.cpp:37-39): runs only when a genuine
    cl100k_base.tiktoken is available, asserting the reference's published
    claims (tiktoken_tokenizer.h:12,38-39; chunk_test_summary.md:46-53)."""
    from fast_pdf_parser_spark.functions.tokenizer import (
        TiktokenTokenizer, find_real_vocab,
    )

    path = find_real_vocab()
    if path is None:
        pytest.skip("no real cl100k_base.tiktoken available in this env")
    tok = TiktokenTokenizer(vocab_path=path)
    # real-vocab shape: ~100k entries (minus >20-byte tokens, h:161)
    assert len(tok._encoder) > 50_000
    # common English words are single tokens with the real vocabulary
    for w in [" the", " and", " of", "The"]:
        assert tok.count_tokens(w) == 1, w
    # 1-3% claim vs Python tiktoken, when tiktoken itself is importable
    try:
        import tiktoken  # noqa: F401
        enc = tiktoken.get_encoding("cl100k_base")
    except Exception:
        enc = None
    sample = ("The quick brown fox jumps over the lazy dog. " * 40 +
              "Naïve café — résumé.\n" * 10)
    ours = tok.count_tokens(sample)
    if enc is not None:
        ref = len(enc.encode(sample))
        assert abs(ours - ref) / ref <= 0.03, (ours, ref)
    else:
        # sanity band: real-vocab counts land well below byte count and
        # within 2x of the word count for plain English
        n_words = len(sample.split())
        assert n_words * 0.8 <= ours <= n_words * 2, (ours, n_words)
    # chunk-count band (chunk_test_summary.md:46-53): with max=512/min=150
    # most chunks pack into the 501-512 band on uniform prose
    from fast_pdf_parser_spark.config import ChunkOptions
    from fast_pdf_parser_spark.operators.chunker import chunk_pages

    pages = [(f"paragraph {i}. " + "word salad tokens fill space. " * 80, i)
             for i in range(30)]
    chunks = chunk_pages(pages, tok, ChunkOptions(max_tokens=512,
                                                  min_tokens=150))
    sizes = [c.tokens for c in chunks if c.tokens <= 512]
    dense = sum(1 for s in sizes if s > 450)
    assert dense >= len(sizes) * 0.5, sizes


def test_unit_sum_count_equals_whole_text_scan_fuzz():
    """count_tokens on multi-line text decomposes into per-line-unit counts
    (the chunk-recount fast path). Must be BIT-EXACT vs the whole-text
    greedy scan — adversarial inputs: boundary punctuation that forms
    '.\\n'/',\\n'/':\\n' tokens, newline runs ('\\n\\n' token), leading/
    trailing newlines, empty lines, invalid UTF-8 via high codepoints."""
    import random

    tok = get_tokenizer()
    assert tok._line_decomposable  # the fixture vocab qualifies
    rnd = random.Random(99)
    frag = ["the", "quick.", "fox,", "end:", "", " ", "a.b", "#", "naïve",
            "word", ".", ",", ":", "x" * 25]
    for _ in range(500):
        lines = [rnd.choice(frag) for _ in range(rnd.randint(0, 8))]
        text = "\n".join(lines)
        if rnd.random() < 0.3:
            text = "\n" * rnd.randint(1, 3) + text
        if rnd.random() < 0.5:
            text += "\n" * rnd.randint(1, 3)
        direct = tok._count_uncached(text.encode("utf-8"))
        assert tok.count_tokens(text) == direct, repr(text)
    # the exactness precondition itself: no token has \n followed by non-\n
    for t in tok._encoder:
        i = t.find(b"\n")
        if i != -1:
            assert set(t[i:]) == {0x0A}, t


def test_non_decomposable_vocab_falls_back():
    """A vocabulary with a newline-interior token must disable the unit-sum
    path and still count correctly via the whole-text scan."""
    from fast_pdf_parser_spark.functions.tokenizer import TiktokenTokenizer

    enc = {b"a\nb": 1, b"a": 2, b"b": 3, b"\n": 4}
    tok = TiktokenTokenizer(encoder=enc)
    assert not tok._line_decomposable
    # 'a\nb' must count as ONE token (the crossing match the unit-sum
    # path would split into three)
    assert tok.count_tokens("a\nb") == 1
