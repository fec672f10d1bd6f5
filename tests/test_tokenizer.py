"""Tokenizer unit tests — pin the exact reference algorithm
(tiktoken_tokenizer.h:150-186): greedy longest match over BYTES, 20-byte
search window, raw-byte fallback (ids 0-255)."""

import base64

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
