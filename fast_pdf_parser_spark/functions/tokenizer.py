"""Greedy longest-match tokenizer — exact reference semantics, in Python.

Replicates ``TiktokenTokenizer`` (include/fast_pdf_parser/tiktoken_tokenizer.h):

- operates on the raw UTF-8 BYTES of the text (the reference works on
  ``std::string`` byte substrings, tiktoken_tokenizer.h:150-186),
- greedy longest match at each position with a 20-BYTE search window
  (``max_len = min(remaining, 20)``, tiktoken_tokenizer.h:161),
- unmatched positions fall back to one raw byte = one token
  (ids 0-255, tiktoken_tokenizer.h:177-181),
- vocabulary parsed from the tiktoken text format ``base64(token) id``
  (tiktoken_tokenizer.h:121-138),
- ``estimate_tokens(text) = (len_bytes + 3) // 4``
  (tiktoken_tokenizer.h:221-223) — the O(1) fast path, used only for
  size-bucketing, never for chunk boundaries (SURVEY.md §4).

The vocabulary is a process-level lazy singleton, mirroring the reference's
``static Vocabulary`` double-checked-lock idiom (tiktoken_tokenizer.h:74-84,
113-139): each Spark Python worker loads it once, not per Arrow batch.

Performance: instead of the reference's backward scan (20→1 byte substring
probes per token), we walk FORWARD through a prefix-closed set — every probe
after a miss is pruned — which visits ~(token_len+1) dict lookups per token.
Identical output by construction: both explore exactly the set of vocabulary
tokens starting at the position and pick the longest. A per-line memo cache
exploits the heavy line repetition of real corpora (blank lines, headings,
boilerplate).
"""

from __future__ import annotations

import base64
import os
from functools import lru_cache

_MAX_TOKEN_BYTES = 20  # tiktoken_tokenizer.h:161

_DEFAULT_VOCAB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data",
    "vocab_fixture.tiktoken",
)


def parse_vocab_text(data: str) -> dict[bytes, int]:
    """Parse ``base64(token) id`` lines (tiktoken_tokenizer.h:126-135)."""
    encoder: dict[bytes, int] = {}
    for line in data.split("\n"):
        space = line.find(" ")
        if space != -1:
            tok = base64.b64decode(line[:space])
            encoder[tok] = int(line[space + 1 :])
    return encoder


class TiktokenTokenizer:
    """Greedy longest-match tokenizer over a tiktoken-format vocabulary."""

    def __init__(self, vocab_path: str | None = None,
                 encoder: dict[bytes, int] | None = None) -> None:
        if encoder is None:
            encoder = _load_vocab_singleton(vocab_path or _DEFAULT_VOCAB_PATH)
        # Tokens longer than the search window can never match
        # (tiktoken_tokenizer.h:161) — drop them up front.
        self._encoder = {
            t: i for t, i in encoder.items() if len(t) <= _MAX_TOKEN_BYTES
        }
        self._decoder = {i: t for t, i in self._encoder.items()}
        # Prefix-closed set for the forward walk.
        prefixes: set[bytes] = set()
        for tok in self._encoder:
            for l in range(1, len(tok) + 1):
                prefixes.add(tok[:l])
        self._prefixes = prefixes
        self._count_line_cached = lru_cache(maxsize=65536)(self._count_uncached)

    # -- encode / decode -------------------------------------------------

    def encode(self, text: str) -> list[int]:
        """tiktoken_tokenizer.h:150-186 (greedy longest match + byte fallback)."""
        data = text.encode("utf-8")
        enc = self._encoder
        pre = self._prefixes
        tokens: list[int] = []
        pos = 0
        n = len(data)
        while pos < n:
            best_len = 0
            best_tok = -1
            max_len = min(n - pos, _MAX_TOKEN_BYTES)
            l = 1
            while l <= max_len:
                sub = data[pos : pos + l]
                if sub not in pre:
                    break
                tid = enc.get(sub)
                if tid is not None:
                    best_len = l
                    best_tok = tid
                l += 1
            if best_len:
                tokens.append(best_tok)
                pos += best_len
            else:
                # byte fallback: ids 0-255 (tiktoken_tokenizer.h:177-181)
                tokens.append(data[pos])
                pos += 1
        return tokens

    def decode(self, tokens: list[int]) -> str:
        """tiktoken_tokenizer.h:191-207 (byte fallback, skip invalid)."""
        out = bytearray()
        for t in tokens:
            tok = self._decoder.get(t)
            if tok is not None:
                out += tok
            elif 0 <= t < 256:
                out.append(t)
        return out.decode("utf-8", errors="replace")

    # -- counting (the hot path) -----------------------------------------

    def _count_uncached(self, data: bytes) -> int:
        enc = self._encoder
        pre = self._prefixes
        pos = 0
        n = len(data)
        count = 0
        while pos < n:
            best_len = 0
            max_len = min(n - pos, _MAX_TOKEN_BYTES)
            l = 1
            while l <= max_len:
                sub = data[pos : pos + l]
                if sub not in pre:
                    break
                if sub in enc:
                    best_len = l
                l += 1
            pos += best_len if best_len else 1
            count += 1
        return count

    def count_tokens(self, text: str) -> int:
        """tiktoken_tokenizer.h:213-215; memoized per distinct line."""
        return self._count_line_cached(text.encode("utf-8"))

    def count_tokens_many(self, texts) -> list[int]:
        """Vectorized counting for a sequence of strings (pandas-friendly)."""
        f = self._count_line_cached
        return [f(t.encode("utf-8")) for t in texts]


def estimate_tokens(text: str) -> int:
    """O(1) estimate ``(len+3)/4`` — tiktoken_tokenizer.h:221-223.

    The reference measures ``std::string::length()`` = UTF-8 byte length.
    """
    return (len(text.encode("utf-8")) + 3) // 4


# process-level vocab singleton keyed by path (tiktoken_tokenizer.h:74-84)
_VOCABS: dict[str, dict[bytes, int]] = {}
_TOKENIZERS: dict[str, TiktokenTokenizer] = {}


def _load_vocab_singleton(path: str) -> dict[bytes, int]:
    vocab = _VOCABS.get(path)
    if vocab is None:
        try:
            with open(path, encoding="ascii") as f:
                vocab = parse_vocab_text(f.read())
        except OSError:
            if path != _DEFAULT_VOCAB_PATH:
                raise
            # Default fixture vocab is code-generated and deterministic —
            # regenerate in memory when the data file is unreadable (e.g.
            # the package was shipped to executors as a --py-files zip).
            from fast_pdf_parser_spark.functions.vocab_fixture import (
                vocab_file_text,
            )
            vocab = parse_vocab_text(vocab_file_text())
        _VOCABS[path] = vocab
    return vocab


def get_tokenizer(vocab_path: str | None = None) -> TiktokenTokenizer:
    """Shared tokenizer instance per vocab path (one per Python worker)."""
    key = vocab_path or _DEFAULT_VOCAB_PATH
    tok = _TOKENIZERS.get(key)
    if tok is None:
        tok = TiktokenTokenizer(vocab_path=key)
        _TOKENIZERS[key] = tok
    return tok
