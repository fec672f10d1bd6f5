"""Engine-independent semantics pins for the round-8 additions:

- tokenizer_bpe_train: the 3-step relational BPE trainer must equal an
  independent greedy leftmost-first reference implementation (Sennrich
  et al. 2016 semantics), including the 'aaaa' overlap case where the
  window-based nonoverlapping-match resolution (even offsets within a
  run of consecutive candidates) is what's under test.
- dedup_substring_winnow: content-defined anchoring must find a shared
  passage regardless of its word offset in each document (the property
  fixed-stride windowing lacks), and must not flag documents that share
  no 10-word run.
- text_nfc_normalize: the cross-engine parity assumption itself — pandas
  Series.str.normalize('NFC') (the Spark side's kernel) must agree with
  DuckDB nfc_normalize (the oracle side) on the injected sequences and
  on real corpus samples.

All tests run the DuckDB dialect only (no JVM): the Spark dialect's
equality with DuckDB is the driver/check_oracles gate; these pin that
the shared semantics are RIGHT, not merely consistent.
"""

import collections
import os

import duckdb
import pytest

from fast_pdf_parser_spark.operators.relational import (
    HYBRID_ORACLES,
    QUERIES,
    _NFC_INJECT,
    _WINNOW_PASSAGE_A,
    _WINNOW_PASSAGE_B,
)

SF0001 = "/root/testdata/sf0.001"
HAS_DATA = os.path.exists(os.path.join(SF0001, "documents.parquet"))


def _con_with_docs(rows):
    con = duckdb.connect()
    vals = ", ".join(f"({i}, '{t}')" for i, t in rows)
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM (VALUES {vals}) AS v(doc_id, text)")
    return con


def _bpe_reference(texts, steps=3):
    """Greedy leftmost-first BPE on word frequencies — the published
    algorithm, implemented imperatively as an independent check."""
    wfreq = collections.Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                wfreq[w + "·"] += 1
    syms = {w: list(w) for w in wfreq}
    merges = []
    for _ in range(steps):
        pc = collections.Counter()
        for w, f in wfreq.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        (b1, b2), cnt = sorted(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        merges.append((b1 + b2, cnt))
        for w in wfreq:
            s = syms[w]
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == b1 and s[i + 1] == b2:
                    out.append(b1 + b2)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges


def _run_bpe_train(con):
    return con.execute(QUERIES["tokenizer_bpe_train"]["duck"]).fetchall()


def test_bpe_train_overlap_runs_match_reference():
    # 'aaaa' makes the best pair (a,a) self-overlapping: greedy
    # leftmost-first must merge positions 0-1 and 2-3, never 1-2. The
    # reference resolves it imperatively; the SQL resolves it with the
    # even-offset-within-run rule — they must agree for odd AND even runs.
    texts = ["aaaa aaaa aaa baab", "aaaa aaa ab", "aaaaa b aaaa"]
    rows = _run_bpe_train(_con_with_docs(enumerate(texts)))
    ref = _bpe_reference(texts)
    assert [(m, c) for _s, m, c in rows] == ref


def test_bpe_train_tiebreak_and_marker():
    # Distinct words, marker pairs included; ties broken (s1, s2) asc.
    texts = ["cat bat rat", "cat bat", "cat"]
    rows = _run_bpe_train(_con_with_docs(enumerate(texts)))
    ref = _bpe_reference(texts)
    assert [(m, c) for _s, m, c in rows] == ref


@pytest.mark.skipif(not HAS_DATA, reason="driver testdata not present")
def test_bpe_train_real_corpus_matches_reference():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM '{SF0001}/documents.parquet'")
    texts = [t for (t,) in con.execute(
        "SELECT text FROM documents").fetchall()]
    rows = _run_bpe_train(con)
    assert [(m, c) for _s, m, c in rows] == _bpe_reference(texts)


def test_winnow_finds_passage_at_any_offset():
    # The same passage is planted at word offset 0, 7, and 19 of three
    # otherwise-disjoint documents; a fourth document shares nothing.
    # Content-defined anchoring must flag exactly docs 1-3. doc_ids are
    # chosen NOT divisible by 3 or 5 so the query's own injection
    # contributes nothing.
    passage = _WINNOW_PASSAGE_A  # known to contain >=1 anchor word
    fill = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    f = fill.split()
    rows = [
        (1, f"{passage} {' '.join(f)}"),
        (2, f"{' '.join(f[:7])} {passage} {' '.join(f[7:])}"),
        (4, f"{' '.join(f[:19])} {passage} {' '.join(f[19:])}"),
        (7, "one two three four five six seven eight nine ten eleven "
            "twelve thirteen fourteen fifteen sixteen seventeen eighteen "
            "nineteen twenty twentyone twentytwo twentythree twentyfour"),
    ]
    out = {r[0]: r for r in _con_with_docs(rows).execute(
        QUERIES["dedup_substring_winnow"]["duck"]).fetchall()}
    for doc in (1, 2, 4):
        assert out[doc][4] > 0, f"doc {doc}: planted passage not found"
    assert out[7][4] == 0, "disjoint doc falsely flagged"


@pytest.mark.skipif(not HAS_DATA, reason="driver testdata not present")
def test_winnow_injected_docs_all_flagged():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM '{SF0001}/documents.parquet'")
    rows = con.execute(
        QUERIES["dedup_substring_winnow"]["duck"]).fetchall()
    missed = [r[0] for r in rows
              if (r[0] % 3 == 0 or r[0] % 5 == 0) and r[4] == 0]
    assert not missed, f"injected-passage docs with no dup span: {missed}"


def test_nfc_parity_pandas_vs_duckdb():
    import pandas as pd

    con = duckdb.connect()
    samples = [
        "café",          # decomposed acute -> composed
        "Ångstrom",        # compatibility Angstrom sign -> U+00C5
        "mañana",         # decomposed tilde
        "plain ascii text",     # NFC-invariant control
        "already café ñ Å",     # composed forms stay fixed points
    ]
    got_pd = list(pd.Series(samples).str.normalize("NFC"))
    got_duck = [con.execute("SELECT nfc_normalize(?)", [s]).fetchone()[0]
                for s in samples]
    assert got_pd == got_duck
    # and the control really is invariant
    assert got_pd[3] == samples[3]


@pytest.mark.skipif(not HAS_DATA, reason="driver testdata not present")
def test_nfc_oracle_control_rows_unchanged():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM '{SF0001}/documents.parquet'")
    rows = con.execute(HYBRID_ORACLES["text_nfc_normalize"]).fetchall()
    for doc_id, changed, len_raw, len_nfc, _h in rows:
        if doc_id % 4 == 3:
            assert changed == 0 and len_raw == len_nfc
        else:
            assert changed == 1
    assert _NFC_INJECT.count("WHEN") == 3


def test_license_precedence_specific_beats_substring():
    # 'CC BY-SA' contains 'cc by'; the tagger must yield cc-by-sa, and a
    # doc carrying both a CC grant and a boilerplate 'all rights
    # reserved' footer must keep the earlier (more permissive) match.
    # doc_ids chosen ≡ 4 or 5 (mod 6) so the query's own injection is
    # inert on these rows.
    rows = [
        (5, "work licensed under cc by-sa 4.0 terms"),
        (10, "body text creative commons zero all rights reserved"),
        (11, "plain document with no license statement"),
        (16, "shared under cc by 2.0"),
    ]
    from fast_pdf_parser_spark.operators.relational import QUERIES
    out = dict(
        (r[0], (r[1], r[2]))
        for r in _con_with_docs(rows).execute(
            QUERIES["text_license_tag"]["duck"]).fetchall())
    assert out[5] == ("cc-by-sa", 0)
    assert out[10] == ("cc0", 1)
    assert out[11] == ("none", 0)
    assert out[16] == ("cc-by", 1)


def test_substring_trim_keeper_untouched_other_trimmed():
    # Docs 1 and 2 share the passage; doc 1 (smaller id) is the canonical
    # owner and must keep every word, doc 2 must lose a span covering the
    # passage windows. Doc 7 shares nothing and must be untouched.
    passage = _WINNOW_PASSAGE_A
    fill = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    rows = [
        (1, f"{passage} {fill}"),
        (2, f"{fill} {passage}"),
        (7, "one two three four five six seven eight nine ten eleven "
            "twelve thirteen fourteen fifteen sixteen"),
    ]
    out = {r[0]: r for r in _con_with_docs(rows).execute(
        QUERIES["dedup_substring_trim"]["duck"]).fetchall()}
    n_pass = len(passage.split())
    n_fill = len(fill.split())
    assert out[1][1] == n_pass + n_fill and out[1][2] == 0
    assert out[2][2] > 0 and out[2][1] + out[2][2] == n_pass + n_fill
    assert out[7][2] == 0


def test_bpe_train_sql_textbook_example_any_steps():
    # Sennrich et al.'s own low/lower/lowest walkthrough, 5 steps via the
    # public wrapper on a non-default table name.
    from fast_pdf_parser_spark.operators.relational import bpe_train_sql

    con = duckdb.connect()
    con.execute("CREATE VIEW corpus AS SELECT * FROM "
                "(VALUES (1, 'low lower lowest low low')) v(doc_id, text)")
    rows = con.execute(bpe_train_sql(5, "duck", "corpus")).fetchall()
    assert [m for _s, m, _c in rows] == ["lo", "low", "low·", "lowe",
                                         "lower"]


def test_train_bpe_loop_matches_reference_deep(spark):
    # The imperative persisted-loop trainer (functions/bpe.py) at a depth
    # the inlined-CTE SQL form would never be run at (8 steps), against
    # the independent reference — and, transitively, against the
    # 3-step SQL row (same reference pins both).
    from fast_pdf_parser_spark.functions.bpe import train_bpe

    texts = ["low lower lowest low low", "newer newest new wider wide",
             "aaaa aaa baab aaaa"]
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 "doc_id long, text string")
    got = train_bpe(spark, docs, 8)
    assert got == _bpe_reference(texts, steps=8)


def _py_winnow_trim(texts_by_id):
    """Independent imperative winnow + keep-first trim (the SQL pair's
    semantics re-implemented from the published definitions): anchors at
    hash60(word)%8==0, 10-word shingle fingerprints, nd>=2 duplicated,
    min-doc_id owner keeps, islands merge windows closer than 10 words,
    non-owner islands trimmed."""
    import hashlib

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    words = {d: t.split(" ") for d, t in texts_by_id.items()}
    anchors = {}  # (doc, pos) -> fp
    by_fp = {}
    for d, ws in words.items():
        for p in range(len(ws) - 9):
            if h60(ws[p]) % 8 == 0:
                fp = h60(" ".join(ws[p:p + 10]))
                anchors[(d, p)] = fp
                by_fp.setdefault(fp, []).append(d)
    out = {}
    for d, ws in words.items():
        trim_pos = sorted(
            p for (dd, p), fp in anchors.items() if dd == d
            and len(set(by_fp[fp])) >= 2 and min(by_fp[fp]) != d)
        spans = []
        for p in trim_pos:
            if spans and p <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], p + 10)
            else:
                spans.append([p, p + 10])
        covered = set()
        for s, e2 in spans:
            covered.update(range(s, e2))
        out[d] = " ".join(w for i, w in enumerate(ws) if i not in covered)
    return out


def test_winnow_trim_idempotent_corpus_is_clean():
    # Property: after keep-first trimming, re-detection finds NO
    # duplicated window — every fingerprint survives in exactly its
    # owner. Crafted corpus with the passage at three unaligned offsets
    # plus a doc that shares a long run with another. doc_ids avoid
    # %3==0/%5==0 so the query's own injection stays inert.
    passage = _WINNOW_PASSAGE_A
    fill = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    f = fill.split()
    texts = {
        1: f"{passage} {fill}",
        2: f"{' '.join(f[:7])} {passage} {' '.join(f[7:])}",
        4: f"{' '.join(f[:19])} {passage} {' '.join(f[19:])}",
    }
    # sanity: the SQL trim agrees with the python trim on word counts
    sql_out = {r[0]: r for r in _con_with_docs(sorted(texts.items()))
               .execute(QUERIES["dedup_substring_trim"]["duck"])
               .fetchall()}
    trimmed = _py_winnow_trim(texts)
    for d in texts:
        assert sql_out[d][1] == len(trimmed[d].split(" ")), d
    # idempotence: re-detect over the trimmed corpus -> zero dup anchors
    redetect = {r[0]: r for r in _con_with_docs(sorted(trimmed.items()))
                .execute(QUERIES["dedup_substring_winnow"]["duck"])
                .fetchall()}
    for d, r in redetect.items():
        assert r[2] == 0 and r[4] == 0, (d, r)


def test_span_corrupt_sentinel_assembly_matches_reference():
    # Re-derive the exact input/target strings for a crafted doc with an
    # independent implementation of the content-keyed masking and compare
    # the 60-bit hashes the query emits — pins byte-level sentinel
    # assembly (numbering, spacing, merge-of-adjacent-spans) end to end.
    import hashlib

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    doc_id = 9
    words = ("the quick brown fox jumps over the lazy dog and then runs "
             "far away into the quiet woods tonight again happily").split()
    starts = [p for p in range(len(words))
              if h60(f"{doc_id}:{p}") % 20 == 0]
    spans = []
    for p in starts:
        if spans and p <= spans[-1][1] + 3:
            spans[-1][1] = p
        else:
            spans.append([p, p])
    spans = [(s, min(e + 3, len(words))) for s, e in spans]
    inp, tgt, k, i = [], [], 0, 0
    for s, e in spans:
        inp.extend(words[i:s])
        inp.append(f"<extra_id_{k}>")
        tgt.append(f"<extra_id_{k}> " + " ".join(words[s:e]))
        i, k = e, k + 1
    inp.extend(words[i:])
    exp_input_hash = h60(" ".join(inp))
    exp_target_hash = h60(" ".join(tgt))

    row = _con_with_docs([(doc_id, " ".join(words))]).execute(
        QUERIES["text_span_corrupt"]["duck"]).fetchall()[0]
    assert row[1] == len(spans) and row[2] == sum(e - s for s, e in spans)
    assert row[3] == exp_input_hash and row[4] == exp_target_hash


def test_fim_psm_assembly_matches_reference():
    import hashlib

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    # pick ids covering both gate outcomes
    rows, expected = [], {}
    text = "abcdefghijklmnopqrstuvwxyz0123456789"
    for doc_id in range(1, 12):
        rows.append((doc_id, text))
        if h60(str(doc_id)) % 2 == 1:
            n = len(text)
            r1, r2 = h60(f"{doc_id}:1") % n, h60(f"{doc_id}:2") % n
            c1, c2 = min(r1, r2), max(r1, r2)
            psm = (f"<PRE> {text[:c1]} <SUF> {text[c2:]}"
                   f" <MID> {text[c1:c2]}")
            expected[doc_id] = (1, c1, c2 - c1, h60(psm))
        else:
            expected[doc_id] = (0, 0, 0, h60(text))
    out = {r[0]: tuple(r[1:]) for r in _con_with_docs(rows).execute(
        QUERIES["text_fim_transform"]["duck"]).fetchall()}
    assert out == expected
    assert any(v[0] == 1 for v in expected.values())
    assert any(v[0] == 0 for v in expected.values())


@pytest.mark.skipif(not HAS_DATA, reason="driver testdata not present")
def test_length_batching_invariants():
    # Batches pack ≤16 docs of one (shard, len_class); every doc's token
    # estimate fits [2^(class-1), 2^class); efficiency = sum/(n*max).
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM '{SF0001}/documents.parquet'")
    rows = con.execute(
        QUERIES["text_length_batching"]["duck"]).fetchall()
    assert rows
    for shard, cls, _b, n, mx, sm, eff in rows:
        assert 1 <= n <= 16
        assert 2 ** (cls - 1) <= mx < 2 ** cls
        assert sm <= n * mx
        assert eff == int(sm * 10000.0 / (n * mx) + 0.5)
        assert 0 <= shard < 8


def test_bloom_probe_no_false_negatives_and_fp_at_small_m(monkeypatch):
    # The Bloom invariant: a present key is NEVER missed, at any m; and
    # at a deliberately tiny m (high fill) false positives MUST appear —
    # proving the probe really is a bloom filter, not an exact join in
    # disguise.
    from fast_pdf_parser_spark.operators import relational as R

    def run(m):
        monkeypatch.setattr(R, "_BLOOM_M", m)
        sql = R._bloom_sql(
            h60_text=R._HASH60_DUCK.format(x="text"),
            h60_of=R._HASH60_DUCK.format(
                x="CAST(kh AS VARCHAR) || ':' || CAST(seed AS VARCHAR)"),
            gen_seeds=", unnest(range(0, 4)) AS t(seed)")
        rows = [(i, f"document number {i} body {i * 17}")
                for i in range(200)]
        return _con_with_docs(rows).execute(sql).fetchall()

    big = run(1 << 20)
    assert all(maybe == 1 for _d, maybe, truly in big if truly == 1)
    small = run(97)  # ~800 bits set into 97 positions: saturated
    assert all(maybe == 1 for _d, maybe, truly in small if truly == 1)
    fps = [1 for _d, maybe, truly in small if truly == 0 and maybe == 1]
    assert fps, "saturated filter produced no false positives"
