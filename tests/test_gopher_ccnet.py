"""Engine-independent semantics pins for the round-9 quality/split trio:

- text_gopher_rules: the decorated corpus and all six Gopher rule flags
  (Rae et al. 2021 A1.1) must equal an independent imperative
  implementation row-for-row — numeral substitution, 8-word line
  grouping, bullet/ellipsis decoration, and the exact-integer threshold
  arithmetic included.
- text_ccnet_bucket: per-language thirds must be balanced (sizes differ
  by <= 1) and value-ordered (max surprisal in head <= min in middle <=
  min in tail's predecessor chain).
- text_stratified_split: every stratum yields EXACTLY floor(n/10) test
  and floor(n/10) val rows; strata under 10 docs yield none.

DuckDB dialect only (no JVM) — Spark==DuckDB is the driver gate.
"""

import os

import duckdb
import pytest

from fast_pdf_parser_spark.operators.relational import QUERIES

SF0001 = "/root/testdata/sf0.001"
HAS_DATA = os.path.exists(os.path.join(SF0001, "documents.parquet"))


def _con_with_docs(rows):
    con = duckdb.connect()
    vals = ", ".join(f"({i}, '{t}')" for i, t in rows)
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM (VALUES {vals}) AS v(doc_id, text)")
    return con


STOPS = {"the", "a", "to", "of", "and", "that", "have", "with"}


def _gopher_reference(rows):
    out = {}
    for doc_id, text in rows:
        words = []
        for pos, w in enumerate(text.split(" ")):
            if (pos + doc_id) % (4 + doc_id % 4) == 0:
                w = str(doc_id * 31 + pos)
            words.append(w)
        lines = []
        for ln in range((len(words) + 7) // 8):
            body = " ".join(words[ln * 8:(ln + 1) * 8])
            if ln % 5 == 0:
                body = "- " + body
            elif ln % 5 == 1:
                body = body + "..."
            lines.append(body)
        n_w, n_l = len(words), len(lines)
        alpha = sum(1 for w in words if any("a" <= c <= "z" for c in w))
        chars = sum(len(w) for w in words)
        stops = len({w for w in words if w in STOPS})
        ell = sum(1 for ln in lines if ln.endswith("..."))
        bul = sum(1 for ln in lines if ln.startswith("- "))
        r = (int(50 <= n_w <= 100000),
             int(3 * n_w <= chars <= 10 * n_w),
             int(10 * ell <= 3 * n_l),
             int(10 * bul <= 9 * n_l),
             int(5 * alpha >= 4 * n_w),
             int(stops >= 2))
        out[doc_id] = (n_w, n_l, alpha, chars, stops, ell, bul,
                       *r, int(all(r)))
    return out


def test_gopher_rules_match_independent_reference():
    # doc 0: long fluent doc with two stopwords -> keep; doc 1: 9 words
    # (fails r1, single bullet line of two -> r4 edge); doc 2: stopword-
    # free (fails r6); doc 3: doc_id%4==3 -> modulus 7 (lowest numeral
    # rate, r5 passes) vs doc 4: modulus 4 (25% numerals, r5 fails)
    rows = [
        (0, " ".join(["the", "a", "quick", "word"] * 15)),
        (1, "- tiny doc with just nine words here now"
            .replace("- ", "short ")),
        (2, " ".join(f"w{i}" for i in range(60))),
        (3, " ".join(["of", "and", "solid", "text"] * 14)),
        (4, " ".join(["that", "have", "dense", "prose"] * 14)),
    ]
    expected = _gopher_reference(rows)
    got = {r[0]: tuple(r[1:]) for r in _con_with_docs(rows).execute(
        QUERIES["text_gopher_rules"]["duck"]).fetchall()}
    assert got == expected
    keeps = [v[-1] for v in expected.values()]
    assert 0 < sum(keeps) < len(keeps)  # both outcomes exercised


@pytest.mark.skipif(not HAS_DATA, reason="driver testdata not present")
def test_gopher_rules_corpus_match_and_variation():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM '{SF0001}/documents.parquet'")
    docs = con.execute("SELECT doc_id, text FROM documents").fetchall()
    expected = _gopher_reference(docs)
    got = {r[0]: tuple(r[1:]) for r in con.execute(
        QUERIES["text_gopher_rules"]["duck"]).fetchall()}
    assert got == expected
    # the gate genuinely splits the corpus
    keeps = sum(v[-1] for v in got.values())
    assert 0 < keeps < len(got)


@pytest.mark.skipif(not HAS_DATA, reason="driver testdata not present")
def test_ccnet_buckets_balanced_and_value_ordered():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM '{SF0001}/documents.parquet'")
    rows = con.execute(QUERIES["text_ccnet_bucket"]["duck"]).fetchall()
    assert rows
    import collections
    by_lang = collections.defaultdict(lambda: collections.defaultdict(list))
    for doc_id, lang, surp, lang_docs, bucket in rows:
        by_lang[lang][bucket].append(surp)
        assert lang_docs == sum(
            1 for r in rows if r[1] == lang)
    for lang, buckets in by_lang.items():
        sizes = [len(buckets.get(b, [])) for b in ("head", "middle", "tail")]
        assert max(sizes) - min(sizes) <= 1          # exact thirds
        if all(sizes):                               # value-ordered tiers
            assert max(buckets["head"]) <= min(buckets["middle"])
            assert max(buckets["middle"]) <= min(buckets["tail"])


@pytest.mark.skipif(not HAS_DATA, reason="driver testdata not present")
def test_stratified_split_exact_proportions():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM '{SF0001}/documents.parquet'")
    rows = con.execute(QUERIES["text_stratified_split"]["duck"]).fetchall()
    assert rows
    import collections
    strata = collections.defaultdict(collections.Counter)
    for doc_id, source, lang, n, split in rows:
        strata[(source, lang, n)][split] += 1
    for (source, lang, n), counts in strata.items():
        assert sum(counts.values()) == n
        assert counts["test"] == n // 10   # EXACT, not binomial
        assert counts["val"] == n // 10
        assert counts["train"] == n - 2 * (n // 10)
        if n < 10:
            assert counts["test"] == 0 and counts["val"] == 0


# --- text_dsir_weight --------------------------------------------------------

def _con_with_lang_docs(rows):
    con = duckdb.connect()
    vals = ", ".join(f"({i}, '{t}', '{lang}')" for i, t, lang in rows)
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM (VALUES {vals}) AS v(doc_id, text, lang)")
    return con


def test_dsir_weight_matches_independent_reference():
    import collections
    import math

    rows = [
        (0, "domain term domain term special", "en"),
        (1, "domain special term other", "en"),
        (2, "other noise noise filler", "de"),
        (3, "domain term special other", "de"),   # target-like non-en doc
        (4, "noise filler filler noise", "fr"),
    ]
    tgt, raw = collections.Counter(), collections.Counter()
    for _i, t, lang in rows:
        for w in t.split(" "):
            raw[w] += 1
            if lang == "en":
                tgt[w] += 1
    nt, ns, v = sum(tgt.values()), sum(raw.values()), len(raw)
    s = {w: math.floor(math.log((tgt.get(w, 0) + 1) * (ns + v)
                                / ((raw[w] + 1) * (nt + v))) * 1e6 + 0.5)
         for w in raw}
    expected = {}
    for i, t, lang in rows:
        words = t.split(" ")
        tot = sum(s[w] for w in words)
        expected[i] = (lang, len(words), tot,
                       math.floor(tot / len(words) + 0.5),
                       1 if tot > 0 else 0)
    got = {r[0]: tuple(r[1:]) for r in _con_with_lang_docs(rows).execute(
        QUERIES["text_dsir_weight"]["duck"]).fetchall()}
    assert got == expected
    # the weighting discriminates: the target-like de doc outscores the
    # noise docs, and at least one doc lands on each side of keep
    assert expected[3][2] > expected[2][2] > expected[4][2]
    keeps = [v[4] for v in expected.values()]
    assert 0 < sum(keeps) < len(keeps)


# --- events_funnel -----------------------------------------------------------

def test_funnel_windowed_subsequence_semantics():
    # u1 converts fully inside the windows; u2 clicks in-window but buys
    # outside the 24h click window (step 2); u3 views only (step 1);
    # u4's click precedes its first view (ordering, step 1); u5's
    # purchase precedes its click (step 2).
    ev = [
        (0, "2024-01-01 00:00:00", 1, "view"),
        (1, "2024-01-01 01:00:00", 1, "click"),
        (2, "2024-01-01 02:30:00", 1, "purchase"),
        (3, "2024-01-02 00:00:00", 2, "view"),
        (4, "2024-01-02 10:00:00", 2, "click"),
        (5, "2024-01-04 00:00:00", 2, "purchase"),
        (6, "2024-01-03 00:00:00", 3, "view"),
        (7, "2024-01-05 00:00:00", 4, "click"),
        (8, "2024-01-05 01:00:00", 4, "view"),
        (9, "2024-01-06 00:00:00", 5, "purchase"),
        (10, "2024-01-06 01:00:00", 5, "view"),
        (11, "2024-01-06 02:00:00", 5, "click"),
    ]
    con = duckdb.connect()
    vals = ", ".join(f"({i}, TIMESTAMP '{ts}', {u}, '{t}')"
                     for i, ts, u, t in ev)
    con.execute(f"CREATE VIEW events AS SELECT * FROM (VALUES {vals}) "
                f"AS v(event_id, ts, user_id, event_type)")
    got = {r[0]: tuple(r[1:]) for r in con.execute(
        QUERIES["events_funnel"]["duck"]).fetchall()}
    assert got == {
        1: (3, 3600, 5400),
        2: (2, 36000, -1),
        3: (1, -1, -1),
        4: (1, -1, -1),
        5: (2, 3600, -1),
    }


@pytest.mark.skipif(not HAS_DATA, reason="driver testdata not present")
def test_funnel_corpus_all_steps_reached():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS "
                f"SELECT * FROM '{SF0001}/events.parquet'")
    rows = con.execute(QUERIES["events_funnel"]["duck"]).fetchall()
    assert rows
    for _u, step, s1, s2 in rows:
        assert step in (1, 2, 3)
        assert (s1 >= 0) == (step >= 2)   # latency iff the step happened
        assert (s2 >= 0) == (step == 3)
        if step >= 2:
            assert 0 <= s1 <= 86400       # inside the conversion window
        if step == 3:
            assert 0 <= s2 <= 86400


# --- events_retention --------------------------------------------------------

def test_retention_matrix_semantics():
    # cohort week = week of FIRST signup; activity = ANY event that week;
    # u1 signs up week 0, active weeks 0/1/3 (gap week 2); u2 signs up
    # week 1 (its week-0 view precedes the cohort and must NOT count);
    # u3 never signs up and must be absent from the matrix.
    ev = [
        (0, "2024-01-01 10:00:00", 1, "signup"),
        (1, "2024-01-08 10:00:00", 1, "click"),
        (2, "2024-01-22 10:00:00", 1, "view"),
        (3, "2024-01-03 10:00:00", 2, "view"),
        (4, "2024-01-10 10:00:00", 2, "signup"),
        (5, "2024-01-17 10:00:00", 2, "purchase"),
        (6, "2024-01-05 10:00:00", 3, "view"),
    ]
    con = duckdb.connect()
    vals = ", ".join(f"({i}, TIMESTAMP '{ts}', {u}, '{t}')"
                     for i, ts, u, t in ev)
    con.execute(f"CREATE VIEW events AS SELECT * FROM (VALUES {vals}) "
                f"AS v(event_id, ts, user_id, event_type)")
    got = {(r[0], r[1]): (r[2], r[3], r[4]) for r in con.execute(
        QUERIES["events_retention"]["duck"]).fetchall()}
    assert got == {
        (0, 0): (1, 1, 10000),
        (0, 1): (1, 1, 10000),
        (0, 3): (1, 1, 10000),   # week 2 gap: no row, not a zero row
        (1, 0): (1, 1, 10000),
        (1, 1): (1, 1, 10000),
    }


@pytest.mark.skipif(not HAS_DATA, reason="driver testdata not present")
def test_retention_corpus_invariants():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS "
                f"SELECT * FROM '{SF0001}/events.parquet'")
    rows = con.execute(QUERIES["events_retention"]["duck"]).fetchall()
    assert rows
    for cw, off, size, active, bp in rows:
        assert off >= 0 and 0 < active <= size
        assert bp == int(active * 10000.0 / size + 0.5)
        if off == 0:   # the sanity diagonal: signup week is always active
            assert active == size and bp == 10000


# --- text_tfidf_keywords -----------------------------------------------------

def test_tfidf_matches_independent_reference():
    import collections
    import math

    rows = [
        (0, "apple apple apple common common shared"),
        (1, "banana banana common shared shared"),
        (2, "cherry common common common shared"),
        (3, "durian apple banana cherry common shared"),
    ]
    tf = collections.defaultdict(collections.Counter)
    df = collections.Counter()
    for i, t, in rows:
        ws = t.split(" ")
        tf[i].update(ws)
        for w in set(ws):
            df[w] += 1
    n = len(rows)
    idf = {w: math.floor(math.log(n / d) * 1e6 + 0.5) for w, d in df.items()}
    expected = {}
    for i in tf:
        scored = sorted(((tf[i][w] * idf[w], w) for w in tf[i]),
                        key=lambda x: (-x[0], x[1]))[:3]
        expected[i] = [(r + 1, w, tf[i][w], idf[w], s)
                       for r, (s, w) in enumerate(scored)]
    got = collections.defaultdict(list)
    for doc_id, rnk, w, t, i_fp, s_fp in _con_with_lang_docs(
            [(i, t, 'en') for i, t in rows]).execute(
            QUERIES["text_tfidf_keywords"]["duck"]).fetchall():
        got[doc_id].append((rnk, w, t, i_fp, s_fp))
    assert {k: sorted(v) for k, v in got.items()} == {
        k: sorted(v) for k, v in expected.items()}
    # the corpus-wide word ('common', df=n) has idf exactly 0 and never
    # outranks a distinctive term
    assert idf["common"] == 0
    assert all(w != "common" or s == 0 for v in expected.values()
               for (_r, w, _t, _i, s) in v)


# --- dedup_minhash_quality ---------------------------------------------------

@pytest.mark.skipif(not HAS_DATA, reason="driver testdata not present")
def test_minhash_estimator_tracks_true_jaccard():
    import math

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM '{SF0001}/documents.parquet'")
    rows = con.execute(
        QUERIES["dedup_minhash_quality"]["duck"]).fetchall()
    assert rows
    errs = []
    for _a, _b, m, est, true, err in rows:
        assert 0 <= m <= 16 and est == m * 625
        assert 0 <= true <= 10000
        assert err == abs(est - true)
        errs.append(err / 10000.0)
    # Broder's bound: stderr of a k=16 estimator is sqrt(j(1-j)/16)
    # <= 0.125; the MEAN absolute error across pairs must sit well
    # inside a few sigma of that (3-sigma guard, seeded hashes => stable)
    assert sum(errs) / len(errs) <= 3 * 0.125
    # and the estimator must actually discriminate: the highest-true
    # pair estimates higher than the lowest-true pair
    hi = max(rows, key=lambda r: r[4])
    lo = min(rows, key=lambda r: r[4])
    if hi[4] - lo[4] > 2500:
        assert hi[3] > lo[3]


# --- tpch_q1_pricing ---------------------------------------------------------

@pytest.mark.skipif(not HAS_DATA, reason="driver testdata not present")
def test_tpch_q1_equals_decimal_spec_answer():
    """The fixed-point Q1 must equal the TPC-H spec computed in exact
    DECIMAL arithmetic (what the spec's DECIMAL(15,2) columns would
    produce) — proving the per-row quantization IS the spec answer, not
    an approximation of it."""
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS "
                f"SELECT * FROM '{SF0001}/lineitem.parquet'")
    got = {(r[0], r[1]): r[2:] for r in con.execute(
        QUERIES["tpch_q1_pricing"]["duck"]).fetchall()}
    spec = con.execute("""
SELECT l_returnflag, l_linestatus,
       sum(CAST(l_quantity AS DECIMAL(18,2))),
       sum(CAST(l_extendedprice AS DECIMAL(18,2))),
       sum(CAST(l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l_discount AS DECIMAL(18,2)))),
       sum(CAST(l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l_discount AS DECIMAL(18,2)))
           * (1 + CAST(l_tax AS DECIMAL(18,2)))),
       sum(CAST(l_discount AS DECIMAL(18,2))),
       count(*)
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus""").fetchall()
    assert spec and len(spec) == len(got)
    for rf, ls, sq, sp, sdp, sch, sd, n in spec:
        q = got[(rf, ls)]
        assert q[0] == int(sq * 100)
        assert q[1] == int(sp * 100)
        assert q[2] == int(sdp * 10000)
        assert q[3] == int(sch * 1000000)
        # averages: floor(sum/count + 0.5) on the same exact integers
        assert q[4] == int(int(sq * 100) / n + 0.5)
        assert q[5] == int(int(sp * 100) / n + 0.5)
        assert q[6] == int(int(sd * 100) / n + 0.5)
        assert q[7] == n


@pytest.mark.skipif(not HAS_DATA, reason="driver testdata not present")
def test_tpch_q5_equals_decimal_spec_answer():
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "supplier",
              "nation", "region"):
        con.execute(f"CREATE VIEW {t} AS "
                    f"SELECT * FROM '{SF0001}/{t}.parquet'")
    got = {r[0]: (r[1], r[2]) for r in con.execute(
        QUERIES["tpch_q5_local_volume"]["duck"]).fetchall()}
    spec = con.execute("""
SELECT n.n_name,
       sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), count(*)
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
               AND s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n.n_name""").fetchall()
    assert spec and {r[0]: (int(r[1] * 10000), r[2]) for r in spec} == got


# --- corpus_rollup -----------------------------------------------------------

@pytest.mark.skipif(not HAS_DATA, reason="driver testdata not present")
def test_rollup_levels_reconcile():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM '{SF0001}/documents.parquet'")
    rows = con.execute(QUERIES["corpus_rollup"]["duck"]).fetchall()
    leaf = [(r[0], r[1], r[4], r[5], r[6]) for r in rows
            if r[2] == 0 and r[3] == 0]
    sub = {r[0]: (r[4], r[5], r[6]) for r in rows
           if r[2] == 0 and r[3] == 1}
    grand = [r for r in rows if r[2] == 1 and r[3] == 1]
    assert len(grand) == 1 and grand[0][0] == "ALL" and grand[0][1] == "ALL"
    # every source subtotal equals the sum of its leaves, and the grand
    # total equals the sum of the subtotals — the rollup reconciles
    import collections
    agg = collections.defaultdict(lambda: [0, 0, 0])
    for src, _lang, n, c, t in leaf:
        agg[src][0] += n
        agg[src][1] += c
        agg[src][2] += t
    assert {k: tuple(v) for k, v in agg.items()} == sub
    assert grand[0][4] == sum(v[0] for v in sub.values())
    n_docs = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert grand[0][4] == n_docs


# --- events_sliding_value ----------------------------------------------------

def test_sliding_range_frame_includes_same_second_peers():
    # two events in the SAME second for user 1: a RANGE frame includes
    # BOTH in each other's window (peers enter together) — the exact
    # distinction from a ROWS frame, which would see only preceding rows;
    # a third event 3600s later falls OUT of the trailing-hour frame.
    ev = [
        (0, "2024-01-01 00:00:00.200000", 1, "view", 1.00),
        (1, "2024-01-01 00:00:00.900000", 1, "click", 2.00),
        (2, "2024-01-01 00:30:00.000000", 1, "view", 4.00),
        (3, "2024-01-01 01:00:01.000000", 1, "view", 8.00),
        (4, "2024-01-01 00:10:00.000000", 2, "view", 16.00),
    ]
    con = duckdb.connect()
    vals = ", ".join(f"({i}, TIMESTAMP '{ts}', {u}, '{t}', {v})"
                     for i, ts, u, t, v in ev)
    con.execute(f"CREATE VIEW events AS SELECT * FROM (VALUES {vals}) "
                f"AS v(event_id, ts, user_id, event_type, value)")
    got = {r[1]: (r[2], r[3]) for r in con.execute(
        QUERIES["events_sliding_value"]["duck"]).fetchall()}
    assert got == {
        0: (300, 2),   # peer row 1 included despite being "later"
        1: (300, 2),
        2: (700, 3),
        3: (1200, 2),  # events 0/1 (t=0) aged out of [t-3599, t]
        4: (1600, 1),
    }


@pytest.mark.skipif(not HAS_DATA, reason="driver testdata not present")
def test_tpch_q14_equals_decimal_spec_answer():
    con = duckdb.connect()
    for t in ("lineitem", "part"):
        con.execute(f"CREATE VIEW {t} AS "
                    f"SELECT * FROM '{SF0001}/{t}.parquet'")
    got = con.execute(QUERIES["tpch_q14_promo"]["duck"]).fetchone()
    promo, total, n = con.execute("""
SELECT sum(CASE WHEN p.p_type = 'PROMO'
           THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2))) ELSE 0 END),
       sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), count(*)
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-06-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'""").fetchone()
    assert got[0] == int(promo * 10000)
    assert got[1] == int(total * 10000)
    assert got[2] == n
    assert got[3] == int(int(promo * 10000) * 1000000.0
                         / int(total * 10000) + 0.5)


# --- events_json_extract -----------------------------------------------------

def test_json_extract_handles_ragged_props():
    # real streams have ragged props: missing k, non-numeric k, empty
    # object, malformed JSON — none may crash, all must count as k-less
    ev = [
        (0, "view", '{"k": 7}'),
        (1, "view", '{"k": 11, "x": 1}'),
        (2, "view", '{"x": 3}'),
        (3, "view", '{}'),
        (4, "click", '{"k": 5}'),
    ]
    con = duckdb.connect()
    vals = ", ".join(f"({i}, '{t}', '{p}')" for i, t, p in ev)
    con.execute(f"CREATE VIEW events AS SELECT * FROM (VALUES {vals}) "
                f"AS v(event_id, event_type, props)")
    got = {r[0]: r[1:] for r in con.execute(
        QUERIES["events_json_extract"]["duck"]).fetchall()}
    assert got == {
        "view": (4, 2, 18, -1, 11),   # two k-less rows: sum skips, min=-1
        "click": (1, 1, 5, 5, 5),
    }


# --- tpch_q4_late_priority ---------------------------------------------------

@pytest.mark.skipif(not HAS_DATA, reason="driver testdata not present")
def test_q4_exists_counts_orders_not_lineitems():
    """The semi-join property: an order with MANY late lineitems counts
    ONCE (a naive inner-join rewrite would duplicate it). Re-derive the
    per-priority counts via an explicit DISTINCT-orderkey formulation."""
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS "
                    f"SELECT * FROM '{SF0001}/{t}.parquet'")
    got = dict(con.execute(
        QUERIES["tpch_q4_late_priority"]["duck"]).fetchall())
    ref = dict(con.execute("""
SELECT o.o_orderpriority, count(*) FROM orders o
WHERE o.o_orderkey IN (
  SELECT l.l_orderkey FROM lineitem l JOIN orders o2
    ON l.l_orderkey = o2.o_orderkey
  WHERE l.l_shipdate > o2.o_orderdate + INTERVAL 60 DAY)
GROUP BY o.o_orderpriority""").fetchall())
    assert got == ref and sum(got.values()) > 0
    total_orders = con.execute("SELECT count(*) FROM orders").fetchone()[0]
    assert sum(got.values()) < total_orders   # EXISTS is selective
