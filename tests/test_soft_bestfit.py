"""Engine-independent semantics pins for the round-9 late additions:

- dedup_soft_weight: the duplicate-aware sampling weights (SoftDeDup /
  data-constrained-scaling reweighting) must equal an independent
  group-and-invert reference — exact tier = identical text, near tier =
  identical sorted-distinct wordset — including the planted-duplicate
  aug (doc_id % 11 == 3 adopts parent doc_id % 5's text).
- text_pack_bestfit: the recursive-CTE fold must equal an independent
  imperative next-fit-decreasing reference bin-for-bin, including
  oversize items (alone in their bins), exact fits, and ties.

All tests run the DuckDB dialect only (no JVM): Spark==DuckDB is the
driver/check_oracles gate; these pin that the shared semantics are
RIGHT, not merely consistent.
"""

import hashlib
import os

import duckdb
import pytest

from fast_pdf_parser_spark.operators.relational import (
    BESTFIT_CAP,
    BESTFIT_SHARDS,
    HYBRID_ORACLES,
    QUERIES,
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


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# --- dedup_soft_weight -------------------------------------------------------

def _soft_reference(rows):
    """Independent reweighting: apply the aug, group by exact text and by
    sorted-distinct wordset, weight = floor(1e6 / group size)."""
    texts = dict(rows)
    aug = {i: (texts[i % 5] if i % 11 == 3 else t) for i, t in rows}
    import collections
    exact = collections.Counter(aug.values())
    near_key = {i: " ".join(sorted(set(t.split(" ")))) for i, t in aug.items()}
    near = collections.Counter(near_key.values())
    rep = {}
    for i in sorted(aug):
        rep.setdefault(aug[i], i)
    out = {}
    for i, t in aug.items():
        ne, nn = exact[t], near[near_key[i]]
        out[i] = (ne, nn, 1000000 // ne, 1000000 // nn,
                  1 if rep[t] == i else 0)
    return out


def test_soft_weight_matches_independent_reference():
    # 33 docs: ids 3, 14, 25 adopt texts of parents 3, 4, 0; doc 20 and
    # doc 21 are natural exact duplicates of each other; docs 22/23 share
    # a wordset (same words, different order/multiplicity) but not text.
    rows = []
    for i in range(33):
        if i == 21:
            rows.append((i, "twin text body shared"))
        elif i == 20:
            rows.append((i, "twin text body shared"))
        elif i == 22:
            rows.append((i, "alpha beta gamma"))
        elif i == 23:
            rows.append((i, "gamma beta alpha beta"))
        else:
            rows.append((i, f"unique document {i} words {i * 13}"))
    expected = _soft_reference(rows)
    got = {r[0]: tuple(r[1:]) for r in _con_with_docs(rows).execute(
        QUERIES["dedup_soft_weight"]["duck"]).fetchall()}
    assert got == expected
    # the planted structure really fired: an exact group > 1 (parents),
    # and a near-group strictly larger than its exact group (22/23)
    assert any(v[0] > 1 for v in expected.values())
    assert any(v[1] > v[0] for v in expected.values())
    # one canonical per exact group, and weights invert group sizes
    texts = dict(rows)
    n_exact_groups = len({(texts[i % 5] if i % 11 == 3 else texts[i])
                          for i in texts})
    assert sum(v[4] for v in expected.values()) == n_exact_groups
    for ne, nn, we, wn, _c in expected.values():
        assert we == 1000000 // ne and wn == 1000000 // nn
        assert nn >= ne


@pytest.mark.skipif(not HAS_DATA, reason="driver testdata not present")
def test_soft_weight_corpus_invariants():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM '{SF0001}/documents.parquet'")
    rows = con.execute(QUERIES["dedup_soft_weight"]["duck"]).fetchall()
    n = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert len(rows) == n  # soft dedup DROPS nothing — that's the point
    planted = [r for r in rows if r[0] > 1]
    assert planted, "aug produced no exact-duplicate groups"
    for _d, ne, nn, we, wn, canon in rows:
        assert nn >= ne >= 1
        assert we == 1000000 // ne and wn == 1000000 // nn
        assert canon in (0, 1)
    # canonical count == number of exact groups
    n_groups = con.execute(
        "WITH aug AS (SELECT d.doc_id, CASE WHEN d.doc_id % 11 = 3 "
        "THEN p.text ELSE d.text END AS text FROM documents d LEFT JOIN "
        "(SELECT doc_id, text FROM documents WHERE doc_id < 5) p "
        "ON p.doc_id = d.doc_id % 5) "
        "SELECT count(DISTINCT text) FROM aug").fetchone()[0]
    assert sum(r[5] for r in rows) == n_groups


# --- text_pack_bestfit -------------------------------------------------------

def _bestfit_reference(rows, cap=BESTFIT_CAP, shards=BESTFIT_SHARDS):
    """Independent imperative NFD: per shard, sort (toks DESC, doc_id),
    single open bin, new bin when the next doc overflows."""
    docs = [(i, (len(t) + 3) // 4, _h60(f"bf:{i}") % shards)
            for i, t in rows if (len(t) + 3) // 4 > 0]
    out = {}
    for s in sorted({d[2] for d in docs}):
        run = sorted((d for d in docs if d[2] == s),
                     key=lambda d: (-d[1], d[0]))
        bin_id, fill = 0, None
        for i, toks, _s in run:
            if fill is None:
                fill = toks
            elif fill + toks <= cap:
                fill += toks
            else:
                bin_id += 1
                fill = toks
            out[i] = (s, toks, bin_id)
    # per-bin stats
    import collections
    agg = collections.defaultdict(lambda: [0, 0])
    for i, (s, toks, b) in out.items():
        agg[(s, b)][0] += toks
        agg[(s, b)][1] += 1
    return {i: (s, toks, b, agg[(s, b)][0], agg[(s, b)][1],
                1 if toks > cap else 0)
            for i, (s, toks, b) in out.items()}


def test_bestfit_matches_independent_reference():
    # doc lengths chosen so some docs EXCEED the 128-token capacity
    # (oversize: alone in a bin), some fit exactly, and several tie
    rows = [(i, "x" * ((37 * i * i + 11 * i) % 700 + 8)) for i in range(60)]
    rows += [(100, "y" * (BESTFIT_CAP * 4)),       # exactly cap tokens
             (101, "z" * (BESTFIT_CAP * 4 + 4))]   # cap + 1: oversize
    expected = _bestfit_reference(rows)
    got = {r[1]: (r[0], r[2], r[3], r[4], r[5], r[6])
           for r in _con_with_docs(rows).execute(
               HYBRID_ORACLES["text_pack_bestfit"]).fetchall()}
    assert got == expected
    oversize = [i for i, v in expected.items() if v[5] == 1]
    assert oversize, "no oversize docs in the synthetic corpus"
    for i in oversize:  # every oversize doc is ALONE in its bin
        assert expected[i][4] == 1


@pytest.mark.skipif(not HAS_DATA, reason="driver testdata not present")
def test_bestfit_corpus_invariants():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM '{SF0001}/documents.parquet'")
    rows = con.execute(HYBRID_ORACLES["text_pack_bestfit"]).fetchall()
    assert rows
    import collections
    bins = collections.defaultdict(list)
    for shard, doc_id, toks, bin_id, bin_toks, bin_docs, oversize in rows:
        assert 0 <= shard < BESTFIT_SHARDS
        assert oversize == (1 if toks > BESTFIT_CAP else 0)
        bins[(shard, bin_id)].append((toks, bin_toks, bin_docs, oversize))
    for (shard, bin_id), members in bins.items():
        toks_sum = sum(m[0] for m in members)
        assert all(m[1] == toks_sum for m in members)
        assert all(m[2] == len(members) for m in members)
        if len(members) > 1:  # multi-doc bins never overflow capacity
            assert toks_sum <= BESTFIT_CAP
    # bin ids are contiguous from 0 within each shard
    by_shard = collections.defaultdict(set)
    for shard, bin_id in bins:
        by_shard[shard].add(bin_id)
    for shard, ids in by_shard.items():
        assert ids == set(range(len(ids)))


def test_bestfit_differential_fuzz():
    """Differential fuzz: on seeded random corpora (venv-stable LCG, no
    global entropy), the recursive-CTE fold must equal the independent
    imperative NFD for every document — lengths spanning sub-word to
    multi-bin, dense ties included."""
    seed = 0x5eed
    for trial in range(12):
        seed = (seed * 6364136223846793005 + 1442695040888963407) % 2**64
        rng = seed
        rows = []
        n_docs = 5 + (seed % 90)
        for i in range(n_docs):
            rng = (rng * 6364136223846793005 + 1442695040888963407) % 2**64
            # lengths 1..~1400 chars with heavy tie mass at small sizes
            length = 1 + (rng >> 11) % (8 if rng % 3 == 0 else 1400)
            rows.append((i, "x" * length))
        expected = _bestfit_reference(rows)
        got = {r[1]: (r[0], r[2], r[3], r[4], r[5], r[6])
               for r in _con_with_docs(rows).execute(
                   HYBRID_ORACLES["text_pack_bestfit"]).fetchall()}
        assert got == expected, f"trial {trial} diverged"
