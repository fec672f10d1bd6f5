"""Cross-engine numeric-stability guards for the oracle gate.

The only non-exact float operation in any hash-checked query is ln() in
text_unigram_surprisal (everything else is single correctly-rounded
IEEE-754 ops on exactly-representable inputs — bit-identical by the
standard). JVM Math.log and DuckDB's libm each guarantee <=1 ulp, so the
engines can disagree by ~2e-9 absolute on -ln(c/N)*1e6; floor(x+0.5)
then flips only within that distance of an integer. These tests scan the
REAL corpus vocabulary at every driver scale factor and assert a >=1e-3
margin from each rounding boundary — six orders of magnitude of headroom
— so a corpus regeneration that lands near a boundary fails pytest
loudly instead of flaking CORRECTNESS_r{N}.
"""

import math
import os

import duckdb
import pytest

from fast_pdf_parser_spark.operators.relational import _WORDS_DUCK

SF_DIRS = [d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                       "/root/testdata/sf0.1")
           if os.path.exists(os.path.join(d, "documents.parquet"))]

pytestmark = pytest.mark.skipif(not SF_DIRS,
                                reason="driver testdata not present")

MARGIN = 1e-3   # required distance from the floor(x+0.5) boundary
ULP_DRIFT = 4e-9  # generous bound on cross-engine ln()*1e6 disagreement


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_surprisal_quantization_boundary_margin(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'")
    counts = con.execute(
        f"WITH {_WORDS_DUCK}, "
        "cnt AS (SELECT word, count(*) AS c FROM words GROUP BY word) "
        "SELECT c, count(*) AS n_words_at_c FROM cnt GROUP BY c"
    ).fetchall()
    n_total = sum(c * m for c, m in counts)
    assert n_total > 0
    worst = 1.0
    for c, _m in counts:
        x = -math.log(c / n_total) * 1e6 + 0.5
        dist = abs(x - round(x))
        worst = min(worst, dist)
    assert worst > MARGIN, (
        f"corpus {sf_dir}: a word's scaled surprisal sits {worst:.2e} from "
        f"its rounding boundary — within cross-engine ln() drift risk; "
        f"regenerate or adjust the quantization scale")
    assert MARGIN > 100 * ULP_DRIFT  # the margin itself dwarfs the drift


def test_integer_division_is_engine_exact():
    """The OTHER quantization in the query, floor(tot_s/n_words + 0.5),
    divides two exactly-representable integers: IEEE-754 division is
    correctly rounded, so every engine produces the identical double.
    Sanity-pin the claim with DuckDB vs Python over adversarial pairs
    (including x.5-adjacent rationals)."""
    con = duckdb.connect()
    pairs = [(7, 2), (10**15 + 1, 3), (999999999999, 7), (1, 3),
             (2**52 + 1, 2), (10**6 * 3 + 1, 2)]
    for a, b in pairs:
        duck = con.execute(
            "SELECT CAST(floor(CAST(? AS DOUBLE) / ? + 0.5) AS BIGINT)",
            [a, b]).fetchone()[0]
        py = math.floor(a / b + 0.5)
        assert duck == py, (a, b)


MARGIN_BIGRAM = 1e-5  # observed worst 1.0e-4 at sf0.1; drift bound 4e-9


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_bigram_surprisal_boundary_margin(sf_dir):
    """Same guard for the bigram-interpolated model: every distinct
    interpolated probability's scaled surprisal must keep >= 1e-5 from
    its floor(x+0.5) boundary — ~2,500x the cross-engine ln() drift.
    (The bigram tuple space is larger than the vocabulary, so the
    corpus-lottery margin is smaller than the unigram 1e-3 bar; the
    drift headroom is what matters.)"""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'")
    rows = con.execute(r"""
WITH docs_w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '[ \t\n]+') AS ws
  FROM documents WHERE length(trim(text)) > 0
),
pos0 AS (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM docs_w),
pos AS (SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2 FROM pos0),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM pos GROUP BY w1, w2),
c1 AS (SELECT w1, count(*) AS c1 FROM pos GROUP BY w1),
cu AS (SELECT w2 AS w, count(*) AS cu FROM pos GROUP BY w2),
tot AS (SELECT count(*) AS nn FROM pos)
SELECT DISTINCT c2.c2, c1.c1, cu.cu, t.nn
FROM c2 JOIN c1 ON c2.w1 = c1.w1 JOIN cu ON c2.w2 = cu.w
CROSS JOIN tot t""").fetchall()
    assert rows
    worst = 1.0
    for c2, c1, cu, nn in rows:
        p = 0.7 * (c2 / c1) + 0.3 * (cu / nn)
        x = -math.log(p) * 1e6 + 0.5
        worst = min(worst, abs(x - round(x)))
    assert worst > MARGIN_BIGRAM, (
        f"corpus {sf_dir}: a bigram tuple sits {worst:.2e} from its "
        f"rounding boundary — within cross-engine ln() drift risk")
    assert MARGIN_BIGRAM > 1000 * ULP_DRIFT


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_bigram_heldout_boundary_margin(sf_dir):
    """Margin guard for the fit/transform-split model
    (text_bigram_heldout): every distinct smoothed-probability tuple a
    SCORED pair can produce — including the OOV shapes (unseen bigram,
    unseen w1, unseen w2) — must keep >= MARGIN_BIGRAM from its
    floor(x+0.5) boundary."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'")
    rows = con.execute(r"""
WITH docs_w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '[ \t\n]+') AS ws
  FROM documents WHERE length(trim(text)) > 0
),
pos0 AS (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM docs_w),
pos AS (SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2 FROM pos0),
fit AS (SELECT w1, w2 FROM pos WHERE doc_id % 10 = 0),
score AS (SELECT doc_id, w1, w2 FROM pos WHERE doc_id % 10 <> 0),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM fit GROUP BY w1, w2),
c1 AS (SELECT w1, count(*) AS c1 FROM fit GROUP BY w1),
cu AS (SELECT w2 AS w, count(*) AS cu FROM fit GROUP BY w2),
tot AS (SELECT count(*) AS nn FROM fit),
voc AS (SELECT count(*) AS v FROM cu)
SELECT DISTINCT c1.c1, coalesce(c2.c2, 0), coalesce(cu.cu, 0), t.nn, v.v
FROM score s
LEFT JOIN c1 ON s.w1 = c1.w1
LEFT JOIN c2 ON s.w1 = c2.w1 AND s.w2 = c2.w2
LEFT JOIN cu ON s.w2 = cu.w
CROSS JOIN tot t CROSS JOIN voc v""").fetchall()
    assert rows
    worst = 1.0
    for c1, c2, cu, nn, v in rows:
        p = 0.7 * (0.0 if c1 is None else c2 / c1) \
            + 0.3 * ((cu + 1) / (nn + v + 1))
        x = -math.log(p) * 1e6 + 0.5
        worst = min(worst, abs(x - round(x)))
    assert worst > MARGIN_BIGRAM, (
        f"corpus {sf_dir}: a held-out bigram tuple sits {worst:.2e} from "
        f"its rounding boundary — within cross-engine ln() drift risk")


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_dsir_quantization_boundary_margin(sf_dir):
    """text_dsir_weight quantizes ln of an exact-integer ratio per word;
    scan every distinct (target count, raw count) pair at this sf and
    assert the same >=1e-3 margin discipline as the surprisal guards
    (observed >= 5e-3 on the shipped corpora)."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'")
    rows = con.execute(f"""
WITH {_WORDS_DUCK},
tgt AS (SELECT w.word, count(*) AS ct FROM words w
        JOIN documents d ON w.doc_id = d.doc_id
        WHERE d.lang = 'en' GROUP BY w.word),
raw AS (SELECT word, count(*) AS cs FROM words GROUP BY word)
SELECT DISTINCT coalesce(t.ct, 0), r.cs,
       (SELECT sum(ct) FROM tgt), (SELECT sum(cs) FROM raw),
       (SELECT count(*) FROM raw)
FROM raw r LEFT JOIN tgt t ON r.word = t.word""").fetchall()
    assert rows
    worst = 1.0
    for ct, cs, nt, ns, v in rows:
        x = math.log((ct + 1) * (ns + v) / ((cs + 1) * (nt + v))) * 1e6 + 0.5
        worst = min(worst, abs(x - round(x)))
    assert worst >= MARGIN, f"margin {worst} too close to a boundary"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_idf_quantization_boundary_margin(sf_dir):
    """text_tfidf_keywords quantizes ln(N/df) per term; scan every
    distinct df at this sf under the same margin discipline. df == N
    (a corpus-wide word) yields ln(1) = exactly 0.0 — x lands exactly on
    0.5 and floor(0.5) = 0 on both engines with NO drift possible, so
    that case is exempt from the margin, not a flake risk."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'")
    rows = con.execute("""
WITH w AS (SELECT DISTINCT doc_id, unnest(split(text, ' ')) AS word
           FROM documents),
df AS (SELECT word, count(*) AS d FROM w GROUP BY word)
SELECT DISTINCT d, (SELECT count(DISTINCT doc_id) FROM w) FROM df
""").fetchall()
    assert rows
    worst = 1.0
    for d, n in rows:
        if d == n:
            continue   # exact 0.0, drift-free by construction
        x = math.log(n / d) * 1e6 + 0.5
        worst = min(worst, abs(x - round(x)))
    assert worst >= MARGIN, f"idf margin {worst} too close to a boundary"
