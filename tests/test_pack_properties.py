"""Property-based test for the sequence-packing manifest.

Runs the DUCKDB side of the dual-dialect SQL against a pure-Python
reference packer over random corpora (random token counts, doc_id gaps,
empty docs). The Spark side is tied to this same SQL text by the oracle
gate (tools/check_oracles.py) and by the sharded-equals-global-window
equality test in test_driver_contract.py, so properties proven here hold
for the Spark plan too — without paying a SparkSession per example.
"""

import duckdb
import pandas as pd
from hypothesis import given, settings, strategies as st

from fast_pdf_parser_spark.operators.relational import QUERIES

SEQ = 128


def _python_pack(rows):
    """Reference: concat tokens in doc_id order, cut every SEQ tokens."""
    out = {}
    offset = 0
    for doc_id, n_tokens in sorted(rows):
        if n_tokens == 0:
            continue
        start, end = offset, offset + n_tokens
        out[doc_id] = (n_tokens, start, end,
                       start // SEQ, (end - 1) // SEQ,
                       (end - 1) // SEQ - start // SEQ + 1)
        offset = end
    return out


@settings(max_examples=40, deadline=None)
@given(st.lists(
    st.tuples(st.integers(0, 5000),            # doc_id (gaps, any spread)
              st.integers(0, 400)),            # token count (0 = empty doc)
    min_size=0, max_size=120, unique_by=lambda t: t[0]))
def test_pack_manifest_matches_python_reference(rows):
    docs = pd.DataFrame(
        [(i, "t " * n, "s", 0) for i, n in rows],
        columns=["doc_id", "text", "source", "n_chars"])
    con = duckdb.connect()
    con.register("documents", docs)
    got = {r[0]: tuple(r[1:]) for r in
           con.execute(QUERIES["text_pack_manifest"]["duck"]).fetchall()}
    want = _python_pack([(i, n) for i, n in rows])
    assert got == want
