"""Driver-evidence curation guards — deliberately UNGATED.

These assertions need no Spark session and no testdata, and they guard
the exact failure they'd be skipped into: a typo in _PRIORITY_QUERIES is
filtered silently by the queries() builder, quietly demoting an operator
out of guaranteed driver CORRECTNESS coverage. Gating them behind the
testdata skip (like the rest of the driver-contract module) would mean
the guard itself silently never runs on machines without /root/testdata.
"""

import __spark_entry__ as entrymod


def test_priority_names_all_resolve():
    q = entrymod.queries()
    missing = [n for n in entrymod._PRIORITY_QUERIES if n not in q]
    assert not missing, missing


def test_priority_block_fits_window_and_rotation_covers():
    q = entrymod.queries()
    # the priority block must fit the driver window, or the scheme stops
    # guaranteeing anything
    assert len(entrymod._PRIORITY_QUERIES) <= entrymod._DRIVER_WINDOW
    # rotation covers every non-priority name on a bounded cadence
    overflow = len(q) - entrymod._DRIVER_WINDOW
    rest = len(q) - len(entrymod._PRIORITY_QUERIES)
    assert overflow < rest  # otherwise some name could never rotate in


def test_every_oracle_has_a_query():
    q, o = entrymod.queries(), entrymod.oracle_sql()
    assert set(o) <= set(q)
