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


def test_never_windowed_names_are_priority():
    """r7 verdict What's-wrong #1, made structurally impossible: a query
    added to QUERIES but not to _PRIORITY_QUERIES can sit outside the
    driver window for rounds (ann_ivf_int8 shipped in r7 with zero driver
    CORRECTNESS rows ever). Any queries() name that has never appeared in
    ANY driver-written CORRECTNESS_r*.json must lead the window until it
    lands a row."""
    import glob
    import json
    import os

    repo = os.path.dirname(os.path.abspath(entrymod.__file__))
    seen: set[str] = set()
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        with open(path) as f:
            seen.update(json.load(f).keys())
    never_windowed = set(entrymod.queries()) - seen
    unprioritized = never_windowed - set(entrymod._PRIORITY_QUERIES)
    assert not unprioritized, (
        f"never driver-verified and not in _PRIORITY_QUERIES: "
        f"{sorted(unprioritized)}")


def test_rotation_covers_every_name_within_bounded_rounds(monkeypatch):
    """The documented guarantee: every queries() name lands inside the
    driver's _DRIVER_WINDOW within ceil(rest/shown) consecutive rounds,
    where shown is the number of window slots left after the priority
    block — that is the arc length the rotation advances per round, so
    it (not overflow) sets the cadence whenever shown < overflow.
    Simulate rounds by patching the round index and take the union of
    window prefixes."""
    import math

    import __spark_entry__ as em

    q0 = em.queries()
    overflow = len(q0) - em._DRIVER_WINDOW
    rest = len(q0) - len([n for n in em._PRIORITY_QUERIES if n in q0])
    if overflow <= 0:
        return  # everything always fits; nothing to prove
    shown = em._DRIVER_WINDOW - len(
        [n for n in em._PRIORITY_QUERIES if n in q0])
    assert shown > 0  # priority block must leave rotation slots
    cadence = math.ceil(rest / shown)
    # the driver experiences ARBITRARY starting offsets, and when
    # rest % overflow != 0 the excluded block wraps — so prove coverage
    # for every window of `cadence` consecutive rounds across a span
    # where the wrap pattern fully cycles (lcm(rest, cadence) rounds is
    # enough; rest*cadence is a cheap superset of it)
    span = rest * cadence + cadence
    windows = []
    for r in range(span):
        monkeypatch.setattr(em, "_round_index", lambda r=r: r)
        window = list(em.queries())[:em._DRIVER_WINDOW]
        windows.append(window)
    for r0 in range(span - cadence + 1):
        covered = set()
        for w in windows[r0:r0 + cadence]:
            covered.update(w)
        assert covered == set(q0), (r0, sorted(set(q0) - covered))
    # priority names appear in EVERY round's window
    for w in windows:
        assert set(em._PRIORITY_QUERIES) <= set(w)
