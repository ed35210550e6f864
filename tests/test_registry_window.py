"""Driver-window invariants: the first 50 registry entries are what the
round driver will check — pinning and rotation must stay deterministic."""

from sanef_election_dashboard_etl_spark.queries import (
    REGISTRY,
    _PINNED,
    _WINDOW_SIZE,
    _driver_coverage,
)


def test_pinned_entries_lead_the_registry():
    names = list(REGISTRY)
    assert names[:len(_PINNED)] == _PINNED


def test_window_is_full_and_rotation_prefers_uncovered():
    names = list(REGISTRY)[:_WINDOW_SIZE]
    assert len(names) == _WINDOW_SIZE
    covered = _driver_coverage()
    rotated = names[len(_PINNED):]
    # rotation targets the least-covered entries: while zero-coverage
    # entries outnumber the slots, every rotated-in entry is one of them
    zero_pool = [n for n in REGISTRY if n not in _PINNED
                 and covered.get(n, 0) == 0]
    if len(zero_pool) >= len(rotated):
        assert all(covered.get(n, 0) == 0 for n in rotated)


def test_rotation_is_deterministic_per_round():
    # same inputs -> same window (the driver and any re-import must agree)
    import importlib

    import sanef_election_dashboard_etl_spark.queries as q

    first = list(q.REGISTRY)[:_WINDOW_SIZE]
    importlib.reload(q)
    assert list(q.REGISTRY)[:_WINDOW_SIZE] == first
