"""Driver-contract surface consistency checks."""

from __future__ import annotations

import inspect


def test_queries_and_oracles_consistent():
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    # every oracle key must have a query; extra queries are rows-only checks
    missing = set(oracles) - set(qs)
    assert not missing, f"oracles without queries: {missing}"
    # every query callable takes (spark, sf_dir)
    for name, fn in qs.items():
        params = list(inspect.signature(fn).parameters)
        assert len(params) == 2, (name, params)
    # entry() exists and takes one arg
    assert len(inspect.signature(e.entry).parameters) == 1
    # sanity floor: the contract keeps growing, never silently shrinks
    assert len(qs) >= 46, len(qs)
    assert len(oracles) >= 37, len(oracles)
