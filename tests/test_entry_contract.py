"""Driver-contract regression guard: round 1 was zeroed by an unwired
__spark_entry__.py — this test fails loudly if that ever regresses."""

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    assert entrymod.entry(spark).count() > 0


def test_registry_consistency(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 60
    # every oracle belongs to a registered query
    assert set(oracles) <= set(qs), set(oracles) - set(qs)
    # the vast majority of the surface is oracle-checked
    assert len(oracles) / len(qs) > 0.8


def test_query_callables_have_docstrings():
    for name, fn in entrymod.queries().items():
        assert fn.__doc__, f"{name} lacks a docstring"
