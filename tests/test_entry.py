"""Driver-contract smoke tests for __spark_entry__.py."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_queries_and_oracles_consistent():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) > 0
    assert set(oracles) <= set(qs)
    # Every query either has an oracle or is an explicitly rows-only op.
    rows_only = set(qs) - set(oracles)
    from datafusion_dist_spark import registry

    for name in rows_only:
        assert registry.all_specs()[name].oracle is None


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert rows is not None
    assert len(df.schema.fields) > 0
