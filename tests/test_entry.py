"""Driver-contract smoke: entry() runs, queries()/oracle_sql() are consistent."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert df.columns == ["id", "string", "score"]
    assert len(rows) >= 0


def test_every_oracle_has_a_query():
    qs = entrymod.queries()
    for name in entrymod.oracle_sql():
        assert name in qs


def test_registry_oracle_coverage_invariant():
    """The registry is exactly 50 entries (the driver records only the
    first 50) and — since the r9 rotation retired uuid3_content_ids (no
    possible DuckDB twin; exact unit test in test_ids.py) — every entry is
    oracle-backed. A change that silently drops an oracle or grows the
    registry past the cap fails here, not in the driver run."""
    qs, orc = entrymod.queries(), entrymod.oracle_sql()
    assert len(qs) == 50
    assert set(qs) - set(orc) == set()


def test_all_queries_runnable_sf0001(spark):
    for name, fn in entrymod.queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.count() >= 0, name
