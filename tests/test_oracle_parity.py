"""Run every declared query against its DuckDB oracle at sf0.001 — a
local replica of the driver's correctness gate (see BASELINE.md)."""

import pytest

import __spark_entry__ as entrymod
from tests.oracle_harness import compare, duckdb_connection


def _names():
    qs = entrymod.queries()
    return sorted(qs.keys())


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, sf_dir, con, name):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    df = qs[name](spark, sf_dir)
    if name not in oracles:
        # rows-only contract for non-SQL-expressible ops
        assert df.count() >= 0
        return
    problems = compare(df, con, oracles[name])
    assert not problems, f"{name}: " + "; ".join(problems)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["item", "frequency"]
