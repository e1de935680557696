"""Driver-contract smoke + oracle equivalence at sf0.001 (fast tier).

Mirrors exactly what the per-round verify does: run queries() against
oracle_sql() through DuckDB on the same parquet views, compare sorted values.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _canon(pdf):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return (
        pdf.sort_values(list(pdf.columns), kind="stable")
        .reset_index(drop=True)
        .astype(str)
    )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"doc_id", "kind", "text", "media_ref", "offset"}


def test_queries_have_oracles_or_are_documented():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    # every non-oracle query is one of the known non-SQL-expressible ops;
    # since round 2 the extraction family is oracle-visible via
    # fixture_oracle.py literal VALUES tables — only the stubbed media
    # decode remains rows-only
    rows_only = set(qs) - set(os_)
    assert rows_only == {"media_decode_features"}


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql()))
def test_query_matches_oracle(spark, con, name):
    got = _canon(entrymod.queries()[name](spark, SF).toPandas())
    want = _canon(con.sql(entrymod.oracle_sql()[name]).df())
    assert got.columns.tolist() == want.columns.tolist(), name
    assert got.equals(want), f"{name}: value mismatch"


@pytest.mark.parametrize("name", ["media_decode_features"])
def test_rows_only_queries_nonempty(spark, name):
    assert entrymod.queries()[name](spark, SF).count() > 0
