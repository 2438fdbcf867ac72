"""Replicates the driver's correctness gate: every queries() entry vs its
oracle_sql() twin in DuckDB at sf0.01 — row count, schema (column names),
and order-insensitive values."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb(sf_mid):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_mid}/{t}.parquet'")
    return con


def _norm(rows, cols):
    """Order-insensitive, column-name-sorted normal form."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(str(r[i]) for i in idx) for r in rows)


ORACLED = sorted(set(entrymod.queries()) & set(entrymod.oracle_sql()))
ROWS_ONLY = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, sf_mid, ddb, name):
    sdf = entrymod.queries()[name](spark, sf_mid)
    srows = sdf.collect()
    scols = sdf.columns
    res = ddb.sql(entrymod.oracle_sql()[name])
    drows = res.fetchall()
    dcols = [d[0] for d in res.description]
    assert sorted(scols) == sorted(dcols), f"{name}: schema mismatch"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} != {len(drows)}"
    assert _norm(srows, scols) == _norm(drows, dcols), f"{name}: values diverge"


def test_every_query_has_an_oracle():
    """Round-2 invariant: no gate is rows-only any more — every entry in
    queries() has a DuckDB oracle twin (CORRECTNESS gets a full hash check
    for all of them)."""
    assert ROWS_ONLY == []


def test_entry_smoke(spark):
    out = entrymod.entry(spark)
    assert len(out.collect()) > 0
