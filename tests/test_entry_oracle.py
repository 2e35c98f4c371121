"""Replicates the driver's correctness gate locally: every queries() entry
runs on Spark and (when an oracle exists) on DuckDB at sf0.001; row count,
column names, and an order-insensitive value hash must match."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("CX_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _value_bag(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(
        "|".join(_norm(row[i]) for i in order) for row in rows
    )


ORACLE_QUERIES = sorted(entry_mod.oracle_sql().keys())
ALL_QUERIES = sorted(entry_mod.queries().keys())


def test_every_oracle_has_query():
    assert set(ORACLE_QUERIES) <= set(ALL_QUERIES)


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_runs(spark, name):
    q = entry_mod.queries()[name]
    df = q(spark, SF_DIR)
    assert df.count() >= 0  # runs without error, stable schema
    assert len(df.schema.names) >= 1


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    df = q(spark, SF_DIR)
    spark_cols = df.schema.names
    spark_rows = [tuple(r) for r in df.collect()]

    res = duck.execute(entry_mod.oracle_sql()[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count differs"
    sb = _value_bag(spark_rows, spark_cols)
    db = _value_bag(duck_rows, duck_cols)
    if sb != db:
        diff = [(a, b) for a, b in zip(sb, db) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.schema.names == ["url", "title", "main_text", "threshold", "status"]
    ok = [r for r in rows if r.status == "ok"]
    assert len(ok) == len(rows)
