"""Driver-contract tests: every ``queries()`` entry runs; every oracle
pair matches DuckDB on row count, column names, and (order-insensitive)
values — a local replica of the driver's CORRECTNESS gate."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    if v is None:
        return "\x00null"  # sortable sentinel (CUBE/ROLLUP emit NULL keys)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _rows(cols, data):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in idx) for r in data)


ORACLE = entrymod.oracle_sql()
QUERIES = entrymod.queries()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_oracle_keys_subset_of_queries():
    assert set(ORACLE) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0  # materializes without error


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_match(spark, sf_dir, duck, name):
    sdf = QUERIES[name](spark, sf_dir)
    scols = sdf.columns
    sdata = [tuple(r) for r in sdf.collect()]

    res = duck.execute(ORACLE[name])
    dcols = [d[0] for d in res.description]
    ddata = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(sdata) == len(ddata), f"{name}: row count differs"
    assert _rows(scols, sdata) == _rows(dcols, ddata), f"{name}: values differ"
