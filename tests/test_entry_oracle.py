"""Self-check of the __spark_entry__ contract: every queries() entry
runs; every oracle_sql() twin produces the same row count and
order-insensitive values in DuckDB (mimics the driver's comparison)."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 6)
                if math.isnan(v):
                    v = "nan"
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.columns) > 0


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_runs_and_matches_oracle(spark, sf_dir, ddb, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, sf_dir)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns

    oracle = entry_mod.oracle_sql().get(name)
    if oracle is None:
        assert len(spark_rows) >= 0  # rows-only check
        return
    res = ddb.execute(oracle)
    ddb_cols = [d[0] for d in res.description]
    ddb_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(ddb_cols), f"{name}: column mismatch"
    assert len(spark_rows) == len(ddb_rows), f"{name}: row count mismatch"
    a = _normalize([[r[c] for c in spark_cols] for r in spark_rows], spark_cols)
    b = _normalize(ddb_rows, ddb_cols)
    assert a == b, f"{name}: value mismatch, e.g. {a[:2]} vs {b[:2]}"
