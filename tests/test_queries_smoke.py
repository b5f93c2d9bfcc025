"""Smoke: every registered query runs at sf0.001 and matches its DuckDB
oracle (fast subset of the driver's sf0.01 gate). Full-scale parity is
exercised by tools/check_oracle.py."""

import os

import duckdb
import pytest

import __spark_entry__ as E
from tools.check_oracle import TABLES, compare

SF = "/root/testdata/sf0.001"


def _duck(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from read_parquet('{p}')")
    return con.execute(sql).fetch_df()


QUERIES = E.queries()
ORACLES = E.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle(spark, name):
    sdf = QUERIES[name](spark, SF).toPandas()
    if name not in ORACLES:
        assert len(sdf) >= 0  # rows-only check
        return
    odf = _duck(ORACLES[name])
    ok, msg = compare(sdf, odf)
    assert ok, f"{name}: {msg}"


def test_entry_runs(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert "url" in df.columns and "polygon_id" in df.columns
