"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry against its oracle_sql() in DuckDB and
compare row counts + order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from read_parquet('{p}')")
    return con.execute(sql).fetch_df()


def compare(sdf, odf) -> tuple[bool, str]:
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        return False, f"schema mismatch: spark={scols} oracle={ocols}"
    if len(sdf) != len(odf):
        return False, f"row count: spark={len(sdf)} oracle={len(odf)}"
    s = sdf[scols].sort_values(scols).reset_index(drop=True)
    o = odf[scols].sort_values(scols).reset_index(drop=True)
    for c in scols:
        sv, ov = s[c], o[c]
        # The driver hashes exact value reprs: an int column on one side and a
        # float (or HUGEINT->object) column on the other hash-mismatches even
        # when numerically equal. Fail here so it can't hide behind tolerance.
        kinds = {sv.dtype.kind, ov.dtype.kind}
        if kinds == {"i", "f"} or kinds == {"i", "O"} or kinds == {"f", "O"}:
            return False, (
                f"col {c} dtype-class mismatch: spark={sv.dtype} "
                f"oracle={ov.dtype} (driver hash would differ)"
            )
        if sv.dtype.kind == "f" or ov.dtype.kind == "f":
            import numpy as np

            a = sv.astype("float64").fillna(-1e308)
            b = ov.astype("float64").fillna(-1e308)
            if not np.allclose(a, b, rtol=0, atol=1e-9, equal_nan=True):
                bad = (a - b).abs().idxmax()
                return False, f"col {c} differs, e.g. {sv[bad]} vs {ov[bad]}"
        else:
            a = sv.astype(str)
            b = ov.astype(str)
            if not (a == b).all():
                bad = (a != b).idxmax()
                return False, f"col {c} differs, e.g. {a[bad]!r} vs {b[bad]!r}"
    return True, f"{len(sdf)} rows"


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    from gdal_spark.session import get_spark
    import __spark_entry__ as E

    spark = get_spark(master=os.environ.get("GDAL_SPARK_MASTER", "local[8]"))
    qs, osql = E.queries(), E.oracle_sql()
    fails = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            fails += 1
            continue
        if name not in osql:
            print(f"rows  {name}: {len(sdf)} rows (no oracle)")
            continue
        try:
            odf = duck_run(osql[name], sf)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {e}")
            fails += 1
            continue
        ok, msg = compare(sdf, odf)
        print(("ok    " if ok else "FAIL  ") + f"{name}: {msg}")
        fails += 0 if ok else 1
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
