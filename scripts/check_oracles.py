"""Self-check: run every queries() entry on Spark AND its oracle_sql() on
DuckDB at sf0.01; compare row count, column names, and order-insensitive
values (exact for ints/strings, 1e-9 for floats). Mimics the driver's
CORRECTNESS gate so mismatches surface before the round ends.

Usage: python scripts/check_oracles.py [sf_dir] [only_query_prefix]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> str:
    if list(spark_df.columns) != list(oracle_df.columns):
        return f"SCHEMA MISMATCH: spark={list(spark_df.columns)} duck={list(oracle_df.columns)}"
    if len(spark_df) != len(oracle_df):
        return f"ROWCOUNT MISMATCH: spark={len(spark_df)} duck={len(oracle_df)}"
    a = spark_df.sort_values(list(spark_df.columns)).reset_index(drop=True)
    b = oracle_df.sort_values(list(oracle_df.columns)).reset_index(drop=True)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            aa = av.astype(float).to_numpy()
            bb = bv.astype(float).to_numpy()
            ok = np.isclose(aa, bb, atol=1e-9, rtol=0, equal_nan=True)
            if not ok.all():
                i = int(np.nonzero(~ok)[0][0])
                return f"VALUE MISMATCH col={c} row{i}: spark={aa[i]!r} duck={bb[i]!r}"
        else:
            if not (av.astype(str).to_numpy() == bv.astype(str).to_numpy()).all():
                bad = (av.astype(str).to_numpy() != bv.astype(str).to_numpy())
                i = int(np.nonzero(bad)[0][0])
                return f"VALUE MISMATCH col={c} row{i}: spark={av.iloc[i]!r} duck={bv.iloc[i]!r}"
    return "OK"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    prefix = sys.argv[2] if len(sys.argv) > 2 else ""

    import __spark_entry__ as entrymod
    from raster_functions_spark.session import get_spark

    spark = get_spark("check-oracles", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if prefix and not name.startswith(prefix):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"{name:24s} SPARK ERROR: {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(sdf)} rows  ({time.time()-t0:.1f}s)")
            if len(sdf) == 0:
                print(f"{name:24s}   WARNING: zero rows")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"{name:24s} DUCKDB ERROR: {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        verdict = compare(name, sdf, odf)
        status = "✓" if verdict == "OK" else "✗"
        print(f"{name:24s} {status} {len(sdf)} rows ({time.time()-t0:.1f}s)"
              + ("" if verdict == "OK" else f"  {verdict}"))
        if verdict != "OK":
            failures += 1
    spark.stop()
    print(f"\n{'PASS' if failures == 0 else 'FAIL'}: {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
