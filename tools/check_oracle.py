"""Driver-mimic correctness harness: run every __spark_entry__ query on
Spark AND its DuckDB oracle at a given sf dir, compare row count, column
names, and order-insensitive value equality. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(9)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from blogparser_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8, app_name="check-oracle")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = E.queries(), E.oracle_sql()
    # a typo'd query name must not silently run nothing and report ALL PASS
    unknown = only - set(qs)
    if unknown:
        print(f"ERROR: unknown queries: {sorted(unknown)}")
        return 2
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: spark error: {ex}")
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows={len(sdf)} (no oracle — rows-only) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {ex}")
            continue
        s, d = normalize(sdf), normalize(ddf)
        status = []
        if len(s) != len(d):
            status.append(f"rowcount {len(s)} vs {len(d)}")
        if list(s.columns) != list(d.columns):
            status.append(f"cols {list(s.columns)} vs {list(d.columns)}")
        if not status:
            try:
                pd.testing.assert_frame_equal(s, d, check_dtype=False, atol=1e-8)
            except AssertionError as ex:
                status.append(f"values: {str(ex).splitlines()[-1][:200]}")
        if status:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(status)} [{time.time()-t0:.1f}s]")
            if len(s) and len(d) and list(s.columns) == list(d.columns):
                neq = ~(s.eq(d).all(axis=1))
                print("  spark:", s[neq].head(3).to_dict("records"))
                print("  duck :", d[neq].head(3).to_dict("records"))
        else:
            print(f"PASS {name}: rows={len(s)} [{time.time()-t0:.1f}s]")

    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL PASS")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
