"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry at a given sf_dir, runs the
matching oracle_sql() in DuckDB over the same parquet views, and
compares row count + column names + order-insensitive value hash.
Usage: python tools/verify_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd

import __spark_entry__ as entrymod

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "f":
            as_int = df[c].dropna()
            if len(as_int) and (as_int == as_int.round()).all() and as_int.abs().max() < 2**53:
                df[c] = df[c].astype("int64") if not df[c].isna().any() else df[c]
    df = df.sort_values(by=list(df.columns), kind="stable").reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    h = hashlib.sha256()
    for c in df.columns:
        col = df[c]
        if col.dtype.kind == "f":
            col = col.round(6)
        h.update(pd.util.hash_pandas_object(col, index=False).values.tobytes())
    return h.hexdigest()[:16]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    from sketchlib.spark import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        try:
            con.sql(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")
        except Exception as e:
            # partial test dirs stay usable: only oracles that actually
            # reference the missing table will fail, at query time
            print(f"! view {t} unavailable: {type(e).__name__}: {e}")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            results[name] = f"SPARK ERROR: {type(e).__name__}: {e}"
            continue
        if name not in oracles:
            results[name] = f"rows-only: {len(sdf)} rows"
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE ERROR: {e}"
            continue
        s, o = normalize(sdf), normalize(odf)
        if list(s.columns) != list(o.columns):
            results[name] = f"SCHEMA MISMATCH: spark={list(s.columns)} oracle={list(o.columns)}"
        elif len(s) != len(o):
            results[name] = f"ROWCOUNT MISMATCH: spark={len(s)} oracle={len(o)}"
        elif value_hash(s) != value_hash(o):
            diff = None
            for c in s.columns:
                a, b = s[c], o[c]
                if a.dtype.kind == "f":
                    neq = (a.round(6) != b.round(6)).sum()
                else:
                    try:
                        neq = (a.astype(str) != b.astype(str)).sum()
                    except Exception:
                        neq = "?"
                if neq:
                    diff = f"{c}: {neq} differing"
                    break
            results[name] = f"VALUE MISMATCH ({diff})"
        else:
            results[name] = f"OK ({len(s)} rows)"
    if not results:
        known = ", ".join(sorted(only - set(qs))) or "(none)"
        print(f"0 queries matched the filter; unknown names: {known}")
        return
    width = max(len(k) for k in results)
    fails = 0
    for k, v in results.items():
        flag = " " if v.startswith(("OK", "rows-only")) else "X"
        if flag == "X":
            fails += 1
        print(f"{flag} {k:<{width}}  {v}")
    print(f"\n{len(results) - fails}/{len(results)} pass")
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
