"""Driver-style correctness harness: run each __spark_entry__ query on
Spark AND its oracle SQL on DuckDB over the same parquet, compare
row-count + schema + order-insensitive values.

Faithful to the driver's CORRECTNESS gate (learned from round 1):
- both sides travel the **pandas/Arrow path** (`.toPandas()` / `.df()`):
  DuckDB HUGEINT sums arrive as float64 here and MUST mismatch an int64,
  exactly like the driver's value hash does (`fetchall()` hid this);
- canonicalization is a pandas `sort_values` over every column sorted by
  name — list-typed cells raise `unhashable type: 'list'` exactly like
  the driver's `_canon` (queries must stringify array outputs);
- values compare exactly (dtype-sensitive), floats bit-for-bit.

Usage: python tools/compare_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as E  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Mirror the driver's _canon: columns sorted by name, rows lexsorted.

    Raises TypeError on list-typed cells — that is the point."""
    cols = sorted(df.columns)
    out = df[cols]
    if len(out):
        out = out.sort_values(by=cols, kind="mergesort")
    return out.reset_index(drop=True)


def cells_equal(a, b) -> bool:
    if a is None or b is None or a is pd.NaT or b is pd.NaT:
        return (a is None or a is pd.NaT) and (b is None or b is pd.NaT)
    fa, fb = isinstance(a, (float, np.floating)), isinstance(b, (float, np.floating))
    if fa != fb:  # int64 vs float64 = driver hash mismatch
        return False
    if fa and fb:
        if np.isnan(a) and np.isnan(b):
            return True
        return float(a) == float(b)
    if isinstance(a, (pd.Timestamp, np.datetime64)) or isinstance(b, (pd.Timestamp, np.datetime64)):
        return pd.Timestamp(a) == pd.Timestamp(b)
    return a == b


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from image_search_indexing_spark.session import get_spark

    spark = get_spark(master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, sqls = E.queries(), E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            spdf = canon(fn(spark, sf_dir).toPandas())
        except Exception as ex:
            print(f"{name:32s} SPARK/CANON ERROR: {type(ex).__name__}: {ex}")
            failures += 1
            continue
        if name not in sqls:
            print(f"{name:32s} rows-only: {len(spdf)} rows (no oracle SQL)")
            continue
        try:
            dkdf = canon(con.execute(sqls[name]).df())
        except Exception as ex:
            print(f"{name:32s} ORACLE SQL/CANON ERROR: {type(ex).__name__}: {ex}")
            failures += 1
            continue
        ok_schema = list(spdf.columns) == list(dkdf.columns)
        ok_rows = len(spdf) == len(dkdf)
        ok_vals = False
        first_diff = None
        if ok_schema and ok_rows:
            ok_vals = True
            sv, dv = spdf.to_numpy(dtype=object), dkdf.to_numpy(dtype=object)
            for i in range(len(sv)):
                for j in range(sv.shape[1]):
                    if not cells_equal(sv[i, j], dv[i, j]):
                        ok_vals = False
                        first_diff = (i, spdf.columns[j], sv[i, j], dv[i, j])
                        break
                if not ok_vals:
                    break
        if ok_schema and ok_rows and ok_vals:
            print(f"{name:32s} OK ({len(spdf)} rows)")
        else:
            failures += 1
            print(f"{name:32s} FAIL schema={ok_schema} rows={len(spdf)}/{len(dkdf)}")
            if not ok_schema:
                print("  spark cols:", list(spdf.columns), "\n  duck cols: ", list(dkdf.columns))
            elif not ok_rows:
                pass
            elif first_diff:
                i, c, x, y = first_diff
                print(f"  first diff row {i} col {c}:\n   spark: {x!r} ({type(x).__name__})"
                      f"\n   duck:  {y!r} ({type(y).__name__})")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
