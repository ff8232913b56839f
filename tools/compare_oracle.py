"""Driver-style correctness harness: run each __spark_entry__ query on
Spark AND its oracle SQL on DuckDB over the same parquet, compare
row-count + schema + order-insensitive values. Mirrors what the driver's
CORRECTNESS gate does, so failures surface before the round runs.

Usage: python tools/compare_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from datetime import date, datetime

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as E  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return datetime(v.year, v.month, v.day).isoformat()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if hasattr(v, "item"):  # numpy scalar
        return norm(v.item())
    return v


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


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
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in sqls:
            print(f"{name:32s} rows-only: {len(srows)} rows (no oracle SQL)")
            continue
        try:
            res = con.execute(sqls[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:
            print(f"{name:32s} ORACLE SQL ERROR: {ex}")
            failures += 1
            continue
        ok_schema = sorted(scols) == sorted(dcols)
        a, b = rowset(scols, [tuple(r) for r in srows]), rowset(dcols, drows)
        ok_rows = len(a) == len(b)
        ok_vals = a == b
        status = "OK" if (ok_schema and ok_rows and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
            print(f"{name:32s} FAIL schema={ok_schema} rows={len(a)}/{len(b)} vals={ok_vals}")
            if not ok_schema:
                print("  spark cols:", sorted(scols), " duck cols:", sorted(dcols))
            if ok_schema:
                for x, y in zip(a, b):
                    if x != y:
                        print("  first diff:\n   spark:", x, "\n   duck: ", y)
                        break
                if len(a) != len(b):
                    sa, sb = set(a), set(b)
                    print("  only-spark:", list(sa - sb)[:2])
                    print("  only-duck:", list(sb - sa)[:2])
        else:
            print(f"{name:32s} OK ({len(a)} rows)")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
