"""Local mimic of the driver's Spark-vs-DuckDB correctness gate.

Runs every suite query on Spark (sf dir from argv, default sf0.01), runs its
DuckDB oracle over the same parquet, and compares:
row count, sorted column names, and an order-insensitive value multiset
(floats rounded to 6 decimals). Exit 1 on any mismatch.

Usage: python tools/check_oracle.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

from chatvector_ai_spark.session import get_spark
from chatvector_ai_spark.suite import TABLES, all_oracles, all_queries


def canon(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if v is None:
            return (1, "")  # sortable against any (0, x) non-null
        if isinstance(v, bool):
            return (0, v)
        if isinstance(v, float):
            if math.isnan(v):
                return (0, "NaN")
            return (0, round(v, 6))
        if isinstance(v, list):
            return (0, tuple(norm(x) for x in v))
        return (0, v)

    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    filters = sys.argv[2:]
    spark = get_spark(master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries, oracles = all_queries(), all_oracles()
    failed = []
    for name, fn in sorted(queries.items()):
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            if not srows:
                print(f"WARN {name}: zero rows")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = [d[0] for d in rel.description]
            drows = rel.fetchall()
        except Exception as exc:
            print(f"FAIL {name}: duckdb error: {exc}")
            failed.append(name)
            continue
        ok = True
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: cols spark={sorted(scols)} duck={sorted(dcols)}")
            ok = False
        elif len(srows) != len(drows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(drows)}")
            ok = False
        else:
            cs, cd = canon(srows, scols), canon(drows, dcols)
            if cs != cd:
                diffs = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
                print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
                ok = False
        if ok:
            print(f"ok   {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")
        else:
            failed.append(name)
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
