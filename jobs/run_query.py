"""spark-submit entry point for the analytics suite.

Run any registered suite query (SQL, dedup/ANN/text, or KG analytics) by
name against a testdata scale-factor directory:

    spark-submit --py-files dist/chatvector_ai_spark.zip jobs/run_query.py \
        --query kg_pagerank --sf-dir /data/sf0.1

Local dev:

    python jobs/run_query.py --query tx_contamination --sf-dir /root/testdata/sf0.01
    python jobs/run_query.py --list            # enumerate all query names
    python jobs/run_query.py --query kg_anf --check   # diff vs DuckDB twin

``--check`` runs the query's DuckDB oracle twin over the same parquet and
compares row count, sorted column names, and the order-insensitive value
multiset (floats rounded to 6 decimals) — the same gate the per-round
driver applies.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description="Run one analytics-suite query")
    ap.add_argument("--query", help="query name from suite.all_queries()")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--master", default=None, help="e.g. local[8]; default = spark-submit's")
    ap.add_argument("--limit", type=int, default=20, help="rows to show (0 = none)")
    ap.add_argument("--list", action="store_true", help="list query names and exit")
    ap.add_argument("--check", action="store_true", help="also run the DuckDB twin and compare")
    args = ap.parse_args()

    from chatvector_ai_spark.suite import all_oracles, all_queries

    queries = all_queries()
    if args.list:
        oracles = all_oracles()
        for name in queries:
            print(f"{name}\t{'twin' if name in oracles else 'rows-only'}")
        return 0
    if not args.query:
        ap.error("--query is required (or --list)")
    if args.query not in queries:
        ap.error(f"unknown query {args.query!r}; use --list")

    from chatvector_ai_spark.session import get_spark

    spark = get_spark(app_name=f"cvs-query-{args.query}", master=args.master)
    t0 = time.time()
    df = queries[args.query](spark, args.sf_dir)
    rows = df.collect()
    elapsed = time.time() - t0
    if args.limit:
        df.show(args.limit, truncate=False)
    result = {
        "query": args.query,
        "sf_dir": args.sf_dir,
        "rows": len(rows),
        "elapsed_sec": round(elapsed, 2),
    }
    if args.check:
        oracle = all_oracles().get(args.query)
        if oracle is None:
            result["check"] = "rows-only (no SQL twin)"
        else:
            import duckdb

            from chatvector_ai_spark.suite import TABLES

            con = duckdb.connect()
            for t in TABLES:
                con.sql(
                    f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
                )
            cur = con.sql(oracle)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
            sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "tools"))
            from check_oracle import canon  # the driver-mimic comparator

            ok = (
                len(rows) == len(orows)
                and sorted(df.columns) == sorted(ocols)
                and canon([tuple(r) for r in rows], list(df.columns))
                == canon(orows, ocols)
            )
            result["check"] = "match" if ok else "MISMATCH"
    print(json.dumps(result))
    return 0 if result.get("check") != "MISMATCH" else 1


if __name__ == "__main__":
    sys.exit(main())
