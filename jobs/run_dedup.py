"""spark-submit entry point for end-to-end corpus deduplication.

Reads a documents parquet directory (doc_id, source, text, ...), applies
exact + MinHash-LSH near-dup dedup (operators/dedup.dedup_corpus), writes
the kept rows as parquet, and prints ONE JSON report line:

    spark-submit --py-files dist/chatvector_ai_spark.zip jobs/run_dedup.py \
        --input /data/documents --output /data/documents_deduped

Local dev:

    python jobs/run_dedup.py --input /root/testdata/sf0.01/documents.parquet \
        --output /tmp/docs_dedup --master "local[8]"
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description="Dedup a documents corpus")
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--output", required=True, help="kept-rows parquet dir")
    ap.add_argument("--threshold", type=float, default=0.8,
                    help="verified token-Jaccard threshold (>= 0.8)")
    ap.add_argument("--master", default=None,
                    help="e.g. local[8]; default = spark-submit's")
    args = ap.parse_args()

    from chatvector_ai_spark.operators.dedup import dedup_corpus
    from chatvector_ai_spark.session import get_spark

    spark = get_spark(app_name="cvs-dedup", master=args.master)
    t0 = time.time()
    docs = spark.read.parquet(args.input)
    kept, report = dedup_corpus(spark, docs, threshold=args.threshold)
    kept.write.mode("overwrite").parquet(args.output)
    report["elapsed_sec"] = round(time.time() - t0, 2)
    report["output"] = args.output
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
