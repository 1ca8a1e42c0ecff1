"""spark-submit entry point for the KG construction pipeline.

    spark-submit --py-files dist/chatvector_ai_spark.zip jobs/run_pipeline.py \
        --n-docs 100000 --warehouse /data/kg_warehouse

Local dev:

    python jobs/run_pipeline.py --n-docs 200 --warehouse /tmp/kg_wh

Rerunning with the same arguments resumes from the last committed snapshot
(pass --no-resume to force a full rebuild).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description="Run the KG construction pipeline")
    ap.add_argument("--n-docs", type=int, default=1000)
    ap.add_argument("--n-entities", type=int, default=5000)
    ap.add_argument("--warehouse", default=os.environ.get("CVS_WAREHOUSE", "/tmp/cvs_warehouse"))
    ap.add_argument("--strategy", default="fixed", choices=["fixed", "paragraph", "semantic"])
    ap.add_argument("--master", default=None, help="e.g. local[8]; default = spark-submit's")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--sf-dir", default=None, help="unused placeholder for driver parity")
    ap.add_argument(
        "--docs-path", default=None,
        help="existing interleaved-documents parquet to ingest (production "
             "shape); omitted = synthesize --n-docs documents",
    )
    ap.add_argument(
        "--files-per-bucket", type=int, default=None,
        help="write-layout file groups per entity-hash bucket for the "
             "nodes/edges commits (default: CVS_FILES_PER_BUCKET config); "
             "raise at scale so write parallelism decouples from the "
             "bucket count",
    )
    ap.add_argument(
        "--append-to", default=None, metavar="INPUT_KEY",
        help="incremental mode: fold --docs-path documents into the "
             "already-built run named by this input_key (chunks/extract "
             "run on the new docs only and commit append deltas; the "
             "graph stages recompute over the chained union)",
    )
    args = ap.parse_args()
    if args.append_to is not None and args.docs_path is None:
        ap.error("--append-to requires --docs-path (the new documents)")

    from chatvector_ai_spark.pipeline import (
        flagship_query,
        incremental_update,
        run_pipeline,
    )
    from chatvector_ai_spark.session import get_spark
    from chatvector_ai_spark.warehouse import Warehouse

    spark = get_spark(master=args.master)
    wh = Warehouse(args.warehouse)
    t0 = time.time()
    if args.append_to is not None:
        run = incremental_update(
            spark, wh, args.append_to, args.docs_path,
            strategy=args.strategy,
            resume=not args.no_resume,
            files_per_bucket=args.files_per_bucket,
        )
    else:
        run = run_pipeline(
            spark, wh, args.n_docs if args.docs_path is None else None,
            docs_path=args.docs_path,
            n_entities=args.n_entities,
            strategy=args.strategy,
            resume=not args.no_resume,
            files_per_bucket=args.files_per_bucket,
        )
    elapsed = time.time() - t0
    top = flagship_query(spark, wh, run.input_key)
    top.show(10, truncate=False)
    n_docs = (
        args.n_docs if args.docs_path is None
        else spark.read.parquet(args.docs_path).count()
    )
    print(json.dumps({
        "run_id": run.run_id,
        "input_key": run.input_key,
        "stages_run": run.stages_run,
        "stages_skipped": run.stages_skipped,
        "elapsed_sec": round(elapsed, 2),
        "docs_per_sec": round(n_docs / elapsed, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
