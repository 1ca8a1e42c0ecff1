"""spark-submit entry point for the standing KG updater.

    spark-submit --py-files dist/chatvector_ai_spark.zip jobs/run_stream.py \
        --warehouse /data/kg_wh --base-key "src=.../dim=64" \
        --docs-dir /data/incoming --checkpoint /data/kg_ckpt

Each micro-batch of new interleaved-document parquet files folds into the
built graph (pipeline.incremental_update via streaming/kgstream.py) with
exactly-once epoch keys. ``--available-now`` drains the directory and
exits (backfill mode); otherwise the query runs until interrupted.
``--compact-every N`` rewrites the chunks/triples_raw delta chains into
single snapshots after every N folds so read-side chain length stays
bounded.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description="Run the standing KG updater")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--base-key", required=True, help="input_key of the built run to extend")
    ap.add_argument("--docs-dir", required=True, help="directory the document feed lands in")
    ap.add_argument("--checkpoint", required=True, help="streaming checkpoint location")
    ap.add_argument("--max-files-per-trigger", type=int, default=16)
    ap.add_argument("--available-now", action="store_true",
                    help="drain the directory and exit (backfill mode)")
    ap.add_argument("--compact-every", type=int, default=0, metavar="N",
                    help="compact the Arrow-table delta chains after every N folds (0 = never)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from chatvector_ai_spark.session import get_spark
    from chatvector_ai_spark.streaming.kgstream import (
        latest_epoch_key,
        stream_kg_updates,
    )
    from chatvector_ai_spark.warehouse import Warehouse

    spark = get_spark(master=args.master)
    wh = Warehouse(args.warehouse)
    q = stream_kg_updates(
        spark, wh, args.docs_dir, args.base_key, args.checkpoint,
        max_files_per_trigger=args.max_files_per_trigger,
        available_now=args.available_now,
    )
    if args.available_now:
        q.awaitTermination()
        head = latest_epoch_key(wh, args.base_key)
        compacted = []
        if args.compact_every and head != args.base_key:
            for table in ("chunks", "triples_raw"):
                snap = wh.compact(spark, table, head)
                if snap:
                    compacted.append(f"{table}@{snap}")
        print(json.dumps({"chain_head": head, "compacted": compacted}))
        return 0
    try:
        q.awaitTermination()
    except KeyboardInterrupt:
        q.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
