"""Continuously-updating KG: Structured Streaming → incremental folds.

``stream_kg_updates`` turns the batch ``pipeline.incremental_update`` into
a standing consumer: a file-source ``readStream`` over the interleaved-
documents directory feeds ``foreachBatch``, and every micro-batch of new
documents folds into the built graph as an append delta (Arrow stages run
on the batch only; link/canonicalize/materialize recompute over the
chained union — see pipeline.incremental_update for the cost shape).

Exactly-once across restarts comes from BOTH layers agreeing:

- the streaming checkpoint guarantees each input file lands in exactly
  one micro-batch, with a batch id that is stable under replay;
- each fold commits under the deterministic key
  ``{base}#epoch={batch_id}`` with ``resume=True``, so a replayed batch
  (crash between the warehouse commits and the checkpoint write) SKIPS
  the stages it already committed instead of duplicating snapshots —
  the same idempotent-replay contract the batch resume path pins.

The base of each fold is the highest committed epoch (scanned from the
chunks manifest at fold time, so a restart re-derives the chain head
without driver state). The reference analog is the ingestion queue
(queue_asyncio.py:44-205): documents arrive continuously and each is
processed exactly once into the store; here the "queue" is the file
source and the "store" is the snapshot-chained warehouse.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from chatvector_ai_spark.sources.tables import DOCUMENTS_SCHEMA
from chatvector_ai_spark.warehouse import Warehouse

_EPOCH_RE = re.compile(r"#epoch=(\d+)$")


def latest_epoch_key(
    warehouse: Warehouse, base_input_key: str, below: int | None = None
) -> str:
    """The chain head: ``{base}#epoch=N`` with the highest committed N
    (from the chunks manifest), or the base key if no fold has landed.
    ``below`` bounds the scan to epochs < that id — a REPLAYED batch must
    chain onto its predecessor, never onto its own partial commits."""
    best_n, best_key = -1, base_input_key
    for entry in warehouse.snapshots("chunks"):
        key = entry["input_key"]
        if not key.startswith(base_input_key + "#epoch="):
            continue
        m = _EPOCH_RE.search(key)
        if m and int(m.group(1)) > best_n and (below is None or int(m.group(1)) < below):
            best_n, best_key = int(m.group(1)), key
    return best_key


def stream_kg_updates(
    spark: SparkSession,
    warehouse: Warehouse,
    docs_dir: str,
    base_input_key: str,
    checkpoint_dir: str,
    *,
    max_files_per_trigger: int | None = None,
    available_now: bool = False,
    files_per_bucket: int | None = None,
) -> StreamingQuery:
    """Start the standing KG updater over *docs_dir*; returns the query.

    ``available_now=True`` drains the directory and stops (the test /
    backfill mode); otherwise the query runs until stopped, folding each
    new parquet file batch as it arrives (micro-batch size bounded by
    ``max_files_per_trigger`` — the K1 bounded-queue analog)."""
    from pyspark.sql import types as T

    from chatvector_ai_spark.pipeline import incremental_update

    # the BASELINE input_hint columns plus the optional tenant_id the
    # synthesizer carries (absent in a feed → read as null, same as batch)
    schema = T.StructType(
        list(DOCUMENTS_SCHEMA.fields) + [T.StructField("tenant_id", T.StringType(), True)]
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(docs_dir)

    def fold(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        base = latest_epoch_key(warehouse, base_input_key, below=batch_id)
        incremental_update(
            spark,
            warehouse,
            base,
            new_docs=batch_df,
            new_input_key=f"{base_input_key}#epoch={batch_id}",
            resume=True,  # replayed batches skip their committed stages
            run_id=f"stream-{batch_id}",
            files_per_bucket=files_per_bucket,
        )

    writer = stream.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
