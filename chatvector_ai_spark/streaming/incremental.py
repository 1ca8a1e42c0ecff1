"""Structured Streaming front-end: incremental ingest + windowed rollups.

The reference's ingestion queue (queue_asyncio.py:44-205 / queue_redis.py)
delivers documents continuously; the batch pipeline resumes from snapshots.
This module is the streaming twin: a file-source ``readStream`` over the
interleaved-documents directory feeds the SAME ingest transformation
(mapInPandas is stateless, so the batch operator runs unchanged on a
streaming DataFrame), and the checkpoint directory provides the
exactly-once/resume contract the warehouse manifest provides in batch —
new files are processed once, reprocessing after restart picks up where
the checkpoint left off (the K1/K5 semantics of SURVEY §2.10).

``stream_event_rollup`` is the streaming twin of the suite's
``ev_hourly_rollup``: event-time windows + a watermark bounding state for
late data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from chatvector_ai_spark.config import CHUNK_OVERLAP, CHUNK_SIZE
from chatvector_ai_spark.operators.ingest import ingest_chunks
from chatvector_ai_spark.sources.tables import DOCUMENTS_SCHEMA


def stream_ingest_chunks(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    strategy: str = "fixed",
    size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
    embed_dim: int | None = None,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Incrementally ingest document files appearing under *docs_dir*.

    ``available_now=True`` drains everything currently present then stops
    (test/batch-catchup mode); ``False`` keeps running on new files.
    ``max_files_per_trigger`` bounds micro-batch size (backpressure — the
    queue-capacity analog of the reference's bounded queue, K1).
    """
    reader = spark.readStream.schema(DOCUMENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(docs_dir)
    chunks = ingest_chunks(docs, strategy=strategy, size=size, overlap=overlap, embed_dim=embed_dim)
    writer = (
        chunks.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_kg_edges(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    alias_dict: DataFrame,
    canonical_map: DataFrame | None = None,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Incremental KG construction: each micro-batch of new document files
    runs the FULL batch operator chain — ingest → extract → link →
    edge pivot — and lands canonical edges idempotently per micro-batch:
    each batch overwrites its own ``batch_id=<id>`` partition, so a batch
    replayed after a crash between the parquet write and the checkpoint
    commit rewrites the same partition instead of appending duplicates
    (foreachBatch alone is only at-least-once).

    This is the streaming twin of the batch pipeline's stages 1-6, built
    via ``foreachBatch`` so the unchanged batch operators run per
    micro-batch. ``canonical_map`` is the latest committed entity→canonical
    snapshot (``Warehouse.read(spark, "canonical_map")``): streaming edges
    resolve against the last canonicalization, and the periodic batch job
    refreshes the map — the standard lambda split for an operator
    (connected components) that is inherently global. With no map yet,
    edges carry raw linked entity ids (identity canonicalization).
    """
    from chatvector_ai_spark.operators.extract import extract_triples_df, good_triples
    from chatvector_ai_spark.operators.link import link_mentions, mentions_from_triples
    from chatvector_ai_spark.pipeline import edges_from_linked

    cmap = canonical_map
    if cmap is None:
        cmap = spark.createDataFrame([], "entity_id string, canonical_entity string")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        chunks = ingest_chunks(batch_df)
        triples = good_triples(extract_triples_df(chunks, keep_embedding=False))
        linked = link_mentions(mentions_from_triples(triples), alias_dict)
        # idempotent sink: replaying batch N overwrites batch N's partition
        edges_from_linked(linked, cmap).write.mode("overwrite").parquet(
            f"{out_dir}/batch_id={batch_id}"
        )

    reader = spark.readStream.schema(DOCUMENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(docs_dir)
    writer = (
        docs.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_event_rollup(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Windowed per-type event aggregates with late-data watermarking.

    ``events`` is a streaming DataFrame with (ts timestamp, event_type
    string, user_id long, value double). State is bounded by the
    watermark: windows older than max(event time) − watermark finalize and
    evict (the streaming analog of the batch hourly rollup).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long")).alias("value_cents"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type", "n", "value_cents", "approx_users",
        )
    )


def stream_dedup(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` keeps a key's fingerprint only until
    the watermark passes it, so state is O(keys-per-watermark-window), not
    O(all keys ever) — the property that makes streaming dedup survive an
    unbounded 100 TB feed (a plain ``dropDuplicates`` on a stream grows
    state forever). Duplicates arriving later than the watermark are
    consciously re-admitted: at that distance the batch dedup layer
    (dd_exact / dd_minhash suite operators) owns them — the standard
    lambda split this module already uses for canonicalization.
    """
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)


def stream_dedup_docs(
    docs: DataFrame,
    ts_col: str = "ingest_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Content-hash streaming dedup of interleaved documents: the key is
    an md5 over the ordered span texts + media refs (kind-tagged), i.e.
    exact-duplicate *content* collapses even under different doc_ids."""
    # each field is null-tagged BEFORE serialization: concat_ws silently
    # skips NULLs, so (text='x', media_ref=NULL) and (text=NULL,
    # media_ref='x') would otherwise collide on content_hash and the
    # dedup would silently drop a distinct document
    tag = lambda c: F.when(c.isNull(), F.lit("\x00")).otherwise(  # noqa: E731
        F.concat(F.lit("\x01"), c)
    )
    keyed = docs.withColumn(
        "content_hash",
        F.md5(
            F.concat_ws(
                "\x1f",
                F.transform(
                    "spans",
                    lambda s: F.concat_ws(
                        "\x1e",
                        tag(s["kind"]),
                        tag(s["text"]),
                        tag(s["media_ref"]),
                    ),
                ),
            )
        ),
    )
    return stream_dedup(keyed, ["content_hash"], ts_col=ts_col, watermark=watermark)
