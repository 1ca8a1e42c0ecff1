"""Streaming ingest: incremental exactly-once file processing + windowed
rollups with watermark (streaming twins of the batch operators)."""

import time

import pytest
from pyspark.sql import functions as F

from chatvector_ai_spark import datagen as dg
from chatvector_ai_spark.operators.ingest import ingest_chunks
from chatvector_ai_spark.streaming import stream_event_rollup, stream_ingest_chunks
from chatvector_ai_spark.streaming.incremental import stream_kg_edges


def _write_docs(spark, lo, hi, path):
    import pandas as pd

    rows = [dg.doc_row(i) for i in range(lo, hi)]
    spark.createDataFrame(pd.DataFrame(rows), schema=dg.SPANS_SCHEMA_DDL).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_incremental_ingest_processes_each_file_once(spark, tmp_path):
    docs_dir = str(tmp_path / "docs")
    out_dir = str(tmp_path / "chunks")
    ckpt = str(tmp_path / "ckpt")

    _write_docs(spark, 0, 20, docs_dir)
    q = stream_ingest_chunks(spark, docs_dir, out_dir, ckpt)
    q.awaitTermination(120)
    first = spark.read.parquet(out_dir)
    n_first = first.count()
    assert n_first > 0
    assert first.select("doc_id").distinct().count() == 20

    # batch parity: streaming output == batch operator over the same input
    batch = ingest_chunks(spark.read.parquet(docs_dir))
    assert batch.count() == n_first

    # new files arrive; resume from checkpoint processes ONLY the new ones
    _write_docs(spark, 20, 30, docs_dir)
    q2 = stream_ingest_chunks(spark, docs_dir, out_dir, ckpt)
    q2.awaitTermination(120)
    again = spark.read.parquet(out_dir)
    assert again.select("doc_id").distinct().count() == 30
    # no duplicates: per-doc row counts match the batch operator exactly
    merged = again.groupBy("doc_id").count()
    batch2 = ingest_chunks(spark.read.parquet(docs_dir)).groupBy("doc_id").count()
    diff = merged.join(batch2, "doc_id").where(merged["count"] != batch2["count"]).count()
    assert diff == 0


def test_stream_kg_edges_end_to_end_incremental(spark, tmp_path):
    """Full KG chain per micro-batch (ingest → extract → link → edges),
    exactly-once across restarts, batch-parity on edge counts."""
    from chatvector_ai_spark.operators.extract import extract_triples_df, good_triples
    from chatvector_ai_spark.operators.link import link_mentions, mentions_from_triples
    from chatvector_ai_spark.pipeline import edges_from_linked

    docs_dir = str(tmp_path / "docs")
    out_dir = str(tmp_path / "edges")
    ckpt = str(tmp_path / "ckpt_kg")
    aliases = dg.alias_df(spark, 200).cache()

    _write_docs(spark, 0, 15, docs_dir)
    q = stream_kg_edges(spark, docs_dir, out_dir, ckpt, aliases)
    q.awaitTermination(180)
    n_first = spark.read.parquet(out_dir).count()
    assert n_first > 0

    # restart with new files: only the new docs' edges are appended
    _write_docs(spark, 15, 25, docs_dir)
    q2 = stream_kg_edges(spark, docs_dir, out_dir, ckpt, aliases)
    q2.awaitTermination(180)
    edges = spark.read.parquet(out_dir)

    # batch parity: same operators over the full input give the same count
    # (streaming used identity canonicalization → so does the batch twin)
    docs = spark.read.parquet(docs_dir).select("doc_id", "spans")
    chunks = ingest_chunks(docs)
    triples = good_triples(extract_triples_df(chunks, keep_embedding=False))
    linked = link_mentions(mentions_from_triples(triples), aliases)
    cmap0 = spark.createDataFrame([], "entity_id string, canonical_entity string")
    batch_edges = edges_from_linked(linked, cmap0)
    assert edges.count() == batch_edges.count()
    assert edges.select("doc_id").distinct().count() == 25


def test_stream_event_rollup_with_watermark(spark, tmp_path):
    src = str(tmp_path / "events")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).parquet(src)
    rolled = stream_event_rollup(stream, window="1 hour", watermark="2 hours")
    q = (
        rolled.writeStream.format("memory")
        .queryName("rollup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # with availableNow the final watermark still holds back the tail
    # windows; completed windows must match the batch rollup exactly
    got = spark.sql("SELECT * FROM rollup_test").toPandas()
    batch = (
        spark.read.parquet(src)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
        .toPandas()
    )
    assert len(got) > 0
    merged = got.merge(batch, on=["window_start", "event_type"], suffixes=("_s", "_b"))
    assert (merged["n_s"] == merged["n_b"]).all()


def test_stream_dedup_docs_collapses_content_dups(spark, tmp_path):
    """Two deliveries of the same document content (different doc_ids,
    same spans) inside one watermark window → exactly one survivor per
    content hash; distinct contents all pass."""
    from chatvector_ai_spark.datagen import documents_df
    from chatvector_ai_spark.streaming.incremental import stream_dedup_docs

    src = str(tmp_path / "docs_dup")
    base = documents_df(spark, 20).withColumn(
        "ingest_ts", F.lit("2026-01-01 00:00:00").cast("timestamp")
    )
    dup = base.withColumn("doc_id", F.concat(F.lit("copy-"), F.col("doc_id")))
    base.unionByName(dup).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(
        "doc_id string, tenant_id string, "
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
        "ingest_ts timestamp"
    ).parquet(src)
    q = (
        stream_dedup_docs(stream)
        .writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT content_hash, doc_id FROM dedup_test").toPandas()
    assert len(got) == 20  # one survivor per distinct content
    assert got["content_hash"].nunique() == 20


def test_stream_dedup_docs_distinguishes_null_field_positions(spark, tmp_path):
    """Null-tagged serialization: a span with (text='x', media_ref=NULL)
    and one with (text=NULL, media_ref='x') are DIFFERENT content — both
    documents must survive the content-hash dedup (regression: concat_ws
    skips NULLs, collapsing the two onto one hash)."""
    from chatvector_ai_spark.streaming.incremental import stream_dedup_docs

    src = str(tmp_path / "docs_nulls")
    rows = [
        ("d1", "t1", [("text", "x", None, 0)]),
        ("d2", "t1", [("image", None, "x", 0)]),
        ("d3", "t1", [("text", None, None, 0)]),
        ("d4", "t1", [("text", "", None, 0)]),  # empty string ≠ NULL
    ]
    schema = (
        "doc_id string, tenant_id string, "
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    )
    spark.createDataFrame(rows, schema).withColumn(
        "ingest_ts", F.lit("2026-01-01 00:00:00").cast("timestamp")
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(schema + ", ingest_ts timestamp").parquet(src)
    q = (
        stream_dedup_docs(stream)
        .writeStream.format("memory")
        .queryName("dedup_nulls")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT doc_id, content_hash FROM dedup_nulls").toPandas()
    assert len(got) == 4
    assert got["content_hash"].nunique() == 4
