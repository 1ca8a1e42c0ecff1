"""Metadata-only view snapshots (warehouse.commit_view).

The Iceberg metadata-commit shape: a derived status table (good triples /
quarantine) commits as a filtered view of an already-written hive-partitioned
snapshot — no Spark job, no data movement — with its lineage row counts
derived from the parent's per-partition footer counts.
"""

import os

import pytest
from pyspark.sql import functions as F

from chatvector_ai_spark.warehouse import Warehouse


@pytest.fixture()
def wh(tmp_path):
    return Warehouse(str(tmp_path / "wh"))


@pytest.fixture()
def parent(spark, wh):
    df = spark.createDataFrame(
        [(i, "x" * (i % 3), 1 if i % 5 else 0) for i in range(100)],
        "id int, payload string, ok int",
    )
    wh.commit(df, "raw", run_id="r1", stage="raw", input_key="k", partition_by=["ok"])
    return wh.latest_entry("raw", "k")


def test_view_counts_come_from_parent_partitions(spark, wh, parent):
    snap = wh.commit_view(
        "good", parent_table="raw", run_id="r1", stage="good", input_key="k",
        partition_filter={"ok": 1}, select=["id", "payload"],
    )
    assert snap.startswith("view-")
    entry = wh.latest_entry("good", "k")
    assert entry["row_count"] == 80  # i % 5 != 0
    assert all(p["partition"].startswith("ok=1/") for p in entry["partitions"])
    # no data dir of its own was created
    assert not os.path.isdir(os.path.join(wh.root, "good", snap))


def test_view_read_applies_filter_and_projection(spark, wh, parent):
    wh.commit_view(
        "bad", parent_table="raw", run_id="r1", stage="bad", input_key="k",
        partition_filter={"ok": 0}, select=["id", "'flagged' AS status"],
    )
    df = wh.read(spark, "bad", "k")
    assert df.columns == ["id", "status"]
    rows = df.collect()
    assert len(rows) == 20
    assert {r["status"] for r in rows} == {"flagged"}
    assert {r["id"] % 5 for r in rows} == {0}
    # the scan is partition-pruned: with the ok=1 directory removed from
    # disk, executing the ok=0 view still succeeds because pruned file
    # scans never open the other side
    import shutil

    shutil.rmtree(os.path.join(wh.root, "raw", parent["snapshot"], "ok=1"))
    assert wh.read(spark, "bad", "k").count() == 20


def test_view_is_done_tracks_parent_liveness(spark, wh, parent):
    wh.commit_view(
        "good", parent_table="raw", run_id="r1", stage="good", input_key="k",
        partition_filter={"ok": 1}, select=None,
    )
    assert wh.is_done("good", "k")
    # a view over a vanished parent snapshot is not live
    import shutil

    shutil.rmtree(os.path.join(wh.root, "raw", parent["snapshot"]))
    assert not wh.is_done("good", "k")


def test_time_travel_read_by_snapshot_id(spark, wh):
    """Superseded snapshots stay readable by id (Iceberg time travel): a
    delete or recompute commits a NEW snapshot; auditing the pre-change
    state is a read at the old snapshot id from the snapshot log."""
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    v2 = spark.createDataFrame([(1, "a")], "id int, v string")
    s1 = wh.commit(v1, "t", run_id="r1", stage="t", input_key="k")
    s2 = wh.commit(v2, "t", run_id="r2", stage="t", input_key="k")
    assert [e["snapshot"] for e in wh.snapshots("t", "k")] == [s1, s2]
    assert wh.read(spark, "t", "k").count() == 1  # latest wins
    assert wh.read(spark, "t", snapshot=s1).count() == 2  # time travel
    assert wh.read(spark, "t", snapshot=s2).count() == 1


def test_view_empty_partition_filter_side(spark, wh):
    df = spark.createDataFrame([(i, 1) for i in range(10)], "id int, ok int")
    wh.commit(df, "raw2", run_id="r1", stage="raw2", input_key="k", partition_by=["ok"])
    wh.commit_view(
        "empty", parent_table="raw2", run_id="r1", stage="e", input_key="k",
        partition_filter={"ok": 0}, select=["id"],
    )
    entry = wh.latest_entry("empty", "k")
    assert entry["row_count"] == 0
    assert wh.read(spark, "empty", "k").count() == 0
