"""Cascading document delete (reference delete_document atomicity,
/root/reference/backend/db/sqlalchemy_service.py:397-429: doc + chunks
removed in one transaction). Spark analog: copy-on-write superseding
snapshots per doc-keyed table under one delete_group, idempotent on replay."""

import pytest
from pyspark.sql import functions as F

from chatvector_ai_spark.operators.delete import DOC_TABLES, delete_documents
from chatvector_ai_spark.pipeline import flagship_query, run_pipeline
from chatvector_ai_spark.warehouse import Warehouse

N_DOCS = 40
N_ENTITIES = 200


@pytest.fixture(scope="module")
def committed(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("wh_delete"))
    wh = Warehouse(root)
    run = run_pipeline(spark, wh, N_DOCS, n_entities=N_ENTITIES)
    return wh, run


def test_cascading_delete_counts_and_lineage(spark, committed):
    wh, run = committed
    key = run.input_key
    victims = ["doc-00000003", "doc-00000007"]

    per_doc = {}
    before = {}
    for t in DOC_TABLES:
        df = wh.read(spark, t, key)
        before[t] = df.count()
        per_doc[t] = df.where(F.col("doc_id").isin(victims)).count()
    lineage_before = len(wh.lineage())

    deleted = delete_documents(spark, wh, victims, key)

    for t in DOC_TABLES:
        after_df = wh.read(spark, t, key)
        assert after_df.count() == before[t] - per_doc[t], t
        assert deleted[t] == per_doc[t], t
        # no trace of the victims anywhere
        assert after_df.where(F.col("doc_id").isin(victims)).count() == 0, t

    # nodes rebuilt: mention totals match post-delete mention table
    nodes = wh.read(spark, "nodes", key)
    linked = wh.read(spark, "linked_mentions", key)
    assert nodes.agg(F.sum("n_mentions")).first()[0] == linked.count()

    # exactly one new lineage entry per cascaded table (+ nodes)
    assert len(wh.lineage()) == lineage_before + len(DOC_TABLES) + 1

    # flagship query still runs over the post-delete graph
    top = flagship_query(spark, wh, key).toPandas()
    assert 0 < len(top) <= 10


def test_delete_is_idempotent_on_replay(spark, committed):
    wh, run = committed
    victims = ["doc-00000003", "doc-00000007"]
    lineage_before = len(wh.lineage())
    deleted = delete_documents(spark, wh, victims, run.input_key)
    # same delete_group → every table skipped, zero rows removed, no lineage
    assert all(v == 0 for v in deleted.values())
    assert len(wh.lineage()) == lineage_before
