"""Graph query operators over pipeline-materialized nodes/edges."""

import pytest
from pyspark.sql import functions as F

from chatvector_ai_spark.operators.graph import (
    cooccurring_entities,
    degrees,
    ego_edges,
    khop,
    relation_counts,
)
from chatvector_ai_spark.pipeline import run_pipeline
from chatvector_ai_spark.warehouse import Warehouse


@pytest.fixture(scope="module")
def graph_wh(spark, tmp_path_factory):
    wh = Warehouse(str(tmp_path_factory.mktemp("graph_wh")))
    run = run_pipeline(spark, wh, 60, n_entities=300)
    return wh, run


@pytest.fixture(scope="module")
def graph(spark, graph_wh):
    wh, run = graph_wh
    edges = wh.read(spark, "edges", run.input_key).cache()
    nodes = wh.read(spark, "nodes", run.input_key).cache()
    return nodes, edges


def test_degrees_consistent_with_edges(graph):
    _, edges = graph
    deg = degrees(edges).toPandas()
    n_edges = edges.count()
    assert deg["out_degree"].sum() == n_edges
    assert deg["in_degree"].sum() == n_edges
    assert (deg["degree"] == deg["out_degree"] + deg["in_degree"]).all()


def test_ego_edges_match_filter(graph):
    _, edges = graph
    top = degrees(edges).orderBy(F.desc("degree")).first()["entity"]
    ego = ego_edges(edges, top).toPandas()
    assert len(ego) > 0
    assert ((ego["src"] == top) | (ego["dst"] == top)).all()
    expected = edges.where((F.col("src") == top) | (F.col("dst") == top)).dropDuplicates().count()
    assert len(ego) == expected


def test_ego_uses_manifest_bucket_count_not_config(spark, graph_wh, graph):
    """The manifest records n_buckets at write time; ego pruning with the
    RECORDED value must equal the unbucketed truth even if the session's
    config has since changed (a mismatched count would silently drop all
    outgoing edges — ADVICE round 1)."""
    wh, run = graph_wh
    _, edges = graph
    from chatvector_ai_spark.config import N_BUCKETS

    recorded = wh.table_n_buckets("edges", run.input_key)
    assert recorded == N_BUCKETS  # written under the current config
    top = degrees(edges).orderBy(F.desc("degree")).first()["entity"]
    truth = {
        tuple(r) for r in
        ego_edges(edges, top, n_buckets=None).select("src", "dst", "chunk_id").collect()
    }
    with_recorded = {
        tuple(r) for r in
        ego_edges(edges, top, n_buckets=recorded).select("src", "dst", "chunk_id").collect()
    }
    assert with_recorded == truth


def test_khop_grows_monotonically(graph):
    _, edges = graph
    seed = edges.first()["src"]
    h1 = khop(edges, [seed], k=1).count()
    h2 = khop(edges, [seed], k=2).count()
    assert 1 <= h1 <= h2
    hops = khop(edges, [seed], k=2).toPandas()
    assert set(hops["hop"]) <= {0, 1, 2}
    assert (hops[hops["hop"] == 0]["entity"] == seed).all()


def test_relation_counts_cover_all_edges(graph):
    _, edges = graph
    rc = relation_counts(edges).toPandas()
    assert rc["n_edges"].sum() == edges.count()
    assert set(rc["rel"]) <= {
        "acquired", "founded_by", "founded", "partnered_with", "invested_in",
        "located_in", "works_at", "born_in", "joined", "leads", "owns",
        "launched", "merged_with", "collaborates_with", "supplies",
    }


def test_cooccurrence_symmetric_pairs(graph):
    _, edges = graph
    pairs = cooccurring_entities(edges, min_shared_docs=1).toPandas()
    assert len(pairs) > 0
    assert (pairs["entity_a"] < pairs["entity_b"]).all()
