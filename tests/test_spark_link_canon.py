"""Entity linking + connected-components canonicalization tests."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from chatvector_ai_spark import datagen as dg
from chatvector_ai_spark.functions.embeddings import with_embedding
from chatvector_ai_spark.operators.canonicalize import (
    canonical_map,
    canonicalize_triples,
    connected_components,
    linking_edges,
)
from chatvector_ai_spark.operators.extract import extract_triples_df, good_triples
from chatvector_ai_spark.operators.ingest import ingest_chunks
from chatvector_ai_spark.operators.link import link_mentions, mentions_from_triples

N_DOCS = 80
N_ENTITIES = 300


@pytest.fixture(scope="module")
def linked(spark):
    docs = dg.documents_df(spark, N_DOCS, n_entities=N_ENTITIES)
    chunks = with_embedding(ingest_chunks(docs, strategy="fixed", size=300, overlap=60))
    triples = good_triples(extract_triples_df(chunks)).cache()
    alias = dg.alias_df(spark, N_ENTITIES).cache()
    mentions = mentions_from_triples(triples)
    return triples, alias, link_mentions(mentions, alias).cache()


def test_known_surfaces_link_to_their_entity(linked):
    _, _, lm = linked
    pdf = lm.toPandas()
    assert len(pdf) > 0
    linked_rows = pdf[pdf["linked"]]
    # every mention whose surface IS a canonical name must link
    canon_by_entity = {dg.entity_id(i): dg.canonical_name(i) for i in range(N_ENTITIES)}
    surface_to_entity = {v.lower(): k for k, v in canon_by_entity.items()}
    for _, row in pdf.iterrows():
        expect = surface_to_entity.get(row["surface"].lower())
        if expect is not None:
            assert row["linked"], f"unlinked known surface {row['surface']}"
    # ambiguous aliases (every 97th entity's canonical also aliases i+1)
    # still resolve deterministically to exactly one entity
    dupes = linked_rows.groupby(["chunk_id", "role", "m_start"]).size()
    assert (dupes == 1).all()


def test_unlinked_surfaces_get_surrogates(linked):
    _, _, lm = linked
    pdf = lm.toPandas()
    un = pdf[~pdf["linked"]]
    if len(un):
        assert un["entity_id"].str.startswith("S:").all()
        assert (un["canonical"] == un["surface"]).all()


def test_connected_components_match_union_find(spark, linked):
    _, alias, lm = linked
    edges = linking_edges(lm, alias).cache()
    comp = connected_components(edges).toPandas()  # small-core driver path
    comp_dist = connected_components(edges, small_core_edges=0).toPandas()  # shuffle loop
    edge_rows = edges.toPandas()

    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra

    for _, e in edge_rows.iterrows():
        union(e["src"], e["dst"])

    expected = {n: find(n) for n in parent}
    got = dict(zip(comp["node"], comp["component"]))
    assert got == expected
    got_dist = dict(zip(comp_dist["node"], comp_dist["component"]))
    assert got_dist == expected


def test_canonicalize_triples_end_to_end(spark, linked):
    triples, alias, lm = linked
    # attach linked entities to triples via the mention pivot
    key = ["doc_id", "chunk_id", "chunk_index"]
    subj_m = lm.where(F.col("role") == "subj").select(
        *key, F.col("m_start").alias("subj_start"), F.col("entity_id").alias("subj_entity")
    )
    obj_m = lm.where(F.col("role") == "obj").select(
        *key, F.col("m_start").alias("obj_start"), F.col("entity_id").alias("obj_entity")
    )
    tl = triples.join(subj_m, key + ["subj_start"]).join(obj_m, key + ["obj_start"])
    out = canonicalize_triples(tl, lm, alias).toPandas()
    assert len(out) == triples.count()

    cmap = canonical_map(lm, alias).toPandas()
    reps = set(cmap["canonical_entity"])
    # every canonical entity is a component representative or surrogate
    for col in ("subj_entity", "obj_entity"):
        vals = set(out[col])
        for v in vals:
            assert v.startswith("S:") or v in reps or v.startswith("E")
    # representatives are minimal: no mapped entity id sorts below its rep
    m = dict(zip(cmap["entity_id"], cmap["canonical_entity"]))
    assert all(rep <= e for e, rep in m.items())


def test_salted_cc_matches_unsalted(spark, linked):
    """The explicit salted-replication path (non-AQE clusters) must produce
    the same components as the default AQE-skew-join path."""
    _, alias, lm = linked
    edges = linking_edges(lm, alias)
    base = {(r["node"], r["component"]) for r in connected_components(edges).collect()}
    salted = {
        (r["node"], r["component"])
        for r in connected_components(edges, salt_buckets=4).collect()
    }
    assert base == salted


def test_cc_pendant_pruning_edge_cases(spark):
    """Chains, mutual pendant pairs, stars: pruned CC must keep exact
    min-id components (pendants can own the component minimum)."""
    edges = spark.createDataFrame(
        [("B", "A"), ("B", "C"),          # chain: min is pendant A
         ("D", "E"),                        # isolated pair
         ("F", "G"), ("F", "H"), ("F", "I"),  # star, hub F
         ("Z", "Y")],                       # pair where min is dst
        "src string, dst string",
    )
    # small_core_edges=0 forces the distributed loop so the pendant
    # machinery itself is exercised; the default exercises the driver path
    for pruned in (True, False):
        for small_core in (0, None):
            kw = {} if small_core is None else {"small_core_edges": small_core}
            got = {
                (r["node"], r["component"])
                for r in connected_components(edges, prune_pendants=pruned, **kw).collect()
            }
            assert got == {
                ("A", "A"), ("B", "A"), ("C", "A"),
                ("D", "D"), ("E", "D"),
                ("F", "F"), ("G", "F"), ("H", "F"), ("I", "F"),
                ("Y", "Y"), ("Z", "Y"),
            }, (pruned, small_core)


def test_cc_self_loops_single_row_per_node(spark):
    """Self-edges must not duplicate output rows (a self-loop-only node was
    both its own pendant and anchor before the fix) and a node whose only
    edge is a self-loop is its own singleton component."""
    edges = spark.createDataFrame(
        [("X", "X"),                 # self-loop-only node
         ("A", "A"), ("A", "B"),     # self-loop on a connected node
         ("C", "D")],
        "src string, dst string",
    )
    for pruned in (True, False):
        for small_core in (0, None):
            kw = {} if small_core is None else {"small_core_edges": small_core}
            rows = connected_components(edges, prune_pendants=pruned, **kw).collect()
            got = [(r["node"], r["component"]) for r in rows]
            assert sorted(got) == [
                ("A", "A"), ("B", "A"), ("C", "C"), ("D", "C"), ("X", "X"),
            ], (pruned, small_core)
