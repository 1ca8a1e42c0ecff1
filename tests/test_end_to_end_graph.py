"""End-to-end semantic check: closed-form seeded facts → canonical edges.

Beyond extraction parity (test_spark_ingest), this pins the LINK +
CANONICALIZE semantics: every seeded fact must appear in the materialized
edge table with src/dst equal to the canonical representative its entities
map to under a Python union-find over the alias graph (the same invariant
the distributed connected-components must satisfy at any scale).
"""

import pytest

from chatvector_ai_spark import datagen as dg
from chatvector_ai_spark.pipeline import run_pipeline
from chatvector_ai_spark.warehouse import Warehouse

N_DOCS = 50
N_ENTITIES = 250


def _expected_rep() -> dict[str, str]:
    """entity_id → component representative via union-find over the alias
    dict's shared-alias links plus surface links (surfaces are bipartite
    pass-throughs: entities sharing an alias surface are connected)."""
    parent: dict[str, str] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra

    by_alias: dict[str, list[str]] = {}
    for row in dg.alias_rows(N_ENTITIES):
        by_alias.setdefault(row["alias"], []).append(row["entity_id"])
        find(row["entity_id"])
    for ents in by_alias.values():
        for other in ents[1:]:
            union(ents[0], other)
    return {e: find(e) for e in parent}


@pytest.fixture(scope="module")
def edges_pdf(spark, tmp_path_factory):
    wh = Warehouse(str(tmp_path_factory.mktemp("e2e_wh")))
    run = run_pipeline(spark, wh, N_DOCS, n_entities=N_ENTITIES)
    return wh.read(spark, "edges", run.input_key).toPandas()


def test_every_seeded_fact_becomes_a_canonical_edge(edges_pdf):
    rep = _expected_rep()
    got = set(zip(edges_pdf["doc_id"], edges_pdf["src"], edges_pdf["rel"], edges_pdf["dst"]))

    missing = []
    total = 0
    for d in range(N_DOCS):
        doc_id = dg.doc_id_of(d)
        for subj_surface, pred, obj_surface in dg.expected_triples(d, n_entities=N_ENTITIES):
            total += 1
            # a canonical-name surface links to SOME entity carrying that
            # alias; all candidates share one component representative iff
            # connected — compute the set of acceptable (src, dst) pairs
            subj_reps = {
                rep[r["entity_id"]]
                for r in dg.alias_rows(N_ENTITIES)
                if r["alias"] == subj_surface.lower()
            }
            obj_reps = {
                rep[r["entity_id"]]
                for r in dg.alias_rows(N_ENTITIES)
                if r["alias"] == obj_surface.lower()
            }
            if not any(
                (doc_id, s, pred, o) in got for s in subj_reps for o in obj_reps
            ):
                missing.append((doc_id, subj_surface, pred, obj_surface))
    recall = 1 - len(missing) / total
    assert recall >= 0.95, f"{len(missing)}/{total} seeded facts missing, e.g. {missing[:3]}"


def test_edge_entities_are_component_representatives(edges_pdf):
    rep = _expected_rep()
    reps = set(rep.values())
    for col in ("src", "dst"):
        for v in edges_pdf[col]:
            # real entities must be representatives; surrogates keep S: ids
            if v.startswith("E"):
                assert v in reps, v
