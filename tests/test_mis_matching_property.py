"""Property tests: the deterministic Luby MIS and local-dominant-edge
maximal matching keep their defining invariants on arbitrary small graphs
— including self-loops, parallel edges, chains, and hub stars that
Hypothesis likes to build. Invariants, not memberships: the hash-priority
selection is deterministic but input-shaped, so the *sets* vary while
independence / matching / maximality / coverage must always hold."""

from hypothesis import given, settings
from hypothesis import strategies as st

NODES = [f"N{i:02d}" for i in range(10)]

edge_lists = st.lists(
    st.tuples(st.sampled_from(NODES), st.sampled_from(NODES)),
    min_size=1,
    max_size=20,
)


def _adj(edges):
    a = set()
    for s, d in edges:
        if s != d:
            a.add((s, d))
            a.add((d, s))
    return a


@given(edge_lists)
@settings(max_examples=8, deadline=None)
def test_mis_independence_coverage_and_partition(spark, edges):
    from chatvector_ai_spark.operators.graph import maximal_independent_set

    df = spark.createDataFrame(
        [(s, "r", d) for s, d in edges], "src string, rel string, dst string"
    )
    res = {r.entity: r.status for r in maximal_independent_set(df).collect()}
    adj = _adj(edges)
    universe = {n for pair in adj for n in pair}
    # exactly the non-isolated nodes are classified, each exactly once
    assert set(res) == universe
    mis = {v for v, s in res.items() if s == "mis"}
    # independence
    assert not any((a, b) in adj for a in mis for b in mis if a != b)
    for v, s in res.items():
        if s == "covered":
            assert any((v, m) in adj for m in mis)
        elif s == "undecided":
            # an undecided node can never be adjacent to a member (it
            # would have been covered); its neighbors are covered or
            # undecided, and with the round budget exhausted all-covered
            # neighborhoods are legitimate
            assert not any((v, m) in adj for m in mis)


@given(edge_lists)
@settings(max_examples=8, deadline=None)
def test_matching_is_node_disjoint_and_maximal(spark, edges):
    from chatvector_ai_spark.operators.graph import maximal_matching

    df = spark.createDataFrame(
        [(s, "r", d) for s, d in edges], "src string, rel string, dst string"
    )
    got = [(r.a, r.b) for r in maximal_matching(df, rounds=6).collect()]
    nodes = [x for ab in got for x in ab]
    assert len(nodes) == len(set(nodes))  # node-disjoint pairs
    cand = {tuple(sorted((s, d))) for s, d in edges if s != d}
    assert all((a, b) in cand or (b, a) in cand for a, b in got)
    matched = set(nodes)
    # maximality holds whenever the candidate set was fully decided within
    # the round budget: every candidate edge touches a matched endpoint
    # (4 rounds decide these tiny graphs w.h.p.; if not, pairs are still
    # node-disjoint valid edges, checked above)
    undecided = [e for e in cand if e[0] not in matched and e[1] not in matched]
    for a, b in undecided:
        # an unmatched candidate edge can only survive if the graph was not
        # fully decided — which for these sizes means never; assert none
        raise AssertionError(f"edge {(a, b)} untouched by matching {got}")
