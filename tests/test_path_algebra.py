"""SPARQL 1.1 path-algebra evaluator (operators/graph.eval_path)."""

import pytest
from pyspark.sql import functions as F

from chatvector_ai_spark.operators.graph import eval_path, property_path


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, rel string, dst string")


@pytest.fixture(scope="module")
def g(spark):
    #  a -p-> b -q-> c -q-> d ;  a -r-> d ;  e isolated endpoint via x -s-> e
    return _edges(spark, [
        ("a", "p", "b"),
        ("b", "q", "c"),
        ("c", "q", "d"),
        ("a", "r", "d"),
        ("x", "s", "e"),
    ])


def _rows(df):
    return {(r["a"], r["c"], r["hops"]) for r in df.collect()}


def test_rel_and_inverse(spark, g):
    assert _rows(eval_path(g, ("rel", "p"))) == {("a", "b", 1)}
    assert _rows(eval_path(g, ("inv", ("rel", "p")))) == {("b", "a", 1)}


def test_sequence_sums_min_hops(spark, g):
    # p/q = a->c in 2; p/q/q = a->d in 3
    assert _rows(eval_path(g, ("seq", ("rel", "p"), ("rel", "q")))) == {("a", "c", 2)}
    assert _rows(
        eval_path(g, ("seq", ("rel", "p"), ("rel", "q"), ("rel", "q")))
    ) == {("a", "d", 3)}


def test_alternation_takes_min(spark, g):
    # (p/q/q)|r both reach a->d; alternation keeps the 1-hop min
    expr = ("alt", ("seq", ("rel", "p"), ("rel", "q"), ("rel", "q")), ("rel", "r"))
    assert _rows(eval_path(g, expr)) == {("a", "d", 1)}


def test_optional_binds_zero_length_to_every_node(spark, g):
    got = _rows(eval_path(g, ("opt", ("rel", "p"))))
    nodes = {"a", "b", "c", "d", "x", "e"}
    assert {(n, n, 0) for n in nodes} <= got
    assert ("a", "b", 1) in got
    assert len(got) == len(nodes) + 1


def test_plus_and_star_bounded_min_hop(spark, g):
    plus = _rows(eval_path(g, ("plus", ("rel", "q")), max_hops=3))
    assert plus == {("b", "c", 1), ("c", "d", 1), ("b", "d", 2)}
    # bound binds: max_hops=1 loses the 2-hop pair
    assert _rows(eval_path(g, ("plus", ("rel", "q")), max_hops=1)) == {
        ("b", "c", 1), ("c", "d", 1),
    }
    star = _rows(eval_path(g, ("star", ("rel", "q")), max_hops=3))
    assert {("b", "d", 2), ("a", "a", 0), ("e", "e", 0)} <= star


def test_matches_property_path_primitive(spark, g):
    """eval_path(("seq", p, q+)) agrees with the fixed-shape primitive —
    eval_path counts the prefix hop, property_path counts plus-steps."""
    via_algebra = _rows(
        eval_path(g, ("seq", ("rel", "p"), ("plus", ("rel", "q"))), max_hops=3)
    )
    via_primitive = {
        (r["a"], r["c"], r["hops"] + 1)
        for r in property_path(g, "p", "q", max_hops=3).collect()
    }
    assert via_algebra == via_primitive


def test_cycle_plus_reaches_self(spark):
    cyc = _edges(spark, [("a", "q", "b"), ("b", "q", "a")])
    got = _rows(eval_path(cyc, ("plus", ("rel", "q")), max_hops=2))
    assert ("a", "a", 2) in got and ("b", "b", 2) in got


def test_malformed_expressions_raise(spark, g):
    with pytest.raises(ValueError, match="unknown path operator"):
        eval_path(g, ("nope", ("rel", "p")))
    with pytest.raises(ValueError, match="malformed"):
        eval_path(g, ["rel", "p"])  # list, not tuple/str
    with pytest.raises(ValueError, match="max_hops"):
        eval_path(g, ("rel", "p"), max_hops=0)
    # a plain string is SPARQL path syntax now, not malformed
    assert _rows(eval_path(g, "p")) == {("a", "b", 1)}


def test_plus_relaxation_improves_across_repetitions(spark):
    """A pair reached in 1 repetition with hops 3 must be improved by a
    2-repetition path with hops 2 — the case a frontier-BFS plus with an
    anti-join would lock in wrong."""
    g = _edges(spark, [
        ("a", "s", "m1"), ("m1", "s", "m2"), ("m2", "s", "c"),  # 3-hop s path
        ("a", "r", "x"), ("x", "r", "c"),                        # two 1-hop r reps
    ])
    expr = ("plus", ("alt", ("seq", ("rel", "s"), ("rel", "s"), ("rel", "s")),
                     ("rel", "r")))
    got = _rows(eval_path(g, expr, max_hops=3))
    assert ("a", "c", 2) in got
    assert not any(a == "a" and c == "c" and h != 2 for a, c, h in got)


def test_plus_keeps_one_repetition_self_pairs(spark):
    """base(x,x) from ONE repetition is a valid plus result — a 2-cycle
    seq'd with itself yields only self-pairs, which must survive."""
    cyc = _edges(spark, [("a", "q", "b"), ("b", "q", "a")])
    got = _rows(eval_path(cyc, ("plus", ("seq", ("rel", "q"), ("rel", "q"))), max_hops=2))
    assert got == {("a", "a", 2), ("b", "b", 2)}


def _ref_eval(edge_list, expr, max_hops):
    """Pure-python reference of the documented eval_path semantics."""
    nodes = sorted({s for s, _, _ in edge_list} | {d for _, _, d in edge_list})
    INF = 1 << 60

    def merge_min(d, k, h):
        if h < d.get(k, INF):
            d[k] = h

    def compose(left, right):
        out = {}
        for (a, x), h1 in left.items():
            for (y, c), h2 in right.items():
                if x == y:
                    merge_min(out, (a, c), h1 + h2)
        return out

    def ev(e):
        op = e[0]
        if op == "rel":
            out = {}
            for s, r, d in edge_list:
                if r == e[1]:
                    merge_min(out, (s, d), 1)
            return out
        if op == "inv":
            return {(c, a): h for (a, c), h in ev(e[1]).items()}
        if op == "seq":
            cur = ev(e[1])
            for sub in e[2:]:
                cur = compose(cur, ev(sub))
            return cur
        if op == "alt":
            out = {}
            for sub in e[1:]:
                for k, h in ev(sub).items():
                    merge_min(out, k, h)
            return out
        if op == "opt":
            out = dict(ev(e[1]))
            for n in nodes:
                out[(n, n)] = 0
            return out
        if op == "star":
            return ev(("opt", ("plus", e[1])))
        if op == "plus":
            base = ev(e[1])
            out = dict(base)
            for _ in range(1, max_hops):
                new = dict(out)
                for k, h in compose(out, base).items():
                    merge_min(new, k, h)
                if new == out:
                    break
                out = new
            return out
        raise AssertionError(op)

    return ev(expr)


def _rand_expr(rnd, depth):
    if depth == 0 or rnd.random() < 0.3:
        leaf = ("rel", rnd.choice(["p", "q"]))
        return ("inv", leaf) if rnd.random() < 0.3 else leaf
    op = rnd.choice(["seq", "alt", "opt", "plus", "star"])
    if op in ("seq", "alt"):
        return (op, _rand_expr(rnd, depth - 1), _rand_expr(rnd, depth - 1))
    return (op, _rand_expr(rnd, depth - 1))


@pytest.mark.parametrize("seed", range(6))
def test_eval_path_matches_python_reference_on_random_cases(spark, seed):
    import random

    rnd = random.Random(1000 + seed)
    n = rnd.randint(3, 6)
    names = [f"n{i}" for i in range(n)]
    edge_list = sorted({
        (rnd.choice(names), rnd.choice(["p", "q"]), rnd.choice(names))
        for _ in range(rnd.randint(3, 10))
    })
    expr = _rand_expr(rnd, 3)
    max_hops = rnd.randint(1, 3)
    g = _edges(spark, edge_list)
    got = _rows(eval_path(g, expr, max_hops=max_hops))
    want = {(a, c, h) for (a, c), h in _ref_eval(edge_list, expr, max_hops).items()}
    assert got == want, (seed, expr, max_hops, edge_list)


def test_parse_path_precedence_and_grouping():
    from chatvector_ai_spark.operators.graph import parse_path

    assert parse_path("p") == ("rel", "p")
    # '|' binds loosest, '/' next, quantifier tightest
    assert parse_path("a|b/c") == ("alt", ("rel", "a"), ("seq", ("rel", "b"), ("rel", "c")))
    assert parse_path("(a|b)/c") == ("seq", ("alt", ("rel", "a"), ("rel", "b")), ("rel", "c"))
    assert parse_path("^a+") == ("inv", ("plus", ("rel", "a")))  # SPARQL: ^(a+)
    assert parse_path("(^a)+") == ("plus", ("inv", ("rel", "a")))
    assert parse_path("a/b+|c?") == (
        "alt",
        ("seq", ("rel", "a"), ("plus", ("rel", "b"))),
        ("opt", ("rel", "c")),
    )
    assert parse_path("a*?") == ("opt", ("star", ("rel", "a")))
    import pytest as _pytest

    for bad in ("", "a|", "(a", "a)", "+a", "a//b", "a b", "%", "a|!", "a/$b"):
        with _pytest.raises(ValueError, match="path syntax"):
            parse_path(bad)


def test_eval_path_accepts_sparql_syntax(spark, g):
    tuple_out = _rows(eval_path(g, ("seq", ("rel", "p"), ("plus", ("rel", "q")))))
    str_out = _rows(eval_path(g, "p/q+"))
    assert str_out == tuple_out
    assert _rows(eval_path(g, "^p")) == {("b", "a", 1)}
