"""Query-transformation operators (Q1-Q5): fan-out shapes, ranks,
fallbacks, dispatch."""

import json

import pytest

from chatvector_ai_spark.operators.querytransform import (
    expand,
    resolve_with_history,
    rewrite,
    stepback,
    transform_queries,
)


@pytest.fixture(scope="module")
def questions(spark):
    return spark.createDataFrame(
        [("q1", "  What is   the fastest join strategy?  ", None),
         ("q2", "???", None),
         ("q3", "And what about sort", "We discussed hash joins")],
        "qid string, question string, last_history string",
    )


def test_rewrite_normalizes_and_falls_back(questions):
    out = {r["qid"]: r["transformed"] for r in rewrite(questions).collect()}
    assert out["q1"] == "What is the fastest join strategy"
    assert out["q2"] == "???"  # empty rewrite falls back to the original


def test_expand_caps_variants_and_ranks(questions):
    rows = expand(questions).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append((r["variant_rank"], r["variant"]))
    for qid, vs in by_q.items():
        ranks = sorted(v[0] for v in vs)
        assert ranks == list(range(1, len(vs) + 1))
        assert len(vs) <= 3
    assert sorted(by_q["q1"])[0][1] == "What is the fastest join strategy?"


def test_stepback_adds_broader_variant(questions):
    rows = [r for r in stepback(questions).collect() if r["qid"] == "q1"]
    assert len(rows) == 2
    assert rows[1]["variant"] == "what is the"


def test_history_resolution(questions):
    out = {r["qid"]: r["transformed"] for r in resolve_with_history(questions).collect()}
    assert out["q3"] == "We discussed hash joins | And what about sort"
    assert out["q1"] == "What is the fastest join strategy?"


def test_dispatch_and_trace(questions):
    for mode in ("passthrough", "rewrite", "expand", "stepback"):
        rows = transform_queries(questions, mode=mode).collect()
        assert len(rows) >= 3
        tr = json.loads(rows[0]["transform_trace"])
        assert tr["mode"] == mode and "original" in tr
    with pytest.raises(ValueError):
        transform_queries(questions, mode="nope")
