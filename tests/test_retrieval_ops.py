"""Retrieval operator parity vs the single-node oracle (fusion.py) and the
reference's published fixture expectations (test_hybrid_retrieval.py:15-33)."""

import pytest
from pyspark.sql import functions as F

from chatvector_ai_spark.operators.retrieval import (
    context_prefix,
    first_wins_dedup,
    hybrid_search,
    keyword_topk,
    rerank,
    rrf_fuse,
    vector_topk,
    with_rank,
)
from chatvector_ai_spark.oracle import fusion as oracle
from chatvector_ai_spark.oracle.hashembed import embed_text


def _ranked_df(spark, ids):
    return spark.createDataFrame(
        [(i, r + 1) for r, i in enumerate(ids)], "id string, rank int"
    )


def test_rrf_matches_reference_fixture(spark):
    """Reference fixture: lists [a,b,c] and [b,d] fuse to b,a,d,c-ish order
    (/root/reference/backend/tests/test_hybrid_retrieval.py:15-33)."""
    fused = rrf_fuse(
        [_ranked_df(spark, ["a", "b", "c"]), _ranked_df(spark, ["b", "d"])],
        id_cols=["id"],
    ).collect()
    got = [r["id"] for r in fused]
    expected = oracle.rrf_fuse([["a", "b", "c"], ["b", "d"]])
    assert got == expected == ["b", "a", "d", "c"]
    scores = {r["id"]: r["rrf_score"] for r in fused}
    for i, s in oracle.rrf_scores([["a", "b", "c"], ["b", "d"]]).items():
        assert abs(scores[i] - s) < 1e-12


def test_vector_topk_orders_by_cosine(spark):
    rows = [(f"c{i}", embed_text(f"alpha beta {'gamma ' * i}")) for i in range(10)]
    df = spark.createDataFrame(rows, "chunk_id string, embedding array<float>")
    q = embed_text("alpha beta")
    top = vector_topk(df, q, 3, id_cols=["chunk_id"]).collect()
    assert len(top) == 3
    assert top[0]["chunk_id"] == "c0"  # identical text wins
    assert top[0]["similarity"] == pytest.approx(1.0, abs=1e-6)
    sims = [r["similarity"] for r in top]
    assert sims == sorted(sims, reverse=True)
    assert all(r["score_type"] == "vector" for r in top)


def test_keyword_topk_overlap_ratio(spark):
    df = spark.createDataFrame(
        [("a", "table scan join"), ("b", "table only here"), ("c", "nothing relevant")],
        "chunk_id string, chunk_text string",
    )
    top = keyword_topk(df, "table scan", 5, id_cols=["chunk_id"]).collect()
    got = {r["chunk_id"]: r["kw_score"] for r in top}
    assert got == {"a": pytest.approx(1.0), "b": pytest.approx(0.5)}
    assert "c" not in got  # zero-overlap rows filtered


def test_rerank_matches_oracle(spark):
    df = spark.createDataFrame(
        [("a", "table scan fast", 0.9), ("b", "unrelated words", 0.95)],
        "chunk_id string, chunk_text string, rrf_score double",
    )
    out = {r["chunk_id"]: r["rerank_score"] for r in rerank(df, "table scan").collect()}
    for cid, text, score in [("a", "table scan fast", 0.9), ("b", "unrelated words", 0.95)]:
        assert out[cid] == pytest.approx(oracle.rerank_score(score, "table scan", text), abs=1e-12)


def test_first_wins_dedup_matches_oracle(spark):
    rows = [("d1", 0, 1, "q1"), ("d1", 0, 2, "q2"), ("d2", 1, 1, "q1"), ("d2", 1, 2, "q2")]
    df = spark.createDataFrame(rows, "doc_id string, chunk_index int, query_rank int, q string")
    out = first_wins_dedup(df, ["doc_id", "chunk_index"], [F.asc("query_rank")]).collect()
    got = {(r["doc_id"], r["chunk_index"]): r["q"] for r in out}
    expected_rows = oracle.first_wins_dedup(rows, key_fn=lambda t: (t[0], t[1]))
    assert got == {(t[0], t[1]): t[3] for t in expected_rows}


def test_context_prefix_matches_oracle(spark):
    lengths = [100, 200, 50, 400, 30]
    rows = [(i, "x" * n) for i, n in enumerate(lengths)]
    df = spark.createDataFrame(rows, "rank int, chunk_text string")
    for budget in (120, 360, 10_000, 40):
        kept = context_prefix(df, [("rank", "asc")], budget=budget).count()
        assert kept == oracle.greedy_context_prefix(lengths, budget=budget), budget


def test_hybrid_search_end_to_end(spark):
    rows = [
        (f"d{i // 4}", i, f"chunk {i} " + ("table scan query " if i % 3 == 0 else "filler text "),
         embed_text(f"chunk {i} topic {i % 5}"))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id string, chunk_index int, chunk_text string, embedding array<float>")
    res = hybrid_search(df, embed_text("chunk 0 topic 0"), "table scan", 5,
                        id_cols=["doc_id", "chunk_index"]).collect()
    assert 0 < len(res) <= 5
    assert all(r["score_type"] == "reranked" for r in res)
    scores = [r["rerank_score"] for r in res]
    assert scores == sorted(scores, reverse=True)
