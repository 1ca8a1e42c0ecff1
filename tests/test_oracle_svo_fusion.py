"""Golden cases for the SVO extractor, hash embeddings, and fusion math."""

import math

from chatvector_ai_spark.oracle.fusion import (
    first_wins_dedup,
    greedy_context_prefix,
    lexical_overlap,
    rerank_score,
    rrf_fuse,
    rrf_scores,
)
from chatvector_ai_spark.oracle.hashembed import cosine, embed_batch, embed_text
from chatvector_ai_spark.oracle.svo import detect_mentions, extract_triples


# --- mentions / triples -------------------------------------------------------

def test_mentions_capitalized_runs():
    ms = detect_mentions("Acme Corp acquired Beta Labs in 2019.")
    assert [(m.surface, m.start) for m in ms] == [
        ("Acme Corp", 0),
        ("Beta Labs", len("Acme Corp acquired ")),
    ]


def test_mentions_with_connector():
    ms = detect_mentions("Bank of America works at Nowhere.")
    assert ms[0].surface == "Bank of America"


def test_triple_simple_svo():
    text = "Acme Corp acquired Beta Labs in 2019."
    ts = extract_triples(text)
    assert len(ts) == 1
    t = ts[0]
    assert (t.subj, t.pred, t.obj) == ("Acme Corp", "acquired", "Beta Labs")
    assert text[t.subj_start : t.subj_end] == "Acme Corp"
    assert text[t.obj_start : t.obj_end] == "Beta Labs"
    assert t.conf == 1.0


def test_triple_multiword_predicate():
    ts = extract_triples("Gamma Inc was founded by Ada Lovelace.")
    assert [(t.subj, t.pred, t.obj) for t in ts] == [
        ("Gamma Inc", "founded_by", "Ada Lovelace")
    ]


def test_triple_per_sentence_isolation():
    text = "Acme Corp acquired Beta Labs. Delta Co joined Omega Group."
    ts = extract_triples(text)
    assert [(t.subj, t.pred, t.obj) for t in ts] == [
        ("Acme Corp", "acquired", "Beta Labs"),
        ("Delta Co", "joined", "Omega Group"),
    ]
    # offsets absolute in full text
    assert text[ts[1].subj_start : ts[1].subj_end] == "Delta Co"


def test_triple_requires_two_mentions():
    assert extract_triples("Something acquired nothing important.") == []


def test_triple_lower_conf_with_gap():
    ts = extract_triples("Acme Corp quietly acquired Beta Labs.")
    assert len(ts) == 1 and ts[0].conf == 0.8


# --- embeddings -----------------------------------------------------------------

def test_embed_deterministic_unit_norm():
    v1 = embed_text("alpha beta gamma")
    v2 = embed_text("alpha beta gamma")
    assert v1 == v2
    assert math.isclose(sum(x * x for x in v1), 1.0, rel_tol=1e-5)


def test_embed_empty_is_zero():
    assert all(x == 0.0 for x in embed_text(""))


def test_embed_batch_matches_scalar():
    texts = ["alpha beta", "gamma delta epsilon", ""]
    batch = embed_batch(texts)
    for i, t in enumerate(texts):
        assert [float(x) for x in batch[i]] == embed_text(t)


def test_cosine_of_identical_is_one():
    v = embed_text("same text tokens")
    assert math.isclose(cosine(v, v), 1.0, rel_tol=1e-6)


# --- fusion -----------------------------------------------------------------------

def test_rrf_reference_golden():
    # /root/reference/backend/tests/test_hybrid_retrieval.py:15-33
    fused = rrf_fuse([["a", "b", "c"], ["b", "d", "e"]])
    assert fused[:3] == ["b", "a", "d"]


def test_rrf_scores_values():
    scores = rrf_scores([["a", "b"], ["b"]])
    assert math.isclose(scores["b"], 1 / 62 + 1 / 61)
    assert math.isclose(scores["a"], 1 / 61)


def test_rrf_limit():
    assert rrf_fuse([["a", "b", "c"]], limit=2) == ["a", "b"]


def test_lexical_overlap():
    assert lexical_overlap("alpha beta", "beta gamma alpha") == 1.0
    assert lexical_overlap("alpha beta", "beta only") == 0.5
    assert lexical_overlap("", "anything") == 0.0
    assert lexical_overlap("query", "") == 0.0


def test_rerank_score_weights_normalized():
    # similarity.py:45-50 — weights are normalized by their sum
    s = rerank_score(1.0, "q", "q", retrieval_weight=7, lexical_weight=3)
    assert math.isclose(s, 0.7 * 1.0 + 0.3 * 1.0)


def test_first_wins_dedup():
    items = [("d1", 0, "q0"), ("d1", 0, "q1"), ("d2", 1, "q0")]
    out = first_wins_dedup(items, key_fn=lambda it: (it[0], it[1]))
    assert out == [("d1", 0, "q0"), ("d2", 1, "q0")]


def test_context_budget_whole_part_drops():
    # parts of len 10 each, sep 2: 10, +12, +12 -> 34
    assert greedy_context_prefix([10, 10, 10], budget=34) == 3
    assert greedy_context_prefix([10, 10, 10], budget=33) == 2
    assert greedy_context_prefix([100], budget=10) == 1  # oversized single kept
    assert greedy_context_prefix([], budget=10) == 0
