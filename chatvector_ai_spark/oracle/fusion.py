"""Ranking/fusion oracle: RRF, combined rerank score, context budget.

Pure-Python twins of the DataFrame implementations in
``chatvector_ai_spark.operators.retrieval``; semantics from:
- RRF: /root/reference/backend/services/retrieval_service.py:119-152 (k=60)
- rerank: /root/reference/backend/services/reranker/similarity.py:22-95
- context budget: /root/reference/backend/services/context_service.py:48-80
- first-wins dedup: /root/reference/backend/services/chat_service.py:329-344
"""

from __future__ import annotations

from chatvector_ai_spark.config import (
    MAX_CONTEXT_CHARS,
    RERANK_LEXICAL_WEIGHT,
    RERANK_RETRIEVAL_WEIGHT,
    RRF_K,
)
from chatvector_ai_spark.oracle.hashembed import tokenize


def rrf_scores(
    ranked_lists: list[list[str]], k: int = RRF_K, limit: int | None = None
) -> dict[str, float]:
    """score(d) = sum over lists of 1/(k + rank_d), ranks starting at 1."""
    scores: dict[str, float] = {}
    for ranked in ranked_lists:
        for rank, item in enumerate(ranked, start=1):
            scores[item] = scores.get(item, 0.0) + 1.0 / (k + rank)
    ordered = sorted(scores, key=lambda item: scores[item], reverse=True)
    if limit is not None:
        ordered = ordered[:limit]
    return {item: scores[item] for item in ordered}


def rrf_fuse(ranked_lists: list[list[str]], k: int = RRF_K, limit: int | None = None) -> list[str]:
    return list(rrf_scores(ranked_lists, k=k, limit=limit))


def lexical_overlap(query: str, text: str) -> float:
    """|tokens(q) ∩ tokens(t)| / |tokens(q)| (similarity.py:22-29)."""
    q = set(tokenize(query))
    if not q:
        return 0.0
    t = set(tokenize(text))
    if not t:
        return 0.0
    return len(q & t) / len(q)


def rerank_score(
    retrieval_score: float,
    query: str,
    text: str,
    retrieval_weight: float = RERANK_RETRIEVAL_WEIGHT,
    lexical_weight: float = RERANK_LEXICAL_WEIGHT,
) -> float:
    total = retrieval_weight + lexical_weight
    return (retrieval_weight / total) * retrieval_score + (lexical_weight / total) * lexical_overlap(query, text)


def first_wins_dedup(items: list[tuple], key_fn) -> list[tuple]:
    """Keep the first occurrence per key, preserving arrival order."""
    seen: set = set()
    out = []
    for item in items:
        k = key_fn(item)
        if k not in seen:
            seen.add(k)
            out.append(item)
    return out


def greedy_context_prefix(
    part_lengths: list[int],
    budget: int = MAX_CONTEXT_CHARS,
    sep_len: int = 2,
) -> int:
    """How many leading parts fit the char budget (whole-part drops).

    A single oversized first part is still included (context_service.py:56-62).
    """
    total = 0
    kept = 0
    for i, n in enumerate(part_lengths):
        addition = n if kept == 0 else n + sep_len
        if total + addition > budget:
            if kept == 0:
                return 1
            return kept
        total += addition
        kept += 1
    return kept
