"""Retrieval operators: vector/keyword top-k, RRF fusion, rerank, context.

DataFrame-native implementations of the reference's chat retrieval flow
(/root/reference/backend/services/chat_service.py:269-345):

    embed query → vector top-k (pgvector `<=>`, sqlalchemy_service.py:479-506)
                + keyword top-k (ts_rank, :508-543, 2× candidates :562)
    → RRF fuse (retrieval_service.py:119-152, k=60)
    → first-wins dedup (chat_service.py:329-344)
    → rerank 0.7·retrieval + 0.3·lexical (reranker/similarity.py:22-95)
    → greedy context budget (context_service.py:48-80)

Everything is JVM-side DataFrame expressions (no Python in the hot path);
per-group top-k uses the window rank-filter pattern Catalyst rewrites to
WindowGroupLimit. Single-node twins live in oracle/fusion.py for parity
tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from chatvector_ai_spark.config import (
    CANDIDATE_WIDENING,
    MAX_CONTEXT_CHARS,
    RERANK_LEXICAL_WEIGHT,
    RERANK_RETRIEVAL_WEIGHT,
    RRF_K,
)
from chatvector_ai_spark.functions.vectors import cosine, lexical_overlap, tokens


def vector_topk(
    chunks: DataFrame,
    query_vec: list[float],
    k: int,
    id_cols: list[str] | None = None,
    emb_col: str = "embedding",
    per_group: str | None = None,
) -> DataFrame:
    """Top-k rows by cosine similarity to *query_vec*.

    ``per_group``: optional column for per-document top-k (the reference
    retrieves per doc_id); None = global top-k.
    """
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = chunks.withColumn("similarity", cosine(F.col(emb_col), qv))
    order = [F.desc("similarity"), *[F.asc(c) for c in (id_cols or [])]]
    if per_group:
        w = Window.partitionBy(per_group).orderBy(*order)
        return (
            scored.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= k)
            .drop("_rk")
            .withColumn("score_type", F.lit("vector"))
        )
    return scored.orderBy(*order).limit(k).withColumn("score_type", F.lit("vector"))


def keyword_topk(
    chunks: DataFrame,
    query_text: str,
    k: int,
    text_col: str = "chunk_text",
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Top-k rows by lexical token-overlap score (the deterministic ts_rank
    stand-in, SURVEY §2.8 W2): |q ∩ t| / |q| over distinct tokens."""
    q_tokens = tokens(F.lit(query_text))
    scored = chunks.withColumn("kw_score", lexical_overlap(q_tokens, tokens(F.col(text_col))))
    order = [F.desc("kw_score"), *[F.asc(c) for c in (id_cols or [])]]
    return (
        scored.where(F.col("kw_score") > 0)
        .orderBy(*order)
        .limit(k)
        .withColumn("score_type", F.lit("keyword"))
    )


OrderSpec = list[tuple[str, str]]  # [(column, "asc"|"desc"), ...] — must be a total order


def _strictly_before(b: str, a: str, spec: OrderSpec) -> Column:
    """b sorts strictly before a under the lexicographic *spec*."""
    cond = F.lit(False)
    eq = F.lit(True)
    for name, direction in spec:
        bc, ac = F.col(f"{b}.{name}"), F.col(f"{a}.{name}")
        cmp = (bc > ac) if direction == "desc" else (bc < ac)
        cond = cond | (eq & cmp)
        eq = eq & (bc == ac)
    return cond


def with_rank(df: DataFrame, spec: OrderSpec) -> DataFrame:
    """rank = enumerate from 1 under *spec* (retrieval_service.py:146).

    For BOUNDED candidate lists (the k-limited outputs of the top-k
    operators): rank is 1 + count of rows sorting strictly before, from a
    broadcast self-join — never a ``row_number()`` over an unpartitioned
    window, which would move the whole input to one partition and is the
    scale-killer the reference's bounded lists never hit.
    """
    keys = [name for name, _ in spec]
    a, b = df.select(*keys).alias("a"), df.select(*keys).alias("b")
    ranks = (
        a.join(F.broadcast(b), _strictly_before("b", "a", spec), "left")
        .groupBy(*[F.col(f"a.{k}").alias(k) for k in keys])
        # count a non-null b key: left-join null-extension must not count
        .agg((F.count(F.col(f"b.{keys[-1]}")) + 1).alias("rank"))
    )
    return df.join(F.broadcast(ranks), keys)


def rrf_fuse(
    ranked_lists: list[DataFrame],
    id_cols: list[str],
    k: int = RRF_K,
    limit: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion: score(d) = Σ_L 1/(k + rank_L(d)).

    Each input must already carry a ``rank`` column (1-based). Pure
    DataFrame op: union → groupBy → sum (SURVEY §2.5 A3).
    """
    parts = [
        df.select(*id_cols, (F.lit(1.0) / (F.lit(k) + F.col("rank"))).alias("rrf_part"))
        for df in ranked_lists
    ]
    uni = parts[0]
    for p in parts[1:]:
        uni = uni.unionByName(p)
    fused = (
        uni.groupBy(*id_cols)
        .agg(F.sum("rrf_part").alias("rrf_score"))
        .withColumn("score_type", F.lit("hybrid_rrf"))
    )
    ordered = fused.orderBy(F.desc("rrf_score"), *[F.asc(c) for c in id_cols])
    return ordered.limit(limit) if limit is not None else ordered


def first_wins_dedup(df: DataFrame, key_cols: list[str], order: list[Column]) -> DataFrame:
    """Keep the first row per key under *order* (chat_service.py:329-344)."""
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return df.withColumn("_wins", F.row_number().over(w)).where(F.col("_wins") == 1).drop("_wins")


def rerank(
    matches: DataFrame,
    query_text: str,
    text_col: str = "chunk_text",
    score_col: str = "rrf_score",
    retrieval_weight: float = RERANK_RETRIEVAL_WEIGHT,
    lexical_weight: float = RERANK_LEXICAL_WEIGHT,
) -> DataFrame:
    """Combined score: w_r·retrieval + w_l·lexical, weights normalized
    (similarity.py:45-50); relabels score_type='reranked'."""
    total = retrieval_weight + lexical_weight
    w_r, w_l = retrieval_weight / total, lexical_weight / total
    lex = lexical_overlap(tokens(F.lit(query_text)), tokens(F.col(text_col)))
    return (
        matches.withColumn(
            "rerank_score", F.lit(w_r) * F.col(score_col) + F.lit(w_l) * lex
        )
        .withColumn("score_type", F.lit("reranked"))
    )


def context_prefix(
    matches: DataFrame,
    spec: OrderSpec,
    text_col: str = "chunk_text",
    budget: int = MAX_CONTEXT_CHARS,
    sep_len: int = 2,
) -> DataFrame:
    """Greedy whole-chunk prefix under a char budget; a single oversized
    first chunk is kept (context_service.py:48-80).

    Like ``with_rank`` this operates on a BOUNDED candidate list: the
    running sum is a broadcast join-aggregate over rows sorting before each
    row, not an unpartitioned running-sum window.
    """
    keys = [name for name, _ in spec]
    sized = matches.withColumn("_len", F.length(F.col(text_col)) + F.lit(sep_len))
    a = sized.select(*keys, "_len").alias("a")
    b = sized.select(*keys, "_len").alias("b")
    agg = (
        a.join(F.broadcast(b), _strictly_before("b", "a", spec), "left")
        .groupBy(*[F.col(f"a.{k}").alias(k) for k in keys], F.col("a._len").alias("_len"))
        .agg(
            F.sum(F.col("b._len")).alias("_prior"),
            F.count(F.col(f"b.{keys[-1]}")).alias("_nbefore"),
        )
        .withColumn("_cum", F.coalesce(F.col("_prior"), F.lit(0)) + F.col("_len") - F.lit(sep_len))
    )
    kept = agg.where((F.col("_cum") <= budget) | (F.col("_nbefore") == 0)).select(*keys)
    return matches.join(F.broadcast(kept), keys, "left_semi")


def hybrid_search(
    chunks: DataFrame,
    query_vec: list[float],
    query_text: str,
    match_count: int,
    id_cols: list[str],
    text_col: str = "chunk_text",
) -> DataFrame:
    """The full hybrid path: 2×k vector + 2×k keyword candidates → RRF →
    top match_count, reranked (sqlalchemy_service.py:545-623)."""
    widened = match_count * CANDIDATE_WIDENING
    vec = with_rank(
        vector_topk(chunks, query_vec, widened, id_cols=id_cols),
        [("similarity", "desc"), *[(c, "asc") for c in id_cols]],
    )
    kw = with_rank(
        keyword_topk(chunks, query_text, widened, text_col=text_col, id_cols=id_cols),
        [("kw_score", "desc"), *[(c, "asc") for c in id_cols]],
    )
    fused = rrf_fuse([vec, kw], id_cols=id_cols, limit=match_count)
    enriched = fused.join(chunks.select(*id_cols, text_col), id_cols, "left")
    return rerank(enriched, query_text, text_col=text_col).orderBy(
        F.desc("rerank_score"), *[F.asc(c) for c in id_cols]
    )
