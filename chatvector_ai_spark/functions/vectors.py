"""JVM-side vector math over ``array<float>`` columns.

Cosine/dot/norm are built from ``zip_with`` + ``aggregate`` higher-order
functions so they run inside whole-stage codegen — the hot retrieval path
never crosses into Python (the reference computes cosine in Postgres via
pgvector's ``<=>``, sqlalchemy_service.py:487-488; this is the Spark-native
equivalent).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    sq = F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    return F.sqrt(sq)


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb)).otherwise(F.lit(0.0))


def tokens(col: Column | str) -> Column:
    """Distinct lowercase [a-z0-9]+ tokens (reranker/similarity.py:11-19)."""
    col = F.col(col) if isinstance(col, str) else col
    arr = F.split(F.lower(col), "[^a-z0-9]+")
    return F.array_distinct(F.filter(arr, lambda t: t != F.lit("")))


def lexical_overlap(query_tokens: Column, text_tokens: Column) -> Column:
    """|q ∩ t| / |q|, 0.0 when either side is empty (similarity.py:22-29)."""
    inter = F.size(F.array_intersect(query_tokens, text_tokens))
    qn = F.size(query_tokens)
    return (
        F.when((qn > 0) & (F.size(text_tokens) > 0), inter.cast("double") / qn.cast("double"))
        .otherwise(F.lit(0.0))
    )
