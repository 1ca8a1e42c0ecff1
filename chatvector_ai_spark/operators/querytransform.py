"""Query-transformation operators (SURVEY §2.9 Q1-Q5).

The reference transforms a user question through an LLM before retrieval
(rewrite / expand / stepback / history-resolution,
/root/reference/backend/services/query_service.py:63-192) with per-call
fallback-to-original on any failure (:42-60). The engine keeps the same
operator shapes as deterministic column transforms — the LLM seam is a
single pluggable function, and the *dataflow* (fan-out, rank provenance,
graceful fallback, debug trace) is what these operators pin down:

- rewrite: normalize the question (Q1);
- expand:  [original, alt1, alt2] fan-out with variant ranks (Q2);
- stepback: [original, broader] (Q3);
- resolve_with_history: prepend latest history turn's entities (Q4);
- transform_queries: config-dispatched, with a trace column (Q5).

All pure `pyspark.sql.functions` — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_EXPAND_ALTERNATIVES = 2  # [q, *alts[:2]] — query_service.py:85-88


def _norm(q: Column) -> Column:
    return F.trim(F.regexp_replace(q, r"\s+", " "))


def rewrite(df: DataFrame, q_col: str = "question") -> DataFrame:
    """Q1: deterministic rewrite — whitespace-normalized, trailing
    punctuation stripped; falls back to the original when the rewrite
    would be empty (the :42-60 fallback contract)."""
    rewritten = F.regexp_replace(_norm(F.col(q_col)), r"[?!.\s]+$", "")
    return df.withColumn(
        "transformed",
        F.when(F.length(rewritten) > 0, rewritten).otherwise(F.col(q_col)),
    )


def expand(df: DataFrame, q_col: str = "question") -> DataFrame:
    """Q2: one row per variant — rank 1 = original, then alternatives
    (keyword projection, first-half focus), capped at 1+MAX_EXPAND."""
    q = _norm(F.col(q_col))
    toks = F.filter(F.split(F.lower(q), r"[^a-z0-9]+"), lambda t: t != F.lit(""))
    keywordized = F.array_join(F.slice(toks, 1, 6), " ")
    first_half = F.array_join(F.slice(toks, 1, F.greatest(F.floor(F.size(toks) / 2).cast("int"), F.lit(1))), " ")
    variants = F.slice(
        F.array_distinct(F.array(q, keywordized, first_half)),
        1,
        1 + MAX_EXPAND_ALTERNATIVES,
    )
    return df.select(
        "*", F.posexplode(variants).alias("variant_rank0", "variant")
    ).withColumn("variant_rank", F.col("variant_rank0") + 1).drop("variant_rank0")


def stepback(df: DataFrame, q_col: str = "question") -> DataFrame:
    """Q3: [original, broader] — broader = leading content words only."""
    q = _norm(F.col(q_col))
    toks = F.filter(F.split(F.lower(q), r"[^a-z0-9]+"), lambda t: t != F.lit(""))
    broader = F.array_join(F.slice(toks, 1, 3), " ")
    variants = F.array_distinct(F.array(q, broader))
    return df.select(
        "*", F.posexplode(variants).alias("variant_rank0", "variant")
    ).withColumn("variant_rank", F.col("variant_rank0") + 1).drop("variant_rank0")


def resolve_with_history(
    df: DataFrame, q_col: str = "question", history_col: str = "last_history"
) -> DataFrame:
    """Q4: standalone resolution — prefix the latest history turn as
    context when present (deterministic stand-in for the LLM resolver)."""
    return df.withColumn(
        "transformed",
        F.when(
            F.col(history_col).isNotNull() & (F.length(F.col(history_col)) > 0),
            F.concat(_norm(F.col(history_col)), F.lit(" | "), _norm(F.col(q_col))),
        ).otherwise(_norm(F.col(q_col))),
    )


def transform_queries(
    df: DataFrame, mode: str = "rewrite", q_col: str = "question"
) -> DataFrame:
    """Q5: config-driven dispatch + debug trace column
    (QueryTransformResult analog: mode, original, n_variants)."""
    if mode == "passthrough":
        out = df.withColumn("variant", _norm(F.col(q_col))).withColumn(
            "variant_rank", F.lit(1)
        )
    elif mode == "rewrite":
        out = (
            rewrite(df, q_col)
            .withColumn("variant", F.col("transformed"))
            .withColumn("variant_rank", F.lit(1))
            .drop("transformed")
        )
    elif mode == "expand":
        out = expand(df, q_col)
    elif mode == "stepback":
        out = stepback(df, q_col)
    else:
        raise ValueError(f"unknown transform mode {mode!r}")
    return out.withColumn(
        "transform_trace",
        F.to_json(
            F.struct(
                F.lit(mode).alias("mode"),
                F.col(q_col).alias("original"),
                F.col("variant_rank").alias("rank"),
            )
        ),
    )
