"""Stage 3 — entity linking: mention surfaces vs broadcast alias dictionary.

The new KG join (SURVEY.md §2.4 J8): mentions from extracted triples are
equi-joined to the alias dictionary on the lowercased surface form with an
explicit ``broadcast()`` hint (the dictionary is the small dimension), then
disambiguated with the reference reranker's combined-score shape
(similarity.py:45-50): 0.7 · cosine(chunk_embedding, alias_embedding)
+ 0.3 · lexical_overlap(surface, canonical), top-1 per mention via a
window — all JVM-side expressions, no Python in this stage.

Unmatched surfaces get a deterministic surrogate node id ("S:<surface>") so
canonicalization can still cluster repeated unknown entities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from chatvector_ai_spark.config import RERANK_LEXICAL_WEIGHT, RERANK_RETRIEVAL_WEIGHT
from chatvector_ai_spark.functions.vectors import cosine, lexical_overlap, tokens


def mentions_from_triples(triples: DataFrame) -> DataFrame:
    """Explode each triple into its subject and object mention occurrences."""
    base = ["doc_id", "chunk_id", "chunk_index"]
    emb = ["embedding"] if "embedding" in triples.columns else []
    subj = triples.select(
        *base,
        F.lit("subj").alias("role"),
        F.col("subj").alias("surface"),
        F.col("subj_start").alias("m_start"),
        F.col("subj_end").alias("m_end"),
        *emb,
    )
    obj = triples.select(
        *base,
        F.lit("obj").alias("role"),
        F.col("obj").alias("surface"),
        F.col("obj_start").alias("m_start"),
        F.col("obj_end").alias("m_end"),
        *emb,
    )
    return subj.unionByName(obj)


def link_mentions(mentions: DataFrame, alias_dict: DataFrame) -> DataFrame:
    """Best-entity assignment per mention occurrence.

    Output: mention columns + entity_id, canonical, link_score, linked(bool).
    """
    has_emb = "embedding" in mentions.columns
    cand = mentions.withColumn("surface_lc", F.lower(F.col("surface"))).join(
        F.broadcast(alias_dict),
        F.col("surface_lc") == F.col("alias"),
        "left",
    )

    w_r = RERANK_RETRIEVAL_WEIGHT / (RERANK_RETRIEVAL_WEIGHT + RERANK_LEXICAL_WEIGHT)
    w_l = RERANK_LEXICAL_WEIGHT / (RERANK_RETRIEVAL_WEIGHT + RERANK_LEXICAL_WEIGHT)
    emb_sim = cosine("embedding", "alias_embedding") if has_emb else F.lit(0.0)
    lex = lexical_overlap(tokens("surface"), tokens("canonical"))
    cand = cand.withColumn(
        "link_score",
        F.when(F.col("entity_id").isNotNull(), F.lit(w_r) * emb_sim + F.lit(w_l) * lex),
    )

    pick = Window.partitionBy("chunk_id", "role", "m_start").orderBy(
        F.desc_nulls_last("link_score"), F.asc_nulls_last("entity_id")
    )
    best = (
        cand.withColumn("_rk", F.row_number().over(pick))
        .where(F.col("_rk") == 1)
        .drop("_rk", "alias", "alias_embedding")
    )
    return (
        best.withColumn("linked", F.col("entity_id").isNotNull())
        .withColumn(
            "entity_id",
            F.coalesce(F.col("entity_id"), F.concat(F.lit("S:"), F.col("surface_lc"))),
        )
        .withColumn("canonical", F.coalesce(F.col("canonical"), F.col("surface")))
        .drop("surface_lc")
    )
