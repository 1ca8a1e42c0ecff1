"""Stage 3 — entity linking: mention surfaces vs broadcast alias dictionary.

The new KG join (SURVEY.md §2.4 J8): mentions from extracted triples are
equi-joined to the alias dictionary on the lowercased surface form with an
explicit ``broadcast()`` hint (the dictionary is the small dimension), then
disambiguated with the reference reranker's combined-score shape
(similarity.py:45-50): 0.7 · cosine(chunk_embedding, alias_embedding)
+ 0.3 · lexical_overlap(surface, canonical), top-1 per mention via a
groupBy struct-max (map-side combinable; ties resolve to the greatest
entity_id) — all JVM-side expressions, no Python in this stage.

Unmatched surfaces get a deterministic surrogate node id ("S:<surface>") so
canonicalization can still cluster repeated unknown entities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chatvector_ai_spark.config import RERANK_LEXICAL_WEIGHT, RERANK_RETRIEVAL_WEIGHT
from chatvector_ai_spark.functions.vectors import cosine, dot, lexical_overlap, tokens


def mentions_from_triples(triples: DataFrame) -> DataFrame:
    """Explode each triple into its subject and object mention occurrences.

    Each mention row carries ``triple_id`` (hash of the triple's identity
    within its chunk) plus the triple payload (pred, conf), so the edge
    table can be rebuilt with ONE groupBy(triple_id) pivot instead of
    joining triples↔mentions twice (SURVEY §2.4 J7: same-row computation
    beats a join).
    """
    base = ["doc_id", "chunk_id", "chunk_index", "triple_id", "pred", "conf"]
    emb = ["embedding"] if "embedding" in triples.columns else []
    with_id = triples.withColumn(
        "triple_id",
        F.xxhash64("chunk_id", "subj_start", "obj_start", "pred"),
    )
    subj = with_id.select(
        *base,
        F.lit("subj").alias("role"),
        F.col("subj").alias("surface"),
        F.col("subj_start").alias("m_start"),
        F.col("subj_end").alias("m_end"),
        *emb,
    )
    obj = with_id.select(
        *base,
        F.lit("obj").alias("role"),
        F.col("obj").alias("surface"),
        F.col("obj_start").alias("m_start"),
        F.col("obj_end").alias("m_end"),
        *emb,
    )
    return subj.unionByName(obj)


def link_mentions(
    mentions: DataFrame,
    alias_dict: DataFrame,
    chunks: DataFrame | None = None,
    assume_normalized: bool = True,
) -> DataFrame:
    """Best-entity assignment per mention occurrence.

    Output: mention columns + entity_id, canonical, link_score, linked(bool).

    Embedding strategy (the 100 TB concern): the embedding term only
    matters where it can change a decision — mentions whose surface matches
    an AMBIGUOUS alias (≥2 candidate entities). Passing ``chunks`` (the
    chunk table with its ``embedding`` column) enables the two-phase plan:
    unambiguous mentions are scored lexically with no embedding access at
    all, and only the ambiguous sliver fetches chunk embeddings via a
    broadcast semi-join — so triple/mention tables never carry a vector
    column and the scan never decodes one. If ``mentions`` itself carries
    an ``embedding`` column the single-phase plan scores every row.
    ``assume_normalized``: hash embeddings are L2-normalized at creation
    (oracle/hashembed.py), so cosine reduces to a single dot-product fold.
    """
    has_emb = "embedding" in mentions.columns

    # The lexical term |tokens(surface) ∩ tokens(canonical)| / |tokens(surface)|
    # depends only on (alias, canonical): the equi-join key IS lower(surface),
    # and tokens() lowercases, so tokens(surface) ≡ tokens(alias). Computing
    # it once per dictionary row (thousands) instead of once per mention
    # (billions at scale) removes every per-mention regex/array operation.
    from pyspark.sql import Window

    dict_prepped = alias_dict.withColumn(
        "_alias_lex", lexical_overlap(tokens("alias"), tokens("canonical"))
    ).withColumn("_n_cand", F.count("*").over(Window.partitionBy("alias")))
    cand = mentions.withColumn("surface_lc", F.lower(F.col("surface"))).join(
        F.broadcast(dict_prepped),
        F.col("surface_lc") == F.col("alias"),
        "left",
    )

    w_r = RERANK_RETRIEVAL_WEIGHT / (RERANK_RETRIEVAL_WEIGHT + RERANK_LEXICAL_WEIGHT)
    w_l = RERANK_LEXICAL_WEIGHT / (RERANK_RETRIEVAL_WEIGHT + RERANK_LEXICAL_WEIGHT)

    def emb_term(a: str, b: str):
        return dot(a, b) if assume_normalized else cosine(a, b)

    if has_emb:
        # null-safe: rows with a (sparse) embedding get the full combined
        # score; rows without one — where the term cannot change the
        # decision — score lexically, matching the two-phase semantics
        score = (
            F.lit(w_r) * F.coalesce(emb_term("embedding", "alias_embedding"), F.lit(0.0))
            + F.lit(w_l) * F.col("_alias_lex")
        )
        cand = cand.withColumn(
            "link_score", F.when(F.col("entity_id").isNotNull(), score)
        ).drop("alias", "alias_embedding", "_alias_lex", "_n_cand", "embedding")
    elif chunks is not None and "embedding" in chunks.columns:
        plain = cand.where(F.coalesce(F.col("_n_cand"), F.lit(0)) <= 1).withColumn(
            "link_score",
            F.when(F.col("entity_id").isNotNull(), F.lit(w_l) * F.col("_alias_lex")),
        )
        amb = cand.where(F.col("_n_cand") > 1)
        amb_keys = amb.select("chunk_id").distinct()
        emb_map = chunks.join(F.broadcast(amb_keys), "chunk_id", "left_semi").select(
            "chunk_id", F.col("embedding").alias("_chunk_emb")
        )
        amb = amb.join(F.broadcast(emb_map), "chunk_id", "left").withColumn(
            "link_score",
            F.lit(w_r) * emb_term("_chunk_emb", "alias_embedding")
            + F.lit(w_l) * F.col("_alias_lex"),
        ).drop("_chunk_emb")
        cand = plain.unionByName(amb).drop(
            "alias", "alias_embedding", "_alias_lex", "_n_cand"
        )
    else:
        cand = cand.withColumn(
            "link_score",
            F.when(F.col("entity_id").isNotNull(), F.lit(w_l) * F.col("_alias_lex")),
        ).drop("alias", "alias_embedding", "_alias_lex", "_n_cand")

    # Disambiguation = argmax(link_score, tie → max entity_id) per mention.
    # Deliberately groupBy + struct-max rather than a window row_number:
    # candidate groups are tiny (≈1 row; >1 only for ambiguous aliases), so
    # partial map-side aggregation collapses them before the shuffle and no
    # global sort is ever built — the window variant sorts every shuffle
    # partition of near-unique keys and anti-scales with executor threads.
    payload_cols = [c for c in cand.columns if c not in ("chunk_id", "role", "m_start")]
    pick = F.struct(
        F.coalesce(F.col("link_score"), F.lit(-1.0)).alias("_s"),
        F.coalesce(F.col("entity_id"), F.lit("")).alias("_e"),
        F.struct(*payload_cols).alias("p"),
    )
    best = (
        cand.groupBy("chunk_id", "role", "m_start")
        .agg(F.max(pick).alias("_b"))
        .select("chunk_id", "role", "m_start", "_b.p.*")
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
