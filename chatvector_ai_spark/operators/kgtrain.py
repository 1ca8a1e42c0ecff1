"""Training-data generation over the materialized KG: deterministic
negative sampling for knowledge-graph-embedding (TransE/DistMult-style)
training sets.

For each distinct positive triple (src, rel, dst) the sampler emits
``n_neg`` corrupted-tail negatives drawn near-uniformly from the entity
vocabulary by a *deterministic* hash (md5 of the triple + sample index),
then removes false negatives — corrupted triples that exist as positives —
in the standard "filtered setting" (Bordes et al., TransE).

Scale shape (the part that matters at 10^9 entities):

- The entity vocabulary never gets a GLOBAL dense index (a global
  row_number is a single-partition window — a scale killer). Instead each
  entity hashes into one of ``n_buckets`` vocab buckets and gets a
  within-bucket index via a PARTITION BY bucket window (bounded,
  ~|V|/n_buckets rows per partition).
- Bucket sizes are a ≤``n_buckets``-row table — broadcast; its dense rank
  (the only unpartitioned window, over ≤n_buckets rows) maps hashes onto
  NON-EMPTY buckets only, so no sample is lost to an empty bucket.
- A sample resolves as (hash → non-empty bucket, hash → index mod bucket
  size) and joins the vocab on the (bucket, index) equi-key — a plain
  shuffle join on a synthetic uniform key, no skew. Sampling is
  bucket-weighted near-uniform over the vocabulary (exactly uniform when
  |V| ≫ n_buckets evens the bucket sizes).
- The filtered-setting subtraction is one left_anti equi-join on
  (src, rel, neg_dst) against the positive set.

Everything is md5/integer arithmetic expressible identically in DuckDB,
so the suite query has an exact value-level oracle twin.

Reference analog: the reference has no KGE training path (it is a RAG
service, backend/services/*); this is part of the "operations a
large-scale training-data pipeline would need" surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _h60(col: F.Column) -> F.Column:
    """Deterministic 60-bit non-negative integer from a string column —
    conv(substring(md5(x),1,15),16,10); DuckDB twin:
    CAST('0x' || substr(md5(x),1,15) AS BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def negative_samples(
    edges: DataFrame, n_neg: int = 2, n_buckets: int = 64
) -> DataFrame:
    """(src, rel, dst, neg_idx, neg_dst) — ``n_neg`` deterministic
    corrupted-tail negatives per distinct positive triple, filtered
    setting (no sampled tail that forms a true positive)."""
    pos = edges.select("src", "rel", "dst").distinct()

    vocab = (
        pos.select(F.col("src").alias("entity"))
        .unionByName(pos.select(F.col("dst").alias("entity")))
        .distinct()
        .withColumn("bk", _h60(F.concat(F.lit("vb:"), F.col("entity"))) % n_buckets)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("bk").orderBy("entity")
    indexed = vocab.withColumn("i", F.row_number().over(w) - 1)
    sizes = indexed.groupBy("bk").agg(F.count("*").alias("bk_n"))
    # dense rank over the ≤n_buckets non-empty buckets (bounded window)
    ranked = sizes.withColumn(
        "bkr", F.row_number().over(Window.orderBy("bk")) - 1
    )
    n_nonempty = sizes.agg(F.count("*").alias("n_ne"))

    trip = F.concat_ws("|", "src", "rel", "dst")
    gen = (
        pos.withColumn("neg_idx", F.explode(F.array(*[F.lit(j) for j in range(n_neg)])))
        .crossJoin(F.broadcast(n_nonempty))
        .withColumn(
            "bkr",
            _h60(F.concat(F.lit("nb:"), trip, F.lit("|"), F.col("neg_idx").cast("string")))
            % F.col("n_ne"),
        )
        .withColumn(
            "hi",
            _h60(F.concat(F.lit("ni:"), trip, F.lit("|"), F.col("neg_idx").cast("string"))),
        )
    )
    sampled = (
        gen.join(F.broadcast(ranked), "bkr")
        .withColumn("i", F.col("hi") % F.col("bk_n"))
        .join(indexed.select("bk", "i", F.col("entity").alias("neg_dst")), ["bk", "i"])
        .select("src", "rel", "dst", "neg_idx", "neg_dst")
    )
    false_neg = pos.select("src", "rel", F.col("dst").alias("neg_dst"))
    return sampled.join(false_neg, ["src", "rel", "neg_dst"], "left_anti").select(
        "src", "rel", "dst", "neg_idx", "neg_dst"
    )
