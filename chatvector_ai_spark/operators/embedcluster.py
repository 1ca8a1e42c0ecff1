"""Embedding clustering: integer-exact Lloyd k-means over an embedding
column — the "semantic clustering" stage of a training-data pipeline
(domain discovery, stratified sampling, cluster-balanced dedup), and the
same assign/update loop an IVF index build runs to place its cell
centroids.

Everything is INTEGER arithmetic by construction, which is what makes the
operator oracle-twinnable and cluster-deterministic:

- vectors quantize once to BIGINT grid points (round(x·scale) + offset,
  the offset keeping every coordinate positive so integer division is
  engine-agnostic — floor vs truncate never differs on non-negatives);
- distances are exact integer squared-L2 sums (order-independent, no
  float accumulation nondeterminism across partitions — the reason a
  naive float Lloyd is NOT reproducible on a cluster: re-partitioning
  reorders the adds);
- centroid updates are exact integer means (sum DIV count);
- ties in the argmin break on the smaller cluster id.

Reference analog: none — the reference (a RAG service) stores embeddings
but never clusters them (backend/services/retrieval_service.py retrieves
only); this is part of the "operations a large-scale training-data
pipeline would need" surface.

Scale shape: the k-row centroid table is broadcast to the assign join
(no shuffle of the vector side beyond the final per-vector argmin
hash-agg); the update is one posexplode + (cluster, dim) hash-agg —
k·dim result rows, tiny. Rounds are a fixed small constant (Lloyd
converges fast and training-data pipelines cap it anyway); lineage is
truncated per round via eager localCheckpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantize(embeddings: DataFrame, scale: int = 1000, offset: int = 10000) -> DataFrame:
    """(vec_id, q) — embeddings snapped to a positive BIGINT grid:
    q_i = round(double(x_i) · scale) + offset. The grid is where the
    engine-exactness comes from; ``offset`` must exceed scale·max|x|."""
    return embeddings.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: (F.round(x.cast("double") * scale) + offset).cast("bigint"),
        ).alias("q"),
    )


def _dist2(q: F.Column, c: F.Column) -> F.Column:
    """Exact integer squared L2 between two BIGINT arrays."""
    return F.aggregate(
        F.zip_with(q, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def kmeans_centroids(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    scale: int = 1000,
    offset: int = 10000,
) -> DataFrame:
    """Trained centroid table ``(cluster, c)`` from the same deterministic
    integer Lloyd loop as ``kmeans_assign`` — the IVF cell build step,
    exposed so a search index can train once and probe many times."""
    if k < 1 or iters < 0:
        raise ValueError("kmeans_centroids needs k >= 1 and iters >= 0")
    q = quantize(embeddings, scale, offset).localCheckpoint(eager=True)
    return _lloyd(q, k, iters)


def kmeans_assign(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    scale: int = 1000,
    offset: int = 10000,
) -> DataFrame:
    """Lloyd k-means over ``embeddings (vec_id bigint, embedding
    array<float>)``: initialize the k centroids from the k smallest
    vec_ids (deterministic — no RNG, no k-means++ sampling round-trip),
    run ``iters`` assign/update rounds, and return the FINAL assignment
    (vec_id, cluster, dist2) computed against the post-update centroids.

    Empty clusters keep their previous centroid (the standard Lloyd
    degeneracy rule that keeps k stable). dist2 is the exact integer
    squared L2 on the quantized grid."""
    if k < 1 or iters < 0:
        raise ValueError("kmeans_assign needs k >= 1 and iters >= 0")
    q = quantize(embeddings, scale, offset).localCheckpoint(eager=True)
    return _assign(q, _lloyd(q, k, iters))


def _assign(q: DataFrame, cents_df: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: broadcast the k-row centroid table,
    exact integer dist2, per-vector argmin as a min-struct hash-agg."""
    scored = q.crossJoin(F.broadcast(cents_df)).withColumn(
        "dist2", _dist2(F.col("q"), F.col("c"))
    )
    best = scored.groupBy("vec_id").agg(
        F.min(F.struct("dist2", "cluster")).alias("b")
    )
    return best.select(
        "vec_id", F.col("b.cluster").alias("cluster"), F.col("b.dist2").alias("dist2")
    )


def _lloyd(q: DataFrame, k: int, iters: int) -> DataFrame:
    """The deterministic integer Lloyd loop over quantized vectors;
    returns the trained (cluster, c) centroid table."""
    # init: the k smallest vec_ids (TakeOrdered — a k-row heap), cluster
    # ids 0..k-1 in vec_id order via a join-count over the k-row set
    # (zero single-partition windows, the engine-wide invariant)
    seed = q.orderBy("vec_id").limit(k)
    smaller = seed.select(F.col("vec_id").alias("vid_lt"))
    cents = (
        seed.join(smaller, F.col("vid_lt") < F.col("vec_id"), "left")
        .groupBy("vec_id", "q")
        .agg(F.count("vid_lt").alias("cluster"))
        .select("cluster", F.col("q").alias("c"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        assigned = _assign(q, cents).join(q, "vec_id")
        sums = (
            assigned.select("cluster", F.posexplode("q").alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
        )
        new_cents = (
            sums.withColumn("m", F.expr("s DIV n"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda st: st["m"],
                ).alias("c")
            )
        )
        # empty clusters keep their previous centroid
        cents = (
            cents.withColumnRenamed("c", "c_prev")
            .join(new_cents, "cluster", "left")
            .select("cluster", F.coalesce("c", "c_prev").alias("c"))
            .localCheckpoint(eager=True)
        )
    return cents


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    iters: int = 2,
    scale: int = 1000,
    offset: int = 10000,
) -> DataFrame:
    """K-means IVF similarity search: train ``n_cells`` Lloyd centroids
    over the corpus, assign every corpus vector to its nearest cell, route
    each query to its ``n_probe`` nearest cells, and exact-score only the
    vectors in the probed cells — top ``k`` per query by exact integer
    squared L2 on the shared quantization grid.

    ``embeddings`` is (vec_id bigint, embedding array<float>); ``queries``
    is (qid, embedding). Returns (qid, vec_id, dist2, rank 1..k), rank
    deterministic (ties break on vec_id).

    This is the trained-cell counterpart of the suite's grid-cell IVF
    (``ann_ivf_topk``): k-means cells track the data distribution, so cell
    populations stay balanced where a fixed grid degenerates. Scale shape:
    the centroid table is k rows and broadcast twice (corpus assign, query
    routing); the only data-scale shuffle is the (cell equi-join → per-qid
    partitioned top-k window); recall is tunable with ``n_probe`` exactly
    like FAISS IVF nprobe."""
    if k < 1 or n_probe < 1 or n_probe > n_cells:
        raise ValueError("ivf_topk needs k >= 1 and 1 <= n_probe <= n_cells")
    if iters < 0:
        raise ValueError("ivf_topk needs iters >= 0")
    from pyspark.sql import Window

    q = quantize(embeddings, scale, offset).localCheckpoint(eager=True)
    cents = _lloyd(q, n_cells, iters)
    corpus = _assign(q, cents).join(q, "vec_id").select("vec_id", "cluster", "q")

    qq = quantize(queries.select(F.col("qid").alias("vec_id"), "embedding"),
                  scale, offset).select(F.col("vec_id").alias("qid"),
                                        F.col("q").alias("qv"))
    routed = (
        qq.crossJoin(F.broadcast(cents))
        .withColumn("cdist", _dist2(F.col("qv"), F.col("c")))
        .withColumn(
            "crank",
            F.row_number().over(
                Window.partitionBy("qid").orderBy("cdist", "cluster")
            ),
        )
        .where(F.col("crank") <= n_probe)
        .select("qid", "qv", "cluster")
    )
    scored = (
        routed.join(corpus, "cluster")
        .withColumn("dist2", _dist2(F.col("qv"), F.col("q")))
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("qid").orderBy("dist2", "vec_id")
            ),
        )
        .where(F.col("rank") <= k)
        .select("qid", "vec_id", "dist2", "rank")
    )
    return scored
