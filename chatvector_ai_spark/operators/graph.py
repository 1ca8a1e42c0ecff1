"""Graph queries over the materialized nodes/edges tables.

The nodes/edges tables are bucketed by ``pmod(xxhash64(entity), N_BUCKETS)``
(pipeline.py) — the Iceberg ``bucket(N, entity_hash)`` stand-in — so
point-lookups prune to one bucket directory and neighborhood expansions
shuffle only on the entity keys they touch. These operators are the query
surface a KG consumer needs: ego neighborhoods, degree tables, k-hop
expansion, relation filtering — all plain DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chatvector_ai_spark.config import N_BUCKETS


def _bucket_of(entity: str, n_buckets: int) -> F.Column:
    return F.pmod(F.xxhash64(F.lit(entity)), F.lit(n_buckets))


def ego_edges(edges: DataFrame, entity: str, n_buckets: int | None = N_BUCKETS) -> DataFrame:
    """All edges touching *entity*; the src-side predicate includes the
    bucket so the scan prunes to one bucket partition for outgoing edges.

    ``n_buckets`` must be the bucket count in effect when *edges* was
    written (the warehouse manifest records it as ``n_buckets``; pass
    ``Warehouse.table_n_buckets("edges")``). A mismatched value would make
    the bucket predicate silently drop all outgoing edges, so pass ``None``
    to skip bucket pruning and filter on ``src`` alone.
    """
    if n_buckets and "bucket" in edges.columns:
        out = edges.where(
            (F.col("bucket") == _bucket_of(entity, n_buckets)) & (F.col("src") == entity)
        )
    else:
        out = edges.where(F.col("src") == entity)
    inc = edges.where(F.col("dst") == entity)
    return out.unionByName(inc).dropDuplicates()


def degrees(edges: DataFrame) -> DataFrame:
    """(entity, out_degree, in_degree, degree) — map-side combinable."""
    outs = edges.groupBy(F.col("src").alias("entity")).agg(F.count("*").alias("out_degree"))
    ins = edges.groupBy(F.col("dst").alias("entity")).agg(F.count("*").alias("in_degree"))
    return (
        outs.join(ins, "entity", "full_outer")
        .fillna(0, ["out_degree", "in_degree"])
        .withColumn("degree", F.col("out_degree") + F.col("in_degree"))
    )


def khop(edges: DataFrame, seeds: list[str], k: int = 2, max_frontier: int | None = None) -> DataFrame:
    """Entities reachable from *seeds* in ≤ k hops (undirected), with the
    hop at which each was first reached. Iterative frontier expansion —
    each hop is one join + distinct; ``max_frontier`` caps explosion on
    hub-heavy graphs (the candidate-widening analog)."""
    spark = edges.sparkSession
    sym = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    visited = spark.createDataFrame([(s, 0) for s in seeds], "entity string, hop int")
    frontier = visited.select("entity")
    for hop in range(1, k + 1):
        nxt = (
            sym.join(frontier.withColumnRenamed("entity", "src"), "src")
            .select(F.col("dst").alias("entity"))
            .distinct()
            .join(visited.select("entity"), "entity", "left_anti")
        )
        if max_frontier is not None:
            # deterministic cap: keep the lexicographically-smallest entities
            # (an unordered .limit() would keep an arbitrary, run-varying set)
            nxt = nxt.orderBy("entity").limit(max_frontier)
        nxt = nxt.withColumn("hop", F.lit(hop)).localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt)
        frontier = nxt.select("entity")
    return visited


def relation_counts(edges: DataFrame) -> DataFrame:
    """Per-relation edge counts + distinct endpoint counts."""
    return edges.groupBy("rel").agg(
        F.count("*").alias("n_edges"),
        F.countDistinct("src").alias("n_src"),
        F.countDistinct("dst").alias("n_dst"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


def cooccurring_entities(
    edges: DataFrame,
    min_shared_docs: int = 2,
    max_entities_per_doc: int | None = 64,
) -> DataFrame:
    """Entity pairs appearing as endpoints in ≥ min_shared_docs shared
    documents — the doc-level co-occurrence signal (blocked self-join on
    doc_id; partial-agg collapses before the pair shuffle).

    The per-doc pair fan-out is O(entities-per-doc²): one pathological doc
    with 10⁴ distinct entities would emit 5×10⁷ pairs in a single task, so
    ``max_entities_per_doc`` caps each doc's entity set to its top-N by
    endpoint-mention count (ties broken by entity id — deterministic).
    The window is PARTITION BY doc_id — per-doc, never global. ``None``
    disables the cap."""
    ent_mentions = edges.select(F.col("src").alias("entity"), "doc_id").unionByName(
        edges.select(F.col("dst").alias("entity"), "doc_id")
    )
    ent_docs = ent_mentions.groupBy("doc_id", "entity").agg(
        F.count("*").alias("n_mentions")
    )
    if max_entities_per_doc is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("doc_id").orderBy(
            F.desc("n_mentions"), F.asc("entity")
        )
        ent_docs = ent_docs.withColumn("rk", F.row_number().over(w)).where(
            F.col("rk") <= max_entities_per_doc
        )
    ent_docs = ent_docs.select("doc_id", "entity")
    a, b = ent_docs.alias("a"), ent_docs.alias("b")
    return (
        a.join(b, (F.col("a.doc_id") == F.col("b.doc_id")) & (F.col("a.entity") < F.col("b.entity")))
        .groupBy(F.col("a.entity").alias("entity_a"), F.col("b.entity").alias("entity_b"))
        .agg(F.countDistinct("a.doc_id").alias("shared_docs"))
        .where(F.col("shared_docs") >= min_shared_docs)
    )
