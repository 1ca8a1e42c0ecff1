"""Stage 4 — canonicalization: connected components over surface↔entity edges.

The only shuffle-iterative stage. Surfaces and entities form a bipartite
graph (edges from the alias dictionary plus observed mention links);
components are the canonicalization clusters and the minimum entity id in a
component is its canonical representative (entity ids "E…" sort before
surrogate "S:…" nodes, so a component with any real entity is represented by
one).

Algorithm: iterative min-label propagation —
    label(v) ← min(label(v), min over neighbors u of label(u))
until a fixpoint (no label changed). Each round is one shuffle-join plus one
partial-aggregating groupBy; ``localCheckpoint`` truncates the growing plan
lineage each round (the iterative-join discipline AQE cannot provide).

Skew: hub surfaces ("S:acme" appearing in 30% of docs) are high-degree
nodes. The groupBy(min) side is safe — partial map-side aggregation collapses
hub traffic before the shuffle. The join side is salted explicitly: the
label table is replicated SKEW_SALT_BUCKETS ways and each edge picks a salt
bucket by hash, so one hot key fans across S reducers instead of one
(SURVEY.md §4.3); AQE skew-join mops up any residue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chatvector_ai_spark.config import CC_MAX_ITERATIONS, SKEW_SALT_BUCKETS


def linking_edges(linked_mentions: DataFrame, alias_dict: DataFrame) -> DataFrame:
    """Distinct (src, dst) edges: surface-node ↔ entity-node."""
    from_mentions = linked_mentions.select(
        F.concat(F.lit("S:"), F.lower(F.col("surface"))).alias("src"),
        F.col("entity_id").alias("dst"),
    )
    from_dict = alias_dict.select(
        F.concat(F.lit("S:"), F.col("alias")).alias("src"),
        F.col("entity_id").alias("dst"),
    )
    return from_mentions.unionByName(from_dict).where(F.col("src") != F.col("dst")).distinct()


def connected_components(
    edges: DataFrame,
    max_iterations: int = CC_MAX_ITERATIONS,
    salt_buckets: int = SKEW_SALT_BUCKETS,
) -> DataFrame:
    """(node, component) for every node in *edges*; component = min node id."""
    spark = edges.sparkSession
    sym = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )

    salted_edges = sym.withColumn("salt", F.pmod(F.xxhash64("dst"), F.lit(salt_buckets)))
    salted_edges = salted_edges.localCheckpoint(eager=True)
    salt_range = spark.range(salt_buckets).select(F.col("id").cast("int").alias("salt"))

    for _ in range(max_iterations):
        # replicate labels across salt buckets, then join edges on (node, salt)
        labels_rep = labels.crossJoin(F.broadcast(salt_range)).select(
            F.col("node").alias("src"), "label", "salt"
        )
        neighbor_min = (
            salted_edges.join(labels_rep, ["src", "salt"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        updated = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))).alias("new_label"),
                F.col("label"),
            )
        ).localCheckpoint(eager=True)
        changed = updated.where(F.col("new_label") != F.col("label")).limit(1).count()
        labels = updated.select("node", F.col("new_label").alias("label")).localCheckpoint(eager=True)
        if changed == 0:
            break

    return labels.select("node", F.col("label").alias("component"))


def canonical_map(linked_mentions: DataFrame, alias_dict: DataFrame) -> DataFrame:
    """entity_id → canonical_entity (component representative)."""
    edges = linking_edges(linked_mentions, alias_dict)
    comp = connected_components(edges)
    return (
        comp.where(~F.col("node").startswith("S:"))
        .select(F.col("node").alias("entity_id"), F.col("component").alias("canonical_entity"))
    )


def canonicalize_triples(
    triples_linked: DataFrame,
    linked_mentions: DataFrame,
    alias_dict: DataFrame,
) -> DataFrame:
    """Rewrite subj/obj entity ids to their component representatives."""
    cmap = canonical_map(linked_mentions, alias_dict)
    out = (
        triples_linked.join(
            F.broadcast(cmap.withColumnRenamed("entity_id", "subj_entity").withColumnRenamed("canonical_entity", "subj_canon")),
            "subj_entity",
            "left",
        )
        .join(
            F.broadcast(cmap.withColumnRenamed("entity_id", "obj_entity").withColumnRenamed("canonical_entity", "obj_canon")),
            "obj_entity",
            "left",
        )
        .withColumn("subj_entity", F.coalesce(F.col("subj_canon"), F.col("subj_entity")))
        .withColumn("obj_entity", F.coalesce(F.col("obj_canon"), F.col("obj_entity")))
        .drop("subj_canon", "obj_canon")
    )
    return out
