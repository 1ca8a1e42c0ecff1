"""End-to-end corpus deduplication: exact + MinHash-LSH near-dup, applied.

The suite's dd_* queries measure dedup (pair sets, cluster histograms);
this operator *applies* it — the step a training-data pipeline actually
ships: given a documents table, return the kept rows plus an audit report.

Pipeline (all candidate-generated, never all-pairs):

1. **Exact** — first-wins per md5(text): one hash-groupBy.
2. **Near-dup candidates** — the suite's verified-Jaccard pair query
   (``dd_jaccard_pairs``: 12 affine MinHashes over one-md5-per-token base
   values, 6 bands of 2, banded within the ``source`` block, exact token
   Jaccard ≥ 0.8 on candidates only) run over the exact-kept set.
3. **Clusters** — distributed connected components (large-star/small-star)
   over the verified pair graph; representative = min doc_id.
4. **Apply** — drop every cluster member except its representative.

Reference parity: the reference has no corpus dedup (its ingest is
per-upload, ingestion_pipeline.py); this is part of the training-data
surface the brief adds on top. Semantics follow Lee et al. 2022
("Deduplicating Training Data Makes Language Models Better") — exact-then-
near, keep-one-per-cluster.

100 TB posture: one hash-groupBy, band equi-joins within source blocks,
CC in O(log² n) shuffle rounds, two anti-joins. No collects above the
CC convergence fingerprints; no per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from chatvector_ai_spark.operators.graph import connected_components

_REQUIRED_COLS = ("doc_id", "source", "text")


def _text_key() -> Column:
    """Exact-dup grouping key: md5(text), with a sentinel for NULL text so
    NULL-text rows dedup among themselves instead of vanishing through
    NULL-key join semantics."""
    return F.coalesce(F.md5(F.col("text")), F.lit("__null_text__"))


def near_dup_pairs(
    spark: SparkSession, docs: DataFrame, threshold: float = 0.8
) -> DataFrame:
    """Verified near-dup pairs (a_id, b_id, jaccard) over ``docs`` via the
    suite's LSH pair query — banded within ``source``, exact token-set
    Jaccard on candidates. ``threshold`` tightens the verify filter; it
    cannot go below the 0.8 the band geometry is tuned for (12 hashes /
    6 bands of 2 → band-collision probability ≈0.998 at J=0.8; recall at
    lower J is not engineered, so asking for it raises)."""
    from chatvector_ai_spark.suite import SPARK_SQL

    if threshold < 0.8:
        raise ValueError(
            f"threshold {threshold} < 0.8: the 6x2 band geometry only "
            "guarantees candidate recall down to J=0.8 (use more/narrower "
            "bands for lower thresholds)"
        )
    missing = [c for c in _REQUIRED_COLS if c not in docs.columns]
    if missing:
        raise ValueError(f"dedup input is missing columns {missing}")
    view = "cvs_dedup_input_docs"
    docs.createOrReplaceTempView(view)
    sql = SPARK_SQL["dd_jaccard_pairs"].replace("FROM documents", f"FROM {view}")
    pairs = spark.sql(sql)
    if threshold > 0.8:
        pairs = pairs.where(F.col("jaccard") >= F.lit(threshold))
    return pairs


def dedup_corpus(
    spark: SparkSession, docs: DataFrame, threshold: float = 0.8
) -> tuple[DataFrame, dict]:
    """Exact + near-dup dedup applied to ``docs``; returns (kept, report).

    ``kept`` preserves the input schema. ``report`` is a plain dict of
    exact integer counts (driver-side scalars only — the four counts are
    one aggregate action each, not data-scale collects). Deterministic:
    first-wins keeps the min doc_id of every exact group and every
    near-dup cluster, so reruns and re-partitionings keep the same rows.
    Idempotent: every surviving pair of docs has verified Jaccard below
    the threshold, so a second pass removes nothing.
    """
    n_input = docs.count()

    # 1) exact: min doc_id per md5(text), within the same source block
    # (cross-source exact dups are kept — source is the tenancy boundary,
    # mirroring the suite's banded-within-source contract). NULL text gets
    # a sentinel key: md5(NULL) is NULL, and NULL join keys never match, so
    # without it every NULL-text row — including its group's min-id
    # representative — would silently vanish in the semi-join.
    keyed = docs.withColumn("_h", _text_key())
    exact_keep = keyed.groupBy("source", "_h").agg(
        F.min("doc_id").alias("doc_id")
    )
    exact_kept = keyed.join(
        exact_keep, ["source", "_h", "doc_id"], "left_semi"
    ).drop("_h")
    n_exact_kept = exact_kept.count()

    # 2-3) near-dup clusters over the exact survivors
    pairs = near_dup_pairs(spark, exact_kept, threshold=threshold)
    comp = connected_components(
        pairs.select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
    )
    drop_ids = comp.where(F.col("entity") != F.col("component")).select(
        F.col("entity").alias("doc_id")
    )
    n_clusters = comp.select("component").distinct().count()

    # 4) apply
    kept = exact_kept.join(drop_ids, "doc_id", "left_anti")
    n_kept = kept.count()

    report = {
        "n_input": n_input,
        "exact_removed": n_input - n_exact_kept,
        "neardup_clusters": n_clusters,
        "neardup_removed": n_exact_kept - n_kept,
        "n_kept": n_kept,
        "threshold": threshold,
    }
    return kept, report


def dedup_fold(
    spark: SparkSession,
    kept: DataFrame,
    new_docs: DataFrame,
    threshold: float = 0.8,
) -> tuple[DataFrame, dict]:
    """Incremental dedup: fold ``new_docs`` into an already-deduped
    ``kept`` corpus. Returns (admitted, report) where ``admitted`` is the
    subset of new docs that survive — the caller appends them to the
    corpus (existing kept rows are never revoked, matching the engine's
    append-only incremental posture).

    A new doc is dropped when it (a) exactly matches any kept or
    admitted-earlier doc in its source block, or (b) lands in a near-dup
    cluster containing a kept doc or a smaller-id new doc. Because
    first-wins keeps minimum doc_ids and production ids increase
    monotonically, the folded corpus is ROW-IDENTICAL to a full
    ``dedup_corpus`` rebuild over old+new (pinned by test) — the same
    invariant the pipeline's ``incremental_update`` holds vs full builds —
    with ONE documented exception: a new doc that BRIDGES two kept docs
    into one cluster. The rebuild would revoke the larger-id kept doc;
    the append-only fold instead drops the bridge and keeps both kept
    docs (also pinned by test). Both outcomes are valid dedup states
    (no surviving pair exceeds the threshold against the docs that
    clustered them); revocation-on-fold is exactly what append-only
    lineage forbids.

    Scale shape: the near-dup candidate join runs over kept ∪ new, but
    every stage is the same banded/candidate-generated machinery as the
    full pass; the admitted set is delta-sized.
    """
    n_new = new_docs.count()

    # exact: a new doc survives if its (source, md5) is unseen in kept
    # and it is the min doc_id of its hash group within the new batch
    # (same NULL-text sentinel as dedup_corpus)
    new_keyed = new_docs.withColumn("_h", _text_key())
    kept_keys = kept.select("source", _text_key().alias("_h")).distinct()
    fresh = new_keyed.join(kept_keys, ["source", "_h"], "left_anti")
    batch_keep = fresh.groupBy("source", "_h").agg(F.min("doc_id").alias("doc_id"))
    exact_ok = fresh.join(batch_keep, ["source", "_h", "doc_id"], "left_semi").drop(
        "_h"
    )
    n_exact_ok = exact_ok.count()

    # near-dup: clusters over kept ∪ exact-surviving-new; a new doc is
    # admitted iff it is its component's minimum (kept docs, having the
    # smaller ids, win their clusters; new-vs-new clusters keep the min)
    union = kept.select(*exact_ok.columns).unionByName(exact_ok)
    pairs = near_dup_pairs(spark, union, threshold=threshold)
    comp = connected_components(
        pairs.select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
    )
    losers = comp.where(F.col("entity") != F.col("component")).select(
        F.col("entity").alias("doc_id")
    )
    admitted = exact_ok.join(losers, "doc_id", "left_anti")
    n_admitted = admitted.count()

    report = {
        "n_new": n_new,
        "exact_dropped": n_new - n_exact_ok,
        "neardup_dropped": n_exact_ok - n_admitted,
        "n_admitted": n_admitted,
        "threshold": threshold,
    }
    return admitted, report
