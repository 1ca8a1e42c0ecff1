"""K-means IVF similarity search (operators/embedcluster.ivf_topk)."""

import pytest
from pyspark.sql import functions as F

from chatvector_ai_spark.operators.embedcluster import (
    ivf_topk,
    kmeans_assign,
    kmeans_centroids,
)


def _blob(center, n, spread=0.01):
    # deterministic points around a center (no RNG)
    return [
        [c + spread * ((i * 7 + j * 3) % 5 - 2) for j, c in enumerate(center)]
        for i in range(n)
    ]


@pytest.fixture(scope="module")
def corpus(spark):
    pts = (
        _blob([1.0, 0.0, 0.0, 0.0], 6)
        + _blob([0.0, 1.0, 0.0, 0.0], 6)
        + _blob([0.0, 0.0, 1.0, 0.0], 6)
    )
    rows = [(i, [float(x) for x in p]) for i, p in enumerate(pts)]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def _queries(spark):
    return spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0]), (200, [0.0, 0.0, 1.0, 0.0])],
        "qid bigint, embedding array<float>",
    )


def test_ivf_topk_routes_to_the_right_blob(spark, corpus):
    out = ivf_topk(corpus, _queries(spark), k=3, n_cells=3, n_probe=1, iters=3)
    rows = out.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append((r["rank"], r["vec_id"]))
    assert set(by_q) == {100, 200}
    # blob membership: ids 0-5 = e1 blob, 12-17 = e3 blob
    assert all(v in range(0, 6) for _, v in by_q[100])
    assert all(v in range(12, 18) for _, v in by_q[200])
    # ranks are 1..3 with ascending dist2
    for qid in (100, 200):
        assert sorted(r for r, _ in by_q[qid]) == [1, 2, 3]


def test_ivf_matches_brute_force_when_probing_all_cells(spark, corpus):
    """n_probe = n_cells degrades IVF to exact search — top-k equals the
    brute-force integer-L2 ranking."""
    qs = _queries(spark)
    ivf = {
        (r["qid"], r["rank"]): r["vec_id"]
        for r in ivf_topk(corpus, qs, k=5, n_cells=3, n_probe=3, iters=2).collect()
    }
    from chatvector_ai_spark.operators.embedcluster import _dist2, quantize

    cq = quantize(corpus).select("vec_id", "q")
    qq = quantize(qs.select(F.col("qid").alias("vec_id"), "embedding")).select(
        F.col("vec_id").alias("qid"), F.col("q").alias("qv")
    )
    brute = (
        qq.crossJoin(cq)
        .withColumn("dist2", _dist2(F.col("qv"), F.col("q")))
        .collect()
    )
    import collections

    per_q = collections.defaultdict(list)
    for r in brute:
        per_q[r["qid"]].append((r["dist2"], r["vec_id"]))
    for qid, scored in per_q.items():
        expect = [v for _, v in sorted(scored)[:5]]
        got = [ivf[(qid, rank)] for rank in range(1, 6)]
        assert got == expect, qid


def test_centroids_and_assign_agree(spark, corpus):
    cents = kmeans_centroids(corpus, k=3, iters=3)
    assert cents.count() == 3
    assigned = kmeans_assign(corpus, k=3, iters=3)
    # the three blobs land in three distinct clusters
    blobs = assigned.withColumn("blob", (F.col("vec_id") / 6).cast("int"))
    per_blob = blobs.groupBy("blob").agg(F.countDistinct("cluster").alias("nc")).collect()
    assert all(r["nc"] == 1 for r in per_blob)
    assert blobs.select("cluster").distinct().count() == 3


def test_ivf_guards(spark, corpus):
    with pytest.raises(ValueError, match="n_probe"):
        ivf_topk(corpus, _queries(spark), k=3, n_cells=2, n_probe=3)
    with pytest.raises(ValueError, match="n_probe"):
        ivf_topk(corpus, _queries(spark), k=0, n_cells=2, n_probe=1)
    with pytest.raises(ValueError, match="iters"):
        ivf_topk(corpus, _queries(spark), k=3, n_cells=2, n_probe=1, iters=-1)
