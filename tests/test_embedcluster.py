"""Integer-exact Lloyd k-means (operators/embedcluster)."""

import pytest
from pyspark.sql import functions as F

from chatvector_ai_spark.operators.embedcluster import kmeans_assign, quantize


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.fixture(scope="module")
def two_blobs(spark):
    # two well-separated 4-d blobs: ids 0-3 near (1,1,0,0), ids 4-7 near
    # (-1,-1,0,0); init takes ids 0..7 as seeds for k=2 -> ids 0 and 1
    rows = []
    for i in range(4):
        rows.append((i, [1.0 + 0.01 * i, 1.0 - 0.01 * i, 0.0, 0.0]))
    for i in range(4):
        rows.append((4 + i, [-1.0 - 0.01 * i, -1.0 + 0.01 * i, 0.0, 0.0]))
    return _emb(spark, rows)


def test_kmeans_separates_blobs(spark, two_blobs):
    got = {r["vec_id"]: r["cluster"] for r in kmeans_assign(two_blobs, k=2).collect()}
    # after the update rounds the two blobs must land in different
    # clusters, each blob uniform
    assert len({got[i] for i in range(4)}) == 1
    assert len({got[i] for i in range(4, 8)}) == 1
    assert got[0] != got[4]


def test_kmeans_deterministic(spark, two_blobs):
    a = sorted(map(tuple, kmeans_assign(two_blobs, k=2, iters=2).collect()))
    b = sorted(map(tuple, kmeans_assign(two_blobs, k=2, iters=2).collect()))
    assert a == b


def test_kmeans_k1_assigns_everything(spark, two_blobs):
    got = kmeans_assign(two_blobs, k=1, iters=1).collect()
    assert len(got) == 8
    assert {r["cluster"] for r in got} == {0}
    assert all(r["dist2"] >= 0 for r in got)


def test_kmeans_zero_iters_uses_seed_centroids(spark, two_blobs):
    # iters=0: assignment against the raw seed vectors; seed 0 (vec 0)
    # must claim itself at distance 0
    got = {r["vec_id"]: (r["cluster"], r["dist2"])
           for r in kmeans_assign(two_blobs, k=2, iters=0).collect()}
    assert got[0] == (0, 0)
    assert got[1] == (1, 0)


def test_quantize_positive_grid(spark, two_blobs):
    q = quantize(two_blobs).collect()
    for r in q:
        assert all(v > 0 for v in r["q"])  # the offset keeps DIV == //


def test_kmeans_rejects_bad_params(spark, two_blobs):
    with pytest.raises(ValueError):
        kmeans_assign(two_blobs, k=0)
    with pytest.raises(ValueError):
        kmeans_assign(two_blobs, iters=-1)
