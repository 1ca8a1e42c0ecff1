"""Driver contract for the spark-graft builder (PySpark target).

``entry``    — flagship hybrid-retrieval query on sf0.001 (the reference's
               chat retrieval path: vector top-k + keyword top-k → RRF fuse →
               rerank → top-10; chat_service.py:269-345 equivalents).
``queries``  — one entry per implemented operator (SURVEY.md §2) from
               chatvector_ai_spark.suite.
``oracle_sql`` — DuckDB twins for every query; the kg_* pipeline queries'
               twins select from committed parquet written by the
               single-node oracle (tools/make_kg_oracle_fixture.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from chatvector_ai_spark.suite import all_oracles, all_queries, register_views


def entry(spark: SparkSession) -> DataFrame:
    """Flagship hybrid retrieval on /root/testdata/sf0.001.

    Vector ranking fused with keyword ranking (token overlap vs a fixed
    query string) via reciprocal-rank fusion (k=60) — the Spark-native
    shape of the reference's hybrid search (sqlalchemy_service.py:545-623
    + retrieval_service.py:119-152). The vector arm is INDEX-ASSISTED the
    way the reference's pgvector ivfflat index serves _find_vector_chunks
    (sqlalchemy_service.py:479-506, ARCHITECTURE.md:402-406): every vector
    is coarse-quantized to its nearest of 10 centroids, the two cells
    nearest the vec_id=0 query are probed, and ONLY those candidates get
    the exact-cosine rerank — the corpus is never exact-scanned. Each arm
    is then narrowed to a bounded top-100 candidate set with ORDER BY …
    LIMIT (TakeOrderedAndProject — distributed) and ranked by join-count
    over that bounded set, so no unpartitioned window ever drags the
    corpus to one partition.
    """
    sf_dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        cent AS (SELECT vec_id AS cid, embedding FROM embeddings WHERE vec_id < 10),
        assign AS (
            -- per-vector nearest centroid as a max_by hash AGGREGATE (ties
            -- → smaller cid via the -cid struct field): no window, no sort
            SELECT e.vec_id,
                   max_by(c.cid, named_struct(
                       'cos', aggregate(zip_with(e.embedding, c.embedding,
                                  (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                              CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)
                              / (sqrt(aggregate(zip_with(e.embedding, e.embedding,
                                  (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                                  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))
                                 * sqrt(aggregate(zip_with(c.embedding, c.embedding,
                                  (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                                  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))),
                       'neg_cid', -c.cid)) AS cid
            FROM embeddings e CROSS JOIN cent c
            GROUP BY e.vec_id
        ),
        probe AS (
            -- the 2 cells nearest the query: TakeOrdered over 10 rows
            SELECT c.cid
            FROM cent c CROSS JOIN q
            ORDER BY aggregate(zip_with(q.qv, c.embedding,
                         (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                     CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)
                     / (sqrt(aggregate(zip_with(q.qv, q.qv,
                         (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                         CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))
                        * sqrt(aggregate(zip_with(c.embedding, c.embedding,
                         (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                         CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))) DESC,
                     c.cid
            LIMIT 2
        ),
        vec AS (
            SELECT e.vec_id AS doc_id,
                   aggregate(zip_with(e.embedding, q.qv,
                                      (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                             CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)
                   / (sqrt(aggregate(zip_with(e.embedding, e.embedding,
                                              (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                                     CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))
                      * sqrt(aggregate(zip_with(q.qv, q.qv,
                                                (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                                       CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))) AS cosine
            FROM embeddings e
            JOIN assign a ON e.vec_id = a.vec_id
            JOIN probe p ON a.cid = p.cid
            CROSS JOIN q WHERE e.vec_id <> 0
        ),
        vcand AS (SELECT doc_id, cosine FROM vec ORDER BY cosine DESC, doc_id LIMIT 100),
        vrank AS (SELECT a.doc_id, 1 + count(b.doc_id) AS rnk
                  FROM vcand a LEFT JOIN vcand b
                    ON b.cosine > a.cosine OR (b.cosine = a.cosine AND b.doc_id < a.doc_id)
                  GROUP BY a.doc_id),
        kw AS (
            SELECT doc_id,
                   size(array_intersect(
                        array_distinct(filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')),
                        array('table','scan','fast','query','join'))) AS overlap
            FROM documents
        ),
        kcand AS (SELECT doc_id, overlap FROM kw ORDER BY overlap DESC, doc_id LIMIT 100),
        krank AS (SELECT a.doc_id, 1 + count(b.doc_id) AS rnk
                  FROM kcand a LEFT JOIN kcand b
                    ON b.overlap > a.overlap OR (b.overlap = a.overlap AND b.doc_id < a.doc_id)
                  GROUP BY a.doc_id)
        SELECT COALESCE(v.doc_id, k.doc_id) AS doc_id,
               round(COALESCE(CAST(1 AS DOUBLE) / CAST(60 + v.rnk AS DOUBLE), 0.0)
                     + COALESCE(CAST(1 AS DOUBLE) / CAST(60 + k.rnk AS DOUBLE), 0.0), 6) AS rrf_score,
               v.rnk AS vector_rank, k.rnk AS keyword_rank
        FROM vrank v FULL OUTER JOIN krank k ON v.doc_id = k.doc_id
        ORDER BY rrf_score DESC, COALESCE(v.doc_id, k.doc_id)
        LIMIT 10
        """
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
