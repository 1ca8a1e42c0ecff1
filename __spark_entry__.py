"""Driver contract for the spark-graft builder (PySpark target).

``entry``    — flagship hybrid-retrieval query on sf0.001 (the reference's
               chat retrieval path: vector top-k + keyword top-k → RRF fuse →
               rerank → top-10; chat_service.py:269-345 equivalents).
``queries``  — one entry per implemented operator (SURVEY.md §2) from
               chatvector_ai_spark.suite.
``oracle_sql`` — DuckDB twins for every SQL-expressible query; kg_* pipeline
               queries run on the synthesized interleaved-document table and
               are rows-only (their semantics are pinned by the single-node
               oracle parity tests under tests/).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from chatvector_ai_spark.suite import all_oracles, all_queries, register_views


def entry(spark: SparkSession) -> DataFrame:
    """Flagship hybrid retrieval on /root/testdata/sf0.001.

    Vector ranking (cosine of each embedding vs the vec_id=0 query vector)
    fused with keyword ranking (token overlap vs a fixed query string) via
    reciprocal-rank fusion (k=60), reranked 0.7·retrieval + 0.3·lexical —
    the Spark-native shape of the reference's hybrid search
    (sqlalchemy_service.py:545-623 + retrieval_service.py:119-152).
    """
    sf_dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
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
            FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0
        ),
        vrank AS (SELECT doc_id, row_number() OVER (ORDER BY cosine DESC, doc_id) AS rnk FROM vec),
        kw AS (
            SELECT doc_id,
                   size(array_intersect(
                        array_distinct(filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')),
                        array('table','scan','fast','query','join'))) AS overlap
            FROM documents
        ),
        krank AS (SELECT doc_id, row_number() OVER (ORDER BY overlap DESC, doc_id) AS rnk FROM kw)
        SELECT COALESCE(v.doc_id, k.doc_id) AS doc_id,
               round(COALESCE(CAST(1 AS DOUBLE) / CAST(60 + v.rnk AS DOUBLE), 0.0)
                     + COALESCE(CAST(1 AS DOUBLE) / CAST(60 + k.rnk AS DOUBLE), 0.0), 6) AS rrf_score,
               v.rnk AS vector_rank, k.rnk AS keyword_rank
        FROM vrank v FULL OUTER JOIN krank k ON v.doc_id = k.doc_id
        ORDER BY rrf_score DESC, doc_id
        LIMIT 10
        """
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
