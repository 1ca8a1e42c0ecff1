"""Table sources/sinks: explicit schemas, no hot-path inference.

The reference's scan operators (SURVEY.md §2.1 S1-S9) reduce, on a columnar
engine, to schema-checked reads of the committed tables plus snapshot
writes; every schema is declared once here (the analog of the reference's
SQL DDL in backend/db/init/) and enforced on read — a file with a drifted
schema fails fast instead of poisoning a 100 TB job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField(
            "spans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("kind", T.StringType(), False),
                        T.StructField("text", T.StringType(), True),
                        T.StructField("media_ref", T.StringType(), True),
                        T.StructField("offset", T.IntegerType(), False),
                    ]
                )
            ),
            False,
        ),
    ]
)

ALIAS_SCHEMA = T.StructType(
    [
        T.StructField("alias", T.StringType(), False),
        T.StructField("entity_id", T.StringType(), False),
        T.StructField("canonical", T.StringType(), False),
        T.StructField("alias_embedding", T.ArrayType(T.FloatType()), True),
    ]
)


def _assert_schema(df: DataFrame, expected: T.StructType, what: str) -> DataFrame:
    got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    want = {f.name: f.dataType.simpleString() for f in expected.fields}
    missing = {k: v for k, v in want.items() if got.get(k) != v}
    if missing:
        raise ValueError(f"{what}: schema drift, expected fields {missing}, got {got}")
    return df.select(*[f.name for f in expected.fields])


def read_documents(spark: SparkSession, path: str) -> DataFrame:
    """Interleaved-documents table (BASELINE.json input_hint shape).

    The schema is INFERRED (one parquet footer read) and then checked —
    imposing the expected schema on the read would mask drift, silently
    nulling mistyped columns instead of failing fast."""
    return _assert_schema(spark.read.parquet(path), DOCUMENTS_SCHEMA, path)


def read_alias_dict(spark: SparkSession, path: str) -> DataFrame:
    return _assert_schema(spark.read.parquet(path), ALIAS_SCHEMA, path)


def read_testdata_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Driver testdata table (TESTDATA.md): one parquet per table."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def write_snapshot(
    df: DataFrame, path: str, partition_by: list[str] | None = None, sort_by: list[str] | None = None
) -> None:
    """Plain snapshot write; sort-within-partitions gives parquet min/max
    stats real pruning power (the zone-map analog of the reference's
    btree/ivfflat indexes, SURVEY §4.2)."""
    if sort_by:
        df = df.sortWithinPartitions(*[F.col(c) for c in sort_by])
    writer = df.write.mode("errorifexists")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
