"""Arrow-batched embedding projection.

Spark-native form of the reference's provider-batched embedding call
(embedding_service.py:16-41; providers batch 100/128 texts per request,
gemini.py:32, voyage.py:22): a scalar-iterator pandas UDF where the Arrow
batch IS the provider batch, so per-batch fixed costs amortize exactly like
the reference's flatten→embed→reslice idiom (chat_service.py:638-665).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, FloatType

from chatvector_ai_spark.config import EMBEDDING_DIM
from chatvector_ai_spark.oracle.hashembed import embed_batch


def make_embedding_udf(dim: int = EMBEDDING_DIM):
    """Deterministic hash-embedding UDF; pluggable point for real providers."""

    @pandas_udf(ArrayType(FloatType()))
    def embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for texts in batches:
            mat = embed_batch(texts.fillna("").astype(str).tolist(), dim=dim)
            yield pd.Series(list(mat))

    return embed


def with_embedding(df: DataFrame, text_col: str = "chunk_text", out_col: str = "embedding", dim: int = EMBEDDING_DIM) -> DataFrame:
    """Append an embedding column; non-text rows get null (no wasted compute).

    The conditional keeps media passthrough rows out of the Python worker.
    """
    udf = make_embedding_udf(dim)
    cond: Column = (F.col("kind") == "text") if "kind" in df.columns else F.lit(True)
    return df.withColumn(out_col, F.when(cond & F.col(text_col).isNotNull() & (F.col(text_col) != ""), udf(F.col(text_col))))
