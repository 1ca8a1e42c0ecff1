"""Stage 2 — extraction: chunk text → (subj, pred, obj) triple rows.

The reference's LLM extension point (providers/base.py:124-172) becomes a
deterministic rule-based extractor (oracle.svo) running inside mapInPandas.
Like stage 1 this is narrow and shuffle-free; the embedding column (if
present) rides along so linking never needs a chunk_id join.

Row-level failure semantics mirror the reference's per-row fallback
(query_service.py:42-60) and DLQ-without-payload contract
(queue_base.py:38-54): a chunk whose extraction raises is emitted to the
quarantine output instead of failing the stage.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chatvector_ai_spark.oracle.docflow import TRIPLE_ROW_DDL, extract_doc

QUARANTINE_DDL = "doc_id string, chunk_id string, stage string, error_code string, message string"

def extract_triples_df(chunks: DataFrame, keep_embedding: bool = True) -> DataFrame:
    """chunks → raw triples (+ chunk embedding if kept, + _error marker).

    Filter ``_error IS NULL`` for good rows; ``quarantine_df`` projects the
    failures. The text-only filter is pushed before the Python stage so media
    rows never cross into the worker. ``keep_embedding=False`` omits the
    embedding column entirely — at scale the vector column should not ride
    through the triple tables (link.py fetches embeddings only for the
    ambiguous sliver instead).
    """
    has_emb = keep_embedding and "embedding" in chunks.columns
    src_cols = ["doc_id", "chunk_id", "chunk_index", "span_idx", "span_offset", "kind", "chunk_text"]
    if has_emb:
        src_cols.append("embedding")
    narrowed = chunks.where((F.col("kind") == "text") & (F.col("chunk_text") != "")).select(*src_cols)

    out_ddl = TRIPLE_ROW_DDL + (", embedding array<float>" if has_emb else "") + ", _error string"
    names = [c.split(" ")[0] for c in out_ddl.split(", ")]

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            records = pdf.to_dict("records")
            for rec in records:
                try:
                    for trip in extract_doc([rec]):
                        if has_emb:
                            trip["embedding"] = rec.get("embedding")
                        trip["_error"] = None
                        rows.append(trip)
                except Exception as exc:  # quarantine, never fail the stage
                    rows.append(
                        {
                            "doc_id": rec.get("doc_id"),
                            "chunk_id": rec.get("chunk_id"),
                            "chunk_index": None,
                            "span_idx": None,
                            "span_offset": None,
                            "subj": None,
                            "pred": None,
                            "obj": None,
                            "subj_start": None,
                            "subj_end": None,
                            "obj_start": None,
                            "obj_end": None,
                            "conf": None,
                            "_error": f"{type(exc).__name__}: {exc}",
                        }
                    )
            yield pd.DataFrame(rows, columns=names)

    return narrowed.mapInPandas(process, schema=out_ddl)


def good_triples(raw: DataFrame) -> DataFrame:
    return raw.where(F.col("_error").isNull()).drop("_error")


def quarantine_df(raw: DataFrame) -> DataFrame:
    """DLQ analog: lightweight failure records, no payload bytes."""
    return (
        raw.where(F.col("_error").isNotNull())
        .select(
            "doc_id",
            "chunk_id",
            F.lit("extract").alias("stage"),
            F.lit("EXTRACT_ERROR").alias("error_code"),
            F.col("_error").alias("message"),
        )
    )
