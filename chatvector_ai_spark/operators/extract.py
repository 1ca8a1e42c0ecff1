"""Stage 2 — extraction: chunk text → (subj, pred, obj) triple rows.

The reference's LLM extension point (providers/base.py:124-172) becomes a
deterministic rule-based extractor (oracle.svo) running inside mapInPandas.
Like stage 1 this is narrow and shuffle-free.

Embedding policy: triples normally carry NO vector column. With
``embed_if_surface_in`` (the small set of lowercased ambiguous dictionary
aliases — the only surfaces whose linking decision the embedding term can
change), the UDF *recomputes* the chunk embedding for just those rows from
``chunk_text`` (hash embeddings are pure functions of the text, so the
value is identical to the chunks table's) — the dense embedding column
never crosses Arrow into this stage at all.

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

from chatvector_ai_spark.config import EMBEDDING_DIM
from chatvector_ai_spark.oracle.docflow import TRIPLE_ROW_DDL
from chatvector_ai_spark.oracle.svo import extract_triples

QUARANTINE_DDL = "doc_id string, chunk_id string, stage string, error_code string, message string"

_SRC_COLS = ["doc_id", "chunk_id", "chunk_index", "span_idx", "span_offset", "kind", "chunk_text"]
_TENANT_COL = "tenant_id"


def extract_triples_df(
    chunks: DataFrame,
    keep_embedding: bool = True,
    embed_if_surface_in: set[str] | None = None,
    embed_dim: int = EMBEDDING_DIM,
) -> DataFrame:
    """chunks → raw triples (+ sparse/dense chunk embedding, + _error marker).

    Filter ``_error IS NULL`` for good rows; ``quarantine_df`` projects the
    failures. The text-only filter is pushed before the Python stage so
    media rows never cross into the worker.

    - ``keep_embedding=True`` and chunks carry one: dense pass-through
      (legacy path — Arrow-transfers the vector column).
    - ``embed_if_surface_in={...}``: sparse recompute (preferred; see
      module docstring). Overrides the dense path.
    - neither: no embedding column in the output.
    """
    sparse = embed_if_surface_in is not None
    dense = keep_embedding and not sparse and "embedding" in chunks.columns
    if _TENANT_COL not in chunks.columns:
        chunks = chunks.withColumn(_TENANT_COL, F.lit(None).cast("string"))
    src_cols = _SRC_COLS + [_TENANT_COL] + (["embedding"] if dense else [])
    narrowed = chunks.where((F.col("kind") == "text") & (F.col("chunk_text") != "")).select(*src_cols)

    has_emb_out = sparse or dense
    out_ddl = (
        TRIPLE_ROW_DDL
        + ", tenant_id string"
        + (", embedding array<float>" if has_emb_out else "")
        + ", _error string"
    )
    names = [c.split(" ")[0] for c in out_ddl.split(", ")]

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from chatvector_ai_spark.oracle.hashembed import embed_batch

        for pdf in batches:
            rows: list[dict] = []
            emb_texts: list[str] = []
            emb_slots: list[int] = []
            dense_embs = pdf["embedding"].tolist() if dense else None
            tenants = pdf[_TENANT_COL].tolist()
            cols = [pdf[c].tolist() for c in _SRC_COLS]
            for i, (doc_id, chunk_id, chunk_index, span_idx, span_offset, _kind, chunk_text) in enumerate(
                zip(*cols)
            ):
                try:
                    for t in extract_triples(chunk_text):
                        row = {
                            "doc_id": doc_id,
                            "chunk_id": chunk_id,
                            "chunk_index": chunk_index,
                            "span_idx": span_idx,
                            "span_offset": span_offset,
                            "tenant_id": tenants[i],
                            "subj": t.subj,
                            "pred": t.pred,
                            "obj": t.obj,
                            "subj_start": t.subj_start,
                            "subj_end": t.subj_end,
                            "obj_start": t.obj_start,
                            "obj_end": t.obj_end,
                            "conf": t.conf,
                            "_error": None,
                        }
                        if dense:
                            row["embedding"] = dense_embs[i]
                        elif sparse:
                            row["embedding"] = None
                            if (
                                t.subj.lower() in embed_if_surface_in
                                or t.obj.lower() in embed_if_surface_in
                            ):
                                emb_slots.append(len(rows))
                                emb_texts.append(chunk_text)
                        rows.append(row)
                except Exception as exc:  # quarantine, never fail the stage
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "chunk_id": chunk_id,
                            "chunk_index": None,
                            "span_idx": None,
                            "span_offset": None,
                            "tenant_id": tenants[i],
                            "subj": None,
                            "pred": None,
                            "obj": None,
                            "subj_start": None,
                            "subj_end": None,
                            "obj_start": None,
                            "obj_end": None,
                            "conf": None,
                            "embedding": None,  # dropped unless has_emb_out
                            "_error": f"{type(exc).__name__}: {exc}",
                        }
                    )
            if sparse and emb_texts:
                mat = embed_batch(emb_texts, dim=embed_dim)
                for slot, vec in zip(emb_slots, mat):
                    rows[slot]["embedding"] = list(vec)
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
