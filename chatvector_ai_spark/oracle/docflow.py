"""Per-document flow shared by the Spark UDFs and the single-node oracle.

``ingest_doc`` and ``extract_doc`` are the *only* definition of the
ingest/extract semantics: the Spark operators invoke them inside Arrow
batches (one doc per element) and the parity tests invoke them directly, so
distributed-vs-oracle differences can only come from partitioning/ordering —
exactly what the per-row span-sequence test is meant to catch.

Semantics matched to the reference upload flow
(/root/reference/backend/services/ingestion_pipeline.py:961-1064):
extract → clean → chunk → index, with two deliberate re-designs for a
columnar engine (documented deviations, not accidents):

- cleaning + chunking run *per text span* instead of per concatenated
  document, so every span is independently processable and media spans
  interleave losslessly; the span's ``offset`` plays the role of the
  reference's PageBoundary page number (:594-608) and ``char_start`` is
  relative to the cleaned span text (the reference also chunks cleaned text,
  :738-750);
- ``chunk_index`` still enumerates across the whole document's text chunks
  (the reference enumerates all chunks of a doc, :621).
"""

from __future__ import annotations

from typing import Any

from chatvector_ai_spark.config import CHUNK_OVERLAP, CHUNK_SIZE
from chatvector_ai_spark.oracle.chunkers import chunk_text
from chatvector_ai_spark.oracle.svo import extract_triples
from chatvector_ai_spark.oracle.textnorm import normalize_text

CHUNK_ROW_DDL = (
    "doc_id string, seq int, span_idx int, span_offset int, kind string, "
    "media_ref string, chunk_index int, chunk_id string, chunk_text string, "
    "char_start int, char_end int, heading string, strategy string"
)

TRIPLE_ROW_DDL = (
    "doc_id string, chunk_id string, chunk_index int, span_idx int, "
    "span_offset int, subj string, pred string, obj string, "
    "subj_start int, subj_end int, obj_start int, obj_end int, conf float"
)


def ingest_doc(
    doc_id: str,
    spans: list[dict[str, Any]],
    strategy: str = "fixed",
    size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
) -> list[dict[str, Any]]:
    """One document's spans → ordered chunk/media rows.

    Media spans pass through untouched at their interleaved position; text
    spans are cleaned then chunked. ``seq`` is the document-order rank of the
    emitted row; the (kind, text, media_ref, offset)-order invariant of
    BASELINE.json is checked against exactly this function.
    """
    rows: list[dict[str, Any]] = []
    seq = 0
    chunk_counter = 0
    for span_idx, span in enumerate(sorted(spans, key=lambda s: s["offset"])):
        kind = span["kind"]
        if kind != "text":
            rows.append(
                {
                    "doc_id": doc_id,
                    "seq": seq,
                    "span_idx": span_idx,
                    "span_offset": int(span["offset"]),
                    "kind": kind,
                    "media_ref": span["media_ref"],
                    "chunk_index": None,
                    "chunk_id": None,
                    "chunk_text": "",
                    "char_start": None,
                    "char_end": None,
                    "heading": None,
                    "strategy": strategy,
                }
            )
            seq += 1
            continue
        cleaned = normalize_text(span["text"] or "")
        for chunk in chunk_text(cleaned, strategy=strategy, size=size, overlap=overlap):
            rows.append(
                {
                    "doc_id": doc_id,
                    "seq": seq,
                    "span_idx": span_idx,
                    "span_offset": int(span["offset"]),
                    "kind": "text",
                    "media_ref": "",
                    "chunk_index": chunk_counter,
                    "chunk_id": f"{doc_id}#{chunk_counter}",
                    "chunk_text": chunk.text,
                    "char_start": chunk.start,
                    "char_end": chunk.end,
                    "heading": chunk.heading,
                    "strategy": strategy,
                }
            )
            seq += 1
            chunk_counter += 1
    return rows


def extract_doc(chunk_rows: list[dict[str, Any]]) -> list[dict[str, Any]]:
    """Chunk rows (one doc or any batch) → triple rows.

    Offsets are relative to ``chunk_text`` (FIXTURES.md §5); media rows and
    empty chunks yield nothing. Row-level failures must never fail the stage
    (reference's per-row fallback, query_service.py:42-60): a malformed row
    is skipped here and quarantined by the caller.
    """
    out: list[dict[str, Any]] = []
    for row in chunk_rows:
        if row.get("kind") != "text" or not row.get("chunk_text"):
            continue
        for t in extract_triples(row["chunk_text"]):
            out.append(
                {
                    "doc_id": row["doc_id"],
                    "chunk_id": row["chunk_id"],
                    "chunk_index": row["chunk_index"],
                    "span_idx": row["span_idx"],
                    "span_offset": row["span_offset"],
                    "subj": t.subj,
                    "pred": t.pred,
                    "obj": t.obj,
                    "subj_start": t.subj_start,
                    "subj_end": t.subj_end,
                    "obj_start": t.obj_start,
                    "obj_end": t.obj_end,
                    "conf": t.conf,
                }
            )
    return out
