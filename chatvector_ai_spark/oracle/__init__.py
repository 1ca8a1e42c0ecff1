"""Single-node Python oracle.

Pure functions (no Spark) that define the exact semantics every distributed
stage must reproduce. Tests compare the pipeline's output row-by-row against
these; the same functions are also invoked *inside* the Arrow-batched pandas
UDFs so the distributed path and the oracle cannot drift.

Semantics are matched to the reference implementation (file:line citations in
each module) but written from scratch for a columnar/batched call pattern.
"""

from chatvector_ai_spark.oracle.textnorm import normalize_text
from chatvector_ai_spark.oracle.chunkers import (
    Chunk,
    chunk_text,
    iter_blocks,
    sentence_spans,
)
from chatvector_ai_spark.oracle.hashembed import embed_text
from chatvector_ai_spark.oracle.svo import extract_triples, detect_mentions

__all__ = [
    "normalize_text",
    "Chunk",
    "chunk_text",
    "iter_blocks",
    "sentence_spans",
    "embed_text",
    "extract_triples",
    "detect_mentions",
]
