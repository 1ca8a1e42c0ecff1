"""chatvector_ai_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the query/data-processing capabilities of the
``chatvector-ai/chatvector-ai`` reference (a FastAPI RAG backend) as an
idiomatic Spark pipeline: read an Iceberg-style table of interleaved
text+media documents, clean/chunk text spans with exact offset parity,
extract (subj, pred, obj) triples and hash embeddings inside Arrow-vectorized
pandas UDFs, entity-link against a broadcast alias dictionary, canonicalize
via iterative connected-components joins, and materialize nodes/edges tables
with per-partition lineage for checkpoint/resume.

Nothing here is a port: the reference's row-oriented Python/Postgres code
paths are re-designed around DataFrame + Catalyst + Arrow batches. Reference
file:line citations in docstrings identify the *semantics* being matched.
"""

__version__ = "0.1.0"
