"""Stage 1 — ingest: interleaved spans → ordered chunk/media rows.

The reference's upload worker (ingestion_pipeline.py:961-1064) runs
extract → clean → chunk per document on an asyncio pool; here the same
per-document flow (oracle.docflow.ingest_doc) runs inside ``mapInPandas`` —
a single narrow, shuffle-free stage whose parallelism is the input partition
count. One Arrow batch in, a variable number of chunk rows out (the UDTF
shape of the reference's 1-doc→N-chunks step).

Scale notes (100 TB): no shuffle, no driver collect; per-doc state never
leaves its partition; Python crossing is Arrow-batched both ways and bounded
by spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from chatvector_ai_spark.config import CHUNK_OVERLAP, CHUNK_SIZE
from chatvector_ai_spark.oracle.docflow import CHUNK_ROW_DDL, ingest_doc


def ingest_chunks(
    docs: DataFrame,
    strategy: str = "fixed",
    size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
    embed_dim: int | None = None,
) -> DataFrame:
    """documents(doc_id, spans[]) → chunks table (CHUNK_ROW_DDL schema).

    ``embed_dim`` fuses the embedding projection into the same Arrow batch
    (one JVM↔Python crossing instead of two — the flatten→embed→reslice
    batching idiom of the reference, chat_service.py:638-665); media rows
    get a null embedding.

    ``tenant_id`` (doc-level metadata, reference 005_api_keys.sql:27) rides
    along when the input carries it — attached here, in the only narrow
    stage where doc metadata is adjacent to its chunks, so no later
    doc-sized join is ever needed to tenant-scope a KG table.
    """
    has_tenant = "tenant_id" in docs.columns
    schema = CHUNK_ROW_DDL + ", tenant_id string"
    if embed_dim is not None:
        schema += ", embedding array<float>"

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        names = [c.split(" ")[0] for c in schema.split(", ")]
        for pdf in batches:
            rows: list[dict] = []
            tenants = pdf["tenant_id"] if has_tenant else [None] * len(pdf)
            for doc_id, spans, tenant in zip(pdf["doc_id"], pdf["spans"], tenants):
                doc_rows = ingest_doc(doc_id, list(spans), strategy=strategy, size=size, overlap=overlap)
                for r in doc_rows:
                    r["tenant_id"] = tenant
                rows.extend(doc_rows)
            out = pd.DataFrame(rows, columns=names)
            if embed_dim is not None and len(out):
                from chatvector_ai_spark.oracle.hashembed import embed_batch

                is_text = (out["kind"] == "text") & (out["chunk_text"] != "")
                emb = pd.Series([None] * len(out), dtype=object)
                texts = out.loc[is_text, "chunk_text"].tolist()
                if texts:
                    emb.loc[is_text] = list(embed_batch(texts, dim=embed_dim))
                out["embedding"] = emb
            yield out

    return docs.mapInPandas(process, schema=schema)
