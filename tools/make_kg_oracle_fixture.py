"""Materialize the single-node KG oracle's outputs to committed parquet.

The driver's correctness gate runs each suite query on Spark AND its DuckDB
oracle SQL; for the `kg_*` queries the oracle SQL selects from the parquet
this script writes (fixtures/kg_oracle/), which is produced WITHOUT Spark:
pure-Python datagen → oracle ingest/extract (oracle/docflow.py) → oracle
link + union-find canonicalization (oracle/kglink.py). Regenerate after any
semantic change to datagen or the oracle modules:

    python tools/make_kg_oracle_fixture.py

tests/test_kg_oracle_fixture.py fails if the committed parquet is stale.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chatvector_ai_spark import datagen as dg  # noqa: E402
from chatvector_ai_spark.oracle.docflow import extract_doc, ingest_doc  # noqa: E402
from chatvector_ai_spark.oracle.kglink import (  # noqa: E402
    canonical_entities_oracle,
    canonical_map_oracle,
    edges_oracle,
    link_mentions_oracle,
    nodes_oracle,
)

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures", "kg_oracle"
)

CHUNK_COLS = [
    "doc_id", "seq", "span_idx", "span_offset", "kind", "media_ref",
    "chunk_index", "chunk_id", "char_start", "char_end", "heading",
    "tenant_id",
]
CHUNK_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()), ("seq", pa.int32()), ("span_idx", pa.int32()),
        ("span_offset", pa.int32()), ("kind", pa.string()), ("media_ref", pa.string()),
        ("chunk_index", pa.int32()), ("chunk_id", pa.string()),
        ("char_start", pa.int32()), ("char_end", pa.int32()), ("heading", pa.string()),
        ("tenant_id", pa.string()),
    ]
)
TRIPLE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()), ("chunk_id", pa.string()), ("chunk_index", pa.int32()),
        ("span_idx", pa.int32()), ("span_offset", pa.int32()),
        ("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string()),
        ("subj_start", pa.int32()), ("subj_end", pa.int32()),
        ("obj_start", pa.int32()), ("obj_end", pa.int32()), ("conf", pa.float32()),
        ("tenant_id", pa.string()),
    ]
)
LINKED_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()), ("chunk_id", pa.string()), ("role", pa.string()),
        ("surface", pa.string()), ("m_start", pa.int32()), ("m_end", pa.int32()),
        ("entity_id", pa.string()), ("canonical", pa.string()), ("linked", pa.bool_()),
        ("tenant_id", pa.string()),
    ]
)
CANON_SCHEMA = pa.schema(
    [
        ("canonical_entity", pa.string()),
        ("n_mentions", pa.int64()),
        ("n_docs", pa.int64()),
    ]
)
CMAP_SCHEMA = pa.schema(
    [("entity_id", pa.string()), ("canonical_entity", pa.string())]
)
NODE_SCHEMA = pa.schema(
    [
        ("canonical_entity", pa.string()),
        ("n_mentions", pa.int64()),
        ("n_docs", pa.int64()),
        ("label", pa.string()),
    ]
)
EDGE_SCHEMA = pa.schema(
    [
        ("src", pa.string()), ("rel", pa.string()), ("dst", pa.string()),
        ("doc_id", pa.string()), ("tenant_id", pa.string()),
        ("chunk_id", pa.string()), ("conf", pa.float32()),
        ("src_surface", pa.string()), ("dst_surface", pa.string()),
    ]
)


def oracle_chunk_rows(n_docs: int, strategy: str) -> list[dict]:
    rows: list[dict] = []
    for i in range(n_docs):
        doc = dg.doc_row(i)
        doc_rows = ingest_doc(doc["doc_id"], doc["spans"], strategy=strategy)
        for r in doc_rows:
            r["tenant_id"] = doc["tenant_id"]
        rows.extend(doc_rows)
    return rows


def oracle_triple_rows(chunk_rows: list[dict]) -> list[dict]:
    tenant_by_chunk = {r["chunk_id"]: r["tenant_id"] for r in chunk_rows}
    triples = extract_doc(chunk_rows)
    for t in triples:
        t["tenant_id"] = tenant_by_chunk[t["chunk_id"]]
    return triples


def mention_rows_from_triples(triples: list[dict]) -> list[dict]:
    """The subject+object explosion of operators/link.mentions_from_triples,
    restricted to the columns the linker's projected output needs."""
    out: list[dict] = []
    for t in triples:
        for role, s, e0, e1 in (
            ("subj", t["subj"], t["subj_start"], t["subj_end"]),
            ("obj", t["obj"], t["obj_start"], t["obj_end"]),
        ):
            out.append(
                {
                    "doc_id": t["doc_id"],
                    "chunk_id": t["chunk_id"],
                    "role": role,
                    "surface": s,
                    "m_start": e0,
                    "m_end": e1,
                    "tenant_id": t["tenant_id"],
                }
            )
    return out


def build_tables(n_docs: int) -> dict[str, tuple[list[dict], pa.Schema]]:
    aliases = dg.alias_rows()
    tables: dict[str, tuple[list[dict], pa.Schema]] = {}
    for strategy in ("fixed", "paragraph", "semantic"):
        chunks = oracle_chunk_rows(n_docs, strategy)
        tables[f"chunks_{strategy}"] = (
            [{c: r[c] for c in CHUNK_COLS} for r in chunks],
            CHUNK_SCHEMA,
        )
        if strategy == "fixed":
            triples = oracle_triple_rows(chunks)
            tables["triples"] = (triples, TRIPLE_SCHEMA)
            linked = link_mentions_oracle(mention_rows_from_triples(triples), aliases)
            tables["linked_mentions"] = (linked, LINKED_SCHEMA)
            tables["canonical_entities"] = (
                canonical_entities_oracle(linked, aliases),
                CANON_SCHEMA,
            )
            cmap = canonical_map_oracle(linked, aliases)
            tables["canonical_map"] = (
                [
                    {"entity_id": e, "canonical_entity": c}
                    for e, c in sorted(cmap.items())
                ],
                CMAP_SCHEMA,
            )
            tables["edges"] = (edges_oracle(triples, linked, aliases), EDGE_SCHEMA)
            tables["nodes"] = (nodes_oracle(linked, aliases), NODE_SCHEMA)
    return tables


def main() -> None:
    from chatvector_ai_spark.suite import KG_N_DOCS

    os.makedirs(FIXTURE_DIR, exist_ok=True)
    for name, (rows, schema) in build_tables(KG_N_DOCS).items():
        table = pa.Table.from_pylist(rows, schema=schema)
        path = os.path.join(FIXTURE_DIR, f"{name}.parquet")
        pq.write_table(table, path, compression="zstd")
        print(f"wrote {path}: {table.num_rows} rows")


if __name__ == "__main__":
    main()
