"""Dataflow operators: ingest, extract, link, canonicalize, retrieval, dedup."""
