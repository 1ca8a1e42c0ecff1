"""Guard: the committed kg-oracle fixture parquet must match what the
single-node oracle computes NOW — catches a datagen / oracle semantic change
that wasn't followed by `python tools/make_kg_oracle_fixture.py`.

(Spark-vs-fixture parity is the driver's job and tools/check_oracle.py's;
this test needs no Spark session.)
"""

import os
import sys

import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from make_kg_oracle_fixture import FIXTURE_DIR, build_tables  # noqa: E402

from chatvector_ai_spark.suite import KG_N_DOCS  # noqa: E402


@pytest.fixture(scope="module")
def fresh_tables():
    return build_tables(KG_N_DOCS)


@pytest.mark.parametrize(
    "name",
    ["chunks_fixed", "chunks_paragraph", "chunks_semantic",
     "triples", "linked_mentions", "canonical_entities",
     "canonical_map", "edges", "nodes"],
)
def test_committed_fixture_is_fresh(fresh_tables, name):
    rows, schema = fresh_tables[name]
    path = os.path.join(FIXTURE_DIR, f"{name}.parquet")
    assert os.path.exists(path), f"missing fixture {path}; run tools/make_kg_oracle_fixture.py"
    committed = pq.read_table(path)
    assert committed.schema.equals(schema), f"{name}: schema drift"
    def norm(v):
        if v is None:
            return (1, "")
        if isinstance(v, float):
            return (0, round(v, 6))  # float32 storage round-trip
        return (0, v)

    fresh_rows = sorted(
        tuple(norm(r.get(f.name)) for f in schema) for r in rows
    )
    committed_rows = sorted(
        tuple(norm(v) for v in row)
        for row in zip(*(committed.column(f.name).to_pylist() for f in schema))
    )
    assert fresh_rows == committed_rows, (
        f"{name}: committed fixture is stale; rerun tools/make_kg_oracle_fixture.py"
    )
