"""Driver-contract self-checks for __spark_entry__."""

import duckdb
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_oracle_keys_subset_of_queries():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 30
    # every query — including kg_* via the committed oracle fixture — has
    # an oracle; the last rows-only holdout (kg_transe_step_loss) gained an
    # exact unrolled one-step twin, so the set difference must stay empty
    assert set(qs) - set(oracles) == set()


def test_all_spark_sql_parses(spark):
    from chatvector_ai_spark.suite import SPARK_SQL, register_views

    register_views(spark, SF)
    for name, sql in SPARK_SQL.items():
        spark.sql(sql).schema  # analysis only — no execution


def test_all_duck_sql_parses():
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    for name, sql in entrymod.oracle_sql().items():
        con.sql(f"SELECT * FROM ({sql}) LIMIT 0")


def test_entry_returns_stable_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert 0 < len(rows) <= 10
    assert df.columns == ["doc_id", "rrf_score", "vector_rank", "keyword_rank"]
    again = entrymod.entry(spark).collect()
    assert rows == again
