"""Library text functions vs the SQL suite twins: same semantics, Column API."""

import pytest
from pyspark.sql import functions as F

from chatvector_ai_spark.functions.text import (
    doc_fingerprint,
    lang_id,
    lsh_bands,
    minhash_signature,
    quality_score,
    simhash16,
    token_counts,
    token_jaccard,
)
from chatvector_ai_spark.suite import SPARK_SQL, register_views

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    register_views(spark, SF)
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_simhash_matches_suite_sql(spark, docs):
    lib = {r["doc_id"]: r["sh"] for r in docs.select("doc_id", simhash16("text").alias("sh")).collect()}
    sql = {r["doc_id"]: r["simhash"] for r in spark.sql(SPARK_SQL["dd_simhash"]).collect()}
    assert lib == sql


def test_lang_id_matches_suite_sql(spark, docs):
    lib = {r["doc_id"]: r["lg"] for r in docs.select("doc_id", lang_id("text").alias("lg")).collect()}
    sql = {r["doc_id"]: r["pred_lang"] for r in spark.sql(SPARK_SQL["tx_lang_id"]).collect()}
    assert lib == sql


def test_quality_matches_suite_sql(spark, docs):
    lib = {r["doc_id"]: r["q"] for r in docs.select("doc_id", quality_score("text").alias("q")).collect()}
    sql = {r["doc_id"]: r["quality"] for r in spark.sql(SPARK_SQL["tx_quality_score"]).collect()}
    assert lib == sql


def test_token_counts_match_suite_sql(spark, docs):
    lib = {
        r["doc_id"]: (r["tc"]["ws_tokens"], r["tc"]["bpe_tokens"])
        for r in docs.select("doc_id", token_counts("text").alias("tc")).collect()
    }
    sql = {
        r["doc_id"]: (r["ws_tokens"], r["bpe_tokens"])
        for r in spark.sql(SPARK_SQL["tx_token_count"]).collect()
    }
    assert lib == sql


def test_fingerprint_matches_suite_sql(spark, docs):
    lib = {r["doc_id"]: r["fp"] for r in docs.select("doc_id", doc_fingerprint("text").alias("fp")).collect()}
    sql = {r["doc_id"]: r["fingerprint"] for r in spark.sql(SPARK_SQL["tx_fingerprint"]).collect()}
    for k, v in sql.items():
        assert lib[k] == v


def test_minhash_bands_and_jaccard(spark, docs):
    import hashlib
    import re

    sig = docs.select("doc_id", "text", minhash_signature("text").alias("sig"))
    rows = sig.withColumn("bands", lsh_bands("sig")).collect()
    assert all(len(r["sig"]) == 8 and len(r["bands"]) == 2 for r in rows)
    # value check vs a direct python recomputation of the affine family
    from chatvector_ai_spark.functions.text import MINHASH_P, minhash_ab

    for r in rows[:5]:
        toks = list(dict.fromkeys(re.findall(r"[a-z0-9]+", r["text"].lower())))
        xs = [int(hashlib.md5(t.encode()).hexdigest()[:7], 16) for t in toks]
        for i in range(8):
            a, b = minhash_ab(i)
            expect = min((a * x + b) % MINHASH_P for x in xs)
            assert r["sig"][i] == expect, (r["doc_id"], i)
    # identical docs share all bands; jaccard of a doc with itself is 1.0
    pair = docs.alias("a").join(docs.alias("b"), F.col("a.doc_id") == F.col("b.doc_id"))
    jac = pair.select(token_jaccard(F.col("a.text"), F.col("b.text")).alias("j")).collect()
    assert all(abs(r["j"] - 1.0) < 1e-9 for r in jac)


def test_minhash_family_invariants(spark):
    """The affine-family signature is a pure function of the token SET:
    invariant under token order and multiplicity, sensitive to content —
    and the family constants are odd/ranged as documented (A_i odd < 2^31,
    so A_i*x < 2^59 never overflows int64 in any engine)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from chatvector_ai_spark.functions.text import MINHASH_P, minhash_ab

    for i in range(16):
        a, b = minhash_ab(i)
        assert a % 2 == 1 and 1 <= a < (1 << 31) and 0 <= b < (1 << 31)
        assert a * ((1 << 28) - 1) + b < (1 << 63)  # int64-safe
    assert len({minhash_ab(i) for i in range(16)}) == 16  # distinct functions

    import hashlib

    def sig(tokens: list[str]) -> tuple:
        xs = [int(hashlib.md5(t.encode()).hexdigest()[:7], 16) for t in tokens]
        out = []
        for i in range(8):
            a, b = minhash_ab(i)
            out.append(min((a * x + b) % MINHASH_P for x in xs))
        return tuple(out)

    token = st.text(alphabet="abc012", min_size=1, max_size=6)

    @given(st.lists(token, min_size=1, max_size=20), st.randoms())
    @settings(max_examples=50, deadline=None)
    def check(tokens, rnd):
        base = sorted(set(tokens))
        shuffled = list(base)
        rnd.shuffle(shuffled)
        duplicated = shuffled + shuffled[: len(shuffled) // 2 + 1]
        assert sig(base) == sig(shuffled) == sig(list(dict.fromkeys(duplicated)))

    check()

    # Spark agrees with the python replica on a set-vs-permuted-multiset doc
    rows = (
        spark.createDataFrame(
            [("d1", "alpha beta gamma"), ("d2", "gamma beta alpha alpha beta")],
            "doc_id string, text string",
        )
        .select("doc_id", minhash_signature("text").alias("sig"))
        .collect()
    )
    got = {r["doc_id"]: tuple(r["sig"]) for r in rows}
    assert got["d1"] == got["d2"] == sig(["alpha", "beta", "gamma"])
