"""Benchmark: KG pipeline throughput + headline operator queries.

Driver contract: run at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1)
on ``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line::

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., ...}

The KG pipeline segment synthesizes ``CVS_BENCH_DOCS`` interleaved documents
(default 20000 ≈ the sf0.1 design point) into a fresh warehouse and reports
docs/sec — the BASELINE.json throughput metric.

Measurement discipline: ``CVS_BENCH_REPEATS`` (default 3) INTERLEAVED
repeats — every repeat runs the pipeline then each headline query, and the
reported number per segment is the MIN across repeats (the same discipline
as tools/bench_scaling.py). This co-tenant host swings identical runs by
2-4× (documented in BENCH/BASELINE.md), so a single-pass wall-clock carries
no round-over-round signal; min-of-N interleaved does. Scaling-efficiency
evidence (same job at local[8] vs local[32]) is produced by
tools/bench_scaling.py and recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "j1_provenance_join",
    "a3_rrf_fusion",
    "t1_topk_per_group",
    "w1_cosine_topk",
    "ann_ivf_topk",
    "ann_ivf_rerank",
    "dd_minhash_lsh",
    "dd_simhash",
    "tx_fingerprint",
    "tx_quality_score",
    "u4_last_wins_merge",
    "w2_bm25_topk",
    "ev_asof_join",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("CVS_BENCH_DOCS", "20000"))
    repeats = int(os.environ.get("CVS_BENCH_REPEATS", "3"))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1"

    from chatvector_ai_spark.datagen import documents_df
    from chatvector_ai_spark.pipeline import flagship_query, run_pipeline
    from chatvector_ai_spark.session import get_spark
    from chatvector_ai_spark.suite import all_queries
    from chatvector_ai_spark.warehouse import Warehouse

    spark = get_spark(app_name="cvs-bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    queries = all_queries()

    # input prep, not pipeline work: the pre-materialized interleaved-
    # documents table every repeat's pipeline reads (the production shape)
    docs_dir = tempfile.mkdtemp(prefix="cvs_bench_docs_")
    documents_df(spark, n_docs).write.mode("overwrite").parquet(docs_dir)

    best: dict[str, float] = {}
    try:
        for rep in range(repeats):
            # 1) KG pipeline: ingest → extract → link → canonicalize →
            #    materialize, all stages snapshot-committed, fresh warehouse
            wh_root = tempfile.mkdtemp(prefix="cvs_bench_wh_")
            try:
                t0 = time.time()
                run = run_pipeline(
                    spark, Warehouse(wh_root), docs_path=docs_dir, resume=False
                )
                flagship_query(spark, Warehouse(wh_root), run.input_key).collect()
                sec = time.time() - t0
                if "kg_pipeline" not in best or sec < best["kg_pipeline"]:
                    best["kg_pipeline"] = sec

                # 1b) graph analytics over THIS run's edge table — the
                # pipeline-output-scale graph, not the tiny fixture graph
                from chatvector_ai_spark.operators.graph import (
                    connected_components, pagerank,
                )
                from chatvector_ai_spark.operators.kgtrain import (
                    transe_margin_loss,
                )

                edges = Warehouse(wh_root).read(spark, "edges", run.input_key)
                for gname, fn in (
                    ("kg_pagerank_full", lambda e=edges: pagerank(e).collect()),
                    ("kg_components_full",
                     lambda e=edges: connected_components(e).collect()),
                    # KGE training throughput: sample negatives + score the
                    # margin loss over the full pipeline-output edge table.
                    # dim=8 / n_neg=1 keeps the probe ~4x lighter than the
                    # suite's dim=16/n_neg=2 (the md5-per-element inline
                    # embedding is the dominant, linearly-scaling cost) so
                    # the headline total stays comparable across rounds
                    ("kg_transe_loss_full",
                     lambda e=edges: transe_margin_loss(
                         e, dim=8, n_neg=1).collect()),
                ):
                    t0 = time.time()
                    fn()
                    gsec = time.time() - t0
                    if gname not in best or gsec < best[gname]:
                        best[gname] = gsec
            finally:
                shutil.rmtree(wh_root, ignore_errors=True)

            # 2) headline operator queries on the sf-dir tables
            for name in HEADLINE:
                t0 = time.time()
                queries[name](spark, sf_dir).collect()
                sec = time.time() - t0
                if name not in best or sec < best[name]:
                    best[name] = sec
            print(f"rep {rep}: done", file=sys.stderr)
    finally:
        shutil.rmtree(docs_dir, ignore_errors=True)

    timings = {k: round(v, 3) for k, v in best.items()}
    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "kg_pipeline+headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "kg_docs": n_docs,
        "kg_docs_per_sec": round(n_docs / best["kg_pipeline"], 2),
        "cpus": cpus,
        "repeats": repeats,
        "discipline": "interleaved min-of-N",
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
