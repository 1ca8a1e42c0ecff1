"""Two-cluster-size scaling evidence (BASELINE.json north rule).

A real multi-executor cluster is unavailable in this sandbox, so the N vs 4N
executor criterion is evidenced by running the IDENTICAL pipeline job at two
parallelism levels — local[8] and local[32] — on the same input, in separate
JVMs, and reporting throughput at both plus
``efficiency = (docs_per_sec[32] / docs_per_sec[8]) / 4``.

Writes BENCH/BASELINE.md. Usage:

    python tools/bench_scaling.py [n_docs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GEN = """
import sys
sys.path.insert(0, {repo!r})
from chatvector_ai_spark.datagen import documents_df
from chatvector_ai_spark.session import get_spark

n_docs, out = int(sys.argv[1]), sys.argv[2]
spark = get_spark(app_name="cvs-scale-gen", master="local[32]")
documents_df(spark, n_docs).write.mode("overwrite").parquet(out)
"""

CHILD = """
import json, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from chatvector_ai_spark.pipeline import flagship_query, run_pipeline
from chatvector_ai_spark.session import get_spark
from chatvector_ai_spark.warehouse import Warehouse

cpus, n_docs, docs_dir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
spark = get_spark(app_name=f"cvs-scale-{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=max(cpus, 8),
                  extra_conf={{"spark.driver.memory": "24g"}})
root = tempfile.mkdtemp(prefix=f"cvs_scale_{{cpus}}_")
try:
    t0 = time.time()
    run = run_pipeline(spark, Warehouse(root), docs_path=docs_dir, resume=False)
    flagship_query(spark, Warehouse(root), run.input_key).collect()
    elapsed = time.time() - t0
finally:
    shutil.rmtree(root, ignore_errors=True)
print(json.dumps({{"cpus": cpus, "n_docs": n_docs, "elapsed_sec": round(elapsed, 2),
                   "docs_per_sec": round(n_docs / elapsed, 2)}}))
"""


def run_level(cpus: int, n_docs: int, docs_dir: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=REPO), str(cpus), str(n_docs), docs_dir],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500000
    import tempfile, shutil

    docs_dir = os.path.join(tempfile.gettempdir(), f"cvs_scale_docs_{n_docs}")
    if not os.path.isdir(docs_dir):
        t0 = time.time()
        subprocess.run([sys.executable, "-c", GEN.format(repo=REPO), str(n_docs), docs_dir],
                       check=True, cwd=REPO, capture_output=True)
        print(f"generated {n_docs} docs in {time.time()-t0:.0f}s -> {docs_dir}", file=sys.stderr)
    repeats = int(os.environ.get("CVS_SCALE_REPEATS", "2"))
    results = {}
    # interleave levels and keep the best run per level — the sandbox host
    # has noisy co-tenants, and min-of-N is robust to background bursts
    for rep in range(repeats):
        for cpus in (8, 32):
            t0 = time.time()
            r = run_level(cpus, n_docs, docs_dir)
            print(f"rep{rep} local[{cpus}]: {r} (wall {time.time()-t0:.0f}s)", file=sys.stderr)
            if cpus not in results or r["elapsed_sec"] < results[cpus]["elapsed_sec"]:
                results[cpus] = r

    r8, r32 = results[8], results[32]
    eff = (r32["docs_per_sec"] / r8["docs_per_sec"]) / 4.0
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE — measured results

Job: full KG pipeline (synthesize {n_docs} interleaved docs → ingest/clean/
chunk/embed → triple extraction → entity linking → canonicalization →
materialize nodes+edges, every stage snapshot-committed) + flagship query.
Same input, same code, two parallelism levels, separate JVMs
(tools/bench_scaling.py). Sandbox stand-in for the N vs 4N executor
criterion of BASELINE.json.

| parallelism | elapsed (s) | docs/sec |
|---|---|---|
| local[8]  (N)  | {r8['elapsed_sec']} | {r8['docs_per_sec']} |
| local[32] (4N) | {r32['elapsed_sec']} | {r32['docs_per_sec']} |

**Scaling efficiency (N→4N) = (docs_per_sec[32] / docs_per_sec[8]) / 4 =
{eff:.3f}** (target ≥ 0.8 per BASELINE.json).

Spark confs: AQE on (skew-join + partition coalescing), Arrow batch
{os.environ.get('CVS_ARROW_BATCH', '2048')}, shuffle partitions = max(cpus, 8),
broadcast threshold 64 MB. Measured {time.strftime('%Y-%m-%d %H:%M:%S')}.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"n_docs": n_docs, "local8": r8, "local32": r32,
                      "scaling_efficiency": round(eff, 3)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
