"""Two-cluster-size scaling evidence (BASELINE.json north rule).

A real multi-executor cluster is unavailable in this sandbox, so the N vs
4N executor criterion is evidenced by running the IDENTICAL pipeline job at
two parallelism levels on the same input, in separate JVMs, and reporting
throughput at both plus ``efficiency = (dps_4N / dps_N) / 4``.

The sandbox host is a virtualized 32-vCPU box whose own parallel-CPU
scaling is sub-linear at high core counts (co-tenancy/steal): a pure
multiprocessing sha256 microbenchmark is run first as the HARDWARE
CALIBRATION, so each measured pipeline efficiency is reported alongside
the ceiling the hardware itself can express for that pair. The headline
pair is local[2] vs local[8], which lies in the host's linear region;
local[8] vs local[32] is reported too with its measured hardware ceiling.

Writes BENCH/BASELINE.md. Usage:

    python tools/bench_scaling.py [n_docs] [n_docs_big]
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import os
import shutil
import subprocess
import sys
import tempfile
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
root = tempfile.mkdtemp(prefix=f"cvs_scale_{{cpus}}_", dir="/dev/shm")
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


def _hash_work(n: int) -> None:
    for i in range(n):
        hashlib.sha256(f"abc{i}".encode()).digest()


def hardware_calibration(levels=(2, 8, 32), n=4_000_000, reps=3) -> dict[int, float]:
    """Pure-CPU multiprocessing throughput (M hashes/s) per level, best-of-reps."""
    out: dict[int, float] = {}
    for procs in levels:
        best = None
        for _ in range(reps):
            t0 = time.time()
            with mp.Pool(procs) as p:
                p.map(_hash_work, [n // procs] * procs)
            el = time.time() - t0
            best = el if best is None else min(best, el)
        out[procs] = round(n / best / 1e6, 2)
    return out


def gen_docs(n_docs: int) -> str:
    docs_dir = os.path.join(tempfile.gettempdir(), f"cvs_scale_docs_{n_docs}")
    if not os.path.isdir(docs_dir):
        subprocess.run([sys.executable, "-c", GEN.format(repo=REPO), str(n_docs), docs_dir],
                       check=True, cwd=REPO, capture_output=True)
    return docs_dir


def run_level(cpus: int, n_docs: int, docs_dir: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=REPO), str(cpus), str(n_docs), docs_dir],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def measure_pair(n_cpus: int, n4_cpus: int, n_docs: int, repeats: int) -> dict:
    docs_dir = gen_docs(n_docs)
    best: dict[int, dict] = {}
    # interleaved repeats, min per level — robust to co-tenant bursts
    for rep in range(repeats):
        for cpus in (n_cpus, n4_cpus):
            r = run_level(cpus, n_docs, docs_dir)
            print(f"rep{rep} local[{cpus}] n={n_docs}: {r}", file=sys.stderr)
            if cpus not in best or r["elapsed_sec"] < best[cpus]["elapsed_sec"]:
                best[cpus] = r
    eff = (best[n4_cpus]["docs_per_sec"] / best[n_cpus]["docs_per_sec"]) / 4.0
    return {"pair": f"local[{n_cpus}]->local[{n4_cpus}]", "n_docs": n_docs,
            "N": best[n_cpus], "N4": best[n4_cpus], "efficiency": round(eff, 3)}


def main() -> int:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 300000
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 1000000
    repeats = int(os.environ.get("CVS_SCALE_REPEATS", "2"))

    calib = hardware_calibration()
    hw28 = round((calib[8] / calib[2]) / 4, 3)
    hw832 = round((calib[32] / calib[8]) / 4, 3)
    print(f"hardware calibration (M sha256/s): {calib}; ceilings 2->8={hw28} 8->32={hw832}",
          file=sys.stderr)

    pair28 = measure_pair(2, 8, n_small, repeats)
    pair832 = measure_pair(8, 32, n_big, repeats)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE — measured results

Job: full KG pipeline over a pre-materialized interleaved-documents table
(ingest/clean/chunk/embed → triple extraction → entity linking →
canonicalization → materialize nodes+edges + flagship query; every stage
snapshot-committed). Identical job, identical input, two parallelism
levels, separate JVMs, interleaved min-of-{repeats} repeats
(tools/bench_scaling.py) — the sandbox stand-in for the N vs 4N executor
criterion of BASELINE.json.

## Hardware calibration (what this host can express)

Pure-CPU multiprocessing sha256 (no Spark, no I/O), best of 3:

| procs | M hashes/s |
|---|---|
| 2 | {calib[2]} |
| 8 | {calib[8]} |
| 32 | {calib[32]} |

→ the virtualized host's own 4×-parallelism ceiling is **{hw28}** for
2→8 cores and **{hw832}** for 8→32 cores (co-tenant/steal sublinearity).
Pipeline efficiencies must be read against these ceilings: the 2→8 pair is
the one where the host can actually express 4× parallelism.

## Pipeline scaling — headline pair local[2] → local[8] (N → 4N), {pair28['n_docs']} docs

| parallelism | elapsed (s) | docs/sec |
|---|---|---|
| local[2]  (N)  | {pair28['N']['elapsed_sec']} | {pair28['N']['docs_per_sec']} |
| local[8] (4N) | {pair28['N4']['elapsed_sec']} | {pair28['N4']['docs_per_sec']} |

**Scaling efficiency = {pair28['efficiency']}** (target ≥ 0.8; hardware
ceiling for this pair {hw28}).

## Pipeline scaling — local[8] → local[32], {pair832['n_docs']} docs

| parallelism | elapsed (s) | docs/sec |
|---|---|---|
| local[8]  | {pair832['N']['elapsed_sec']} | {pair832['N']['docs_per_sec']} |
| local[32] | {pair832['N4']['elapsed_sec']} | {pair832['N4']['docs_per_sec']} |

**Scaling efficiency = {pair832['efficiency']}** (hardware ceiling for this
pair is {hw832} — the pipeline reaches
{round(pair832['efficiency']/hw832, 2) if hw832 else 'n/a'} of what the
host itself can deliver at 8→32).

Spark confs: AQE on (skew-join + partition coalescing), Arrow batch
{os.environ.get('CVS_ARROW_BATCH', '8192')}, shuffle partitions =
max(cpus, 8), broadcast threshold 64 MB, shuffle dirs on tmpfs.
Measured {time.strftime('%Y-%m-%d %H:%M:%S')}.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"calibration_M_hashes_per_s": calib,
                      "hw_ceiling_2_8": hw28, "hw_ceiling_8_32": hw832,
                      "pair_2_8": pair28, "pair_8_32": pair832}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
