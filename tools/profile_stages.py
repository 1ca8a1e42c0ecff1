"""Per-stage wall-time profile of the KG pipeline at one parallelism level.

Run in a fresh JVM per level (like tools/bench_scaling.py):

    python tools/profile_stages.py <cpus> <n_docs> <docs_dir>

Prints one JSON line with stage_secs so two levels can be diffed to locate
the serial floor that caps N->4N scaling.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chatvector_ai_spark.pipeline import flagship_query, run_pipeline  # noqa: E402
from chatvector_ai_spark.session import get_spark  # noqa: E402
from chatvector_ai_spark.warehouse import Warehouse  # noqa: E402


def main() -> int:
    cpus, n_docs, docs_dir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    spark = get_spark(
        app_name=f"cvs-profile-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        extra_conf={"spark.driver.memory": "24g"},
    )
    n_input_splits = spark.read.parquet(docs_dir).rdd.getNumPartitions()
    root = tempfile.mkdtemp(prefix=f"cvs_prof_{cpus}_", dir="/dev/shm")
    try:
        t0 = time.time()
        run = run_pipeline(spark, Warehouse(root), docs_path=docs_dir, resume=False)
        t_pipe = time.time() - t0
        t1 = time.time()
        flagship_query(spark, Warehouse(root), run.input_key).collect()
        t_flag = time.time() - t1
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({
        "cpus": cpus, "n_docs": n_docs, "input_splits": n_input_splits,
        "elapsed_sec": round(t_pipe + t_flag, 2),
        "docs_per_sec": round(n_docs / (t_pipe + t_flag), 2),
        "flagship_sec": round(t_flag, 2),
        "stage_secs": run.stage_secs,
        "accounted": round(sum(run.stage_secs.values()), 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
