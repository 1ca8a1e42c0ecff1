"""Snapshot + lineage store: atomic, resumable stage commits.

Iceberg stand-in per SURVEY.md §7.0 (the sandbox has no Iceberg jars): the
same snapshot/lineage protocol implemented as atomic manifest-file commits
over parquet directories, behind a thin class so an Iceberg catalog can
replace it without touching the pipeline.

Protocol (mirrors the reference's migration-ledger contract,
/root/reference/backend/db/sqlalchemy_service.py:104-208, and its startup
stale-sweep, /root/reference/backend/main.py:133-155):

- data for table T goes to ``root/T/snap-<uuid>/`` (plain Spark parquet
  write — durable before the commit step);
- the commit is a single ``os.replace`` of ``root/_manifest/T.json`` — POSIX
  rename atomicity is the snapshot commit. The manifest entry carries the
  lineage row: (run_id, stage, input_key, snapshot, row_count,
  per-partition row counts, metrics, committed_at);
- a stage is *done* iff a manifest entry for its (stage, input_key) exists
  AND its snapshot dir exists. A crash between data write and manifest
  rename leaves an orphan dir that is never read and is swept lazily —
  rerunning the stage is safe (idempotent, keyed by input_key);
- resume = read the manifest, skip done stages, recompute the rest. Reruns
  of a done stage are no-ops, so lineage rows are never duplicated.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def _footer_partition_counts(data_dir: str) -> list[dict[str, Any]]:
    """Row count per written file (= storage partition) from parquet
    footers; relative path keeps hive-style partition dirs visible."""
    import pyarrow.parquet as pq

    out: list[dict[str, Any]] = []
    for base, _, files in sorted(os.walk(data_dir)):
        for name in sorted(files):
            if name.endswith(".parquet"):
                path = os.path.join(base, name)
                out.append(
                    {
                        "partition": os.path.relpath(path, data_dir),
                        "rows": pq.ParquetFile(path).metadata.num_rows,
                    }
                )
    return out


class Warehouse:
    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(os.path.join(root, "_manifest"), exist_ok=True)

    # -- manifest ----------------------------------------------------------

    def _manifest_path(self, table: str) -> str:
        return os.path.join(self.root, "_manifest", f"{table}.json")

    def _load(self, table: str) -> list[dict[str, Any]]:
        path = self._manifest_path(table)
        if not os.path.exists(path):
            return []
        with open(path) as f:
            return json.load(f)

    def _store(self, table: str, entries: list[dict[str, Any]]) -> None:
        path = self._manifest_path(table)
        tmp = f"{path}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(entries, f, indent=1)
        os.replace(tmp, path)  # the atomic commit point

    # -- commit / read -----------------------------------------------------

    def commit(
        self,
        df: DataFrame,
        table: str,
        *,
        run_id: str,
        stage: str,
        input_key: str,
        metrics: dict[str, Any] | None = None,
        partition_by: list[str] | None = None,
    ) -> str:
        """Write *df* as a new snapshot of *table* and commit it atomically.

        Returns the snapshot id. Per-partition row counts (the "lineage rows
        + triple-count metrics" of the north rule) are computed in the same
        Spark job graph and stored in the manifest entry.
        """
        snap = f"snap-{uuid.uuid4().hex[:12]}"
        data_dir = os.path.join(self.root, table, snap)
        writer = df.write.mode("errorifexists")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(data_dir)

        # Per-partition lineage rows from parquet footers — metadata only,
        # no second Spark job over the data.
        part_counts = _footer_partition_counts(data_dir)
        entry = {
            "snapshot": snap,
            "table": table,
            "run_id": run_id,
            "stage": stage,
            "input_key": input_key,
            "row_count": sum(p["rows"] for p in part_counts),
            "partitions": part_counts,
            "metrics": metrics or {},
            "committed_at": time.time(),
        }
        entries = self._load(table)
        entries.append(entry)
        self._store(table, entries)
        return snap

    def latest_entry(self, table: str, input_key: str | None = None) -> dict[str, Any] | None:
        """Newest committed entry whose snapshot dir is live."""
        for entry in reversed(self._load(table)):
            if input_key is not None and entry["input_key"] != input_key:
                continue
            if os.path.isdir(os.path.join(self.root, table, entry["snapshot"])):
                return entry
        return None

    def is_done(self, table: str, input_key: str) -> bool:
        return self.latest_entry(table, input_key) is not None

    def read(self, spark: SparkSession, table: str, input_key: str | None = None) -> DataFrame:
        entry = self.latest_entry(table, input_key)
        if entry is None:
            raise FileNotFoundError(f"no committed snapshot for {table!r} ({input_key=})")
        return spark.read.parquet(os.path.join(self.root, table, entry["snapshot"]))

    # -- lineage / maintenance --------------------------------------------

    def lineage(self) -> list[dict[str, Any]]:
        out: list[dict[str, Any]] = []
        mdir = os.path.join(self.root, "_manifest")
        for name in sorted(os.listdir(mdir)):
            if name.endswith(".json"):
                out.extend(self._load(name[: -len(".json")]))
        return sorted(out, key=lambda e: e["committed_at"])

    def sweep_orphans(self) -> list[str]:
        """Delete snapshot dirs no manifest references (crash leftovers) —
        the stale-document sweep analog (main.py:133-155)."""
        removed: list[str] = []
        for table in os.listdir(self.root):
            if table.startswith("_"):
                continue
            live = {e["snapshot"] for e in self._load(table)}
            tdir = os.path.join(self.root, table)
            for snap in os.listdir(tdir):
                if snap not in live:
                    shutil.rmtree(os.path.join(tdir, snap), ignore_errors=True)
                    removed.append(f"{table}/{snap}")
        return removed
