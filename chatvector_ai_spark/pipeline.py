"""End-to-end KG construction pipeline with stage-per-snapshot resume.

Stage graph (SURVEY.md §3.1 "Spark lifecycle equivalent"):

    documents ──ingest+embed──> chunks            (narrow, Arrow UDFs)
    chunks ──extract──> triples + quarantine      (narrow, Arrow UDF)
    triples ──link──> linked_mentions             (broadcast join, narrow)
    linked ──canonicalize──> canonical_map        (iterative shuffle joins)
    ──materialize──> nodes / edges                (bucketed by entity hash)

Each stage commits exactly one warehouse snapshot plus its lineage row
(atomic manifest rename) — the Spark-native form of the reference's status
FSM queued→extracting→chunking→embedding→storing→completed
(/root/reference/backend/services/ingestion_pipeline.py:961-1064). Resume
skips stages whose (stage, input_key) lineage row already exists, so a rerun
after a crash recomputes only uncommitted stages and never duplicates
lineage — the contract the reference implements with its stale-document
sweep + idempotent status upserts (main.py:133-155).

Scale posture: stages 1-3 are shuffle-free (parallelism = input partitions);
stage 4's only wide ops are the mention-pivot joins and the salted
connected-components rounds; materialize buckets nodes/edges by entity hash
(`pmod(xxhash64(id), n_buckets)`) so downstream graph queries prune buckets —
the Iceberg `bucket(N, entity_hash)` partition transform of the north rule.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chatvector_ai_spark.config import (
    CHUNK_OVERLAP,
    CHUNK_SIZE,
    EMBEDDING_DIM,
    FILES_PER_BUCKET,
    N_BUCKETS,
)
from chatvector_ai_spark.datagen import alias_df, documents_df
from chatvector_ai_spark.operators.canonicalize import canonical_map
from chatvector_ai_spark.operators.extract import extract_triples_df
from chatvector_ai_spark.operators.ingest import ingest_chunks
from chatvector_ai_spark.operators.link import link_mentions, mentions_from_triples
from chatvector_ai_spark.warehouse import Warehouse


def _bucket_write_layout(
    df: DataFrame, key: str, files_per_bucket: int | None = None
) -> DataFrame:
    """Co-locate the write so a partitionBy("bucket") commit produces
    exactly ``files_per_bucket`` file groups per bucket directory.

    A partitionBy write from T arbitrary tasks fans out to T×N_BUCKETS
    small files per commit (512 at 32 slots — a manifest and footer-scan
    burden that grows with every executor added). Repartitioning on the
    bucket alone fixes that but pins write parallelism to N_BUCKETS tasks
    and one ever-growing file per bucket — the 100 TB bottleneck. The salt
    (a second hash of the same key) splits each bucket into
    ``files_per_bucket`` deterministic sub-groups, so write parallelism
    and target file size scale independently of the bucket count while
    bucket-pruned reads keep pruning (files multiply WITHIN a bucket
    directory, never across)."""
    fpb = FILES_PER_BUCKET if files_per_bucket is None else files_per_bucket
    if fpb <= 1:
        return df.repartition("bucket")
    salt = F.pmod(F.xxhash64(F.col(key), F.lit("filegroup")), F.lit(fpb))
    return df.repartition(N_BUCKETS * fpb, F.col("bucket"), salt)


def nodes_from_linked(
    linked: DataFrame, cmap: DataFrame, files_per_bucket: int | None = None
) -> DataFrame:
    """Canonical node aggregate (label = min surface, provenance counts),
    bucketed by entity hash — shared by the pipeline's nodes stage and the
    cascading-delete rebuild (operators/delete.py)."""
    resolved = linked.join(F.broadcast(cmap), "entity_id", "left").withColumn(
        "canonical_entity", F.coalesce(F.col("canonical_entity"), F.col("entity_id"))
    )
    agg = (
        resolved.groupBy("canonical_entity")
        .agg(
            F.count("*").alias("n_mentions"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("canonical").alias("label"),
        )
        .withColumn("bucket", F.pmod(F.xxhash64("canonical_entity"), F.lit(N_BUCKETS)))
    )
    return _bucket_write_layout(agg, "canonical_entity", files_per_bucket)



def edges_from_linked(
    linked: DataFrame, cmap: DataFrame, files_per_bucket: int | None = None
) -> DataFrame:
    """Canonical edge table from linked mentions: one broadcast join
    (canonical map) + one groupBy pivot on the triple id — the subject and
    object rows of a triple meet in the same reduce group, no
    triples↔mentions re-join needed. Bucketed by src entity hash."""
    resolved = linked.join(F.broadcast(cmap), "entity_id", "left").withColumn(
        "entity", F.coalesce(F.col("canonical_entity"), F.col("entity_id"))
    )

    def side(role: str, col: str):
        return F.max(F.when(F.col("role") == role, F.col(col)))

    agg = (
        resolved.groupBy("triple_id")
        .agg(
            side("subj", "entity").alias("src"),
            F.max("pred").alias("rel"),
            side("obj", "entity").alias("dst"),
            F.max("doc_id").alias("doc_id"),
            F.max("tenant_id").alias("tenant_id"),
            F.max("chunk_id").alias("chunk_id"),
            F.max("conf").alias("conf"),
            side("subj", "surface").alias("src_surface"),
            side("obj", "surface").alias("dst_surface"),
        )
        .drop("triple_id")
        .withColumn("bucket", F.pmod(F.xxhash64("src"), F.lit(N_BUCKETS)))
    )
    return _bucket_write_layout(agg, "src", files_per_bucket)


# projection of a triples_raw snapshot that forms the good-triples view
_TRIPLE_COLS = [
    "doc_id", "chunk_id", "chunk_index", "span_idx", "span_offset",
    "subj", "pred", "obj", "subj_start", "subj_end", "obj_start",
    "obj_end", "conf", "tenant_id", "embedding",
]
# projection of a triples_raw snapshot that forms the quarantine (DLQ) view
_QUARANTINE_COLS = [
    "doc_id", "chunk_id", "'extract' AS stage",
    "_error_code AS error_code", "_retryable AS retryable",
    "_attempts AS attempts", "_error AS message",
]


@dataclass
class PipelineRun:
    run_id: str
    input_key: str
    stages_run: list[str] = field(default_factory=list)
    stages_skipped: list[str] = field(default_factory=list)
    stage_secs: dict[str, float] = field(default_factory=dict)


def _stage(
    wh: Warehouse,
    spark: SparkSession,
    run: PipelineRun,
    table: str,
    build,
    resume: bool,
    metrics: dict | None = None,
    partition_by: list[str] | None = None,
) -> DataFrame:
    import time

    if resume and wh.is_done(table, run.input_key):
        run.stages_skipped.append(table)
        return wh.read(spark, table, run.input_key)
    t0 = time.time()
    df = build()
    wh.commit(
        df,
        table,
        run_id=run.run_id,
        stage=table,
        input_key=run.input_key,
        metrics=metrics,
        partition_by=partition_by,
    )
    run.stage_secs[table] = round(time.time() - t0, 2)
    run.stages_run.append(table)
    return wh.read(spark, table, run.input_key)


def _view_stage(
    wh: Warehouse,
    spark: SparkSession,
    run: PipelineRun,
    table: str,
    *,
    parent_table: str,
    partition_filter: dict,
    select: list[str] | None,
    resume: bool,
) -> DataFrame:
    """Commit *table* as a metadata-only view of *parent_table* (no Spark
    job, no data movement) and return it as a DataFrame — the stage shape
    for derived status tables that are pure filters of an already-committed
    snapshot."""
    import time

    if resume and wh.is_done(table, run.input_key):
        run.stages_skipped.append(table)
        return wh.read(spark, table, run.input_key)
    t0 = time.time()
    wh.commit_view(
        table,
        parent_table=parent_table,
        run_id=run.run_id,
        stage=table,
        input_key=run.input_key,
        partition_filter=partition_filter,
        select=select,
    )
    run.stage_secs[table] = round(time.time() - t0, 2)
    run.stages_run.append(table)
    return wh.read(spark, table, run.input_key)


def _parallel_stages(*jobs):
    """Run independent stage closures as concurrent Spark jobs (the Spark
    scheduler interleaves their tasks); returns results in *jobs* order."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(jobs)) as ex:
        futures = [ex.submit(j) for j in jobs]
        return [f.result() for f in futures]


def run_pipeline(
    spark: SparkSession,
    warehouse: Warehouse,
    n_docs: int | None = None,
    *,
    docs_path: str | None = None,
    n_entities: int = 5000,
    strategy: str = "fixed",
    chunk_size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
    resume: bool = True,
    run_id: str | None = None,
    files_per_bucket: int | None = None,
) -> PipelineRun:
    """Run (or resume) the full KG build; returns stage bookkeeping.

    Input is either an existing interleaved-documents table (``docs_path``,
    the production shape: read the committed table) or ``n_docs`` to
    synthesize one on the fly (tests/small runs).
    """
    import uuid

    src = docs_path if docs_path is not None else f"synth:{n_docs}"
    run = PipelineRun(
        run_id=run_id or f"run-{uuid.uuid4().hex[:8]}",
        input_key=f"src={src}/ents={n_entities}/{strategy}-{chunk_size}-{overlap}/dim={EMBEDDING_DIM}",
    )

    def load_docs() -> DataFrame:
        if docs_path is not None:
            return spark.read.parquet(docs_path)
        return documents_df(spark, n_docs, n_entities=n_entities)

    # stage 0: the alias dictionary is committed once as a dimension
    # snapshot and every later use reads the parquet back. A driver-local
    # createDataFrame would re-ship its LocalRelation into the plan of
    # every stage that touches it (~seconds per stage at 10k rows × 64-d
    # embeddings — measured; a pure serial floor), whereas a parquet scan
    # is a fast JVM-side read and the natural lineage story for a dimension.
    #
    # stage 1+2: ingest (clean+chunk, media passthrough) + embed — one
    # narrow Arrow stage, committed together ("extracting…embedding").
    #
    # The two are independent (the dictionary derives from n_entities, the
    # chunks from the documents), so their commits run as concurrent jobs.
    aliases, chunks = _parallel_stages(
        lambda: _stage(
            warehouse, spark, run, "alias_dict",
            lambda: alias_df(spark, n_entities), resume,
        ),
        lambda: _stage(
            warehouse, spark, run, "chunks",
            lambda: ingest_chunks(
                load_docs(),
                strategy=strategy, size=chunk_size, overlap=overlap,
                embed_dim=EMBEDDING_DIM,
            ),
            resume,
        ),
    )

    # stage 3: triple extraction runs the Python UDF ONCE into a raw
    # snapshot; good triples and the quarantine (DLQ analog) are cheap
    # columnar filters of it. The chunk embedding rides along SPARSELY:
    # only on triples whose surface is an ambiguous dictionary alias (the
    # only place the linker's embedding term can change a decision), so the
    # vector column is ~99% nulls and the linker needs no second chunk scan.
    amb_surfaces = {
        r["alias"]
        for r in aliases.groupBy("alias").count().where(F.col("count") > 1).collect()
    }

    # The raw snapshot is hive-partitioned by the ok flag so that the two
    # derived tables below — good triples and the quarantine — are committed
    # as METADATA-ONLY views over its ok=1 / ok=0 directories. The extract
    # UDF runs once, the data is written once; splitting it by status costs
    # zero Spark jobs (at 1M docs the old filter-and-rewrite `triples`
    # commit alone was ~27 s of pure duplicate write).
    raw = _stage(
        warehouse, spark, run, "triples_raw",
        lambda: extract_triples_df(
            chunks, keep_embedding=False, embed_if_surface_in=amb_surfaces
        ).withColumn("ok", F.col("_error").isNull().cast("int")),
        resume,
        partition_by=["ok"],
    )
    triples = _view_stage(
        warehouse, spark, run, "triples",
        parent_table="triples_raw", partition_filter={"ok": 1},
        select=_TRIPLE_COLS, resume=resume,
    )
    _view_stage(
        warehouse, spark, run, "quarantine",
        parent_table="triples_raw", partition_filter={"ok": 0},
        select=_QUARANTINE_COLS, resume=resume,
    )

    # stage 4: entity linking (broadcast dictionary join + top-1 window)
    linked = _stage(
        warehouse, spark, run, "linked_mentions",
        lambda: link_mentions(mentions_from_triples(triples), aliases),
        resume,
    )

    # stage 5: canonicalization (iterative CC with salted hub keys)
    cmap = _stage(
        warehouse, spark, run, "canonical_map",
        lambda: canonical_map(linked, aliases),
        resume,
    )

    # stage 6: materialize nodes/edges bucketed by entity hash;
    # files_per_bucket (default: config.FILES_PER_BUCKET) decouples write
    # parallelism from the bucket count — see _bucket_write_layout
    def build_nodes() -> DataFrame:
        return nodes_from_linked(linked, cmap, files_per_bucket)

    def _commit_nodes() -> DataFrame:
        return _stage(
            warehouse, spark, run, "nodes", build_nodes, resume,
            metrics={"n_buckets": N_BUCKETS}, partition_by=["bucket"],
        )

    def _commit_edges() -> DataFrame:
        return _stage(
            warehouse, spark, run, "edges",
            lambda: edges_from_linked(linked, cmap, files_per_bucket), resume,
            metrics={"n_buckets": N_BUCKETS}, partition_by=["bucket"],
        )

    # nodes + edges both derive from (linked, cmap) — independent, run
    # concurrently like triples/quarantine above
    nodes, edges = _parallel_stages(_commit_nodes, _commit_edges)
    _ = (nodes, edges)
    return run


def incremental_update(
    spark: SparkSession,
    warehouse: Warehouse,
    base_input_key: str,
    new_docs_path: str | None = None,
    *,
    new_docs: DataFrame | None = None,
    new_input_key: str | None = None,
    strategy: str = "fixed",
    chunk_size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
    resume: bool = True,
    run_id: str | None = None,
    files_per_bucket: int | None = None,
) -> PipelineRun:
    """Fold NEW documents into an already-built KG without reprocessing the
    corpus — the engine-side form of the reference's per-document ingest
    (each upload appends its own chunks, sqlalchemy_service.py:237-273;
    our batch analog appends a document BATCH).

    Cost shape at 10^12 docs, the reason this exists:

    - **chunks** and **triples_raw** — the Arrow-UDF stages that dominate
      pipeline cost — run over the NEW documents only and commit as
      APPEND DELTAS (``Warehouse.commit(delta_of=...)``): compute AND
      write I/O are ∝ the delta, and reads union the snapshot chain.
      The good-triples / quarantine views re-commit as metadata over the
      chained raw table — still zero-copy.
    - **linked_mentions / canonical_map / nodes / edges** recompute over
      the chained union and commit full snapshots: linking is one
      broadcast join (cheap at any corpus size relative to extraction),
      and canonicalization is a GLOBAL fixpoint — new mentions can merge
      previously-distinct components, so any "incremental CC" shortcut
      risks wrong canonical ids; correctness wins. (At extreme scale the
      CC input can be restricted to components touched by new aliases;
      the committed tables make that a future read-side optimization,
      not a format change.)

    ``base_input_key`` names the run to extend — the initial build's key
    or a previous incremental's — so updates chain. New documents come
    either from ``new_docs_path`` (a parquet directory) or ``new_docs``
    (a DataFrame — the Structured Streaming foreachBatch shape; pass
    ``new_input_key`` to name the result, e.g. an epoch key, since a
    DataFrame has no path to derive one from). Equivalence contract
    (pinned by tests/test_incremental.py): the resulting chunks, triples,
    canonical_map, nodes and edges tables are ROW-IDENTICAL to a fresh
    full build over the union corpus.
    """
    import uuid

    if (new_docs_path is None) == (new_docs is None):
        raise ValueError("pass exactly one of new_docs_path / new_docs")
    if new_docs is not None and new_input_key is None:
        raise ValueError("new_docs (DataFrame input) requires new_input_key")
    base_chunks = warehouse.latest_entry("chunks", base_input_key)
    base_raw = warehouse.latest_entry("triples_raw", base_input_key)
    base_alias = warehouse.latest_entry("alias_dict", base_input_key)
    if base_chunks is None or base_raw is None or base_alias is None:
        raise FileNotFoundError(
            f"incremental_update: no completed base run under {base_input_key!r}"
        )
    run = PipelineRun(
        run_id=run_id or f"inc-{uuid.uuid4().hex[:8]}",
        input_key=new_input_key
        if new_input_key is not None
        else f"{base_input_key}+delta:{new_docs_path}",
    )

    # alias dictionary: zero-copy re-key (an unfiltered metadata view of
    # the base dimension snapshot) so reads under the new key resolve
    if resume and warehouse.is_done("alias_dict", run.input_key):
        run.stages_skipped.append("alias_dict")
    else:
        warehouse.commit_view(
            "alias_dict", parent_table="alias_dict", run_id=run.run_id,
            stage="alias_dict", input_key=run.input_key, partition_filter={},
            parent_input_key=base_input_key,
        )
        run.stages_run.append("alias_dict")
    aliases = warehouse.read(spark, "alias_dict", run.input_key)

    def _delta(table: str, base_snapshot: str, build, partition_by=None) -> None:
        import time

        if resume and warehouse.is_done(table, run.input_key):
            run.stages_skipped.append(table)
            return
        t0 = time.time()
        warehouse.commit(
            build(), table, run_id=run.run_id, stage=table,
            input_key=run.input_key, partition_by=partition_by,
            delta_of=base_snapshot,
        )
        run.stage_secs[table] = round(time.time() - t0, 2)
        run.stages_run.append(table)

    _delta(
        "chunks", base_chunks["snapshot"],
        lambda: ingest_chunks(
            new_docs if new_docs is not None else spark.read.parquet(new_docs_path),
            strategy=strategy, size=chunk_size, overlap=overlap,
            embed_dim=EMBEDDING_DIM,
        ),
    )
    new_chunks = warehouse.read(spark, "chunks", run.input_key)  # chained

    amb_surfaces = {
        r["alias"]
        for r in aliases.groupBy("alias").count().where(F.col("count") > 1).collect()
    }
    # extract over the NEW chunks only: re-read the delta snapshot alone
    # (the chained read above is for downstream stages)
    delta_chunks_entry = warehouse.latest_entry("chunks", run.input_key)
    if delta_chunks_entry is not None and delta_chunks_entry.get("delta_of"):
        delta_chunks = spark.read.parquet(
            warehouse._entry_data_dir(delta_chunks_entry)  # noqa: SLF001
        )
    else:  # resume path where chunks was already a full snapshot
        delta_chunks = new_chunks
    _delta(
        "triples_raw", base_raw["snapshot"],
        lambda: extract_triples_df(
            delta_chunks, keep_embedding=False, embed_if_surface_in=amb_surfaces
        ).withColumn("ok", F.col("_error").isNull().cast("int")),
        partition_by=["ok"],
    )
    triples = _view_stage(
        warehouse, spark, run, "triples",
        parent_table="triples_raw", partition_filter={"ok": 1},
        select=_TRIPLE_COLS, resume=resume,
    )
    _view_stage(
        warehouse, spark, run, "quarantine",
        parent_table="triples_raw", partition_filter={"ok": 0},
        select=_QUARANTINE_COLS, resume=resume,
    )

    # global stages over the chained union — identical code path to the
    # full build from here on
    linked = _stage(
        warehouse, spark, run, "linked_mentions",
        lambda: link_mentions(mentions_from_triples(triples), aliases),
        resume,
    )
    cmap = _stage(
        warehouse, spark, run, "canonical_map",
        lambda: canonical_map(linked, aliases),
        resume,
    )
    nodes, edges = _parallel_stages(
        lambda: _stage(
            warehouse, spark, run, "nodes",
            lambda: nodes_from_linked(linked, cmap, files_per_bucket), resume,
            metrics={"n_buckets": N_BUCKETS}, partition_by=["bucket"],
        ),
        lambda: _stage(
            warehouse, spark, run, "edges",
            lambda: edges_from_linked(linked, cmap, files_per_bucket), resume,
            metrics={"n_buckets": N_BUCKETS}, partition_by=["bucket"],
        ),
    )
    _ = (nodes, edges)
    return run


def flagship_query(spark: SparkSession, warehouse: Warehouse, input_key: str | None = None) -> DataFrame:
    """Top-10 canonical entities by edge degree with provenance doc counts
    (SURVEY.md §7.1) — reads the committed graph, prunes to node buckets."""
    nodes = warehouse.read(spark, "nodes", input_key)
    edges = warehouse.read(spark, "edges", input_key)
    deg = (
        edges.select(F.col("src").alias("canonical_entity"))
        .unionByName(edges.select(F.col("dst").alias("canonical_entity")))
        .groupBy("canonical_entity")
        .agg(F.count("*").alias("degree"))
    )
    return (
        nodes.join(deg, "canonical_entity", "left")
        .select(
            "canonical_entity", "label", "n_mentions", "n_docs",
            F.coalesce("degree", F.lit(0)).alias("degree"),
        )
        .orderBy(F.desc("n_mentions"), F.asc("canonical_entity"))
        .limit(10)
    )
