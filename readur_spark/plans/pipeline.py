"""Resumable extraction job plan.

Deterministic partition assignment + partition-granular checkpointing:

1. Every document gets a stable ``partition_id = pmod(xxhash64(doc_id), P)``
   — a pure function of the doc id, so the same document lands in the same
   partition in every run (the prerequisite for resume; also the north
   rule's salt-by-doc_id skew spread: xxhash64 is uniform, so mega-docs
   scatter instead of clustering).
2. Partitions already marked ``completed`` in the checkpoint table are
   filtered out *before* the shuffle — a resume reads, shuffles, and
   processes only the remaining fraction.
3. Results are written ``partitionBy(partition_id)`` with dynamic partition
   overwrite: re-running a previously-crashed partition atomically replaces
   its partial output, and completed partitions are never touched (the
   first-writer-wins guard of
   /root/reference/src/db_guardrails_simple.rs:97).
4. Only after the write succeeds are ``completed`` checkpoint rows appended,
   with per-partition lineage metrics (docs processed/failed, wall-clock) —
   the `ocr_metrics` analog (migrations/20250620100001:34-46).

Crash anywhere → no checkpoint row → the partition reruns next time.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.operators.extract import extract_spans
from readur_spark.plans.checkpoint import CheckpointTable, new_run_id


def assign_partitions(docs_df: DataFrame, num_partitions: int) -> DataFrame:
    return docs_df.withColumn(
        "partition_id",
        F.pmod(F.xxhash64("doc_id"), F.lit(num_partitions)).cast("int"),
    )


def run_extraction(
    spark: SparkSession,
    docs_df: DataFrame,
    output_path: str,
    checkpoint_path: str,
    num_partitions: int = 64,
    run_id: str | None = None,
    repair_hyphens: bool = True,
    table_format: str = "parquet",
) -> dict:
    """Run (or resume) a checkpointed extraction over ``docs_df``.

    ``table_format="iceberg"`` makes ``output_path``/``checkpoint_path``
    catalog table identifiers: the result commit becomes an Iceberg
    ``overwritePartitions`` snapshot (atomic replace of exactly the
    re-run partitions) and the checkpoint an Iceberg table — same
    first-writer-wins resume semantics as the tested parquet fallback
    (see sources/table_format.py for the spark-submit recipe).

    Returns a summary dict: run_id, partitions planned/skipped/processed,
    docs processed/failed.
    """
    from readur_spark.sources.table_format import (
        overwrite_partitions,
        read_table,
        resolve_format,
    )

    table_format = resolve_format(spark, table_format)
    run_id = run_id or new_run_id()
    ckpt = CheckpointTable(spark, checkpoint_path, table_format=table_format)
    done = ckpt.completed_partitions()
    prev_attempts = ckpt.attempts_so_far()

    planned = assign_partitions(docs_df, num_partitions)
    todo_pids = sorted(set(range(num_partitions)) - done)
    if not todo_pids:
        return {
            "run_id": run_id,
            "partitions_total": num_partitions,
            "partitions_skipped": len(done),
            "partitions_processed": 0,
            "docs_processed": 0,
            "docs_failed": 0,
        }

    todo = planned.filter(F.col("partition_id").isin(todo_pids)) if done else planned
    # one explicit shuffle: co-locate each checkpoint partition
    todo = todo.repartition(num_partitions, "partition_id")

    started = datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
    # claim rows first (readur's dequeue claims the item and bumps attempts
    # inside the claiming transaction, src/ocr/queue.rs:165-318) — so
    # attempt counts survive a crash that never commits results.
    attempts_now = {pid: prev_attempts.get(pid, 0) + 1 for pid in todo_pids}
    ckpt.append(
        [
            {
                "run_id": run_id,
                "partition_id": pid,
                "status": "processing",
                "attempts": attempts_now[pid],
                "started_at": started,
                "worker_id": run_id,
            }
            for pid in todo_pids
        ]
    )
    t0 = datetime.datetime.now()
    extracted = extract_spans(
        todo, repair_hyphens=repair_hyphens, passthrough_cols=["partition_id"]
    )
    overwrite_partitions(
        extracted, output_path, ["partition_id"], fmt=table_format
    )
    wall_ms = int((datetime.datetime.now() - t0).total_seconds() * 1000)
    completed = datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)

    # lineage metrics from the committed output (not from in-flight state)
    metrics = (
        read_table(spark, output_path, table_format)
        .filter(F.col("partition_id").isin(todo_pids))
        .groupBy("partition_id")
        .agg(
            F.count("*").alias("docs_processed"),
            F.sum(F.when(F.col("status") == "failed", 1).otherwise(0)).alias("docs_failed"),
            F.sum("processing_time_ms").alias("processing_time_ms"),
        )
        .collect()
    )
    by_pid = {r["partition_id"]: r for r in metrics}
    rows = []
    for pid in todo_pids:
        m = by_pid.get(pid)
        rows.append(
            {
                "run_id": run_id,
                "partition_id": pid,
                "status": "completed",
                "attempts": attempts_now[pid],
                "started_at": started,
                "completed_at": completed,
                "docs_processed": int(m["docs_processed"]) if m else 0,
                "docs_failed": int(m["docs_failed"]) if m else 0,
                "processing_time_ms": int(m["processing_time_ms"]) if m and m["processing_time_ms"] is not None else 0,
                "worker_id": f"{run_id}",
                "error_message": None,
            }
        )
    ckpt.append(rows)

    return {
        "run_id": run_id,
        "partitions_total": num_partitions,
        "partitions_skipped": len(done),
        "partitions_processed": len(todo_pids),
        "docs_processed": sum(r["docs_processed"] for r in rows),
        "docs_failed": sum(r["docs_failed"] for r in rows),
        "wall_ms": wall_ms,
    }
