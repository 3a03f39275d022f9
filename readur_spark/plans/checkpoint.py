"""Partition-granular checkpoint / lineage table.

readur's work queue (`ocr_queue`, /root/reference/migrations/
20250620100001_add_ocr_queue.sql:2-17) tracks per-item claim/attempt/
completion state so crashed runs resume and finished work is never redone.
In Spark's batch model the natural work unit is the **partition**, so the
checkpoint table holds one row per (run_id, partition_id):

    checkpoint(run_id, partition_id, status, attempts, started_at,
               completed_at, docs_processed, docs_failed,
               processing_time_ms, worker_id, error_message)

Semantics mirrored from the reference:

* claim = the act of a task starting a partition (Spark's scheduler is the
  SKIP LOCKED dequeue, src/ocr/queue.rs:182-196);
* resume = rerun filtered to partitions without a ``completed`` row
  (retry_failed, queue.rs:1064-1168);
* first-writer-wins commit = completed rows are never overwritten
  (db_guardrails_simple.rs:97 ``ocr_status != 'completed'`` guard).

Storage is a parquet directory written append-only, one file per attempt
batch (the local stand-in for an Iceberg table — swap ``_write``/``_read``
for ``format("iceberg")`` + MERGE INTO on a real catalog; semantics are
the same because reads always reduce to the latest-completed row).
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CHECKPOINT_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("attempts", T.IntegerType(), False),
        T.StructField("started_at", T.TimestampType(), True),
        T.StructField("completed_at", T.TimestampType(), True),
        T.StructField("docs_processed", T.LongType(), True),
        T.StructField("docs_failed", T.LongType(), True),
        T.StructField("processing_time_ms", T.LongType(), True),
        T.StructField("worker_id", T.StringType(), True),
        T.StructField("error_message", T.StringType(), True),
    ]
)


class CheckpointTable:
    """``table_format="parquet"`` (default): ``path`` is a directory and
    commits are the rename-based protocol below — the tested fallback in
    this container. ``table_format="iceberg"``: ``path`` is a catalog
    table identifier; appends are snapshot commits, cleanup is a
    metadata-only DELETE, and the rename recovery machinery is inert
    (Iceberg's own commit protocol owns atomicity)."""

    def __init__(self, spark: SparkSession, path: str, table_format: str = "parquet"):
        from readur_spark.sources.table_format import resolve_format

        self.spark = spark
        self.path = path
        self.table_format = resolve_format(spark, table_format)

    def _recover(self) -> None:
        """Crash recovery for the two-rename compaction commit in
        ``cleanup_completed``. Invariants: a ``.old-*`` sibling means the
        pre-compaction table was moved aside; if the main path is missing
        the crash hit between the renames → restore the old table (the
        compaction simply didn't happen). A ``.compact-*`` sibling is a
        write that never committed → drop it. If the main path exists, any
        ``.old-*`` leftovers are already-superseded tables → drop them."""
        import shutil

        parent = os.path.dirname(self.path) or "."
        base = os.path.basename(self.path)
        if not os.path.isdir(parent):
            return
        sibs = [f for f in os.listdir(parent) if f.startswith(base + ".")]
        main_exists = os.path.isdir(self.path)
        for s in sibs:
            full = os.path.join(parent, s)
            if s.startswith(base + ".old-") and not main_exists:
                os.rename(full, self.path)
                main_exists = True
            else:
                shutil.rmtree(full, ignore_errors=True)

    def exists(self) -> bool:
        if self.table_format == "iceberg":
            return self.spark.catalog.tableExists(self.path)
        self._recover()
        return os.path.isdir(self.path) and any(
            f.endswith(".parquet") for f in os.listdir(self.path)
        )

    def read(self) -> DataFrame:
        if not self.exists():
            return self.spark.createDataFrame([], CHECKPOINT_SCHEMA)
        if self.table_format == "iceberg":
            return self.spark.read.table(self.path)
        return self.spark.read.schema(CHECKPOINT_SCHEMA).parquet(self.path)

    def append(self, rows: list[dict]) -> None:
        if self.table_format != "iceberg":
            self._recover()
        df = self.spark.createDataFrame(
            [
                {
                    "run_id": r["run_id"],
                    "partition_id": int(r["partition_id"]),
                    "status": r["status"],
                    "attempts": int(r.get("attempts", 1)),
                    "started_at": r.get("started_at"),
                    "completed_at": r.get("completed_at"),
                    "docs_processed": r.get("docs_processed"),
                    "docs_failed": r.get("docs_failed"),
                    "processing_time_ms": r.get("processing_time_ms"),
                    "worker_id": r.get("worker_id"),
                    "error_message": r.get("error_message"),
                }
                for r in rows
            ],
            CHECKPOINT_SCHEMA,
        )
        if self.table_format == "iceberg":
            if self.exists():
                df.writeTo(self.path).append()
            else:
                df.writeTo(self.path).create()
        else:
            df.write.mode("append").parquet(self.path)

    def completed_partitions(self) -> set[int]:
        """Partitions with a completed row in ANY run — first-writer-wins,
        so a resume never reprocesses them."""
        if not self.exists():
            return set()
        rows = (
            self.read()
            .filter(F.col("status") == "completed")
            .select("partition_id")
            .distinct()
            .collect()
        )
        return {r["partition_id"] for r in rows}

    def attempts_so_far(self) -> dict[int, int]:
        if not self.exists():
            return {}
        rows = (
            self.read()
            .groupBy("partition_id")
            .agg(F.max("attempts").alias("a"))
            .collect()
        )
        return {r["partition_id"]: r["a"] for r in rows}

    def cleanup_completed(self, days_to_keep: int, now=None) -> int:
        """Q8: drop completed checkpoint rows older than the retention
        horizon — the reference's
        ``DELETE FROM ocr_queue WHERE status='completed' AND completed_at <
        NOW() - INTERVAL '1 day' * $1`` (queue.rs:1171-1184). Returns rows
        deleted. NOTE: removing a completed row makes that partition
        re-eligible on resume, exactly like deleting the queue row would —
        cleanup is for finished runs whose outputs are already committed.

        The parquet stand-in rewrites the (small, one-row-per-partition-
        attempt) table via a crash-safe commit: compacted copy to a temp
        sibling dir → old table renamed aside → temp renamed into place →
        old removed. ``_recover`` repairs every intermediate crash state
        (see its invariants) with no window where kept rows are duplicated
        — the defect the round-2 advice flagged in the append-then-delete
        version. On Iceberg this whole method is a metadata-only DELETE.

        Rows with status='completed' but NULL ``completed_at`` are RETAINED
        (a tri-state NOT over a NULL comparison silently deleted them
        before): age unknown is not age expired."""
        import datetime
        import shutil

        if not self.exists():
            return 0
        now = now or datetime.datetime.now()
        cutoff = now - datetime.timedelta(days=days_to_keep)
        if self.table_format == "iceberg":
            # metadata-only delete, one snapshot commit — no rewrite/rename
            before = self.read().count()
            self.spark.sql(
                f"DELETE FROM {self.path} WHERE status = 'completed' "
                f"AND completed_at IS NOT NULL "
                f"AND completed_at < TIMESTAMP '{cutoff.isoformat(sep=' ')}'"
            )
            return int(before - self.read().count())
        df = self.read()
        keep = df.filter(
            ~(
                (F.col("status") == "completed")
                & F.col("completed_at").isNotNull()
                & (F.col("completed_at") < F.lit(cutoff))
            )
        )
        rows = keep.collect()  # metadata-scale table: one row per attempt
        deleted = df.count() - len(rows)
        if deleted:
            token = uuid.uuid4().hex[:8]
            tmp = f"{self.path}.compact-{token}"
            old = f"{self.path}.old-{token}"
            self.spark.createDataFrame(rows, CHECKPOINT_SCHEMA).coalesce(1).write.mode(
                "overwrite"
            ).parquet(tmp)
            os.rename(self.path, old)
            os.rename(tmp, self.path)
            shutil.rmtree(old, ignore_errors=True)
        return int(deleted)

    def stats(self) -> DataFrame:
        """Q9 analog: queue stats (queue.rs:890-1061) — per-status counts +
        latency aggregates, one groupBy."""
        return (
            self.read()
            .groupBy("status")
            .agg(
                F.count("*").alias("n"),
                F.sum("docs_processed").alias("docs_processed"),
                F.sum("docs_failed").alias("docs_failed"),
                F.avg("processing_time_ms").alias("avg_ms"),
                F.max("processing_time_ms").alias("max_ms"),
            )
        )


def new_run_id() -> str:
    return f"run-{int(time.time())}-{uuid.uuid4().hex[:8]}"
