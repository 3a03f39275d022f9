"""Continuous-ingest pipeline: watcher → extract → dedup-vs-committed →
append — the reference's per-upload flow as one Structured Stream.

readur's upload path checks each new file's content hash against the
documents table and skips duplicates before OCR ever runs
(/root/reference/src/ingestion/document_ingestion.rs:341-347, policy
:23-33 'Skip'). The streaming form composes the engine's existing
pieces per micro-batch via ``foreachBatch``:

1. the file source discovers new interleaved-doc parquet drops
   (exactly-once via the streaming checkpoint — the watcher surface);
2. ``extract_spans`` produces text (the identical batch operator —
   stream/batch parity by construction);
3. ``dedup_against_history`` drops documents whose fingerprint already
   exists in the committed corpus AND keeps-first within the batch;
4. survivors append to the corpus table, and their fingerprints append
   to the compact history table — so the NEXT micro-batch dedups
   against everything committed so far without ever re-shuffling the
   historical corpus (the incremental-ingest contract).

``foreachBatch`` instead of a plain streaming sink because step 3 is a
join against a table this same query appends to — cyclic for the
incremental planner, natural as a per-batch batch job. Exactly-once
holds WITHOUT a transactional sink because both writes are idempotent:
corpus and history land in ``batch_id=<id>`` partition directories
written with overwrite, and the dedup join reads only history
partitions with ``batch_id < current`` — so a replayed batch recomputes
the identical survivor set (its own partial writes are excluded from
its inputs) and overwrites the same paths. A bare two-write append
scheme has no safe ordering: history-first loses documents on replay,
corpus-first duplicates them.

Scale: history is fingerprints only (16 bytes/doc — 16 TB at 10^12
docs, a fact table, broadcastable at early corpus life); each batch
shuffles only itself.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from readur_spark.corpus import DOCS_SCHEMA
from readur_spark.functions.textstats import fingerprint_col
from readur_spark.operators.dedup import dedup_against_history
from readur_spark.operators.extract import extract_spans


def _text_of(extracted: DataFrame) -> DataFrame:
    """completed extractions → (doc_id, text) — same projection the
    curation funnel uses for interleaved input."""
    return extracted.filter(F.col("status") == "completed").select(
        "doc_id",
        F.array_join(
            F.transform(
                F.filter(F.col("spans"), lambda s: s["kind"] == "text"),
                lambda s: s["text"],
            ),
            "\n\n",
        ).alias("text"),
    )


def ingest_with_history_dedup(
    spark: SparkSession,
    input_dir: str,
    corpus_dir: str,
    history_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int = 64,
) -> StreamingQuery:
    """Run the watcher→extract→dedup→append pipeline.

    ``corpus_dir`` receives surviving (doc_id, text) rows; ``history_dir``
    holds the compact fingerprint table both read and appended per batch.
    ``available_now=True`` processes the backlog then stops (sync-now);
    ``False`` polls continuously."""

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        texts = _text_of(extract_spans(batch_df))
        sess = batch_df.sparkSession
        # Only the legitimately-empty cases may fall back to empty
        # history: (a) the history table was never written (first
        # batch), or (b) the directory exists but holds no readable
        # parquet — a crash during the first batch's history write
        # leaves batch_id=0/_temporary with zero part-files, and the
        # replayed batch must RECOVER, not wedge on 'unable to infer
        # schema' forever (that batch's filter empties the frame
        # anyway). Both surface as AnalysisException at read-plan time.
        # Anything else — transient FS error at action time, corrupt
        # footer, permissions — propagates so the batch retries:
        # swallowing it would silently disable dedup-against-committed
        # and commit duplicates, breaking the exactly-once contract.
        from pyspark.errors import AnalysisException

        jvm = sess._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(history_dir)
        fs = hpath.getFileSystem(sess._jsc.hadoopConfiguration())
        history = None
        if fs.exists(hpath):
            try:
                history = sess.read.parquet(history_dir)
            except AnalysisException:
                # exists-but-no-readable-parquet: schema inference has
                # nothing to read — same recovery as missing
                history = None
            else:
                # OUTSIDE the try: a history dir whose parquet lacks
                # batch_id would also raise AnalysisException at
                # analysis time, and swallowing that would silently
                # disable dedup-against-committed (duplicates through
                # the exactly-once gate). Only the read itself may
                # fall back.
                history = history.filter(F.col("batch_id") < batch_id)
        if history is None:
            history = sess.createDataFrame([], "fingerprint string")
        fresh = dedup_against_history(texts, history).persist()
        try:
            fresh.select(
                fingerprint_col(F.col("text")).alias("fingerprint")
            ).write.mode("overwrite").parquet(
                f"{history_dir}/batch_id={batch_id}"
            )
            fresh.write.mode("overwrite").parquet(
                f"{corpus_dir}/batch_id={batch_id}"
            )
        finally:
            fresh.unpersist()

    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    writer = stream.writeStream.foreachBatch(commit_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="30 seconds")
    os.makedirs(checkpoint_dir, exist_ok=True)
    return writer.start()
