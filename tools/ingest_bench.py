"""Streaming-ingest scale evidence (round-5 verdict, next-round #6).

Drives ``ingest_with_history_dedup`` through a realistic sync shape:

1. a 64-file BACKLOG of interleaved documents at sf0.1 weight (5,000
   docs — the sf0.1 corpus size — split across 64 parquet files so the
   maxFilesPerTrigger=64 source sees a real multi-file batch);
2. three INCREMENTAL drops (new docs + exact-duplicate replays of
   already-committed content), each processed by a fresh availableNow
   run — the watch-folder "sync now" cadence;
3. a KILL-REPLAY probe: re-running the final sync with the checkpoint
   intact must be a no-op, and replaying a batch id (simulated crash
   between history and corpus writes) must leave the corpus
   byte-identical (batch_id partition overwrite = idempotent commit).

Prints one JSON line: per-phase wall time, per-batch latency derived
from the streaming progress events, corpus/history growth, and the
idempotence verdicts. Run quiet (no concurrent Spark).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _batch_latencies(query) -> list[float]:
    out = []
    for p in query.recentProgress:
        if isinstance(p, str):
            p = json.loads(p)
        dur = (p.get("durationMs") or {}).get("triggerExecution")
        n = p.get("numInputRows") or 0
        if dur is not None and n > 0:
            out.append(round(dur / 1000.0, 2))
    return out


def _corpus_digest(spark, corpus_dir: str) -> tuple[int, str]:
    from pyspark.sql import functions as F

    df = spark.read.parquet(corpus_dir)
    row = df.agg(
        F.count("*").alias("n"),
        F.md5(
            F.concat_ws(
                "|",
                F.sort_array(F.collect_list(F.md5(F.concat_ws("#", "doc_id", "text")))),
            )
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), row["h"]


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from readur_spark.corpus import DOCS_SCHEMA, generate_docs
    from readur_spark.session import get_spark
    from readur_spark.streaming.ingest import ingest_with_history_dedup

    spark = get_spark(cores=cpus, app_name="readur_spark_ingest_bench")
    root = tempfile.mkdtemp(prefix="readur_ingest_bench_")
    in_dir, corpus, history, ckpt = (
        f"{root}/in", f"{root}/corpus", f"{root}/history", f"{root}/ckpt"
    )
    out: dict = {"cpus": int(cpus)}

    def drop(docs, n_files):
        spark.createDataFrame(docs, DOCS_SCHEMA).repartition(
            n_files
        ).write.mode("append").parquet(in_dir)

    def sync(tag):
        t0 = time.perf_counter()
        # 16 files/trigger: the 64-file backlog becomes 4 real micro-
        # batches, so per-batch latency and history growth are observable
        q = ingest_with_history_dedup(
            spark, in_dir, corpus, history, ckpt, max_files_per_trigger=16
        )
        q.awaitTermination(600)
        lats = _batch_latencies(q)
        q.stop()
        n, h = _corpus_digest(spark, corpus)
        hist_n = spark.read.parquet(history).count()
        out[tag] = {
            "wall_s": round(time.perf_counter() - t0, 1),
            "batch_latencies_s": lats,
            "corpus_docs": n,
            "corpus_md5": h,
            "history_fingerprints": hist_n,
        }
        return n, h

    # 0. WARM START (r6 verdict, next-round #7): one tiny Arrow batch
    # job through the same extract machinery before the stream opens.
    # With spark.python.worker.reuse (default true) the forked Python
    # daemons persist per core, so a 1-row-per-core no-op pre-forks the
    # worker pool and compiles the codegen paths the first micro-batch
    # would otherwise pay for — isolating SESSION startup from
    # STREAMING first-batch latency. r6 measured the combined cost at
    # 75.6 s on the first backlog batch; the split lands in warmup_s
    # vs backlog.batch_latencies_s[0].
    t0 = time.perf_counter()
    from readur_spark.operators.extract import extract_spans as _ext

    warm = spark.createDataFrame(
        generate_docs(int(cpus) * 2, seed=1), DOCS_SCHEMA
    ).repartition(int(cpus))
    _ext(warm).count()
    out["warmup_s"] = round(time.perf_counter() - t0, 1)

    # 1. backlog: 5,000 docs over 64 files
    drop(generate_docs(5000, seed=11), 64)
    sync("backlog")

    # 2. three incremental drops; each mixes fresh docs with replays of
    #    committed content (same span text, new doc ids — content dedup
    #    must drop them)
    for i in range(3):
        fresh = generate_docs(400, seed=100 + i)
        replay = generate_docs(200, seed=11)[:200]
        for j, r in enumerate(replay):
            r = dict(r)
            r["doc_id"] = f"replay-{i}-{j:06d}"
            fresh.append(r)
        drop(fresh, 8)
        sync(f"incremental_{i}")

    # 3a. checkpoint replay: nothing new — a rerun must commit nothing
    n_before, h_before = _corpus_digest(spark, corpus)
    sync("noop_rerun")
    n_after, h_after = _corpus_digest(spark, corpus)
    out["noop_rerun_idempotent"] = (n_before, h_before) == (n_after, h_after)

    # 3b. crash-replay: simulate dying between the two writes of the
    #     LAST batch by deleting its corpus partition but keeping its
    #     history partition, then re-committing that batch id by hand —
    #     the overwrite-by-partition scheme must restore the exact corpus
    import re

    parts = sorted(
        d for d in os.listdir(corpus) if d.startswith("batch_id=")
    )
    last = parts[-1]
    bid = int(re.search(r"\d+", last).group())
    shutil.rmtree(f"{corpus}/{last}")
    # re-run the same foreachBatch body the stream would run on retry:
    from pyspark.sql import functions as F

    from readur_spark.operators.dedup import dedup_against_history
    from readur_spark.operators.extract import extract_spans
    from readur_spark.functions.textstats import fingerprint_col
    from readur_spark.streaming.ingest import _text_of

    batch_files = spark.read.parquet(in_dir)  # the full input; history
    # filter batch_id < bid reproduces the retry-visible state
    texts = _text_of(extract_spans(batch_files))
    history_df = spark.read.parquet(history).filter(F.col("batch_id") < bid)
    freshd = dedup_against_history(texts, history_df)
    freshd.select(
        fingerprint_col(F.col("text")).alias("fingerprint")
    ).write.mode("overwrite").parquet(f"{history}/batch_id={bid}")
    freshd.write.mode("overwrite").parquet(f"{corpus}/batch_id={bid}")
    n_replay, h_replay = _corpus_digest(spark, corpus)
    out["crash_replay_identical"] = (n_replay, h_replay) == (
        n_before,
        h_before,
    )
    out["load_1m"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out))
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
