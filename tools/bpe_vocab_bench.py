"""Production-vocab BPE evidence (round-5 verdict, next-round #1).

The sf0.1 documents table has a deliberately tiny vocabulary (~61
distinct pre-tokens — every merge chain bottoms out near 126 rules), so
it cannot exercise a 16k/32k-merge vocabulary. This bench therefore runs
TWO corpora:

* the real sf0.1 table (fidelity to the driver fixtures; trains to its
  natural rule ceiling), and
* a DETERMINISTIC rich synthetic corpus — 50k docs x 200 words drawn
  log-uniformly (Zipf-like) from a 100k-word derived vocabulary, where
  ``word_of(rank)`` is a pure function of the rank so executors generate
  text without shipping any vocabulary list. No external data.

For each: the distributed word-count shuffle, the driver-side heap
trainer at 16k and 32k merges, the batched executor-side merge loop
(counting passes vs the one-job-per-merge alternative), and Arrow-batched
encode throughput at the 32k vocab.

Prints one JSON line; run quiet (no concurrent Spark) per the measurement
protocol. BASELINE.md rows are written by hand from the output.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def word_of(rank: int) -> str:
    """Deterministic vocabulary: rank -> word, a pure function so every
    executor reproduces the same vocabulary with zero shipped state."""
    import random

    rng = random.Random((rank * 2654435761) % (2**61))
    ln = 3 + int(rng.random() * 9)
    return "".join(chr(97 + int(rng.random() * 26)) for _ in range(ln))


def synth_docs(spark, n_docs: int, words_per_doc: int, vocab: int, seed: int):
    """50k-doc rich corpus, generated distributed: per-doc seeded RNG,
    ranks drawn log-uniformly over [1, vocab) (Zipf-shaped mass)."""
    import pandas as pd

    def run(batches):
        import random

        for pdf in batches:
            texts = []
            for i in pdf["id"]:
                rng = random.Random((seed << 34) ^ int(i))
                texts.append(
                    " ".join(
                        word_of(1 + int(vocab ** rng.random()))
                        for _ in range(words_per_doc)
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["id"], "text": texts})

    return (
        spark.range(n_docs)
        .repartition(32)
        .mapInPandas(run, "doc_id long, text string")
    )


def bench_corpus(spark, docs, n_docs: int, spark_merges: int) -> dict:
    from readur_spark.kernels.bpe import BpeTokenizer, train_bpe
    from readur_spark.operators.bpe import (
        bpe_count_udf,
        train_bpe_spark_loop,
        word_count_table,
    )

    out: dict = {"n_docs": n_docs}

    # 1. word table: the one corpus shuffle
    t0 = time.monotonic()
    wc = word_count_table(docs).persist()
    n_words = wc.count()
    t_table = time.monotonic() - t0
    t0 = time.monotonic()
    top = (
        wc.orderBy(wc["count"].desc(), wc["word"].asc())
        .limit(1_000_000)
        .collect()
    )
    t_topk = time.monotonic() - t0
    freqs = {bytes(r["word"]): int(r["count"]) for r in top}
    out["word_table"] = {
        "distinct_words": n_words,
        "build_s": round(t_table, 2),
        "topk_collect_s": round(t_topk, 2),
    }

    # 2. driver trainer at production vocab sizes (lazy max-heap)
    for merges in (16_000, 32_000):
        t0 = time.monotonic()
        rules = train_bpe(freqs, merges)
        out[f"train_driver_{merges}"] = {
            "wall_s": round(time.monotonic() - t0, 2),
            "rules_learned": len(rules),
        }

    # 3. batched spark loop: counting passes vs the one-job-per-merge
    #    alternative (= merges barriers)
    stats: dict = {}
    t0 = time.monotonic()
    rules_loop = train_bpe_spark_loop(
        wc,
        num_merges=spark_merges,
        checkpoint_every=4,
        batch_merges=64,
        stats=stats,
    )
    t_loop = time.monotonic() - t0
    seq_prefix = train_bpe(freqs, spark_merges)
    out["train_spark_loop"] = {
        "merges": len(rules_loop),
        "batch_merges": 64,
        "counting_passes": stats.get("passes"),
        "wall_s": round(t_loop, 2),
        "equals_driver_prefix": rules_loop == seq_prefix[: len(rules_loop)],
    }

    # 4. encode throughput with the 32k tokenizer
    tok = BpeTokenizer(train_bpe(freqs, 32_000))
    t0 = time.monotonic()
    total_tokens = (
        docs.select(bpe_count_udf(tok)(docs["text"]).alias("n"))
        .agg({"n": "sum"})
        .collect()[0][0]
    )
    t_enc = time.monotonic() - t0
    out["encode_32k"] = {
        "wall_s": round(t_enc, 2),
        "total_tokens": int(total_tokens),
        "docs_per_s": round(n_docs / t_enc, 1),
        "tokens_per_s": round(total_tokens / t_enc, 1),
    }
    wc.unpersist()
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "24g")
        .appName("bpe-vocab-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"sf_dir": sf_dir, "cpus": int(cpus)}

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out["sf01"] = bench_corpus(spark, docs, docs.count(), spark_merges=128)

    n_rich = 50_000
    rich = synth_docs(
        spark, n_docs=n_rich, words_per_doc=200, vocab=100_000, seed=6
    ).persist()
    rich.count()  # materialize so generation cost stays out of the timings
    out["rich_synth"] = bench_corpus(
        spark, rich, n_rich, spark_merges=2048
    )
    rich.unpersist()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
