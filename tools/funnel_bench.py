"""Full-funnel scale benchmark: curate() with every stage ON at REP x sf.

Replicates the sf0.1 documents REP times with distinct ids (text gets a
per-replica marker so replicas are near- but not exact duplicates — the
realistic web-crawl shape: heavy near-dup mass for the dedup stages to
chew through), replicates embeddings alongside, runs the complete
curation funnel, and prints one JSON line with per-stage survivors,
wall time, and the persistent-RDD count after the run (the cache-leak
steady-state check).

Usage: python tools/funnel_bench.py [REP] [--chunk-by-tokens]
(default REP=10 -> 50k docs). ``--chunk-by-tokens`` trains a BPE
tokenizer IN-RUN on the base corpus and swaps the final word-window
chunking for token-boundary windows (128 tokens, 16 overlap) — the
trainer-faithful end-to-end layout; the JSON then carries the train
stats and a decode-exactness spot check.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    token_mode = "--chunk-by-tokens" in sys.argv[1:]
    rep = int(args[0]) if args else 10
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import functions as F

    from readur_spark.plans.curation import curate
    from readur_spark.session import get_spark

    spark = get_spark(cores=cpus, app_name="readur_spark_funnel_bench")
    sc = spark.sparkContext

    base = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    reps = F.explode(F.sequence(F.lit(1), F.lit(rep))).alias("rep")
    docs = (
        base.select(reps, "doc_id", "text")
        .select(
            F.concat_ws("-", "doc_id", "rep").alias("doc_id"),
            F.concat_ws(" ", "text", F.concat(F.lit("rep"), "rep")).alias(
                "text"
            ),
        )
        .repartition(int(cpus) * 2)
        .localCheckpoint(eager=True)
    )
    embeddings = (
        emb.select(reps, "vec_id", "embedding")
        .select(
            F.concat_ws("-", "vec_id", "rep").alias("vec_id"), "embedding"
        )
        .localCheckpoint(eager=True)
    )
    n_docs = docs.count()
    heldout = docs.limit(50).localCheckpoint(eager=True)
    lm_ref = docs.limit(500).localCheckpoint(eager=True)
    # learned quality filter: trained once on the base corpus (en vs
    # rest — the CCNet-style reference split), then applied in-funnel
    from readur_spark.operators.quality_classifier import (
        train_quality_classifier,
    )

    qbase = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    quality_model = train_quality_classifier(
        qbase.filter(F.col("lang") == "en").select("doc_id", "text"),
        qbase.filter(F.col("lang") != "en").select("doc_id", "text"),
        num_buckets=512,
        iters=15,
    )
    tok = None
    tok_stats = None
    if token_mode:
        from readur_spark.operators.bpe import train_bpe_distributed

        t_tok = time.perf_counter()
        tok = train_bpe_distributed(qbase, num_merges=4096)
        tok_stats = dict(tok.train_stats)
        tok_stats["train_wall_s"] = round(time.perf_counter() - t_tok, 1)
        tok_stats["rules_learned"] = len(tok.merges)

    rdds_before = sc._jsc.getPersistentRDDs().size()

    t0 = time.perf_counter()
    chunks, metrics = curate(
        docs,
        chunk_tokenizer=tok,
        chunk_tokens=128,
        overlap_tokens=16,
        require_gopher=True,
        # the synthetic corpus's function words (the default English
        # Gopher list would zero it out — its docstring says to pass a
        # corpus-appropriate list)
        gopher_stopwords=("spark", "table", "data", "value", "column"),
        require_rep_pass=True,
        line_dedup_max_df=300,
        lm_ref_df=lm_ref,
        max_perplexity=1e6,
        quality_model=quality_model,
        min_quality_prob=0.05,
        scrub_pii=True,
        embeddings_df=embeddings,
        semantic_threshold=0.95,
        semantic_clusters=16,
        heldout_df=heldout,
        near_dup_threshold=0.5,
        # mass-dup guard: REP replicas of every doc collide in the same
        # LSH buckets, so all-pairs candidates grow O(REP^2) per group —
        # the REP=100 run generates ~25M verification pairs without the
        # cap and does not finish in an hour. Star expansion on buckets
        # beyond 32 keeps the replica collapse exact (every replica
        # verifies against the hub replica) with linear pair counts.
        lsh_max_bucket_size=32,
        split_fractions={"train": 0.98, "val": 0.02},
    )
    n_chunks = chunks.count()
    wall = time.perf_counter() - t0
    rdds_after = sc._jsc.getPersistentRDDs().size()

    decode_exact = None
    if token_mode:
        # spot-check the boundary contract end-to-end: re-encoding a
        # chunk's text must count exactly its n_tokens
        sample = chunks.select("chunk_text", "n_tokens").limit(50).collect()
        decode_exact = all(
            tok.count(r["chunk_text"]) == r["n_tokens"] for r in sample
        )

    print(
        json.dumps(
            {
                "rep": rep,
                "chunk_mode": "tokens" if token_mode else "words",
                "bpe_train": tok_stats,
                "token_chunks_reencode_exact": decode_exact,
                "n_docs": n_docs,
                "n_chunks": n_chunks,
                "wall_sec": round(wall, 1),
                "docs_per_sec": round(n_docs / wall, 1),
                "metrics": metrics,
                "persistent_rdds_before": rdds_before,
                "persistent_rdds_after": rdds_after,
                "load_1m": round(os.getloadavg()[0], 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
