"""Cluster entry point: the full training-data curation funnel.

    spark-submit --master <cluster> --py-files dist/readur_spark.zip \
        jobs/run_curation.py --input <interleaved or documents parquet> \
        --output <chunks parquet> [--min-quality 0.3] [--no-gopher] \
        [--rep-filter] [--heldout <eval parquet>] [--splits train=0.98,val=0.01,test=0.01] \
        [--chunk-words 128] [--overlap 32] \
        [--chunk-tokens 512 [--overlap-tokens 0] [--bpe-merges 16384]]

Prints one JSON line with the funnel metrics (input → [decontamination]
→ quality/[repetition] filter → exact dedup → near-dup cluster dedup →
chunks [with split column]).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# local runs from the repo dir; cluster runs ship the package via
# --py-files and don't need this
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--min-quality", type=float, default=0.0)
    ap.add_argument("--no-gopher", action="store_true")
    ap.add_argument("--gopher-stopwords", default=None,
                    help="comma-separated corpus-appropriate stopword list")
    ap.add_argument("--near-dup-threshold", type=float, default=0.5)
    ap.add_argument("--rep-filter", action="store_true",
                    help="apply the Gopher repetition filters")
    ap.add_argument("--heldout", default=None,
                    help="eval-set parquet to decontaminate against")
    ap.add_argument("--splits", default=None,
                    help="name=frac[,name=frac...] deterministic split column")
    ap.add_argument("--chunk-words", type=int, default=128)
    ap.add_argument("--overlap", type=int, default=32)
    ap.add_argument("--chunk-tokens", type=int, default=None,
                    help="chunk by BPE TOKEN windows of this size instead "
                         "of word windows (trains a tokenizer in-run on "
                         "the input corpus; the trainer-faithful layout)")
    ap.add_argument("--overlap-tokens", type=int, default=0)
    ap.add_argument("--bpe-merges", type=int, default=16384,
                    help="merge-rule count for the in-run tokenizer")
    ap.add_argument("--line-dedup-max-df", type=int, default=None,
                    help="strip lines appearing in more than this many docs "
                         "(C4/RefinedWeb boilerplate removal)")
    ap.add_argument("--line-dedup-paragraphs", action="store_true",
                    help="dedup at paragraph (blank-line) granularity "
                         "instead of lines")
    ap.add_argument("--lm-ref", default=None,
                    help="reference parquet to train the CCNet bigram LM on")
    ap.add_argument("--max-perplexity", type=float, default=None,
                    help="LM perplexity ceiling (requires --lm-ref)")
    ap.add_argument("--scrub-pii", action="store_true",
                    help="redact emails/IPs/phones before chunking")
    ap.add_argument("--embeddings", default=None,
                    help="embeddings parquet (vec_id aligned with doc_id) "
                         "enabling the SemDeDup semantic-dedup stage")
    ap.add_argument("--semantic-threshold", type=float, default=0.95,
                    help="cosine epsilon-ball radius for SemDeDup")
    ap.add_argument("--semantic-clusters", type=int, default=16,
                    help="k-means cluster count for SemDeDup; size it to "
                         "~corpus/5k so each cluster fits one executor")
    ap.add_argument("--url-col", default=None,
                    help="enable the crawl-frontier stage (canonical-URL "
                         "keep-first dedup) on this column")
    ap.add_argument("--domain-blocklist", default=None,
                    help="text file of blocked hosts (requires --url-col)")
    ap.add_argument("--rank-table", default=None,
                    help="per-domain rank parquet (jobs/run_linkgraph.py "
                         "--rank-out) enabling the link-graph rank stage "
                         "(requires --url-col)")
    ap.add_argument("--rank-col", default="rank")
    ap.add_argument("--min-rank-ratio", type=float, default=None,
                    help="rank keep-rule: score >= ratio/N (1.0 = above "
                         "uniform mass)")
    ap.add_argument("--rank-keep-quantile", type=float, default=None,
                    help="rank keep-rule: keep the top (1-q) quantile")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from readur_spark.plans.curation import curate_to_parquet

    spark = SparkSession.builder.appName("readur_spark_curation").getOrCreate()
    docs = spark.read.parquet(args.input)
    tokenizer = None
    if args.chunk_tokens is not None:
        from readur_spark.operators.bpe import train_bpe_distributed
        from readur_spark.operators.extract import extract_spans
        from readur_spark.streaming.ingest import _text_of

        text_df = (
            _text_of(extract_spans(docs))
            if "spans" in docs.columns
            else docs
        )
        tokenizer = train_bpe_distributed(
            text_df, num_merges=args.bpe_merges
        )
    splits = None
    if args.splits:
        splits = {
            name: float(frac)
            for name, frac in (kv.split("=") for kv in args.splits.split(","))
        }
    metrics = curate_to_parquet(
        spark,
        docs,
        args.output,
        min_quality=args.min_quality,
        require_gopher=not args.no_gopher,
        gopher_stopwords=(
            tuple(args.gopher_stopwords.split(",")) if args.gopher_stopwords else None
        ),
        require_rep_pass=args.rep_filter,
        heldout_df=spark.read.parquet(args.heldout) if args.heldout else None,
        near_dup_threshold=args.near_dup_threshold,
        line_dedup_max_df=args.line_dedup_max_df,
        line_dedup_separator="\n\n" if args.line_dedup_paragraphs else "\n",
        lm_ref_df=spark.read.parquet(args.lm_ref) if args.lm_ref else None,
        max_perplexity=args.max_perplexity,
        scrub_pii=args.scrub_pii,
        embeddings_df=(
            spark.read.parquet(args.embeddings) if args.embeddings else None
        ),
        semantic_threshold=args.semantic_threshold,
        semantic_clusters=args.semantic_clusters,
        chunk_words=args.chunk_words,
        overlap_words=args.overlap,
        chunk_tokenizer=tokenizer,
        chunk_tokens=args.chunk_tokens or 512,
        overlap_tokens=args.overlap_tokens,
        split_fractions=splits,
        url_col=args.url_col,
        domain_blocklist=(
            [
                ln.strip()
                for ln in open(args.domain_blocklist)
                if ln.strip()
            ]
            if args.domain_blocklist
            else None
        ),
        rank_table=(
            spark.read.parquet(args.rank_table) if args.rank_table else None
        ),
        rank_col=args.rank_col,
        min_rank_ratio=args.min_rank_ratio,
        rank_keep_quantile=args.rank_keep_quantile,
    )
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
