"""Cluster entry point: multimodal interleaved training-data layout.

    spark-submit --master <cluster> --py-files dist/readur_spark.zip \
        jobs/run_interleave_pack.py --input <interleaved parquet> \
        --output <sequences parquet> [--seq-len 2048] \
        [--image-tokens 64] [--audio-tokens 128] [--video-tokens 256] \
        [--merges-in merges.txt] [--manifest-out <manifest parquet>] \
        [--drop-cut-media]

The multimodal companion to run_tokenize_pack: consume the north-rule
interleaved table ``(doc_id, spans: array<struct<kind, text, media_ref,
offset>>)``, cut the global span stream into fixed-length sequences
(text spans counted by the regex pre-tokenizer, or a BPE tokenizer
loaded via ``--merges-in``; media spans occupy fixed per-kind token
blocks), materialize the element sequences, and write them partitioned
by sequence range (1024 sequences per partition directory).

``--drop-cut-media`` applies the standard loader policy engine-side:
media elements whose block was split by a sequence boundary are removed
from the materialized elements (the manifest keeps them, so the report
can state exactly how much was dropped — no silent truncation).

Scale notes: the span-stream prefix scan is the same bucketed two-phase
design as pack_sequences (one metadata-scale collect, no
single-partition exchange); the groupBy(seq_id) assembly is the only
corpus-sized shuffle; all text handling is Catalyst or Arrow-batched.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--seq-len", type=int, default=2048)
    ap.add_argument("--image-tokens", type=int, default=64)
    ap.add_argument("--audio-tokens", type=int, default=128)
    ap.add_argument("--video-tokens", type=int, default=256)
    ap.add_argument("--media-tokens", type=int, default=None,
                    help="flat budget for EVERY non-text kind (overrides "
                         "the per-kind flags; use when the corpus has "
                         "kinds beyond image/audio/video)")
    ap.add_argument("--merges-in", default=None,
                    help="BPE merge table ('a b' per line, rank order): "
                         "count and encode text spans trainer-faithfully "
                         "instead of with the regex pre-tokenizer")
    ap.add_argument("--manifest-out", default=None)
    ap.add_argument("--drop-cut-media", action="store_true")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--spans-col", default="spans")
    ap.add_argument("--text-kinds", default="text",
                    help="comma-separated kinds counted as text")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from readur_spark.operators.interleave import (
        build_interleaved_sequences,
        interleave_stats,
        materialize_interleaved,
    )
    from readur_spark.session import get_spark

    spark = get_spark(app_name="readur_spark_interleave_pack")
    docs = spark.read.parquet(args.input)
    text_kinds = tuple(k for k in args.text_kinds.split(",") if k)

    if args.media_tokens is not None:
        costs: int | dict = args.media_tokens
    else:
        costs = {
            "image": args.image_tokens,
            "audio": args.audio_tokens,
            "video": args.video_tokens,
        }

    if args.merges_in:
        from readur_spark.kernels.bpe import BpeTokenizer
        from readur_spark.operators.bpe import bpe_count_udf, bpe_encode_udf

        with open(args.merges_in) as fh:
            tok = BpeTokenizer.from_lines(fh.read())
        counter, encoder = bpe_count_udf(tok), bpe_encode_udf(tok)
        tokenizer = {"merges_in": args.merges_in, "vocab_size": tok.vocab_size}
    else:
        counter = None  # regex pre-tokenizer default

        def encoder(c):
            # id = character length of each regex token: a deterministic
            # stand-in encoding that keeps the job runnable without a
            # merge table (loaders wanting real ids pass --merges-in)
            return F.transform(
                F.regexp_extract_all(
                    c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0
                ),
                lambda t: F.length(t),
            )

        tokenizer = {"regex_pretokenizer": True}

    report: dict = {
        "input": args.input,
        "seq_len": args.seq_len,
        "tokenizer": tokenizer,
        "media_token_cost": costs,
    }

    manifest = build_interleaved_sequences(
        docs,
        seq_len=args.seq_len,
        id_col=args.id_col,
        spans_col=args.spans_col,
        media_token_cost=costs,
        token_counter=counter,
        text_kinds=text_kinds,
    )
    if args.manifest_out:
        manifest.write.mode("overwrite").parquet(args.manifest_out)
        report["manifest"] = args.manifest_out

    st = interleave_stats(manifest, args.seq_len, text_kinds=text_kinds).agg(
        F.count("*").alias("n_seqs"),
        F.sum("n_text_tokens").alias("text_tokens"),
        F.sum("n_media_tokens").alias("media_tokens"),
    ).collect()[0]
    report["n_sequences"] = int(st["n_seqs"] or 0)
    report["text_tokens"] = int(st["text_tokens"] or 0)
    report["media_tokens"] = int(st["media_tokens"] or 0)
    # media counts at BLOCK granularity from the manifest: summing the
    # per-sequence stats would count a boundary-straddling block once
    # per sequence it touches (review finding), overstating the
    # drop-cut-media accounting
    is_media = ~F.col("kind").isin(*text_kinds)
    blocks = manifest.filter(is_media).groupBy(
        args.id_col, "span_idx"
    ).agg(F.max(F.col("straddles").cast("int")).alias("cut"))
    bl = blocks.agg(
        F.count("*").alias("n_media"), F.sum("cut").alias("n_cut")
    ).collect()[0]
    report["n_media"] = int(bl["n_media"] or 0)
    report["n_cut_media"] = int(bl["n_cut"] or 0)

    mat_manifest = manifest
    if args.drop_cut_media:
        # loader policy, engine-side: drop split media blocks BEFORE
        # materializing, so their placeholders never enter the element
        # stream (n_cut_media above records exactly how much was
        # dropped; their positions stay reserved — sequence length
        # bookkeeping is unchanged, the loader sees a pad gap)
        mat_manifest = manifest.filter(
            F.col("kind").isin(*text_kinds) | ~F.col("straddles")
        )
    seqs = materialize_interleaved(
        docs,
        mat_manifest,
        encoder,
        id_col=args.id_col,
        spans_col=args.spans_col,
        text_kinds=text_kinds,
    )
    seqs = seqs.withColumn("seq_part", (F.col("seq_id") / 1024).cast("long"))
    seqs.write.mode("overwrite").partitionBy("seq_part").parquet(args.output)

    out = spark.read.parquet(args.output)
    stats = out.agg(
        F.count("*").alias("n"), F.sum("n_tokens").alias("t")
    ).collect()[0]
    report["output"] = args.output
    report["written_sequences"] = int(stats["n"] or 0)
    report["written_tokens"] = int(stats["t"] or 0)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
