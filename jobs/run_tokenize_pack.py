"""Cluster entry point: tokenizer training + training-data layout.

    spark-submit --master <cluster> --py-files dist/readur_spark.zip \
        jobs/run_tokenize_pack.py --input <documents parquet> \
        --output <sequences parquet> [--merges 32000] [--seq-len 2048] \
        [--merges-out merges.txt | --merges-in merges.txt] \
        [--max-words 1000000] [--manifest-out <manifest parquet>]

The complete GPT-style layout pipeline: train (or load) a byte-level
BPE merge table, count tokens per document, cut the corpus stream into
fixed-length sequences with the distributed prefix scan, materialize
the actual token arrays, and write them partitioned by sequence range
(1024 sequences per partition directory — the granularity a data
loader shards on). Prints one JSON line with the run report.

Scale notes: training is one word-count shuffle + a bounded driver
merge loop (truncation surfaced in the report); counting/encoding are
Arrow-batched scan-side passes; the manifest is checkpointed once (the
pack_sequences cache-release contract); the final write is the only
corpus-sized shuffle (groupBy seq_id).
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
    ap.add_argument("--merges", type=int, default=32_000)
    ap.add_argument("--seq-len", type=int, default=2048)
    ap.add_argument("--max-words", type=int, default=1_000_000)
    ap.add_argument("--merges-in", default=None,
                    help="load a previously-trained merge table instead of "
                         "training (one 'a b' pair per line, rank order)")
    ap.add_argument("--merges-out", default=None,
                    help="write the trained merge table here")
    ap.add_argument("--manifest-out", default=None,
                    help="also write the packing manifest parquet")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--id-expr", default=None,
                    help="SQL expression deriving a UNIQUE stream id when "
                         "no single input column is one — e.g. packing "
                         "run_curation.py chunk output: "
                         "\"doc_id * 100000 + chunk_no\". Overrides "
                         "--id-col as the stream-order key.")
    ap.add_argument("--text-col", default="text")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from readur_spark.kernels.bpe import BpeTokenizer
    from readur_spark.operators.bpe import (
        bpe_count_udf,
        bpe_encode_udf,
        train_bpe_distributed,
    )
    from readur_spark.operators.packing import (
        materialize_sequences,
        pack_sequences,
    )
    from readur_spark.session import get_spark

    spark = get_spark(app_name="readur_spark_tokenize_pack")
    docs = spark.read.parquet(args.input)
    if args.id_expr:
        docs = docs.withColumn("__pack_id", F.expr(args.id_expr))
        args.id_col = "__pack_id"

    report: dict = {"input": args.input, "seq_len": args.seq_len}
    if args.merges_in:
        with open(args.merges_in) as fh:
            tok = BpeTokenizer.from_lines(fh.read())
        report["merges"] = {"loaded": args.merges_in,
                           "vocab_size": tok.vocab_size}
    else:
        tok = train_bpe_distributed(
            docs, num_merges=args.merges,
            text_col=args.text_col, max_words=args.max_words,
        )
        report["merges"] = {
            "trained": len(tok.merges),
            "vocab_size": tok.vocab_size,
            **tok.train_stats,
        }
        if args.merges_out:
            with open(args.merges_out, "w") as fh:
                fh.write(tok.to_lines())
            report["merges"]["written"] = args.merges_out

    manifest = pack_sequences(
        docs, seq_len=args.seq_len, id_col=args.id_col,
        text_col=args.text_col, token_counter=bpe_count_udf(tok),
    )
    if args.manifest_out:
        manifest.write.mode("overwrite").parquet(args.manifest_out)
        report["manifest"] = args.manifest_out

    seqs = materialize_sequences(
        docs, manifest, bpe_encode_udf(tok),
        id_col=args.id_col, text_col=args.text_col,
    ).withColumn("seq_part", (F.col("seq_id") / 1024).cast("long"))
    seqs.write.mode("overwrite").partitionBy("seq_part").parquet(args.output)

    out = spark.read.parquet(args.output)
    stats = out.agg(
        F.count("*").alias("n_seqs"),
        F.sum("n_tokens").alias("n_tokens"),
    ).collect()[0]
    report["output"] = args.output
    report["n_sequences"] = int(stats["n_seqs"] or 0)
    report["n_tokens"] = int(stats["n_tokens"] or 0)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
