"""Capture .explain("formatted") for bench queries into plans/r09/.

Usage: python tools/capture_plans.py <suffix> [name ...]

Writes plans/r09/<query>_<suffix>.txt for every bench-suite query (or the
named subset). Plans are captured at $SPARK_GRAFT_SF_DIR (default sf0.1)
on a small core count — plan shape (Exchanges, join strategy, pushed
filters, Python eval nodes) does not depend on core count.
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_SET = [
    "extract_text_spans",
    "normalize_text",
    "lang_id",
    "quality_score",
    "fts_modes",
    "search_ranked",
    "search_ranked_ts",
    "filter_labels",
    "image_quality_stats",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_ngram_capped",
    "dedup_minhash_lsh",
    "pack_sequences",
    "bpe_token_counts",
    "chunk_pack_roundtrip",
    "semdedup",
    "quality_classifier_scores",
    "dsir_weights",
    "dsir_resample_largek",
    "chunk_by_tokens",
    "interleave_pack",
    "domain_pagerank",
    "lm_perplexity",
    "dedup_lines",
    "tfidf_top_terms",
    "dedup_simhash",
    "dedup_embedding",
    "ann_topk_cosine",
    "q1_pricing_summary",
    "top_customers",
    "revenue_by_nation",
    "event_type_stats",
    "sessionize",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry
    from readur_spark.session import get_spark

    spark = get_spark(cores=4, app_name="capture_plans")
    qs = entry.queries()
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r09",
    )
    os.makedirs(outdir, exist_ok=True)
    names = only or BENCH_SET
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            stdout, sys.stdout = sys.stdout, buf
            try:
                df.explain("formatted")
            finally:
                sys.stdout = stdout
            plan = buf.getvalue()
        except Exception as exc:  # capture what we can, keep going
            plan = f"ERROR capturing plan: {exc!r}\n"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"{name}: {len(plan)} bytes")
    spark.stop()


if __name__ == "__main__":
    main()
