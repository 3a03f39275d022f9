"""WARC-at-volume extraction bench (round-5 verdict, next-round #10).

Builds a multi-hundred-MB synthetic crawl in the Common Crawl layout
(per-record-gzip .warc.gz shards of full HTML pages with nav/footer
boilerplate), then times the two ingestion paths over the SAME pages:

* WARC path: ``read_warc`` (one task per shard — crawl files ARE the
  partitioning) → HTML main-content extraction;
* parquet path: the pages pre-landed in parquet → the same extraction.

The delta isolates the gzip-member + WARC-header parse overhead at
file-batch scale. Prints one JSON line with shard count/bytes, docs/s
for both paths, and the partition counts proving file-level parallelism
held. Run quiet (no concurrent Spark).

Usage: python tools/warc_bench.py [REP] [FATTEN]
(default REP=20 → 100k pages; FATTEN=60 sha2-hex paragraphs ≈ +4 KB of
~half-compressible body text per page → a multi-hundred-MB crawl)
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    FATTEN = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import pandas as pd
    from pyspark.sql import functions as F

    from readur_spark.session import get_spark
    from readur_spark.sources.tables import interleaved_docs
    from readur_spark.sources.warc import build_warc, read_warc

    spark = get_spark(cores=cpus, app_name="readur_spark_warc_bench")
    n_cores = int(cpus)
    root = tempfile.mkdtemp(prefix="readur_warc_bench_")
    warc_dir = f"{root}/warc"
    pq_dir = f"{root}/pages.parquet"
    os.makedirs(warc_dir, exist_ok=True)

    # ---- corpus: the interleaved fixture's html span, replicated -------
    base = interleaved_docs(spark, sf_dir, with_html=True).select(
        "doc_id",
        F.expr("filter(spans, s -> s.kind = 'html')")[0]["text"].alias("html"),
    ).filter(F.col("html").isNotNull())
    # Fatten each page toward real-web weight (10-100 KB; the fixture
    # html span is ~2 KB): append FATTEN sha2-chain paragraphs of
    # per-page-unique hex words inside <body>. Hex hashes are ~50%
    # gzip-compressible (vs ~95% for repeated text), so the landed
    # .warc.gz bytes are an honest multi-hundred-MB crawl weight and the
    # per-record parse overhead is measured against realistic payloads.
    filler = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(FATTEN)),
            lambda i: F.sha2(
                F.concat_ws("#", F.col("doc_id"), F.col("r"), i), 256
            ),
        ),
    )
    pages = (
        base.select(
            F.explode(F.sequence(F.lit(1), F.lit(rep))).alias("r"),
            "doc_id",
            "html",
        )
        .select(
            F.concat_ws("-", "doc_id", "r").alias("doc_id"),
            F.concat(
                F.regexp_replace("html", "</body></html>$", ""),
                F.lit('<div id="detail"><p>'),
                filler,
                F.lit("</p></div></body></html>"),
            ).alias("html"),
        )
        .repartition(2 * n_cores)
    )
    pages.write.mode("overwrite").parquet(pq_dir)
    pages = spark.read.parquet(pq_dir)
    n_pages = pages.count()

    # ---- land the same pages as .warc.gz shards, one per partition ----
    def write_shard(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            recs = [
                {
                    "warc_type": "response",
                    "target_uri": f"https://example.test/{d}",
                    "payload": h.encode("utf-8"),
                    "http_content_type": "text/html",
                }
                for d, h in zip(pdf["doc_id"], pdf["html"])
            ]
            data = build_warc(recs, gzip_per_record=True)
            pid = abs(hash(str(pdf["doc_id"].iloc[0]))) % (1 << 40)
            with open(f"{warc_dir}/shard-{pid:012x}.warc.gz", "wb") as f:
                f.write(data)
            yield pd.DataFrame({"n": [len(recs)]})

    landed = (
        pages.mapInPandas(write_shard, "n long")
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    shards = sorted(glob.glob(f"{warc_dir}/*.warc.gz"))
    total_bytes = sum(os.path.getsize(p) for p in shards)

    # ---- shared extraction stage (Arrow-batched html main content) ----
    def extract(df, col):
        def run(batches):
            from readur_spark.kernels.htmlmain import extract_main_content

            for pdf in batches:
                texts, words = [], []
                for h in pdf[col]:
                    if isinstance(h, (bytes, bytearray)):
                        h = bytes(h).decode("utf-8", "replace")
                    spans = extract_main_content(h or "")
                    t = "\n\n".join(
                        s["text"] for s in spans if s.get("kind") == "text"
                    )
                    texts.append(t)
                    words.append(len(t.split()))
                yield pd.DataFrame({"text": texts, "n_words": words})

        return df.mapInPandas(run, "text string, n_words long")

    def timed(df, col):
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            total = extract(df, col).agg(F.sum("n_words")).collect()[0][0]
            runs.append(time.perf_counter() - t0)
        return min(runs), int(total)

    # WARC path (parse + extract)
    warc_df = read_warc(spark, f"{warc_dir}/*.warc.gz")
    warc_parts = warc_df.rdd.getNumPartitions()
    t_warc, words_warc = timed(warc_df, "payload")

    # parquet path (same pages, no container parse)
    t_pq, words_pq = timed(pages, "html")

    print(
        json.dumps(
            {
                "rep": rep,
                "fatten": FATTEN,
                "n_pages": n_pages,
                "landed_records": int(landed),
                "shards": len(shards),
                "warc_bytes": total_bytes,
                "warc_read_partitions": warc_parts,
                "warc_path": {
                    "wall_s": round(t_warc, 1),
                    "docs_per_s": round(n_pages / t_warc, 1),
                    "warc_mb_per_s": round(total_bytes / t_warc / 1e6, 1),
                    "total_words": words_warc,
                },
                "parquet_path": {
                    "wall_s": round(t_pq, 1),
                    "docs_per_s": round(n_pages / t_pq, 1),
                    "total_words": words_pq,
                },
                "words_equal": words_warc == words_pq,
                "load_1m": round(os.getloadavg()[0], 2),
            }
        )
    )
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
