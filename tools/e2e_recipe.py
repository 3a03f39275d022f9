"""End-to-end recipe (r7 verdict, next-round #4): the full
"crawl → curated training sequences" path a real user runs, chained
through the ACTUAL cluster entry points as separate processes (each job
builds its own SparkSession exactly as spark-submit would):

    stage 0  synthesize a crawl corpus from $SF_DIR/documents.parquet
             (deterministic urls, domains, link markup; a 5% link-farm
             island whose domains rank below uniform)
    stage 1  jobs/run_linkgraph.py   crawl → per-domain PageRank table
             (+ --edges-out: the persisted weighted edge table)
    stage 1b jobs/run_linkgraph.py   RECRAWL (perturbed links) merged
             incrementally: --prev-edges + --init-ranks + --decay — the
             warm-started re-rank must converge in no more iterations
             than the cold run (r8 incremental loop, job-shaped)
    stage 2  jobs/run_curation.py    crawl + rank table → curated chunks
             (crawl-frontier URL dedup → rank filter → quality → dedup
             funnel, all inside ONE checkpointed curate() run — the
             r8 rank_table stage)
    stage 3  jobs/run_tokenize_pack.py  chunks → fixed-length training
             sequences (BPE train + distributed prefix-scan packing)

Prints ONE JSON line with per-stage walls, row counts, and the funnel
metrics each job reported. Results are recorded in BASELINE.md.

Usage: python tools/e2e_recipe.py [SF_DIR] [WORKDIR]
(default /root/testdata/sf0.1, /tmp/e2e_recipe)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def synthesize_crawl(sf_dir: str, out: str, cpus: int, churn: int = 0) -> dict:
    """Stage 0: documents → a crawl table (doc_id, url, domain, html,
    text). 1-in-20 docs belong to a 5-domain link-farm island that only
    links internally — its domains receive no mass from the main graph
    and rank below uniform, which is what stage 2's rank filter drops."""
    from pyspark.sql import functions as F

    from readur_spark.session import get_spark

    spark = get_spark(cores=cpus, app_name="e2e_recipe_synth")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    is_farm = (F.col("doc_id") % 20) == 0
    domain = F.when(
        is_farm,
        F.concat(F.lit("farm"), (F.col("doc_id") % 5).cast("string"),
                 F.lit(".spam")),
    ).otherwise(
        F.concat(F.lit("h"), (F.col("doc_id") % 97).cast("string"),
                 F.lit(".example"))
    )
    url = F.concat(F.lit("https://"), domain, F.lit("/d/"),
                   F.col("doc_id").cast("string"))
    # farm docs link only inside the island; normal docs link across
    # the main domain family (two outlinks, mixed quoting forms)
    link_dst = F.when(
        is_farm,
        F.concat(F.lit("farm"), ((F.col("doc_id") + 1) % 5).cast("string"),
                 F.lit(".spam")),
    ).otherwise(
        F.concat(F.lit("h"),
                 ((F.col("doc_id") * 13 + 5 + churn) % 97).cast("string"),
                 F.lit(".example"))
    )
    link_dst2 = F.when(
        is_farm,
        F.concat(F.lit("farm"), ((F.col("doc_id") + 2) % 5).cast("string"),
                 F.lit(".spam")),
    ).otherwise(
        F.concat(F.lit("h"),
                 ((F.col("doc_id") * 7 + 11 + churn) % 97).cast("string"),
                 F.lit(".example"))
    )
    html = F.concat(
        F.lit("<html><body><p>"), F.col("text"), F.lit("</p>"),
        F.lit('<a href="https://'), link_dst, F.lit('/p">next</a>'),
        F.lit("<a href='https://"), link_dst2, F.lit("/q'>more</a>"),
        F.lit("</body></html>"),
    )
    crawl = docs.select(
        "doc_id", url.alias("url"), domain.alias("domain"),
        html.alias("html"), "text",
    )
    crawl.write.mode("overwrite").parquet(out)
    n = spark.read.parquet(out).count()
    spark.stop()
    return {"n_docs": n}


def run_job(argv: list[str]) -> tuple[dict, float]:
    """Run a jobs/*.py entry as its own process (the spark-submit
    shape), return (its JSON report line, wall seconds)."""
    t0 = time.perf_counter()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable] + argv,
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    wall = time.perf_counter() - t0
    if proc.returncode != 0:
        raise RuntimeError(
            f"{argv[1]} failed ({proc.returncode}):\n{proc.stderr[-4000:]}"
        )
    report = {}
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            report = json.loads(line)
            break
    return report, wall


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/e2e_recipe"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)
    crawl = f"{work}/crawl"
    ranks = f"{work}/ranks"
    chunks = f"{work}/chunks"
    seqs = f"{work}/sequences"
    out: dict = {"sf_dir": sf_dir, "cpus": cpus}

    t0 = time.perf_counter()
    out["stage0_synth"] = synthesize_crawl(sf_dir, crawl, cpus)
    out["stage0_wall_s"] = round(time.perf_counter() - t0, 1)

    report, wall = run_job([
        "jobs/run_linkgraph.py",
        "--input", crawl,
        "--rank-out", ranks,
        "--edges-out", f"{work}/edges1",
        "--iters", "30", "--tol", "1e-7",
    ])
    out["stage1_linkgraph"] = report
    out["stage1_wall_s"] = round(wall, 1)
    cold_iters = report["rank_iterations"]["iterations_run"]

    # stage 1b: a RECRAWL with ~2% link churn, merged into the persisted
    # edge table and re-ranked from the previous vector — the incremental
    # loop a production crawler runs daily
    crawl2 = f"{work}/crawl2"
    ranks2 = f"{work}/ranks2"
    t0 = time.perf_counter()
    synthesize_crawl(sf_dir, crawl2, cpus, churn=2)
    report, wall = run_job([
        "jobs/run_linkgraph.py",
        "--input", crawl2,
        "--rank-out", ranks2,
        "--prev-edges", f"{work}/edges1",
        "--init-ranks", ranks,
        "--decay", "0.9",
        "--edges-out", f"{work}/edges2",
        "--iters", "30", "--tol", "1e-7",
    ])
    out["stage1b_recrawl"] = report
    out["stage1b_wall_s"] = round(time.perf_counter() - t0, 1)
    warm_iters = report["rank_iterations"]["iterations_run"]
    assert report["mode_edges"] == "incremental"
    assert report["rank_iterations"]["converged"], report
    assert warm_iters <= cold_iters, (warm_iters, cold_iters)
    out["iterations_cold_vs_warm"] = [cold_iters, warm_iters]

    report, wall = run_job([
        "jobs/run_curation.py",
        "--input", crawl,
        "--output", chunks,
        "--url-col", "url",
        "--rank-table", ranks2,
        "--min-rank-ratio", "0.5",
        "--gopher-stopwords", "the,a,table,value,row,key",
        "--chunk-words", "128", "--overlap", "32",
    ])
    out["stage2_curation"] = report
    out["stage2_wall_s"] = round(wall, 1)

    report, wall = run_job([
        "jobs/run_tokenize_pack.py",
        "--input", chunks,
        "--output", seqs,
        "--id-expr", "doc_id * 100000 + chunk_no",
        "--text-col", "chunk_text",
        "--merges", "2000",
        "--seq-len", "1024",
    ])
    out["stage3_tokenize_pack"] = report
    out["stage3_wall_s"] = round(wall, 1)

    out["total_wall_s"] = round(
        out["stage0_wall_s"] + out["stage1_wall_s"] + out["stage1b_wall_s"]
        + out["stage2_wall_s"] + out["stage3_wall_s"], 1
    )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
