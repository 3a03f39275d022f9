"""Job-level incremental recrawl loop (jobs/run_linkgraph.py
--prev-edges / --edges-out / --init-ranks): each run is a REAL separate
process building its own SparkSession — the spark-submit shape — so the
flag wiring, parquet handoff, and warm-start path are exercised exactly
as a cluster user runs them.

Pinned property: crawl1 ranked cold, then crawl2 merged incrementally
(prev edges + warm-started ranks), must equal a cold run over the
concatenated crawl — the merge is exact and the power-iteration fixpoint
is init-independent."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _crawl_rows(seed: int, n: int):
    """Deterministic tiny crawl: doc i on host h{i%7} links to
    h{(i*3+seed)%11} and h{(i+seed)%5}."""
    rows = []
    for i in range(n):
        a = f"h{(i * 3 + seed) % 11}.example"
        b = f"h{(i + seed) % 5}.example"
        html = (
            f'<html><body><a href="http://{a}/p">x</a>'
            f"<a href='http://{b}/q'>y</a></body></html>"
        )
        rows.append((f"{seed}-{i}", f"h{i % 7}.example", html))
    return rows


def _run_job(args: list[str]) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "run_linkgraph.py")]
        + args,
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    report_lines = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("{")
    ]
    assert report_lines, proc.stdout[-2000:]
    return json.loads(report_lines[-1])


def test_job_incremental_recrawl_equals_cold_combined(spark, tmp_path):
    crawl1 = spark.createDataFrame(
        _crawl_rows(1, 60), "doc_id string, domain string, html string"
    )
    crawl2 = spark.createDataFrame(
        _crawl_rows(2, 60), "doc_id string, domain string, html string"
    )
    p1 = str(tmp_path / "crawl1")
    p2 = str(tmp_path / "crawl2")
    pboth = str(tmp_path / "crawl_both")
    crawl1.write.parquet(p1)
    crawl2.write.parquet(p2)
    crawl1.unionByName(crawl2).write.parquet(pboth)

    e1 = str(tmp_path / "edges1")
    r1 = str(tmp_path / "ranks1")
    rep1 = _run_job(
        ["--input", p1, "--rank-out", r1, "--edges-out", e1,
         "--iters", "40", "--tol", "1e-10"]
    )
    assert rep1["edges_out"] == e1
    assert rep1["mode"] == "pagerank"

    # incremental: crawl2 merged into crawl1's edge table, ranks
    # warm-started from crawl1's vector
    e2 = str(tmp_path / "edges2")
    r2 = str(tmp_path / "ranks2")
    rep2 = _run_job(
        ["--input", p2, "--rank-out", r2, "--edges-out", e2,
         "--prev-edges", e1, "--init-ranks", r1,
         "--iters", "40", "--tol", "1e-10"]
    )
    assert rep2["mode_edges"] == "incremental"
    assert rep2["rank_iterations"]["converged"] is True

    # cold control over the concatenated crawl
    r3 = str(tmp_path / "ranks3")
    rep3 = _run_job(
        ["--input", pboth, "--rank-out", r3,
         "--iters", "40", "--tol", "1e-10"]
    )
    assert rep3["n_edges"] == rep2["n_edges"]

    warm = {
        row["node"]: row["rank"]
        for row in spark.read.parquet(r2).collect()
    }
    cold = {
        row["node"]: row["rank"]
        for row in spark.read.parquet(r3).collect()
    }
    assert set(warm) == set(cold)
    for node, rank in cold.items():
        assert warm[node] == pytest.approx(rank, abs=1e-8), node

    # the merged weighted table counts every (src, dst) from both crawls
    merged = {
        (row["src"], row["dst"]): row["weight"]
        for row in spark.read.parquet(e2).collect()
    }
    assert all(w >= 1.0 for w in merged.values())
    assert rep2["n_edges_new_crawl"] <= len(merged)
