"""Cluster entry point: link-graph curation over a crawled HTML corpus.

    spark-submit --master <cluster> --py-files dist/readur_spark.zip \
        jobs/run_linkgraph.py --input <parquet with html + base domain> \
        --rank-out <per-domain rank parquet> \
        [--docs-out <rank-filtered docs parquet>] \
        [--html-col html] [--id-col doc_id] [--domain-col domain] \
        [--damping 0.85] [--iters 20] [--tol 1e-7] \
        [--trust-seeds seeds.txt | --trust-seeds-table <parquet>] \
        [--blocklist <hosts.txt>] [--weighted-degrees] \
        [--degrees-out <parquet>] [--min-rank-ratio 1.0]

Pipeline: extract_outlinks (all three HTML attribute quoting forms) →
build_domain_graph → PageRank — or TrustRank when seeds are given — with
delta-based early stop → optional blocklist filter and per-domain degree
stats → optional rank-join doc filter (keep documents whose domain ranks
at least ``min-rank-ratio × uniform``). Prints one JSON line of run
metrics (edge/node counts, iterations run, convergence delta, survivor
counts).

Scale notes: outlink extraction is codegen'd regex (no UDF); the rank
loop is one shuffle join + one groupBy per iteration on the uniform
domain key with per-iteration localCheckpoint; blocklists and seed sets
broadcast. The same shapes the 10^7-edge probe times in
tools/linkgraph_bench.py.
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
    ap.add_argument("--rank-out", required=True)
    ap.add_argument("--docs-out", default=None)
    ap.add_argument("--degrees-out", default=None)
    ap.add_argument("--html-col", default="html")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--domain-col", default="domain",
                    help="the page's own (source) domain column")
    ap.add_argument("--damping", type=float, default=0.85)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--tol", type=float, default=1e-7)
    ap.add_argument("--trust-seeds", default=None,
                    help="text file, one trusted host per line -> TrustRank")
    ap.add_argument("--trust-seeds-table", default=None,
                    help="parquet whose first column is the trusted host")
    ap.add_argument("--blocklist", default=None,
                    help="text file, one blocked host per line")
    ap.add_argument("--weighted-degrees", action="store_true")
    ap.add_argument("--harmonic-out", default=None,
                    help="also run HyperBall and write per-domain "
                         "(reach_est, harmonic, t_converged) — computed "
                         "over REVERSED edges (who can reach me), the "
                         "classic centrality direction")
    ap.add_argument("--harmonic-p", type=int, default=8)
    ap.add_argument("--min-rank-ratio", type=float, default=1.0,
                    help="docs-out keeps domains with rank >= ratio/N")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from readur_spark.operators.linkgraph import (
        build_domain_graph,
        domain_degree_stats,
        extract_outlinks,
        filter_by_domain_blocklist,
        pagerank,
        trustrank,
    )
    from readur_spark.session import get_spark

    spark = get_spark(app_name="readur_spark_linkgraph")
    docs = spark.read.parquet(args.input)
    report: dict = {"input": args.input}

    links = extract_outlinks(
        docs,
        html_col=args.html_col,
        id_col=args.id_col,
        base_domain_col=args.domain_col,
        passthrough_cols=[args.domain_col],
    ).withColumn("src_domain", F.lower(F.col(args.domain_col)))
    edges = build_domain_graph(links).localCheckpoint(eager=True)
    report["n_edges"] = edges.count()

    stats: dict = {}
    if args.trust_seeds or args.trust_seeds_table:
        if args.trust_seeds_table:
            # lowercase to the graph's host contract (src is lowered
            # above, domain_of lowers dst) — mixed-case seeds would
            # silently miss the node table otherwise (review finding)
            tbl = spark.read.parquet(args.trust_seeds_table)
            seeds = tbl.select(
                F.lower(F.col(tbl.columns[0]).cast("string")).alias(
                    "node"
                ),
                *[F.col(c) for c in tbl.columns[1:2]],
            )
        else:
            with open(args.trust_seeds) as fh:
                seeds = [ln.strip().lower() for ln in fh if ln.strip()]
        ranks = trustrank(
            edges, seeds, damping=args.damping, iters=args.iters,
            tol=args.tol, stats=stats,
        )
        report["mode"] = "trustrank"
    else:
        ranks = pagerank(
            edges, damping=args.damping, iters=args.iters,
            tol=args.tol, stats=stats,
        )
        report["mode"] = "pagerank"
    # the rank distribution normalizes over the FULL graph, so the
    # min-rank-ratio threshold must divide by the pre-blocklist node
    # count — counting the filtered parquet would silently tighten the
    # cutoff whenever a blocklist is supplied (review finding)
    n_graph_nodes = ranks.count()
    if args.blocklist:
        with open(args.blocklist) as fh:
            hosts = [ln.strip() for ln in fh if ln.strip()]
        ranks = filter_by_domain_blocklist(ranks, hosts, domain_col="node")
        report["blocklist_hosts"] = len(hosts)
    ranks.write.mode("overwrite").parquet(args.rank_out)
    report.update(
        {
            "n_graph_nodes": n_graph_nodes,
            "n_nodes": spark.read.parquet(args.rank_out).count(),
            "rank_iterations": stats,
        }
    )

    if args.degrees_out:
        deg_edges = (
            build_domain_graph(links, weighted=True)
            if args.weighted_degrees
            else edges
        )
        domain_degree_stats(
            deg_edges,
            weight_col="weight" if args.weighted_degrees else None,
        ).write.mode("overwrite").parquet(args.degrees_out)
        report["degrees_out"] = args.degrees_out

    if args.harmonic_out:
        from readur_spark.operators.neighborhood import hyperball

        hstats: dict = {}
        hyperball(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            ),
            p=args.harmonic_p,
            stats=hstats,
        ).write.mode("overwrite").parquet(args.harmonic_out)
        report["harmonic"] = {
            "out": args.harmonic_out,
            "rounds": hstats.get("rounds_run"),
            "converged": hstats.get("converged"),
        }

    if args.docs_out:
        threshold = args.min_rank_ratio / max(n_graph_nodes, 1)
        keep = spark.read.parquet(args.rank_out).filter(
            F.col("rank") >= threshold
        ).select(F.col("node").alias("__keep_domain"))
        kept = docs.join(
            keep,
            F.lower(F.col(args.domain_col)) == F.col("__keep_domain"),
            "left_semi",
        )
        kept.write.mode("overwrite").parquet(args.docs_out)
        report["n_docs_in"] = docs.count()
        report["n_docs_kept"] = spark.read.parquet(args.docs_out).count()

    from readur_spark.plans.curation import _release_checkpoint

    _release_checkpoint(edges)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
