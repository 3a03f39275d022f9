"""Link-graph curation signals: outlink extraction, domain graph,
distributed PageRank, and domain blocklist filtering.

A web-scale corpus carries a quality signal no per-document filter can
see: the link structure. Common Crawl publishes per-domain rank tables
(harmonic centrality / PageRank over the host graph) and production
curation pipelines use them both ways — keep well-linked domains,
drop link-farm islands. Reference analog: readur tracks per-source
provenance and cross-references documents by source
(/root/reference/src/routes/sources.rs, src/db/documents) — at web
scale the cross-reference graph between sources IS the host link graph,
and ranking it is the curation step.

Scale shape:
* outlink extraction is ONE codegen'd pass — ``regexp_extract_all`` +
  ``explode``; no UDF, no shuffle before the per-domain aggregate;
* the domain graph is a project + distinct (one shuffle on the edge
  pair);
* PageRank is the canonical join + groupBy power iteration: edges are
  hash-partitioned on ``src`` ONCE and persisted, each iteration
  re-joins the (node, rank) table — at 10^8 domains both sides are
  far beyond broadcast, and the shuffle-hash join on a uniform domain
  key is the right plan. Every iteration ends in an eager
  ``localCheckpoint`` so the logical plan stays O(1) in iterations
  (the same lineage-truncation discipline as the LR classifier loop,
  operators/quality_classifier.py);
* blocklist filtering broadcasts the blocklist (curated lists are
  10^4-10^6 hosts — kilobytes to megabytes) into an anti-join.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from readur_spark.functions.urls import canonical_url_col

#: href attribute values, double-quoted (the dominant form in real
#: markup; single-quoted/unquoted attrs are a deliberate non-goal —
#: the extractor is a corpus-statistics tool, not a browser)
HREF_RE = r'href="([^"]+)"'


def domain_of(url_col) -> F.Column:
    """Lowercased host (no port, no userinfo) of an absolute URL;
    empty string for scheme-relative/relative references."""
    return F.lower(
        F.regexp_extract(
            url_col, r"^[A-Za-z][A-Za-z0-9+.\-]*://(?:[^/?#@]*@)?([^/?#:]+)", 1
        )
    )


def extract_outlinks(
    docs: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    base_domain_col: str | None = None,
) -> DataFrame:
    """One row per (document, outlink): ``href`` targets pulled from the
    markup, canonicalized (functions/urls contract), with the target
    domain. Relative references (no scheme) keep an empty ``dst_domain``
    unless ``base_domain_col`` names a column to attribute them to.

    Pure Catalyst: regexp_extract_all → explode → canonicalize. The
    explode multiplies rows ~50× on real pages (avg outlinks/page) but
    stays pipelined — no shuffle until whatever aggregate follows."""
    extra = [F.col(base_domain_col)] if base_domain_col else []
    links = docs.select(
        F.col(id_col),
        *extra,
        F.explode(
            F.regexp_extract_all(F.col(html_col), F.lit(HREF_RE), 1)
        ).alias("href"),
    )
    dst = domain_of(F.col("href"))
    if base_domain_col:
        dst = F.when(dst == "", F.lower(F.col(base_domain_col))).otherwise(
            dst
        )
    return links.select(
        F.col(id_col),
        canonical_url_col(F.col("href")).alias("target_url"),
        dst.alias("dst_domain"),
    )


def build_domain_graph(
    outlinks: DataFrame,
    src_domain_col: str = "src_domain",
    dst_domain_col: str = "dst_domain",
) -> DataFrame:
    """Distinct (src, dst) domain edges, self-loops and empty hosts
    dropped — the host graph PageRank runs on. One shuffle (distinct on
    the pair)."""
    return (
        outlinks.select(
            F.col(src_domain_col).alias("src"),
            F.col(dst_domain_col).alias("dst"),
        )
        .filter(
            (F.col("src") != "")
            & (F.col("dst") != "")
            & (F.col("src") != F.col("dst"))
        )
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """PageRank by power iteration over a (src, dst) edge table.
    Returns (node, rank); ranks sum to 1 across nodes.

    Semantics (the standard formulation, Page et al. 1999):
    rank' (v) = (1-d)/N + d·(Σ_{u→v} rank(u)/outdeg(u) + dangling/N)
    where ``dangling`` is the total rank mass on nodes with no
    outlinks, redistributed uniformly — so mass is conserved exactly
    and the result is a probability distribution at every iteration.

    Scale shape: nodes = distinct(src ∪ dst) and the per-src outdegree
    are computed once and PERSISTED pre-partitioned on the join key;
    each iteration is one shuffle-hash join (ranks ⋈ edges on src) +
    one groupBy(dst) — both on the same uniform domain-hash key — plus
    a scalar dangling-mass aggregate, and ends in an eager
    localCheckpoint so the plan never grows with ``iters``. No
    collect() ever holds more than one scalar."""
    from readur_spark.plans.curation import _release_checkpoint

    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    # edges ⋈ outdeg once, pre-partitioned on src — every iteration's
    # join reuses this layout instead of re-shuffling the edge table
    edeg = (
        e.join(outdeg, "src")
        .repartition("src")
        .persist()
    )
    edeg.count()  # materialize before the loop
    # the DANGLING NODE SET is loop-invariant: materialize it once.
    # Re-deriving it per iteration (ranks anti-join outdeg) re-executed
    # the whole upstream edge plan — corpus-scale extraction work ×
    # iters when edges is a lazy view over extract_outlinks (review
    # finding); only the rank MASS on these nodes changes per step.
    danglers = nodes.join(
        edeg.select("src").distinct(),
        nodes["node"] == F.col("src"),
        "left_anti",
    ).localCheckpoint(eager=True)

    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint(
        eager=True
    )
    base = (1.0 - damping) / n
    for _ in range(iters):
        # rank mass parked on dangling nodes (no outgoing edges)
        dangling = (
            ranks.join(danglers, "node", "left_semi")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .first()[0]
        )
        contribs = (
            edeg.join(ranks, edeg["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("outdeg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inmass"))
        )
        new_ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inmass"), F.lit(0.0))
                        + F.lit(dangling / n)
                    )
                ).alias("rank"),
            )
        )
        old = ranks
        ranks = new_ranks.localCheckpoint(eager=True)
        _release_checkpoint(old)
    edeg.unpersist()
    _release_checkpoint(danglers)
    _release_checkpoint(nodes)
    return ranks


def filter_by_domain_blocklist(
    docs: DataFrame,
    blocklist: Iterable[str] | DataFrame,
    domain_col: str = "domain",
) -> DataFrame:
    """Drop documents whose domain is on the blocklist (UT1-style
    curated host lists). The blocklist side is explicitly broadcast —
    curated lists are 10^4-10^6 hosts, megabytes at most — so the
    anti-join is map-side at any corpus scale."""
    spark = docs.sparkSession
    if isinstance(blocklist, DataFrame):
        bl = blocklist.select(
            F.lower(F.col(blocklist.columns[0])).alias("__blocked")
        )
    else:
        hosts = sorted({h.lower() for h in blocklist})
        bl = spark.createDataFrame(
            [(h,) for h in hosts], "__blocked string"
        )
    return docs.join(
        F.broadcast(bl.distinct()),
        F.lower(F.col(domain_col)) == F.col("__blocked"),
        "left_anti",
    )


#: anchor elements whose text is a single run of non-markup characters —
#: same corpus-statistics scope line as HREF_RE (nested markup inside
#: the anchor is a non-goal for the statistics pass)
ANCHOR_RE = r'<a\s[^>]*href="([^"]+)"[^>]*>([^<]+)</a>'


def extract_anchor_texts(
    docs: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per (document, anchor): the canonical target URL, its
    domain, and the whitespace-collapsed anchor text — the classic
    relevance signal (anchor text describes the TARGET document, so
    aggregating it per target yields training-quality labels the target
    page itself can't fake).

    Pure Catalyst: TWO ``regexp_extract_all`` passes over the same
    pattern (Spark extracts one group index per call), zipped
    positionally — still a single codegen'd scan, no UDF, no shuffle."""
    pairs = docs.select(
        F.col(id_col),
        F.explode(
            F.arrays_zip(
                F.regexp_extract_all(F.col(html_col), F.lit(ANCHOR_RE), 1).alias(
                    "href"
                ),
                F.regexp_extract_all(F.col(html_col), F.lit(ANCHOR_RE), 2).alias(
                    "anchor"
                ),
            )
        ).alias("z"),
    )
    anchor = F.trim(F.regexp_replace(F.col("z.anchor"), r"\s+", " "))
    return pairs.select(
        F.col(id_col),
        canonical_url_col(F.col("z.href")).alias("target_url"),
        domain_of(F.col("z.href")).alias("dst_domain"),
        anchor.alias("anchor_text"),
    ).filter(F.col("anchor_text") != "")


def anchor_text_stats(
    anchors: DataFrame, top_k: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """Per-target anchor profile: ``(target_url, n_anchors, n_docs,
    n_unique_texts, top_anchors)`` with ``top_anchors`` the ``top_k``
    most frequent anchor texts (ties broken lexicographically — 
    deterministic across runs and engines).

    Two shuffles, both on uniform keys: (target, text) counts, then a
    per-target window for the top-k cut — rank ≤ k keeps the state
    bounded per target regardless of in-degree (a mega-hub with 10^7
    anchors never collects more than k rows past the window)."""
    from pyspark.sql.window import Window

    counts = anchors.groupBy("target_url", "anchor_text").agg(
        F.count("*").alias("c"),
        F.countDistinct(id_col).alias("d"),
    )
    w = Window.partitionBy("target_url").orderBy(
        F.desc("c"), F.asc("anchor_text")
    )
    ranked = counts.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("target_url")
        .agg(
            F.sum("c").cast("long").alias("n_anchors"),
            F.sum("d").cast("long").alias("n_doc_anchor_pairs"),
            F.count("*").cast("long").alias("n_unique_texts"),
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("rn") <= top_k,
                        F.struct("rn", F.col("anchor_text").alias("t")),
                    )
                )
            ).alias("__top__"),
        )
        .select(
            "target_url",
            "n_anchors",
            "n_doc_anchor_pairs",
            "n_unique_texts",
            F.transform(F.col("__top__"), lambda s: s["t"]).alias(
                "top_anchors"
            ),
        )
    )


def domain_degree_stats(edges: DataFrame) -> DataFrame:
    """Per-domain degree profile over a distinct (src, dst) edge table:
    ``(domain, out_degree, in_degree, reciprocal_degree)`` —
    ``reciprocal_degree`` counting neighbors linked in BOTH directions
    (the mutual-link signal link farms inflate; Common Crawl's host
    ranks publish exactly this family of columns).

    Scale shape: two groupBy passes on uniform domain keys plus one
    self-join of the edge table against its own reversal for the
    reciprocal count — all shuffles on the same key family, no
    broadcast needed, no driver materialization."""
    out_d = edges.groupBy(F.col("src").alias("domain")).agg(
        F.count("*").alias("out_degree")
    )
    in_d = edges.groupBy(F.col("dst").alias("domain")).agg(
        F.count("*").alias("in_degree")
    )
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    recip = (
        edges.join(rev, ["src", "dst"], "left_semi")
        .groupBy(F.col("src").alias("domain"))
        .agg(F.count("*").alias("reciprocal_degree"))
    )
    return (
        out_d.join(in_d, "domain", "full")
        .join(recip, "domain", "left")
        .select(
            "domain",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
            F.coalesce("reciprocal_degree", F.lit(0)).alias(
                "reciprocal_degree"
            ),
        )
    )


def domain_components(
    edges: DataFrame, max_iter: int = 100
) -> DataFrame:
    """Weakly-connected components of the host graph with component
    sizes: ``(node, component, component_size)``, component = the
    lexicographically smallest member — the link-farm-ISLAND signal
    (spam networks form dense components disconnected from the main
    web; curation keeps the giant component and inspects the rest).

    Reuses the near-dup clustering engine
    (:func:`readur_spark.operators.dedup.connected_components`:
    iterative min-label propagation, one join + one map-side-combining
    groupBy per round, per-round localCheckpoint keeping the plan O(1),
    early stop on convergence). Host graphs have larger diameters than
    near-dup clusters, hence the raised ``max_iter`` (propagation stops
    as soon as labels stabilize, so the bound is a guard, not a cost).
    Component size is one window over the label — same uniform key."""
    from pyspark.sql.window import Window

    from readur_spark.operators.dedup import connected_components

    comp = connected_components(
        edges.select(
            F.col("src").alias("id_a"), F.col("dst").alias("id_b")
        ),
        max_iter=max_iter,
    )
    w = Window.partitionBy("component")
    return comp.select(
        F.col("id").alias("node"),
        "component",
        F.count("*").over(w).cast("long").alias("component_size"),
    )
