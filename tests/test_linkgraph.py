"""Link-graph operators: outlink extraction, domain graph, PageRank
(pinned against an exact pure-Python power-iteration replay), and the
broadcast blocklist anti-join."""

import pytest
from pyspark.sql import functions as F


def _pagerank_naive(edges, nodes, damping=0.85, iters=5):
    """Reference power iteration — same formulation the operator
    documents (dangling mass redistributed uniformly)."""
    n = len(nodes)
    outdeg = {}
    adj = {}
    for s, d in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
        adj.setdefault(s, []).append(d)
    ranks = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dangling = sum(r for v, r in ranks.items() if v not in outdeg)
        inmass = {v: 0.0 for v in nodes}
        for s, ds in adj.items():
            share = ranks[s] / outdeg[s]
            for d in ds:
                inmass[d] += share
        ranks = {
            v: (1 - damping) / n
            + damping * (inmass[v] + dangling / n)
            for v in nodes
        }
    return ranks


EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"), ("d", "a"),
    # e is dangling (no outlinks), only receives
    ("a", "e"),
]
NODES = ["a", "b", "c", "d", "e"]


def test_pagerank_matches_naive_replay(spark):
    from readur_spark.operators.linkgraph import pagerank

    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=7).collect()}
    want = _pagerank_naive(EDGES, NODES, iters=7)
    assert set(got) == set(want)
    for v in NODES:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    # mass conserved: a probability distribution
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_zero_iters_is_uniform_and_empty_graph(spark):
    from readur_spark.operators.linkgraph import pagerank

    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=0).collect()}
    assert all(v == pytest.approx(1 / 5) for v in got.values())
    empty = spark.createDataFrame([], "src string, dst string")
    assert pagerank(empty, iters=3).collect() == []
    with pytest.raises(ValueError):
        pagerank(df, iters=-1)


def test_pagerank_releases_its_checkpoints(spark):
    from readur_spark.operators.linkgraph import pagerank

    sc = spark.sparkContext
    before = sc._jsc.getPersistentRDDs().size()
    df = spark.createDataFrame(EDGES, "src string, dst string")
    out = pagerank(df, iters=4)
    out.count()
    after = sc._jsc.getPersistentRDDs().size()
    # only the returned frame's checkpoint may remain
    assert after - before <= 1


def test_extract_outlinks_and_domains(spark):
    from readur_spark.operators.linkgraph import extract_outlinks

    rows = [
        (1, 'x <a href="https://B.com:443/p?utm_source=x&k=1">t</a> '
            'y <a href="/relative/page">r</a> '
            '<a href="http://c.org/q#frag">u</a>', "a.com"),
        (2, "no links here", "d.net"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string, dom string")
    got = extract_outlinks(df, base_domain_col="dom").collect()
    by = {(r["doc_id"], r["target_url"]): r["dst_domain"] for r in got}
    assert by[(1, "https://b.com/p?k=1")] == "b.com"
    # relative link attributed to the page's own domain
    assert by[(1, "/relative/page")] == "a.com"
    assert by[(1, "http://c.org/q")] == "c.org"
    assert not [r for r in got if r["doc_id"] == 2]


def test_domain_of_handles_ports_userinfo_relative(spark):
    from readur_spark.operators.linkgraph import domain_of

    rows = [
        ("https://User:pw@Host.COM:8443/x",),
        ("http://plain.org/y",),
        ("/relative",),
        ("mailto:someone@example.com",),
    ]
    df = spark.createDataFrame(rows, "u string")
    got = [r["d"] for r in df.select(domain_of(F.col("u")).alias("d")).collect()]
    assert got[0] == "host.com"
    assert got[1] == "plain.org"
    assert got[2] == ""
    # mailto: has no ://, treated as relative (empty domain)
    assert got[3] == ""


def test_build_domain_graph_drops_self_loops_and_dups(spark):
    from readur_spark.operators.linkgraph import build_domain_graph

    rows = [
        ("a.com", "b.com"), ("a.com", "b.com"), ("a.com", "a.com"),
        ("", "b.com"), ("b.com", ""), ("b.com", "c.com"),
    ]
    df = spark.createDataFrame(rows, "src_domain string, dst_domain string")
    got = {(r["src"], r["dst"]) for r in build_domain_graph(df).collect()}
    assert got == {("a.com", "b.com"), ("b.com", "c.com")}


def test_filter_by_domain_blocklist(spark):
    from readur_spark.operators.linkgraph import filter_by_domain_blocklist

    docs = spark.createDataFrame(
        [(1, "Spam.BIZ"), (2, "ok.org"), (3, "ads.example")],
        "doc_id long, domain string",
    )
    got = filter_by_domain_blocklist(docs, ["spam.biz", "ads.example"])
    assert [r["doc_id"] for r in got.collect()] == [2]
    # DataFrame-typed blocklist, and the plan broadcasts it
    bl = spark.createDataFrame([("SPAM.biz",)], "host string")
    out = filter_by_domain_blocklist(docs, bl)
    assert sorted(r["doc_id"] for r in out.collect()) == [2, 3]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan, plan


def test_pagerank_plan_stays_bounded_across_iters(spark):
    # the eager localCheckpoint must keep the returned plan O(1) in
    # iteration count — a growing plan means lineage was not truncated
    from readur_spark.operators.linkgraph import pagerank

    df = spark.createDataFrame(EDGES, "src string, dst string")
    p2 = pagerank(df, iters=2)._jdf.queryExecution().executedPlan().toString()
    p6 = pagerank(df, iters=6)._jdf.queryExecution().executedPlan().toString()
    assert abs(len(p6) - len(p2)) < 200, (len(p2), len(p6))


def test_extract_anchor_texts(spark):
    from readur_spark.operators.linkgraph import (
        anchor_text_stats,
        extract_anchor_texts,
    )

    rows = [
        (1, '<a class="x" href="https://E.com/a?utm_source=z">  Click\n here </a>'
            '<a href="https://e.com/a">click here</a>'
            '<a href="https://e.com/a"><b>nested</b> kept</a>'
            '<a href="/rel">rel text</a>'),
        (2, '<a href="https://e.com/a">Click here</a>'
            '<a href="https://other.org/b">Other</a>'),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, html string")
    a = extract_anchor_texts(docs)
    got = sorted(
        (r["doc_id"], r["target_url"], r["dst_domain"], r["anchor_text"])
        for r in a.collect()
    )
    assert got == [
        (1, "/rel", "", "rel text"),
        (1, "https://e.com/a", "e.com", "Click here"),
        (1, "https://e.com/a", "e.com", "click here"),
        (1, "https://e.com/a", "e.com", "nested kept"),
        (2, "https://e.com/a", "e.com", "Click here"),
        (2, "https://other.org/b", "other.org", "Other"),
    ]
    st = {
        r["target_url"]: r
        for r in anchor_text_stats(a, top_k=1).collect()
    }
    e = st["https://e.com/a"]
    assert e["n_anchors"] == 4 and e["n_unique_texts"] == 3
    assert e["top_anchors"] == ["Click here"]  # freq 2 beats 1


def test_domain_degree_stats(spark):
    from readur_spark.operators.linkgraph import domain_degree_stats

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "c"), ("d", "a")],
        "src string, dst string",
    )
    got = {
        r["domain"]: (r["out_degree"], r["in_degree"], r["reciprocal_degree"])
        for r in domain_degree_stats(edges).collect()
    }
    # a: out {b,c}, in {b,d}, reciprocal {b}; c: sink; d: source
    assert got == {
        "a": (2, 2, 1),
        "b": (1, 1, 1),
        "c": (0, 1, 0),
        "d": (1, 0, 0),
    }


def test_domain_components_islands(spark):
    from readur_spark.operators.linkgraph import domain_components

    edges = spark.createDataFrame(
        # island 1: a-b-c chain (directed edges; components are WEAK)
        [("a", "b"), ("c", "b"),
         # island 2: d <-> e
         ("d", "e"), ("e", "d"),
         # island 3: f alone via self-edge filtered upstream? use f-g
         ("f", "g")],
        "src string, dst string",
    )
    got = {
        r["node"]: (r["component"], r["component_size"])
        for r in domain_components(edges).collect()
    }
    assert got == {
        "a": ("a", 3), "b": ("a", 3), "c": ("a", 3),
        "d": ("d", 2), "e": ("d", 2),
        "f": ("f", 2), "g": ("f", 2),
    }


def test_href_values_all_quoting_forms(spark):
    """HTML admits double-quoted, single-quoted, and unquoted attribute
    values; all three must extract (r6 review finding — the
    double-quote-only regex silently lost a biased slice of edges)."""
    from readur_spark.operators.linkgraph import href_values

    html = (
        '<a href="https://d.com/a">d</a>'
        "<a href='https://s.com/b'>s</a>"
        "<a href=https://u.com/c>u</a>"
        '<a HREF="https://up.com/d">case</a>'
        '<a href = "https://sp.com/e">spaced</a>'
        "<a href=/rel/f class=x>unquoted stops at space</a>"
    )
    docs = spark.createDataFrame([(1, html)], "doc_id long, html string")
    got = sorted(docs.select(href_values("html").alias("h")).first()["h"])
    assert got == sorted(
        [
            "https://d.com/a",
            "https://s.com/b",
            "https://u.com/c",
            "https://up.com/d",
            "https://sp.com/e",
            "/rel/f",
        ]
    )


def test_extract_outlinks_equality_on_double_quoted_corpus(spark):
    """On strictly double-quoted markup the widened extractor is
    pair-for-pair identical to the legacy single-form regex."""
    from pyspark.sql import functions as F

    from readur_spark.operators.linkgraph import extract_outlinks

    rows = [
        (i, f'<p>x</p><a href="https://h{i % 7}.com/p?a=1&utm_x=2">t</a>'
            f'<a href="/rel/{i % 3}">r</a>'
            f'<a href="http://c{i % 5}.org/q#f">u</a>')
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, html string")
    legacy = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(
                F.col("html"), F.lit(r'href="([^"]+)"'), 1
            )
        ).alias("href"),
    )
    from readur_spark.functions.urls import canonical_url_col
    from readur_spark.operators.linkgraph import domain_of

    want = sorted(
        (r["doc_id"], r["target_url"], r["dst_domain"])
        for r in legacy.select(
            "doc_id",
            canonical_url_col(F.col("href")).alias("target_url"),
            domain_of(F.col("href")).alias("dst_domain"),
        ).collect()
    )
    got = sorted(
        (r["doc_id"], r["target_url"], r["dst_domain"])
        for r in extract_outlinks(docs).collect()
    )
    assert got == want


def test_href_values_fuzz_pages_match_python_reference(spark):
    """The three codegen'd patterns agree pair-for-pair with an
    independent Python ``re`` reimplementation on the adversarial fuzz
    pages (single-quoted boilerplate links, glitch fragments, truncated
    fetches — tests/test_htmlmain_adversarial.py's generator)."""
    import random
    import re as _re

    from readur_spark.operators.linkgraph import (
        HREF_RE,
        HREF_RE_SINGLE,
        HREF_RE_UNQUOTED,
        HREF_UNQUOTED_GROUP,
        href_values,
    )
    from tests.test_htmlmain_adversarial import _page

    rng = random.Random(20260818)
    pages = [(i, _page(rng)) for i in range(200)]

    def pyref(html):
        out = []
        for pat, grp in (
            (HREF_RE, 1),
            (HREF_RE_SINGLE, 1),
            (HREF_RE_UNQUOTED, HREF_UNQUOTED_GROUP),
        ):
            out.extend(m.group(grp) for m in _re.finditer(pat, html))
        return out

    docs = spark.createDataFrame(pages, "doc_id long, html string")
    got = {
        r["doc_id"]: r["h"]
        for r in docs.select(
            "doc_id", href_values("html").alias("h")
        ).collect()
    }
    total = 0
    for i, html in pages:
        assert got[i] == pyref(html), (i, html[:200])
        total += len(got[i])
    # the corpus's boilerplate links are single-quoted: the widened
    # extractor must actually SEE them
    assert total > 200


def test_href_unquoted_ignores_js_and_data_attributes(spark):
    """The unquoted pattern must not fire on JavaScript property
    assignments (``location.href=url;``) or lookalike attribute names
    (``data-href=...``, ``xhref=...``) — r7 advisor finding. Real
    unquoted attributes (space/tag-start/quote-delimited prefixes, and
    a document that BEGINS with ``href=``) still extract."""
    from readur_spark.operators.linkgraph import href_values

    rows = [
        (1, "<script>location.href=url;window.href=next</script>"
            "<a data-href=/decoy/1 href=/real/1>x</a>"
            "<a xhref=/decoy/2>y</a>"),
        (2, "href=/at-start <a href=/mid>z</a>"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, html string")
    got = {
        r["doc_id"]: r["h"]
        for r in docs.select(
            "doc_id", href_values("html").alias("h")
        ).collect()
    }
    assert got[1] == ["/real/1"]
    assert got[2] == ["/at-start", "/mid"]


def test_extract_anchor_texts_widened_forms(spark):
    from readur_spark.operators.linkgraph import extract_anchor_texts

    rows = [
        (1, "<a href='https://s.com/x'>single <b>quoted</b></a>"
            "<a href=https://u.com/y>unquoted<br>line</a>"
            '<A HREF="https://c.com/z">CASE</A>'
            '<a name="no-href">skip: no href</a>'
            '<a href="https://k.com/w"><link href="https://decoy.com/d">'
            "body text</a>"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, html string")
    got = sorted(
        (r["target_url"], r["dst_domain"], r["anchor_text"])
        for r in extract_anchor_texts(docs).collect()
    )
    # the nested <link href> decoy must NOT become the anchor target —
    # only the opening tag's href counts
    assert got == [
        ("https://c.com/z", "c.com", "CASE"),
        ("https://k.com/w", "k.com", "body text"),
        ("https://s.com/x", "s.com", "single quoted"),
        ("https://u.com/y", "u.com", "unquoted line"),
    ]


def test_pagerank_early_stop_equals_fixed_iters(spark):
    """With a tight tolerance the loop stops early, and the result is
    bit-identical to running exactly stats['iterations_run'] fixed
    iterations — early stop changes WHEN the loop ends, never the
    recurrence."""
    from readur_spark.operators.linkgraph import pagerank

    df = spark.createDataFrame(EDGES, "src string, dst string")
    stats = {}
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, iters=60, tol=1e-10, stats=stats).collect()
    }
    assert stats["converged"] is True
    assert 0 < stats["iterations_run"] < 60
    assert stats["final_delta"] <= 1e-10
    fixed = {
        r["node"]: r["rank"]
        for r in pagerank(df, iters=stats["iterations_run"]).collect()
    }
    assert got == fixed
    # converged means converged: one more iteration moves nothing
    plus1 = {
        r["node"]: r["rank"]
        for r in pagerank(df, iters=stats["iterations_run"] + 1).collect()
    }
    for v in got:
        assert got[v] == pytest.approx(plus1[v], abs=1e-9)


def test_pagerank_tol_not_reached_reports_unconverged(spark):
    from readur_spark.operators.linkgraph import pagerank

    df = spark.createDataFrame(EDGES, "src string, dst string")
    stats = {}
    pagerank(df, iters=2, tol=0.0, stats=stats).collect()
    assert stats["iterations_run"] == 2
    assert stats["converged"] is False
    assert stats["final_delta"] > 0.0
    with pytest.raises(ValueError):
        pagerank(df, tol=-1.0)


def test_build_domain_graph_weighted_multiplicity(spark):
    from readur_spark.operators.linkgraph import (
        build_domain_graph,
        domain_degree_stats,
    )

    rows = [
        ("a.com", "b.com"), ("a.com", "b.com"), ("a.com", "b.com"),
        ("a.com", "c.com"), ("b.com", "a.com"), ("a.com", "a.com"),
        ("", "b.com"),
    ]
    df = spark.createDataFrame(rows, "src_domain string, dst_domain string")
    w = {
        (r["src"], r["dst"]): r["weight"]
        for r in build_domain_graph(df, weighted=True).collect()
    }
    assert w == {
        ("a.com", "b.com"): 3,
        ("a.com", "c.com"): 1,
        ("b.com", "a.com"): 1,
    }
    st = {
        r["domain"]: r
        for r in domain_degree_stats(
            build_domain_graph(df, weighted=True), weight_col="weight"
        ).collect()
    }
    # weighted out-degree of a.com counts the 3× multiplicity
    assert st["a.com"]["out_degree"] == 4
    assert st["b.com"]["in_degree"] == 3
    # reciprocal stays a distinct-neighbor count in weighted mode
    assert st["a.com"]["reciprocal_degree"] == 1
    assert st["b.com"]["reciprocal_degree"] == 1
    assert st["c.com"]["reciprocal_degree"] == 0


def _trustrank_naive(edges, nodes, seeds, damping=0.85, iters=5):
    """Reference personalized power iteration: teleport, dangling
    re-entry, and the initial vector all follow the seed distribution."""
    s = [v for v in nodes if v in set(seeds)]
    t = {v: (1.0 / len(s) if v in set(s) else 0.0) for v in nodes}
    outdeg, adj = {}, {}
    for a, b in edges:
        outdeg[a] = outdeg.get(a, 0) + 1
        adj.setdefault(a, []).append(b)
    ranks = dict(t)
    for _ in range(iters):
        dangling = sum(r for v, r in ranks.items() if v not in outdeg)
        inmass = {v: 0.0 for v in nodes}
        for a, ds in adj.items():
            share = ranks[a] / outdeg[a]
            for b in ds:
                inmass[b] += share
        ranks = {
            v: (1 - damping) * t[v]
            + damping * (inmass[v] + dangling * t[v])
            for v in nodes
        }
    return ranks


def test_trustrank_matches_naive_replay(spark):
    from readur_spark.operators.linkgraph import trustrank

    df = spark.createDataFrame(EDGES, "src string, dst string")
    seeds = ["a", "d", "zz-not-in-graph"]
    got = {
        r["node"]: r["rank"]
        for r in trustrank(df, seeds, iters=7).collect()
    }
    want = _trustrank_naive(EDGES, NODES, {"a", "d"}, iters=7)
    assert set(got) == set(want)
    for v in NODES:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    # mass conserved under seed-restricted teleport
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_trustrank_unreachable_island_gets_zero(spark):
    from readur_spark.operators.linkgraph import trustrank

    edges = EDGES + [("x", "y"), ("y", "x")]  # island, no seed
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: r["rank"] for r in trustrank(df, ["a"], iters=6).collect()
    }
    assert got["x"] == 0.0 and got["y"] == 0.0
    assert got["a"] > 0


def test_trustrank_uniform_seed_set_equals_pagerank(spark):
    from readur_spark.operators.linkgraph import pagerank, trustrank

    df = spark.createDataFrame(EDGES, "src string, dst string")
    pr = {r["node"]: r["rank"] for r in pagerank(df, iters=5).collect()}
    tr = {
        r["node"]: r["rank"]
        for r in trustrank(df, NODES, iters=5).collect()
    }
    for v in NODES:
        assert tr[v] == pytest.approx(pr[v], abs=1e-12)


def test_trustrank_rejects_empty_seed_intersection(spark):
    from readur_spark.operators.linkgraph import trustrank

    df = spark.createDataFrame(EDGES, "src string, dst string")
    with pytest.raises(ValueError, match="no positive mass|at least one"):
        trustrank(df, ["nope"], iters=3)
    with pytest.raises(ValueError, match="at least one"):
        trustrank(df, [], iters=3)


def test_trustrank_weighted_seeds_and_checkpoint_release(spark):
    from readur_spark.operators.linkgraph import trustrank

    sc = spark.sparkContext
    before = sc._jsc.getPersistentRDDs().size()
    df = spark.createDataFrame(EDGES, "src string, dst string")
    seeds = spark.createDataFrame(
        [("a", 3.0), ("d", 1.0)], "node string, w double"
    )
    got = {r["node"]: r["rank"] for r in trustrank(df, seeds, iters=4).collect()}
    t = {"a": 3.0 / 4.0, "d": 1.0 / 4.0}
    naive_t = {v: t.get(v, 0.0) for v in NODES}
    ranks = dict(naive_t)
    outdeg, adj = {}, {}
    for a, b in EDGES:
        outdeg[a] = outdeg.get(a, 0) + 1
        adj.setdefault(a, []).append(b)
    for _ in range(4):
        dangling = sum(r for v, r in ranks.items() if v not in outdeg)
        inmass = {v: 0.0 for v in NODES}
        for a, ds in adj.items():
            for b in ds:
                inmass[b] += ranks[a] / outdeg[a]
        ranks = {
            v: 0.15 * naive_t[v] + 0.85 * (inmass[v] + dangling * naive_t[v])
            for v in NODES
        }
    for v in NODES:
        assert got[v] == pytest.approx(ranks[v], abs=1e-12)
    after = sc._jsc.getPersistentRDDs().size()
    assert after - before <= 1  # only the returned frame may persist


def test_extract_outlinks_passthrough_cols(spark):
    from readur_spark.operators.linkgraph import extract_outlinks

    rows = [(1, '<a href="https://b.com/p">t</a>', "a.com", "en")]
    df = spark.createDataFrame(
        rows, "doc_id long, html string, dom string, lang string"
    )
    got = extract_outlinks(
        df, base_domain_col="dom", passthrough_cols=["dom", "lang"]
    ).collect()
    assert [(r["dst_domain"], r["dom"], r["lang"]) for r in got] == [
        ("b.com", "a.com", "en")
    ]


def test_trustrank_rejects_negative_weights(spark):
    from readur_spark.operators.linkgraph import trustrank

    df = spark.createDataFrame(EDGES, "src string, dst string")
    seeds = spark.createDataFrame(
        [("a", 2.0), ("d", -1.0)], "node string, w double"
    )
    with pytest.raises(ValueError, match="non-negative"):
        trustrank(df, seeds, iters=3)


def test_merge_edge_tables_hand_computed(spark):
    """Incremental edge merge: weights sum across crawls, decay scales
    the old table, unweighted input counts as weight 1, and decayed-
    to-zero edges drop."""
    from readur_spark.operators.linkgraph import merge_edge_tables

    old = spark.createDataFrame(
        [("a", "b", 3.0), ("a", "c", 2.0), ("d", "e", 1.0)],
        "src string, dst string, weight double",
    )
    new = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 5.0)],
        "src string, dst string, weight double",
    )
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in merge_edge_tables(old, new).collect()
    }
    assert got == {
        ("a", "b"): 4.0,
        ("a", "c"): 2.0,
        ("d", "e"): 1.0,
        ("b", "c"): 5.0,
    }
    # decay halves the old weights; decay=0 forgets them entirely
    half = {
        (r["src"], r["dst"]): r["weight"]
        for r in merge_edge_tables(old, new, decay=0.5).collect()
    }
    assert half[("a", "b")] == 2.5 and half[("d", "e")] == 0.5
    gone = {
        (r["src"], r["dst"]): r["weight"]
        for r in merge_edge_tables(old, new, decay=0.0).collect()
    }
    assert gone == {("a", "b"): 1.0, ("b", "c"): 5.0}
    # unweighted (distinct) tables merge as weight-1 edges
    unw = spark.createDataFrame([("x", "y")], "src string, dst string")
    got2 = {
        (r["src"], r["dst"]): r["weight"]
        for r in merge_edge_tables(unw, unw).collect()
    }
    assert got2 == {("x", "y"): 2.0}
    with pytest.raises(ValueError, match="decay"):
        merge_edge_tables(old, new, decay=1.5)


def test_merge_edge_tables_prune_below_drops_stale_edges(spark):
    """Decay alone only shrinks weights — rank runs over the (src, dst)
    projection, so a decayed-but-present edge still ranks like a live
    one (r8 review finding). prune_below is what makes forgetting
    reach the rank graph: merged edges below the threshold DROP."""
    from readur_spark.operators.linkgraph import merge_edge_tables

    old = spark.createDataFrame(
        [("a", "b", 1.0), ("a", "c", 4.0)],
        "src string, dst string, weight double",
    )
    new = spark.createDataFrame(
        [("a", "c", 1.0)], "src string, dst string, weight double"
    )
    # a->b decays to 0.4 (< 0.5): pruned. a->c decays to 1.6 + 1 new.
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in merge_edge_tables(
            old, new, decay=0.4, prune_below=0.5
        ).collect()
    }
    assert got == {("a", "c"): pytest.approx(2.6)}
    # without prune_below the stale edge persists at its decayed weight
    kept = {
        (r["src"], r["dst"]): r["weight"]
        for r in merge_edge_tables(old, new, decay=0.4).collect()
    }
    assert kept[("a", "b")] == pytest.approx(0.4)
    with pytest.raises(ValueError, match="prune_below"):
        merge_edge_tables(old, new, prune_below=-1.0)


def test_pagerank_init_ranks_non_numeric_raises(spark):
    """A malformed previous rank vector must raise loudly, not throw an
    opaque ANSI cast error mid-stage or silently reseed the node at 1/N
    (r8 review finding; mirrors the teleport __nbad validation)."""
    from readur_spark.operators.linkgraph import pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    bad = spark.createDataFrame(
        [("a", "0.5"), ("b", "junk"), ("c", "0.2")],
        "node string, rank string",
    )
    with pytest.raises(ValueError, match="non-numeric"):
        pagerank(edges, iters=2, init_ranks=bad)
    # numeric strings are fine (the cast is lenient, not strict typing)
    ok = spark.createDataFrame(
        [("a", "0.5"), ("b", "0.3"), ("c", "0.2")],
        "node string, rank string",
    )
    ranks = {r["node"]: r["rank"] for r in pagerank(edges, iters=0, init_ranks=ok).collect()}
    assert ranks["a"] == pytest.approx(0.5)


def test_pagerank_warm_start_converges_to_cold_fixpoint(spark):
    """Incremental recrawl loop (r7 verdict, next-round #8): merge a
    new crawl's edges, warm-start pagerank from the previous rank
    vector — same fixpoint as a cold start (init-independence of the
    power iteration), in fewer iterations."""
    from readur_spark.operators.linkgraph import (
        merge_edge_tables,
        pagerank,
    )

    crawl1 = spark.createDataFrame(
        [(s, d, 1.0) for s, d in EDGES],
        "src string, dst string, weight double",
    )
    # the recrawl adds a new host f and a few repeat links
    crawl2 = spark.createDataFrame(
        [("a", "b", 2.0), ("e", "f", 1.0), ("f", "a", 1.0)],
        "src string, dst string, weight double",
    )
    merged = merge_edge_tables(crawl1, crawl2)

    # damping 0.5 so the 1e-12 fixpoint is reachable in ~40 power
    # iterations (contraction factor d per step)
    prev = pagerank(
        spark.createDataFrame(EDGES, "src string, dst string"),
        damping=0.5,
        iters=60,
        tol=1e-12,
    ).localCheckpoint(eager=True)

    cold_stats: dict = {}
    cold = {
        r["node"]: r["rank"]
        for r in pagerank(
            merged, damping=0.5, iters=60, tol=1e-12, stats=cold_stats
        ).collect()
    }
    warm_stats: dict = {}
    warm = {
        r["node"]: r["rank"]
        for r in pagerank(
            merged,
            damping=0.5,
            iters=60,
            tol=1e-12,
            stats=warm_stats,
            init_ranks=prev,
        ).collect()
    }
    assert set(warm) == set(cold) and "f" in warm
    for v in cold:
        assert warm[v] == pytest.approx(cold[v], abs=1e-9)
    assert warm_stats["converged"] and cold_stats["converged"]
    assert warm_stats["iterations_run"] < cold_stats["iterations_run"]
    # mass stays a probability distribution
    assert sum(warm.values()) == pytest.approx(1.0, abs=1e-9)

    # validation: negative / zero-mass init raises
    bad = spark.createDataFrame(
        [("a", -1.0)], "node string, rank double"
    )
    with pytest.raises(ValueError, match="init_ranks"):
        pagerank(merged, iters=3, init_ranks=bad)


def test_anchor_quality_features_hand_computed(spark):
    """Inbound-anchor features joined onto target docs: hand-built
    anchors pointing at doc u1 (3 anchors, 2 texts, 2 source docs) and
    u2 (1 anchor), doc u3 never linked (zero-fill branch)."""
    from readur_spark.operators.linkgraph import anchor_quality_features

    anchors = spark.createDataFrame(
        [
            (10, "https://a.com/u1", "click here"),
            (10, "https://a.com/u1", "click here"),
            (11, "https://a.com/u1", "deep dive"),
            (11, "https://a.com/u2", "two"),
        ],
        "doc_id long, target_url string, anchor_text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "https://a.com/u1"),
            (2, "https://a.com/u2"),
            (3, "https://a.com/u3"),
        ],
        "doc_id long, url string",
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in anchor_quality_features(docs, anchors).collect()
    }
    u1 = got[1]
    assert u1["n_inlink_anchors"] == 3
    assert u1["n_linking_docs"] == 2
    assert u1["n_unique_anchor_texts"] == 2
    assert u1["anchor_diversity"] == pytest.approx(2 / 3)
    assert u1["top_anchor_share"] == pytest.approx(2 / 3)
    # len mean weighted by count: (10*2 + 9*1) / 3
    assert u1["anchor_text_len_mean"] == pytest.approx(29 / 3)
    u2 = got[2]
    assert u2["n_inlink_anchors"] == 1
    assert u2["anchor_diversity"] == pytest.approx(1.0)
    assert u2["top_anchor_share"] == pytest.approx(1.0)
    u3 = got[3]
    assert u3["n_inlink_anchors"] == 0
    assert u3["n_linking_docs"] == 0
    assert u3["anchor_diversity"] == 0.0
    assert u3["top_anchor_share"] == 0.0
    assert u3["anchor_text_len_mean"] == 0.0
    # original doc columns preserved, in order
    assert list(got[1])[:2] == ["doc_id", "url"]


def test_anchor_quality_features_canonicalizes_join_key(spark):
    """Raw anchor hrefs and doc URLs meet through canonicalization
    (fragment strip, host lowercase) — a raw-vs-canonical mismatch
    must not silently zero the features."""
    from readur_spark.operators.linkgraph import anchor_quality_features

    anchors = spark.createDataFrame(
        [(10, "https://A.com/u1#frag", "text")],
        "doc_id long, target_url string, anchor_text string",
    )
    docs = spark.createDataFrame(
        [(1, "https://a.com/u1")], "doc_id long, url string"
    )
    row = anchor_quality_features(docs, anchors).collect()[0]
    assert row["n_inlink_anchors"] == 1


def test_trustrank_rejects_non_numeric_weights(spark):
    """A string weight that casts to NULL must raise, not silently
    give the seed trust 0 (r7 advisor finding) — including the mixed
    case where the same node also has a good row."""
    from readur_spark.operators.linkgraph import trustrank

    df = spark.createDataFrame(EDGES, "src string, dst string")
    seeds = spark.createDataFrame(
        [("a", "2.0"), ("a", "high"), ("d", "1.0")],
        "node string, w string",
    )
    with pytest.raises(ValueError, match="non-numeric"):
        trustrank(df, seeds, iters=3)
    # numeric strings still work: cast succeeds, no raise
    ok = spark.createDataFrame(
        [("a", "2.0"), ("d", "1.0")], "node string, w string"
    )
    assert trustrank(df, ok, iters=2).count() > 0


def test_trustrank_null_raw_weight_rows_are_skipped_not_rejected(spark):
    """A genuinely-NULL raw weight is a skip (SQL aggregate
    semantics), distinct from the non-numeric raise."""
    from readur_spark.operators.linkgraph import trustrank

    df = spark.createDataFrame(EDGES, "src string, dst string")
    seeds = spark.createDataFrame(
        [("a", 2.0), ("d", None)], "node string, w double"
    )
    assert trustrank(df, seeds, iters=2).count() > 0


def _hits_replay(edges, iters):
    """Pure-numpy HITS replay: same update order (authority from hubs,
    hubs from NEW authorities), same L2 normalization per step."""
    import numpy as np

    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for u, v in edges:
        A[idx[u], idx[v]] = 1.0
    h = np.full(n, 1.0 / n ** 0.5)
    a = np.full(n, 1.0 / n ** 0.5)
    for _ in range(iters):
        a = A.T @ h
        a = a / np.linalg.norm(a)
        h = A @ a
        h = h / np.linalg.norm(h)
    return {v: (h[idx[v]], a[idx[v]]) for v in nodes}


def test_hits_matches_numpy_replay(spark):
    from readur_spark.operators.linkgraph import hits

    edges = [
        ("hub1", "auth1"), ("hub1", "auth2"), ("hub1", "auth3"),
        ("hub2", "auth1"), ("hub2", "auth2"),
        ("auth1", "auth2"),  # authorities may link too
        ("lone", "auth3"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    stats: dict = {}
    got = {
        r["node"]: (r["hub"], r["authority"])
        for r in hits(df, iters=12, stats=stats).collect()
    }
    want = _hits_replay(edges, 12)
    assert set(got) == set(want)
    for v, (wh, wa) in want.items():
        assert got[v][0] == pytest.approx(wh, abs=1e-9), ("hub", v)
        assert got[v][1] == pytest.approx(wa, abs=1e-9), ("authority", v)
    assert stats["iterations_run"] == 12
    # the 3-outlink directory is the top hub; the doubly-cited page a
    # top authority
    top_hub = max(got, key=lambda v: got[v][0])
    assert top_hub == "hub1"
    import math

    assert math.isclose(
        sum(h * h for h, _ in got.values()), 1.0, abs_tol=1e-9
    )
    assert math.isclose(
        sum(a * a for _, a in got.values()), 1.0, abs_tol=1e-9
    )


def test_hits_early_stop_matches_fixed_iterations(spark):
    from readur_spark.operators.linkgraph import hits

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
    df = spark.createDataFrame(edges, "src string, dst string")
    stats: dict = {}
    early = {
        r["node"]: (r["hub"], r["authority"])
        for r in hits(df, iters=50, tol=1e-12, stats=stats).collect()
    }
    assert stats["converged"] is True
    assert stats["iterations_run"] < 50
    fixed = {
        r["node"]: (r["hub"], r["authority"])
        for r in hits(df, iters=stats["iterations_run"]).collect()
    }
    for v in early:
        assert early[v][0] == pytest.approx(fixed[v][0], abs=1e-12)
        assert early[v][1] == pytest.approx(fixed[v][1], abs=1e-12)


def test_hits_validation_and_release(spark):
    from readur_spark.operators.linkgraph import hits

    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    sc = spark.sparkContext
    before = sc._jsc.getPersistentRDDs().size()
    with pytest.raises(ValueError, match="iters"):
        hits(df, iters=-1)
    with pytest.raises(ValueError, match="tol"):
        hits(df, iters=1, tol=-0.5)
    with pytest.raises(ValueError, match="empty"):
        hits(df.filter(F.lit(False)), iters=1)
    # the raising paths must not leak checkpoints either (the empty-
    # table raise releases the node table before raising)
    assert sc._jsc.getPersistentRDDs().size() == before
    hits(df, iters=3).count()
    after = sc._jsc.getPersistentRDDs().size()
    assert after - before <= 1  # only the returned frame
