"""F10 snippet kernel golden tests (search.rs:190-260 semantics)."""

from readur_spark.kernels.snippets import generate_snippets


class TestGenerateSnippets:
    def test_basic_match_and_highlight(self):
        text = "alpha beta gamma delta epsilon"
        s = generate_snippets(text, "gamma", snippet_length=200)
        assert len(s) == 1
        snip = s[0]
        assert snip["text"] == text  # whole text fits in the window
        hl = snip["text"][snip["highlight_start"] : snip["highlight_end"]]
        assert hl == "gamma"

    def test_case_insensitive(self):
        s = generate_snippets("The QUICK fox", "quick")
        assert len(s) == 1
        assert s[0]["highlight_start"] == 4

    def test_window_snaps_to_word_boundary(self):
        text = ("word " * 60) + "needle" + (" word" * 60)
        s = generate_snippets(text, "needle", snippet_length=40)
        snip = s[0]
        # starts at a boundary char (space), not mid-word
        assert snip["text"][0] == " " or snip["start_offset"] == 0
        hl = snip["text"][snip["highlight_start"] : snip["highlight_end"]]
        assert hl == "needle"

    def test_three_while_scanning_cap(self):
        text = "x " + " x ".join(["hit"] * 10)
        s = generate_snippets(text, "hit")
        assert len(s) == 3  # the reference's in-loop cap

    def test_five_total_cap_multi_term(self):
        # cap is global: 3 from the first term stop further generation
        text = "aa bb " * 10
        s = generate_snippets(text, "aa bb")
        assert len(s) <= 5

    def test_no_match(self):
        assert generate_snippets("nothing here", "absent") == []

    def test_empty_text(self):
        assert generate_snippets("", "term") == []

    def test_scan_resumes_after_match(self):
        s = generate_snippets("ab ab", "ab", snippet_length=200)
        assert len(s) == 2
        assert s[0]["highlight_start"] != s[1]["highlight_start"]


def test_distributed_snippets_full(spark):
    from readur_spark.operators.search import snippets_full

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    out = snippets_full(docs, "spark merge").limit(50).collect()
    assert len(out) > 0
    for r in out:
        hl = r["text"][r["highlight_start"] : r["highlight_end"]].lower()
        assert hl in ("spark", "merge")
