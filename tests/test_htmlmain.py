"""HTML main-content extraction tests — FIXTURES.md §4 classes."""

from readur_spark.kernels.htmlmain import extract_main_content


def kinds(items):
    return [i["kind"] for i in items]


class TestArticlePage:
    HTML = (
        "<html><body>"
        "<nav><ul><li><a href='/a'>home page link</a></li>"
        "<li><a href='/b'>products page link</a></li></ul></nav>"
        "<article>"
        "<p>This is the first long paragraph of real article content that "
        "definitely exceeds the minimum block length.</p>"
        "<p>And here is a second paragraph with plenty of meaningful prose "
        "content to keep as main text.</p>"
        "</article>"
        "<footer><a href='/about'>about us</a> <a href='/contact'>contact "
        "page</a></footer></body></html>"
    )

    def test_only_article_paragraphs_survive(self):
        items = extract_main_content(self.HTML)
        assert len(items) == 2
        assert all(i["kind"] == "text" for i in items)
        assert items[0]["text"].startswith("This is the first long paragraph")
        assert items[1]["text"].startswith("And here is a second paragraph")


class TestLinkFarm:
    def test_high_link_density_dropped(self):
        farm = "".join(
            f"<div><a href='/x{i}'>some fairly long anchor text here {i}</a></div>"
            for i in range(6)
        )
        assert extract_main_content(f"<html><body>{farm}</body></html>") == []


class TestShortBlockNoise:
    def test_short_blocks_dropped(self):
        html = (
            "<html><body>"
            "<p>A long enough paragraph of genuine content that passes the "
            "twenty-five character minimum easily.</p>"
            "<div>ok 1</div><div>ok 2</div>"
            "<p>Another long paragraph of genuine content that also passes "
            "the minimum length bar easily.</p>"
            "</body></html>"
        )
        items = extract_main_content(html)
        assert len(items) == 2


class TestTableLayout:
    def test_td_content_kept(self):
        html = (
            "<html><body><table><tr>"
            "<td>Cell one has a good amount of real content in it today.</td>"
            "<td>Cell two also carries enough meaningful text to be kept.</td>"
            "</tr></table></body></html>"
        )
        items = extract_main_content(html)
        assert len(items) == 2
        assert items[0]["text"].startswith("Cell one")


class TestInlineMedia:
    def test_media_span_at_correct_position(self):
        html = (
            "<html><body><article>"
            "<p>Leading paragraph with more than enough characters to be "
            "retained by the classifier.</p>"
            '<img src="media://img/42">'
            "<p>Trailing paragraph, also long enough to clear the minimum "
            "character threshold.</p>"
            "</article></body></html>"
        )
        items = extract_main_content(html)
        assert kinds(items) == ["text", "media", "text"]
        assert items[1]["media_ref"] == "media://img/42"

    def test_img_inside_nav_dropped(self):
        html = '<html><body><nav><img src="media://logo"></nav></body></html>'
        assert extract_main_content(html) == []

    def test_img_mid_paragraph_splits_block(self):
        html = (
            "<body><p>First half of the paragraph is long enough to keep "
            "around here"
            '<img src="m://x">'
            "and the second half is also long enough to keep.</p></body>"
        )
        items = extract_main_content(html)
        assert kinds(items) == ["text", "media", "text"]


class TestTrivialPage:
    def test_single_text_span(self):
        html = "<html><body><p>only text but long enough to pass the bar ok</p></body></html>"
        items = extract_main_content(html)
        assert len(items) == 1
        assert items[0]["kind"] == "text"


class TestRobustness:
    def test_malformed_html_no_raise(self):
        html = "<html><body><p>unterminated paragraph that is long enough to be kept"
        items = extract_main_content(html)
        assert len(items) == 1

    def test_script_and_style_excluded(self):
        html = (
            "<body><script>var x = 'this is not content at all here';</script>"
            "<style>.c { color: red; } body { margin: 0 auto; }</style>"
            "<p>Real content paragraph that is long enough to be retained.</p></body>"
        )
        items = extract_main_content(html)
        assert len(items) == 1
        assert "Real content" in items[0]["text"]

    def test_entities_decoded(self):
        html = "<body><p>Fish &amp; chips cost &lt; ten pounds around here.</p></body>"
        items = extract_main_content(html)
        assert items[0]["text"] == "Fish & chips cost < ten pounds around here."

    def test_empty_input(self):
        assert extract_main_content("") == []
