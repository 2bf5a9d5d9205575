from swift_readability_ray.dom import parse
from swift_readability_ray.readability.metadata import (
    get_article_metadata,
    get_article_title,
    get_jsonld,
)


def _title(title_html, body=""):
    return parse(f"<html><head><title>{title_html}</title></head><body>{body}</body></html>")


def test_title_plain():
    assert get_article_title(_title("Simple Title Of Article")) == "Simple Title Of Article"


def test_title_separator_keeps_original_when_short():
    # 2-word first part → fall back to original (upstream ≤4-word rule)
    assert get_article_title(_title("Two Words | Site")) == "Two Words | Site"


def test_title_separator_strips_site():
    t = get_article_title(_title("A Long Interesting Article Name | Site"))
    assert t == "A Long Interesting Article Name"


def test_title_colon_heading_match():
    doc = _title("Topic: The Article", "<h1>Topic: The Article</h1>")
    assert get_article_title(doc) == "Topic: The Article"


def test_title_h1_fallback_for_short_title():
    doc = _title("short", "<h1>The Actual Long Heading Title</h1>")
    assert get_article_title(doc) == "The Actual Long Heading Title"


def test_jsonld_article():
    doc = parse(
        """<html><head><script type="application/ld+json">
        {"@context": "https://schema.org", "@type": "NewsArticle",
         "name": "LD Title", "author": {"name": "A. Uthor"},
         "description": "LD excerpt", "publisher": {"name": "LD Pub"},
         "datePublished": "2026-01-01"}
        </script></head><body></body></html>"""
    )
    ld = get_jsonld(doc)
    assert ld["title"] == "LD Title"
    assert ld["byline"] == "A. Uthor"
    assert ld["excerpt"] == "LD excerpt"
    assert ld["siteName"] == "LD Pub"
    assert ld["datePublished"] == "2026-01-01"


def test_jsonld_wrong_context_ignored():
    doc = parse(
        """<html><head><script type="application/ld+json">
        {"@context": "https://example.com", "@type": "NewsArticle", "name": "X"}
        </script></head><body></body></html>"""
    )
    assert get_jsonld(doc) == {}


def test_jsonld_author_array():
    doc = parse(
        """<html><head><script type="application/ld+json">
        {"@context": "https://schema.org", "@type": "Article",
         "author": [{"name": "One"}, {"name": "Two"}]}
        </script></head><body></body></html>"""
    )
    assert get_jsonld(doc)["byline"] == "One, Two"


def test_meta_precedence():
    doc = parse(
        """<html><head><title>Fallback Title Here Okay</title>
        <meta property="og:title" content="OG Title">
        <meta name="twitter:title" content="TW Title">
        <meta property="og:description" content="OG Desc">
        <meta name="author" content="Meta Author">
        <meta property="og:site_name" content="SiteName">
        <meta property="article:published_time" content="2026-02-02">
        </head><body></body></html>"""
    )
    md = get_article_metadata(doc, {})
    assert md["title"] == "OG Title"
    assert md["excerpt"] == "OG Desc"
    assert md["byline"] == "Meta Author"
    assert md["siteName"] == "SiteName"
    assert md["publishedTime"] == "2026-02-02"


def test_meta_jsonld_wins():
    doc = parse(
        """<html><head><meta property="og:title" content="OG Title"></head>
        <body></body></html>"""
    )
    md = get_article_metadata(doc, {"title": "LD Title"})
    assert md["title"] == "LD Title"


def test_meta_entities_unescaped():
    doc = parse(
        '<html><head><meta property="og:title" content="A &amp;amp; B">'
        "</head><body></body></html>"
    )
    # HTML parser unescapes once (→ "A &amp; B"), metadata unescape again
    md = get_article_metadata(doc, {})
    assert md["title"] == "A & B"


def test_article_author_url_rejected():
    doc = parse(
        '<html><head><meta property="article:author" content="http://x.com/u/1">'
        "</head><body></body></html>"
    )
    md = get_article_metadata(doc, {})
    assert md["byline"] is None
