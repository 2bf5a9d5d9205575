"""Metadata extraction: JSON-LD, <meta> harvest, priority merge, title heuristics.

Semantics: Mozilla Readability.js v0.6.0 `_getJSONLD` / `_getArticleMetadata` /
`_getArticleTitle` (behavior reference: /root/reference/tmp-readability/
Readability.js:1636-1888 and the reference port MetadataParser.swift).
"""

from __future__ import annotations

import json
import re

from .. import regexps as R
from ..dom import Document
from ..functions.kernels import (
    get_inner_text,
    is_url,
    js_word_count,
    text_similarity,
    unescape_html_entities,
)


def get_article_title(doc: Document) -> str:
    cur_title = orig_title = doc.title.strip()

    title_had_hierarchical_separators = False

    if R.TITLE_SEP_TEST.search(cur_title):
        title_had_hierarchical_separators = bool(R.TITLE_HIERARCHICAL.search(cur_title))
        all_separators = list(R.TITLE_SEP_TEST.finditer(orig_title))
        cur_title = orig_title[: all_separators[-1].start()]

        if js_word_count(cur_title) < 3:
            cur_title = R.TITLE_LEADING.sub("", orig_title, count=1)
    elif ": " in cur_title:
        headings = doc.get_all_nodes_with_tag(["h1", "h2"])
        trimmed_title = cur_title.strip()
        match = any(h.text_content.strip() == trimmed_title for h in headings)

        if not match:
            cur_title = orig_title[orig_title.rfind(":") + 1 :]
            if js_word_count(cur_title) < 3:
                cur_title = orig_title[orig_title.find(":") + 1 :]
            elif js_word_count(orig_title[: orig_title.find(":")]) > 5:
                cur_title = orig_title
    elif len(cur_title) > 150 or len(cur_title) < 15:
        h_ones = doc.get_elements_by_tag_name("h1")
        if len(h_ones) == 1:
            cur_title = get_inner_text(h_ones[0])

    cur_title = R.NORMALIZE.sub(" ", cur_title.strip())
    cur_title_word_count = js_word_count(cur_title)
    if cur_title_word_count <= 4 and (
        not title_had_hierarchical_separators
        or cur_title_word_count
        != js_word_count(R.TITLE_SEP_TEST.sub("", orig_title)) - 1
    ):
        cur_title = orig_title

    return cur_title


def get_jsonld(doc: Document) -> dict:
    """Extract schema.org Article metadata from ld+json scripts."""
    metadata: dict | None = None
    for el in doc.get_elements_by_tag_name("script"):
        if metadata is not None:
            break
        if el.get_attribute("type") != "application/ld+json":
            continue
        try:
            content = R.CDATA_MARKERS.sub("", el.text_content)
            parsed = json.loads(content)
            if isinstance(parsed, list):
                parsed = next(
                    (
                        it
                        for it in parsed
                        if isinstance(it.get("@type"), str)
                        and R.JSONLD_ARTICLE_TYPES.search(it["@type"])
                    ),
                    None,
                )
                if parsed is None:
                    continue

            context = parsed.get("@context")
            matches = (
                isinstance(context, str) and R.SCHEMA_DOT_ORG.match(context)
            ) or (
                isinstance(context, dict)
                and isinstance(context.get("@vocab"), str)
                and R.SCHEMA_DOT_ORG.match(context["@vocab"])
            )
            if not matches:
                continue

            if "@type" not in parsed and isinstance(parsed.get("@graph"), list):
                parsed = next(
                    (
                        it
                        for it in parsed["@graph"]
                        if isinstance(it, dict)
                        and R.JSONLD_ARTICLE_TYPES.search(str(it.get("@type", "")))
                    ),
                    None,
                )

            if (
                not parsed
                or not isinstance(parsed.get("@type"), str)
                or not R.JSONLD_ARTICLE_TYPES.search(parsed["@type"])
            ):
                continue

            metadata = {}

            name = parsed.get("name")
            headline = parsed.get("headline")
            if isinstance(name, str) and isinstance(headline, str) and name != headline:
                title = get_article_title(doc)
                name_matches = text_similarity(name, title) > 0.75
                headline_matches = text_similarity(headline, title) > 0.75
                metadata["title"] = headline if (headline_matches and not name_matches) else name
            elif isinstance(name, str):
                metadata["title"] = name.strip()
            elif isinstance(headline, str):
                metadata["title"] = headline.strip()

            author = parsed.get("author")
            if author:
                if isinstance(author, dict) and isinstance(author.get("name"), str):
                    metadata["byline"] = author["name"].strip()
                elif (
                    isinstance(author, list)
                    and author
                    and isinstance(author[0], dict)
                    and isinstance(author[0].get("name"), str)
                ):
                    metadata["byline"] = ", ".join(
                        a["name"].strip()
                        for a in author
                        if isinstance(a, dict) and isinstance(a.get("name"), str)
                    )

            if isinstance(parsed.get("description"), str):
                metadata["excerpt"] = parsed["description"].strip()
            publisher = parsed.get("publisher")
            if isinstance(publisher, dict) and isinstance(publisher.get("name"), str):
                metadata["siteName"] = publisher["name"].strip()
            if isinstance(parsed.get("datePublished"), str):
                metadata["datePublished"] = parsed["datePublished"].strip()
        except (ValueError, AttributeError, TypeError):
            continue
    return metadata or {}


_WS_ONLY = re.compile(r"\s")


def get_article_metadata(doc: Document, jsonld: dict) -> dict:
    """Harvest <meta> tags and merge with JSON-LD by fixed precedence."""
    values: dict[str, str] = {}

    for element in doc.get_elements_by_tag_name("meta"):
        element_name = element.get_attribute("name")
        element_property = element.get_attribute("property")
        content = element.get_attribute("content")
        if not content:
            continue
        matches = None
        if element_property:
            matches = R.META_PROPERTY.search(element_property)
            if matches:
                name = _WS_ONLY.sub("", matches.group(0).lower())
                values[name] = content.strip()
        if not matches and element_name and R.META_NAME.match(element_name):
            name = _WS_ONLY.sub("", element_name.lower()).replace(".", ":")
            values[name] = content.strip()

    metadata: dict = {}
    metadata["title"] = (
        jsonld.get("title")
        or values.get("dc:title")
        or values.get("dcterm:title")
        or values.get("og:title")
        or values.get("weibo:article:title")
        or values.get("weibo:webpage:title")
        or values.get("title")
        or values.get("twitter:title")
        or values.get("parsely-title")
    )
    if not metadata["title"]:
        metadata["title"] = get_article_title(doc)

    article_author = values.get("article:author")
    if not (isinstance(article_author, str) and not is_url(article_author)):
        article_author = None

    metadata["byline"] = (
        jsonld.get("byline")
        or values.get("dc:creator")
        or values.get("dcterm:creator")
        or values.get("author")
        or values.get("parsely-author")
        or article_author
    )

    metadata["excerpt"] = (
        jsonld.get("excerpt")
        or values.get("dc:description")
        or values.get("dcterm:description")
        or values.get("og:description")
        or values.get("weibo:article:description")
        or values.get("weibo:webpage:description")
        or values.get("description")
        or values.get("twitter:description")
    )

    metadata["siteName"] = jsonld.get("siteName") or values.get("og:site_name")

    metadata["publishedTime"] = (
        jsonld.get("datePublished")
        or values.get("article:published_time")
        or values.get("parsely-pub-date")
        or None
    )

    for key in ("title", "byline", "excerpt", "siteName", "publishedTime"):
        metadata[key] = unescape_html_entities(metadata[key])

    return metadata
