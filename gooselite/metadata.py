"""Metadata extraction: title, meta description/keywords/lang, canonical
link, domain, tags (SURVEY.md A4, A5, A16).

[canon: goose/extractors.py get_title / get_meta_description /
get_meta_keywords / get_meta_lang / get_canonical_link / extract_tags].
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlparse

from gooselite.constants import TITLE_SPLITTERS
from gooselite.minidom import Node
from gooselite.text import inner_trim

_MOTLEY_RE = re.compile(r"[«»]")


def _split_title(title_text: str, splitter: str) -> str:
    """Pick the longest (by chars) segment [canon: extractors.py split_title]."""
    pieces = title_text.split(splitter)
    best = ""
    for piece in pieces:
        if len(piece) > len(best):
            best = piece
    return best.strip()


def get_title(root: Node) -> str:
    els = root.get_elements_by_tag("title")
    if not els:
        return ""
    title_text = els[0].get_text()
    used = False
    for splitter in TITLE_SPLITTERS:
        if splitter in title_text and not used:
            title_text = _split_title(title_text, splitter)
            used = True
    return inner_trim(_MOTLEY_RE.sub("", title_text))


def _meta_content(root: Node, name_attr: str, name_value: str) -> str:
    target = name_value.lower()
    for meta in root.get_elements_by_tag("meta"):
        if meta.attrib.get(name_attr, "").lower() == target:
            return inner_trim(meta.attrib.get("content", ""))
    return ""


def get_meta_description(root: Node) -> str:
    return _meta_content(root, "name", "description")


def get_meta_keywords(root: Node) -> str:
    return _meta_content(root, "name", "keywords")


def get_meta_lang(root: Node) -> str | None:
    """A5 fallback chain element: html@lang, else meta http-equiv
    content-language, else og:locale prefix."""
    for html in root.get_elements_by_tag("html"):
        lang = html.attrib.get("lang")
        if lang:
            return lang.strip()[:2].lower()
    val = _meta_content(root, "http-equiv", "content-language")
    if val:
        return val.strip()[:2].lower()
    for meta in root.get_elements_by_tag("meta"):
        if meta.attrib.get("property", "").lower() == "og:locale":
            content = meta.attrib.get("content", "")
            if content:
                return content.strip()[:2].lower()
    return None


def get_canonical_link(root: Node, url: str) -> str:
    for link in root.get_elements_by_tag("link"):
        if link.attrib.get("rel", "").lower() == "canonical":
            href = link.attrib.get("href", "").strip()
            if href:
                return urljoin(url, href)
    return url


def get_domain(url: str) -> str:
    try:
        return urlparse(url).netloc
    except ValueError:
        return ""


_TAG_HREF_RE = re.compile(r"/tag[s]?/")


def extract_tags(root: Node) -> list[str]:
    """A16: a[rel=tag] plus hrefs matching /tag/; sorted for determinism."""
    tags: set[str] = set()
    for a in root.get_elements_by_tag("a"):
        rel = a.attrib.get("rel", "").lower()
        href = a.attrib.get("href", "")
        if "tag" == rel or _TAG_HREF_RE.search(href):
            text = a.get_text()
            if text:
                tags.add(text)
    return sorted(tags)
