"""DocumentCleaner — destructive DOM rewrite before scoring (SURVEY.md A6).

[canon: goose/cleaners.py StandardDocumentCleaner.clean] — canonical pass
order: em drop-tag → dropcaps → scripts/styles/comments → blacklist-regex
node removal (id/class/name) → targeted regex removals (caption / google /
entries / facebook / twitter) → span-in-p unwrap → div→p conversion.
Constants and the blacklist regex live in :mod:`gooselite.constants`
(SURVEY.md §2.4 — re-verify on reference mount, §0.3 item 2).
"""

from __future__ import annotations

import re

from gooselite import constants as C
from gooselite.minidom import COMMENT, Node, new_element, new_text, remove_all


def clean_document(root: Node) -> Node:
    _clean_em_tags(root)
    _remove_drop_caps(root)
    _remove_scripts_styles_comments(root)
    _remove_bad_and_targeted(root)
    _clean_para_spans(root)
    _div_to_para(root)
    return root


# Canonical pass order is blacklist (id/class/name) then six targeted
# regexes (id/class). Sequential removal passes and one fused pass doom
# the same node set (removal of an already-detached descendant is a
# no-op in remove_all), so the seven full-tree walks are fused into one.
_TARGETED_RES = (C.CAPTION_RE, C.GOOGLE_RE, C.ENTRIES_RE,
                 C.FACEBOOK_RE, C.FACEBOOK_BROADCASTING_RE, C.TWITTER_RE)


def _remove_bad_and_targeted(root: Node) -> None:
    doomed: list[Node] = []
    bad = C.REMOVE_NODES_RE
    for e in root.iter_elements():
        attrib = e.attrib
        if not attrib:
            continue
        eid = attrib.get("id")
        ecls = attrib.get("class")
        name = attrib.get("name")
        if (
            (eid and bad.search(eid))
            or (ecls and bad.search(ecls))
            or (name and bad.search(name))
            or any((eid and rx.search(eid)) or (ecls and rx.search(ecls))
                   for rx in _TARGETED_RES)
        ):
            doomed.append(e)
    remove_all(doomed)


def _clean_em_tags(root: Node) -> None:
    """<em> without an <img> inside → drop-tag (keep text)."""
    for em in root.get_elements_by_tag("em"):
        if not em.get_elements_by_tag("img"):
            em.drop_tag()


_DROPCAP_RE = re.compile(r"^(dropcap|drop_cap)$", re.I)


def _remove_drop_caps(root: Node) -> None:
    for span in root.get_elements_by_tag("span"):
        if _DROPCAP_RE.search(span.attrib.get("class", "")):
            span.drop_tag()


def _remove_scripts_styles_comments(root: Node) -> None:
    # one multi-tag walk == get_elements_by_tag("script") +
    # get_elements_by_tag("style") + the comment filter: the bucket walk
    # matches on node.tag (comments carry the #comment pseudo-tag) and
    # concatenates per tag group, so the doomed order is unchanged
    remove_all(root.get_elements_by_tag("script", "style", COMMENT))


def _clean_para_spans(root: Node) -> None:
    """Unwrap <span> that live inside <p> [canon: cleaners.py clean_para_spans]."""
    for p in root.get_elements_by_tag("p"):
        for span in p.get_elements_by_tag("span"):
            span.drop_tag()


def _has_block_child(div: Node) -> bool:
    block = set(C.DIV_TO_P_BLOCK_TAGS)
    for e in div.iter_elements():
        if e.tag in block:
            return True
    return False


def _div_to_para(root: Node) -> None:
    """div→p conversion [canon: cleaners.py div_to_para + get_replacement_nodes].

    Divs containing no block-level elements become <p>. Divs that do contain
    blocks get their bare text runs (direct text children between blocks)
    wrapped into new <p> nodes, approximating get_replacement_nodes.
    """
    for div in list(root.get_elements_by_tag("div")):
        if div.parent is None:
            continue
        if not _has_block_child(div):
            div.tag = "p"
        else:
            for idx, child in enumerate(list(div.children)):
                if child.tag == "#text" and child.text and child.text.strip():
                    p = new_element("p")
                    p.append(new_text(child.text))
                    pos = div.children.index(child)
                    div.children[pos] = p
                    p.parent = div
                    child.parent = None
