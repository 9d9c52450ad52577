"""OutputFormatter — top_node subtree → final text (SURVEY.md A15).

[canon: goose/outputformatters.py OutputFormatter.get_formatted_text]:
  1. remove scored descendants with gravityScore < 1;
  2. drop-tag <a> (links_to_text);
  3. drop-tag b / strong / i / br (replace_with_text);
  4. remove elements with stopword_count < 3 unless they contain
     <object>/<embed> (remove_fewwords_paragraphs, reverse doc order);
  5. text of each remaining direct child, innerTrim'd, joined '\n\n'.

THIS stage defines the bytes the north rule compares (BASELINE.json:14
"byte-identical extracted text per url"); see SURVEY.md §7.5.
Deviation recorded: the canonical add_newline_to_br quirk (br.text set to a
literal backslash-n pair, collapsed later) is realized here as plain <br>
drop-tagging — identical observable output under innerTrim.
"""

from __future__ import annotations

from gooselite import constants as C
from gooselite.minidom import Node, remove_all
from gooselite.text import count_is_additive, inner_trim, stopword_count_fast


def _remove_negativescore_nodes(top_node: Node) -> None:
    doomed = [
        e for e in top_node.iter_elements()
        if e.score is not None and int(e.score) < C.FORMATTER_MIN_NODE_SCORE
    ]
    remove_all(doomed)


def _drop_tags(top_node: Node, tags: tuple[str, ...]) -> None:
    # One walk for all tags (get_elements_by_tag concatenates PER TAG
    # GROUP in document order — the canonical per-tag loop order).
    # Unwrapping never adds/removes/reorders OTHER elements, so the
    # pre-collected groups equal what per-tag re-walks would find.
    for e in top_node.get_elements_by_tag(*tags):
        e.drop_tag()


def _remove_fewwords_paragraphs(top_node: Node, lang: str | None) -> None:
    """Remove elements with stopword_count < 3 (object/embed-containing
    exempt), evaluating in reverse document order so ancestors see the
    already-pruned text of their descendants.

    [canon: outputformatters.py remove_fewwords_paragraphs — sequential
    reversed() loop]. Reverse document order is bottom-up (all descendants
    of X precede X in reversed pre-order), so this is implemented as one
    memoized bottom-up pass with a single batched removal — identical
    decisions, O(n) instead of the naive O(n²) on skew-tail pages.
    """
    live_media: dict[int, int] = {}     # id(element) → live object/embed descendants
    doomed: list[Node] = []
    ordered = list(top_node.iter_elements())
    if count_is_additive(lang):
        # Default counter: count(" ".join(parts)) == sum(count(part))
        # exactly (whitespace split; the joining space never merges
        # tokens), so fold CHILD COUNTS bottom-up instead of recounting
        # each ancestor's full concatenation — O(total text) instead of
        # O(depth × text) on deep/fat pages, identical decisions.
        live_cnt: dict[int, int] = {}   # id(element) → count after pruning
        for e in reversed(ordered):
            cnt = 0
            desc_media = 0
            for child in e.children:
                if child.is_element:
                    ccnt = live_cnt.get(id(child))
                    if ccnt is None:  # child was doomed
                        continue
                    cnt += ccnt
                    desc_media += live_media.get(id(child), 0)
                elif child.tag == "#text" and child.text:
                    cnt += stopword_count_fast(child.text, lang)
            # exemption counts object/embed DESCENDANTS only (canonical
            # getElementsByTag semantics — an element never matches itself)
            if cnt < C.FORMATTER_MIN_PARA_STOPWORDS and desc_media == 0:
                doomed.append(e)
            else:
                live_cnt[id(e)] = cnt
                live_media[id(e)] = desc_media + (
                    1 if e.tag in ("object", "embed") else 0)
        remove_all(doomed)
        return
    # Segmenting counters (zh/ja/th/ko/ar): additivity across part
    # boundaries is not asserted, so keep the exact concatenation.
    live_text: dict[int, str] = {}      # id(element) → text after pruning below it
    for e in reversed(ordered):
        parts: list[str] = []
        desc_media = 0
        for child in e.children:
            if child.is_element:
                ctext = live_text.get(id(child))
                if ctext is None:  # child was doomed (empty-kept stores "")
                    continue
                parts.append(ctext)
                desc_media += live_media.get(id(child), 0)
            elif child.tag == "#text" and child.text:
                parts.append(child.text)
        # raw (untrimmed) concatenation: live_text only feeds stopword
        # counting, which is whitespace-insensitive; the displayed text is
        # recomputed from the pruned tree in _convert_to_text
        text = " ".join(parts)
        cnt = stopword_count_fast(text, lang)
        # exemption counts object/embed DESCENDANTS only (canonical
        # getElementsByTag semantics — an element never matches itself)
        if cnt < C.FORMATTER_MIN_PARA_STOPWORDS and desc_media == 0:
            doomed.append(e)
        else:
            live_text[id(e)] = text
            live_media[id(e)] = desc_media + (1 if e.tag in ("object", "embed") else 0)
    remove_all(doomed)


def _convert_to_text(top_node: Node) -> str:
    # element children only: canonical getText-per-block joins elements
    # with '\n\n'; bare text nodes between blocks are not emitted
    txts: list[str] = []
    for child in top_node.children:
        if child.is_element:
            txt = child.get_text()
            if txt:
                txts.append(txt)
    return C.PARAGRAPH_JOIN.join(txts)


def get_formatted_text(top_node: Node, lang: str | None) -> str:
    _remove_negativescore_nodes(top_node)
    # canonical order: <a> group first, then b/strong/i/br — one walk
    _drop_tags(top_node, ("a",) + C.FORMATTER_DROP_TAGS)
    _remove_fewwords_paragraphs(top_node, lang)
    return _convert_to_text(top_node)
