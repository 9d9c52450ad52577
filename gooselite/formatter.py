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
from gooselite.minidom import Node
from gooselite.text import get_stopword_count, inner_trim


def _remove_negativescore_nodes(top_node: Node) -> None:
    doomed = [
        e for e in top_node.iter_elements()
        if e.score is not None and int(e.score) < C.FORMATTER_MIN_NODE_SCORE
    ]
    for e in doomed:
        if e.parent is not None:
            e.detach()


def _drop_tags(top_node: Node, tags: tuple[str, ...]) -> None:
    for tag in tags:
        for e in top_node.get_elements_by_tag(tag):
            e.drop_tag()


def _remove_fewwords_paragraphs(top_node: Node, lang: str | None) -> None:
    all_nodes = list(top_node.iter_elements())
    all_nodes.reverse()
    for e in all_nodes:
        if e.parent is None:  # already removed inside a doomed subtree
            continue
        stats = get_stopword_count(e.get_text(), lang)
        if (stats.stop_word_count < C.FORMATTER_MIN_PARA_STOPWORDS
                and not e.get_elements_by_tag("object")
                and not e.get_elements_by_tag("embed")):
            e.detach()


def _convert_to_text(top_node: Node) -> str:
    txts: list[str] = []
    for child in top_node.children:
        if not child.is_element and child.tag != "#text":
            continue
        txt = child.get_text() if child.is_element else inner_trim(child.text or "")
        if child.is_element and txt:
            txts.append(txt)
    return C.PARAGRAPH_JOIN.join(txts)


def get_formatted_text(top_node: Node, lang: str | None) -> str:
    _remove_negativescore_nodes(top_node)
    _drop_tags(top_node, ("a",))
    _drop_tags(top_node, C.FORMATTER_DROP_TAGS)
    _remove_fewwords_paragraphs(top_node, lang)
    return _convert_to_text(top_node)
