"""Content scoring: candidates, boosts, score propagation, top-node
selection, sibling absorption, post-cleanup (SURVEY.md A7–A14).

[canon: goose/extractors.py ContentExtractor — calculate_best_node,
is_boostable, is_highlink_density, update_score/update_node_count,
add_siblings/get_siblings_content/get_siblings_score, post_cleanup,
is_table_and_no_para_exist, is_nodescore_threshold_met]. Reference checkout
empty at build time (SURVEY.md §0.1); every constant sourced from
:mod:`gooselite.constants` (§2.4) for one-place re-verification.
"""

from __future__ import annotations

from gooselite import constants as C
from gooselite.minidom import Node, new_element
from gooselite.text import get_stopword_count, stopword_count_fast


def is_highlink_density(node: Node, lang: str | None = None) -> bool:
    """A9: (len(words(link text)) / len(words(node text))) * n_links >= 1.0.
    raw_text is used because only whitespace-split token COUNTS matter."""
    links = node.get_elements_by_tag("a")
    if not links:
        return False
    words = node.raw_text().split()
    if not words:
        return True  # all-link node: nothing but anchors
    n_link_words = sum(len(a.raw_text().split()) for a in links)
    score = (n_link_words / len(words)) * len(links)
    return score >= C.LINK_DENSITY_THRESHOLD


def _update_score(node: Node, add: float) -> None:
    current = node.score if node.score is not None else 0.0
    node.score = current + add


def _update_node_count(node: Node, add: int) -> None:
    node.gravity_nodes += add


def is_boostable(node: Node, lang: str | None) -> bool:
    """A10 precondition: a previous sibling <p> within BOOST_SIBLING_REACH
    steps has stopword_count > BOOST_MIN_STOPWORDS.
    [canon: extractors.py is_boostable — walk_siblings = previous siblings].

    Decision rule (equivalent, nearest-first): True iff one of the nearest
    BOOST_SIBLING_REACH previous <p> siblings has stopword_count >
    BOOST_MIN_STOPWORDS. Kept for unit-level parity tests; the hot path in
    :func:`calculate_best_node` precomputes this in one left-to-right pass
    per parent (the naive per-candidate sibling walk is O(n²) on
    Common-Crawl skew-tail pages with 10^5 sibling paragraphs).
    """
    steps_away = 0
    for sib in node.previous_siblings():
        if sib.tag == "p":
            if steps_away >= C.BOOST_SIBLING_REACH:
                return False
            stats = get_stopword_count(sib.get_text(), lang)
            if stats.stop_word_count > C.BOOST_MIN_STOPWORDS:
                return True
            steps_away += 1
    return False


def _precompute_boostable(candidates: list[Node],
                          lang: str | None) -> dict[int, bool]:
    """One pass per parent: for each candidate, whether any of its nearest
    BOOST_SIBLING_REACH previous <p> siblings has stopword_count >
    BOOST_MIN_STOPWORDS (same decision as :func:`is_boostable`)."""
    wanted = {id(n) for n in candidates}
    parents: list[Node] = []
    seen_parents: set[int] = set()
    for n in candidates:
        p = n.parent
        if p is not None and id(p) not in seen_parents:
            seen_parents.add(id(p))
            parents.append(p)
    out: dict[int, bool] = {}
    reach = C.BOOST_SIBLING_REACH
    for parent in parents:
        recent_p_flags: list[bool] = []  # nearest-last; True = count > threshold
        for child in parent.children:
            if id(child) in wanted:
                out[id(child)] = any(recent_p_flags[-reach:])
            if child.is_element and child.tag == "p":
                cnt = child.swc
                if cnt is None:
                    cnt = stopword_count_fast(child.raw_text(), lang)
                    child.swc = cnt
                recent_p_flags.append(cnt > C.BOOST_MIN_STOPWORDS)
    return out


def calculate_best_node(root: Node, lang: str | None) -> Node | None:
    """A7–A12: enumerate candidates, score, propagate to parents and
    grandparents, return argmax parent (first-in-document-order tie-break)."""
    candidates = root.get_elements_by_tag(*C.CANDIDATE_TAGS)

    # stopword counts cached ON the node (Node.swc): the sibling-baseline
    # pass (A13) re-reads the same paragraphs and nothing between here and
    # there mutates a counted paragraph's text
    nodes_with_text: list[Node] = []
    for node in candidates:
        cnt = stopword_count_fast(node.raw_text(), lang)
        node.swc = cnt
        if cnt > C.CANDIDATE_MIN_STOPWORDS and not is_highlink_density(node, lang):
            nodes_with_text.append(node)

    boostable = _precompute_boostable(nodes_with_text, lang)

    nodes_number = len(nodes_with_text)
    negative_scoring = 0.0
    bottom_negativescore_nodes = nodes_number * C.NEGATIVE_SCORING_BOTTOM_FRACTION
    starting_boost = 1.0
    parent_nodes: list[Node] = []
    parent_seen: set[int] = set()

    for i, node in enumerate(nodes_with_text):
        boost_score = 0.0
        if boostable.get(id(node), False):
            boost_score = (1.0 / starting_boost) * C.BOOST_BASE
            starting_boost += 1
        if nodes_number > C.NEGATIVE_SCORING_MIN_NODES:
            if (nodes_number - i) <= bottom_negativescore_nodes:
                booster = bottom_negativescore_nodes - (nodes_number - i)
                boost_score = -(booster ** 2)
                negscore = abs(boost_score) + negative_scoring
                if negscore > C.NEGATIVE_SCORING_CLAMP_TOTAL:
                    boost_score = float(C.NEGATIVE_SCORING_CLAMP_VALUE)

        upscore = int(node.swc + boost_score)

        parent = node.parent
        if parent is None:
            continue
        _update_score(parent, upscore)
        _update_node_count(parent, 1)
        if id(parent) not in parent_seen:
            parent_seen.add(id(parent))
            parent_nodes.append(parent)
        grandparent = parent.parent
        if grandparent is not None:
            _update_score(grandparent, upscore / C.GRANDPARENT_SCORE_DIVISOR)
            _update_node_count(grandparent, 1)
            if id(grandparent) not in parent_seen:
                parent_seen.add(id(grandparent))
                parent_nodes.append(grandparent)

    top_node: Node | None = None
    top_node_score = 0.0
    for e in parent_nodes:
        score = e.score if e.score is not None else 0.0
        if score > top_node_score:
            top_node = e
            top_node_score = score
        if top_node is None:
            top_node = e
    return top_node


def _get_siblings_baseline_score(top_node: Node, lang: str | None) -> float:
    """A13 baseline: mean stopword score of top_node's qualifying <p>."""
    base = 100000.0
    paragraphs_number = 0
    paragraphs_score = 0.0
    for node in top_node.get_elements_by_tag("p"):
        cnt = node.swc
        if cnt is None:
            cnt = stopword_count_fast(node.raw_text(), lang)
            node.swc = cnt
        if cnt > C.CANDIDATE_MIN_STOPWORDS and not is_highlink_density(node, lang):
            paragraphs_number += 1
            paragraphs_score += cnt
    if paragraphs_number > 0:
        base = paragraphs_score / paragraphs_number
    return base


def _get_siblings_content(sibling: Node, baseline_score: float, lang: str | None) -> list[Node]:
    """A13: content a previous sibling contributes — the sibling itself when
    it is a non-empty <p>, else fresh <p> nodes for each qualifying
    descendant paragraph (score > 0.30 × baseline, not link-dense)."""
    if sibling.tag == "p" and sibling.get_text():
        return [sibling]
    out: list[Node] = []
    for para in sibling.get_elements_by_tag("p"):
        text = para.get_text()
        if not text:
            continue
        stats = get_stopword_count(text, lang)
        threshold = baseline_score * C.SIBLING_SCORE_MULTIPLIER
        if threshold < stats.stop_word_count and not is_highlink_density(para, lang):
            out.append(new_element("p", text=text))
    return out


def add_siblings(top_node: Node, lang: str | None) -> Node:
    baseline_score = _get_siblings_baseline_score(top_node, lang)
    for sibling in top_node.previous_siblings():
        for p in _get_siblings_content(sibling, baseline_score, lang):
            p.detach()
            top_node.insert(0, p)
    return top_node


def _is_table_and_no_para_exist(e: Node) -> bool:
    """A14 helper [canon: is_table_and_no_para_exist] — also destructively
    drops sub-paragraphs shorter than TABLE_PARA_MIN_CHARS."""
    for p in e.get_elements_by_tag("p"):
        if len(p.get_text()) < C.TABLE_PARA_MIN_CHARS:
            p.detach()
    remaining = e.get_elements_by_tag("p")
    return len(remaining) == 0 and e.tag != "td"


def _is_nodescore_threshold_met(top_node: Node, e: Node) -> bool:
    top_score = top_node.score if top_node.score is not None else 0.0
    node_score = e.score if e.score is not None else 0.0
    threshold = top_score * C.CHILD_PRUNE_THRESHOLD
    if node_score < threshold and e.tag != "td":
        return False
    return True


def post_cleanup(top_node: Node, lang: str | None) -> Node:
    """A13 + A14: absorb qualifying previous-sibling paragraphs, then prune
    non-<p> children that are link-dense / para-less tables / low-scored."""
    node = add_siblings(top_node, lang)
    for e in list(node.children):
        if not e.is_element or e.tag == "p":
            continue
        if (is_highlink_density(e, lang)
                or _is_table_and_no_para_exist(e)
                or not _is_nodescore_threshold_met(node, e)):
            e.detach()
    return node
