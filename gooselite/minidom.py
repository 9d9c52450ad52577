"""Minimal mutable DOM on stdlib ``html.parser``.

[canon: goose/parsers.py Parser — wraps lxml.html; node ports wrap
cheerio.load(htmlparser2)]. No HTML parser library is installed in this
environment (SURVEY.md §0.4), so this module vendors a defensive
tree-builder on ``html.parser`` behind the same small surface Goose needs:
tag/attr access, document-order traversal, sibling walks, node removal /
insertion / drop-tag, and per-node score annotations (gravityScore).

HTML5-ish recovery implemented (SURVEY.md §7.4 item 4): void elements,
implied end tags for p / li / dt / dd / td / th / tr / option, raw-text
script/style (html.parser CDATA mode), mismatched end tags ignored.
Entity decoding: ``convert_charrefs=True`` (stdlib) — entities become text.

All traversals are iterative (no recursion) so pathologically nested
real-world HTML cannot blow the stack.
"""

from __future__ import annotations

from html.parser import HTMLParser
from types import MappingProxyType

from gooselite.constants import P_CLOSING_TAGS, RAW_TEXT_TAGS, VOID_ELEMENTS
from gooselite.text import inner_trim

# Shared read-only attrib for the (majority) attribute-less nodes: one
# dict per node is ~18 MB of allocator traffic on a 300k-node page and
# needless L3 pressure under wide parallelism. Nothing mutates attrib
# after parse; the proxy enforces that.
_EMPTY_ATTRS: dict = MappingProxyType({})  # type: ignore[assignment]

TEXT = "#text"
COMMENT = "#comment"
DOCUMENT = "#document"


class ParseError(Exception):
    """Raised when the tree-builder cannot recover from malformed input."""


class Node:
    """One DOM node. Element nodes carry tag/attrib/children; text and
    comment nodes carry ``text`` and have tag ``#text`` / ``#comment``."""

    __slots__ = ("tag", "attrib", "children", "parent", "text", "score",
                 "gravity_nodes", "is_element", "swc")

    def __init__(self, tag: str, attrib: dict[str, str] | None = None, text: str | None = None):
        self.tag = tag
        self.attrib: dict[str, str] = attrib if attrib is not None else _EMPTY_ATTRS
        self.children: list[Node] = []
        self.parent: Node | None = None
        self.text = text
        self.score: float | None = None   # gravityScore annotation (A11)
        self.gravity_nodes: int = 0
        # stopword-count cache (scoring A8): valid while the node's own
        # subtree text is unchanged — scoring/sibling phases never mutate
        # a counted paragraph's text, only detach/attach whole blocks
        self.swc: int | None = None
        # precomputed: the profiler showed a property here costs ~13% of
        # total extraction time (6M+ calls/150 docs). Node kind never
        # changes (div→p stays an element), so a plain slot is safe.
        self.is_element: bool = not tag.startswith("#")

    def append(self, child: "Node") -> None:
        child.parent = self
        self.children.append(child)

    def insert(self, index: int, child: "Node") -> None:
        child.parent = self
        self.children.insert(index, child)

    def remove_child(self, child: "Node") -> None:
        self.children.remove(child)
        child.parent = None

    def detach(self) -> None:
        if self.parent is not None:
            self.parent.remove_child(self)

    def drop_tag(self) -> None:
        """Replace this element with its children, in place.

        [canon: lxml drop_tag — used by Goose for <a>/<b>/<strong>/<i>/<br>/
        <em>/<span> drop-tagging (A15, A6)]."""
        parent = self.parent
        if parent is None:
            return
        idx = parent.children.index(self)
        kids = list(self.children)
        parent.children[idx:idx + 1] = kids
        for k in kids:
            k.parent = parent
        self.children = []
        self.parent = None

    # -- traversal (document order, iterative) ------------------------------
    # These return LISTS, not generators: traversal is the single hottest
    # code path (millions of visits per batch) and chained generator
    # dispatch roughly doubled its cost; lists are also mutation-safe for
    # the destructive cleaner passes.
    def iter_nodes(self) -> list["Node"]:
        """All descendant nodes (not self), document order."""
        out: list[Node] = []
        stack = list(reversed(self.children))
        pop, push, append = stack.pop, stack.extend, out.append
        while stack:
            node = pop()
            append(node)
            if node.children:
                push(reversed(node.children))
        return out

    def iter_elements(self) -> list["Node"]:
        out: list[Node] = []
        stack = list(reversed(self.children))
        pop, push, append = stack.pop, stack.extend, out.append
        while stack:
            node = pop()
            if node.is_element:
                append(node)
            if node.children:
                push(reversed(node.children))
        return out

    def itertext(self) -> list[str]:
        """Descendant text-node strings, document order.

        [canon: lxml .itertext(); getText joins these with ' ']."""
        out: list[str] = []
        stack = list(reversed(self.children))
        pop, push, append = stack.pop, stack.extend, out.append
        while stack:
            node = pop()
            if node.text and node.tag == TEXT:
                append(node.text)
            if node.children:
                push(reversed(node.children))
        return out

    def get_elements_by_tag(self, *tags: str) -> list["Node"]:
        """Descendants matching any tag, in document order. With multiple
        tags, results are concatenated PER TAG GROUP — the canonical Goose
        candidate order (all <p>, then all <pre>, then all <td>;
        SURVEY.md A7 ordering matters for the boost index) — collected in
        ONE walk."""
        if not self.children:
            return []
        if len(tags) == 1:
            want = tags[0]
            out: list[Node] = []
            kids = self.children
            # leaf fast path: the per-candidate callers (link density's
            # <a> scan, para-span unwrap) hit <p> nodes whose children
            # are all leaves — a plain filter beats the stack walk and
            # preserves document order exactly
            for k in kids:
                if k.children:
                    break
            else:
                return [k for k in kids if k.tag == want]
            stack = list(reversed(kids))
            pop, push, append = stack.pop, stack.extend, out.append
            while stack:
                node = pop()
                if node.tag == want:
                    append(node)
                if node.children:
                    push(reversed(node.children))
            return out
        buckets: dict[str, list[Node]] = {t: [] for t in tags}
        stack = list(reversed(self.children))
        pop, push = stack.pop, stack.extend
        while stack:
            node = pop()
            b = buckets.get(node.tag)
            if b is not None:
                b.append(node)
            if node.children:
                push(reversed(node.children))
        merged: list[Node] = []
        for t in tags:
            merged.extend(buckets[t])
        return merged

    def get_elements_map(self, *tags: str) -> dict[str, list["Node"]]:
        """Descendants matching each tag as {tag: [nodes in document
        order]}, collected in ONE walk — the metadata phase issues ~20
        full-tree ``get_elements_by_tag`` calls per document otherwise
        (title/meta/link/a/iframe/… each walking the raw pre-clean tree)."""
        buckets: dict[str, list[Node]] = {t: [] for t in tags}
        stack = list(reversed(self.children))
        pop, push = stack.pop, stack.extend
        while stack:
            node = pop()
            b = buckets.get(node.tag)
            if b is not None:
                b.append(node)
            if node.children:
                push(reversed(node.children))
        return buckets

    def previous_siblings(self) -> list["Node"]:
        """Element siblings before self, nearest first (reverse document
        order) — [canon: goose/extractors.py walk_siblings]."""
        parent = self.parent
        if parent is None:
            return []
        out: list[Node] = []
        for sib in parent.children:
            if sib is self:
                break
            if sib.is_element:
                out.append(sib)
        out.reverse()
        return out

    # -- text ----------------------------------------------------------------
    def get_text(self) -> str:
        """[canon: goose/parsers.py getText]: ' '.join(itertext) → innerTrim.
        (str.split() splits on the same Unicode whitespace class as \\s+,
        so join-split-join ≡ join → innerTrim.)"""
        kids = self.children
        if not kids:
            return ""
        if len(kids) == 1 and not kids[0].children:  # single text child
            k = kids[0]
            return " ".join(k.text.split()) if (k.tag == TEXT and k.text) else ""
        return " ".join(" ".join(self.itertext()).split())

    def raw_text(self) -> str:
        """Descendant text WITHOUT innerTrim — zero-copy for the common
        single-text-child case. For whitespace-insensitive consumers only
        (token counting / stopword density); display paths use get_text."""
        kids = self.children
        if not kids:
            return ""
        if len(kids) == 1 and not kids[0].children:
            k = kids[0]
            return k.text if (k.tag == TEXT and k.text) else ""
        return " ".join(self.itertext())

    def __repr__(self) -> str:  # debug aid only
        if self.tag == TEXT:
            return f"#text({self.text!r})"
        ident = self.attrib.get("id") or self.attrib.get("class") or ""
        return f"<{self.tag} {ident}>({len(self.children)} kids)"


def remove_all(nodes: list["Node"]) -> None:
    """Batch-remove nodes: one children-list rebuild per affected parent.

    Per-node ``detach()`` is O(len(parent.children)) each (list.remove);
    on Common-Crawl skew-tail pages a parent can hold 10^5 children and a
    cleanup pass can doom most of them — per-node removal would be O(n²).
    """
    if not nodes:
        return
    doomed = set(map(id, nodes))
    parents: dict[int, Node] = {}
    for n in nodes:
        if n.parent is not None:
            parents[id(n.parent)] = n.parent
    for parent in parents.values():
        parent.children = [c for c in parent.children if id(c) not in doomed]
    for n in nodes:
        n.parent = None


def dispose(root: Node) -> None:
    """Break parent↔child reference cycles so the tree is reclaimed by
    refcounting alone. A 15 MB page builds a ~300k-node DOM whose cycles
    otherwise sit on the cyclic GC: with per-allocation-threshold
    collections repeatedly walking that many live containers, extraction
    measures ~30% slower (worse under concurrent workers, where the GC
    walks add memory-bandwidth contention). Call when done with the tree;
    nodes detached from it earlier are not reached (the Spark UDF mops
    those up with one gc.collect() per batch)."""
    nodes = root.iter_nodes()
    root.children = []
    for n in nodes:
        n.children = []
        n.parent = None


def new_text(value: str) -> Node:
    return Node(TEXT, text=value)


def new_element(tag: str, text: str | None = None) -> Node:
    el = Node(tag)
    if text is not None:
        el.append(new_text(text))
    return el


# Barriers past which implied-end-tag searches never look.
_SCOPE_BOUNDARY = frozenset((DOCUMENT, "html", "body", "table", "td", "th", "caption"))

# starttag → (tags it implicitly closes, scope stop set)
_IMPLIED_CLOSE: dict[str, tuple[frozenset[str], frozenset[str]]] = {
    "li": (frozenset(("li",)), frozenset(("ol", "ul", "body", "html", DOCUMENT))),
    "dt": (frozenset(("dt", "dd")), frozenset(("dl", "body", "html", DOCUMENT))),
    "dd": (frozenset(("dt", "dd")), frozenset(("dl", "body", "html", DOCUMENT))),
    "td": (frozenset(("td", "th")), frozenset(("tr", "table", "body", "html", DOCUMENT))),
    "th": (frozenset(("td", "th")), frozenset(("tr", "table", "body", "html", DOCUMENT))),
    "tr": (frozenset(("tr", "td", "th")), frozenset(("table", "thead", "tbody", "tfoot", "body", "html", DOCUMENT))),
    "option": (frozenset(("option",)), frozenset(("select", "body", "html", DOCUMENT))),
}


class _TreeBuilder(HTMLParser):
    def __init__(self, keep_raw_text: bool = False,
                 xml_mode: bool = False) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node(DOCUMENT)
        self.stack: list[Node] = [self.root]
        # opt-in: keep script/style text nodes (JSON-LD harvesting
        # needs <script type="application/ld+json"> payloads); the
        # extraction pipeline keeps the default skip
        self.keep_raw_text = keep_raw_text
        # opt-in: XML semantics — no HTML void elements and no
        # implied-close recovery. RSS's <link>url</link> is a void
        # element in HTML, so feed parsing under HTML rules silently
        # drops the link text out of the node; feeds are XML.
        self.xml_mode = xml_mode

    # helpers -----------------------------------------------------------------
    def _top(self) -> Node:
        return self.stack[-1]

    def _close_implied(self, targets: frozenset[str], stops: frozenset[str]) -> None:
        for i in range(len(self.stack) - 1, 0, -1):
            tag = self.stack[i].tag
            if tag in targets:
                del self.stack[i:]
                return
            if tag in stops:
                return

    @staticmethod
    def _attrs_to_dict(attrs) -> dict[str, str] | None:
        if not attrs:
            return None  # Node shares the singleton empty mapping
        out: dict[str, str] = {}
        for name, value in attrs:
            if name not in out:
                out[name] = value if value is not None else ""
        return out

    # HTMLParser callbacks ----------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if self.xml_mode:
            node = Node(tag, self._attrs_to_dict(attrs))
            self._top().append(node)
            self.stack.append(node)
            return
        if tag in P_CLOSING_TAGS:
            self._close_implied(frozenset(("p",)), _SCOPE_BOUNDARY)
        implied = _IMPLIED_CLOSE.get(tag)
        if implied is not None:
            self._close_implied(*implied)
        node = Node(tag, self._attrs_to_dict(attrs))
        self._top().append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag: str, attrs) -> None:
        node = Node(tag, self._attrs_to_dict(attrs))
        self._top().append(node)

    def handle_endtag(self, tag: str) -> None:
        if tag in VOID_ELEMENTS and not self.xml_mode:
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # mismatched end tag with no open counterpart: ignore (recovery)

    def handle_data(self, data: str) -> None:
        if data:
            # script/style content is never consulted: the cleaner (A6)
            # drops those subtrees before any text is read, and no
            # metadata getter looks inside them — skipping the text node
            # at parse time avoids allocating/copying the (often large)
            # JS/CSS payload of real-world pages entirely
            if self.stack[-1].tag in RAW_TEXT_TAGS and not self.keep_raw_text:
                return
            self._top().append(new_text(data))

    def handle_comment(self, data: str) -> None:
        self._top().append(Node(COMMENT, text=data))

    def updatepos(self, i: int, j: int) -> int:
        """No-op override of _markupbase position tracking: it exists
        only for error line/col reporting, which this builder never
        surfaces — ~3% of parse time on large pages."""
        return j

    # declarations / PIs / unknown: ignored
    def handle_decl(self, decl: str) -> None:
        pass

    def handle_pi(self, data: str) -> None:
        pass


def parse_html(text: str, keep_raw_text: bool = False,
               xml_mode: bool = False) -> Node:
    """Parse an HTML string into a mini-DOM; raises ParseError on
    unrecoverable parser failures (rare — html.parser is lenient).
    ``keep_raw_text=True`` retains script/style text nodes (JSON-LD
    harvesting); the extraction pipeline uses the default skip.
    ``xml_mode=True`` disables the HTML void-element and implied-close
    recovery (RSS/sitemap/feed XML, where <link>…</link> must nest)."""
    builder = _TreeBuilder(keep_raw_text, xml_mode)
    try:
        builder.feed(text)
        builder.close()
    except Exception as exc:  # html.parser can raise on pathological input
        raise ParseError(str(exc)) from exc
    return builder.root
