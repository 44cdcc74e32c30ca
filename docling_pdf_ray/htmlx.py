"""M17 — DOM-heuristic HTML main-content extraction (boilerplate strip).

The reference has no HTML path; this operator is mandated by the
north-star ("strips HTML boilerplate via DOM-tree heuristics —
tag/text-density scoring, link-density pruning"). The heuristics
follow the published boilerplate-detection line (Kohlschütter,
Fankhauser & Nejdl, "Boilerplate detection using shallow text
features", WSDM 2010; Sun, Song & Liao, "DOM based content extraction
via text density", SIGIR 2011). Implemented over the
stdlib ``html.parser`` (no lxml/bs4 in this sandbox) with **frozen
deterministic constants** (:class:`~docling_pdf_ray.config.PipelineConfig`)
so the single-threaded oracle and the Ray pipeline produce
byte-identical ``full_text`` per url.

Specification (the contract unit tests pin):

1. Subtrees under ``STRIP_TAGS`` (script/style/nav/header/footer/aside/
   form/…) are removed entirely.
2. Candidate blocks, in document order:
   * heading elements ``h1..h6``;
   * leaf text blocks ``p li pre blockquote td th``
     (a leaf block consumes its whole subtree — nested leaf blocks are
     not re-emitted);
   * maximal runs of direct text children of container elements
     (``div section article main body``) that are not inside any leaf
     block ("pseudo-blocks").
3. Block statistics over normalized text (``' '.join(s.split())``):
   ``text_len``; ``link_len`` = normalized text length under ``<a>``
   descendants; ``tag_count`` = element descendants;
   ``density = text_len / (1 + tag_count)``;
   ``link_density = link_len / text_len`` (1.0 when text is empty).
4. Keep rules: headings kept iff ``text_len >= html_min_heading_chars``;
   all other blocks kept iff ``text_len >= html_min_block_chars`` and
   ``link_density <= html_max_link_density`` and
   ``density >= html_min_text_density``.
5. Rendering: heading level *n* → ``'#'*n + ' ' + text``; ``li`` →
   ``'- ' + text``; everything else → ``text``. Blocks joined with
   ``'\\n\\n'``; spans are ``[start, end)`` offsets of each rendered
   block in ``full_text``.
6. ``tables`` = every non-stripped ``<table>`` with non-empty
   normalized text → ``{content, page=-1}`` (analog of reference
   pdf_extractor.py:395-401; page is unknown for HTML, encoded as -1
   because the Arrow schema types ``page`` as int32 where the reference
   used the string ``'unknown'``).
   ``images`` = every non-stripped ``<img>`` →
   ``{description = alt | src | 'image', page=-1}``
   (analog of pdf_extractor.py:404-410).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser

from .config import DEFAULT_CONFIG, PipelineConfig

STRIP_TAGS = frozenset({
    "script", "style", "noscript", "template", "svg", "iframe",
    "nav", "header", "footer", "aside", "form", "button", "select",
    "option", "head",
})
HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})
LEAF_BLOCK_TAGS = frozenset({"p", "li", "pre", "blockquote", "td", "th"})
CONTAINER_TAGS = frozenset({"div", "section", "article", "main", "body"})
# inline elements join the surrounding text into ONE pseudo-block when
# they appear as direct children of a container (prose written straight
# into divs with <b>/<a>/<span> markup must not lose or split text)
INLINE_TAGS = frozenset({
    "a", "b", "i", "em", "strong", "span", "code", "small", "u", "s",
    "sub", "sup", "mark", "abbr", "time", "cite", "q", "kbd", "var",
    "samp", "br", "wbr",
})
VOID_TAGS = frozenset({
    "br", "img", "hr", "meta", "link", "input", "area", "base", "col",
    "embed", "source", "track", "wbr",
})

_KIND = {"p": "paragraph", "li": "listitem", "pre": "pre",
         "blockquote": "quote", "td": "cell", "th": "cell",
         "_text": "text"}


@dataclass
class _Node:
    tag: str
    attrs: dict[str, str] = field(default_factory=dict)
    children: list = field(default_factory=list)  # _Node | str


class _TreeBuilder(HTMLParser):
    """Forgiving tree builder: unmatched end tags are ignored, void
    elements never open a scope, unclosed tags close at EOF."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("_root")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, {k: (v or "") for k, v in attrs})
        self.stack[-1].children.append(node)
        if tag not in VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(_Node(tag, {k: (v or "") for k, v in attrs}))

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # unmatched end tag: ignore

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_dom(html_text: str) -> _Node:
    tb = _TreeBuilder()
    tb.feed(html_text)
    tb.close()
    return tb.root


def _norm(s: str) -> str:
    return " ".join(s.split())


def _collect_text(node: _Node) -> str:
    out: list[str] = []

    def walk(n: _Node) -> None:
        for c in n.children:
            if isinstance(c, str):
                out.append(c)
            elif c.tag not in STRIP_TAGS:
                walk(c)

    walk(node)
    return _norm(" ".join(out))


def _link_len(node: _Node) -> int:
    total = 0

    def walk(n: _Node, in_a: bool) -> None:
        nonlocal total
        for c in n.children:
            if isinstance(c, str):
                continue
            if c.tag in STRIP_TAGS:
                continue
            if c.tag == "a" and not in_a:
                total += len(_collect_text(c))
                walk(c, True)
            else:
                walk(c, in_a)

    walk(node, False)
    return total


def _tag_count(node: _Node) -> int:
    n = 0

    def walk(x: _Node) -> None:
        nonlocal n
        for c in x.children:
            if isinstance(c, str) or c.tag in STRIP_TAGS:
                continue
            n += 1
            walk(c)

    walk(node)
    return n


@dataclass
class Block:
    kind: str
    text: str          # normalized text
    rendered: str      # markdown-ish rendering

    @staticmethod
    def make(kind: str, text: str, level: int = 0) -> "Block":
        if kind == "heading":
            rendered = "#" * level + " " + text
        elif kind == "listitem":
            rendered = "- " + text
        else:
            rendered = text
        return Block(kind, text, rendered)


@dataclass
class HtmlExtract:
    full_text: str
    spans: list[dict]    # {start, end, kind}
    tables: list[dict]   # {content, page}
    images: list[dict]   # {description, page}
    links: list[str]     # absolute out-links from non-stripped subtrees


def _walk_abs_anchors(root: _Node, emit) -> None:
    """The ONE anchor-harvesting walk ``collect_links`` and
    ``collect_anchors`` share — every ``<a>`` with an ABSOLUTE http(s)
    href, in document order, from NON-STRIPPED subtrees only. One home
    so the two consumers can never silently disagree on the rules
    (scheme filter, STRIP_TAGS treatment, traversal order)."""

    def walk(n: _Node) -> None:
        for c in n.children:
            if isinstance(c, str) or c.tag in STRIP_TAGS:
                continue
            if c.tag == "a":
                href = c.attrs.get("href", "")
                if href.startswith(("http://", "https://")):
                    emit(c, href)
            walk(c)

    walk(root)


def collect_links(root: _Node) -> list[str]:
    """Main-content out-link inventory (r4 — the anchor-span → edge
    operator's source): every ``<a href>`` with an ABSOLUTE http(s)
    href, in document order, from NON-STRIPPED subtrees only. Anchors
    inside boilerplate (nav/header/footer/aside — ``STRIP_TAGS``) are
    excluded by the same rule that strips their text: a link graph
    built from navigation chrome measures the site template, not the
    document. Relative hrefs are excluded (no base-url resolution in
    this corpus — host extraction needs an authority). Duplicates are
    preserved (a page linking a host twice is two edges; consumers
    aggregate). Independent of the block KEEP decision: a link-only
    block is dropped from ``full_text`` by link-density pruning yet
    still contributes its anchors — link evidence and text evidence
    are different signals."""
    out: list[str] = []
    _walk_abs_anchors(root, lambda _c, href: out.append(href))
    return out


def collect_anchors(root: _Node) -> list[tuple[str, str]]:
    """(href, anchor_text) pairs under :func:`collect_links`' exact
    harvesting rules (the shared :func:`_walk_abs_anchors` walk) — the
    anchor-TEXT signal a web-corpus link graph weighs (the text a page
    uses to describe its target). Anchor text is the subtree's visible
    text under the extractor's OWN normalization (:func:`_collect_text`
    — Unicode-ws collapse, the same rule ``full_text`` receives), so
    anchor text and document text can never disagree on what
    whitespace means; consumers re-tokenizing with the ASCII dedup
    kernels do so on top of this, as they do for full_text. Additive
    beside ``collect_links`` — the extraction pipeline's output schema
    is untouched."""
    out: list[tuple[str, str]] = []
    _walk_abs_anchors(root,
                      lambda c, href: out.append((href, _collect_text(c))))
    return out


def _keep(cfg: PipelineConfig, text_len: int, link_len: int, tags: int) -> bool:
    if text_len < cfg.html_min_block_chars:
        return False
    link_density = (link_len / text_len) if text_len else 1.0
    if link_density > cfg.html_max_link_density:
        return False
    density = text_len / (1 + tags)
    return density >= cfg.html_min_text_density


def extract_blocks(root: _Node, cfg: PipelineConfig) -> tuple[list[Block], list[dict], list[dict]]:
    blocks: list[Block] = []
    tables: list[dict] = []
    images: list[dict] = []

    def emit_pseudo(run: list) -> None:
        # a run is a mix of raw strings and inline _Nodes; wrap it in a
        # synthetic node so the standard text/link/tag collectors apply
        pseudo = _Node("_run", children=list(run))
        text = _collect_text(pseudo)
        if text and _keep(cfg, len(text), _link_len(pseudo), _tag_count(pseudo)):
            blocks.append(Block("text", text, text))
        # images/tables nested in the run's inline elements still join
        # the inventories regardless of the keep decision (M10/M11)
        _collect_nested(pseudo)

    def walk(node: _Node) -> None:
        text_run: list = []
        for c in node.children:
            if isinstance(c, str):
                if node.tag in CONTAINER_TAGS:
                    text_run.append(c)
                continue
            if c.tag in STRIP_TAGS:
                continue
            if c.tag in INLINE_TAGS and node.tag in CONTAINER_TAGS:
                # inline markup continues the current pseudo-block
                text_run.append(c)
                continue
            # a block-level element child ends any pending pseudo run
            if text_run:
                emit_pseudo(text_run)
                text_run = []
            if c.tag == "table":
                t = _collect_text(c)
                if t:
                    tables.append({"content": t, "page": -1})
                walk(c)  # td/th inside may still be candidate blocks
                continue
            if c.tag == "img":
                desc = c.attrs.get("alt") or c.attrs.get("src") or "image"
                images.append({"description": desc, "page": -1})
                continue
            if c.tag in HEADING_TAGS:
                text = _collect_text(c)
                if len(text) >= cfg.html_min_heading_chars:
                    blocks.append(Block.make("heading", text, level=int(c.tag[1])))
                _collect_nested(c)
                continue
            if c.tag in LEAF_BLOCK_TAGS:
                text = _collect_text(c)
                if _keep(cfg, len(text), _link_len(c), _tag_count(c)):
                    blocks.append(Block.make(_KIND[c.tag], text))
                _collect_nested(c)
                continue
            walk(c)
        if text_run:
            emit_pseudo(text_run)

    def _collect_nested(node: _Node) -> None:
        # images AND tables inside consumed leaf blocks are still
        # reported (M10/M11 analogs — a leaf block consumes its subtree
        # for TEXT blocks only, not for the element inventories)
        for c in node.children:
            if isinstance(c, str) or c.tag in STRIP_TAGS:
                continue
            if c.tag == "img":
                desc = c.attrs.get("alt") or c.attrs.get("src") or "image"
                images.append({"description": desc, "page": -1})
            elif c.tag == "table":
                t = _collect_text(c)
                if t:
                    tables.append({"content": t, "page": -1})
                _collect_nested(c)
            else:
                _collect_nested(c)

    walk(root)
    return blocks, tables, images


def extract_main_content(html_bytes: bytes,
                         cfg: PipelineConfig = DEFAULT_CONFIG) -> HtmlExtract:
    """Pure, deterministic: bytes in → (full_text, spans, tables, images).

    Decoding: utf-8 with ``errors='replace'`` (crawl payloads are
    declared-utf-8 in this corpus; replacement keeps the function total).
    """
    text = html_bytes.decode("utf-8", errors="replace")
    root = parse_dom(text)
    blocks, tables, images = extract_blocks(root, cfg)

    parts: list[str] = []
    spans: list[dict] = []
    pos = 0
    for i, b in enumerate(blocks):
        if i:
            pos += 2  # the '\n\n' separator
        parts.append(b.rendered)
        spans.append({"start": pos, "end": pos + len(b.rendered), "kind": b.kind})
        pos += len(b.rendered)
    return HtmlExtract("\n\n".join(parts), spans, tables, images,
                       collect_links(root))
