"""REAL HTML boilerplate strip: tokenizer + DOM heuristics + block classifier.

The north-star rule names "HTML boilerplate strip … DOM heuristics" as a
first-class extraction leg. Until this module, the engine's boilerplate
stage only filtered pre-tagged spans (``stages/boilerplate.py``); here the
boilerplate is *discovered* from raw markup the way production
main-content extractors (boilerpipe/jusText-family) do:

1. a real HTML tokenizer — tags with quoted attributes (``>`` inside a
   quoted attribute value must not terminate the tag), comments,
   ``<!DOCTYPE>``, raw-text elements (``<script>``/``<style>`` content is
   skipped wholesale, so markup-looking traps inside them never leak into
   text), and character references (decimal ``&#97;``, hex ``&#x61;``,
   and named entities);
2. DOM context — an open-element stack distinguishes inline tags (which
   do not break a text block) from block-level tags (which flush one),
   and records semantic ancestors (``nav``/``header``/``footer``/
   ``aside``) per block;
3. a multi-signal block classifier: a block is boilerplate if its link
   density exceeds ``LINK_DENSITY_MAX``, OR it has fewer than
   ``MIN_CONTENT_WORDS`` words, OR it sits under a semantic-boilerplate
   ancestor. Each signal is individually load-bearing on the fixture
   pages (an in-article related-links block is stripped only by link
   density; the footer paragraph only by ancestry; headings only by
   length), so disabling any one of them breaks the oracle hash.

Fixture side (same contract as the codec stages ``stages/png.py`` /
``stages/jpeg.py``): ``render_html`` wraps each document's REAL text into
a deterministic full page — nav menu, header + breadcrumbs, article
paragraphs with an injected related-links block, periodic ad ``<aside>``s,
comment traps, a script trap, footer — with closed-form boilerplate word
counts, so the ``extract_html_main`` query is oracle-checked bit-exactly:
the extracted main content must equal the original document text and the
block statistics must equal their closed forms. A tokenizer, entity,
DOM-stack, or classifier bug fails the hash.

Reference parity note: the reference runtime (pombreda/ocr) has no HTML
layer; this module exists for the BASELINE.json north rule (main-content
extraction), not for reference parity.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

LINK_DENSITY_MAX = 0.3
MIN_CONTENT_WORDS = 4
PARA_WORDS = 12

# Inline elements do not break a text block; everything else flushes one.
_INLINE = frozenset(
    "a abbr b bdi cite code em i kbd mark q s samp small span strong sub sup time u var".split()
)
# Void elements never go on the open stack.
_VOID = frozenset("area base br col embed hr img input link meta source track wbr".split())
# Blocks with any of these ancestors are boilerplate by DOM context.
_BOILER_ANCESTORS = frozenset(("nav", "header", "footer", "aside"))
_RAWTEXT = frozenset(("script", "style"))

_NAMED_ENTITIES = {
    "amp": "&",
    "lt": "<",
    "gt": ">",
    "quot": '"',
    "apos": "'",
    "copy": "©",
    "nbsp": " ",
}


# ---------------------------------------------------------------------------
# Fixture renderer
# ---------------------------------------------------------------------------


def _escape_text(word: str) -> str:
    return word.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _encode_word(word: str, d: int, i: int) -> str:
    """Entity-encode the first character of selected words: decimal
    character references when (d+i) % 5 == 0, hex when (d+i) % 11 == 0 —
    both must decode back to the original character."""
    if not word:
        return word
    rest = _escape_text(word[1:])
    if (d + i) % 5 == 0:
        return f"&#{ord(word[0])};{rest}"
    if (d + i) % 11 == 0:
        return f"&#x{ord(word[0]):x};{rest}"
    return _escape_text(word[0]) + rest


def paragraph_sizes(n_words: int) -> list[int]:
    """Closed-form paragraph split: PARA_WORDS-word paragraphs; a short
    remainder (< MIN_CONTENT_WORDS) folds into the last paragraph so no
    content block ever falls under the classifier's length threshold."""
    full, rem = divmod(n_words, PARA_WORDS)
    if full == 0:
        return [n_words]
    sizes = [PARA_WORDS] * full
    if rem >= MIN_CONTENT_WORDS:
        sizes.append(rem)
    else:
        sizes[-1] += rem
    return sizes


def render_html(doc_id: int, text: str) -> str:
    """Wrap a document's text into a deterministic full HTML page with
    known boilerplate. Closed forms used by the oracle (n = word count,
    L = 5 + doc_id % 4 nav links, P = len(paragraph_sizes(n))):

    - blocks:          L (nav items) + 2 (h1, crumbs) + 1 (related)
                       + P + P//3 (asides) + 2 (footer p, footer link)
    - content blocks:  P
    - boilerplate words: L + 16 + 3 * (P // 3)
    """
    d = int(doc_id)
    words = text.split(" ")
    if len(words) < MIN_CONTENT_WORDS:
        raise ValueError(f"doc {d}: need >= {MIN_CONTENT_WORDS} words, got {len(words)}")
    L = 5 + d % 4
    sizes = paragraph_sizes(len(words))

    out = [
        "<!DOCTYPE html>",
        f'<html lang="en"><head><title>doc {d}</title>',
        # Raw-text traps: markup and entities inside script/style must be
        # skipped wholesale, never decoded or counted.
        '<script type="text/javascript">var trap = "<p>not content</p>"; '
        "if (a < 3 && b > 4) { x = '&amp;'; }</script>",
        "<style>p > a { color: #333; } /* <aside>trap</aside> */</style>",
        "</head><body>",
        "<nav><ul>",
    ]
    for k in range(L):
        out.append(
            f'<li><a href="/cat/{k}?d={d}&amp;p=1" title="go > here">nav{k}</a></li>'
        )
    out.append("</ul></nav>")
    out.append(
        f"<header><h1>site {d % 100}</h1>"
        '<div class="crumbs"><a href="/">home</a> &gt; <a href="/sec">sec</a></div>'
        "</header>"
    )
    out.append("<article>")
    i = 0
    for p, size in enumerate(sizes):
        para = " ".join(_encode_word(words[i + j], d, i + j) for j in range(size))
        out.append(f"<p>{para}</p>")
        i += size
        if p == 0:
            out.append(
                '<p class="related">'
                '<a href="/r0">read</a> <a href="/r1">more</a> <a href="/r2">stories</a> '
                '<a href="/r3">here</a> <a href="/r4">now</a></p>'
            )
            out.append("<!-- hidden trap words that must never surface -->")
        if (p + 1) % 3 == 0:
            out.append(
                f'<aside class="ad"><a href="/buy?d={d}&amp;m={p}">'
                f"buy now {d % 7}</a></aside>"
            )
    out.append("</article>")
    out.append(
        "<footer><p>&copy; 2026 site &amp; partners</p>"
        '<a href="/about">about</a></footer>'
    )
    out.append("</body></html>")
    return "\n".join(out)


# ---------------------------------------------------------------------------
# Tokenizer + entity decoding
# ---------------------------------------------------------------------------


def decode_entities(s: str) -> str:
    """Decode character references: &#NNN; &#xHH; and the named set."""
    if "&" not in s:
        return s
    out: list[str] = []
    pos = 0
    n = len(s)
    while pos < n:
        amp = s.find("&", pos)
        if amp < 0:
            out.append(s[pos:])
            break
        out.append(s[pos:amp])
        semi = s.find(";", amp + 1, amp + 12)
        if semi < 0:
            out.append("&")
            pos = amp + 1
            continue
        body = s[amp + 1 : semi]
        if body.startswith("#x") or body.startswith("#X"):
            try:
                out.append(chr(int(body[2:], 16)))
                pos = semi + 1
                continue
            except ValueError:
                pass
        elif body.startswith("#"):
            try:
                out.append(chr(int(body[1:], 10)))
                pos = semi + 1
                continue
            except ValueError:
                pass
        elif body in _NAMED_ENTITIES:
            out.append(_NAMED_ENTITIES[body])
            pos = semi + 1
            continue
        out.append("&")
        pos = amp + 1
    return "".join(out)


_ATTR_RE = re.compile(
    r"""([a-zA-Z][a-zA-Z0-9_:-]*)\s*(?:=\s*("[^"]*"|'[^']*'|[^\s>]+))?"""
)


def _parse_attrs(s: str) -> dict[str, str]:
    attrs: dict[str, str] = {}
    for m in _ATTR_RE.finditer(s):
        val = m.group(2) or ""
        if val[:1] in "\"'":
            val = val[1:-1]
        attrs[m.group(1).lower()] = decode_entities(val)
    return attrs


def tokenize_html(html: str):
    """Yield ('start', name, self_closing, attrs) | ('end', name) |
    ('text', s).

    Handles comments, doctype, quoted attribute values (a ``>`` inside
    quotes does not end the tag), attribute capture with entity decoding,
    and raw-text elements (script/style content is consumed up to the
    matching close tag and dropped).
    """
    pos = 0
    n = len(html)
    lower = html.lower()
    while pos < n:
        lt = html.find("<", pos)
        if lt < 0:
            if pos < n:
                yield ("text", html[pos:])
            break
        if lt > pos:
            yield ("text", html[pos:lt])
        if html.startswith("<!--", lt):
            end = html.find("-->", lt + 4)
            pos = n if end < 0 else end + 3
            continue
        if html.startswith("<!", lt):
            end = html.find(">", lt)
            pos = n if end < 0 else end + 1
            continue
        # Parse the tag, respecting quoted attribute values.
        j = lt + 1
        closing = j < n and html[j] == "/"
        if closing:
            j += 1
        name_start = j
        while j < n and (html[j].isalnum() or html[j] in "-_"):
            j += 1
        name = lower[name_start:j]
        if not name:
            yield ("text", html[lt])
            pos = lt + 1
            continue
        attr_start = j
        quote = ""
        # A quote only opens a quoted value in *value position* (right
        # after "=", spec: before-attribute-value state). A quote inside
        # an unquoted value (title=don't) is literal data — treating it
        # as an opener would swallow the rest of the document as one tag.
        value_pos = False
        while j < n:
            ch = html[j]
            if quote:
                if ch == quote:
                    quote = ""
            elif ch == "=":
                value_pos = True
            elif ch in "\"'":
                if value_pos:
                    quote = ch
                value_pos = False
            elif ch == ">":
                break
            elif value_pos and ch not in " \t\r\n\f":
                # Unquoted value started; leave value position.
                value_pos = False
            j += 1
        self_closing = j > lt and html[j - 1] == "/"
        pos = j + 1 if j < n else n
        if closing:
            yield ("end", name)
            continue
        attr_src = html[attr_start : j - 1 if self_closing else j]
        attrs = _parse_attrs(attr_src) if "=" in attr_src else {}
        yield ("start", name, self_closing or name in _VOID, attrs)
        if name in _RAWTEXT and not self_closing:
            # Per the HTML spec, raw text ends only at "</name" followed
            # by whitespace, "/", ">" or EOF — "</scripty" stays inside
            # script data.
            search = pos
            while True:
                close = lower.find(f"</{name}", search)
                if close < 0:
                    pos = n
                    break
                after = close + 2 + len(name)
                if after >= n or html[after] in " \t\r\n\f/>":
                    gt = html.find(">", close)
                    pos = n if gt < 0 else gt + 1
                    break
                search = close + 2
            yield ("end", name)


# ---------------------------------------------------------------------------
# Block model + classifier
# ---------------------------------------------------------------------------


class Block:
    __slots__ = ("words", "link_words", "boiler_ancestor", "media_src")

    def __init__(self) -> None:
        self.words: list[str] = []
        self.link_words = 0
        self.boiler_ancestor = False
        self.media_src = ""  # non-empty: an embedded media block (<img>)

    @property
    def link_density(self) -> float:
        return self.link_words / len(self.words) if self.words else 0.0

    def is_content(self, min_words: int = MIN_CONTENT_WORDS) -> bool:
        if self.media_src:
            # Media blocks carry no word/link signals; DOM context decides
            # (an article image is content, a chrome logo is not).
            return not self.boiler_ancestor
        return (
            not self.boiler_ancestor
            and len(self.words) >= min_words
            and self.link_density <= LINK_DENSITY_MAX
        )


def extract_blocks(html: str) -> list[Block]:
    """Tokenize, maintain the open-element stack, and segment text into
    blocks at block-level element boundaries (inline tags do not flush)."""
    blocks: list[Block] = []
    cur = Block()
    stack: list[str] = []
    in_body = False
    a_depth = 0
    boiler_depth = 0

    def flush() -> None:
        nonlocal cur
        if cur.words:
            blocks.append(cur)
        cur = Block()

    for tok in tokenize_html(html):
        kind = tok[0]
        if kind == "text":
            if not in_body:
                continue
            for w in decode_entities(tok[1]).split():
                cur.words.append(w)
                if a_depth > 0:
                    cur.link_words += 1
                if boiler_depth > 0:
                    cur.boiler_ancestor = True
            continue
        name = tok[1]
        if kind == "start":
            self_closing = tok[2]
            if name == "body":
                in_body = True
            if name not in _INLINE:
                flush()
            if name == "img" and in_body:
                mb = Block()
                mb.media_src = tok[3].get("src", "")
                mb.boiler_ancestor = boiler_depth > 0
                blocks.append(mb)
                continue
            if not self_closing:
                stack.append(name)
                if name == "a":
                    a_depth += 1
                if name in _BOILER_ANCESTORS:
                    boiler_depth += 1
        else:  # end
            if name not in _INLINE:
                flush()
            if name == "body":
                in_body = False
            # Pop to the matching open tag (tolerates mis-nesting).
            if name in stack:
                while stack:
                    top = stack.pop()
                    if top == "a":
                        a_depth -= 1
                    if top in _BOILER_ANCESTORS:
                        boiler_depth -= 1
                    if top == name:
                        break
    flush()
    return blocks


def extract_main_text(html: str) -> tuple[str, int, int, int]:
    """-> (main_text, n_blocks, n_content_blocks, n_boiler_words)."""
    blocks = extract_blocks(html)
    content = [b for b in blocks if b.is_content()]
    main = " ".join(w for b in content for w in b.words)
    boiler_words = sum(len(b.words) for b in blocks if not b.is_content())
    return main, len(blocks), len(content), boiler_words


# ---------------------------------------------------------------------------
# Interleaved-span corpus leg: spans -> page -> span sequence
# ---------------------------------------------------------------------------


def render_span_html(doc_id_s: str, spans: list[dict]) -> str:
    """Render one interleaved-corpus document (its spans possibly in
    shuffled storage order) as a full HTML page IN READING ORDER — a web
    page's DOM order is its reading order: text spans become ``<p>``
    (entity-encoded), media spans become ``<img src="/media/<ref>.png">``,
    and the corpus's boilerplate spans become link-dense promo
    ``<aside>``s that the extractor must strip by classification (not by a
    pre-assigned kind tag). Page chrome (nav, header with a logo ``<img>``
    trap, related-links block, footer) must be fully stripped too."""
    d = int(doc_id_s.rsplit("-", 1)[-1])
    ordered = sorted(spans, key=lambda s: s["offset"])
    L = 5 + d % 4
    out = [
        "<!DOCTYPE html>",
        f'<html lang="en"><head><title>{doc_id_s}</title></head><body>',
        "<nav><ul>",
    ]
    for k in range(L):
        out.append(f'<li><a href="/cat/{k}">nav{k}</a></li>')
    out.append("</ul></nav>")
    out.append(
        f'<header><img src="/static/logo.png" alt="logo"><h1>site {d % 100}</h1></header>'
    )
    out.append("<article>")
    out.append(
        '<p class="related">'
        '<a href="/r0">read</a> <a href="/r1">more</a> <a href="/r2">stories</a> '
        '<a href="/r3">here</a> <a href="/r4">now</a></p>'
    )
    for sp in ordered:
        kind = sp["kind"]
        if kind == "media":
            out.append(f'<img src="/media/{sp["media_ref"]}.png" alt="">')
        elif kind == "boilerplate":
            links = " ".join(
                f'<a href="/promo/{k}">{_escape_text(w)}</a>'
                for k, w in enumerate(sp["text"].split(" "))
            )
            out.append(f'<aside class="promo">{links}</aside>')
        else:  # text span
            words = sp["text"].split(" ")
            base = int(sp["offset"]) * 8  # corpus WORDS_PER_SPAN
            enc = " ".join(_encode_word(w, d, base + j) for j, w in enumerate(words))
            out.append(f"<p>{enc}</p>")
    out.append("</article>")
    out.append('<footer><p>&copy; 2026 site &amp; partners</p></footer>')
    out.append("</body></html>")
    return "\n".join(out)


def extract_spans_from_html(html: str) -> list[tuple[str, str, str]]:
    """DOM-order span recovery: -> [(kind, text, media_ref)] for content
    blocks only, in reading order. Media refs are the src basename minus
    extension. Offsets are the caller's running counter (list position).

    Classification here drops the block-length prior (``min_words=1``):
    span-granular documents legitimately end in short spans, so only the
    structural signals (semantic ancestry, link density) apply — the
    promo asides are 100% linked and all chrome sits under
    nav/header/footer ancestors."""
    out: list[tuple[str, str, str]] = []
    for b in extract_blocks(html):
        if not b.is_content(min_words=1):
            continue
        if b.media_src:
            ref = b.media_src.rsplit("/", 1)[-1].rsplit(".", 1)[0]
            out.append(("media", "", ref))
        else:
            out.append(("text", " ".join(b.words), ""))
    return out


# ---------------------------------------------------------------------------
# Ray stages
# ---------------------------------------------------------------------------


def attach_span_html_payloads(batch: pa.Table) -> pa.Table:
    """Fixture stage for the interleaved-corpus leg: nested (doc_id,
    spans) -> (doc_id, payload) HTML pages. Span structs (possibly in
    shuffled storage order) are laid out in reading order on the page;
    the spans column is dropped — downstream recovers the sequence from
    markup alone."""
    ids = batch["doc_id"].to_pylist()
    span_lists = batch["spans"].to_pylist()
    pages = [render_span_html(i, sp) for i, sp in zip(ids, span_lists)]
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.string()),
            "payload": pa.array(pages, type=pa.large_string()),
        }
    )


class HtmlSpanExtractor:
    """Decode/extract stage (task-pooled with per-worker instance reuse via ``stateless_stage`` — an actor pool would pay its spin-up per query): recover the flagship span sequence (kind, text,
    media_ref, order) from rendered pages by DOM traversal + boilerplate
    classification. Output: one row per content span, offsets assigned by
    reading order — the same flat schema (and oracle) as the flagship
    ``extract_spans`` pipeline."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, kinds, texts, refs, offsets = [], [], [], [], []
        for doc_id, page in zip(
            batch["doc_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            for off, (kind, text, ref) in enumerate(extract_spans_from_html(page)):
                doc_ids.append(doc_id)
                kinds.append(kind)
                texts.append(text)
                refs.append(ref)
                offsets.append(off)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.string()),
                "kind": pa.array(kinds, type=pa.string()),
                "text": pa.array(texts, type=pa.string()),
                "media_ref": pa.array(refs, type=pa.string()),
                "offset": pa.array(np.asarray(offsets, dtype=np.int32)),
            }
        )


def attach_html_payloads(batch: pa.Table) -> pa.Table:
    """Fixture stage: (doc_id, text) -> (doc_id, payload) with the text
    wrapped into a full deterministic HTML page. The text column is
    DROPPED so the extractor downstream can only recover it from markup."""
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    pages = [render_html(d, t) for d, t in zip(ids, texts)]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "payload": pa.array(pages, type=pa.large_string()),
        }
    )


class HtmlMainExtractor:
    """Decode/extract stage (task-pooled with per-worker instance reuse via ``stateless_stage`` — an actor pool would pay its spin-up per query): real main-content extraction from raw HTML.

    Per-payload parsing is inherently sequential (same contract as the
    codec decoders); batches stay small and the pool provides the
    parallelism. Output schema: doc_id, extracted_text, n_blocks,
    n_content_blocks, n_boiler_words.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts, nb, nc, bw = [], [], [], []
        for page in batch["payload"].to_pylist():
            main, n_blocks, n_content, n_boiler_words = extract_main_text(page)
            texts.append(main)
            nb.append(n_blocks)
            nc.append(n_content)
            bw.append(n_boiler_words)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "extracted_text": pa.array(texts, type=pa.string()),
                "n_blocks": pa.array(np.asarray(nb, dtype=np.int64)),
                "n_content_blocks": pa.array(np.asarray(nc, dtype=np.int64)),
                "n_boiler_words": pa.array(np.asarray(bw, dtype=np.int64)),
            }
        )


def extract_links(html: str) -> list[tuple[str, str]]:
    """All anchors of a page in DOM order as (href, anchor_text) —
    the crawler's frontier-extraction primitive. Hrefs come from the
    attribute parser (entity references in attribute values decode —
    ``&amp;`` in query strings is the classic case); anchor text is the
    entity-decoded, whitespace-normalized text between the tags.
    Anchors inside script/style never surface (rawtext is consumed by
    the tokenizer); nested anchors close the open one (HTML5 parse
    behavior for misnested <a>)."""
    out: list[tuple[str, str]] = []
    href: str | None = None
    words: list[str] = []
    for tok in tokenize_html(html):
        if tok[0] == "start" and tok[1] == "a":
            if href is not None:
                out.append((href, " ".join(words)))
            href = tok[3].get("href")
            words = []
        elif tok[0] == "end" and tok[1] == "a":
            if href is not None:
                out.append((href, " ".join(words)))
            href, words = None, []
        elif tok[0] == "text" and href is not None:
            words.extend(decode_entities(tok[1]).split())
    if href is not None:
        out.append((href, " ".join(words)))
    return out


class HtmlLinkExtractor:
    """Decode/extract stage (task-pooled with per-worker instance reuse via ``stateless_stage`` — an actor pool would pay its spin-up per query): payload -> one row per anchor
    (doc_id, link_idx, href, anchor)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids: list[int] = []
        idxs: list[int] = []
        hrefs: list[str] = []
        anchors: list[str] = []
        for d, page in zip(
            batch["doc_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            for i, (href, anchor) in enumerate(extract_links(page)):
                ids.append(d)
                idxs.append(i)
                hrefs.append(href)
                anchors.append(anchor)
        return pa.table(
            {
                "doc_id": pa.array(np.asarray(ids, dtype=np.int64)),
                "link_idx": pa.array(np.asarray(idxs, dtype=np.int64)),
                "href": pa.array(hrefs, type=pa.string()),
                "anchor": pa.array(anchors, type=pa.string()),
            }
        )
