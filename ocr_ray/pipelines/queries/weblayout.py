"""Query registry section: web/layout extraction (HTML boilerplate strip,
PDF layout parse) — the two north-rule extraction legs over raw markup
and typeset layout rather than pre-tagged spans.

Both queries run the REAL engine end to end: a fixture stage wraps each
document's text into genuine markup/typeset bytes (dropping the text
column, so the extractor can only recover it from the format), and an
actor-pool extractor parses it back. The oracles assert the extracted
text equals the source text bit-exactly plus closed-form layout
statistics — a tokenizer, entity, DOM-heuristic, xref, inflate, escape,
or reading-order bug fails the hash.
"""

from __future__ import annotations

import ray
import ray.data

from ocr_ray.sizing import pool_size

from ocr_ray.pipelines.queries._shared import query, read_docs, stateless_stage
from ocr_ray.pipelines.queries.extract import _EXTRACT_SQL

# Shared CTE: the page renderer's paragraph closed form (12-word
# paragraphs, remainder < 4 folds into the last) — used by both the HTML
# and WARC oracles, so a formula change edits exactly one string.
_NPARA_CTE = """WITH s AS (
  SELECT doc_id, text, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
  FROM documents
),
p AS (SELECT doc_id, text, n, n // 12 AS f, n % 12 AS r FROM s),
q AS (
  SELECT doc_id, text,
    CASE WHEN f = 0 THEN 1 WHEN r >= 4 THEN f + 1 ELSE f END AS n_para
  FROM p
)"""

_HTML_SQL = _NPARA_CTE + """
SELECT doc_id, text AS extracted_text,
  CAST((5 + doc_id % 4) + n_para + (n_para // 3) + 5 AS BIGINT) AS n_blocks,
  CAST(n_para AS BIGINT) AS n_content_blocks,
  CAST((5 + doc_id % 4) + 16 + 3 * (n_para // 3) AS BIGINT) AS n_boiler_words
FROM q
"""


@query("extract_html_main", sql=_HTML_SQL)
def extract_html_main(sf_dir: str) -> ray.data.Dataset:
    """REAL HTML boilerplate strip (north rule: "HTML boilerplate strip
    … DOM heuristics"): each document's text is wrapped into a full
    deterministic HTML page (nav menu, header + breadcrumbs, article
    paragraphs with entity-encoded characters, an in-article
    related-links block, periodic ad asides, comment and script traps,
    footer — ``stages/html.py``), then the ``HtmlMainExtractor`` actor
    stage tokenizes the markup, segments text blocks on the DOM element
    stack, and classifies each block with three independently
    load-bearing signals (link density, minimum words, semantic-ancestor
    context). The oracle checks the recovered main content equals the
    source text exactly and the block counts equal their closed forms."""
    from ocr_ray.stages.html import HtmlMainExtractor, attach_html_payloads

    ds = read_docs(sf_dir, columns=["doc_id", "text"])
    with_payloads = ds.map_batches(
        attach_html_payloads, batch_format="pyarrow", batch_size=256
    )
    return stateless_stage(with_payloads, HtmlMainExtractor, batch_size=256)


@query("extract_html_spans", sql=_EXTRACT_SQL)
def extract_html_spans(sf_dir: str) -> ray.data.Dataset:
    """The north rule's DOM-heuristics leg over the INTERLEAVED corpus:
    each document's spans (text + media_ref + boilerplate, stored
    shuffled) are rendered as a real HTML page — text spans as ``<p>``,
    media spans as ``<img src="/media/<ref>.png">``, the corpus's
    boilerplate spans as 100%-linked promo ``<aside>``s, plus page chrome
    with a header-logo ``<img>`` trap — and ``HtmlSpanExtractor`` must
    recover the EXACT flagship span sequence (kind, text, media_ref,
    order) from markup alone: DOM traversal for reading order,
    link-density + semantic-ancestry classification for the strip, src
    parsing for media refs. Shares the flagship ``extract_spans`` oracle
    verbatim — a tokenizer, classifier, ordering, or attribute bug
    produces a different span sequence and fails the hash."""
    from ocr_ray.corpus import ensure_corpus
    from ocr_ray.sources import read_documents
    from ocr_ray.stages.html import HtmlSpanExtractor, attach_span_html_payloads

    corpus = ensure_corpus(sf_dir, glyphs=False)
    ds = read_documents(corpus)
    with_payloads = ds.map_batches(
        attach_span_html_payloads, batch_format="pyarrow", batch_size=256
    )
    return stateless_stage(with_payloads, HtmlSpanExtractor, batch_size=256)


@query("extract_pdf_spans", sql=_EXTRACT_SQL)
def extract_pdf_spans(sf_dir: str) -> ray.data.Dataset:
    """The north rule's layout-parse leg over the INTERLEAVED corpus:
    each document's spans (stored shuffled) are typeset as a real
    multi-page PDF in reading order — text spans as positioned lines
    (literal/hex/TJ forms rotating), media spans as embedded image
    XObjects placed via ``q cm /Name Do Q`` whose media_ref is
    recoverable ONLY through the page resource dictionary (opaque
    per-page names, ref in the XObject's /Name), corpus boilerplate
    spans as running header/footer marginalia outside the content band —
    and ``PdfSpanExtractor`` recovers the exact flagship span sequence:
    object-graph resolution for refs, position-band chrome strip,
    reading-order sort. Shares the flagship ``extract_spans`` oracle
    verbatim."""
    from ocr_ray.corpus import ensure_corpus
    from ocr_ray.sources import read_documents
    from ocr_ray.stages.pdf import PdfSpanExtractor, attach_span_pdf_payloads

    corpus = ensure_corpus(sf_dir, glyphs=False)
    ds = read_documents(corpus)
    with_payloads = ds.map_batches(
        attach_span_pdf_payloads, batch_format="pyarrow", batch_size=256
    )
    return stateless_stage(with_payloads, PdfSpanExtractor, batch_size=256)


@query("extract_warc_spans", sql=_EXTRACT_SQL)
def extract_warc_spans(sf_dir: str) -> ray.data.Dataset:
    """The full web-scale ingest matrix closed: the INTERLEAVED corpus is
    rendered as pages, packed into genuine WARC/1.0 archives (gzip and
    chunked HTTP shapes rotating per document), and the span sequence is
    recovered through ALL layers — WARC framing → HTTP decode → DOM
    traversal + boilerplate classification — one flat row per content
    span. Shares the flagship ``extract_spans`` oracle verbatim: the
    archive path must reproduce exactly what the direct span pipeline
    produces."""
    from ocr_ray.corpus import ensure_corpus
    from ocr_ray.sources import read_documents
    from ocr_ray.stages.warc import WarcSpanExtractor, attach_span_warc_payloads

    corpus = ensure_corpus(sf_dir, glyphs=False)
    ds = read_documents(corpus)
    with_payloads = ds.map_batches(
        attach_span_warc_payloads, batch_format="pyarrow", batch_size=128
    )
    return stateless_stage(with_payloads, WarcSpanExtractor, batch_size=4)


@query("extract_mixed_spans", sql=_EXTRACT_SQL)
def extract_mixed_spans(sf_dir: str) -> ray.data.Dataset:
    """Format-HETEROGENEOUS extraction — the shape real crawl corpora
    have: each interleaved-corpus document arrives as an HTML page, a
    typeset PDF, or a single-document WARC archive (rotating by doc id),
    with NO format column; ``MixedSpanExtractor`` detects the format
    from the payload bytes (magic sniff: %PDF- / WARC/ / HTML fallback)
    and routes each document through the matching parser stack inside
    ONE actor-pool stage — no driver-side split, no multi-pass read.
    Shares the flagship ``extract_spans`` oracle verbatim: all three
    routes must reproduce the exact span sequence."""
    from ocr_ray.corpus import ensure_corpus
    from ocr_ray.sources import read_documents
    from ocr_ray.stages.mixed import MixedSpanExtractor, attach_mixed_payloads

    corpus = ensure_corpus(sf_dir, glyphs=False)
    ds = read_documents(corpus)
    with_payloads = ds.map_batches(
        attach_mixed_payloads, batch_format="pyarrow", batch_size=128
    )
    return stateless_stage(with_payloads, MixedSpanExtractor, batch_size=64)


_WARC_SQL = _NPARA_CTE + """
SELECT doc_id, text AS extracted_text,
  CAST((5 + doc_id % 4) + n_para + (n_para // 3) + 5 AS BIGINT) AS n_blocks,
  CAST(n_para AS BIGINT) AS n_content_blocks,
  CAST((5 + doc_id % 4) + 16 + 3 * (n_para // 3) AS BIGINT) AS n_boiler_words,
  CAST(200 AS BIGINT) AS http_status,
  CASE WHEN doc_id % 2 = 1 THEN 'gzip' ELSE 'identity' END AS content_encoding,
  doc_id % 3 = 0 AS transfer_chunked,
  CAST(3 + doc_id % 2 AS BIGINT) AS n_http_headers
FROM q
"""


@query("extract_warc_main", sql=_WARC_SQL)
def extract_warc_main(sf_dir: str) -> ray.data.Dataset:
    """REAL web-archive input path (the north rule's native ingest
    format): documents are packed into genuine WARC/1.0 files (one
    warcinfo + request/response record pairs, Content-Length framing,
    header-lookalike trap bodies — ``stages/warc.py``), their response
    payloads are real HTTP/1.1 messages rotating through gzip
    content-encoding and chunked transfer-encoding (composed when both
    apply), and the ``WarcMainExtractor`` actor stage walks records by
    Content-Length arithmetic, parses + decodes the HTTP layer, and runs
    the full HTML main-content extraction on each response. The oracle
    checks text recovered through all four protocol layers equals the
    source text exactly, plus closed-form HTTP metadata."""
    from ocr_ray.stages.warc import WarcMainExtractor, attach_warc_payloads

    ds = read_docs(sf_dir, columns=["doc_id", "text"])
    with_payloads = ds.map_batches(
        attach_warc_payloads, batch_format="pyarrow", batch_size=128
    )
    return stateless_stage(with_payloads, WarcMainExtractor, batch_size=4)


_PDF_SQL = """
WITH s AS (
  SELECT doc_id, text, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
  FROM documents
),
c AS (SELECT doc_id, text, n // 8 AS f, n % 8 AS r FROM s),
l AS (
  SELECT doc_id, text, f, r,
    f + CASE WHEN r > 0 THEN 1 ELSE 0 END AS n_lines
  FROM c
)
SELECT doc_id, text AS extracted_text,
  CAST((n_lines + 9) // 10 AS BIGINT) AS n_pages,
  CAST(2 * f + CASE WHEN r >= 5 THEN 2 WHEN r > 0 THEN 1 ELSE 0 END AS BIGINT)
    AS n_chunks
FROM l
"""


@query("extract_pdf_text", sql=_PDF_SQL)
def extract_pdf_text(sf_dir: str) -> ray.data.Dataset:
    """REAL PDF layout parse (north rule: "PDF/layout parse"): each
    document's text is typeset into a genuine PDF 1.4 file (xref table,
    FlateDecode content streams, rotated line emission order, split
    left/right chunks via Tm + relative Td, literal/hex/TJ string forms
    with octal escapes — ``stages/pdf.py``), then the
    ``PdfTextExtractor`` actor stage parses startxref → xref → object
    graph, inflates the streams, interprets the text operators tracking
    the line matrix, and reassembles READING ORDER by (page, -y, x) —
    stream order is deliberately wrong, so concatenating Tj strings
    fails. The oracle checks the recovered text equals the source text
    exactly plus closed-form page/chunk counts."""
    from ocr_ray.stages.pdf import PdfTextExtractor, attach_pdf_payloads

    ds = read_docs(sf_dir, columns=["doc_id", "text"])
    with_payloads = ds.map_batches(
        attach_pdf_payloads, batch_format="pyarrow", batch_size=256
    )
    return stateless_stage(with_payloads, PdfTextExtractor, batch_size=256)


_TABLE_SQL = """
WITH s AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
dims AS (
  SELECT doc_id, w, len(w) AS n,
         greatest(len(w) // 3, 1) AS ncells,
         2 + doc_id % 3 AS ncol
  FROM s
),
cells AS (
  SELECT doc_id,
    CAST(k // ncol AS BIGINT) AS row_idx,
    CAST(k % ncol AS BIGINT) AS col_idx,
    array_to_string(
      CASE WHEN k = ncells - 1 THEN w[3*k+1:n] ELSE w[3*k+1:3*k+3] END,
      ' ') AS cell_text
  FROM dims, UNNEST(generate_series(0, CAST(ncells - 1 AS BIGINT))) AS t(k)
)
SELECT doc_id, row_idx, col_idx, cell_text FROM cells
"""


@query("extract_html_tables", sql=_TABLE_SQL)
def extract_html_tables(sf_dir: str) -> ray.data.Dataset:
    """STRUCTURED-table extraction from real HTML — the data-vs-layout
    table classification problem on top of the shared tokenizer: each
    document's words are typeset into a full page holding a DATA table
    (caption, colgroup, thead, entity-encoded cells, in-table comments,
    pretty-printed whitespace) next to a 100%-linked nav LAYOUT table,
    and ``HtmlTableExtractor`` must emit exactly the body cells of the
    data table as (doc_id, row_idx, col_idx, cell_text) — rejecting the
    layout table by link density, requiring ``<th>`` headers, excluding
    the header row and caption from the grid, and decoding entities in
    cell text. The oracle reproduces the renderer's closed-form word
    partition (3-word cells, remainder in the last cell, row-major at
    2 + doc_id % 3 columns) with list slicing, so a tokenizer,
    classification, ordering, or decode bug breaks the value hash
    (``stages/tables.py``)."""
    from ocr_ray.stages.tables import HtmlTableExtractor, attach_table_payloads

    ds = read_docs(sf_dir, columns=["doc_id", "text"])
    with_payloads = ds.map_batches(
        attach_table_payloads, batch_format="pyarrow", batch_size=256
    )
    return stateless_stage(with_payloads, HtmlTableExtractor, batch_size=256)


_TWOCOL_SQL = """
WITH s AS (
  SELECT doc_id, text, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
  FROM documents
)
SELECT doc_id, text AS extracted_text,
  CAST(((n + 3) // 4 + 19) // 20 AS BIGINT) AS n_pages,
  CAST((n + 3) // 4 AS BIGINT) AS n_lines
FROM s
"""


@query("extract_pdf_columns", sql=_TWOCOL_SQL)
def extract_pdf_columns(sf_dir: str) -> ray.data.Dataset:
    """Two-COLUMN layout parse (north rule: "PDF/layout parse … reading
    order"): each document is typeset as a real multi-page newspaper
    layout — 4-word lines filling the left column top-to-bottom, then
    the right, with rotated stream-emission order and the rotating
    literal/hex/TJ string forms — and ``PdfTwoColExtractor`` recovers
    reading order by CLUSTERING chunk x-positions into columns (x-gap
    split) and reading columns left-to-right, top-to-bottom. A naive
    (-y, x) sort interleaves the columns and scrambles every page, so
    the oracle's full-text equality pins the column heuristic itself;
    page/line counts check the closed-form pagination
    (``stages/pdf.py:encode_twocol_pdf``)."""
    from ocr_ray.stages.pdf import PdfTwoColExtractor, attach_twocol_payloads

    ds = read_docs(sf_dir, columns=["doc_id", "text"])
    with_payloads = ds.map_batches(
        attach_twocol_payloads, batch_format="pyarrow", batch_size=128
    )
    return stateless_stage(with_payloads, PdfTwoColExtractor, batch_size=128)


_HYPH_SQL = """
SELECT doc_id, text AS extracted_text FROM documents
"""


@query("extract_pdf_dehyphenated", sql=_HYPH_SQL)
def extract_pdf_dehyphenated(sf_dir: str) -> ray.data.Dataset:
    """DE-HYPHENATION — the typesetting inverse every justified-text
    extractor needs: documents are typeset at a fixed 12-char line
    width where words that don't fit are SPLIT with a trailing hyphen
    (recursively for words longer than a line), and
    ``PdfDehyphenExtractor`` must rejoin them — reading-order sort,
    then iterated merge of hyphen-terminated lines into the next
    line's first token. Corpus words never contain '-', so every
    trailing hyphen is a break (the invariant is documented at the
    renderer). The oracle is losslessness itself: extracted text ==
    source text bit-exact; a single missed or spurious join breaks the
    hash (~6 joins/doc on this corpus). Counts are asserted in
    tests/test_tables.py (``stages/pdf.py:encode_hyphen_pdf``)."""
    from ocr_ray.stages.pdf import PdfDehyphenExtractor, attach_hyphen_payloads

    ds = read_docs(sf_dir, columns=["doc_id", "text"])
    with_payloads = ds.map_batches(
        attach_hyphen_payloads, batch_format="pyarrow", batch_size=128
    )
    extracted = stateless_stage(with_payloads, PdfDehyphenExtractor, batch_size=128)
    return extracted.map_batches(
        lambda t: t.select(["doc_id", "extracted_text"]), batch_format="pyarrow"
    )


_LINKS_SQL = _NPARA_CTE + """,
base AS (SELECT doc_id, 5 + doc_id % 4 AS L, n_para // 3 AS n_aside FROM q),
nav AS (
  SELECT doc_id, k AS link_idx,
    '/cat/' || k || '?d=' || doc_id || '&p=1' AS href,
    'nav' || k AS anchor
  FROM base, UNNEST(generate_series(0, L - 1)) AS t(k)
),
fixed AS (
  SELECT doc_id, L + o AS link_idx, href, anchor
  FROM base, (VALUES
    (0, '/', 'home'), (1, '/sec', 'sec'),
    (2, '/r0', 'read'), (3, '/r1', 'more'), (4, '/r2', 'stories'),
    (5, '/r3', 'here'), (6, '/r4', 'now')) AS v(o, href, anchor)
),
asides AS (
  SELECT doc_id, L + 7 + j AS link_idx,
    '/buy?d=' || doc_id || '&m=' || (3 * j + 2) AS href,
    'buy now ' || (doc_id % 7) AS anchor
  FROM base, UNNEST(generate_series(0, n_aside - 1)) AS t(j)
  WHERE n_aside > 0
),
footer AS (
  SELECT doc_id, L + 7 + n_aside AS link_idx, '/about' AS href, 'about' AS anchor
  FROM base
)
SELECT doc_id, CAST(link_idx AS BIGINT) AS link_idx, href, anchor
FROM (SELECT * FROM nav UNION ALL SELECT * FROM fixed
      UNION ALL SELECT * FROM asides UNION ALL SELECT * FROM footer)
"""


@query("extract_html_links", sql=_LINKS_SQL)
def extract_html_links(sf_dir: str) -> ray.data.Dataset:
    """LINK extraction — the crawler frontier primitive: every anchor of
    the rendered page as (doc_id, link_idx, href, anchor_text), in DOM
    order, with attribute-value entity decoding (``&amp;`` inside query
    strings) and whitespace-normalized anchor text. The fixture page's
    link inventory is closed-form — L = 5 + d%4 nav links, two crumbs,
    five related links, one promo per three paragraphs, one footer link
    — so the oracle enumerates the exact (index, href, anchor) set per
    document and any tokenizer, attribute-parsing, entity, ordering, or
    rawtext bug (the <style> sheet contains a ``p > a`` selector that
    must never surface) changes the hash (``stages/html.py:extract_links``)."""
    from ocr_ray.stages.html import HtmlLinkExtractor, attach_html_payloads

    ds = read_docs(sf_dir, columns=["doc_id", "text"])
    with_payloads = ds.map_batches(
        attach_html_payloads, batch_format="pyarrow", batch_size=256
    )
    return stateless_stage(with_payloads, HtmlLinkExtractor, batch_size=256)
