"""Unit tests for the web/layout extraction legs (stages/html.py,
stages/pdf.py): tokenizer and parser edge cases, each classifier signal
individually load-bearing, malformed-input errors, and the Ray stage
round trip. The end-to-end oracle equality runs in
test_queries_oracle.py like every other registered query."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from ocr_ray.stages.html import (
    decode_entities,
    extract_blocks,
    extract_main_text,
    paragraph_sizes,
    render_html,
    tokenize_html,
)
from ocr_ray.stages.pdf import (
    PdfDocument,
    _parse_literal_string,
    decode_pdf,
    encode_pdf,
)


# ---------------------------------------------------------------------------
# HTML tokenizer
# ---------------------------------------------------------------------------


def _texts(html):
    return [t[1] for t in tokenize_html(html) if t[0] == "text"]


def test_quoted_attr_gt_does_not_end_tag():
    toks = list(tokenize_html('<a href="/x" title="go > here">link</a>'))
    assert toks[0][:2] == ("start", "a")
    assert ("text", "link") in toks


def test_comments_and_doctype_are_skipped():
    html = "<!DOCTYPE html><!-- trap words --><p>real</p>"
    assert _texts(html) == ["real"]


def test_script_and_style_content_never_leaks():
    html = (
        "<body><script>var x = \"<p>trap</p>\"; if (a < 2 && b > 3) {}</script>"
        "<style>p > a {}</style><p>keep this text here</p></body>"
    )
    main, _, nc, _ = extract_main_text(html)
    assert main == "keep this text here"
    assert nc == 1


def test_rawtext_lookalike_close_tag_stays_inside_script():
    # "</scripty" is NOT an end tag per spec; script data continues to the
    # real "</script>".
    html = (
        '<body><script>var s = "</scripty trap";</script>'
        "<style>a</styled{}</style><p>real content words here</p></body>"
    )
    main, _, nc, _ = extract_main_text(html)
    assert main == "real content words here"
    assert nc == 1


def test_entity_decoding_decimal_hex_named():
    assert decode_entities("&#97;b&#x63;") == "abc"
    assert decode_entities("x &amp; y &gt; z") == "x & y > z"
    assert decode_entities("&copy; 2026") == "© 2026"
    # Unknown/unterminated references degrade to a literal ampersand.
    assert decode_entities("&bogus; &#nope; a&b") == "&bogus; &#nope; a&b"


# ---------------------------------------------------------------------------
# Classifier: each signal individually load-bearing
# ---------------------------------------------------------------------------


def test_link_density_alone_strips_related_block():
    html = (
        "<body><p>four words of content</p>"
        '<p><a href="/a">all</a> <a href="/b">words</a> <a href="/c">are</a> '
        '<a href="/d">links</a> <a href="/e">here</a></p></body>'
    )
    main, nb, nc, bw = extract_main_text(html)
    assert main == "four words of content"
    assert (nb, nc, bw) == (2, 1, 5)


def test_min_words_alone_strips_headings():
    html = "<body><h1>short heading</h1><p>this paragraph has enough words</p></body>"
    main, _, nc, bw = extract_main_text(html)
    assert main == "this paragraph has enough words"
    assert (nc, bw) == (1, 2)


def test_ancestor_alone_strips_footer_paragraph():
    # Long enough and link-free: only the DOM-context signal can strip it.
    html = (
        "<body><p>real content paragraph with words</p>"
        "<footer><p>copyright words long enough to pass both other signals</p>"
        "</footer></body>"
    )
    main, _, nc, _ = extract_main_text(html)
    assert main == "real content paragraph with words"
    assert nc == 1


def test_inline_tags_do_not_split_blocks():
    html = "<body><p>one <b>two</b> three <span>four</span> five</p></body>"
    blocks = extract_blocks(html)
    assert len(blocks) == 1
    assert blocks[0].words == ["one", "two", "three", "four", "five"]


def test_nested_anchor_words_counted_once():
    html = '<body><p><a href="/x"><b>deep</b> link</a> plain word here</p></body>'
    (b,) = extract_blocks(html)
    assert b.link_words == 2 and len(b.words) == 5


def test_paragraph_sizes_fold_short_remainder():
    assert paragraph_sizes(12) == [12]
    assert paragraph_sizes(15) == [15]  # rem 3 < 4 folds
    assert paragraph_sizes(16) == [12, 4]
    assert paragraph_sizes(7) == [7]
    assert sum(paragraph_sizes(147)) == 147


def test_render_html_rejects_tiny_docs():
    with pytest.raises(ValueError):
        render_html(1, "too few words"[:3])


# ---------------------------------------------------------------------------
# PDF parser
# ---------------------------------------------------------------------------


def test_literal_string_escapes():
    s, pos = _parse_literal_string(rb"(a\(b\)c\\d \165 e)", 0)
    assert s == "a(b)c\\d u e"
    s, _ = _parse_literal_string(b"(nested (parens) ok)", 0)
    assert s == "nested (parens) ok"


def test_pdf_round_trip_exercises_all_string_forms():
    # 60 words -> 8 lines over d in 0..11 covers hex (%3), TJ (%4) and
    # literal-with-octal (%7) emission branches.
    text = " ".join(f"word{i}" for i in range(60))
    for d in range(12):
        out, n_pages, n_chunks = decode_pdf(encode_pdf(d, text))
        assert out == text
        assert n_pages == 1
        assert n_chunks == 15  # 7 full lines * 2 + 1 (4-word remainder)


def test_pdf_multi_page_reading_order():
    text = " ".join(f"w{i}" for i in range(8 * 25))  # 25 lines -> 3 pages
    out, n_pages, _ = decode_pdf(encode_pdf(3, text))
    assert out == text and n_pages == 3


def test_pdf_stream_order_is_not_reading_order():
    """The guarantee that concatenating Tj strings in stream order fails:
    the rotated emission must actually permute lines for d % k != 0."""
    import zlib

    text = " ".join(f"w{i}" for i in range(24))  # 3 lines, one page
    buf = encode_pdf(1, text)
    doc = PdfDocument(buf)
    page = doc.pages()[0]
    stream = doc.obj(page["Contents"])["__stream__"]
    ops = zlib.decompress if False else None  # stream already inflated
    assert b"w0" in stream
    # First Tm in the stream is NOT the top line (y=720): rotation by d=1.
    first_tm = stream.split(b" Tm")[0]
    assert not first_tm.endswith(b"720"), stream[:120]


def test_pdf_xref_offsets_are_load_bearing():
    buf = bytearray(encode_pdf(2, " ".join(f"w{i}" for i in range(20))))
    # Corrupt one xref offset digit -> object lookup must fail loudly.
    pos = buf.rindex(b"\nxref\n")  # the table itself, not "startxref"
    line = buf.index(b" 00000 n", pos)
    buf[line - 1 : line] = b"9" if buf[line - 1 : line] != b"9" else b"8"
    with pytest.raises(ValueError):
        decode_pdf(bytes(buf))


def test_pdf_rejects_garbage():
    with pytest.raises(ValueError):
        decode_pdf(b"not a pdf at all")
    good = encode_pdf(1, "a b c d e")
    with pytest.raises(ValueError):
        decode_pdf(good.replace(b"startxref", b"startxrEf"))


# ---------------------------------------------------------------------------
# Interleaved-span leg: DOM order + media refs + classified boilerplate
# ---------------------------------------------------------------------------


def test_tokenizer_captures_attributes():
    toks = list(tokenize_html('<img src="/media/m-7.png" alt="x > y" data-k=v>'))
    assert toks[0][0] == "start" and toks[0][1] == "img" and toks[0][2] is True
    assert toks[0][3] == {"src": "/media/m-7.png", "alt": "x > y", "data-k": "v"}


def test_span_page_round_trip_with_shuffled_storage_order():
    import random

    from ocr_ray.corpus import doc_id_str, synthesize_doc
    from ocr_ray.stages.html import extract_spans_from_html, render_span_html

    for d, nwords in [(0, 13), (7, 8), (33, 7), (100, 3), (12, 95)]:
        text = " ".join(f"w{d}x{i}" for i in range(nwords))
        spans = synthesize_doc(d, text, glyphs=False)
        exp = [
            (s["kind"], s["text"], s["media_ref"])
            for s in spans
            if s["kind"] != "boilerplate"
        ]
        shuffled = spans[:]
        random.Random(d).shuffle(shuffled)
        got = extract_spans_from_html(render_span_html(doc_id_str(d), shuffled))
        assert got == exp


def test_span_page_header_logo_img_is_stripped():
    from ocr_ray.stages.html import extract_spans_from_html, render_span_html

    page = render_span_html(
        "doc-00000005",
        [{"kind": "text", "text": "only span here", "media_ref": "", "offset": 0}],
    )
    assert "/static/logo.png" in page  # the trap is present in markup
    got = extract_spans_from_html(page)
    assert got == [("text", "only span here", "")]


def test_article_img_is_content_chrome_img_is_not():
    from ocr_ray.stages.html import extract_spans_from_html

    html = (
        "<body><header><img src='/static/logo.png'></header>"
        "<article><p>real words in here</p><img src='/media/m-42.png'></article>"
        "</body>"
    )
    assert extract_spans_from_html(html) == [
        ("text", "real words in here", ""),
        ("media", "", "m-42"),
    ]


def test_pdf_span_round_trip_and_chrome_strip():
    import random

    from ocr_ray.corpus import doc_id_str, synthesize_doc
    from ocr_ray.stages.pdf import decode_span_pdf, encode_span_pdf

    for d, nwords in [(0, 13), (7, 8), (14, 8), (12, 95), (5, 200)]:
        text = " ".join(f"w{d}x{i}" for i in range(nwords))
        spans = synthesize_doc(d, text, glyphs=False)
        exp = [
            (s["kind"], s["text"], s["media_ref"])
            for s in spans
            if s["kind"] != "boilerplate"
        ]
        shuffled = spans[:]
        random.Random(d).shuffle(shuffled)
        got = decode_span_pdf(encode_span_pdf(doc_id_str(d), shuffled))
        assert got == exp  # d=14/8words: all-boilerplate doc -> []


def test_pdf_span_media_ref_resolves_through_resource_dict():
    from ocr_ray.stages.pdf import PdfDocument, encode_span_pdf

    spans = [
        {"kind": "text", "text": "a b c", "media_ref": "", "offset": 0},
        {"kind": "media", "text": "", "media_ref": "m-77", "offset": 1},
    ]
    buf = encode_span_pdf("doc-00000001", spans)
    doc = PdfDocument(buf)
    page = doc.pages()[0]
    res = doc.obj(page["Resources"])
    xo = res["XObject"]
    # Resource names are opaque (X<k>); the ref lives in the object's /Name.
    assert list(xo.keys()) == ["X1"]
    assert str(doc.obj(xo["X1"])["Name"]) == "m-77"
    # The content stream itself never contains the media_ref.
    stream = doc.obj(page["Contents"])["__stream__"]
    assert b"m-77" not in stream


# ---------------------------------------------------------------------------
# WARC / HTTP
# ---------------------------------------------------------------------------


def test_warc_record_walk_ignores_header_lookalike_bodies():
    from ocr_ray.stages.warc import build_warc, parse_warc

    buf = build_warc([0, 1], ["a b c d e f", "g h i j k l"])
    recs = parse_warc(buf)
    # warcinfo body contains "WARC/1.0" and "WARC-Type: response" traps;
    # Content-Length framing must still yield exactly 5 records.
    assert [r[0] for r in recs] == ["warcinfo", "request", "response", "request", "response"]


def test_warc_span_archive_round_trip():
    import random

    from ocr_ray.corpus import doc_id_str, synthesize_doc
    from ocr_ray.stages.html import extract_spans_from_html, render_span_html
    from ocr_ray.stages.warc import (
        build_warc_from_pages,
        parse_http_response,
        parse_warc,
    )

    keys, pages, exp = [], [], {}
    for d, nwords in [(0, 13), (3, 30), (7, 8), (14, 8)]:
        text = " ".join(f"w{d}x{i}" for i in range(nwords))
        spans = synthesize_doc(d, text, glyphs=False)
        exp[doc_id_str(d)] = [
            (s["kind"], s["text"], s["media_ref"])
            for s in spans
            if s["kind"] != "boilerplate"
        ]
        shuffled = spans[:]
        random.Random(d).shuffle(shuffled)
        keys.append(doc_id_str(d))
        pages.append(render_span_html(doc_id_str(d), shuffled))
    got = {}
    for rec_type, _, body in parse_warc(build_warc_from_pages(keys, pages)):
        if rec_type != "response":
            continue
        _, headers, entity = parse_http_response(body)
        got[headers["X-Doc"]] = extract_spans_from_html(entity.decode())
    assert got == exp


def test_warc_framing_violations_raise():
    from ocr_ray.stages.warc import build_warc, parse_warc

    buf = bytearray(build_warc([0], ["a b c d e"]))
    with pytest.raises(ValueError):
        parse_warc(bytes(buf[:-2]))  # truncated trailer
    with pytest.raises(ValueError):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")  # not WARC


def test_http_chunked_and_gzip_decode():
    import gzip as _gzip

    from ocr_ray.stages.warc import _chunk_body, parse_http_response

    body = b"x" * 2500  # spans 3 chunks at CHUNK_SIZE=997
    gz = _gzip.compress(body, mtime=0)
    msg = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n" + _chunk_body(gz)
    )
    status, headers, out = parse_http_response(msg)
    assert (status, out) == (200, body)
    # Content-Length path trims any trailing garbage.
    msg2 = b"HTTP/1.1 404 NF\r\nContent-Length: 3\r\n\r\nabcGARBAGE"
    assert parse_http_response(msg2) == (404, {"Content-Length": "3"}, b"abc")


def test_http_malformed_chunk_raises():
    from ocr_ray.stages.warc import parse_http_response

    msg = b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n5\r\nabcdeXX"
    with pytest.raises(ValueError):
        parse_http_response(msg)


# ---------------------------------------------------------------------------
# Ray stage round trip (tiny, in the shared session)
# ---------------------------------------------------------------------------


def test_stages_round_trip_in_ray(ray_session):
    import ray

    from ocr_ray.stages.html import HtmlMainExtractor, attach_html_payloads
    from ocr_ray.stages.pdf import PdfTextExtractor, attach_pdf_payloads

    from ocr_ray.stages.warc import WarcMainExtractor, attach_warc_payloads

    texts = [" ".join(f"t{d}w{i}" for i in range(10 + 7 * d)) for d in range(6)]
    t = pa.table({"doc_id": pa.array(range(6), type=pa.int64()), "text": texts})
    for attach, extractor in (
        (attach_html_payloads, HtmlMainExtractor),
        (attach_pdf_payloads, PdfTextExtractor),
        (attach_warc_payloads, WarcMainExtractor),
    ):
        ds = ray.data.from_arrow(t).map_batches(attach, batch_format="pyarrow")
        out = (
            ds.map_batches(extractor, batch_format="pyarrow", concurrency=2)
            .to_pandas()
            .sort_values("doc_id")
        )
        assert list(out["extracted_text"]) == texts


# ---------------------------------------------------------------------------
# Round-3 review regressions: parser generality on foreign inputs
# ---------------------------------------------------------------------------


def test_unquoted_attr_value_with_apostrophe_does_not_swallow_document():
    # A quote INSIDE an unquoted attribute value (title=don't) is literal
    # data, not a quoted-value opener; before the fix the tokenizer
    # swallowed the rest of the document as one tag (100% content loss).
    html = (
        "<body><p title=don't>five real content words here</p>"
        "<p alt=it's>more good content words here</p></body>"
    )
    main, _, nc, _ = extract_main_text(html)
    assert "five real content words here" in main
    assert "more good content words here" in main
    assert nc == 2


def test_quote_arms_only_in_value_position():
    # Quoted values (after =, with optional whitespace) still protect ">".
    toks = list(tokenize_html("<a href = '/x>y' title=\"a > b\">link</a>"))
    assert toks[0][:2] == ("start", "a")
    assert toks[0][3]["href"] == "/x>y"
    assert ("text", "link") in toks


def test_pdf_roundtrip_full_unicode():
    # em dash, curly quotes, accents, CJK — across all three string forms
    # (hex / TJ / literal rotate with doc_id): the PDF layer carries UTF-8
    # at the byte level and must round-trip any Python str.
    text = "café men—u “quoted” 漢字 here four five six seven eight nine ten"
    for d in range(6):  # hit every (d+g)%3 / %4 rotation
        assert decode_pdf(encode_pdf(d, text))[0] == text


def test_pdf_octal_escape_edge_cases():
    # \8 and \9 are NOT octal: the backslash is dropped (PDF 32000
    # §7.3.4.2); a short octal escape stops at the first non-octal digit.
    assert _parse_literal_string(b"(a\\8b)", 0)[0] == "a8b"
    assert _parse_literal_string(b"(a\\089b)", 0)[0] == "a\x0089b"
    assert _parse_literal_string(b"(\\53)", 0)[0] == "+"  # short octal, 0o53
    assert _parse_literal_string(b"(\\101bc)", 0)[0] == "Abc"


def test_pdf_truncated_startxref_raises_value_error():
    buf = encode_pdf(3, "some words here for a page")
    cut = buf[: buf.rfind(b"startxref") + len(b"startxref")]
    with pytest.raises(ValueError, match="startxref"):
        PdfDocument(cut)


def test_build_warc_is_the_page_builder_specialization():
    # One builder, one rotation law: the int-id WARC is byte-identical to
    # the page-keyed builder over rendered pages with key = str(d).
    from ocr_ray.stages.warc import build_warc, build_warc_from_pages

    ids = [0, 1, 2, 3, 6, 15]
    texts = [" ".join(f"d{d}w{i}" for i in range(9)) for d in ids]
    assert build_warc(ids, texts) == build_warc_from_pages(
        [str(d) for d in ids], [render_html(d, t) for d, t in zip(ids, texts)]
    )


def test_mixed_format_detection_and_round_trip():
    """The mixed-format leg: payloads carry no format column; detection
    is content-based, and every route reproduces the same span sequence
    as the direct single-format extractors."""
    import random

    from ocr_ray.corpus import doc_id_str, synthesize_doc
    from ocr_ray.stages.html import extract_spans_from_html, render_span_html
    from ocr_ray.stages.mixed import (
        MixedSpanExtractor,
        attach_mixed_payloads,
        detect_payload_format,
        mixed_format_for,
    )

    rng = random.Random(3)
    ids, span_lists, expected = [], [], []
    for d in range(9):  # covers all three formats three times
        i = doc_id_str(d)
        text = " ".join(f"w{d}x{k}" for k in range(11 + 9 * d))
        spans = synthesize_doc(d, text, glyphs=False)
        shuffled = spans[:]
        rng.shuffle(shuffled)
        ids.append(i)
        span_lists.append(shuffled)
        for off, (kind, stext, ref) in enumerate(
            extract_spans_from_html(render_span_html(i, shuffled))
        ):
            expected.append((i, kind, stext, ref, off))

    batch = pa.table({"doc_id": ids, "spans": span_lists})
    with_payloads = attach_mixed_payloads(batch)
    fmts = {
        mixed_format_for(i): detect_payload_format(p)
        for i, p in zip(ids, with_payloads["payload"].to_pylist())
    }
    assert fmts == {"html": "html", "pdf": "pdf", "warc": "warc"}

    out = MixedSpanExtractor()(with_payloads)
    got = list(
        zip(
            out["doc_id"].to_pylist(),
            out["kind"].to_pylist(),
            out["text"].to_pylist(),
            out["media_ref"].to_pylist(),
            out["offset"].to_pylist(),
        )
    )
    assert got == expected
