"""Property tests for the web/layout legs: random word content and random
span shapes must round-trip bit-exactly through every layer. These cover
the input space beyond the synthetic corpus (word lengths, counts, doc
ids), guarding the closed-form layout rules and escape/entity paths."""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_ray.stages.html import extract_main_text, render_html
from ocr_ray.stages.pdf import decode_pdf, decode_span_pdf, encode_pdf, encode_span_pdf
from ocr_ray.stages.warc import build_warc, parse_http_response, parse_warc

# Words like the documents table's: non-empty, lowercase alphanumeric
# (the corpus contract: single-space separated, no empties).
word = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=12)
doc_text = st.lists(word, min_size=4, max_size=200).map(" ".join)
doc_id = st.integers(min_value=0, max_value=10**8 - 1)


@settings(max_examples=60, deadline=None)
@given(doc_id, doc_text)
def test_html_round_trip_property(d, text):
    main, _, _, _ = extract_main_text(render_html(d, text))
    assert main == text


@settings(max_examples=60, deadline=None)
@given(doc_id, doc_text)
def test_pdf_round_trip_property(d, text):
    out, n_pages, _ = decode_pdf(encode_pdf(d, text))
    assert out == text
    n_lines = -(-len(text.split(" ")) // 8)
    assert n_pages == -(-n_lines // 10)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(doc_id, doc_text), min_size=1, max_size=5, unique_by=lambda t: t[0]))
def test_warc_round_trip_property(docs):
    from ocr_ray.stages.html import extract_main_text as emt

    ids = [d for d, _ in docs]
    texts = {d: t for d, t in docs}
    buf = build_warc(ids, [texts[d] for d in ids])
    seen = {}
    for rec_type, _, body in parse_warc(buf):
        if rec_type != "response":
            continue
        status, headers, entity = parse_http_response(body)
        assert status == 200
        d = int(headers["X-Doc"])
        seen[d] = emt(entity.decode("utf-8"))[0]
    assert seen == texts


@settings(max_examples=40, deadline=None)
@given(doc_id, st.integers(min_value=1, max_value=300), st.randoms(use_true_random=False))
def test_span_pdf_round_trip_property(d, nwords, rng):
    from ocr_ray.corpus import doc_id_str, synthesize_doc
    from ocr_ray.stages.html import extract_spans_from_html, render_span_html

    text = " ".join(f"w{(d + i) % 97}x{i}" for i in range(nwords))
    spans = synthesize_doc(d, text, glyphs=False)
    exp = [
        (s["kind"], s["text"], s["media_ref"])
        for s in spans
        if s["kind"] != "boilerplate"
    ]
    shuffled = spans[:]
    random.Random(rng.random()).shuffle(shuffled)
    assert decode_span_pdf(encode_span_pdf(doc_id_str(d), shuffled)) == exp
    assert extract_spans_from_html(render_span_html(doc_id_str(d), shuffled)) == exp


# Full-Unicode content (round-3 review regression): every leg must carry
# text outside latin-1 — em/quote punctuation, accents, Greek/Cyrillic,
# CJK — bit-exactly. (No Unicode-whitespace chars: the corpus contract is
# single-space-separated words.)
uword = st.text(
    alphabet="abz19—…“”’€çéñüßøÆλΩКи漢字中à",
    min_size=1,
    max_size=8,
).filter(lambda w: not w.isspace())
unicode_text = st.lists(uword, min_size=4, max_size=80).map(" ".join)


@settings(max_examples=40, deadline=None)
@given(doc_id, unicode_text)
def test_html_round_trip_unicode(d, text):
    main, _, _, _ = extract_main_text(render_html(d, text))
    assert main == text


@settings(max_examples=40, deadline=None)
@given(doc_id, unicode_text)
def test_pdf_round_trip_unicode(d, text):
    assert decode_pdf(encode_pdf(d, text))[0] == text


@settings(max_examples=15, deadline=None)
@given(st.lists(st.tuples(doc_id, unicode_text), min_size=1, max_size=4, unique_by=lambda t: t[0]))
def test_warc_round_trip_unicode(docs):
    ids = [d for d, _ in docs]
    texts = {d: t for d, t in docs}
    buf = build_warc(ids, [texts[d] for d in ids])
    seen = {}
    for rec_type, _, body in parse_warc(buf):
        if rec_type != "response":
            continue
        status, headers, entity = parse_http_response(body)
        seen[int(headers["X-Doc"])] = extract_main_text(entity.decode("utf-8"))[0]
    assert seen == texts
