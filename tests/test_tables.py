"""HTML table extraction: data-vs-layout classification traps and cell
grid fidelity (stages/tables.py)."""

from __future__ import annotations

from ocr_ray.stages.tables import (
    extract_tables,
    render_table_page,
    table_grid,
)


def test_layout_table_rejected_by_link_density():
    html = (
        "<table><tr>"
        '<td><a href="/a">one link</a></td><td><a href="/b">two link</a></td>'
        "</tr></table>"
    )
    assert extract_tables(html) == []


def test_headerless_table_rejected():
    html = "<table><tr><td>plain data cell</td><td>more data here</td></tr></table>"
    assert extract_tables(html) == []


def test_data_table_header_row_and_caption_excluded():
    html = (
        "<table><caption>not a cell</caption>"
        "<thead><tr><th>h1</th><th>h2</th></tr></thead>"
        "<tbody><tr><td>a b</td><td>c&amp;d</td></tr>"
        "<tr><td>e</td><td>f</td></tr></tbody></table>"
    )
    [grid] = extract_tables(html)
    assert grid == [["a b", "c&d"], ["e", "f"]]


def test_mixed_page_keeps_only_data_table():
    page = render_table_page(5, "one two three four five six seven eight")
    [grid] = extract_tables(page)
    ncells, ncol = table_grid(8, 5)
    flat = [c for row in grid for c in row]
    assert len(flat) == ncells
    assert all(len(row) <= ncol for row in grid)
    # remainder folds into the last cell
    assert " ".join(flat) == "one two three four five six seven eight"


def test_whitespace_between_tags_is_not_a_cell():
    html = (
        "<table>\n  <thead><tr><th>h</th></tr></thead>\n"
        "  <tbody>\n    <tr>\n      <td>x y</td>\n    </tr>\n  </tbody>\n</table>"
    )
    [grid] = extract_tables(html)
    assert grid == [["x y"]]


def test_entity_decode_in_cells_roundtrips_fixture():
    # doc_id/word-index combination that triggers both decimal and hex
    # entity encodings in the renderer
    text = " ".join(f"w{i}" for i in range(12))
    page = render_table_page(0, text)
    [grid] = extract_tables(page)
    assert " ".join(c for row in grid for c in row) == text


# ---------------------------------------------------------------------------
# two-column PDF reading order (stages/pdf.py twocol leg)
# ---------------------------------------------------------------------------


def test_detect_columns_gaps_and_single_column():
    from ocr_ray.stages.pdf import detect_columns

    assert detect_columns([72.0, 72.0, 320.0, 320.5]) == [72.0, 320.0]
    assert detect_columns([72.0, 80.0, 100.0]) == [72.0]  # small steps merge
    assert detect_columns([]) == []
    assert detect_columns([10.0, 200.0, 400.0]) == [10.0, 200.0, 400.0]


def test_twocol_naive_sort_would_scramble():
    """The fixture is only a fixture if naive (-y, x) ordering FAILS:
    interleaving columns must not reproduce the text (guards against the
    renderer degenerating into a single column)."""
    from ocr_ray.stages.pdf import (
        PdfDocument,
        _content_chunks,
        encode_twocol_pdf,
    )

    text = " ".join(f"w{i}" for i in range(120))  # 30 lines: 2 full cols + page 2
    doc = PdfDocument(encode_twocol_pdf(3, text))
    chunks = []
    for pi, page in enumerate(doc.pages()):
        for x, y, s in _content_chunks(doc.obj(page["Contents"])["__stream__"]):
            chunks.append((pi, -y, x, s))
    naive = " ".join(c[3] for c in sorted(chunks))
    assert naive != text


def test_twocol_roundtrip_various_lengths():
    from ocr_ray.stages.pdf import decode_twocol_pdf, encode_twocol_pdf

    for d, n in ((0, 1), (1, 4), (2, 39), (3, 40), (9, 81), (11, 200)):
        text = " ".join(f"t{d}w{i}" for i in range(n))
        out, n_pages, n_lines = decode_twocol_pdf(encode_twocol_pdf(d, text))
        assert out == text, (d, n)
        want_lines = (n + 3) // 4
        assert n_lines == want_lines
        assert n_pages == max(1, (want_lines + 19) // 20)


# ---------------------------------------------------------------------------
# BMP codec (stages/bmp.py)
# ---------------------------------------------------------------------------


def test_bmp_roundtrip_and_row_order():
    import struct

    import numpy as np

    from ocr_ray.stages.bmp import bmp_image, decode_bmp, encode_bmp

    for m in (0, 7, 9972):
        img = bmp_image(m)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)
    # top-down (negative height) BMPs decode to the flipped raster
    img = bmp_image(3)
    buf = bytearray(encode_bmp(img))
    struct.pack_into("<i", buf, 22, -img.shape[0])
    assert np.array_equal(decode_bmp(bytes(buf)), img[::-1])


def test_bmp_rejects_wrong_formats():
    import struct

    import pytest

    from ocr_ray.stages.bmp import bmp_image, encode_bmp, decode_bmp

    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"PNG whatever")
    buf = bytearray(encode_bmp(bmp_image(1)))
    struct.pack_into("<H", buf, 28, 8)  # bpp = 8
    with pytest.raises(ValueError, match="24-bit"):
        decode_bmp(bytes(buf))


# ---------------------------------------------------------------------------
# de-hyphenation PDF leg (stages/pdf.py hyphen leg)
# ---------------------------------------------------------------------------


def test_hyphen_lines_width_and_split_rules():
    from ocr_ray.stages.pdf import HYPH_LINE_CHARS, _hyphen_lines

    lines = _hyphen_lines("abcdefghij klm nop qrstuvwxyz".split(" "))
    assert all(len(ln) <= HYPH_LINE_CHARS for ln in lines)
    # a word longer than a whole line must split recursively
    lines2 = _hyphen_lines(["x" * 30])
    assert all(len(ln) <= HYPH_LINE_CHARS for ln in lines2)
    rejoined = "".join(ln[:-1] if ln.endswith("-") else ln for ln in lines2)
    assert rejoined == "x" * 30


def test_dehyphen_roundtrip_and_join_count():
    from ocr_ray.stages.pdf import decode_hyphen_pdf, encode_hyphen_pdf

    text = "supercalifragilistic word antidisestablishmentarianism tail"
    out, n_pages, n_joins = decode_hyphen_pdf(encode_hyphen_pdf(5, text))
    assert out == text
    assert n_joins >= 2  # both long words must have split at width 12
    # short-word doc: no joins
    out2, _, nj2 = decode_hyphen_pdf(encode_hyphen_pdf(0, "a bb cc dd"))
    assert out2 == "a bb cc dd" and nj2 == 0


# ---------------------------------------------------------------------------
# link extraction (stages/html.py:extract_links)
# ---------------------------------------------------------------------------


def test_extract_links_traps():
    from ocr_ray.stages.html import extract_links

    html = (
        '<style>p > a { color: red } /* <a href="/trap">x</a> */</style>'
        '<script>var a = \'<a href="/trap2">y</a>\';</script>'
        '<a href="/one?x=1&amp;y=2">first &amp; main</a>'
        "<p>no link text</p>"
        '<a href="/two"><a href="/three">nested closes open</a>'
    )
    links = extract_links(html)
    assert links[0] == ("/one?x=1&y=2", "first & main")
    hrefs = [h for h, _ in links]
    assert "/trap" not in hrefs and "/trap2" not in hrefs
    assert "/two" in hrefs and "/three" in hrefs


def test_row_header_rows_excluded_consistently():
    """A row mixing <th> and <td> is a header row REGARDLESS of cell
    order — both orders must behave identically (review finding: the
    old code kept a td closed before the th and dropped one after)."""
    from ocr_ray.stages.tables import extract_tables

    th_first = (
        "<table><tr><th>label</th><td>42</td></tr>"
        "<tr><td>a</td><td>b</td></tr></table>"
    )
    td_first = (
        "<table><tr><td>42</td><th>label</th></tr>"
        "<tr><td>a</td><td>b</td></tr></table>"
    )
    assert extract_tables(th_first) == [[["a", "b"]]]
    assert extract_tables(td_first) == [[["a", "b"]]]
