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
