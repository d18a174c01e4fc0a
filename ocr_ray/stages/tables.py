"""HTML TABLE extraction: recover structured (row, col, cell) data from
real markup, separating DATA tables from LAYOUT tables.

The classic table-extraction problem (Wang & Hu, WWW'02 lineage): pages
use ``<table>`` both for data and for layout/navigation chrome, so a
structured-data pipeline must classify each table before emitting cells.
This stage implements the two independently load-bearing signals on top
of the shared HTML tokenizer (``stages/html.py``):

- **link density** — a table whose text is mostly anchor words is
  navigation, not data (the fixture's nav-grid trap is 100% linked);
- **header presence** — a data table declares ``<th>`` header cells; the
  extractor requires them and excludes header rows from the emitted grid.

Cell text goes through the same entity decoding as the main-content path
(the fixture entity-encodes a deterministic subset of words), whitespace
between structural tags is ignored, and ``<caption>`` text is excluded
from the grid. Output is one row per BODY cell: (doc_id, row_idx,
col_idx, cell_text), row-major in document order — byte-exact against
the renderer's closed-form word partition, which the SQL oracle
reproduces with list slicing over ``string_split(text)``.

Fixture grid rule (the closed form the oracle mirrors): 3 words per
cell, remainder folded into the LAST cell, ``ncells = max(n // 3, 1)``,
``ncol = 2 + doc_id % 3``, cells laid out row-major with the last row
ragged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ocr_ray.stages.html import _encode_word, decode_entities, tokenize_html

CELL_WORDS = 3
MAX_LINK_DENSITY = 0.5


# ---------------------------------------------------------------------------
# Fixture renderer
# ---------------------------------------------------------------------------


def table_grid(n_words: int, doc_id: int) -> tuple[int, int]:
    """(ncells, ncol) of the fixture's data table."""
    return max(n_words // CELL_WORDS, 1), 2 + int(doc_id) % 3


def render_table_page(doc_id: int, text: str) -> str:
    """Wrap a document's words into a full HTML page whose payload is a
    DATA table, surrounded by traps: a 100%-linked nav LAYOUT table (must
    be rejected by link density), a caption and ``<colgroup>`` (must not
    become cells), comments inside the table, entity-encoded words, and
    inter-tag whitespace."""
    d = int(doc_id)
    words = text.split(" ")
    ncells, ncol = table_grid(len(words), d)

    out = [
        "<!DOCTYPE html>",
        f'<html><head><title>tbl {d}</title></head><body>',
        # layout-table trap: tabular markup, pure navigation content
        '<table class="nav"><tr>',
        "".join(
            f'<td><a href="/cat/{k}?d={d}&amp;x=1">nav{k} link{k}</a></td>'
            for k in range(4)
        ),
        "</tr></table>",
        f"<table class='data'>\n  <caption>dataset {d % 50}</caption>",
        "  <colgroup>" + "<col/>" * ncol + "</colgroup>",
        "  <thead>\n    <tr>"
        + "".join(f"<th>c{j}</th>" for j in range(ncol))
        + "</tr>\n  </thead>",
        "  <tbody>",
    ]
    i = 0
    for k in range(ncells):
        if k % ncol == 0:
            out.append("    <tr>")
        hi = len(words) if k == ncells - 1 else i + CELL_WORDS
        cell = " ".join(_encode_word(words[j], d, j) for j in range(i, hi))
        out.append(f"      <td>{cell}</td>")
        i = hi
        if k % ncol == ncol - 1 or k == ncells - 1:
            out.append("    </tr>")
            if k == ncells - 1:
                out.append("    <!-- grid ends -->")
    out.append("  </tbody>\n</table>")
    out.append(f"<footer><p>&copy; site {d % 9}</p></footer>")
    out.append("</body></html>")
    return "\n".join(out)


# ---------------------------------------------------------------------------
# Extractor
# ---------------------------------------------------------------------------


class _TableCtx:
    __slots__ = (
        "rows",
        "cur_row",
        "cell",
        "in_cell",
        "in_caption",
        "th_cells",
        "words",
        "link_words",
        "link_depth",
        "header_row",
    )

    def __init__(self) -> None:
        self.rows: list[list[str]] = []
        self.cur_row: list[str] = []
        self.cell: list[str] | None = None
        self.in_cell = False
        self.in_caption = False
        self.th_cells = 0
        self.words = 0
        self.link_words = 0
        self.link_depth = 0
        self.header_row = False  # current row contains <th>

    def close_row(self) -> None:
        """Header-vs-data is decided at ROW close, so a row mixing <th>
        and <td> is treated the same regardless of cell order (a row
        containing any header cell is a header row and is excluded
        whole — the consistent reading of row-header markup)."""
        if self.cur_row and not self.header_row:
            self.rows.append(self.cur_row)
        self.cur_row = []
        self.header_row = False


def extract_tables(html: str) -> list[list[list[str]]]:
    """All DATA tables of a page as [table][row][cell] text grids
    (header rows excluded). Layout tables (link density >=
    ``MAX_LINK_DENSITY``) and headerless tables are rejected."""
    stack: list[_TableCtx] = []
    accepted: list[list[list[str]]] = []

    for tok in tokenize_html(html):
        kind = tok[0]
        if kind == "start":
            name, self_closing = tok[1], tok[2]
            if self_closing:
                continue
            if name == "table":
                stack.append(_TableCtx())
                continue
            if not stack:
                continue
            ctx = stack[-1]
            if name == "tr":
                ctx.close_row()
            elif name in ("td", "th"):
                ctx.in_cell = True
                ctx.cell = []
                if name == "th":
                    ctx.th_cells += 1
                    ctx.header_row = True
            elif name == "caption":
                ctx.in_caption = True
            elif name == "a":
                ctx.link_depth += 1
        elif kind == "end":
            name = tok[1]
            if not stack:
                continue
            ctx = stack[-1]
            if name == "table":
                done = stack.pop()
                done.close_row()
                grid = done.rows
                linked = (
                    done.words > 0
                    and done.link_words / done.words >= MAX_LINK_DENSITY
                )
                if grid and done.th_cells > 0 and not linked:
                    accepted.append(grid)
            elif name in ("td", "th"):
                if ctx.in_cell and ctx.cell is not None:
                    ctx.cur_row.append(" ".join(ctx.cell))
                ctx.in_cell = False
                ctx.cell = None
            elif name == "tr":
                ctx.close_row()
            elif name == "caption":
                ctx.in_caption = False
            elif name == "a" and ctx.link_depth:
                ctx.link_depth -= 1
        else:  # text
            if not stack:
                continue
            ctx = stack[-1]
            if ctx.in_caption or not ctx.in_cell or ctx.cell is None:
                continue
            ws = decode_entities(tok[1]).split()
            if not ws:
                continue
            ctx.cell.extend(ws)
            ctx.words += len(ws)
            if ctx.link_depth:
                ctx.link_words += len(ws)
    return accepted


def attach_table_payloads(batch: pa.Table) -> pa.Table:
    """Fixture stage: (doc_id, text) -> (doc_id, payload); the text
    column is dropped so cells can only be recovered from markup."""
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    pages = [render_table_page(d, t) for d, t in zip(ids, texts)]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "payload": pa.array(pages, type=pa.large_string()),
        }
    )


class HtmlTableExtractor:
    """Decode/extract stage (task-pooled with per-worker instance reuse via ``stateless_stage`` — an actor pool would pay its spin-up per query): payload -> one row per data-table body cell
    (doc_id, row_idx, col_idx, cell_text), row-major."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids: list[int] = []
        rows: list[int] = []
        cols: list[int] = []
        cells: list[str] = []
        for d, page in zip(
            batch["doc_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            for grid in extract_tables(page):
                for ri, row in enumerate(grid):
                    for ci, cell in enumerate(row):
                        ids.append(d)
                        rows.append(ri)
                        cols.append(ci)
                        cells.append(cell)
        return pa.table(
            {
                "doc_id": pa.array(np.asarray(ids, dtype=np.int64)),
                "row_idx": pa.array(np.asarray(rows, dtype=np.int64)),
                "col_idx": pa.array(np.asarray(cols, dtype=np.int64)),
                "cell_text": pa.array(cells, type=pa.string()),
            }
        )
