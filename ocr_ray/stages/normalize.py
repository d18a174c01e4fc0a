"""Span normalization — whitespace trim + degenerate-span drop.

Vectorized per-batch normalizer (char-class normalization analogue of the
reference's mapping kernel,
``/root/reference/examples/smith-waterman/smithwaterman.c:25-60``):

- trims ASCII whitespace from text spans;
- drops spans that carry neither text nor a media_ref (after trimming),
  except glyph spans whose content lives in ``payload``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ocr_ray.schema import KIND_DOC_SENTINEL, KIND_GLYPHS


def _trimmed_keep(batch: pa.Table) -> tuple[pa.Table, pa.ChunkedArray]:
    """Shared core of both normalizers: trim text in place and return the
    keep-mask (non-degenerate, or glyph/sentinel special) — ONE definition
    so the fused and unfused paths cannot silently diverge."""
    text = pc.utf8_trim_whitespace(batch["text"])
    batch = batch.set_column(batch.column_names.index("text"), "text", text)
    empty = pc.and_(pc.equal(text, ""), pc.equal(batch["media_ref"], ""))
    special = pc.is_in(
        batch["kind"], value_set=pa.array([KIND_GLYPHS, KIND_DOC_SENTINEL])
    )
    return batch, pc.or_(pc.invert(empty), special)


def normalize_spans(batch: pa.Table) -> pa.Table:
    if batch.num_rows == 0:
        return batch
    batch, keep = _trimmed_keep(batch)
    return batch.filter(keep)


def normalize_and_strip(batch: pa.Table) -> pa.Table:
    """Fused normalize + boilerplate strip: ONE mask, ONE filter copy.

    Semantics identical to ``normalize_spans`` then ``strip_boilerplate``
    (both are pure row filters after the trim); fusing halves the
    filter-gather traffic of the fused extraction task — the hot path of
    the shard-aligned pipeline where DRAM bandwidth is the shared
    single-node resource."""
    from ocr_ray.schema import KIND_BOILERPLATE

    if batch.num_rows == 0:
        return batch
    batch, keep = _trimmed_keep(batch)
    keep = pc.and_(keep, pc.not_equal(batch["kind"], KIND_BOILERPLATE))
    return batch.filter(keep)
