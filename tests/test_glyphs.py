"""Glyph codec + segmentation + recognizer unit tests (no Ray needed)."""

from __future__ import annotations

import numpy as np

from ocr_ray.stages.glyphs import (
    ALPHABET_HI,
    ALPHABET_LO,
    GLYPH_DIM,
    GlyphCodec,
    Recognizer,
    segment_payloads,
)


def test_roundtrip_full_alphabet():
    text = "".join(chr(c) for c in range(ALPHABET_LO, ALPHABET_HI + 1))
    codec, rec = GlyphCodec(), Recognizer()
    assert rec.decode_payloads([codec.encode(text)]) == [text]


def test_templates_distinct():
    from ocr_ray.stages.glyphs import _quantized_templates

    t = _quantized_templates()
    assert len({row.tobytes() for row in t}) == len(t)


def test_segmentation_shapes():
    codec = GlyphCodec()
    payloads = [codec.encode("ab"), None, b"", codec.encode("xyz")]
    cells, lengths = segment_payloads(payloads)
    assert cells.shape == (5, GLYPH_DIM)
    assert lengths.tolist() == [2, 0, 0, 3]


def test_recognizer_batch_vectorized():
    codec, rec = GlyphCodec(), Recognizer()
    texts = ["hello world", "", "spark graft 42", "a"]
    assert rec.decode_payloads([codec.encode(t) for t in texts]) == texts


def test_recognizer_nearest_not_exact():
    # perturb one byte by 1 — nearest-template must still recover the char
    codec, rec = GlyphCodec(), Recognizer()
    enc = bytearray(codec.encode("q"))
    enc[0] = (enc[0] + 1) % 256
    assert rec.decode_payloads([bytes(enc)]) == ["q"]


# --------------------------------------------------------------------------
# 2D connected-component segmentation (stages/ccseg.py)
# --------------------------------------------------------------------------


def test_ccseg_font_is_connected_distinct_and_full_width():
    """Every glyph is one 4-connected component (a glyph must label as
    exactly one box), spans its cell's full width (grid-exact gap rule),
    and all bbox-normalized masks are distinct (nearest-template is
    exact)."""
    from ocr_ray.stages.ccseg import CELL_W, cc_label, font

    glyphs, masks = font()
    assert len(set(masks.tolist())) == len(masks)
    for g in range(len(glyphs)):
        bm = glyphs[g]
        labels = cc_label(bm)
        comp = labels[labels >= 0]
        assert len(set(comp.tolist())) == 1, g  # one component
        xs = bm.any(axis=0)
        assert xs[0] and xs[CELL_W - 1], g  # touches both cell edges


def test_ccseg_label_propagation_on_crafted_shapes():
    """Min-label propagation finds exactly the 4-connected components:
    an L-shape, a diagonal pair (NOT connected under 4-conn), and a ring."""
    import numpy as np

    from ocr_ray.stages.ccseg import cc_label

    page = np.zeros((8, 8), dtype=bool)
    page[1, 1:4] = True  # L-shape arm
    page[2:4, 1] = True  # L-shape leg
    page[5, 5] = True    # diagonal pair: two components
    page[6, 6] = True
    labels = cc_label(page)
    ids = labels[labels >= 0]
    assert len(set(ids.tolist())) == 3
    assert labels[1, 3] == labels[3, 1]  # the L is one component
    assert labels[5, 5] != labels[6, 6]  # diagonals are separate


def test_ccseg_roundtrip_and_reading_order():
    from ocr_ray.stages.ccseg import recognize_page, render_page

    cases = [
        "hello world",
        "a",
        "",
        "the quick brown fox jumps over the lazy dog 0123456789 !@#$%",
        "w " * 150,  # many wrapped lines
    ]
    for t in cases:
        bits, h, w = render_page(t)
        want = " ".join(x for x in t.split(" ") if x)
        assert recognize_page(bits, h, w) == want, t


def test_ccseg_stage_batch(ray_session):
    """The attach + actor-pool stage path recovers every doc's text."""
    import pyarrow as pa

    from ocr_ray.stages.ccseg import CcSegmenter, attach_page_bitmaps

    batch = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["alpha beta", "gamma", "x y z"], pa.string()),
        }
    )
    out = CcSegmenter()(attach_page_bitmaps(batch))
    assert out["recovered_text"].to_pylist() == ["alpha beta", "gamma", "x y z"]


def test_ccseg_refuses_page_wide_words():
    import pytest

    from ocr_ray.stages.ccseg import render_page

    with pytest.raises(ValueError, match="exceeds the"):
        render_page("a" * 65)
    render_page("a" * 64)  # exactly page-wide fits
