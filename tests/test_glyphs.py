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
