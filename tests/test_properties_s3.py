"""Property tests for the session-3 primitives: de-hyphenation and BMP
round-trips over generated inputs (fixed-fixture tests live beside the
implementations; these cover the shape space)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

words_st = st.lists(
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=40),
    min_size=1,
    max_size=60,
)


@settings(max_examples=60, deadline=None)
@given(words=words_st, d=st.integers(min_value=0, max_value=97))
def test_hyphen_roundtrip_any_words(words, d):
    from ocr_ray.stages.pdf import (
        HYPH_LINE_CHARS,
        _hyphen_lines,
        decode_hyphen_pdf,
        encode_hyphen_pdf,
    )

    text = " ".join(words)
    for ln in _hyphen_lines(words):
        assert 0 < len(ln) <= HYPH_LINE_CHARS
    out, _, _ = decode_hyphen_pdf(encode_hyphen_pdf(d, text))
    assert out == text


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=23),
    h=st.integers(min_value=1, max_value=9),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_bmp_roundtrip_any_shape(w, h, seed):
    """Odd widths exercise every padding residue (stride = 4-byte
    aligned); decode must invert encode for all of them."""
    from ocr_ray.stages.bmp import decode_bmp, encode_bmp

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


@settings(max_examples=40, deadline=None)
@given(
    words=st.lists(
        st.text(alphabet="abcdef", min_size=1, max_size=12),
        min_size=1,
        max_size=30,
    )
)
def test_wordpiece_counts_match_reference_any_words(words):
    from ocr_ray.functions.wordpiece import (
        UNK,
        WordpieceEncoder,
        wordpiece_encode_reference,
        wordpiece_vocab,
    )

    vocab = wordpiece_vocab([("a", "b"), ("ab", "c"), ("d", "e")], extra_chars="abcdef")
    enc = WordpieceEncoder(vocab, verify_mod=1)
    import pyarrow as pa

    t = pa.table(
        {
            "doc_id": pa.array(range(len(words)), pa.int64()),
            "text": pa.array(words),
        }
    )
    out = enc(t)
    for i, word in enumerate(words):
        ref = wordpiece_encode_reference(word, vocab)
        assert out["n_pieces"][i].as_py() == len(ref)
        assert out["n_unk"][i].as_py() == int(UNK in ref)
