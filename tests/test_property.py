"""Property-based tests (hypothesis) for the pure vectorized kernels —
each against an obviously-correct pure-Python reference. No Ray session
needed; these guard the buffer-level numpy rewrites against edge cases
random examples find better than hand-picked fixtures (empty docs,
single-char tokens, repeated shingles, all-equal keys).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

WORDS = st.text(alphabet="abcde", min_size=1, max_size=3)
TEXTS = st.lists(WORDS, min_size=0, max_size=12).map(lambda ws: " ".join(ws))


@settings(max_examples=60, deadline=None)
@given(st.lists(TEXTS, min_size=1, max_size=6))
def test_shingle_hashes_counts_match_reference(texts):
    from ocr_ray.functions.dedup import shingle_hashes

    sh, n_sh = shingle_hashes(pa.array(texts, type=pa.string()))
    assert len(sh) == int(n_sh.sum())
    for t, n in zip(texts, n_sh):
        assert n == max(len(t.split(" ")) - 2, 0)


@settings(max_examples=60, deadline=None)
@given(st.lists(TEXTS, min_size=1, max_size=5))
def test_doc_shingle_lists_equal_python_sets(texts):
    from ocr_ray.functions.dedup import doc_shingle_lists, shingle_hashes

    batch = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": pa.array(texts)}
    )
    out = doc_shingle_lists(batch)
    sh, n_sh = shingle_hashes(batch["text"])
    start = 0
    for i, n in enumerate(n_sh):
        expect = sorted(set(sh[start : start + n].tolist()))
        got = out["shingles"][i].as_py()
        assert got == expect
        start += n


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.lists(st.integers(0, 30), min_size=0, max_size=8), min_size=1, max_size=6)
)
def test_pairwise_jaccard_matches_set_formula(raw):
    from ocr_ray.functions.dedup import SHINGLES_TYPE, pairwise_jaccard_lists

    n = len(raw) // 2 * 2
    if n == 0:
        return
    sets = [sorted(set(r)) for r in raw[:n]]
    a = pa.array(sets[: n // 2], type=SHINGLES_TYPE)
    b = pa.array(sets[n // 2 :], type=SHINGLES_TYPE)
    jac = pairwise_jaccard_lists(a, b)
    for i, (sa, sb) in enumerate(zip(sets[: n // 2], sets[n // 2 :])):
        A, B = set(sa), set(sb)
        expect = 1.0 if not A and not B else len(A & B) / max(len(A | B), 1)
        assert abs(jac[i] - expect) < 1e-12


@settings(max_examples=60, deadline=None)
@given(st.lists(TEXTS, min_size=1, max_size=5), st.integers(1, 6), st.integers(1, 6))
def test_token_windows_matches_naive(texts, window, stride):
    from ocr_ray.functions.text import token_windows

    batch = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": pa.array(texts)}
    )
    out = token_windows(batch, window=window, stride=stride).to_pylist()
    expect = []
    for i, t in enumerate(texts):
        w = t.split(" ")
        for s in range(0, max(len(w) - window + stride, 1), stride):
            chunk = w[s : s + window]
            expect.append(
                {
                    "doc_id": i,
                    "win_start": s,
                    "chunk": " ".join(chunk),
                    "n_tokens": len(chunk),
                }
            )
    assert out == expect


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(0, 5), min_size=0, max_size=40), st.integers(2, 8))
def test_run_index_pairs_matches_itertools(keys, max_group):
    from itertools import combinations

    from ocr_ray.functions.dedup import run_index_pairs

    arr = np.sort(np.asarray(keys, dtype=np.uint64))
    ia, ib = run_index_pairs(arr, max_group=max_group, presorted=True)
    expect = []
    start = 0
    while start < len(arr):
        end = start
        while end < len(arr) and arr[end] == arr[start]:
            end += 1
        idx = list(range(start, min(start + max_group, end)))
        expect += list(combinations(idx, 2))
        start = end
    assert list(zip(ia.tolist(), ib.tolist())) == expect


@settings(max_examples=40, deadline=None)
@given(st.lists(st.text(alphabet="abc xyz", min_size=0, max_size=12), min_size=0, max_size=8))
def test_hash_utf8_column_distinct_on_distinct_strings(strings):
    from ocr_ray.functions.hashing import hash_utf8_column

    arr = pa.array(strings, type=pa.string())
    h = hash_utf8_column(arr)
    assert len(h) == len(strings)
    # equal strings must hash equal; distinct strings distinct (u64 space)
    import collections

    byval = collections.defaultdict(set)
    for s, hv in zip(strings, h.tolist()):
        byval[s].add(hv)
    assert all(len(v) == 1 for v in byval.values())
    assert len({next(iter(v)) for v in byval.values()}) == len(byval)


@settings(max_examples=60, deadline=None)
@given(st.lists(TEXTS, min_size=1, max_size=6))
def test_repetition_stats_matches_counter_reference(texts):
    from collections import Counter

    from ocr_ray.functions.text import repetition_stats

    batch = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": pa.array(texts)}
    )
    out = repetition_stats(batch).to_pylist()
    for row, t in zip(out, texts):
        toks = t.split(" ")
        bigrams = Counter(zip(toks, toks[1:]))
        assert row["n_tokens"] == len(toks)
        assert row["n_distinct"] == len(set(toks))
        assert abs(row["dup_word_frac"] - (1.0 - len(set(toks)) / len(toks))) < 1e-12
        expect_bi = max(bigrams.values()) / (len(toks) - 1) if len(toks) > 1 else 0.0
        assert abs(row["top_bigram_frac"] - expect_bi) < 1e-12


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(-32768, 32767), min_size=0, max_size=600),
    st.sampled_from([None, 2, 6]),
)
def test_flac_roundtrip_property(samples, lpc_order):
    """encode->decode is the identity for arbitrary int16 PCM, with and
    without LPC subframes (hypothesis hunts predictor/rice/bit edges)."""
    import numpy as np

    from ocr_ray.stages.flac import decode_flac, encode_flac

    x = np.asarray(samples, dtype=np.int16)
    y, sr = decode_flac(encode_flac(x, block_size=64, lpc_order=lpc_order))
    assert sr == 8000 and np.array_equal(x, y)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.text(max_size=40)),
            st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1)),
            st.one_of(st.none(), st.binary(max_size=60)),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_tfrecord_roundtrip_property(rows):
    """Arbitrary (nullable string, int64, binary) rows survive the
    protobuf + CRC framing bit-exactly (floats excluded: the float32
    wire type is documented-lossy)."""
    import numpy as np
    import pyarrow as pa

    from ocr_ray.sources.tfrecord import (
        _decode_example,
        _iter_records,
        write_tfrecord_file,
    )

    t = pa.table(
        {
            "s": pa.array([r[0] for r in rows], pa.string()),
            "i": pa.array([r[1] for r in rows], pa.int64()),
            "b": pa.array([r[2] for r in rows], pa.binary()),
        }
    )
    import tempfile, os

    f = tempfile.mktemp(suffix=".tfrecord")
    try:
        write_tfrecord_file(t, f)
        data = open(f, "rb").read()
        back = [_decode_example(r) for r in _iter_records(data, f, True)]
        for row, (s, i, b) in zip(back, rows):
            got_s = row.get("s")
            assert (got_s.decode() if got_s is not None else None) == s
            assert row.get("i") == i
            assert row.get("b") == b
    finally:
        if os.path.exists(f):
            os.remove(f)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=33, max_codepoint=126),
            min_size=1,
            max_size=8,
        ),
        min_size=0,
        max_size=60,
    )
)
def test_ccseg_roundtrip_property(words):
    """Connected-component page segmentation recovers arbitrary printable
    word sequences byte-exactly (hypothesis hunts wrap/gap/order edges)."""
    from ocr_ray.stages.ccseg import recognize_page, render_page

    text = " ".join(words)
    bits, h, w = render_page(text)
    assert recognize_page(bits, h, w) == text
