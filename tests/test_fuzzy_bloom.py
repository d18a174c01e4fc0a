"""Unit tests for the fuzzy (edit-distance) and bloom-filter primitives.

The Levenshtein kernel is checked against DuckDB's ``levenshtein()`` (the
oracle semantics the fuzzy_match_parts query relies on) and a hand-rolled
reference; the bloom bitset is checked for zero false negatives and a
bounded false-positive rate."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa

from ocr_ray.functions.bloom import bloom_contains, bloom_partial
from ocr_ray.functions.fuzzy import levenshtein_to_probe


def duck_lev(strings, probe):
    con = duckdb.connect()
    return [
        con.execute("SELECT levenshtein(?, ?)", [s, probe]).fetchone()[0] for s in strings
    ]


def test_levenshtein_matches_duckdb_ascii():
    strings = [
        "kitten",
        "sitting",
        "",
        "a",
        "abcdef",
        "fedcba",
        "goldenrod lavender spring chocolate lace",
        "goldenrod lavender sprint chocolate lace",
        "completely different words here",
    ]
    for probe in ["kitten", "", "goldenrod lavender spring chocolate lace", "xyz"]:
        got = levenshtein_to_probe(pa.array(strings), probe).tolist()
        assert got == duck_lev(strings, probe), probe


def test_levenshtein_sliced_array_offset():
    arr = pa.array(["aaaa", "kitten", "sitting", "mitten"])
    sliced = arr.slice(1, 3)
    got = levenshtein_to_probe(sliced, "kitten").tolist()
    assert got == [0, 3, 1]


def test_levenshtein_non_ascii_matches_duckdb_byte_semantics():
    # DuckDB's levenshtein is BYTE-based ('café' vs 'cafe' = 2); the kernel
    # operates on UTF-8 bytes so it matches on non-ASCII too.
    strings = ["café", "cafe", "naïve", "日本語"]
    for probe in ["cafe", "café", "日本"]:
        got = levenshtein_to_probe(pa.array(strings), probe).tolist()
        assert got == duck_lev(strings, probe), probe


def test_bloom_no_false_negatives_and_bounded_fpp():
    num_bits, k = 1 << 16, 4
    keys = pa.array(np.arange(1000, dtype=np.int64) * 7 + 3)
    words = bloom_partial(keys, num_bits, k)
    assert bloom_contains(words, keys, num_bits, k).all()  # zero false negatives
    absent = pa.array(np.arange(5000, dtype=np.int64) * 13 + 1_000_001)
    fpp = bloom_contains(words, absent, num_bits, k).mean()
    assert fpp < 0.05, fpp  # theoretical ~ (1 - e^{-kn/m})^k ≈ 0.0003


def test_bloom_partials_or_merge():
    num_bits, k = 1 << 14, 3
    a = pa.array([1, 2, 3], type=pa.int64())
    b = pa.array([100, 200], type=pa.int64())
    merged = bloom_partial(a, num_bits, k) | bloom_partial(b, num_bits, k)
    both = pa.array([1, 2, 3, 100, 200], type=pa.int64())
    assert bloom_contains(merged, both, num_bits, k).all()


def test_bloom_string_keys():
    num_bits, k = 1 << 14, 4
    keys = pa.array([f"user-{i}" for i in range(500)])
    words = bloom_partial(keys, num_bits, k)
    assert bloom_contains(words, keys, num_bits, k).all()
    absent = pa.array([f"nobody-{i}" for i in range(2000)])
    assert bloom_contains(words, absent, num_bits, k).mean() < 0.05
