"""Pure-function unit tests for round-2 primitives (no Ray execution):
vectorized set-Jaccard over list columns, shingle signatures, hash guards,
sketch edge cases."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ocr_ray.functions.dedup import (
    SHINGLES_TYPE,
    doc_shingle_lists,
    pairwise_jaccard_lists,
    shingle_set,
)
from ocr_ray.functions.hashing import hash_utf8_column, mix64
from ocr_ray.functions.sketch import histogram_quantiles


def _lists(rows):
    return pa.array([np.array(r, dtype=np.uint64) for r in rows], type=SHINGLES_TYPE)


def test_pairwise_jaccard_basic():
    a = _lists([[1, 2, 3], [1, 2], [], [5]])
    b = _lists([[1, 2, 3], [3, 4], [], [5]])
    jac = pairwise_jaccard_lists(a, b)
    assert jac[0] == 1.0  # identical
    assert jac[1] == 0.0  # disjoint
    assert jac[2] == 1.0  # both empty -> defined as 1.0
    assert jac[3] == 1.0


def test_pairwise_jaccard_partial_overlap():
    a = _lists([[1, 2, 3, 4]])
    b = _lists([[3, 4, 5, 6]])
    assert np.isclose(pairwise_jaccard_lists(a, b)[0], 2 / 6)


def test_pairwise_jaccard_empty_vs_nonempty():
    jac = pairwise_jaccard_lists(_lists([[]]), _lists([[7, 8]]))
    assert jac[0] == 0.0


def test_doc_shingle_lists_matches_python_set_size():
    texts = [
        "a b c d e f g h",
        "a b c a b c a b c",  # repeated shingles -> unique-sorted dedup
        "x y",  # fewer than k words -> empty signature
    ]
    batch = pa.table(
        {"doc_id": pa.array([1, 2, 3], type=pa.int64()), "text": pa.array(texts)}
    )
    out = doc_shingle_lists(batch)
    sizes = [len(v) for v in out["shingles"].to_pylist()]
    expected = [len(shingle_set(t)) for t in texts]
    assert sizes == expected
    for v in out["shingles"].to_pylist():
        arr = np.array(v, dtype=np.uint64)
        assert (np.diff(arr) > 0).all() if len(arr) > 1 else True  # unique-sorted


def test_hash_utf8_null_buffer_guard():
    # pa.nulls produces a string array with no data buffer — must not crash
    arr = pa.nulls(3, type=pa.string())
    h = hash_utf8_column(arr)
    assert len(h) == 3


def test_mix64_deterministic_and_spreading():
    x = np.arange(10, dtype=np.uint64)
    a, b = mix64(x), mix64(x)
    assert (a == b).all()
    assert len(np.unique(a)) == len(a)


def test_histogram_quantiles_empty_returns_nan():
    import pandas as pd

    empty = pd.DataFrame({"bin": [], "count": []})
    vals = histogram_quantiles(empty, [0.5], lo=0.0, hi=1.0)
    assert np.isnan(vals[0])


def test_token_windows_matches_naive():
    from ocr_ray.functions.text import token_windows

    texts = ["a b c d e f g", "x", "", "p q r s", "one two three four five six"]
    batch = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": pa.array(texts)}
    )
    out = token_windows(batch, window=3, stride=2).to_pylist()
    expect = []
    for i, t in enumerate(texts):
        w = t.split(" ")
        starts = list(range(0, max(len(w) - 3 + 2, 1), 2))  # n - window + stride
        for s in starts:
            chunk = w[s : s + 3]
            expect.append(
                {"doc_id": i, "win_start": s, "chunk": " ".join(chunk), "n_tokens": len(chunk)}
            )
    assert out == expect


def test_token_windows_sliced_input():
    from ocr_ray.functions.text import token_windows

    base = pa.table(
        {
            "doc_id": pa.array([9, 10, 11], type=pa.int64()),
            "text": pa.array(["skip me", "a b c d", "e f"]),
        }
    )
    sliced = base.slice(1, 2)  # shares buffers with a nonzero offset
    out = token_windows(sliced, window=2, stride=2).to_pylist()
    assert [r["chunk"] for r in out] == ["a b", "c d", "e f"]
    assert [r["doc_id"] for r in out] == [10, 10, 11]


def test_minhash_signature_permutation_is_minwise():
    # the per-permutation pass must equal the naive per-doc min
    from ocr_ray.functions.dedup import _perm_params, minhash_signatures, shingle_hashes

    texts = pa.array(["w1 w2 w3 w4 w5", "w2 w3 w4 w5 w6", "solo doc here now"])
    sig, n_sh = minhash_signatures(texts, num_perm=8)
    sh, n = shingle_hashes(texts)
    a, b = _perm_params(8)
    starts = np.concatenate([[0], np.cumsum(n)])[:-1]
    for d in range(len(texts)):
        vals = sh[starts[d] : starts[d] + n[d]]
        with np.errstate(over="ignore"):
            naive = np.array([(vals * a[j] + b[j]).min() for j in range(8)], dtype=np.uint64)
        assert (sig[d] == naive).all()


class TestSkylineKernel:
    """Property test for the block-local skyline kernel: sorted-scan result
    must equal the O(n^2) dominance definition, including (price, size)
    ties and the two-level local-then-merge composition."""

    @staticmethod
    def _brute(price, size):
        import numpy as np

        n = len(price)
        keep = []
        for i in range(n):
            dominated = False
            for j in range(n):
                if (
                    price[j] <= price[i]
                    and size[j] >= size[i]
                    and (price[j] < price[i] or size[j] > size[i])
                ):
                    dominated = True
                    break
            if not dominated:
                keep.append(i)
        return set(keep)

    def test_matches_brute_force_with_ties(self):
        import numpy as np
        import pyarrow as pa

        from ocr_ray.pipelines.queries import local_skyline

        rng = np.random.default_rng(7)
        for trial in range(25):
            n = int(rng.integers(1, 60))
            # tiny value domains force heavy (price, size) ties
            price = rng.integers(0, 6, n).astype(np.float64)
            size = rng.integers(0, 6, n).astype(np.int64)
            t = pa.table(
                {
                    "p_partkey": pa.array(np.arange(n), pa.int64()),
                    "p_size": pa.array(size),
                    "p_retailprice": pa.array(price),
                }
            )
            got = set(local_skyline(t)["p_partkey"].to_pylist())
            want = self._brute(price, size)
            assert got == want, f"trial {trial}: {sorted(got)} != {sorted(want)}"

    def test_local_then_merge_equals_global(self):
        import numpy as np
        import pyarrow as pa

        from ocr_ray.pipelines.queries import local_skyline

        rng = np.random.default_rng(11)
        n = 200
        price = rng.integers(0, 20, n).astype(np.float64)
        size = rng.integers(0, 20, n).astype(np.int64)
        t = pa.table(
            {
                "p_partkey": pa.array(np.arange(n), pa.int64()),
                "p_size": pa.array(size),
                "p_retailprice": pa.array(price),
            }
        )
        whole = set(local_skyline(t)["p_partkey"].to_pylist())
        parts = [local_skyline(t.slice(off, 50)) for off in range(0, n, 50)]
        merged = set(local_skyline(pa.concat_tables(parts))["p_partkey"].to_pylist())
        assert merged == whole


def test_histogram_partial_handles_nan_and_extreme_values():
    """NaN rows contribute to no bin (SQL NULL semantics) and values far
    outside [lo, hi] clamp to the EDGE bin instead of wrapping through an
    int64 overflow to bin 0."""
    import numpy as np
    import pyarrow as pa

    from ocr_ray.functions.sketch import histogram_partial

    t = pa.table({"v": pa.array([0.5, float("nan"), 1e300, -1e300], pa.float64())})
    out = histogram_partial(t, col="v", lo=0.0, hi=1.0, bins=16)
    got = dict(zip(out["bin"].to_pylist(), out["count"].to_pylist()))
    assert got == {8: 1, 15: 1, 0: 1}  # 0.5 -> mid, 1e300 -> top edge, -1e300 -> bottom
