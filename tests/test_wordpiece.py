"""WordPiece greedy-encode exactness: distributed encoder vs the plain
reference scanner, vocab derivation, UNK handling, and the query's
per-doc counts against a from-scratch recount."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ocr_ray.functions.wordpiece import (
    UNK,
    WordpieceEncoder,
    wordpiece_encode_reference,
    wordpiece_vocab,
)


def test_reference_greedy_longest_match():
    vocab = {"u", "n", "unaff", "able", "a", "b", "l", "e", "ff", "affable"}
    # greedy takes 'unaff' first even though 'affable' would tile better
    assert wordpiece_encode_reference("unaffable", vocab) == [
        "unaff",
        "##able",
    ]
    assert wordpiece_encode_reference("", vocab) == []
    # no 'z' in vocab -> whole word is UNK
    assert wordpiece_encode_reference("zap", vocab) == [UNK]


def test_vocab_from_merges_includes_alphabet():
    vocab = wordpiece_vocab([("a", "b"), ("ab", "c")])
    assert {"a", "b", "c", "ab", "abc"} <= vocab


def test_encoder_counts_match_reference_full_coverage():
    rng = np.random.default_rng(7)
    merges = [("t", "h"), ("th", "e"), ("i", "n"), ("in", "g"), ("e", "r")]
    vocab = wordpiece_vocab(merges, extra_chars="abcdefghijklmnopqrstuvwxyz")
    enc = WordpieceEncoder(vocab, verify_mod=1)  # gate on EVERY word type
    alphabet = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    words = [
        "".join(rng.choice(alphabet, size=rng.integers(1, 14)))
        for _ in range(300)
    ] + ["the", "thing", "tinger", "err", "ththth"]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(words)), pa.int64()),
            "text": pa.array(words),
        }
    )
    out = enc(t)
    for i, w in enumerate(words):
        ref = wordpiece_encode_reference(w, vocab)
        assert out["n_pieces"][i].as_py() == len(ref), w
        assert out["n_unk"][i].as_py() == int(UNK in ref), w


def test_encoder_unk_and_multiword_docs():
    vocab = wordpiece_vocab([("a", "b")])  # alphabet is only {a, b}
    enc = WordpieceEncoder(vocab, verify_mod=1)
    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["ab ba zz", None]),
        }
    )
    out = enc(t)
    # 'ab' -> 1 piece, 'ba' -> 2 pieces, 'zz' -> UNK (1 piece, 1 unk)
    assert out["n_pieces"][0].as_py() == 4
    assert out["n_unk"][0].as_py() == 1
    assert out["n_pieces"][1].as_py() == 0


def test_query_counts_vs_recount(sf_smoke):
    from ocr_ray.functions.bpe import bpe_train
    from ocr_ray.pipelines.queries import QUERY_FNS

    out = QUERY_FNS["wordpiece_encode_docs"](sf_smoke).to_pandas()
    fit = bpe_train(
        ray.data.read_parquet(f"{sf_smoke}/documents.parquet").select_columns(
            ["text"]
        ),
        num_merges=12,
        verify=True,
    )
    vocab = wordpiece_vocab(list(zip(fit["left"], fit["right"])))
    import pyarrow.parquet as pq

    docs = pq.read_table(
        f"{sf_smoke}/documents.parquet", columns=["doc_id", "text"]
    ).to_pydict()
    got = dict(zip(out["doc_id"], out["n_pieces"]))
    assert len(got) == len(docs["doc_id"])
    for d, text in zip(docs["doc_id"], docs["text"]):
        want = sum(
            len(wordpiece_encode_reference(w, vocab))
            for w in text.split(" ")
            if w
        )
        assert got[d] == want, d


def test_proximity_interior_nearest(tmp_path, sf_smoke):
    """A window can contain a CLOSER interior hit than either end — the
    min_dist must come from the bracketing elements of the insertion
    point, not the window bounds."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.queries import ORACLE_SQL, QUERY_FNS

    # scans at distances 4, 1, 2 from the single spark: min_dist = 1,
    # and only the 1- and 2-away hits fall inside the NEAR/3 window
    text = "scan pad x scan spark w scan tail filler words here now"
    d = tmp_path / "prox"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array([0], pa.int64()), "text": pa.array([text])}),
        str(d / "documents.parquet"),
    )
    out = QUERY_FNS["proximity_search_docs"](str(d)).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    want = con.execute(ORACLE_SQL["proximity_search_docs"]).df()
    assert len(out) == 1 and len(want) == 1
    assert int(out.min_dist[0]) == int(want.min_dist[0]) == 1
    assert int(out.n_pairs_within[0]) == int(want.n_pairs_within[0]) == 2
