"""Op-specific correctness for non-SQL operators: dedup recall/precision
vs brute force, ANN recall vs exact, simhash/media determinism."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pandas as pd
import pyarrow.parquet as pq
import pytest

from ocr_ray.functions.dedup import MUTANT_OFFSET, exact_jaccard


def _docs(sf_dir: str) -> dict[int, str]:
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


def _mutant_text(text: str, drop_every: int = 10) -> str:
    return " ".join(w for i, w in enumerate(text.split(" ")) if (i + 1) % drop_every != 0)


def _to_df(res) -> pd.DataFrame:
    return res if isinstance(res, pd.DataFrame) else res.to_pandas()


@pytest.fixture(scope="module")
def queries():
    import __ray_entry__ as e

    return e.queries()


def test_minhash_finds_all_seeded_pairs(queries, sf_smoke):
    pairs = _to_df(queries["minhash_dedup_pairs"](sf_smoke))
    found = {(int(a), int(b)) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
    docs = _docs(sf_smoke)
    missing = []
    for d, text in docs.items():
        j = exact_jaccard(text, _mutant_text(text))
        if j >= 0.6:  # comfortably above tau; LSH must not miss these
            if (d, d + MUTANT_OFFSET) not in found:
                missing.append((d, round(j, 3)))
    assert not missing, f"minhash missed {len(missing)} seeded pairs: {missing[:5]}"
    # precision: every reported pair must actually clear tau
    for a, b in list(found)[:200]:
        ta = docs[a] if a < MUTANT_OFFSET else _mutant_text(docs[a - MUTANT_OFFSET])
        tb = docs[b] if b < MUTANT_OFFSET else _mutant_text(docs[b - MUTANT_OFFSET])
        assert exact_jaccard(ta, tb) >= 0.5, (a, b)


def test_ngram_jaccard_pairs_superset_of_seeded(queries, sf_smoke):
    pairs = _to_df(queries["ngram_jaccard_pairs"](sf_smoke))
    found = {(int(a), int(b)) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
    docs = _docs(sf_smoke)
    for d, text in docs.items():
        if exact_jaccard(text, _mutant_text(text)) >= 0.6:
            assert (d, d + MUTANT_OFFSET) in found, d


def test_ivf_recall_vs_brute(queries, sf_smoke):
    brute = _to_df(queries["embedding_topk"](sf_smoke))
    ivf = _to_df(queries["ann_ivf_topk"](sf_smoke))
    recalls = []
    for q in brute["query_id"].unique():
        b = set(brute[brute.query_id == q]["vec_id"])
        a = set(ivf[ivf.query_id == q]["vec_id"])
        recalls.append(len(a & b) / len(b))
    assert np.mean(recalls) >= 0.5, f"IVF mean recall {np.mean(recalls):.2f} (per-q {recalls})"


def test_embedding_neardup_finds_perturbed(queries, sf_smoke):
    pairs = _to_df(queries["embedding_neardup_pairs"](sf_smoke))
    found = {(int(a), int(b)) for a, b in zip(pairs["vec_a"], pairs["vec_b"])}
    n_src = pq.ParquetFile(f"{sf_smoke}/embeddings.parquet").metadata.num_rows
    hits = sum((v, v + 1_000_000) in found for v in range(n_src))
    assert hits / n_src >= 0.9, f"only {hits}/{n_src} perturbed pairs found"


def test_simhash_deterministic(queries, sf_smoke):
    a = _to_df(queries["simhash_docs"](sf_smoke)).sort_values("doc_id").reset_index(drop=True)
    b = _to_df(queries["simhash_docs"](sf_smoke)).sort_values("doc_id").reset_index(drop=True)
    assert (a["simhash"].to_numpy() == b["simhash"].to_numpy()).all()


def test_simhash_neardups_are_close(queries, sf_smoke):
    pairs = _to_df(queries["simhash_neardup_pairs"](sf_smoke))
    assert (pairs["hamming"] <= 8).all()
    found = {(int(a), int(b)) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
    n_src = pq.ParquetFile(f"{sf_smoke}/documents.parquet").metadata.num_rows
    hits = sum((d, d + MUTANT_OFFSET) in found for d in range(n_src))
    assert hits / n_src >= 0.5, f"simhash found {hits}/{n_src} seeded pairs"


def test_media_features_deterministic_and_complete(queries, sf_smoke):
    a = _to_df(queries["media_features"](sf_smoke))
    b = _to_df(queries["media_features"](sf_smoke))
    a = a.sort_values(["doc_id", "media_ref"]).reset_index(drop=True)
    b = b.sort_values(["doc_id", "media_ref"]).reset_index(drop=True)
    assert (a["feature_norm"].to_numpy() == b["feature_norm"].to_numpy()).all()
    assert set(a.columns) >= {"doc_id", "media_ref", "media_kind", "n_bytes", "feature_norm"} | {
        f"f{j}" for j in range(8)
    }
    assert (a["n_bytes"] == 256).all()


def test_media_decoder_real_decode_is_stubbed():
    from ocr_ray.stages.media import MediaDecoder

    with pytest.raises(NotImplementedError):
        MediaDecoder(fake_decode=False)


def test_lang_id_on_english_docs(queries, sf_smoke):
    df = _to_df(queries["lang_id"](sf_smoke))
    # docs with >= 2 'the' votes should be classified en (stopword-vote spec)
    strong = df[df["votes_en"] >= 2]
    assert (strong["pred_lang"] == "en").mean() > 0.9


def test_fingerprint_deterministic_and_distinct(queries, sf_smoke):
    df = _to_df(queries["doc_fingerprint"](sf_smoke))
    assert df["fingerprint"].nunique() == len(df)  # texts are unique


def test_media_frame_sample_matches_numpy_reference():
    from ocr_ray.stages.media import (
        FRAME_BYTES,
        attach_payloads,
        media_frame_sample,
    )

    batch = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "media_ref": pa.array(["m-0007", "m-0012", "m-0001"]),
        }
    )
    wp = attach_payloads(batch)
    out = media_frame_sample(wp, every=4)
    payloads = wp["payload"].to_pylist()
    exp_rows = []
    for i, p in enumerate(payloads):
        nf = len(p) // FRAME_BYTES
        for f in range(0, nf, 4):
            frame = np.frombuffer(p[f * FRAME_BYTES : (f + 1) * FRAME_BYTES], dtype=np.uint8)
            c = np.uint64(0)
            for b in frame.astype(np.uint64):
                c = np.uint64(c * np.uint64(0x9E3779B97F4A7C15) + b)
            exp_rows.append((int(batch["doc_id"][i].as_py()), f, int(c)))
    got = [
        (r["doc_id"], r["frame_id"], r["frame_checksum"]) for r in out.to_pylist()
    ]
    assert got == exp_rows
    assert all(len(f) == FRAME_BYTES for f in out["frame"].to_pylist())


def test_media_resize_halves_lane_rows_and_keeps_features_consistent():
    from ocr_ray.stages.media import (
        MEDIA_FEATURE_DIM,
        MediaDecoder,
        attach_payloads,
        media_resize,
    )

    batch = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "media_ref": pa.array(["m-0003", "m-0008"]),
        }
    )
    wp = attach_payloads(batch)
    rz = media_resize(wp, factor=2)
    d = MEDIA_FEATURE_DIM
    for orig, new in zip(wp["payload"].to_pylist(), rz["payload"].to_pylist()):
        mat = np.frombuffer(orig, dtype=np.uint8)
        mat = mat[: len(mat) - len(mat) % d].reshape(-1, d)
        expected = mat[::2].reshape(-1)
        assert np.array_equal(np.frombuffer(new, dtype=np.uint8), expected)
    # features over resized payloads equal numpy means over even rows
    feats = MediaDecoder(fake_decode=True)._feature_matrix(rz["payload"])
    for i, orig in enumerate(wp["payload"].to_pylist()):
        mat = np.frombuffer(orig, dtype=np.uint8)
        mat = mat[: len(mat) - len(mat) % d].reshape(-1, d)[::2]
        ref = mat.sum(axis=0, dtype=np.int64) / (len(mat) * 255.0)
        assert np.allclose(feats[i], ref, rtol=0, atol=0)


def _planted_clusters(n_per: int = 60, k: int = 8, d: int = 32, noise: float = 0.12):
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(k, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    X = np.repeat(centers, n_per, axis=0) + noise * rng.normal(size=(k * n_per, d))
    labels = np.repeat(np.arange(k), n_per)
    return X, labels


def test_kmeans_monotone_objective_and_planted_recovery():
    import ray
    import ray.data

    from ocr_ray.functions.ann import assign_clusters, farthest_point_init, kmeans_fit

    X, labels = _planted_clusters()
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(X), dtype=np.int64)),
            "embedding": pa.array([row.astype(np.float32) for row in X]),
        }
    )
    ds = ray.data.from_arrow(t).repartition(6)
    init = farthest_point_init(X[::7], k=8)
    cent, hist = kmeans_fit(ds, init, iters=4)
    # Lloyd objective (cosine mass) must be non-decreasing
    assert all(b >= a - 1e-9 for a, b in zip(hist, hist[1:])), hist
    out = assign_clusters(ray.data.from_arrow(t), ray.put(cent)).to_pandas()
    m = pd.DataFrame({"cid": out["cid"].to_numpy(), "label": labels[out["vec_id"].to_numpy()]})
    purity = m.groupby("cid")["label"].agg(lambda s: s.value_counts().iloc[0]).sum() / len(m)
    assert purity >= 0.95, purity


def test_kmeans_registry_entry_deterministic(queries, sf_smoke):
    a = _to_df(queries["kmeans_embeddings"](sf_smoke)).sort_values("vec_id").reset_index(drop=True)
    b = _to_df(queries["kmeans_embeddings"](sf_smoke)).sort_values("vec_id").reset_index(drop=True)
    assert len(a) == 500
    assert a.equals(b)


def test_embedding_clusters_group_perturbed_copies(queries, sf_smoke):
    OFFSET = 1_000_000  # with_perturbed default
    df = _to_df(queries["embedding_dedup_clusters"](sf_smoke))
    comp = dict(zip(df["vec_id"].to_numpy(), df["cluster_id"].to_numpy()))
    n_src = pq.ParquetFile(f"{sf_smoke}/embeddings.parquet").metadata.num_rows
    # every perturbed copy that surfaced in a pair must share its
    # original's component
    paired = [v for v in range(n_src) if (v + OFFSET) in comp and v in comp]
    assert len(paired) / n_src >= 0.9, f"only {len(paired)}/{n_src} pairs clustered"
    bad = [v for v in paired if comp[v + OFFSET] != comp[v]]
    assert not bad, bad[:5]


def test_classify_hashed_matches_python_reference():
    """The vectorized classifier must equal a per-token python mirror of
    the weight recurrence (hash -> mix64(h + (c+1)*golden) % 1001 - 500,
    argmax with smallest-class tiebreak)."""
    from ocr_ray.functions.hashing import hash_utf8_column, mix64
    from ocr_ray.functions.text import classify_hashed

    texts = ["the cat sat", "a", "the the the", "x y z w", "sat cat the"]
    t = pa.table({"doc_id": pa.array(range(5), type=pa.int64()), "text": pa.array(texts)})
    out = classify_hashed(t).to_pandas()

    gold = 0x9E3779B97F4A7C15
    M = 1 << 64
    for i, text in enumerate(texts):
        scores = []
        for c in range(8):
            s = 0
            for tok in text.split(" "):
                h = int(mix64(hash_utf8_column(pa.array([tok]))).item())
                w = int(mix64(np.array([(h + (c + 1) * gold) % M], dtype=np.uint64)).item()) % 1001 - 500
                s += w
            scores.append(s)
        best = max(range(8), key=lambda c: (scores[c], -c))
        assert out.loc[i, "label"] == best, (i, scores)
        assert out.loc[i, "score"] == scores[best]


def test_classify_hashed_empty_batch():
    from ocr_ray.functions.text import classify_hashed

    t = pa.table({"doc_id": pa.array([], type=pa.int64()), "text": pa.array([], type=pa.string())})
    out = classify_hashed(t)
    assert out.num_rows == 0
    assert out.schema.names == ["doc_id", "label", "score"]


def test_pca_matches_exact_numpy(ray_session):
    """Distributed moment-pass PCA == exact in-memory PCA (covariance
    eigh) on the same data, independent of block layout."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray

    from ocr_ray.functions.ann import pca_fit, pca_transform

    tbl = pq.read_table("/root/testdata/sf0.001/embeddings.parquet", columns=["vec_id", "embedding"])
    x = np.stack(tbl["embedding"].to_pandas().to_numpy()).astype(np.float64)

    ds = ray.data.from_arrow(tbl).repartition(7)  # layout-independence probe
    comps, ratio, mean = pca_fit(ds, k=3)

    mu = x.mean(axis=0)
    cov = (x - mu).T @ (x - mu) / (len(x) - 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:3]
    ref = evecs[:, order].T
    ref = ref * np.sign(ref[np.arange(3), np.argmax(np.abs(ref), axis=1)])[:, None]

    assert np.allclose(mean, mu, atol=1e-9)
    assert np.allclose(comps, ref, atol=1e-7)
    assert np.allclose(ratio, (evals[order] / evals.sum()), atol=1e-9)
    assert ratio[0] >= ratio[1] >= ratio[2] >= 0

    proj = pca_transform(ds, comps, mean).to_pandas().sort_values("vec_id")
    ref_proj = (x - mu) @ ref.T
    ref_sorted = ref_proj[np.argsort(tbl["vec_id"].to_numpy())]
    assert np.allclose(proj[["pc0", "pc1", "pc2"]].to_numpy(), ref_sorted, atol=1e-7)


def test_quantized_recall_vs_brute(queries, sf_smoke):
    """int8-candidate + exact-rescore search: at 64 dims the 1/127 grid's
    candidate sets should almost always contain the true top-5 — demand
    high mean recall and determinism."""
    brute = _to_df(queries["embedding_topk"](sf_smoke))
    quant = _to_df(queries["ann_quantized_topk"](sf_smoke))
    recalls = []
    for q in brute["query_id"].unique():
        b = set(brute[brute.query_id == q]["vec_id"])
        a = set(quant[quant.query_id == q]["vec_id"])
        recalls.append(len(a & b) / len(b))
    assert np.mean(recalls) >= 0.9, f"quantized mean recall {np.mean(recalls):.2f} (per-q {recalls})"
    again = _to_df(queries["ann_quantized_topk"](sf_smoke))
    pd.testing.assert_frame_equal(
        quant.sort_values(["query_id", "rank"]).reset_index(drop=True),
        again.sort_values(["query_id", "rank"]).reset_index(drop=True),
    )


def test_bpe_merges_match_reference(queries, sf_smoke):
    """Distributed BPE must learn EXACTLY the merges of a pure-Python
    Sennrich-style reference on the same word counts (same deterministic
    tiebreak: count desc, then (left, right) asc)."""
    from collections import Counter

    from ocr_ray.functions.bpe import bpe_train_reference

    out = _to_df(queries["bpe_train_merges"](sf_smoke))
    docs = pq.read_table(f"{sf_smoke}/documents.parquet", columns=["text"])
    wc = Counter()
    for txt in docs["text"].to_pylist():
        wc.update(txt.split())
    ref = bpe_train_reference(dict(wc), 12)
    assert len(out) == len(ref), (len(out), len(ref))
    got = list(zip(out["left"], out["right"], out["pair_count"].astype(int)))
    assert got == ref, f"first divergence: {next((a, b) for a, b in zip(got, ref) if a != b)}"


def test_bpe_best_pair_shuffled_equals_driver_fold(queries, sf_smoke):
    """The two best_pair argmax paths — per-merge bucketed shuffle (big
    vocabularies) and per-block partials folded on the driver (the small-
    vocabulary gate bpe_train takes at test scale) — must pick IDENTICAL
    (left, right, count) for the same symbol table."""
    import ray

    from ocr_ray.functions.bpe import _to_symbol_table, best_pair, word_counts

    ds = ray.data.read_parquet(f"{sf_smoke}/documents.parquet", columns=["text"])
    sym = word_counts(ds).map_batches(_to_symbol_table, batch_format="pyarrow").materialize()
    assert best_pair(sym, shuffle=True) == best_pair(sym, shuffle=False)


def test_ppm_codec_roundtrip():
    """encode_ppm/decode_ppm: exact roundtrip, comment/whitespace-tolerant
    header parsing, and loud failures on bad magic/maxval."""
    from ocr_ray.stages.media import decode_ppm, encode_ppm, ppm_image

    img = ppm_image(1234)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    # netpbm allows comments + arbitrary whitespace in the header
    hdr = b"P6 # comment\n# another\n 16\t8\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(hdr), img)
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n16 8\n255\n" + img.tobytes())
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n16 8\n65535\n" + img.tobytes())


def test_wav_codec_roundtrip():
    """encode_wav/decode_wav: exact roundtrip, unknown-chunk skipping with
    odd-size padding, and loud failures on bad magic/format."""
    from ocr_ray.stages.media import decode_wav, encode_wav, wav_signal

    x = wav_signal(777)
    got, sr = decode_wav(encode_wav(x))
    assert sr == 8000 and np.array_equal(got, x)
    # unknown chunk (odd size -> pad byte) between fmt and data must be skipped
    raw = encode_wav(x)
    fmt_end = raw.index(b"data")
    extra = b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\x00"
    patched = raw[:fmt_end] + extra + raw[fmt_end:]
    patched = patched[:4] + (len(patched) - 8).to_bytes(4, "little") + patched[8:]
    got2, _ = decode_wav(patched)
    assert np.array_equal(got2, x)
    with pytest.raises(ValueError):
        decode_wav(b"RIFX" + raw[4:])


def test_y4m_codec_roundtrip():
    """encode_y4m/decode_y4m: exact luma roundtrip, fps tag parsing, and
    loud failures on bad magic / unsupported chroma / corrupt markers."""
    from ocr_ray.stages.media import decode_y4m, encode_y4m, y4m_frames

    fr = y4m_frames(42)
    got, fps = decode_y4m(encode_y4m(fr, fps="30:1"))
    assert fps == (30, 1) and np.array_equal(got, fr)
    with pytest.raises(ValueError):
        decode_y4m(b"YUV4MPEG3 W8 H4 F25:1\nFRAME\n" + fr[0].tobytes())
    with pytest.raises(ValueError):
        decode_y4m(b"YUV4MPEG2 W8 H4 F25:1 C444\n")
    raw = bytearray(encode_y4m(fr))
    raw[raw.index(b"FRAME")] = ord(b"X")
    with pytest.raises(ValueError):
        decode_y4m(bytes(raw))


def test_bpe_encoder_matches_reference(queries, sf_smoke):
    """The actor-pool BPE encode stage must tokenize every document to the
    same token count as an independent per-word reference encoder replaying
    the same learned merges."""
    from ocr_ray.functions.bpe import bpe_encode_reference

    enc = _to_df(queries["bpe_encode_docs"](sf_smoke))
    fit = _to_df(queries["bpe_train_merges"](sf_smoke))
    merges = list(zip(fit["left"], fit["right"]))
    docs = pq.read_table(f"{sf_smoke}/documents.parquet", columns=["doc_id", "text"])
    ref = {}
    for d, txt in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        ref[d] = sum(len(bpe_encode_reference(w, merges)) for w in txt.split(" ") if w)
    got = dict(zip(enc["doc_id"], enc["n_bpe_tokens"].astype(int)))
    assert got == ref


def test_jpeg_codec_roundtrip():
    """encode_jpeg/decode_jpeg (baseline sequential grayscale): LOSSLESS
    round trip on block-constant fixtures (DC-only, q00=8 — see
    stages/jpeg.py), bounded error on arbitrary images (the general
    Huffman/AC path incl. ZRL runs), closed-form luma stats matching the
    SQL oracle's expression, and loud failures on bad streams."""
    from ocr_ray.stages.jpeg import (
        JPG_H,
        JPG_W,
        decode_jpeg,
        encode_jpeg,
        jpeg_block_value,
        jpeg_image,
    )

    # exact round trip for every fixture shape the oracle covers
    for m in (0, 1, 7, 255, 9972):
        img = jpeg_image(m)
        dec = decode_jpeg(encode_jpeg(img))
        assert np.array_equal(dec, img), m
        assert int(dec.sum(dtype=np.int64)) == sum(
            64 * jpeg_block_value(m, b) for b in range((JPG_H // 8) * (JPG_W // 8))
        )

    # AC path: arbitrary content decodes within quantization error
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img))
    assert dec.shape == img.shape
    assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 32

    # ZRL exercise: one isolated high-frequency spike -> long zero runs
    spike = np.full((8, 8), 128, dtype=np.uint8)
    spike[7, 7] = 255
    dec = decode_jpeg(encode_jpeg(spike))
    assert int(np.abs(dec.astype(int) - spike.astype(int)).max()) <= 64

    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x00")
    buf = bytearray(encode_jpeg(jpeg_image(3)))
    sof = buf.find(b"\xff\xc0")
    buf[sof + 1] = 0xC2  # progressive SOF marker
    with pytest.raises(ValueError):
        decode_jpeg(bytes(buf))


def test_jpeg_partial_mcu_dims():
    """Non-multiple-of-8 dims (review regression): SOF declares the true
    size, the entropy data holds whole edge MCUs (edge-replicated on
    encode), and the decoder crops — never returns uninitialized memory.
    Block-constant content stays EXACT because edge replication keeps
    every padded MCU constant."""
    from ocr_ray.stages.jpeg import decode_jpeg, encode_jpeg

    for h, w in ((12, 16), (16, 12), (1, 1), (9, 23), (8, 10)):
        img = np.full((h, w), 77, dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(img))
        assert dec.shape == (h, w)
        assert np.array_equal(dec, img), (h, w)

    # arbitrary content at odd dims: deterministic decode, bounded error
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(13, 21), dtype=np.uint8)
    buf = encode_jpeg(img)
    d1, d2 = decode_jpeg(buf), decode_jpeg(buf)
    assert np.array_equal(d1, d2)
    assert d1.shape == (13, 21)
    assert int(np.abs(d1.astype(int) - img.astype(int)).max()) <= 64


def test_pq_topk_recall_vs_brute(queries, sf_smoke):
    """PQ two-stage top-5 vs exact brute-force top-5 on the same table:
    8x16 codebooks over 500 vectors with a 64-candidate ADC shortlist must
    recover most of the true top-5 (mean recall bound), and every returned
    row must be SOUND — rank agrees with exact cosine order because the
    rescore stage recomputed it (checked by rank monotonicity of exact
    scores recomputed here)."""
    pq_out = _to_df(queries["ann_pq_topk"](sf_smoke))
    brute = _to_df(queries["embedding_topk"](sf_smoke))
    recalls = []
    for q in brute["query_id"].unique():
        b = set(brute[brute.query_id == q]["vec_id"])
        a = set(pq_out[pq_out.query_id == q]["vec_id"])
        recalls.append(len(a & b) / len(b))
    assert np.mean(recalls) >= 0.7, f"PQ mean recall {np.mean(recalls):.2f} (per-q {recalls})"
    # soundness: recompute exact cosine for returned rows; rank order must
    # be exactly descending-score (vec_id tiebreak) per query
    t = pq.read_table(f"{sf_smoke}/embeddings.parquet", columns=["vec_id", "embedding"])
    emb = {int(v): np.asarray(e, dtype=np.float64) for v, e in zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist())}
    for q in pq_out["query_id"].unique():
        g = pq_out[pq_out.query_id == q].sort_values("rank")
        qv = emb[int(q)] / np.linalg.norm(emb[int(q)])
        sc = [float(qv @ (emb[int(v)] / np.linalg.norm(emb[int(v)]))) for v in g["vec_id"]]
        order = sorted(zip(sc, [-int(v) for v in g["vec_id"]]), reverse=True)
        assert [(-v) for _, v in order] == [int(v) for v in g["vec_id"]], q


def test_pq_encode_deterministic_and_lossless_on_codebook_points():
    """Codebook-point inputs must encode to themselves (lossless when the
    vocabulary covers the data) and encoding must be deterministic."""
    import numpy as np

    from ocr_ray.functions.ann import pq_encode_matrix, pq_train

    rng = np.random.default_rng(7)
    x = rng.normal(size=(40, 64))
    books = pq_train(x, m=8, n_codes=64, iters=4)
    c1 = pq_encode_matrix(x, books)
    c2 = pq_encode_matrix(x, books)
    assert (c1 == c2).all()
    # reconstruct from codes: with n_codes >= n every subvector is its own
    # centroid after Lloyd converges on singleton clusters
    m, kk, sub = books.shape
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    recon = np.concatenate(
        [books[j][c1[:, j]] for j in range(m)], axis=1
    )
    assert np.allclose(recon, xn, atol=1e-8)


NONSQL_GATED = sorted(
    [
        "bpe_train_merges",
        "bpe_encode_docs",
        "wordpiece_encode_docs",
        "kmeans_embeddings",
        "pca_embeddings",
        "ann_ivf_topk",
        "ann_pq_topk",
    ]
)


def test_nonsql_queries_self_verify_with_gate_ok(sf_smoke):
    """Every registry entry WITHOUT a SQL oracle must be self-verifying
    in its returned table: a ``gate_ok`` column, all true on a healthy
    run (VERDICT r3 item 7 — the driver's rows-only check then carries
    the exactness evidence in-band)."""
    import __ray_entry__ as e

    qs, sqls = e.queries(), e.oracle_sql()
    unoracled = sorted(set(qs) - set(sqls))
    assert unoracled == NONSQL_GATED, unoracled
    for name in NONSQL_GATED:
        df = _to_df(qs[name](sf_smoke))
        assert "gate_ok" in df.columns, name
        assert len(df) > 0 and bool(df["gate_ok"].all()), name
