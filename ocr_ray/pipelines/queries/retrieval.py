"""Query registry section: retrieval (split from the former monolithic queries.py)."""

from __future__ import annotations


import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ocr_ray.corpus import ensure_corpus
from ocr_ray.functions.relational import hash_join, to_units
from ocr_ray.sizing import default_buckets, pool_size
from ocr_ray.sources import read_documents, read_table

from ocr_ray.pipelines.queries._shared import stateless_stage, query, read_docs, read_embeddings
from ocr_ray.pipelines.queries.simsearch import _BRUTE_TOPK_SQL, _query_vectors
from ocr_ray.pipelines.queries.curation import _BM25_SC_SQL, bm25_search


# ---------------------------------------------------------------------------
# round-2h: retrieval fusion + deterministic reservoir sampling
# ---------------------------------------------------------------------------

_SPLITMIX_CHAIN = """
h0 AS (SELECT *, CAST(event_id AS UBIGINT) AS x FROM base),
h1 AS (SELECT * EXCLUDE (x), xor(x, x >> 30) AS x FROM h0),
h2 AS (SELECT * EXCLUDE (x), CAST((
    CAST(x % 4294967296 AS HUGEINT) * '13787848793156543929'::HUGEINT
    + (CAST(x // 4294967296 AS HUGEINT) * '13787848793156543929'::HUGEINT % 4294967296) * 4294967296
  ) % '18446744073709551616'::HUGEINT AS UBIGINT) AS x FROM h1),
h3 AS (SELECT * EXCLUDE (x), xor(x, x >> 27) AS x FROM h2),
h4 AS (SELECT * EXCLUDE (x), CAST((
    CAST(x % 4294967296 AS HUGEINT) * '10723151780598845931'::HUGEINT
    + (CAST(x // 4294967296 AS HUGEINT) * '10723151780598845931'::HUGEINT % 4294967296) * 4294967296
  ) % '18446744073709551616'::HUGEINT AS UBIGINT) AS x FROM h3),
h5 AS (SELECT * EXCLUDE (x), xor(x, x >> 31) AS pri FROM h4)
"""


@query(
    "reservoir_sample_events",
    sql="WITH base AS (SELECT event_id, event_type FROM events),"
    + _SPLITMIX_CHAIN
    + """
SELECT event_type, event_id, CAST(rn AS BIGINT) AS rn FROM (
  SELECT event_type, event_id,
         row_number() OVER (PARTITION BY event_type ORDER BY pri, event_id) AS rn
  FROM h5)
WHERE rn <= 8 ORDER BY event_type, rn
""",
)
def reservoir_sample_events(sf_dir: str) -> ray.data.Dataset:
    """Deterministic per-group RESERVOIR sample: keep the 8 rows with the
    smallest ``splitmix64(event_id)`` per event_type — a uniform random
    sample under a hash-random priority that is reproducible across
    reruns, resumable shards, and insertions (a new row only displaces
    the current max priority, never reshuffles the sample). Distributed
    shape: per-batch LOCAL bottom-8 per group (map-side combine), then
    one tiny groupby over <= 8 x blocks x |groups| partial rows — no task
    ever holds a group's full row set. Oracle: the splitmix64 chain in
    HUGEINT SQL + ROW_NUMBER, bit-exact."""
    from ocr_ray.functions.hashing import mix64

    K = 8
    ds = read_table(sf_dir, "events", columns=["event_id", "event_type"])

    def local_bottom(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pri = mix64(ids.astype(np.uint64))
        df = pd.DataFrame(
            {"event_type": t["event_type"].to_pandas(), "event_id": ids, "pri": pri}
        )
        df = df.sort_values(["event_type", "pri", "event_id"], kind="mergesort")
        df = df.groupby("event_type", as_index=False, dropna=False).head(K)
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["pri", "event_id"], kind="mergesort").head(K)
        return pd.DataFrame(
            {
                "event_type": df["event_type"].to_numpy(),
                "event_id": df["event_id"].to_numpy(dtype=np.int64),
                "rn": np.arange(1, len(df) + 1, dtype=np.int64),
            }
        )

    out = (
        ds.map_batches(local_bottom, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(merge, batch_format="pandas")
    )
    return out.sort(["event_type", "rn"])


@query(
    "hybrid_rrf_search",
    sql=_BM25_SC_SQL
    + """,
bm AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
       FROM sc QUALIFY r <= 20),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
kn AS (SELECT vec_id AS doc_id,
         row_number() OVER (ORDER BY list_cosine_similarity(qe, embedding) DESC, vec_id) AS r
       FROM q, embeddings WHERE vec_id <> 0 QUALIFY r <= 20)
SELECT COALESCE(bm.doc_id, kn.doc_id) AS doc_id,
  CAST(COALESCE(bm.r, 0) AS BIGINT) AS bm25_rank,
  CAST(COALESCE(kn.r, 0) AS BIGINT) AS knn_rank,
  (CASE WHEN bm.r IS NULL THEN 0.0 ELSE 1.0 / (60 + bm.r) END)
    + (CASE WHEN kn.r IS NULL THEN 0.0 ELSE 1.0 / (60 + kn.r) END) AS rrf_score
FROM bm FULL OUTER JOIN kn ON bm.doc_id = kn.doc_id
ORDER BY rrf_score DESC, doc_id
""",
)
def hybrid_rrf_search(sf_dir: str) -> pd.DataFrame:
    """Hybrid retrieval with Reciprocal Rank Fusion: the lexical leg is
    the distributed BM25 top-20 (``bm25_search``'s plan), the semantic
    leg is the distributed brute-cosine top-20 for query vector 0
    (``embedding_topk``'s plan), and the two CONSTANT-SIZE rank lists
    fuse on the driver with ``1/(60+r)`` — the k-bounded final step of a
    retrieval stack (both legs stream; only 2k rows ever leave them).
    RRF scores are bit-exact vs the oracle because BOTH sides perform
    the identical IEEE-754 op sequence (same 1/(60+r) divisions, same
    addition order) — NOT because the terms are dyadic (1/61 is not);
    reordering either side's additions would break the exact gate."""
    from ocr_ray.functions.ann import brute_topk

    K = 20
    bm = bm25_search(sf_dir).to_pandas().reset_index(drop=True)
    bm["bm25_rank"] = np.arange(1, len(bm) + 1, dtype=np.int64)

    qids, qmat = _query_vectors(sf_dir, n=1)  # query vector 0, same helper as embedding_topk
    queries_ref = ray.put((np.asarray(qids, dtype=np.int64), qmat))
    ds = read_embeddings(sf_dir, columns=["vec_id", "embedding"])
    kn = brute_topk(ds, queries_ref, k=K).to_pandas()
    kn = kn.rename(columns={"vec_id": "doc_id", "rank": "knn_rank"})[["doc_id", "knn_rank"]]

    fused = bm[["doc_id", "bm25_rank"]].merge(kn, on="doc_id", how="outer")
    br = fused["bm25_rank"].to_numpy(dtype=np.float64, na_value=np.nan)
    kr = fused["knn_rank"].to_numpy(dtype=np.float64, na_value=np.nan)
    rrf = np.where(np.isnan(br), 0.0, 1.0 / (60.0 + br)) + np.where(
        np.isnan(kr), 0.0, 1.0 / (60.0 + kr)
    )
    out = pd.DataFrame(
        {
            "doc_id": fused["doc_id"].to_numpy(dtype=np.int64),
            "bm25_rank": np.nan_to_num(br, nan=0.0).astype(np.int64),
            "knn_rank": np.nan_to_num(kr, nan=0.0).astype(np.int64),
            "rrf_score": rrf,
        }
    ).sort_values(["rrf_score", "doc_id"], ascending=[False, True], kind="mergesort")
    return out.reset_index(drop=True)


@query("ann_quantized_topk", sql=_BRUTE_TOPK_SQL)
def ann_quantized_topk(sf_dir: str) -> ray.data.Dataset:
    """int8-quantized cosine top-5 with exact rescoring — the memory-scale
    ANN path (4x smaller than float32 vectors; fixed 1/127 grid since
    inputs are unit-normalized, so no calibration pass). Oracled against
    the shared brute-force SQL: with 4x candidate oversampling the int8
    candidate cut keeps every true top-5 member on this corpus family, and
    the exact float64 rescore then reproduces brute ranks bit-exactly
    (verified at sf 0.001/0.01/0.1; candidate recall additionally asserted
    in tests)."""
    from ocr_ray.functions.ann import quantized_topk

    qids, qmat = _query_vectors(sf_dir)
    queries_ref = ray.put((qids, qmat))
    ds = read_embeddings(sf_dir, columns=["vec_id", "embedding"])
    out = quantized_topk(ds, queries_ref, k=5, oversample=4)
    return out.map_batches(
        lambda t: t.select(["query_id", "vec_id", "rank"]), batch_format="pyarrow"
    )


@query("bpe_train_merges", sql=None)
def bpe_train_merges(sf_dir: str) -> pd.DataFrame:
    """Distributed BPE tokenizer training (12 merges) over the documents
    corpus: ONE corpus-scale word-count pass, then merge learning on the
    word-frequency table (bounded by vocabulary, not corpus — the HF-
    tokenizers trick), each iteration one distributed pair-count + driver
    argmax + broadcast rewrite. Iterative, so no SQL oracle; the learned
    merge list is asserted EQUAL to an independent pure-Python reference
    BPE on the same word counts — in tests AND in-query, and the
    comparison is SELF-VERIFYING IN THE OUTPUT: every merge row carries
    ``gate_ok`` = (left, right, pair_count) matches the reference merge
    at that rank, so a regression is visible in the returned table (and
    still raises loudly if any row disagrees)."""
    from ocr_ray.functions.bpe import bpe_train, bpe_train_reference

    ds = read_docs(sf_dir, columns=["text"])
    fit, wc = bpe_train(ds, num_merges=12, verify=False, return_word_counts=True)
    ref = bpe_train_reference(wc, 12)
    got = [
        (str(l), str(r), int(c))
        for l, r, c in zip(fit["left"], fit["right"], fit["pair_count"])
    ]
    fit = fit.copy()
    fit["gate_ok"] = [
        i < len(ref) and got[i] == tuple(ref[i]) for i in range(len(got))
    ]
    if not (bool(fit["gate_ok"].all()) and len(got) == len(ref)):
        raise RuntimeError(
            f"bpe_train_merges gate failed: engine {got[:3]} != reference {ref[:3]}"
        )
    return fit


_PPM_SQL = """
WITH src AS (SELECT doc_id AS d, string_split(text, ' ') AS ws FROM documents),
w AS (SELECT d, generate_subscripts(ws, 1) AS i FROM src),
spans AS (SELECT d, (i - 1) // 8 AS si FROM w GROUP BY d, (i - 1) // 8),
media AS (
  SELECT d, si, (d * 1000 + si) % 9973 AS m FROM spans
  WHERE (d + si) % 7 <> 0 AND (d + si) % 5 = 3
),
px AS (SELECT unnest(generate_series(0, 15)) AS x),
py AS (SELECT unnest(generate_series(0, 7)) AS y),
bytes AS (
  SELECT d, m, c.ch AS ch, (m * 37 + 11 + 13 * py.y + 7 * px.x + 29 * c.ch) % 256 AS val
  FROM media CROSS JOIN px CROSS JOIN py
  CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS ch) c
),
feat AS (
  SELECT d, m, ch, CAST(SUM(val) AS DOUBLE) / 128.0 AS mu
  FROM bytes GROUP BY d, m, ch
)
SELECT printf('doc-%08d', d) AS doc_id, printf('m-%d', m) AS media_ref,
  CAST(16 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
  MAX(CASE WHEN ch = 0 THEN mu END) AS mean_r,
  MAX(CASE WHEN ch = 1 THEN mu END) AS mean_g,
  MAX(CASE WHEN ch = 2 THEN mu END) AS mean_b
FROM feat GROUP BY d, m
"""


def _media_codec_pipeline(sf_dir: str, attach_fn, decoder_cls) -> ray.data.Dataset:
    """Shared shape of every media-codec query: corpus -> explode ->
    media-span filter -> fixture payload attach -> actor-pool decode.
    One definition so batch sizing / filtering changes edit one place."""
    from ocr_ray.stages.explode import explode_documents

    corpus = ensure_corpus(sf_dir, glyphs=False)
    ds = read_documents(corpus)
    flat = ds.map_batches(
        explode_documents, batch_format="pyarrow", fn_kwargs={"sentinels": False}
    ).map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "media")), batch_format="pyarrow"
    )
    with_payloads = flat.map_batches(attach_fn, batch_format="pyarrow", batch_size=512)
    return stateless_stage(with_payloads, decoder_cls, batch_size=512)


@query("media_ppm_features", sql=_PPM_SQL)
def media_ppm_features(sf_dir: str) -> ray.data.Dataset:
    """REAL image decode path: media spans get genuine binary PPM (P6)
    payloads (netpbm-encoded from a closed-form test image), and the
    ``PpmDecoder`` actor stage PARSES the format — header tokenizer,
    magic/maxval validation, zero-copy raster view — then computes
    per-channel means. Because the test image is closed-form arithmetic,
    the decoded statistics are oracle-checked bit-exact end to end: a
    header-parsing bug, offset error, or channel swap fails the oracle.
    Non-PPM codecs remain stubbed (no PIL/ffmpeg here); this proves the
    decode plumbing on a real format with zero dependencies."""
    from ocr_ray.stages.media import PpmDecoder, attach_ppm_payloads

    return _media_codec_pipeline(sf_dir, attach_ppm_payloads, PpmDecoder)


_PNG_SQL = """
WITH src AS (SELECT doc_id AS d, string_split(text, ' ') AS ws FROM documents),
w AS (SELECT d, generate_subscripts(ws, 1) AS i FROM src),
spans AS (SELECT d, (i - 1) // 8 AS si FROM w GROUP BY d, (i - 1) // 8),
media AS (
  SELECT d, si, (d * 1000 + si) % 9973 AS m FROM spans
  WHERE (d + si) % 7 <> 0 AND (d + si) % 5 = 3
),
px AS (SELECT unnest(generate_series(0, 15)) AS x),
py AS (SELECT unnest(generate_series(0, 7)) AS y),
bytes AS (
  SELECT d, m, c.ch AS ch, (m * 41 + 23 + 17 * py.y + 5 * px.x + 31 * c.ch) % 256 AS val
  FROM media CROSS JOIN px CROSS JOIN py
  CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS ch) c
),
feat AS (
  SELECT d, m, ch, CAST(SUM(val) AS DOUBLE) / 128.0 AS mu
  FROM bytes GROUP BY d, m, ch
)
SELECT printf('doc-%08d', d) AS doc_id, printf('m-%d', m) AS media_ref,
  CAST(16 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
  MAX(CASE WHEN ch = 0 THEN mu END) AS mean_r,
  MAX(CASE WHEN ch = 1 THEN mu END) AS mean_g,
  MAX(CASE WHEN ch = 2 THEN mu END) AS mean_b
FROM feat GROUP BY d, m
"""


@query("media_png_features", sql=_PNG_SQL)
def media_png_features(sf_dir: str) -> ray.data.Dataset:
    """REAL compressed-image decode path #2: media spans get genuine PNG
    payloads (DEFLATE via stdlib zlib; signature, CRC-verified
    IHDR/IDAT/IEND framing, per-row adaptive filtering over all five PNG
    filter types — ``stages/png.py``) and the ``PngDecoder`` actor stage
    runs a full decode: chunk walk + CRC-32 check, inflate, unfilter
    (None/Sub/Up/Average/Paeth). PNG is LOSSLESS, so unlike the JPEG leg
    this needs no fixture constraint: the closed-form test image
    round-trips bit-exactly and the decoded channel means are
    oracle-checked end to end — an inflate, CRC, or unfilter bug fails
    the hash."""
    from ocr_ray.stages.png import PngDecoder, attach_png_payloads

    return _media_codec_pipeline(sf_dir, attach_png_payloads, PngDecoder)


_GIF_SQL = """
WITH src AS (SELECT doc_id AS d, string_split(text, ' ') AS ws FROM documents),
w AS (SELECT d, generate_subscripts(ws, 1) AS i FROM src),
spans AS (SELECT d, (i - 1) // 8 AS si FROM w GROUP BY d, (i - 1) // 8),
media AS (
  SELECT d, si, (d * 1000 + si) % 9973 AS m FROM spans
  WHERE (d + si) % 7 <> 0 AND (d + si) % 5 = 3
),
px AS (SELECT unnest(generate_series(0, 15)) AS x),
py AS (SELECT unnest(generate_series(0, 7)) AS y),
vals AS (
  SELECT d, m, (m * 41 + 23 + 17 * py.y + 5 * px.x) % 256 AS val
  FROM media CROSS JOIN px CROSS JOIN py
)
SELECT printf('doc-%08d', d) AS doc_id, printf('m-%d', m) AS media_ref,
  CAST(16 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
  CAST(SUM(val) AS DOUBLE) / 128.0 AS mean_gray,
  CAST((m * 41 + 23) % 256 AS BIGINT) AS first_px,
  CAST((m * 41 + 217) % 256 AS BIGINT) AS last_px
FROM vals GROUP BY d, m
"""


@query("media_gif_features", sql=_GIF_SQL)
def media_gif_features(sf_dir: str) -> ray.data.Dataset:
    """REAL compressed-image decode path #3: media spans get genuine
    GIF87a payloads (256-entry grayscale color table, from-scratch LZW
    with variable 9..12-bit codes, CLEAR/EOI, dictionary reset, 255-byte
    sub-block framing — ``stages/gif.py``) and the ``GifDecoder`` actor
    stage runs a full decode: header/screen-descriptor parse, color-table
    load, sub-block reassembly, LZW decode (incl. the KwKwK case),
    palette lookup. GIF is lossless over the paletted fixture, so the
    decoded stats are oracle-checked bit-exact — a bit-packing,
    dictionary-growth, or framing bug fails the hash."""
    from ocr_ray.stages.gif import GifDecoder, attach_gif_payloads

    return _media_codec_pipeline(sf_dir, attach_gif_payloads, GifDecoder)


_JPEG_SQL = """
WITH src AS (SELECT doc_id AS d, string_split(text, ' ') AS ws FROM documents),
w AS (SELECT d, generate_subscripts(ws, 1) AS i FROM src),
spans AS (SELECT d, (i - 1) // 8 AS si FROM w GROUP BY d, (i - 1) // 8),
media AS (
  SELECT d, si, (d * 1000 + si) % 9973 AS m FROM spans
  WHERE (d + si) % 7 <> 0 AND (d + si) % 5 = 3
),
blocks AS (
  SELECT d, m, (m * 37 + 11 + 53 * b.i) % 256 AS v
  FROM media CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i) b
)
SELECT printf('doc-%08d', d) AS doc_id, printf('m-%d', m) AS media_ref,
  CAST(16 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
  CAST(64 * SUM(v) AS BIGINT) AS luma_sum,
  CAST((m * 37 + 11) % 256 AS BIGINT) AS first_px,
  CAST((m * 37 + 11 + 159) % 256 AS BIGINT) AS last_px
FROM blocks GROUP BY d, m
"""


@query("media_jpeg_features", sql=_JPEG_SQL)
def media_jpeg_features(sf_dir: str) -> ray.data.Dataset:
    """REAL compressed-image decode path: media spans get genuine baseline
    JPEG payloads (markers, quantization, zigzag, canonical Huffman with
    byte stuffing — ``stages/jpeg.py``) and the ``JpegDecoder`` actor
    stage runs a full decode: marker walk, DHT/DQT parse, Huffman +
    coefficient extend, dequantize, de-zigzag, IDCT, level shift. The
    fixture images are constant per 8x8 block with DC quantizer step 8,
    so the lossy format round-trips these EXACTLY and the decoded stats
    are oracle-checked bit-exact (a Huffman, zigzag, dequant or IDCT bug
    fails the hash). The general AC path is covered by pytest on
    non-constant images. MP3/H.264 stay stubbed (no ffmpeg here)."""
    from ocr_ray.stages.jpeg import JpegDecoder, attach_jpeg_payloads

    return _media_codec_pipeline(sf_dir, attach_jpeg_payloads, JpegDecoder)


@query(
    "dataset_diff_orders",
    sql="""
WITH b AS (SELECT o_orderkey AS k, o_orderstatus AS st, CAST(o_totalprice AS DECIMAL(18,2)) AS pr
           FROM orders),
n AS (
  SELECT k, st, pr FROM b WHERE k % 10 NOT IN (7, 3, 0)
  UNION ALL SELECT k, st, pr + 100 FROM b WHERE k % 10 = 3
  UNION ALL SELECT k, st, pr FROM b WHERE k % 10 = 0
  UNION ALL SELECT k + 10000000, st, pr FROM b WHERE k % 10 = 0
)
SELECT status, CAST(COUNT(*) AS BIGINT) AS n_keys FROM (
  SELECT CASE WHEN b.k IS NULL THEN 'added'
              WHEN n.k IS NULL THEN 'removed'
              WHEN b.st <> n.st OR b.pr <> n.pr THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM b FULL OUTER JOIN n ON b.k = n.k
) GROUP BY status ORDER BY status
""",
)
def dataset_diff_orders(sf_dir: str) -> ray.data.Dataset:
    """Snapshot DIFF (the data-ops audit between two dataset versions):
    classify every key as added / removed / changed / unchanged across
    two corpus-scale snapshots with ONE bucketed full-outer join — class
    counting happens inside the join bucket (a key's two versions are
    co-located there), so the shuffle emits 4 x num_buckets partial rows.
    Snapshot B is derived deterministically from A (delete keys %10==7,
    +100 price on %10==3, duplicate %10==0 under new keys) so the oracle
    rebuilds both sides in SQL. Payload equality compares integer cents —
    exact."""
    from ray.data.aggregate import Sum

    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    base = read_table(sf_dir, "orders", columns=cols)

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": t["o_orderkey"],
                "st": t["o_orderstatus"],
                "pr_u2": to_units(t["o_totalprice"]),
            }
        )

    def mk_new(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        st = t["o_orderstatus"].to_numpy(zero_copy_only=False)
        pr = to_units(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        keep = k % 10 != 7
        upd = k % 10 == 3
        dup = k % 10 == 0
        return pa.table(
            {
                "k": pa.array(np.concatenate([k[keep], k[dup] + 10_000_000])),
                "st": pa.array(np.concatenate([st[keep], st[dup]]), type=pa.string()),
                "pr_u2": pa.array(
                    np.concatenate([pr[keep] + np.where(upd[keep], 10_000, 0), pr[dup]])
                ),
            }
        )

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        # presence by payload validity (payloads are never null in either
        # snapshot; the shared key column `k` is non-null for both sides)
        old_p = df["pr_u2"].notna().to_numpy()
        new_p = df["pr_u2_new"].notna().to_numpy()
        status = np.where(
            ~old_p & new_p,
            "added",
            np.where(
                old_p & ~new_p,
                "removed",
                np.where(
                    (df["st"] != df["st_new"]) | (df["pr_u2"] != df["pr_u2_new"]),
                    "changed",
                    "unchanged",
                ),
            ),
        )
        red = pd.DataFrame({"status": status}).groupby("status", as_index=False).size()
        return pd.DataFrame(
            {"status": red["status"], "n": red["size"].astype(np.int64)}
        )

    partials = hash_join(
        base.map_batches(prep, batch_format="pyarrow"),
        base.map_batches(mk_new, batch_format="pyarrow"),
        on="k",
        how="full",
        num_buckets=default_buckets(),
        suffix="_new",
        left_schema=pa.schema({"k": pa.int64(), "st": pa.string(), "pr_u2": pa.int64()}),
        right_schema=pa.schema({"k": pa.int64(), "st": pa.string(), "pr_u2": pa.int64()}),
        bucket_post=classify,
        post_schema=pa.schema({"status": pa.string(), "n": pa.int64()}),
    )
    agg = partials.groupby("status").aggregate(Sum("n", alias_name="n_keys"))
    return agg.sort("status")


@query(
    "incremental_dedup_new_docs",
    sql="""
WITH new_docs AS (
  SELECT doc_id + 2000000 AS doc_id, text FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id, text || ' extra' AS text
  FROM documents WHERE doc_id % 3 = 1
)
SELECT n.doc_id FROM new_docs n
WHERE NOT EXISTS (SELECT 1 FROM documents d WHERE d.text = n.text)
ORDER BY n.doc_id
""",
)
def incremental_dedup_new_docs(sf_dir: str) -> ray.data.Dataset:
    """INCREMENTAL ingestion dedup: drop arriving documents whose text
    already exists in the standing corpus WITHOUT re-deduping the corpus —
    one bucketed ANTI join keyed on the text itself (exact semantics, no
    hash-collision caveat; the corpus side ships only its key column).
    The arriving batch is derived from the corpus (exact copies of
    %3==0 docs must drop; '+extra' variants of %3==1 docs must survive)
    so the oracle reproduces it."""
    docs = read_docs(sf_dir, columns=["doc_id", "text"])

    def mk_new(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        dup_m = ids % 3 == 0
        new_m = ids % 3 == 1
        dup = t.filter(pa.array(dup_m))
        new = t.filter(pa.array(new_m))
        return pa.table(
            {
                "doc_id": pa.array(
                    np.concatenate(
                        [
                            dup["doc_id"].to_numpy(zero_copy_only=False) + 2_000_000,
                            new["doc_id"].to_numpy(zero_copy_only=False) + 2_000_000,
                        ]
                    )
                ),
                "text": pa.chunked_array(
                    [
                        dup["text"].combine_chunks().cast(pa.string()),
                        pc.binary_join_element_wise(
                            new["text"].combine_chunks().cast(pa.string()),
                            "extra",
                            " ",
                        ),
                    ]
                ),
            }
        )

    fresh = hash_join(
        docs.map_batches(mk_new, batch_format="pyarrow"),
        docs.map_batches(lambda t: t.select(["text"]), batch_format="pyarrow"),
        on="text",
        how="anti",
        num_buckets=default_buckets(),
        left_schema=pa.schema({"doc_id": pa.int64(), "text": pa.string()}),
        right_schema=pa.schema({"text": pa.string()}),
    )
    return fresh.map_batches(
        lambda t: t.select(["doc_id"]), batch_format="pyarrow"
    ).sort("doc_id")


_WAV_SQL = """
WITH src AS (SELECT doc_id AS d, string_split(text, ' ') AS ws FROM documents),
w AS (SELECT d, generate_subscripts(ws, 1) AS i FROM src),
spans AS (SELECT d, (i - 1) // 8 AS si FROM w GROUP BY d, (i - 1) // 8),
media AS (
  SELECT d, si, (d * 1000 + si) % 9973 AS m FROM spans
  WHERE (d + si) % 7 <> 0 AND (d + si) % 5 = 3
),
idx AS (SELECT unnest(generate_series(0, 63)) AS i),
amp AS (
  SELECT d, m, ((m * 53 + 17 * i) % 4001) - 2000 AS a
  FROM media CROSS JOIN idx
)
SELECT printf('doc-%08d', d) AS doc_id, printf('m-%d', m) AS media_ref,
  CAST(64 AS BIGINT) AS n_samples, CAST(8000 AS BIGINT) AS sample_rate,
  CAST(SUM(a) AS BIGINT) AS sum_amp, CAST(SUM(a * a) AS BIGINT) AS sum_sq
FROM amp GROUP BY d, m
"""


@query("media_wav_features", sql=_WAV_SQL)
def media_wav_features(sf_dir: str) -> ray.data.Dataset:
    """REAL audio decode path (the WAV sibling of ``media_ppm_features``):
    media spans carry genuine RIFF/PCM16 payloads, and ``WavDecoder``
    walks the RIFF chunks (magic + fmt validation, pad-byte handling)
    before computing integer-exact clip statistics — a chunk-offset or
    endianness bug fails the oracle."""
    from ocr_ray.stages.media import WavDecoder, attach_wav_payloads

    return _media_codec_pipeline(sf_dir, attach_wav_payloads, WavDecoder)


_ADPCM_SQL = """
WITH RECURSIVE
src AS (SELECT doc_id AS d, string_split(text, ' ') AS ws FROM documents),
w AS (SELECT d, generate_subscripts(ws, 1) AS i FROM src),
spans AS (SELECT d, (i - 1) // 8 AS si FROM w GROUP BY d, (i - 1) // 8),
media AS (
  SELECT d, si, (d * 1000 + si) % 9973 AS m FROM spans
  WHERE (d + si) % 7 <> 0 AND (d + si) % 5 = 3
),
-- Full IMA-ADPCM encode+decode chain as a recursive CTE: the decoder's
-- output sample IS the updated predictor, and encoder/decoder state stay
-- in lockstep, so one (pred, idx) state per (doc, media) suffices.
st AS (
  SELECT d, m, 0 AS i,
         CAST(((m*59) % 4001) - 2000 AS BIGINT) AS pred,
         CAST(0 AS BIGINT) AS idx,
         CAST(((m*59) % 4001) - 2000 AS BIGINT) AS acc,
         CAST((((m*59) % 4001) - 2000) * (((m*59) % 4001) - 2000) AS BIGINT) AS acc2
  FROM media
  UNION ALL
  SELECT d, m, i, pred, idx, acc + pred, acc2 + pred*pred FROM (
    SELECT d, m, i,
      CASE WHEN sgn = 1 THEN GREATEST(-32768, pred - vpdiff)
           ELSE LEAST(32767, pred + vpdiff) END AS pred,
      LEAST(88, GREATEST(0, idx + ([-1,-1,-1,-1,2,4,6,8])[4*b4 + 2*b2 + b1 + 1])) AS idx,
      acc, acc2
    FROM (
      SELECT *, (step >> 3) + b4*step + b2*(step >> 1) + b1*(step >> 2) AS vpdiff
      FROM (
        SELECT *, CASE WHEN ad2 >= (step >> 2) THEN 1 ELSE 0 END AS b1
        FROM (
          SELECT *, CASE WHEN ad1 >= (step >> 1) THEN 1 ELSE 0 END AS b2,
                 ad1 - CASE WHEN ad1 >= (step >> 1) THEN step >> 1 ELSE 0 END AS ad2
          FROM (
            SELECT *, CASE WHEN ad >= step THEN 1 ELSE 0 END AS b4,
                   ad - CASE WHEN ad >= step THEN step ELSE 0 END AS ad1
            FROM (
              SELECT d, m, i + 1 AS i, pred, idx, acc, acc2,
                     ([7,8,9,10,11,12,13,14,16,17,19,21,23,25,28,31,34,37,41,45,50,55,60,66,73,80,88,97,107,118,130,143,157,173,190,209,230,253,279,307,337,371,408,449,494,544,598,658,724,796,876,963,1060,1166,1282,1411,1552,1707,1878,2066,2272,2499,2749,3024,3327,3660,4026,4428,4871,5358,5894,6484,7132,7845,8630,9493,10442,11487,12635,13899,15289,16818,18500,20350,22385,24623,27086,29794,32767])[idx + 1] AS step,
                     CASE WHEN s - pred < 0 THEN 1 ELSE 0 END AS sgn,
                     ABS(s - pred) AS ad
              FROM (
                SELECT *, ((m*59 + 23*(i+1)) % 4001) - 2000 AS s
                FROM st WHERE i < 63
              )
            )
          )
        )
      )
    )
  )
)
SELECT printf('doc-%08d', d) AS doc_id, printf('m-%d', m) AS media_ref,
  CAST(64 AS BIGINT) AS n_samples, acc AS sum_amp, acc2 AS sum_sq
FROM st WHERE i = 63
"""


@query("media_adpcm_features", sql=_ADPCM_SQL)
def media_adpcm_features(sf_dir: str) -> ray.data.Dataset:
    """REAL compressed-audio decode path: media spans carry genuine
    IMA/DVI ADPCM WAV payloads (format tag 0x11: fmt extension +
    mandatory fact chunk, IMA block header, low-nibble-first 4-bit codes
    -- ``stages/adpcm.py``) and the ``AdpcmDecoder`` actor stage runs the
    full adaptive decode, VECTORIZED ACROSS STREAMS (lockstep state
    vectors, one pass over the sample axis). The oracle reproduces the
    ENTIRE stateful encode+decode chain as a recursive CTE (step/index
    tables, clamps, sign handling), so the decoded statistics are
    bit-exact end to end despite the codec being lossy and adaptive --
    a nibble-packing, table, clamp, or container bug fails the hash."""
    from ocr_ray.stages.adpcm import AdpcmDecoder, attach_adpcm_payloads

    return _media_codec_pipeline(sf_dir, attach_adpcm_payloads, AdpcmDecoder)


@query("media_flac_features", sql=_WAV_SQL)
def media_flac_features(sf_dir: str) -> ray.data.Dataset:
    """REAL lossless-audio decode path: media spans carry genuine FLAC
    payloads (fixed-predictor subset: 14-bit frame sync, UTF-8 frame
    numbers, CRC-8 + CRC-16 verified, Rice-coded residuals --
    ``stages/flac.py``) and the ``FlacDecoder`` actor stage runs the full
    bit-level decode. Because FLAC is LOSSLESS the oracle is the
    raw-signal stats SQL itself (shared with the uncompressed WAV leg):
    any bug in zigzag/unary/warmup/predictor-reconstruction/bit packing
    yields different samples and fails the hash -- losslessness IS the
    oracle, no codec-state CTE needed."""
    from ocr_ray.stages.flac import FlacDecoder, attach_flac_payloads

    return _media_codec_pipeline(sf_dir, attach_flac_payloads, FlacDecoder)


_WALSH_SQL = """
WITH src AS (SELECT doc_id AS d, string_split(text, ' ') AS ws FROM documents),
w AS (SELECT d, generate_subscripts(ws, 1) AS i FROM src),
spans AS (SELECT d, (i - 1) // 8 AS si FROM w GROUP BY d, (i - 1) // 8),
media AS (
  SELECT d, si, (d * 1000 + si) % 9973 AS m FROM spans
  WHERE (d + si) % 7 <> 0 AND (d + si) % 5 = 3
),
idx AS (SELECT unnest(generate_series(0, 63)) AS i),
amp AS (
  SELECT d, m, i, ((m * 53 + 17 * i) % 4001) - 2000 AS a
  FROM media CROSS JOIN idx
)
SELECT printf('doc-%08d', d) AS doc_id, printf('m-%d', m) AS media_ref,
  CAST(SUM(a * (1 - 2 * ((i >> 0) & 1))) AS BIGINT) AS walsh_b0,
  CAST(SUM(a * (1 - 2 * ((i >> 1) & 1))) AS BIGINT) AS walsh_b1,
  CAST(SUM(a * (1 - 2 * ((i >> 2) & 1))) AS BIGINT) AS walsh_b2
FROM amp GROUP BY d, m
"""


@query("media_walsh_features", sql=_WALSH_SQL)
def media_walsh_features(sf_dir: str) -> ray.data.Dataset:
    """Frequency-domain audio features over REAL decoded WAV clips:
    Walsh–Hadamard sequency correlates (square-wave basis, sign flip
    every 2^k samples) computed from the RIFF-parsed PCM — the
    integer-exact analogue of DFT-bin energies, which makes a SPECTRAL
    feature oracle-checkable bit-exact (a float FFT never is, from
    summation-order ulp drift alone). Decode is the same actor-pool
    chunk-walking parser as ``media_wav_features``; the correlates are
    one (n, 64) x (64, 3) integer matmul per batch."""
    from ocr_ray.stages.media import WalshDecoder, attach_wav_payloads

    return _media_codec_pipeline(sf_dir, attach_wav_payloads, WalshDecoder)


_Y4M_SQL = """
WITH src AS (SELECT doc_id AS d, string_split(text, ' ') AS ws FROM documents),
w AS (SELECT d, generate_subscripts(ws, 1) AS i FROM src),
spans AS (SELECT d, (i - 1) // 8 AS si FROM w GROUP BY d, (i - 1) // 8),
media AS (
  SELECT d, si, (d * 1000 + si) % 9973 AS m FROM spans
  WHERE (d + si) % 7 <> 0 AND (d + si) % 5 = 3
),
px AS (SELECT unnest(generate_series(0, 7)) AS x),
py AS (SELECT unnest(generate_series(0, 3)) AS y),
pf AS (SELECT unnest(generate_series(0, 4)) AS f),
luma AS (
  SELECT d, m, pf.f AS f, (m * 41 + 19 * pf.f + 13 * py.y + 7 * px.x) % 256 AS v
  FROM media CROSS JOIN px CROSS JOIN py CROSS JOIN pf
)
SELECT printf('doc-%08d', d) AS doc_id, printf('m-%d', m) AS media_ref,
  CAST(5 AS BIGINT) AS n_frames, CAST(8 AS BIGINT) AS width, CAST(4 AS BIGINT) AS height,
  CAST(25 AS BIGINT) AS fps_num,
  CAST(SUM(v) AS BIGINT) AS luma_sum,
  CAST(SUM(CASE WHEN f = 0 THEN v ELSE 0 END) AS BIGINT) AS luma_sum_first,
  CAST(SUM(CASE WHEN f = 4 THEN v ELSE 0 END) AS BIGINT) AS luma_sum_last
FROM luma GROUP BY d, m
"""


@query("media_y4m_features", sql=_Y4M_SQL)
def media_y4m_features(sf_dir: str) -> ray.data.Dataset:
    """REAL video decode path (the Y4M sibling of ``media_ppm_features`` /
    ``media_wav_features``, completing the image/audio/video trio): media
    spans carry genuine YUV4MPEG2 clips (5 frames, C420), and
    ``Y4mDecoder`` parses the stream header tags + per-FRAME markers and
    strides the 4:2:0 planes before computing integer-exact luma
    statistics — a plane-offset or frame-stride bug fails the oracle."""
    from ocr_ray.stages.media import Y4mDecoder, attach_y4m_payloads

    return _media_codec_pipeline(sf_dir, attach_y4m_payloads, Y4mDecoder)




_WAV_DECIMATE_SQL = """
WITH src AS (SELECT doc_id AS d, string_split(text, ' ') AS ws FROM documents),
w AS (SELECT d, generate_subscripts(ws, 1) AS i FROM src),
spans AS (SELECT d, (i - 1) // 8 AS si FROM w GROUP BY d, (i - 1) // 8),
media AS (
  SELECT d, si, (d * 1000 + si) % 9973 AS m FROM spans
  WHERE (d + si) % 7 <> 0 AND (d + si) % 5 = 3
),
idx AS (SELECT unnest(generate_series(0, 31)) AS i),
pair AS (
  SELECT d, m, i,
    (((m * 53 + 17 * (2 * i)) % 4001) - 2000) AS a,
    (((m * 53 + 17 * (2 * i + 1)) % 4001) - 2000) AS b
  FROM media CROSS JOIN idx
),
dec AS (SELECT d, m, (a + b) // 2 AS v FROM pair)
SELECT printf('doc-%08d', d) AS doc_id, printf('m-%d', m) AS media_ref,
  CAST(32 AS BIGINT) AS n_samples,
  CAST(SUM(v) AS BIGINT) AS sum_amp, CAST(SUM(v * v) AS BIGINT) AS sum_sq
FROM dec GROUP BY d, m
"""


@query("media_wav_decimated_features", sql=_WAV_DECIMATE_SQL)
def media_wav_decimated_features(sf_dir: str) -> ray.data.Dataset:
    """Audio RESAMPLING leg (the 16k->8k step every speech pipeline
    runs): real WAV decode, then decimate-by-2 with pair averaging
    (truncating integer mean — matching SQL ``//`` semantics exactly,
    which floor-div numpy would NOT) and integer-exact stats over the
    halved-rate clip. The oracle reproduces the decimator arithmetic, so
    an off-by-one in pairing, a floor-vs-trunc slip, or a tail-sample
    mishandling fails the hash."""
    from ocr_ray.stages.media import WavDecoder, attach_wav_payloads, decode_wav

    class DecimatingDecoder:
        """Actor-pool stage: WAV decode + 2:1 decimation + clip stats."""

        def __call__(self, batch: pa.Table) -> pa.Table:
            n_l, s_l, ss_l = [], [], []
            for buf in batch["payload"].to_pylist():
                x, _sr = decode_wav(buf)
                xi = x.astype(np.int64)
                pairs = xi[: len(xi) - (len(xi) % 2)].reshape(-1, 2)
                s = pairs.sum(axis=1)
                # truncating mean (SQL // semantics), not numpy floor-div
                dec = np.sign(s) * (np.abs(s) // 2)
                n_l.append(len(dec))
                s_l.append(int(dec.sum()))
                ss_l.append(int((dec * dec).sum()))
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "media_ref": batch["media_ref"],
                    "n_samples": pa.array(np.asarray(n_l, dtype=np.int64)),
                    "sum_amp": pa.array(np.asarray(s_l, dtype=np.int64)),
                    "sum_sq": pa.array(np.asarray(ss_l, dtype=np.int64)),
                }
            )

    return _media_codec_pipeline(sf_dir, attach_wav_payloads, DecimatingDecoder)


_BMP_SQL = """
WITH src AS (SELECT doc_id AS d, string_split(text, ' ') AS ws FROM documents),
w AS (SELECT d, generate_subscripts(ws, 1) AS i FROM src),
spans AS (SELECT d, (i - 1) // 8 AS si FROM w GROUP BY d, (i - 1) // 8),
media AS (
  SELECT d, si, (d * 1000 + si) % 9973 AS m FROM spans
  WHERE (d + si) % 7 <> 0 AND (d + si) % 5 = 3
),
px AS (SELECT unnest(generate_series(0, 17)) AS x),
py AS (SELECT unnest(generate_series(0, 5)) AS y),
bytes AS (
  SELECT d, m, c.ch AS ch, (m * 43 + 7 + 19 * py.y + 11 * px.x + 23 * c.ch) % 256 AS val
  FROM media CROSS JOIN px CROSS JOIN py
  CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS ch) c
),
feat AS (
  SELECT d, m, ch, CAST(SUM(val) AS DOUBLE) / 108.0 AS mu
  FROM bytes GROUP BY d, m, ch
)
SELECT printf('doc-%08d', d) AS doc_id, printf('m-%d', m) AS media_ref,
  CAST(18 AS BIGINT) AS width, CAST(6 AS BIGINT) AS height,
  MAX(CASE WHEN ch = 0 THEN mu END) AS mean_r,
  MAX(CASE WHEN ch = 1 THEN mu END) AS mean_g,
  MAX(CASE WHEN ch = 2 THEN mu END) AS mean_b
FROM feat GROUP BY d, m
"""


@query("media_bmp_features", sql=_BMP_SQL)
def media_bmp_features(sf_dir: str) -> ray.data.Dataset:
    """REAL image decode path #3: BMP (24-bit uncompressed DIB). The
    quirks are disjoint from PPM/PNG — BGR channel order, BOTTOM-UP row
    storage, and 4-byte row padding (fixture width 18 px -> 54-byte rows
    padded to 56, so a stride bug cannot pass) — and ``BmpDecoder`` runs
    a genuine parser: magic/header/bpp/compression validation, pixel
    offset honored, signed height for both row orders, padding strip,
    BGR swap. Closed-form test image, decoded channel means
    oracle-checked bit-exact (``stages/bmp.py``)."""
    from ocr_ray.stages.bmp import BmpDecoder, attach_bmp_payloads

    return _media_codec_pipeline(sf_dir, attach_bmp_payloads, BmpDecoder)


_PHASH_SQL = """
WITH src AS (SELECT doc_id AS d, string_split(text, ' ') AS ws FROM documents),
w AS (SELECT d, generate_subscripts(ws, 1) AS i FROM src),
spans AS (SELECT d, (i - 1) // 8 AS si FROM w GROUP BY d, (i - 1) // 8),
media AS (
  SELECT d, si, (d * 1000 + si) % 9973 AS m FROM spans
  WHERE (d + si) % 7 <> 0 AND (d + si) % 5 = 3
),
ms AS (SELECT m, COUNT(*) AS n_spans FROM media GROUP BY m),
px AS (SELECT unnest(generate_series(0, 15)) AS x),
py AS (SELECT unnest(generate_series(0, 7)) AS y),
gray AS (
  SELECT ms.m, py.y, px.x,
    ((ms.m * 37 + 11 + 13 * py.y + 7 * px.x) % 256
     + (ms.m * 37 + 11 + 13 * py.y + 7 * px.x + 29) % 256
     + (ms.m * 37 + 11 + 13 * py.y + 7 * px.x + 58) % 256) // 3 AS g
  FROM ms CROSS JOIN px CROSS JOIN py
),
bits AS (
  SELECT a.m, a.y * 15 + a.x AS k,
    CASE WHEN b.g > a.g THEN 1 ELSE 0 END AS bit
  FROM gray a JOIN gray b ON b.m = a.m AND b.y = a.y AND b.x = a.x + 1
  WHERE a.x < 15
),
hashes AS (
  SELECT m,
    CAST(SUM(CASE WHEN k < 60 THEN bit * (1::BIGINT << k) ELSE 0 END) AS BIGINT)
      AS dhash_lo,
    CAST(SUM(CASE WHEN k >= 60 THEN bit * (1::BIGINT << (k - 60)) ELSE 0 END) AS BIGINT)
      AS dhash_hi
  FROM bits GROUP BY m
)
SELECT h.dhash_lo, h.dhash_hi,
  CAST(COUNT(*) AS BIGINT) AS n_images,
  CAST(SUM(s.n_spans) AS BIGINT) AS n_spans,
  CAST(MIN(h.m) AS BIGINT) AS canonical_m
FROM hashes h JOIN ms s ON s.m = h.m
GROUP BY h.dhash_lo, h.dhash_hi
"""


@query("media_phash_dedup", sql=_PHASH_SQL)
def media_phash_dedup(sf_dir: str) -> ray.data.Dataset:
    """MULTIMODAL dedup by perceptual hash: every media span's PPM
    payload is REALLY decoded and difference-hashed (16x8 grayscale,
    one bit per horizontal neighbor pair), and images collapse into
    dedup groups by exact dHash — the image-level analogue of the text
    dedup family (the corpus's image generator cycles mod 256, so
    distinct media_refs genuinely collide into shared groups). Output
    per group: the 120-bit hash (two int64 words), distinct-image and
    total-span counts, canonical (min) image id.

    Distributed shape: actor-pool decode+hash (one row per span), a
    first m-keyed bucketed fold (span counts per image, one hash per
    image), then a hash-keyed bucketed fold for the groups — pairs <<
    corpus at every step. The oracle replays pixel synthesis, integer
    grayscale, bit packing, and both folds in SQL, so a decode, hash,
    or grouping bug breaks the value hash."""
    from ocr_ray.functions.relational import bucketed_aggregate
    from ocr_ray.stages.media import PpmDHashDecoder, attach_ppm_payloads

    spans = _media_codec_pipeline(sf_dir, attach_ppm_payloads, PpmDHashDecoder)

    per_image = bucketed_aggregate(
        spans,
        keys=["m"],
        aggs={
            "n_spans": ("m", "size"),
            "dhash_lo": ("dhash_lo", "min"),
            "dhash_hi": ("dhash_hi", "min"),
        },
    )
    groups = bucketed_aggregate(
        per_image,
        keys=["dhash_lo", "dhash_hi"],
        aggs={
            "n_images": ("m", "size"),
            "n_spans": ("n_spans", "sum"),
            "canonical_m": ("m", "min"),
        },
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "dhash_lo": pc.cast(t["dhash_lo"], pa.int64()),
                "dhash_hi": pc.cast(t["dhash_hi"], pa.int64()),
                "n_images": pc.cast(t["n_images"], pa.int64()),
                "n_spans": pc.cast(t["n_spans"], pa.int64()),
                "canonical_m": pc.cast(t["canonical_m"], pa.int64()),
            }
        )

    return groups.map_batches(finalize, batch_format="pyarrow")


_AFP_SQL = """
WITH src AS (SELECT doc_id AS d, string_split(text, ' ') AS ws FROM documents),
w AS (SELECT d, generate_subscripts(ws, 1) AS i FROM src),
spans AS (SELECT d, (i - 1) // 8 AS si FROM w GROUP BY d, (i - 1) // 8),
media AS (
  SELECT d, si, (d * 1000 + si) % 9973 AS m FROM spans
  WHERE (d + si) % 7 <> 0 AND (d + si) % 5 = 3
),
ms AS (SELECT m, COUNT(*) AS n_spans FROM media GROUP BY m),
idx AS (SELECT unnest(generate_series(0, 63)) AS i),
samp AS (
  SELECT ms.m, idx.i, ((ms.m * 53 + 17 * idx.i) % 4001) - 2000 AS s
  FROM ms CROSS JOIN idx
),
frames AS (
  SELECT m, i // 4 AS f, SUM(s * s) AS energy FROM samp GROUP BY m, i // 4
),
bits AS (
  SELECT a.m, a.f AS k, CASE WHEN b.energy > a.energy THEN 1 ELSE 0 END AS bit
  FROM frames a JOIN frames b ON b.m = a.m AND b.f = a.f + 1
  WHERE a.f < 15
),
fp AS (
  SELECT m, CAST(SUM(bit * (1::BIGINT << k)) AS BIGINT) AS afp
  FROM bits GROUP BY m
)
SELECT f.afp,
  CAST(COUNT(*) AS BIGINT) AS n_clips,
  CAST(SUM(s.n_spans) AS BIGINT) AS n_spans,
  CAST(MIN(f.m) AS BIGINT) AS canonical_m
FROM fp f JOIN ms s ON s.m = f.m
GROUP BY f.afp
"""


@query("media_audio_fingerprint_dedup", sql=_AFP_SQL)
def media_audio_fingerprint_dedup(sf_dir: str) -> ray.data.Dataset:
    """AUDIO dedup by acoustic fingerprint — the WAV sibling of
    ``media_phash_dedup``: every media span's RIFF/PCM payload is REALLY
    decoded and energy-contour hashed (16 integer frame energies, one
    bit per adjacent pair), and clips collapse into dedup groups by
    exact fingerprint (the generator cycles mod 4001, so distinct
    media_refs genuinely share audio). Same two bucketed folds as the
    image leg; the oracle replays signal synthesis, frame energies, bit
    packing, and both folds in SQL."""
    from ocr_ray.functions.relational import bucketed_aggregate
    from ocr_ray.stages.media import WavFingerprintDecoder, attach_wav_payloads

    spans = _media_codec_pipeline(sf_dir, attach_wav_payloads, WavFingerprintDecoder)

    per_clip = bucketed_aggregate(
        spans,
        keys=["m"],
        aggs={"n_spans": ("m", "size"), "afp": ("afp", "min")},
    )
    groups = bucketed_aggregate(
        per_clip,
        keys=["afp"],
        aggs={
            "n_clips": ("m", "size"),
            "n_spans": ("n_spans", "sum"),
            "canonical_m": ("m", "min"),
        },
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "afp": pc.cast(t["afp"], pa.int64()),
                "n_clips": pc.cast(t["n_clips"], pa.int64()),
                "n_spans": pc.cast(t["n_spans"], pa.int64()),
                "canonical_m": pc.cast(t["canonical_m"], pa.int64()),
            }
        )

    return groups.map_batches(finalize, batch_format="pyarrow")


@query(
    "inverted_index_lookup",
    sql="""
WITH s AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
SELECT token, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
FROM s WHERE token IN ('spark', 'join', 'window')
GROUP BY token, doc_id
""",
)
def inverted_index_lookup(sf_dir: str) -> pa.Table:
    """MATERIALIZED inverted index, build + point lookup: one
    corpus-scale tokenize pass writes (token, doc_id, tf) postings
    hash-partitioned by TOKEN through the engine's atomic
    fragment+manifest sink (write-once/query-forever — a committed index
    under /tmp keyed by corpus identity is reused across calls), then a
    3-term lookup plans its scan from the manifest alone: hash(term) % P
    names the only fragment that can hold each term's postings, so the
    query opens <= 3 of the 16 fragments regardless of corpus size
    (asserted in ``index_lookup`` — a pruning regression fails loudly).
    The BM25/phrase entries score on the fly; this is the persisted
    structure a retrieval corpus keeps next to the documents."""
    from ocr_ray.functions.invindex import build_inverted_index, index_lookup
    from ocr_ray.pipelines.queries._shared import store_key, store_root
    from ocr_ray.state.manifest import load_manifest

    docs = read_docs(sf_dir, columns=["doc_id", "text"])
    out_dir = f"{store_root('invindex')}/{store_key(sf_dir, 'documents')}-p16"
    if len(load_manifest(out_dir)) < 16:
        build_inverted_index(docs, out_dir, num_parts=16)
    return index_lookup(out_dir, ["spark", "join", "window"], num_parts=16)


@query(
    "incremental_index_lookup",
    sql="""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
),
s AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM corpus)
SELECT token, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
FROM s WHERE token IN ('spark', 'join', 'window')
GROUP BY token, doc_id
""",
)
def incremental_index_lookup(sf_dir: str) -> pa.Table:
    """INCREMENTAL inverted index — the corpus-grows-by-shards shape: the
    base index is built once over ``documents``; an arriving shard (every
    5th doc re-tagged +1e6, the deterministic synthetic arrival) appends
    its postings as a Lucene-style DELTA generation
    (``functions/invindex.update_inverted_index``) — one map pass + one
    bucket shuffle over the SHARD only, the corpus-scale base fragments
    are never re-read or rewritten. The delta directory becomes visible
    only through its atomic commit-marker registration, so a crashed
    update is invisible rather than half-applied. The lookup
    merges base + delta postings by summing tf per (token, doc_id),
    which the oracle pins bit-exactly to a from-scratch rebuild over the
    unioned corpus. ``compact_inverted_index`` (tested in
    tests/test_invindex.py) folds deltas back to one fragment per
    partition with per-partition shuffle-free merge tasks."""
    from ocr_ray.functions.invindex import (
        build_inverted_index,
        index_lookup,
        update_inverted_index,
    )
    from ocr_ray.state.manifest import load_generations
    from ocr_ray.pipelines.queries._shared import store_key, store_root
    from ocr_ray.state.manifest import load_manifest

    docs = read_docs(sf_dir, columns=["doc_id", "text"])
    out_dir = f"{store_root('invindex_incr')}/{store_key(sf_dir, 'documents')}-p16"
    if len(load_manifest(out_dir)) < 16:
        build_inverted_index(docs, out_dir, num_parts=16)

    if not load_generations(out_dir):
        from ocr_ray.pipelines.queries._shared import arrival_shard_docs

        update_inverted_index(
            docs.map_batches(arrival_shard_docs, batch_format="pyarrow"),
            out_dir,
            num_parts=16,
        )
    return index_lookup(out_dir, ["spark", "join", "window"], num_parts=16)


@query(
    "bm25_index_search",
    sql=_BM25_SC_SQL
    + """
SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT 20
""",
)
def bm25_index_search(sf_dir: str) -> pa.Table:
    """BM25 top-20 SERVED FROM the materialized index — the committed
    postings + doc-length tables + corpus scalars answer the query with
    ZERO corpus reads (``functions/invindex.build_bm25_index`` /
    ``bm25_from_index``); only the query terms' postings fragments and
    the candidates' length buckets are opened. Shares ``bm25_search``'s
    SQL oracle VERBATIM: the scorer replays the identical float op
    sequence on identical operands (df = postings length, dl from the
    lengths table, N/sum_dl from build-time meta), so scores are
    bit-equal to the full-scan leg. The persisted-retrieval sibling of
    ``inverted_index_lookup``."""
    from ocr_ray.functions.invindex import (
        bm25_from_index,
        bm25_index_complete,
        build_bm25_index,
    )
    from ocr_ray.pipelines.queries._shared import store_key, store_root

    docs = read_docs(sf_dir, columns=["doc_id", "text"])
    out_dir = f"{store_root('bm25index')}/{store_key(sf_dir, 'documents')}-p16"
    if not bm25_index_complete(out_dir, 16):
        build_bm25_index(docs, out_dir, num_parts=16)
    return bm25_from_index(out_dir, ["spark", "join", "window"], k=20, num_parts=16)


# bm25 scoring CTEs over the GROWN corpus (base ∪ the deterministic
# arriving shard: every 5th doc re-tagged +1e6) — the incremental-BM25
# oracle is the full-scan formula over the union, which the layered
# index store must reproduce bit-exactly.
_BM25_INCR_SQL = _BM25_SC_SQL.replace(
    "WITH s AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),",
    """WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
),
s AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM corpus),""",
)
assert "FROM corpus" in _BM25_INCR_SQL  # replace() must have matched


@query(
    "incremental_bm25_search",
    sql=_BM25_INCR_SQL
    + """
SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT 20
""",
)
def incremental_bm25_search(sf_dir: str) -> pa.Table:
    """BM25 over a GROWING corpus with no rebuild and no corpus
    re-reads: the base store is built once over ``documents``; the
    arriving shard (every 5th doc re-tagged +1e6) is appended as a
    delta generation (``functions/invindex.update_bm25_index`` — its
    own meta + postings + lengths mini-store, one atomic root
    registration). Query-time scoring sums the layers' integer metas
    (N, sum_dl — so avgdl and every idf equal a from-scratch rebuild
    exactly), reads the query terms' postings fragments from every
    layer, and scores per doc-bucket with the same distributed
    partial-top-k plan as ``bm25_index_search``. The oracle is the
    full-scan BM25 formula over the unioned corpus — bit-exact, which
    pins df/dl/N accounting across layers. The duplicate-doc-id guard
    makes a shard that re-ingests an existing doc fail loudly instead
    of silently mis-scoring."""
    from ocr_ray.functions.invindex import (
        bm25_from_index,
        bm25_index_complete,
        build_bm25_index,
        update_bm25_index,
    )
    from ocr_ray.state.manifest import load_generations
    from ocr_ray.pipelines.queries._shared import store_key, store_root

    docs = read_docs(sf_dir, columns=["doc_id", "text"])
    out_dir = f"{store_root('bm25index_incr')}/{store_key(sf_dir, 'documents')}-p16"
    if not bm25_index_complete(out_dir, 16):
        build_bm25_index(docs, out_dir, num_parts=16)

    if not load_generations(out_dir):
        from ocr_ray.pipelines.queries._shared import arrival_shard_docs

        update_bm25_index(
            docs.map_batches(arrival_shard_docs, batch_format="pyarrow"),
            out_dir,
            num_parts=16,
        )
    return bm25_from_index(out_dir, ["spark", "join", "window"], k=20, num_parts=16)
