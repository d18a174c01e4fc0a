"""Query registry section: dedup (split from the former monolithic queries.py)."""

from __future__ import annotations


import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


from ocr_ray.pipelines.queries._shared import query, read_docs


# ---------------------------------------------------------------------------
# Deduplication suite (documents +- derived duplicate populations)
# ---------------------------------------------------------------------------


@query(
    "exact_dedup_docs",
    sql="""
WITH u AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000, text FROM documents
)
SELECT doc_id, md5(text) AS content_md5 FROM u
QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
""",
)
def exact_dedup_docs(sf_dir: str) -> ray.data.Dataset:
    """Exact dedup (hash-partition + first-per-key) over a corpus seeded
    with exact duplicate copies (doc_id + 2e6)."""
    from ocr_ray.functions.dedup import add_md5, dedup_by_key

    def dup_union(t: pa.Table) -> pa.Table:
        shifted = pc.add(t["doc_id"], pa.scalar(2_000_000, type=pa.int64()))
        both = pa.concat_tables([t, t.set_column(t.column_names.index("doc_id"), "doc_id", shifted)])
        return both

    def pre(t: pa.Table) -> pa.Table:
        # project text away and pre-dedup WITHIN the batch (min doc_id per
        # hash) before the shuffle: global first-per-key is the min of
        # batch mins, so the shuffle carries one row per distinct hash per
        # batch instead of every row + its text payload.
        part = (
            t.select(["doc_id", "content_md5"])
            .group_by(["content_md5"])
            .aggregate([("doc_id", "min")])
        )
        return pa.table(
            {"doc_id": part["doc_id_min"], "content_md5": part["content_md5"]}
        )

    ds = (
        read_docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(dup_union, batch_format="pyarrow")
        .map_batches(add_md5, batch_format="pyarrow")
        .map_batches(pre, batch_format="pyarrow")
    )
    out = dedup_by_key(ds, key="content_md5", order="doc_id", num_buckets=8)
    return out.map_batches(
        lambda t: t.select(["doc_id", "content_md5"]), batch_format="pyarrow"
    )


@query(
    "prefix_dedup_docs",
    sql="""
SELECT doc_id FROM documents
QUALIFY row_number() OVER (
  PARTITION BY array_to_string(list_slice(string_split(text, ' '), 1, 5), ' ')
  ORDER BY doc_id) = 1
""",
)
def prefix_dedup_docs(sf_dir: str) -> ray.data.Dataset:
    """Key-based near-dedup: first-5-words prefix key (real duplicate keys
    exist in the corpus), vectorized key extraction."""
    from ocr_ray.functions.dedup import dedup_by_key

    def keyed(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        prefix = pc.binary_join(pc.list_slice(toks, 0, 5), " ")
        return pa.table({"doc_id": t["doc_id"], "prefix_key": prefix})

    ds = read_docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        keyed, batch_format="pyarrow"
    )
    out = dedup_by_key(ds, key="prefix_key", order="doc_id", num_buckets=8)
    return out.map_batches(lambda t: t.select(["doc_id"]), batch_format="pyarrow")


@query(
    "substring_dedup_docs",
    sql="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
wins AS (
  SELECT doc_id, array_to_string(w[gs.n+1 : gs.n+32], ' ') AS chunk
  FROM toks, LATERAL (SELECT unnest(range(0, greatest(len(w)-16, 1), 16)) AS n) gs
),
c AS (SELECT doc_id, COUNT(*) OVER (PARTITION BY chunk) AS occ FROM wins)
SELECT doc_id,
  CAST(COUNT(*) AS BIGINT) AS total_windows,
  CAST(COUNT(*) FILTER (WHERE occ >= 2) AS BIGINT) AS dup_windows,
  CAST(COUNT(*) FILTER (WHERE occ >= 2) AS DOUBLE) / COUNT(*) AS dup_fraction
FROM c GROUP BY doc_id
""",
)
def substring_dedup_docs(sf_dir: str) -> ray.data.Dataset:
    """Substring-level exact-dedup signal (the training-data dedup of
    Lee et al., *Deduplicating Training Data Makes Language Models
    Better*): per document, the count and fraction of its 32-token
    stride-16 windows whose text occurs at least twice anywhere in the
    corpus — the gate a curation pipeline uses to drop or trim
    boilerplate-heavy documents that exact/MinHash doc-level dedup
    misses.

    Distributed shape: chunk strings never leave the expansion worker —
    each batch reduces to (doc_id, chunk-hash) rows, bucketed by hash so
    every occurrence of a chunk lands in one bucket, counted per hash
    within the bucket (vectorized ``np.unique``), pre-combined to
    per-(bucket, doc) partials, then finished with one small
    groupby-sum on doc_id. Two key-hash shuffles; shuffle payload is
    ~16 bytes per window regardless of chunk length. Window equality is
    by 64-bit content hash (collision-free at test scale; swap in a
    128-bit mix at 10^12-doc scale)."""
    from ray.data.aggregate import Sum

    from ocr_ray.functions.hashing import hash_utf8_column
    from ocr_ray.functions.text import token_windows

    B = 32  # scale note: derive from input bytes (sizing.buckets_for_input)

    def win_hashes(t: pa.Table) -> pa.Table:
        w = token_windows(t, window=32, stride=16)
        h = hash_utf8_column(w["chunk"])
        return pa.table(
            {
                "doc_id": w["doc_id"],
                "h": pa.array(h),
                "_bucket": pa.array((h % np.uint64(B)).astype(np.int32)),
            }
        )

    def bucket_body(g: pd.DataFrame) -> pd.DataFrame:
        h = g["h"].to_numpy()
        _, inv, cnt = np.unique(h, return_inverse=True, return_counts=True)
        dup = (cnt[inv] >= 2).astype(np.int64)
        du, dinv = np.unique(g["doc_id"].to_numpy(), return_inverse=True)
        return pd.DataFrame(
            {
                "doc_id": du,
                "dup": np.bincount(dinv, weights=dup).astype(np.int64),
                "tot": np.bincount(dinv).astype(np.int64),
            }
        )

    ds = read_docs(sf_dir, columns=["doc_id", "text"])
    partials = (
        ds.map_batches(win_hashes, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(bucket_body, batch_format="pandas")
    )
    # per-doc: key cardinality scales with the corpus -> bucketed fold
    from ocr_ray.functions.relational import bucketed_aggregate

    agg = bucketed_aggregate(
        partials, keys=["doc_id"], aggs={"dup": ("dup", "sum"), "tot": ("tot", "sum")}
    )

    def finish(t: pa.Table) -> pa.Table:
        dup = t["dup"].to_numpy(zero_copy_only=False).astype(np.int64)
        tot = t["tot"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "total_windows": pa.array(tot),
                "dup_windows": pa.array(dup),
                "dup_fraction": pa.array(dup.astype(np.float64) / tot),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def _verified_pairs(ds_docs, cand_pairs, *, tau: float) -> ray.data.Dataset:
    """DISTRIBUTED exact-Jaccard verification of candidate pairs — no
    driver-side materialization of candidates anywhere (the round-1
    ``to_pandas`` + driver Jaccard was the ``*_pairs`` family's 100 TB
    scale-killer; web corpora with boilerplate-heavy near-dup clusters
    violate the "pairs << corpus" assumption it leaned on).

    Pipeline: candidate pairs (duplicates fine) + per-doc unique-sorted
    shingle signatures -> :func:`attach_verify_pairs` — TWO bucketed
    shuffles with all-Arrow bucket bodies (shuffle 1 dedups pairs and
    attaches each side's signature grouped by doc bucket; shuffle 2
    regroups by pair bucket and runs the vectorized set-Jaccard). Pairs
    stay distributed from candidate generation to the final tau filter.
    """
    from ocr_ray.functions.dedup import attach_verify_pairs, doc_shingle_lists

    sigs = ds_docs.map_batches(doc_shingle_lists, batch_format="pyarrow")
    return attach_verify_pairs(cand_pairs, sigs, tau=tau)


def _minhash_perm_values() -> str:
    """The 64 (a, b) permutation constants as SQL VALUES rows — generated
    from the same seeded RNG as ``functions/dedup._perm_params`` so the
    oracle's permutations are the implementation's by construction."""
    rng = np.random.default_rng(0x5EED)
    a = rng.integers(1, 1 << 61, size=64, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 1 << 61, size=64, dtype=np.uint64)
    return ",\n".join(f"  ({j}, {int(a[j])}, {int(b[j])})" for j in range(64))


# Shared shingle chain over the mutant-union corpus: tokens -> word
# hashes (splitmix64 of a polynomial) -> 3-word shingle Horner combine
# -> per-doc distinct shingle sets + set sizes. All mod-2^64 arithmetic
# uses the HUGEINT split-multiply pattern (see media_frame_samples);
# xor/shift run in UBIGINT. Used by the MinHash-LSH and n-gram-Jaccard
# pair oracles.
_SHINGLE_CHAIN = """
toks0 AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
torig AS (SELECT doc_id, unnest(ws) AS w, unnest(range(1, len(ws)+1)) AS i FROM toks0),
tmut0 AS (SELECT doc_id + 1000000 AS doc_id, w, i FROM torig WHERE i % 10 <> 0),
tmut AS (SELECT doc_id, w, row_number() OVER (PARTITION BY doc_id ORDER BY i) AS i FROM tmut0),
tok AS (SELECT * FROM torig UNION ALL SELECT * FROM tmut),
dt AS (SELECT DISTINCT w FROM tok),
mx AS (SELECT greatest(max(length(w)), 1) AS m FROM dt),
pw AS (
  WITH RECURSIVE pwr(k, p) AS (
    SELECT 0, CAST(1 AS HUGEINT)
    UNION ALL
    SELECT k+1,
      ((p % 4294967296) * 1000003 +
       ((p // 4294967296) * 1000003 % 4294967296) * 4294967296
      ) % '18446744073709551616'::HUGEINT
    FROM pwr, mx WHERE k < mx.m - 1
  ) SELECT * FROM pwr
),
chars AS (
  SELECT w, gs.i, unicode(substr(w, CAST(gs.i + 1 AS INT), 1)) AS c
  FROM dt, LATERAL (SELECT unnest(range(0, CAST(length(w) AS BIGINT))) AS i) gs
),
terms AS (
  SELECT w,
    CAST(CAST(c AS HUGEINT) * pw.p % 4294967296 AS BIGINT) AS lo,
    CAST(CAST(c AS HUGEINT) * pw.p % '18446744073709551616'::HUGEINT // 4294967296 AS BIGINT) AS hi
  FROM chars JOIN pw ON pw.k = chars.i
),
ph AS (
  SELECT d.w,
    CAST(('11400714819323198485'::HUGEINT
      + COALESCE(CAST(SUM(t.lo) AS HUGEINT) + CAST(SUM(t.hi) AS HUGEINT) * 4294967296, 0))
      % '18446744073709551616'::HUGEINT AS UBIGINT) AS h0
  FROM dt d LEFT JOIN terms t ON d.w = t.w GROUP BY d.w
),
s1 AS (SELECT w, xor(h0, h0 >> 30) AS x FROM ph),
s2 AS (SELECT w, CAST((
    CAST(x % 4294967296 AS HUGEINT) * '13787848793156543929'::HUGEINT
    + (CAST(x // 4294967296 AS HUGEINT) * '13787848793156543929'::HUGEINT % 4294967296) * 4294967296
  ) % '18446744073709551616'::HUGEINT AS UBIGINT) AS x FROM s1),
s3 AS (SELECT w, xor(x, x >> 27) AS x FROM s2),
s4 AS (SELECT w, CAST((
    CAST(x % 4294967296 AS HUGEINT) * '10723151780598845931'::HUGEINT
    + (CAST(x // 4294967296 AS HUGEINT) * '10723151780598845931'::HUGEINT % 4294967296) * 4294967296
  ) % '18446744073709551616'::HUGEINT AS UBIGINT) AS x FROM s3),
mh AS (SELECT w, xor(x, x >> 31) AS h FROM s4),
seq AS (SELECT t.doc_id, t.i, m.h FROM tok t JOIN mh m USING (w)),
sh3 AS (
  SELECT doc_id, i, h AS h1,
    lead(h, 1) OVER (PARTITION BY doc_id ORDER BY i) AS h2,
    lead(h, 2) OVER (PARTITION BY doc_id ORDER BY i) AS h3
  FROM seq
),
shmul1 AS (
  SELECT doc_id,
    CAST((CAST(h1 % 4294967296 AS HUGEINT) * '11400714819323198485'::HUGEINT
      + (CAST(h1 // 4294967296 AS HUGEINT) * '11400714819323198485'::HUGEINT % 4294967296) * 4294967296
      + CAST(h2 AS HUGEINT)) % '18446744073709551616'::HUGEINT AS UBIGINT) AS acc, h3
  FROM sh3 WHERE h3 IS NOT NULL
),
shingle AS (
  SELECT doc_id,
    CAST((CAST(acc % 4294967296 AS HUGEINT) * '11400714819323198485'::HUGEINT
      + (CAST(acc // 4294967296 AS HUGEINT) * '11400714819323198485'::HUGEINT % 4294967296) * 4294967296
      + CAST(h3 AS HUGEINT)) % '18446744073709551616'::HUGEINT AS UBIGINT) AS sh
  FROM shmul1
),
dsh AS (SELECT DISTINCT doc_id, sh FROM shingle),
scount AS (SELECT doc_id, count(*) AS ns FROM dsh GROUP BY doc_id)
"""

# Shared exact set-Jaccard verification over `cand(doc_a, doc_b)` +
# `dsh`/`scount` from the shingle chain; ends in a `verified` CTE so
# callers can either select it or chain connected components onto it.
_JACCARD_VERIFY = """
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS ni
  FROM cand c
  JOIN dsh a ON a.doc_id = c.doc_a
  JOIN dsh b ON b.doc_id = c.doc_b AND b.sh = a.sh
  GROUP BY c.doc_a, c.doc_b
),
verified AS (
  SELECT c.doc_a, c.doc_b
  FROM cand c
  JOIN scount sa ON sa.doc_id = c.doc_a
  JOIN scount sb ON sb.doc_id = c.doc_b
  LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
  WHERE CAST(COALESCE(i.ni, 0) AS DOUBLE) / (sa.ns + sb.ns - COALESCE(i.ni, 0)) >= 0.5
)
"""

# MinHash-LSH: 64 a*x+b (mod 2^64) permutation minima over the shingle
# sets, 32-band signatures, band-collision candidate pairs, exact
# set-Jaccard verify at tau=0.5 — reproduced EXACTLY in SQL.
_MINHASH_SQL_TEMPLATE = """
WITH
perms(j, pa, pb) AS (VALUES
{perms}
),
""" + _SHINGLE_CHAIN + """,
sigs AS (
  SELECT d.doc_id, p.j,
    min(CAST((CAST(d.sh % 4294967296 AS HUGEINT) * p.pa
      + (CAST(d.sh // 4294967296 AS HUGEINT) * p.pa % 4294967296) * 4294967296
      + p.pb) % '18446744073709551616'::HUGEINT AS UBIGINT)) AS s
  FROM dsh d CROSS JOIN perms p GROUP BY d.doc_id, p.j
),
bpair AS (
  SELECT doc_id, j // 2 AS band_id,
    max(CASE WHEN j % 2 = 0 THEN s END) AS s0,
    max(CASE WHEN j % 2 = 1 THEN s END) AS s1
  FROM sigs GROUP BY doc_id, j // 2
),
bh AS (
  SELECT doc_id, band_id,
    CAST((CAST(s0 % 4294967296 AS HUGEINT) * '14029467366897019727'::HUGEINT
      + (CAST(s0 // 4294967296 AS HUGEINT) * '14029467366897019727'::HUGEINT % 4294967296) * 4294967296
      + CAST(s1 AS HUGEINT)) % '18446744073709551616'::HUGEINT AS UBIGINT) AS bhash
  FROM bpair
),
pkey AS (
  SELECT doc_id,
    xor(bhash, CAST(CAST(band_id AS HUGEINT) * '11400714819323198485'::HUGEINT
        % '18446744073709551616'::HUGEINT AS UBIGINT)) AS pair_key
  FROM bh
),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM pkey x JOIN pkey y ON x.pair_key = y.pair_key AND x.doc_id < y.doc_id
),
""" + _JACCARD_VERIFY

_MINHASH_SQL = (
    _MINHASH_SQL_TEMPLATE + "SELECT doc_a, doc_b FROM verified"
).format(perms=_minhash_perm_values())

# Connected components (transitive closure to the smallest doc_id) over
# the verified MinHash pair set — the dedup-clustering oracle.
_MINHASH_CLUSTERS_SQL = (
    _MINHASH_SQL_TEMPLATE
    + """,
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM verified
  UNION
  SELECT doc_b AS u, doc_a AS v FROM verified
),
reach(n, r) AS (
  SELECT DISTINCT u, u FROM edges
  UNION
  SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.n
)
SELECT n AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id FROM reach GROUP BY n
"""
).replace("WITH\nperms", "WITH RECURSIVE\nperms").format(perms=_minhash_perm_values())

# n-gram Jaccard via the bottom-sketch inverted index: keep shingles
# whose splitmix64 falls below the per-doc length-adaptive threshold
# min(1, 32/n_shingles) * 2^64 (float compare, mirrored exactly),
# candidates = pairs sharing >= 2 sampled shingles, same exact verify.
_NGRAM_SQL = """
WITH
""" + _SHINGLE_CHAIN + """,
nsh AS (SELECT doc_id, count(*) AS n FROM shingle GROUP BY doc_id),
msrc AS (SELECT DISTINCT sh FROM shingle),
m1 AS (SELECT sh, xor(sh, sh >> 30) AS x FROM msrc),
m2 AS (SELECT sh, CAST((
    CAST(x % 4294967296 AS HUGEINT) * '13787848793156543929'::HUGEINT
    + (CAST(x // 4294967296 AS HUGEINT) * '13787848793156543929'::HUGEINT % 4294967296) * 4294967296
  ) % '18446744073709551616'::HUGEINT AS UBIGINT) AS x FROM m1),
m3 AS (SELECT sh, xor(x, x >> 27) AS x FROM m2),
m4 AS (SELECT sh, CAST((
    CAST(x % 4294967296 AS HUGEINT) * '10723151780598845931'::HUGEINT
    + (CAST(x // 4294967296 AS HUGEINT) * '10723151780598845931'::HUGEINT % 4294967296) * 4294967296
  ) % '18446744073709551616'::HUGEINT AS UBIGINT) AS x FROM m3),
mixed AS (SELECT sh, xor(x, x >> 31) AS mx FROM m4),
kept AS (
  SELECT DISTINCT s.doc_id, s.sh
  FROM shingle s JOIN nsh USING (doc_id) JOIN mixed USING (sh)
  WHERE CAST(mixed.mx AS DOUBLE)
        < least(1.0, 32.0 / CAST(nsh.n AS DOUBLE)) * 18446744073709551616.0
),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM kept a JOIN kept b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 2
),
""" + _JACCARD_VERIFY + "SELECT doc_a, doc_b FROM verified"


@query("minhash_dedup_pairs", sql=_MINHASH_SQL)
def minhash_dedup_pairs(sf_dir: str) -> ray.data.Dataset:
    """MinHash-LSH near-dup detection: shingle -> 64-perm minhash -> 32
    bands -> coarse-bucket run-pair candidates -> exact-Jaccard verify
    (tau=0.5) over a corpus seeded with mutated copies.

    Oracle-checked BIT-EXACT end to end: every stage is deterministic
    mod-2^64 arithmetic (word hash = splitmix64(seed + polynomial),
    shingle = 3-step Horner, permutations = a*x+b with seeded odd a,
    band hash = 2-step Horner, pair_key = xor with band_id * phi64),
    so the SQL oracle reproduces candidate generation AND the exact
    set-Jaccard tau-filter — not just the verified end state. The
    implementation's 256-per-key hot-group cap is unreachable at test
    scale (mutant families are pairs), so candidate sets coincide."""
    from ocr_ray.functions.dedup import (
        bucketed_pairs,
        minhash_bands,
        run_index_pairs,
        with_mutants,
    )

    docs = read_docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        with_mutants, batch_format="pyarrow"
    )
    bands = docs.map_batches(minhash_bands, batch_format="pyarrow").map_batches(
        lambda t: t.select(["pair_key", "doc_id"]), batch_format="pyarrow"
    )

    from ocr_ray.functions.dedup import keyed_run_pairs

    cands = bucketed_pairs(
        bands, key_col="pair_key", id_col="doc_id", pair_body=keyed_run_pairs
    )
    return _verified_pairs(docs, cands, tau=0.5)


@query("ngram_jaccard_pairs", sql=_NGRAM_SQL)
def ngram_jaccard_pairs(sf_dir: str) -> ray.data.Dataset:
    """n-gram Jaccard near-dup via a bottom-sketch shingle inverted
    index: each doc indexes only shingles whose hash falls below
    ``min(1, 32/n_shingles) * 2^64`` — a consistent (hash-threshold)
    bottom-k-style sketch, so two similar docs co-keep the same sampled
    shingles regardless of length and short docs keep everything; explode
    (shingle_hash, doc_id), coarse-bucket run pairs (hot shingles
    capped), require >= 2 shared sampled shingles per candidate
    (PPJoin-style overlap bound: a tau=0.5 pair shares >= 1/3 of its
    union, so >= ~10 sketched shingles in expectation), exact-verify
    tau=0.5. Sketching bounds index emission at O(docs x 32) rows — not
    O(total shingles) — which is what keeps this from emitting O(docs^2)
    candidates on boilerplate-heavy corpora where every shingle is hot."""
    from ocr_ray.functions.dedup import (
        attach_verify_pairs,
        bucketed_pairs,
        doc_shingle_lists,
        run_index_pairs,
        shingle_hashes,
        with_mutants,
    )
    from ocr_ray.functions.hashing import mix64

    docs = read_docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        with_mutants, batch_format="pyarrow"
    )

    def explode_shingles(t: pa.Table) -> pa.Table:
        sh, n_sh = shingle_hashes(t["text"])
        ids = np.repeat(t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64), n_sh)
        rate = np.minimum(1.0, 32.0 / np.maximum(np.repeat(n_sh, n_sh), 1))
        keep = mix64(sh).astype(np.float64) < rate * float(2**64)
        return pa.table({"shingle": pa.array(sh[keep]), "doc_id": pa.array(ids[keep])})

    def pair_body(g: pa.Table) -> pa.Table:
        # one emission per (shingle, doc) occurrence-pair; multiplicity is
        # the shared-shingle count consumed by min_count downstream.
        sh = g["shingle"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, sh))
        sh, ids = sh[order], ids[order]
        first = np.empty(len(sh), dtype=bool)
        if len(sh):
            first[0] = True
            first[1:] = (sh[1:] != sh[:-1]) | (ids[1:] != ids[:-1])
        sh, ids = sh[first], ids[first]
        ia, ib = run_index_pairs(sh, max_group=32, presorted=True)
        return pa.table(
            {
                "doc_a": pa.array(ids[ia], type=pa.int64()),
                "doc_b": pa.array(ids[ib], type=pa.int64()),
            }
        )

    cands = bucketed_pairs(
        docs.map_batches(explode_shingles, batch_format="pyarrow"),
        key_col="shingle",
        id_col="doc_id",
        pair_body=pair_body,
    )
    sigs = docs.map_batches(doc_shingle_lists, batch_format="pyarrow")
    return attach_verify_pairs(cands, sigs, tau=0.5, min_count=2)


# SimHash chain from a `tok(doc_id, w)` CTE to a `sig(doc_id, simhash)`
# CTE — shared by the per-doc signature oracle and the near-dup-pairs
# oracle (which runs it over the mutant-union corpus).
_SIMHASH_CHAIN = """
dt AS (SELECT DISTINCT w FROM tok),
mx AS (SELECT greatest(max(length(w)), 1) AS m FROM dt),
pw(k, p) AS (
  SELECT 0, CAST(1 AS HUGEINT)
  UNION ALL
  SELECT k+1,
    ((p % 4294967296) * 1000003 +
     ((p // 4294967296) * 1000003 % 4294967296) * 4294967296
    ) % '18446744073709551616'::HUGEINT
  FROM pw, mx WHERE k < mx.m - 1
),
chars AS (
  SELECT w, gs.i, unicode(substr(w, CAST(gs.i + 1 AS INT), 1)) AS b
  FROM dt, LATERAL (SELECT unnest(range(0, CAST(length(w) AS BIGINT))) AS i) gs
),
terms AS (
  SELECT w,
    CAST(CAST(b AS HUGEINT) * pw.p % 4294967296 AS BIGINT) AS lo,
    CAST(CAST(b AS HUGEINT) * pw.p % '18446744073709551616'::HUGEINT // 4294967296 AS BIGINT) AS hi
  FROM chars JOIN pw ON pw.k = chars.i
),
ph AS (
  SELECT d.w,
    CAST(('11400714819323198485'::HUGEINT
      + COALESCE(CAST(SUM(t.lo) AS HUGEINT) + CAST(SUM(t.hi) AS HUGEINT) * 4294967296, 0))
      % '18446744073709551616'::HUGEINT AS UBIGINT) AS h0
  FROM dt d LEFT JOIN terms t ON d.w = t.w GROUP BY d.w
),
s1 AS (SELECT w, xor(h0, h0 >> 30) AS x FROM ph),
s2 AS (SELECT w, CAST((
    CAST(x % 4294967296 AS HUGEINT) * '13787848793156543929'::HUGEINT
    + (CAST(x // 4294967296 AS HUGEINT) * '13787848793156543929'::HUGEINT % 4294967296) * 4294967296
  ) % '18446744073709551616'::HUGEINT AS UBIGINT) AS x FROM s1),
s3 AS (SELECT w, xor(x, x >> 27) AS x FROM s2),
s4 AS (SELECT w, CAST((
    CAST(x % 4294967296 AS HUGEINT) * '10723151780598845931'::HUGEINT
    + (CAST(x // 4294967296 AS HUGEINT) * '10723151780598845931'::HUGEINT % 4294967296) * 4294967296
  ) % '18446744073709551616'::HUGEINT AS UBIGINT) AS x FROM s3),
mh AS (SELECT w, xor(x, x >> 31) AS h FROM s4),
v AS (SELECT t.doc_id, m.h FROM tok t JOIN mh m USING (w)),
cnt AS (SELECT doc_id, count(*) AS nw FROM v GROUP BY doc_id),
jbits AS (SELECT unnest(generate_series(0, 63)) AS j),
p2(j, p) AS (SELECT 0, CAST(1 AS HUGEINT) UNION ALL SELECT j+1, p*2 FROM p2 WHERE j < 63),
votes AS (
  SELECT v.doc_id, jb.j,
    SUM(CASE WHEN (v.h >> jb.j) & 1 = 1 THEN 1 ELSE 0 END) AS ones
  FROM v CROSS JOIN jbits jb GROUP BY v.doc_id, jb.j
),
bits AS (
  SELECT vo.doc_id, vo.j, CASE WHEN 2*vo.ones > c.nw THEN 1 ELSE 0 END AS bit
  FROM votes vo JOIN cnt c USING (doc_id)
),
sig_terms AS (
  SELECT b.doc_id,
    CAST(CAST(b.bit AS HUGEINT) * p2.p % 4294967296 AS BIGINT) AS lo,
    CAST(CAST(b.bit AS HUGEINT) * p2.p // 4294967296 AS BIGINT) AS hi
  FROM bits b JOIN p2 ON p2.j = b.j
),
sig AS (
  SELECT doc_id,
    CAST((CAST(SUM(lo) AS HUGEINT) + CAST(SUM(hi) AS HUGEINT) * 4294967296)
      % '18446744073709551616'::HUGEINT AS UBIGINT) AS simhash
  FROM sig_terms GROUP BY doc_id
)
"""

_SIMHASH_SQL = (
    """
WITH RECURSIVE
tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
"""
    + _SIMHASH_CHAIN
    + "SELECT doc_id, simhash FROM sig"
)

_SIMHASH_PAIRS_SQL = (
    """
WITH RECURSIVE
toks0 AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
torig AS (SELECT doc_id, unnest(ws) AS w, unnest(range(1, len(ws)+1)) AS i FROM toks0),
tok AS (
  SELECT doc_id, w FROM torig
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, w FROM torig WHERE i % 10 <> 0
),
"""
    + _SIMHASH_CHAIN
    + """,
bands AS (
  SELECT s.doc_id, s.simhash,
    xor((s.simhash >> (16 * gb.b)) & 65535,
        CAST(CAST(gb.b AS HUGEINT) * '11400714819323198485'::HUGEINT
             % '18446744073709551616'::HUGEINT AS UBIGINT)) AS pair_key
  FROM sig s CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b) gb
)
SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
  CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
FROM bands x JOIN bands y ON x.pair_key = y.pair_key AND x.doc_id < y.doc_id
WHERE bit_count(xor(x.simhash, y.simhash)) <= 8
"""
)


@query("simhash_docs", sql=_SIMHASH_SQL)
def simhash_docs(sf_dir: str) -> ray.data.Dataset:
    """64-bit SimHash per document. Fully deterministic — per-token
    hash is ``splitmix64(SEED + sum(byte_i * 1000003^i) mod 2^64)`` and
    the signature is majority bit voting over the doc's tokens — so the
    SQL oracle reproduces it bit for bit: HUGEINT split-multiply for
    the polynomial powers and both splitmix64 multiplications, UBIGINT
    xor/shift for the finalizer steps, per-bit vote counts, and a
    powers-of-two reassembly summed as BIGINT halves."""
    from ocr_ray.functions.dedup import simhash

    return read_docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        simhash, batch_format="pyarrow"
    )


@query("simhash_neardup_pairs", sql=_SIMHASH_PAIRS_SQL)
def simhash_neardup_pairs(sf_dir: str) -> ray.data.Dataset:
    """SimHash near-dup: 64-bit signatures, 4x16-bit band blocking keyed
    through coarse buckets, vectorized Hamming<=8 verification over the
    mutated-copy corpus; cross-band pair dedup is a distributed bucketed
    shuffle (no driver-side step).

    Oracle-checked bit-exact: the signature chain is the shared SimHash
    SQL over the mutant-union corpus, band keys are
    ``xor(16-bit chunk, band * phi64)`` in UBIGINT, and the Hamming
    verify is ``bit_count(xor(sig_a, sig_b)) <= 8``. The 64-per-key
    hot-group cap is unreachable at test scale (random 16-bit chunks
    over ~1k docs)."""
    from ocr_ray.functions.dedup import (
        bucketed_pairs,
        hamming_u64,
        run_index_pairs,
        simhash,
        with_mutants,
    )

    docs = read_docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        with_mutants, batch_format="pyarrow"
    )
    sigs = docs.map_batches(simhash, batch_format="pyarrow")

    def band_rows(t: pa.Table) -> pa.Table:
        sh = t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bands = []
        for b in range(4):
            chunk = (sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            with np.errstate(over="ignore"):
                pair_key = chunk ^ (np.uint64(b) * np.uint64(0x9E3779B97F4A7C15))
            bands.append(
                pa.table(
                    {
                        "pair_key": pa.array(pair_key, type=pa.uint64()),
                        "doc_id": pa.array(ids),
                        "simhash": pa.array(sh, type=pa.uint64()),
                    }
                )
            )
        return pa.concat_tables(bands)

    def pair_body(g: pa.Table, max_group: int = 64) -> pa.Table:
        keys = g["pair_key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sh = g["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.lexsort((ids, keys))
        keys, ids, sh = keys[order], ids[order], sh[order]
        ia, ib = run_index_pairs(keys, max_group=max_group, presorted=True)
        hd = hamming_u64(sh[ia], sh[ib])
        keep = hd <= 8
        a, b, h = ids[ia[keep]], ids[ib[keep]], hd[keep].astype(np.int64)
        if len(a):
            # a pair's hamming is band-independent, so dedup keeps any copy
            o2 = np.lexsort((b, a))
            a, b, h = a[o2], b[o2], h[o2]
            first = np.empty(len(a), dtype=bool)
            first[0] = True
            first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
            a, b, h = a[first], b[first], h[first]
        return pa.table(
            {
                "doc_a": pa.array(a, type=pa.int64()),
                "doc_b": pa.array(b, type=pa.int64()),
                "hamming": pa.array(h, type=pa.int64()),
            }
        )

    from ocr_ray.functions.dedup import dedup_pairs

    cands = bucketed_pairs(
        sigs.map_batches(band_rows, batch_format="pyarrow"),
        key_col="pair_key",
        id_col="doc_id",
        pair_body=pair_body,
    )
    # cross-band duplicates of a pair land in one coarse bucket -> exact
    # distributed dedup; Hamming distance is identical for every copy.
    return dedup_pairs(cands, cols=("doc_a", "doc_b"))




_INCR_MINHASH_SQL = (
    _MINHASH_SQL_TEMPLATE
    + "SELECT doc_a, doc_b FROM verified WHERE doc_a < 1000000 AND doc_b >= 1000000"
).format(perms=_minhash_perm_values())


@query("incremental_minhash_dedup", sql=_INCR_MINHASH_SQL)
def incremental_minhash_dedup(sf_dir: str) -> ray.data.Dataset:
    """INCREMENTAL near-dup dedup against a COMMITTED corpus — the
    continuous-ingest shape: the original documents' dedup state (LSH
    band table + per-doc shingle signatures) is persisted ONCE through
    the atomic fragment+manifest sink (``functions/dedup_store``), and
    the arriving shard (the seeded mutants) is deduped by reading ONLY
    those signature tables — the corpus text is never re-tokenized.
    Candidates are old x new rows sharing a ``pair_key`` (same coarse
    buckets and hot-key cap as ``minhash_dedup_pairs``), verified by the
    same two-shuffle exact-Jaccard machinery joining STORED old
    signatures with freshly computed new ones. Every stage is the same
    deterministic mod-2^64 arithmetic, so the result is bit-equal to
    re-running the full pipeline on corpus ∪ shard and keeping the
    cross pairs — which is what the oracle states (the full verified
    set restricted to doc_a < 1e6 <= doc_b)."""
    from ocr_ray.functions.dedup import MUTANT_OFFSET, with_mutants
    from ocr_ray.functions.dedup_store import (
        build_minhash_store,
        incremental_minhash_pairs,
        store_complete,
    )
    from ocr_ray.pipelines.queries._shared import store_key, store_root

    docs = read_docs(sf_dir, columns=["doc_id", "text"])
    store = f"{store_root('minhash_store')}/{store_key(sf_dir, 'documents')}-p16"
    if not store_complete(store, 16):
        build_minhash_store(docs, store, num_parts=16)

    # the arriving shard: the seeded mutant copies (doc_id + 1e6)
    off = pa.scalar(MUTANT_OFFSET, type=pa.int64())
    new_docs = docs.map_batches(with_mutants, batch_format="pyarrow").map_batches(
        lambda t: t.filter(pc.greater_equal(t["doc_id"], off)),
        batch_format="pyarrow",
    )
    return incremental_minhash_pairs(new_docs, store, tau=0.5)
