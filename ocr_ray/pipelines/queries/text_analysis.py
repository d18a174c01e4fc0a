"""Query registry section: text_analysis (split from the former monolithic queries.py)."""

from __future__ import annotations


import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ocr_ray.functions import text as textfn

from ocr_ray.pipelines.queries._shared import gate_by_sampled_recheck, query, read_docs


# ---------------------------------------------------------------------------
# Text analysis over documents
# ---------------------------------------------------------------------------


@query(
    "token_stats",
    sql="""
SELECT doc_id,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
  CAST(length(text) AS BIGINT) AS n_chars_measured,
  (CAST(length(text) AS BIGINT) - (len(string_split(text, ' ')) - 1))
    / CAST(len(string_split(text, ' ')) AS BIGINT) AS avg_token_len
FROM documents
""",
)
def token_stats(sf_dir: str) -> ray.data.Dataset:
    ds = read_docs(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(textfn.token_stats, batch_format="pyarrow")


@query(
    "regex_token_stats",
    sql=r"""
SELECT doc_id,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_bpe_tokens
FROM documents
""",
)
def regex_token_stats(sf_dir: str) -> ray.data.Dataset:
    """Token counting two ways: whitespace split and a BPE-ish regex
    (letter runs / digit runs / single punctuation — the pre-tokenizer
    shape BPE vocabularies train over). Both engines run RE2, so counts
    match exactly."""
    ds = read_docs(sf_dir, columns=["doc_id", "text"])
    pat = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

    def fx(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_ws_tokens": pc.cast(pc.list_value_length(toks), pa.int64()),
                "n_bpe_tokens": pc.cast(pc.count_substring_regex(t["text"], pat), pa.int64()),
            }
        )

    return ds.map_batches(fx, batch_format="pyarrow")


_LANG_SQL = """
WITH s AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
v AS (
  SELECT doc_id,
    count(*) FILTER (WHERE tok IN ('der','die','und','das','ein','zu')) AS votes_de,
    count(*) FILTER (WHERE tok IN ('the','and','of','a','to','in')) AS votes_en,
    count(*) FILTER (WHERE tok IN ('el','la','de','y','que','en')) AS votes_es,
    count(*) FILTER (WHERE tok IN ('le','la','et','les','des','un')) AS votes_fr,
    count(*) FILTER (WHERE tok IN ('de','shi','le','zai','he','you')) AS votes_zh
  FROM s GROUP BY doc_id)
SELECT doc_id,
  CASE
    WHEN votes_de >= votes_en AND votes_de >= votes_es AND votes_de >= votes_fr
         AND votes_de >= votes_zh THEN 'de'
    WHEN votes_en >= votes_es AND votes_en >= votes_fr AND votes_en >= votes_zh THEN 'en'
    WHEN votes_es >= votes_fr AND votes_es >= votes_zh THEN 'es'
    WHEN votes_fr >= votes_zh THEN 'fr'
    ELSE 'zh'
  END AS pred_lang,
  votes_de, votes_en, votes_es, votes_fr, votes_zh
FROM v
"""


@query("lang_id", sql=_LANG_SQL)
def lang_id(sf_dir: str) -> ray.data.Dataset:
    """Stopword-vote language ID — the heuristic is pure token-set counting
    with a deterministic argmax tie-break (first language in sorted order),
    so the SQL oracle reproduces it exactly (the CASE chain's >= order IS
    numpy argmax's first-max rule)."""
    ds = read_docs(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(textfn.lang_id, batch_format="pyarrow")


_QUALITY_SQL = """
WITH s AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
v AS (
  SELECT doc_id, count(*) AS n_tokens,
    count(*) FILTER (WHERE tok IN ('the','and','of','a','to','in')) AS n_stop,
    SUM(length(tok)) AS sum_len
  FROM s GROUP BY doc_id),
m AS (
  SELECT doc_id, n_tokens,
    CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio_en,
    CAST(sum_len AS DOUBLE) / n_tokens AS mean_token_len
  FROM v)
SELECT doc_id, n_tokens, stop_ratio_en, mean_token_len,
  0.4 * LEAST(GREATEST(n_tokens / 64.0, 0.0), 1.0)
  + 0.3 * LEAST(GREATEST(stop_ratio_en * 5, 0.0), 1.0)
  + 0.3 * LEAST(GREATEST(1.0 - abs(mean_token_len - 5.0) / 5.0, 0.0), 1.0) AS quality
FROM m
"""


@query("doc_quality", sql=_QUALITY_SQL)
def doc_quality(sf_dir: str) -> ray.data.Dataset:
    """Quality heuristics (length / stopword-ratio / token-length terms) —
    every term is IEEE +,-,*,/,abs,min,max in a fixed evaluation order, so
    the SQL oracle matches bit for bit."""
    ds = read_docs(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(textfn.quality_score, batch_format="pyarrow")


# Hashed-feature linear classifier: word hash = mix64(seed + poly),
# per-class weight = mix64(h + (c+1)*golden) % 1001 - 500, score = sum
# over token occurrences, argmax with smallest-class tiebreak. Both mix64
# chains run in HUGEINT split-multiply; (c+1)*golden needs no split (the
# product is < 2^68, well inside HUGEINT).
_CLASSIFY_SQL = """
WITH RECURSIVE
toks0 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
dt AS (SELECT DISTINCT w FROM toks0),
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
m1 AS (SELECT w, xor(h0, h0 >> 30) AS x FROM ph),
m2 AS (SELECT w, CAST((
    CAST(x % 4294967296 AS HUGEINT) * '13787848793156543929'::HUGEINT
    + (CAST(x // 4294967296 AS HUGEINT) * '13787848793156543929'::HUGEINT % 4294967296) * 4294967296
  ) % '18446744073709551616'::HUGEINT AS UBIGINT) AS x FROM m1),
m3 AS (SELECT w, xor(x, x >> 27) AS x FROM m2),
m4 AS (SELECT w, CAST((
    CAST(x % 4294967296 AS HUGEINT) * '10723151780598845931'::HUGEINT
    + (CAST(x // 4294967296 AS HUGEINT) * '10723151780598845931'::HUGEINT % 4294967296) * 4294967296
  ) % '18446744073709551616'::HUGEINT AS UBIGINT) AS x FROM m3),
wh AS (SELECT w, xor(x, x >> 31) AS h FROM m4),
cls AS (SELECT unnest(range(0, 8)) AS c),
wx AS (
  SELECT wh.w, cls.c,
    CAST((CAST(wh.h AS HUGEINT)
      + (CAST(cls.c + 1 AS HUGEINT) * '11400714819323198485'::HUGEINT)
        % '18446744073709551616'::HUGEINT)
      % '18446744073709551616'::HUGEINT AS UBIGINT) AS x
  FROM wh CROSS JOIN cls
),
c1 AS (SELECT w, c, xor(x, x >> 30) AS x FROM wx),
c2 AS (SELECT w, c, CAST((
    CAST(x % 4294967296 AS HUGEINT) * '13787848793156543929'::HUGEINT
    + (CAST(x // 4294967296 AS HUGEINT) * '13787848793156543929'::HUGEINT % 4294967296) * 4294967296
  ) % '18446744073709551616'::HUGEINT AS UBIGINT) AS x FROM c1),
c3 AS (SELECT w, c, xor(x, x >> 27) AS x FROM c2),
c4 AS (SELECT w, c, CAST((
    CAST(x % 4294967296 AS HUGEINT) * '10723151780598845931'::HUGEINT
    + (CAST(x // 4294967296 AS HUGEINT) * '10723151780598845931'::HUGEINT % 4294967296) * 4294967296
  ) % '18446744073709551616'::HUGEINT AS UBIGINT) AS x FROM c3),
wt AS (SELECT w, c, CAST(xor(x, x >> 31) % 1001 AS BIGINT) - 500 AS wgt FROM c4),
scores AS (
  SELECT t.doc_id, wt.c, CAST(SUM(wt.wgt) AS BIGINT) AS score
  FROM toks0 t JOIN wt ON wt.w = t.w
  GROUP BY t.doc_id, wt.c
),
ranked AS (
  SELECT doc_id, c, score,
    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, c ASC) AS rn
  FROM scores
)
SELECT doc_id, c AS label, score FROM ranked WHERE rn = 1
"""


@query("classify_docs", sql=_CLASSIFY_SQL)
def classify_docs(sf_dir: str) -> ray.data.Dataset:
    """Batched model scoring over documents: an 8-class hashed-feature
    linear classifier whose weights are derived arithmetically from the
    token hash (``functions/text.classify_hashed``), so the entire model —
    feature hashing, per-class dot products, argmax with deterministic
    tiebreak — is reproduced bit-exact by the SQL oracle. Stateless
    map_batches, zero shuffles; a learned weight matrix would broadcast
    via ``ray.put`` with the identical distributed shape."""
    ds = read_docs(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(textfn.classify_hashed, batch_format="pyarrow")


_FINGERPRINT_SQL = """
WITH RECURSIVE
mx AS (SELECT greatest(max(length(text)), 1) AS m FROM documents),
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
  SELECT doc_id, gs.i, unicode(substr(text, CAST(gs.i + 1 AS INT), 1)) AS b
  FROM documents, LATERAL (SELECT unnest(range(0, CAST(length(text) AS BIGINT))) AS i) gs
),
terms AS (
  SELECT doc_id,
    CAST(CAST(b AS HUGEINT) * pw.p % 4294967296 AS BIGINT) AS lo,
    CAST(CAST(b AS HUGEINT) * pw.p % '18446744073709551616'::HUGEINT // 4294967296 AS BIGINT) AS hi
  FROM chars JOIN pw ON pw.k = chars.i
)
SELECT d.doc_id,
  CAST(COALESCE((CAST(SUM(t.lo) AS HUGEINT) + CAST(SUM(t.hi) AS HUGEINT) * 4294967296)
       % '18446744073709551616'::HUGEINT, 0) AS UBIGINT) AS fingerprint
FROM documents d LEFT JOIN terms t ON d.doc_id = t.doc_id
GROUP BY d.doc_id
"""


@query("doc_fingerprint", sql=_FINGERPRINT_SQL)
def doc_fingerprint(sf_dir: str) -> ray.data.Dataset:
    """Rabin-style polynomial rolling-hash fingerprint per document
    (``fp = sum(byte_i * 1000003^i) mod 2^64``), buffer-level vectorized
    with a segmented reduceat. The SQL oracle reproduces the wraparound
    arithmetic exactly in HUGEINT (split 32-bit multiply for the power
    chain, per-byte terms summed as BIGINT halves, reduce mod 2^64 into
    UBIGINT); byte == code point because the corpus is ASCII."""
    ds = read_docs(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(textfn.fingerprint, batch_format="pyarrow")




@query(
    "bigram_lm_score",
    sql="""
WITH src AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tok AS (SELECT doc_id, generate_subscripts(ws, 1) AS i, unnest(ws) AS w FROM src),
big AS (
  SELECT a.doc_id, a.w AS w1, b.w AS w2
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
),
bcnt AS (SELECT w1, w2, COUNT(*) AS c FROM big GROUP BY w1, w2),
btop AS (SELECT w1, w2, c FROM bcnt ORDER BY c DESC, w1 ASC, w2 ASC LIMIT 128),
hits AS (
  SELECT g.doc_id, CAST(SUM(p.c) AS BIGINT) AS hits_bi
  FROM big g JOIN btop p ON p.w1 = g.w1 AND p.w2 = g.w2 GROUP BY g.doc_id
),
nt AS (SELECT doc_id, len(ws) AS n_tokens FROM src)
SELECT d.doc_id, COALESCE(h.hits_bi, 0) AS hits_bi,
  CAST(nt.n_tokens - 1 AS BIGINT) AS n_bigrams,
  CAST(COALESCE(h.hits_bi, 0) AS DOUBLE) / GREATEST(nt.n_tokens - 1, 1)
    AS bigram_score
FROM documents d JOIN nt USING (doc_id) LEFT JOIN hits h USING (doc_id)
""",
)
def bigram_lm_score(sf_dir: str) -> ray.data.Dataset:
    """Bigram language-model fluency score — the sequence-aware sibling
    of ``unigram_lm_score`` (a bag-of-words model can't tell shuffled
    tokens from prose; adjacency counts can): fit = exact corpus-wide
    BIGRAM counts (per-batch vectorized adjacent-pair combine with doc
    boundaries masked, one bucketed fold, per-block partial top-128),
    the tiny top-128 model broadcast once; transform = stateless
    map_batches summing the corpus frequency of each doc's in-model
    bigrams. Integer arithmetic until ONE division, so bit-exact vs SQL.
    At 100 TB the broadcast stays 128 rows regardless of the (much
    larger than unigram) bigram vocabulary."""
    import numpy as np

    from ocr_ray.functions.relational import (
        _prepared,
        broadcast,
        bucketed_aggregate,
    )
    from ocr_ray.functions.text import split_tokens
    from ocr_ray.pipelines.queries._shared import arrow_topk

    docs = read_docs(sf_dir, columns=["doc_id", "text"])
    SEP = "\x1f"  # unit separator: never appears in space-split tokens

    def _doc_bigrams(t: pa.Table):
        """(parents, counts, joined 'w1<SEP>w2' flat array) for each doc's
        ADJACENT token pairs, doc boundaries masked vectorized."""
        parents, counts, flat = split_tokens(t["text"])
        if len(flat) == 0:
            return (
                np.empty(0, dtype=np.int64),
                np.maximum(counts - 1, 0),
                pa.array([], type=pa.string()),
            )
        w1 = flat.slice(0, len(flat) - 1)
        w2 = flat.slice(1)
        same_doc = parents[:-1] == parents[1:]
        joined = pc.binary_join_element_wise(
            pc.cast(w1, pa.string()), pc.cast(w2, pa.string()), SEP
        )
        return (
            parents[:-1][same_doc],
            np.maximum(counts - 1, 0),
            joined.filter(pa.array(same_doc)),
        )

    def partial(t: pa.Table) -> pa.Table:
        _, _, joined = _doc_bigrams(t)
        out = pa.table({"bg": joined}).group_by("bg").aggregate([([], "count_all")])
        return out.rename_columns(["bg", "n"])

    counts = bucketed_aggregate(
        docs.map_batches(partial, batch_format="pyarrow"),
        keys=["bg"],
        aggs={"n": ("n", "sum")},
    )

    def local_top(t: pa.Table) -> pa.Table:
        out = arrow_topk(t, [("n", "descending"), ("bg", "ascending")], 128)
        return pa.table(
            {
                "bg": pc.cast(out["bg"], pa.string()),
                "n": pc.cast(out["n"], pa.int64()),
            }
        )

    top = (
        counts.map_batches(local_top, batch_format="pyarrow")
        .sort(["n", "bg"], descending=[True, False])
        .limit(128)
        .to_pandas()
    )
    model_ref = broadcast((top["bg"].tolist(), top["n"].to_numpy(dtype=np.int64)))

    out_schema = pa.schema(
        {
            "doc_id": pa.int64(),
            "hits_bi": pa.int64(),
            "n_bigrams": pa.int64(),
            "bigram_score": pa.float64(),
        }
    )

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        grams, freqs = _prepared(
            ("bigram_lm", model_ref.hex()),
            lambda: (
                lambda m: (pa.array(m[0], type=pa.string()), np.concatenate([m[1], [0]]))
            )(ray.get(model_ref)),
        )
        parents, n_bigrams, joined = _doc_bigrams(t)
        pos = pc.index_in(joined, value_set=grams).to_numpy(zero_copy_only=False)
        idx = np.where(np.isnan(pos.astype(np.float64)), len(freqs) - 1, pos).astype(
            np.int64
        )
        hits = np.zeros(t.num_rows, dtype=np.int64)
        np.add.at(hits, parents, freqs[idx])
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "hits_bi": pa.array(hits),
                "n_bigrams": pa.array(n_bigrams),
                "bigram_score": pa.array(
                    hits.astype(np.float64) / np.maximum(n_bigrams, 1)
                ),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


@query(
    "phrase_search_docs",
    sql="""
WITH src AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tok AS (SELECT doc_id, generate_subscripts(ws, 1) AS i, unnest(ws) AS w FROM src),
m AS (
  SELECT a.doc_id, COUNT(*) AS n_hits
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  WHERE a.w = 'spark' AND b.w = 'join'
  GROUP BY a.doc_id
)
SELECT doc_id, CAST(n_hits AS BIGINT) AS n_hits FROM m
""",
)
def phrase_search_docs(sf_dir: str) -> ray.data.Dataset:
    """Exact PHRASE search (positional adjacency, the retrieval op BM25's
    bag-of-words cannot express): occurrences of the exact token sequence
    'spark join' per document. One streaming pass, fully vectorized —
    adjacent-position equality on the flattened token array with doc
    boundaries masked, per-doc counts via one bincount; no index build,
    no shuffle (the per-doc groupby is batch-local because a document's
    tokens never split across batches)."""
    import numpy as np

    from ocr_ray.functions.text import split_tokens

    docs = read_docs(sf_dir, columns=["doc_id", "text"])
    out_schema = pa.schema({"doc_id": pa.int64(), "n_hits": pa.int64()})

    def match(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        parents, _, flat = split_tokens(t["text"])
        if len(flat) < 2:
            return out_schema.empty_table()
        hit = (
            pc.equal(flat.slice(0, len(flat) - 1), "spark").to_numpy(
                zero_copy_only=False
            )
            & pc.equal(flat.slice(1), "join").to_numpy(zero_copy_only=False)
            & (parents[:-1] == parents[1:])
        )
        n = np.bincount(parents[:-1][hit], minlength=t.num_rows).astype(np.int64)
        keep = n > 0
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()).filter(pa.array(keep)),
                "n_hits": pa.array(n[keep]),
            }
        )

    return docs.map_batches(match, batch_format="pyarrow")


@query("wordpiece_encode_docs", sql=None)
def wordpiece_encode_docs(sf_dir: str) -> ray.data.Dataset:
    """WordPiece tokenizer APPLICATION — the greedy longest-match-first
    complement of ``bpe_encode_docs`` (same vocabulary family, different
    segmentation algorithm: BPE replays merge order, WordPiece takes the
    longest vocab prefix at each position). Vocab derives
    deterministically from a 12-merge BPE fit (merge strings + the full
    merge alphabet), ships once per actor, and the encode is a stateful
    actor-pool stage with a per-actor word-type cache. No SQL oracle
    (greedy matching isn't SQL-expressible); exactness is enforced at
    run time — the fit verifies against the pure-Python BPE reference,
    the encoder re-encodes a deterministic sample of word types with
    the independent reference scanner, raising on any count divergence,
    and the output is SELF-VERIFYING: a deterministic document sample
    (doc_id % 97 == 0) is re-encoded end to end with the reference
    scanner on the driver and every row carries ``gate_ok`` = that
    comparison held (full-coverage equality: tests/test_wordpiece.py)."""
    from ocr_ray.functions.bpe import bpe_train
    from ocr_ray.functions.wordpiece import (
        UNK,
        WordpieceEncoder,
        wordpiece_encode_reference,
        wordpiece_vocab,
    )
    from ocr_ray.sizing import pool_size

    fit = bpe_train(read_docs(sf_dir, columns=["text"]), num_merges=12, verify=True)
    vocab = wordpiece_vocab(list(zip(fit["left"], fit["right"])))
    ds = read_docs(sf_dir, columns=["doc_id", "text"])
    out = ds.map_batches(
        WordpieceEncoder,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=pool_size(),
        fn_constructor_kwargs={"vocab": vocab},
    ).materialize()

    vset = frozenset(vocab)

    def check(eng, raw):
        for doc_id, n_p, n_u in zip(eng["doc_id"], eng["n_pieces"], eng["n_unk"]):
            rp = ru = 0
            for w in (raw.loc[int(doc_id), "text"] or "").split(" "):
                if not w:
                    continue
                pieces = wordpiece_encode_reference(w, vset)
                rp += len(pieces)
                ru += int(UNK in pieces)
            if (rp, ru) != (int(n_p), int(n_u)):
                return False
        return True

    return gate_by_sampled_recheck(out, ds, id_col="doc_id", checker=check)


@query(
    "proximity_search_docs",
    sql="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         unnest(range(1, len(string_split(text, ' ')) + 1)) AS i
  FROM documents
),
a AS (SELECT doc_id, i FROM tok WHERE w = 'spark'),
b AS (SELECT doc_id, i FROM tok WHERE w = 'scan'),
d AS (
  SELECT a.doc_id, MIN(ABS(a.i - b.i)) AS min_dist,
         COUNT(*) AS n_pairs_within
  FROM a JOIN b ON a.doc_id = b.doc_id AND ABS(a.i - b.i) <= 3
  GROUP BY a.doc_id
)
SELECT doc_id, CAST(min_dist AS BIGINT) AS min_dist,
  CAST(n_pairs_within AS BIGINT) AS n_pairs_within
FROM d
""",
)
def proximity_search_docs(sf_dir: str) -> ray.data.Dataset:
    """PROXIMITY search ('spark' NEAR/3 'scan') — the retrieval operator
    between bag-of-words and exact phrase: documents where the terms
    co-occur within a token-distance bound, with the minimum distance
    and the count of qualifying position pairs.

    One stateless vectorized pass, zero shuffles: tokenize per batch
    (offset arithmetic on the flat token array), take each doc's two
    position lists, and because positions are ascending, the pair
    search is a double ``searchsorted`` per doc — window [i-3, i+3]
    membership counted without materializing the cross product (the
    SQL oracle's join is quadratic per doc; the engine is
    O(n log n))."""
    import numpy as np
    import pandas as pd

    from ocr_ray.functions.text import split_tokens

    docs = read_docs(sf_dir, columns=["doc_id", "text"])
    out_schema = pa.schema(
        {"doc_id": pa.int64(), "min_dist": pa.int64(), "n_pairs_within": pa.int64()}
    )
    K = 3

    def near(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        parents, _, flat = split_tokens(t["text"])
        if len(flat) == 0:
            return out_schema.empty_table()
        # 1-based position within each doc
        idx = np.arange(len(flat), dtype=np.int64)
        starts = np.flatnonzero(np.diff(np.concatenate([[-1], parents])))
        doc_start = np.zeros(len(flat), dtype=np.int64)
        doc_start[starts] = idx[starts]
        doc_start = np.maximum.accumulate(doc_start)
        pos = idx - doc_start + 1
        is_a = pc.equal(flat, "spark").to_numpy(zero_copy_only=False)
        is_b = pc.equal(flat, "scan").to_numpy(zero_copy_only=False)
        # composite sort key keeps each doc's positions contiguous+sorted
        pa_docs, pa_pos = parents[is_a], pos[is_a]
        pb_docs, pb_pos = parents[is_b], pos[is_b]
        if len(pa_docs) == 0 or len(pb_docs) == 0:
            return out_schema.empty_table()
        BIG = np.int64(1) << 32
        ka = pa_docs.astype(np.int64) * BIG + pa_pos
        kb = pb_docs.astype(np.int64) * BIG + pb_pos
        # for each 'spark' position: count/min-dist of 'scan' within +-K
        # in the SAME doc via two searchsorted probes
        lo = np.searchsorted(kb, pa_docs.astype(np.int64) * BIG + pa_pos - K)
        hi = np.searchsorted(kb, pa_docs.astype(np.int64) * BIG + pa_pos + K, side="right")
        n_within = hi - lo
        # min distance among the window hits: positions are ascending, so
        # the nearest 'scan' to each 'spark' is one of the two elements
        # bracketing its insertion point (NOT the window ends — a window
        # can hold closer interior hits)
        md = np.full(len(ka), np.int64(1 << 30))
        j = np.searchsorted(kb, ka)
        for pick in (j, j - 1):
            valid = (pick >= lo) & (pick < hi) & (n_within > 0)
            d_ = np.abs(kb[np.clip(pick, 0, len(kb) - 1)] - ka)
            md = np.where(valid & (d_ < md), d_, md)
        have = n_within > 0
        if not have.any():
            return out_schema.empty_table()
        # fold per doc
        df = pd.DataFrame(
            {
                "parent": pa_docs[have],
                "min_dist": md[have],
                "n": n_within[have],
            }
        )
        red = df.groupby("parent", sort=False).agg(
            min_dist=("min_dist", "min"), n_pairs_within=("n", "sum")
        )
        doc_ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[red.index.to_numpy()]),
                "min_dist": pa.array(red["min_dist"].to_numpy(dtype=np.int64)),
                "n_pairs_within": pa.array(
                    red["n_pairs_within"].to_numpy(dtype=np.int64)
                ),
            }
        )

    return docs.map_batches(near, batch_format="pyarrow")


_CONFUSION_SQL = _CLASSIFY_SQL.replace(
    "SELECT doc_id, c AS label, score FROM ranked WHERE rn = 1",
    """pred AS (SELECT doc_id, c AS label FROM ranked WHERE rn = 1)
SELECT p.label, d.lang, COUNT(*) AS n_docs
FROM pred p JOIN documents d USING (doc_id)
GROUP BY p.label, d.lang""",
).replace(
    """ranked AS (
  SELECT doc_id, c, score,
    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, c ASC) AS rn
  FROM scores
)
pred AS""",
    """ranked AS (
  SELECT doc_id, c, score,
    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, c ASC) AS rn
  FROM scores
),
pred AS""",
)


@query("classifier_confusion", sql=_CONFUSION_SQL)
def classifier_confusion(sf_dir: str) -> ray.data.Dataset:
    """MODEL EVALUATION: the confusion matrix of the hashed-feature
    classifier's predictions against the corpus ``lang`` column — the
    joint (predicted label, lang) counts an evaluation stage
    materializes after every scoring run. The prediction rides the SAME
    stateless batch as the lang column (no join: classifier output is
    row-aligned with its input batch), so the whole evaluation is one
    map + one low-cardinality groupby; every cell is an integer count,
    oracle-checked through the full classifier chain + the final join
    in SQL."""
    from ray.data.aggregate import Count

    ds = read_docs(sf_dir, columns=["doc_id", "text", "lang"])

    def pred_with_lang(t: pa.Table) -> pa.Table:
        # classify_hashed drops NULL-text rows; filter FIRST so label and
        # lang stay row-aligned (the oracle's unnest drops them too)
        t = t.filter(pc.is_valid(t["text"]))
        out = textfn.classify_hashed(t.select(["doc_id", "text"]))
        return pa.table(
            {
                "label": out["label"],
                "lang": t["lang"],
            }
        )

    return (
        ds.map_batches(pred_with_lang, batch_format="pyarrow")
        .groupby(["label", "lang"])
        .aggregate(Count(alias_name="n_docs"))
    )
