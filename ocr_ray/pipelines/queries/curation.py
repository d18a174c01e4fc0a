"""Query registry section: curation (split from the former monolithic queries.py)."""

from __future__ import annotations


import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ocr_ray.corpus import ensure_corpus
from ocr_ray.functions.relational import hash_join
from ocr_ray.functions import text as textfn
from ocr_ray.sizing import default_buckets, pool_size
from ocr_ray.sources import read_documents, read_table

from ocr_ray.pipelines.queries._shared import gate_by_sampled_recheck, load_small_table, query, read_docs, read_embeddings
from ocr_ray.pipelines.queries.simsearch import embedding_neardup_pairs


# ---------------------------------------------------------------------------
# Training-data curation: PII scrub, repetition filters, splits, domain caps
# ---------------------------------------------------------------------------


_PII_AUG_SQL = """
  text
  || CASE WHEN doc_id % 3 = 0
       THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
       ELSE '' END
  || CASE WHEN doc_id % 5 = 0
       THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       ELSE '' END
  || CASE WHEN doc_id % 7 = 0
       THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
            || '.' || CAST(doc_id * 7 % 256 AS VARCHAR)
            || '.' || CAST(doc_id * 13 % 256 AS VARCHAR)
       ELSE '' END
"""


@query(
    "pii_redact_docs",
    sql=f"""
WITH aug AS (SELECT doc_id, {_PII_AUG_SQL} AS text FROM documents)
SELECT doc_id,
  regexp_replace(
    regexp_replace(
      regexp_replace(text, '[A-Za-z0-9_.]+@[A-Za-z0-9.]+', '<EMAIL>', 'g'),
      '555-[0-9]{{4}}', '<PHONE>', 'g'),
    '[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+', '<IP>', 'g') AS redacted,
  CAST(len(regexp_extract_all(text, '[A-Za-z0-9_.]+@[A-Za-z0-9.]+')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(text, '555-[0-9]{{4}}')) AS BIGINT) AS n_phones,
  CAST(len(regexp_extract_all(text, '[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+')) AS BIGINT) AS n_ips
FROM aug
""",
)
def pii_redact_docs(sf_dir: str) -> ray.data.Dataset:
    """PII redaction (emails / phone numbers / IPv4) over a corpus
    deterministically seeded with PII — both engines run the same RE2
    patterns, replace all occurrences, and count removals. The seeding
    is arithmetic on doc_id so the oracle reproduces synthesis + scrub
    end-to-end."""
    ds = read_docs(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(textfn.pii_augment, batch_format="pyarrow").map_batches(
        textfn.pii_redact, batch_format="pyarrow"
    )


@query(
    "repetition_quality_docs",
    sql="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
s AS (SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS i FROM t),
a AS (SELECT doc_id, count(*) AS n_tokens, count(DISTINCT tok) AS n_distinct
      FROM s GROUP BY doc_id),
b AS (SELECT doc_id, tok, lead(tok) OVER (PARTITION BY doc_id ORDER BY i) AS nxt FROM s),
g AS (SELECT doc_id, count(*) AS c FROM b WHERE nxt IS NOT NULL GROUP BY doc_id, tok, nxt),
m AS (SELECT doc_id, max(c) AS max_bi FROM g GROUP BY doc_id)
SELECT a.doc_id, a.n_tokens, a.n_distinct,
  1.0 - CAST(a.n_distinct AS DOUBLE) / a.n_tokens AS dup_word_frac,
  CASE WHEN a.n_tokens > 1 THEN CAST(coalesce(m.max_bi, 0) AS DOUBLE) / (a.n_tokens - 1)
       ELSE 0.0 END AS top_bigram_frac
FROM a LEFT JOIN m USING (doc_id)
""",
)
def repetition_quality_docs(sf_dir: str) -> ray.data.Dataset:
    """Gopher-style repetition filters (duplicate-word fraction, most-
    frequent-bigram fraction) — the standard web-crawl quality gate for
    boilerplate / keyword-stuffed / templated pages. One embarrassingly
    parallel Arrow pass; identical IEEE op order to the SQL oracle."""
    ds = read_docs(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(textfn.repetition_stats, batch_format="pyarrow")


@query(
    "train_val_test_split",
    sql="""
SELECT doc_id,
  (doc_id * 2654435761) % 4294967296 % 100 AS bucket,
  CASE WHEN (doc_id * 2654435761) % 4294967296 % 100 < 90 THEN 'train'
       WHEN (doc_id * 2654435761) % 4294967296 % 100 < 95 THEN 'val'
       ELSE 'test' END AS split
FROM documents
""",
)
def train_val_test_split(sf_dir: str) -> ray.data.Dataset:
    """Deterministic 90/5/5 train/val/test assignment by Knuth
    multiplicative hash of doc_id — stable across runs, machines and
    repartitions (never sample-based), the property a training pipeline
    needs so that re-runs and late-arriving shards land in the same
    split. Embarrassingly parallel; no shuffle."""
    ds = read_docs(sf_dir, columns=["doc_id"])

    def assign(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = (ids * 2654435761) % 4294967296 % 100
        split = np.where(bucket < 90, "train", np.where(bucket < 95, "val", "test"))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "bucket": pa.array(bucket),
                "split": pa.array(split, type=pa.string()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


@query(
    "source_cap_docs",
    sql="""
SELECT doc_id, source, CAST(rn AS BIGINT) AS rn FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents)
WHERE rn <= 50
""",
)
def source_cap_docs(sf_dir: str) -> ray.data.Dataset:
    """Per-source document cap (keep the first 50 docs per source by
    doc_id) — the C4-style per-domain cap that stops a single crawler
    host from dominating the corpus. Uses the distributed histogram
    ranking primitive, so no task ever holds a whole source's rows
    (sources are few and huge — the canonical skew shape)."""
    from ocr_ray.functions.ranking import partitioned_rank

    ds = read_docs(sf_dir, columns=["doc_id", "source"])
    out = partitioned_rank(
        ds,
        part_col="source",
        value_col="doc_id",
        tiebreak_col="doc_id",
        out_cols=["doc_id", "source"],
    )
    return out.map_batches(
        lambda t: t.filter(pc.less_equal(t["rn"], pa.scalar(50))).select(
            ["doc_id", "source", "rn"]
        ),
        batch_format="pyarrow",
    ).map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "source": t["source"],
                "rn": pc.cast(t["rn"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


@query(
    "mixture_sample_docs",
    sql="""
WITH r AS (
  SELECT doc_id, source,
    1.0 / (1 + CAST(substr(source, 4) AS INT) % 4) AS rate
  FROM documents
),
h0 AS (SELECT doc_id, source, rate, CAST(doc_id AS UBIGINT) AS x FROM r),
h1 AS (SELECT doc_id, source, rate, xor(x, x >> 30) AS x FROM h0),
h2 AS (SELECT doc_id, source, rate, CAST((
    CAST(x % 4294967296 AS HUGEINT) * '13787848793156543929'::HUGEINT
    + (CAST(x // 4294967296 AS HUGEINT) * '13787848793156543929'::HUGEINT % 4294967296) * 4294967296
  ) % '18446744073709551616'::HUGEINT AS UBIGINT) AS x FROM h1),
h3 AS (SELECT doc_id, source, rate, xor(x, x >> 27) AS x FROM h2),
h4 AS (SELECT doc_id, source, rate, CAST((
    CAST(x % 4294967296 AS HUGEINT) * '10723151780598845931'::HUGEINT
    + (CAST(x // 4294967296 AS HUGEINT) * '10723151780598845931'::HUGEINT % 4294967296) * 4294967296
  ) % '18446744073709551616'::HUGEINT AS UBIGINT) AS x FROM h3),
h5 AS (SELECT doc_id, source, rate, xor(x, x >> 31) AS mx FROM h4)
SELECT doc_id, source
FROM h5 WHERE CAST(mx AS DOUBLE) < rate * 18446744073709551616.0
""",
)
def mixture_sample_docs(sf_dir: str) -> ray.data.Dataset:
    """Deterministic source-mixture sampling (the DoReMi-style static
    data-mixing stage): each source s is kept at rate
    ``1 / (1 + src_num % 4)`` by thresholding ``splitmix64(doc_id)``
    against ``rate * 2^64`` — reproducible across reruns and resumable
    shards (membership depends only on doc_id), no shuffle, one
    streaming filter pass. Oracle-checked bit-exact (the splitmix64
    chain in HUGEINT SQL; the float threshold compare is mirrored
    op-for-op)."""
    from ocr_ray.functions.hashing import mix64

    ds = read_docs(sf_dir, columns=["doc_id", "source"])

    def body(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src_num = pc.cast(
            pc.utf8_slice_codeunits(
                t["source"].combine_chunks()
                if isinstance(t["source"], pa.ChunkedArray)
                else t["source"],
                3,
                1 << 30,
            ),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        rate = 1.0 / (1 + (src_num % 4))
        keep = mix64(ids.astype(np.uint64)).astype(np.float64) < rate * float(2**64)
        return t.select(["doc_id", "source"]).filter(pa.array(keep))

    return ds.map_batches(body, batch_format="pyarrow")


@query(
    "weighted_sample_docs",
    sql="""
WITH h0 AS (SELECT doc_id, n_chars, CAST(doc_id AS UBIGINT) AS x FROM documents),
h1 AS (SELECT doc_id, n_chars, xor(x, x >> 30) AS x FROM h0),
h2 AS (SELECT doc_id, n_chars, CAST((
    CAST(x % 4294967296 AS HUGEINT) * '13787848793156543929'::HUGEINT
    + (CAST(x // 4294967296 AS HUGEINT) * '13787848793156543929'::HUGEINT % 4294967296) * 4294967296
  ) % '18446744073709551616'::HUGEINT AS UBIGINT) AS x FROM h1),
h3 AS (SELECT doc_id, n_chars, xor(x, x >> 27) AS x FROM h2),
h4 AS (SELECT doc_id, n_chars, CAST((
    CAST(x % 4294967296 AS HUGEINT) * '10723151780598845931'::HUGEINT
    + (CAST(x // 4294967296 AS HUGEINT) * '10723151780598845931'::HUGEINT % 4294967296) * 4294967296
  ) % '18446744073709551616'::HUGEINT AS UBIGINT) AS x FROM h3),
h5 AS (SELECT doc_id, n_chars, xor(x, x >> 31) AS mx FROM h4)
SELECT doc_id, n_chars,
  CAST(n_chars AS DOUBLE) / CAST((mx >> 1) + 1 AS DOUBLE) AS priority
FROM h5
ORDER BY priority DESC, doc_id LIMIT 64
""",
)
def weighted_sample_docs(sf_dir: str) -> ray.data.Dataset:
    """Weighted sampling without replacement via PRIORITY SAMPLING
    (Duffield-Lund-Thorup): each doc gets priority ``w / u`` with weight
    ``w = n_chars`` and ``u = splitmix64(doc_id)`` mapped into (0, 2^63];
    the k largest priorities are the sample. Deterministic (u depends only
    on doc_id, so membership is reproducible across reruns and resumable
    shards) and bit-exact against SQL because priority uses only integer
    arithmetic plus ONE IEEE double division — division is correctly
    rounded everywhere, unlike pow/log, so the A-ES exponential-key
    formulation was rejected for the oracle's sake.

    Distributed shape: embarrassingly-parallel per-block priority compute
    + per-block partial top-k, then a tiny global sort/limit over <=
    64*blocks candidate rows — no shuffle of the corpus."""
    import pandas as pd

    from ocr_ray.functions.hashing import mix64

    k = 64
    ds = read_docs(sf_dir, columns=["doc_id", "n_chars"])

    def partial_topk(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        mx = mix64(ids.astype(np.uint64))
        denom = (mx >> np.uint64(1)) + np.uint64(1)  # (0, 2^63], never 0
        prio = w.astype(np.float64) / denom.astype(np.float64)
        if len(prio) > k:
            # argpartition for the k largest, exact order fixed later
            keep = np.argpartition(-prio, k - 1)[:k]
        else:
            keep = np.arange(len(prio))
        return pa.table(
            {
                "doc_id": pa.array(ids[keep]),
                "n_chars": pa.array(w[keep]),
                "priority": pa.array(prio[keep]),
            }
        )

    top = (
        ds.map_batches(partial_topk, batch_format="pyarrow")
        .sort(["priority", "doc_id"], descending=[True, False])
        .limit(k)
    )

    def exact_order(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["priority", "doc_id"], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)

    return top.map_batches(exact_order, batch_format="pandas")


_CURATE_SQL = f"""
WITH u AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000, text FROM documents),
s AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM u),
v AS (SELECT doc_id, count(*) AS n_tokens,
        count(*) FILTER (WHERE tok IN ('the','and','of','a','to','in')) AS n_stop,
        SUM(length(tok)) AS sum_len,
        count(DISTINCT tok) AS n_distinct
      FROM s GROUP BY doc_id),
m AS (SELECT doc_id, n_tokens,
        CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio_en,
        CAST(sum_len AS DOUBLE) / n_tokens AS mean_token_len,
        1.0 - CAST(n_distinct AS DOUBLE) / n_tokens AS dup_word_frac
      FROM v),
q AS (SELECT doc_id,
        0.4 * LEAST(GREATEST(n_tokens / 64.0, 0.0), 1.0)
        + 0.3 * LEAST(GREATEST(stop_ratio_en * 5, 0.0), 1.0)
        + 0.3 * LEAST(GREATEST(1.0 - abs(mean_token_len - 5.0) / 5.0, 0.0), 1.0) AS quality,
        dup_word_frac
      FROM m),
f AS (SELECT u.doc_id, u.text, q.quality FROM u JOIN q USING (doc_id)
      WHERE q.quality >= 0.55 AND q.dup_word_frac <= 0.55),
d AS (SELECT doc_id, text, quality FROM f
      QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1),
r AS (SELECT doc_id, quality, {_PII_AUG_SQL} AS atext FROM d),
x AS (SELECT doc_id, quality,
  regexp_replace(
    regexp_replace(
      regexp_replace(atext, '[A-Za-z0-9_.]+@[A-Za-z0-9.]+', '<EMAIL>', 'g'),
      '555-[0-9]{{4}}', '<PHONE>', 'g'),
    '[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+', '<IP>', 'g') AS redacted
  FROM r)
SELECT doc_id, redacted, quality, 'train' AS split FROM x
WHERE (doc_id * 2654435761) % 4294967296 % 100 < 90
"""


@query("curate_corpus", sql=_CURATE_SQL)
def curate_corpus(sf_dir: str) -> ray.data.Dataset:
    """Flagship composite curation pipeline — what a training-data user
    actually runs, as ONE streaming Dataset: seed exact duplicates
    (doc_id + 2e6 copies), score quality + repetition, gate
    (quality >= 0.55, dup_word_frac <= 0.55), exact-dedup on content md5
    (ONE bucketed shuffle keeps min doc_id; per-batch pre-dedup shrinks
    what the shuffle carries), scrub PII, assign the deterministic hash
    split, and keep the train partition. Every stage is embarrassingly
    parallel except the single dedup shuffle; the DuckDB oracle replays
    the whole chain end-to-end, bit-exact including the float gates."""
    ds = read_docs(sf_dir, columns=["doc_id", "text"])
    return _curate_pipeline(ds)


def _curate_pipeline(ds: ray.data.Dataset) -> ray.data.Dataset:
    """The curation chain over any (doc_id, text) Dataset — shared by
    ``curate_corpus`` (parquet in) and ``build_web_corpus`` (WARC in);
    both share the one end-to-end oracle because the WARC extraction
    leg is itself lossless (oracle-checked)."""
    from ocr_ray.functions.dedup import add_md5, dedup_by_key

    def dup_union(t: pa.Table) -> pa.Table:
        shifted = pc.add(t["doc_id"], pa.scalar(2_000_000, type=pa.int64()))
        return pa.concat_tables(
            [t, t.set_column(t.column_names.index("doc_id"), "doc_id", shifted)]
        )

    def quality_gate(t: pa.Table) -> pa.Table:
        q = textfn.quality_score(t)["quality"]
        dup = textfn.repetition_stats(t)["dup_word_frac"]
        keep = pc.and_(
            pc.greater_equal(q, pa.scalar(0.55)), pc.less_equal(dup, pa.scalar(0.55))
        )
        return t.append_column("quality", q).filter(keep)

    def pre_dedup(t: pa.Table) -> pa.Table:
        # batch-local first-per-md5 (text/quality are constant per md5, and
        # global first == min of batch minima), so the shuffle moves one
        # row per distinct hash per batch.
        part = t.group_by(["content_md5"]).aggregate(
            [("doc_id", "min"), ("text", "min"), ("quality", "min")]
        )
        return pa.table(
            {
                "doc_id": part["doc_id_min"],
                "text": part["text_min"],
                "quality": part["quality_min"],
                "content_md5": part["content_md5"],
            }
        )

    deduped = dedup_by_key(
        ds.map_batches(dup_union, batch_format="pyarrow")
        .map_batches(quality_gate, batch_format="pyarrow")
        .map_batches(add_md5, batch_format="pyarrow")
        .map_batches(pre_dedup, batch_format="pyarrow"),
        key="content_md5",
        order="doc_id",
        num_buckets=8,
    )

    def redact_split(t: pa.Table) -> pa.Table:
        t = pa.table(
            {"doc_id": t["doc_id"], "text": t["text"], "quality": t["quality"]}
        )
        red = textfn.pii_redact(textfn.pii_augment(t.select(["doc_id", "text"])))
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = (ids * 2654435761) % 4294967296 % 100
        out = pa.table(
            {
                "doc_id": t["doc_id"],
                "redacted": red["redacted"],
                "quality": t["quality"],
                "split": pa.array(np.full(len(ids), "train", dtype=object), type=pa.string()),
            }
        )
        return out.filter(pa.array(bucket < 90))

    return deduped.map_batches(redact_split, batch_format="pyarrow")


@query(
    "global_shuffle_docs",
    sql="""
SELECT doc_id,
  CAST(row_number() OVER (
    ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS BIGINT) AS shuffle_rank
FROM documents
""",
)
def global_shuffle_docs(sf_dir: str) -> ray.data.Dataset:
    """Deterministic global training shuffle: order docs by a Knuth
    multiplicative hash of doc_id and emit each doc's global shuffle
    position. Unlike ``random_shuffle`` this is reproducible across
    runs, block layouts and cluster sizes (the property a resumable
    training job needs), and the ORDER itself is oracle-checked because
    the rank is a column. Runs on the distributed histogram-ranking
    primitive — a range-bucket pass + broadcast prefix offsets, so no
    task ever holds the whole corpus (a naive global sort-and-enumerate
    would)."""
    from ocr_ray.functions.ranking import partitioned_rank

    ds = read_docs(sf_dir, columns=["doc_id"])

    def keyed(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "_p": pa.array(np.full(len(ids), "all", dtype=object), type=pa.string()),
                "shuffle_key": pa.array((ids * 2654435761) % 4294967296),
            }
        )

    out = partitioned_rank(
        ds.map_batches(keyed, batch_format="pyarrow"),
        part_col="_p",
        value_col="shuffle_key",
        tiebreak_col="doc_id",
        out_cols=["doc_id"],
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "shuffle_rank": pc.cast(t["rn"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


@query(
    "extract_doc_quality",
    sql="""
WITH src AS (
  SELECT doc_id AS d, string_split(text, ' ') AS ws FROM documents
), w AS (
  SELECT d, unnest(ws) AS word, generate_subscripts(ws, 1) AS i FROM src
), spans AS (
  SELECT d, (i - 1) // 8 AS si, string_agg(word, ' ' ORDER BY i) AS s
  FROM w GROUP BY d, (i - 1) // 8
), tagged AS (
  SELECT d, si,
    CASE WHEN (d + si) % 7 = 0 THEN 'boilerplate'
         WHEN (d + si) % 5 = 3 THEN 'media'
         ELSE 'text' END AS kind, s
  FROM spans
), doc AS (
  SELECT d, string_agg(s, ' ' ORDER BY si) AS dtext
  FROM tagged WHERE kind = 'text' GROUP BY d
), s2 AS (
  SELECT d, unnest(string_split(dtext, ' ')) AS tok FROM doc
), v AS (
  SELECT d, count(*) AS n_tokens,
    count(*) FILTER (WHERE tok IN ('the','and','of','a','to','in')) AS n_stop,
    SUM(length(tok)) AS sum_len
  FROM s2 GROUP BY d
), m AS (
  SELECT d, n_tokens,
    CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio_en,
    CAST(sum_len AS DOUBLE) / n_tokens AS mean_token_len
  FROM v)
SELECT printf('doc-%08d', d) AS doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
  0.4 * LEAST(GREATEST(n_tokens / 64.0, 0.0), 1.0)
  + 0.3 * LEAST(GREATEST(stop_ratio_en * 5, 0.0), 1.0)
  + 0.3 * LEAST(GREATEST(1.0 - abs(mean_token_len - 5.0) / 5.0, 0.0), 1.0) AS quality
FROM m
""",
)
def extract_doc_quality(sf_dir: str) -> ray.data.Dataset:
    """Extraction x curation composite over the INTERLEAVED corpus: run
    the full glyph-decode extraction engine (segment + nearest-template
    recognize + boilerplate strip + reading-order reassembly), join each
    document's recognized text spans back into its main-content text,
    and score quality on the EXTRACTED text — the recognizer output must
    be byte-identical to the withheld source for the float quality terms
    to match the oracle, which replays corpus synthesis + extraction +
    scoring end-to-end in SQL."""
    from ocr_ray.pipelines.extract import extract_documents

    corpus = ensure_corpus(sf_dir, glyphs=True)
    nested = extract_documents(read_documents(corpus), num_buckets=default_buckets())

    scored = nested.map_batches(_extracted_doc_text, batch_format="pyarrow").map_batches(
        textfn.quality_score, batch_format="pyarrow"
    )
    return scored.map_batches(
        lambda t: t.select(["doc_id", "n_tokens", "quality"]), batch_format="pyarrow"
    )


def _extracted_doc_text(t: pa.Table) -> pa.Table:
    """Join each extracted document's ``kind=='text'`` spans (already in
    reading order inside the nested ``spans`` list) into one main-content
    string per doc — vectorized list-flatten + binary_join, no Python per
    row. Docs whose extraction kept no text span are dropped (matching
    the SQL GROUP BY over ``WHERE kind='text'``)."""
    spans = t["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = pc.list_flatten(spans)
    parents = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False).astype(np.int64)
    keep = pc.equal(pc.struct_field(flat, "kind"), "text").to_numpy(zero_copy_only=False)
    idx = np.flatnonzero(keep)
    n = t.num_rows
    counts = np.bincount(parents[idx], minlength=n)
    off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=off[1:])
    vals = pc.take(pc.struct_field(flat, "text"), pa.array(idx, type=pa.int64()))
    la = pa.LargeListArray.from_arrays(pa.array(off, type=pa.int64()), vals)
    joined = pc.binary_join(la, " ")
    return pa.table({"doc_id": t["doc_id"], "text": joined}).filter(pa.array(counts > 0))


@query(
    "extract_training_set",
    sql="""
WITH src AS (
  SELECT doc_id AS d, string_split(text, ' ') AS ws FROM documents
), w AS (
  SELECT d, unnest(ws) AS word, generate_subscripts(ws, 1) AS i FROM src
), spans AS (
  SELECT d, (i - 1) // 8 AS si, string_agg(word, ' ' ORDER BY i) AS s
  FROM w GROUP BY d, (i - 1) // 8
), tagged AS (
  SELECT d, si,
    CASE WHEN (d + si) % 7 = 0 THEN 'boilerplate'
         WHEN (d + si) % 5 = 3 THEN 'media'
         ELSE 'text' END AS kind, s
  FROM spans
), doc AS (
  SELECT d, string_agg(s, ' ' ORDER BY si) AS dtext
  FROM tagged WHERE kind = 'text' GROUP BY d
), u AS (
  SELECT d, dtext FROM doc
  UNION ALL
  SELECT d + 2000000, dtext FROM doc
), s2 AS (
  SELECT d, unnest(string_split(dtext, ' ')) AS tok FROM u
), v AS (
  SELECT d, count(*) AS n_tokens,
    count(*) FILTER (WHERE tok IN ('the','and','of','a','to','in')) AS n_stop,
    SUM(length(tok)) AS sum_len
  FROM s2 GROUP BY d
), q AS (
  SELECT d,
    0.4 * LEAST(GREATEST(n_tokens / 64.0, 0.0), 1.0)
    + 0.3 * LEAST(GREATEST(CAST(n_stop AS DOUBLE) / n_tokens * 5, 0.0), 1.0)
    + 0.3 * LEAST(GREATEST(
        1.0 - abs(CAST(sum_len AS DOUBLE) / n_tokens - 5.0) / 5.0, 0.0), 1.0)
      AS quality
  FROM v
), f AS (
  SELECT u.d, u.dtext FROM u JOIN q USING (d) WHERE q.quality >= 0.55
), dd AS (
  SELECT d, dtext FROM f
  QUALIFY row_number() OVER (PARTITION BY md5(dtext) ORDER BY d) = 1
), toks AS (
  SELECT d, string_split(dtext, ' ') AS tw FROM dd
), wins AS (
  SELECT d, CAST(gs.n AS BIGINT) AS win_start,
    CAST(least(32, len(tw) - gs.n) AS BIGINT) AS n_tokens
  FROM toks, LATERAL (SELECT unnest(range(0, greatest(len(tw)-16, 1), 16)) AS n) gs
)
SELECT printf('doc-%08d', d) AS doc_id, win_start, n_tokens,
  CASE WHEN (d * 2654435761) % 4294967296 % 100 < 90 THEN 'train'
       WHEN (d * 2654435761) % 4294967296 % 100 < 95 THEN 'val'
       ELSE 'test' END AS split
FROM wins
""",
)
def extract_training_set(sf_dir: str) -> ray.data.Dataset:
    """FLAGSHIP end-to-end training-data pipeline over the INTERLEAVED
    corpus, every stage the real distributed operator: glyph-decode
    extraction (segment + nearest-template recognize + boilerplate strip
    + reading-order reassembly) → per-doc quality gate on the EXTRACTED
    text → exact dedup (the corpus is seeded with byte-identical copies
    at doc_id+2e6; batch-local first-per-md5 pre-dedup, then ONE bucketed
    shuffle) → fixed-size token-window packing (32-token windows, stride
    16, byte-slice gather) → deterministic hash train/val/test split.
    One oracle covers the whole path: the SQL replays corpus synthesis,
    extraction, scoring, dedup, windowing and splitting, so a single
    recognition bit-flip or a dropped/duplicated window anywhere breaks
    the hash. This is the pipeline a user points at raw interleaved
    shards to get a training set out (``pipelines/training.py`` lands it
    as a resumable split-partitioned artifact); scale shape is one
    actor-pool map (extraction), one shuffle (dedup), and stateless maps
    elsewhere."""
    return training_windows(sf_dir)


def training_windows(sf_dir: str, *, keep_chunk: bool = False) -> ray.data.Dataset:
    """The ``extract_training_set`` pipeline body (see that docstring).
    ``keep_chunk=True`` also carries each window's token text — the
    payload the on-disk training artifact needs but the oracle row
    (value-hashed) does not."""
    from ocr_ray.functions.dedup import add_md5, dedup_by_key
    from ocr_ray.functions.text import token_windows
    from ocr_ray.pipelines.extract import extract_documents

    corpus = ensure_corpus(sf_dir, glyphs=True)
    nested = extract_documents(read_documents(corpus), num_buckets=default_buckets())
    texts = nested.map_batches(_extracted_doc_text, batch_format="pyarrow")

    def dup_union(t: pa.Table) -> pa.Table:
        # seed exact duplicates: same extracted text under doc_id + 2e6
        # (numeric order == zero-padded string order, so dedup's
        # first-per-key winner matches the SQL's ORDER BY d)
        ids = pc.cast(pc.utf8_slice_codeunits(t["doc_id"], 4, 12), pa.int64())
        shifted = pc.binary_join_element_wise(
            pa.array(np.full(t.num_rows, "doc", dtype=object), type=pa.string()),
            pc.utf8_lpad(
                pc.cast(pc.add(ids, pa.scalar(2_000_000, type=pa.int64())), pa.string()),
                8,
                "0",
            ),
            "-",
        )
        return pa.concat_tables(
            [t, t.set_column(t.column_names.index("doc_id"), "doc_id", shifted)]
        )

    def quality_gate(t: pa.Table) -> pa.Table:
        q = textfn.quality_score(t)["quality"]
        return t.filter(pc.greater_equal(q, pa.scalar(0.55)))

    def pre_dedup(t: pa.Table) -> pa.Table:
        # batch-local first-per-md5 (text constant per md5; global first
        # == min of batch minima) so the shuffle moves one row per
        # distinct hash per batch
        part = t.group_by(["content_md5"]).aggregate(
            [("doc_id", "min"), ("text", "min")]
        )
        return pa.table(
            {
                "doc_id": part["doc_id_min"],
                "text": part["text_min"],
                "content_md5": part["content_md5"],
            }
        )

    deduped = dedup_by_key(
        texts.map_batches(dup_union, batch_format="pyarrow")
        .map_batches(quality_gate, batch_format="pyarrow")
        .map_batches(add_md5, batch_format="pyarrow")
        .map_batches(pre_dedup, batch_format="pyarrow"),
        key="content_md5",
        order="doc_id",
        num_buckets=8,
    )

    def windows_split(t: pa.Table) -> pa.Table:
        w = token_windows(
            pa.table({"doc_id": t["doc_id"], "text": t["text"]}),
            window=32,
            stride=16,
        )
        ids = (
            pc.cast(pc.utf8_slice_codeunits(w["doc_id"], 4, 12), pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        bucket = (ids * 2654435761) % 4294967296 % 100
        split = np.where(
            bucket < 90, "train", np.where(bucket < 95, "val", "test")
        ).astype(object)
        cols = {
            "doc_id": w["doc_id"],
            "win_start": pc.cast(w["win_start"], pa.int64()),
            "n_tokens": pc.cast(w["n_tokens"], pa.int64()),
            "split": pa.array(split, type=pa.string()),
        }
        if keep_chunk:
            cols["chunk"] = w["chunk"]
        return pa.table(cols)

    return deduped.map_batches(windows_split, batch_format="pyarrow")


@query("kmeans_embeddings", sql=None)
def kmeans_embeddings(sf_dir: str) -> ray.data.Dataset:
    """Distributed spherical k-means over the embeddings table (k=10,
    3 Lloyd iterations, seeded from a row-group-pruned systematic
    sample) followed by a final assignment pass — the IVF centroid
    TRAINING step at scale: every iteration streams the table once,
    reduces k partial rows per batch through a distributed groupby-sum,
    and driver state stays k x d. Iterative, so no SQL oracle; Lloyd
    monotonicity + planted-cluster recovery are asserted in tests AND the
    query self-checks the Lloyd invariants at RUN time (objective mass
    non-decreasing across iterations, centroids unit-norm) and raises on
    violation. The output is additionally SELF-VERIFYING: a
    deterministic sample of vectors (vec_id % 97 == 0) is re-scored on
    the driver with an independent numpy argmax against the fitted
    centroids, and every row carries ``gate_ok`` = (the Lloyd invariants
    held) AND (the sampled assignments and cosines matched) — a
    sample-bounded exactness gate visible in the returned table."""
    from ocr_ray.functions.ann import assign_clusters, farthest_point_init, kmeans_fit
    from ocr_ray.sources.readers import sample_parquet_rows

    sample = sample_parquet_rows(
        f"{sf_dir}/embeddings.parquet", 256, columns=["embedding"]
    ).to_pandas()
    init = farthest_point_init(
        np.stack(sample["embedding"].to_numpy()).astype(np.float64), k=10
    )
    ds = read_embeddings(sf_dir, columns=["vec_id", "embedding"])
    cent, _hist = kmeans_fit(ds, init, iters=3)
    if any(b < a - 1e-6 * abs(a) for a, b in zip(_hist, _hist[1:])):
        raise RuntimeError(f"kmeans_embeddings: Lloyd objective decreased: {_hist}")
    norms = np.linalg.norm(cent, axis=1)
    if not np.allclose(norms, 1.0, atol=1e-9):
        raise RuntimeError(f"kmeans_embeddings: centroids not unit-norm: {norms}")
    cent_ref = ray.put(cent)
    out = assign_clusters(
        read_embeddings(sf_dir, columns=["vec_id", "embedding"]), cent_ref
    ).materialize()

    # sample-bounded gate: deterministic vector sample re-scored on the
    # driver with an independent numpy path (no O(n) driver state)
    def check(eng, raw):
        for vec_id, cid, cs in zip(eng["vec_id"], eng["cid"], eng["cos_sim"]):
            x = np.asarray(raw.loc[int(vec_id), "embedding"], dtype=np.float64)
            x = x / max(np.linalg.norm(x), 1e-300)
            sims = cent @ x
            # tolerance on the argmax too: engine (gemm) and driver (gemv)
            # reduction orders differ by ulps, so near-equidistant vectors
            # may legally flip — require the assigned centroid to be
            # within 1e-9 of the best, not equal to the driver's argmax
            if (
                float(sims[int(cid)]) < float(sims.max()) - 1e-9
                or abs(float(sims[int(cid)]) - float(cs)) > 1e-9
            ):
                return False
        return True

    return gate_by_sampled_recheck(
        out,
        read_embeddings(sf_dir, columns=["vec_id", "embedding"]),
        id_col="vec_id",
        checker=check,
    )


@query(
    "embedding_dedup_clusters",
    sql="""
SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(vec_id AS BIGINT) AS cluster_id
FROM embeddings WHERE list_inner_product(embedding, embedding) > 0
UNION ALL
SELECT CAST(vec_id + 1000000 AS BIGINT), CAST(vec_id AS BIGINT)
FROM embeddings WHERE list_inner_product(embedding, embedding) > 0
""",
)
def embedding_dedup_clusters(sf_dir: str) -> ray.data.Dataset:
    """Semantic (embedding-cosine) dedup clusters: the verified near-dup
    pair set (``embedding_neardup_pairs``) is the edge list; alternating
    large-star/small-star distributed connected components label every
    involved vector with its cluster's smallest vec_id — the semantic
    near-dedup a training corpus runs after MinHash-style lexical dedup.

    SQL-oracled through the seeded-population theorem (see
    ``embedding_neardup_pairs``): the exact edge set is the planted
    (v, v+offset) pairs, so components are exactly {v, v+offset} labeled
    v. Multi-hop component merging is exercised bit-exactly by the
    minhash cluster oracle (recursive-CTE reference); here the oracle
    pins the edge set AND the label convention end to end."""
    from ocr_ray.functions.graph import connected_components

    pairs = embedding_neardup_pairs(sf_dir)
    labels = connected_components(pairs, left_col="vec_a", right_col="vec_b")
    return labels.map_batches(
        lambda t: pa.table(
            {"vec_id": t["node"], "cluster_id": pc.cast(t["component"], pa.int64())}
        ),
        batch_format="pyarrow",
    )


# ONE definition of the BM25 scoring CTEs (Lucene idf, k1=1.2, b=0.75,
# fixed query terms) shared by the bm25_search and hybrid_rrf_search
# oracles — a formula change edits exactly one string.
_BM25_SC_SQL = """WITH s AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
t AS (SELECT doc_id, count(*) AS dl,
        count(*) FILTER (WHERE tok = 'spark') AS tf0,
        count(*) FILTER (WHERE tok = 'join') AS tf1,
        count(*) FILTER (WHERE tok = 'window') AS tf2
      FROM s GROUP BY doc_id),
g AS (SELECT count(*) AS n, SUM(dl) AS sum_dl,
        count(*) FILTER (WHERE tf0 > 0) AS df0,
        count(*) FILTER (WHERE tf1 > 0) AS df1,
        count(*) FILTER (WHERE tf2 > 0) AS df2 FROM t),
sc AS (SELECT t.doc_id,
    ln((g.n - g.df0 + 0.5) / (g.df0 + 0.5) + 1.0)
      * ((CAST(t.tf0 AS DOUBLE) * 2.2) / (t.tf0 + 1.2 * (0.25 + 0.75 * (t.dl / (CAST(g.sum_dl AS DOUBLE) / g.n)))))
  + ln((g.n - g.df1 + 0.5) / (g.df1 + 0.5) + 1.0)
      * ((CAST(t.tf1 AS DOUBLE) * 2.2) / (t.tf1 + 1.2 * (0.25 + 0.75 * (t.dl / (CAST(g.sum_dl AS DOUBLE) / g.n)))))
  + ln((g.n - g.df2 + 0.5) / (g.df2 + 0.5) + 1.0)
      * ((CAST(t.tf2 AS DOUBLE) * 2.2) / (t.tf2 + 1.2 * (0.25 + 0.75 * (t.dl / (CAST(g.sum_dl AS DOUBLE) / g.n)))))
  AS score
  FROM t, g)"""


@query(
    "bm25_search",
    sql=_BM25_SC_SQL
    + """
SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT 20
""",
)
def bm25_search(sf_dir: str) -> ray.data.Dataset:
    """BM25 keyword search (Lucene idf variant, k1=1.2, b=0.75) for the
    fixed query terms (spark, join, window) — the lexical retrieval leg
    of a training-data search stack. Two streaming passes: (1) per-doc
    term frequencies + doc length reduce to FOUR corpus scalars
    (N, sum_dl, df per term) via one aggregate; (2) scores computed per
    batch against the broadcast scalars with per-batch partial top-20,
    so the final sort moves ~20 rows per block. Float op order mirrors
    the SQL oracle exactly (bit-exact scores)."""
    import math

    from ray.data.aggregate import Count, Sum

    TERMS = ("spark", "join", "window")
    K1, B = 1.2, 0.75

    def tf_stats(t: pa.Table) -> pa.Table:
        parents, counts, flat = textfn.split_tokens(t["text"])
        cols: dict = {"doc_id": t["doc_id"], "dl": pa.array(counts)}
        for i, term in enumerate(TERMS):
            hit = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            cols[f"tf{i}"] = pa.array(
                np.bincount(parents, weights=hit, minlength=t.num_rows).astype(np.int64)
            )
        return pa.table(cols)

    ds = read_docs(sf_dir, columns=["doc_id", "text"])
    stats = ds.map_batches(tf_stats, batch_format="pyarrow")

    def hits(t: pa.Table) -> pa.Table:
        out = {"dl": t["dl"]}
        for i in range(len(TERMS)):
            out[f"hit{i}"] = pc.cast(pc.greater(t[f"tf{i}"], 0), pa.int64())
        return pa.table(out)

    g = stats.map_batches(hits, batch_format="pyarrow").aggregate(
        Count(), Sum("dl"), *[Sum(f"hit{i}") for i in range(len(TERMS))]
    )
    n = g["count()"]
    avgdl = float(g["sum(dl)"]) / n
    idf = [
        math.log((n - g[f"sum(hit{i})"] + 0.5) / (g[f"sum(hit{i})"] + 0.5) + 1.0)
        for i in range(len(TERMS))
    ]

    def score(t: pa.Table) -> pa.Table:
        dl = t["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        denom_norm = K1 * (0.25 + B * (dl / avgdl))
        s = np.zeros(t.num_rows, dtype=np.float64)
        for i in range(len(TERMS)):
            tf = t[f"tf{i}"].to_numpy(zero_copy_only=False).astype(np.float64)
            s = s + idf[i] * ((tf * 2.2) / (tf + denom_norm))
        top = np.argsort(-s, kind="stable")[:20]
        return pa.table(
            {"doc_id": pc.take(t["doc_id"], pa.array(top)), "score": pa.array(s[top])}
        )

    scored = stats.map_batches(score, batch_format="pyarrow")
    return scored.sort(["score", "doc_id"], descending=[True, False]).limit(20)


@query(
    "order_price_dense_rank",
    sql="""
SELECT o_orderkey, o_orderstatus,
  CAST(DENSE_RANK() OVER w AS BIGINT) AS dense_rank,
  CUME_DIST() OVER w AS cume_dist
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice)
""",
)
def order_price_dense_rank(sf_dir: str) -> ray.data.Dataset:
    """Tie-aware window functions — DENSE_RANK and CUME_DIST per status —
    without any task holding a partition: (1) map-side combine +
    groupby reduces rows to DISTINCT (status, price) pairs with counts;
    (2) the distinct table runs the histogram ranking primitive (rank of
    a distinct value == dense rank) and the distributed prefix-sum
    primitive (running count strictly below == CUME_DIST numerator minus
    peers); (3) one composite-key hash join attaches the two window
    values back to the rows. Low-cardinality PARTITION BY with millions
    of rows per partition is exactly the shape a naive map_groups window
    gets wrong at scale."""
    from ray.data.aggregate import Sum

    from ocr_ray.functions.ranking import partitioned_prefix_sum, partitioned_rank

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus", "o_totalprice"])

    def combine(t: pa.Table) -> pa.Table:
        part = (
            t.select(["o_orderstatus", "o_totalprice"])
            .group_by(["o_orderstatus", "o_totalprice"])
            .aggregate([("o_totalprice", "count")])
        )
        return pa.table(
            {
                "o_orderstatus": part["o_orderstatus"],
                "o_totalprice": part["o_totalprice"],
                "cnt": pc.cast(part["o_totalprice_count"], pa.int64()),
            }
        )

    # materialize the DISTINCT pair set once (object store, spillable —
    # not a driver materialization): downstream, the two primitives plus
    # the totals aggregate would otherwise re-execute the read + combine
    # + groupby chain ~6x (each primitive runs a histogram pass and a
    # shuffle over its input). Size is bounded by distinct (partition,
    # value) pairs, not rows — but on a near-unique value column that IS
    # ~rows, so the fold must be the bucketed one (Dataset.aggregate's
    # per-group Python fold measured 22s for 150k near-unique pairs at
    # sf0.1; bucketed: 0.6s).
    from ocr_ray.functions.relational import bucketed_aggregate

    pairs = bucketed_aggregate(
        orders.map_batches(combine, batch_format="pyarrow"),
        keys=["o_orderstatus", "o_totalprice"],
        aggs={"cnt": ("cnt", "sum")},
    ).materialize()

    # ONE scan pass computes BOTH window quantities over the distinct
    # table (r5: was partitioned_rank + partitioned_prefix_sum — two
    # histogram passes and two shuffles over the same rows): with a unit
    # weight alongside cnt, rank of a distinct value = rows strictly
    # below + 1 = running_before_one + 1, and the cume_dist numerator
    # uses running_before(cnt) + cnt.
    def add_one(t: pa.Table) -> pa.Table:
        return t.append_column(
            "one", pa.array(np.ones(t.num_rows, dtype=np.int64))
        )

    scanned = partitioned_prefix_sum(
        pairs.map_batches(add_one, batch_format="pyarrow"),
        part_col="o_orderstatus",
        value_col="o_totalprice",
        tiebreak_col="o_totalprice",
        weight_col="cnt",
        extra_weight_cols=("one",),
        out_cols=["o_orderstatus", "o_totalprice", "cnt"],
    )

    # per-status TOTAL row counts (3 statuses) — broadcast denominator.
    # mapside_count_sum, not Dataset.groupby().aggregate: the latter's
    # sort-aggregate over the 150k materialized pairs measured 1.67 s
    # for a 3-row result; the per-batch Arrow combine folds it in ~0.3 s
    from ocr_ray.pipelines.queries._shared import mapside_count_sum

    totals = {
        r["o_orderstatus"]: r["cnt"]
        for r in mapside_count_sum(
            pairs, keys=["o_orderstatus"], sum_cols=["cnt"]
        ).take_all()
    }
    totals_ref = ray.put(totals)

    def window_vals(t: pa.Table, *, tref) -> pa.Table:
        tot = ray.get(tref)
        # dictionary-encode + numpy index: the Python lookup runs once per
        # DISTINCT status (3), not once per row (r4 verdict consistency nit)
        col = t["o_orderstatus"]
        enc = (
            col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        ).dictionary_encode()
        lut = np.array([tot[s] for s in enc.dictionary.to_pylist()], dtype=np.int64)
        n = lut[enc.indices.to_numpy(zero_copy_only=False)]
        rb = t["running_before"].to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "o_orderstatus": t["o_orderstatus"],
                "o_totalprice": t["o_totalprice"],
                "dense_rank": pc.cast(
                    pc.add(t["running_before_one"], pa.scalar(1, pa.int64())),
                    pa.int64(),
                ),
                "cume_dist": pa.array((rb + cnt).astype(np.float64) / n.astype(np.float64)),
            }
        )

    winvals = scanned.map_batches(
        window_vals, batch_format="pyarrow", fn_kwargs={"tref": totals_ref}
    )

    joined = hash_join(
        orders,
        winvals,
        on=["o_orderstatus", "o_totalprice"],
        num_buckets=default_buckets(),
        left_schema=pa.schema(
            {
                "o_orderkey": pa.int64(),
                "o_orderstatus": pa.string(),
                "o_totalprice": pa.float64(),
            }
        ),
        right_schema=pa.schema(
            {
                "o_orderstatus": pa.string(),
                "o_totalprice": pa.float64(),
                "dense_rank": pa.int64(),
                "cume_dist": pa.float64(),
            }
        ),
    )
    return joined.map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "o_orderstatus": t["o_orderstatus"],
                "dense_rank": pc.cast(t["dense_rank"], pa.int64()),
                "cume_dist": t["cume_dist"],
            }
        ),
        batch_format="pyarrow",
    )


@query(
    "validate_lineitem",
    sql="""
SELECT 'qty_out_of_range' AS rule,
  CAST(count(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 45) AS BIGINT) AS n_violations,
  CAST(count(*) AS BIGINT) AS n_checked FROM lineitem
UNION ALL
SELECT 'disc_out_of_range',
  CAST(count(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.08) AS BIGINT),
  CAST(count(*) AS BIGINT) FROM lineitem
UNION ALL
SELECT 'nonpositive_price',
  CAST(count(*) FILTER (WHERE l_extendedprice <= 0) AS BIGINT),
  CAST(count(*) AS BIGINT) FROM lineitem
UNION ALL
SELECT 'null_returnflag',
  CAST(count(*) FILTER (WHERE l_returnflag IS NULL) AS BIGINT),
  CAST(count(*) AS BIGINT) FROM lineitem
UNION ALL
SELECT 'orphan_orderkey',
  CAST(count(*) FILTER (WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS BIGINT),
  CAST(count(*) AS BIGINT) FROM lineitem
""",
)
def validate_lineitem(sf_dir: str) -> pa.Table:
    """Data-quality gate (expectations-style): per-rule violation counts
    over lineitem — range rules, null rule, cross-table FK orphans — the
    validation stage a pipeline runs before accepting a new partition.

    Distributed shape: ONE streaming pass; each batch reduces to 5
    partial-count rows (rule, violations, checked), the FK rule probes a
    broadcast sorted key array (``ray.put`` once; swap in the bloom
    filter from ``functions/bloom.py`` when the key side outgrows
    broadcast), and a 5-group groupby-sum finishes. No shuffle of data
    rows, only of 5-row partials."""
    from ray.data.aggregate import Sum

    okeys = np.sort(
        load_small_table(sf_dir, "orders", ["o_orderkey"])["o_orderkey"]
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    okeys_ref = ray.put(okeys)

    class RuleCounts:
        def __init__(self, keys_ref):
            self.keys = ray.get(keys_ref) if not isinstance(keys_ref, np.ndarray) else keys_ref

        def __call__(self, t: pa.Table) -> pa.Table:
            qty = t["l_quantity"].to_numpy(zero_copy_only=False)
            disc = t["l_discount"].to_numpy(zero_copy_only=False)
            price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
            rflag = t["l_returnflag"]
            ok_idx = np.searchsorted(self.keys, t["l_orderkey"].to_numpy(zero_copy_only=False))
            ok_idx = np.minimum(ok_idx, len(self.keys) - 1)
            orphan = self.keys[ok_idx] != t["l_orderkey"].to_numpy(zero_copy_only=False)
            n = t.num_rows
            viol = [
                int(((qty < 1) | (qty > 45)).sum()),
                int(((disc < 0) | (disc > 0.08)).sum()),
                int((price <= 0).sum()),
                int(rflag.null_count),
                int(orphan.sum()),
            ]
            return pa.table(
                {
                    "rule": pa.array(
                        [
                            "qty_out_of_range",
                            "disc_out_of_range",
                            "nonpositive_price",
                            "null_returnflag",
                            "orphan_orderkey",
                        ]
                    ),
                    "viol": pa.array(viol, type=pa.int64()),
                    "checked": pa.array([n] * 5, type=pa.int64()),
                }
            )

    ds = read_table(
        sf_dir,
        "lineitem",
        columns=[
            "l_orderkey",
            "l_quantity",
            "l_discount",
            "l_extendedprice",
            "l_returnflag",
        ],
    )
    partials = ds.map_batches(RuleCounts, fn_constructor_args=(okeys_ref,),
                              batch_format="pyarrow", concurrency=pool_size())
    agg = partials.groupby("rule").aggregate(Sum("viol"), Sum("checked")).to_pandas()
    return pa.table(
        {
            "rule": pa.array(agg["rule"].tolist()),
            "n_violations": pa.array(agg["sum(viol)"].astype(np.int64)),
            "n_checked": pa.array(agg["sum(checked)"].astype(np.int64)),
        }
    )




@query("build_web_corpus", sql=_CURATE_SQL)
def build_web_corpus(sf_dir: str) -> ray.data.Dataset:
    """CAPSTONE composite — the whole web-corpus build as ONE streaming
    Dataset: genuine WARC/1.0 ingest (HTTP parse, gzip/chunked decode,
    HTML boilerplate strip via ``WarcMainExtractor``) feeding the full
    curation chain (quality + repetition gates, exact dedup on content
    hash, PII scrub, deterministic split) — crawl archive in, training
    partition out, with one shuffle total (the dedup fold).

    Exactness: the WARC->text leg is lossless (its own oracle), so this
    shares ``curate_corpus``'s oracle SQL verbatim; the driver's hash compare
    covers the entire four-protocol-layer + curation path, and a bug
    anywhere in WARC framing, HTTP decoding, HTML stripping, scoring,
    dedup, redaction, or the split changes the output hash."""
    from ocr_ray.stages.warc import WarcMainExtractor, attach_warc_payloads

    ds = read_docs(sf_dir, columns=["doc_id", "text"])
    with_payloads = ds.map_batches(
        attach_warc_payloads, batch_format="pyarrow", batch_size=128
    )
    from ocr_ray.pipelines.queries._shared import stateless_stage

    extracted = stateless_stage(with_payloads, WarcMainExtractor, batch_size=4)

    def as_docs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "text": pc.cast(t["extracted_text"], pa.string()),
            }
        )

    return _curate_pipeline(extracted.map_batches(as_docs, batch_format="pyarrow"))

