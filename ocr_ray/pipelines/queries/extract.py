"""Query registry section: extract (split from the former monolithic queries.py)."""

from __future__ import annotations

import numpy as np

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ocr_ray.corpus import ensure_corpus
from ocr_ray.pipelines.extract import extract_spans_flat
from ocr_ray.sizing import default_buckets
from ocr_ray.sources import read_documents

from ocr_ray.pipelines.queries._shared import query


# ---------------------------------------------------------------------------
# Extraction (flagship) — SQL oracle reproduces corpus synthesis + extraction.
# ---------------------------------------------------------------------------

_EXTRACT_SQL = """
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
         ELSE 'text' END AS kind,
    CASE WHEN (d + si) % 7 <> 0 AND (d + si) % 5 = 3 THEN '' ELSE s END AS text,
    CASE WHEN (d + si) % 7 <> 0 AND (d + si) % 5 = 3
         THEN printf('m-%d', (d * 1000 + si) % 9973) ELSE '' END AS media_ref
  FROM spans
)
SELECT printf('doc-%08d', d) AS doc_id, kind, text, media_ref,
       CAST(row_number() OVER (PARTITION BY d ORDER BY si) - 1 AS INTEGER) AS "offset"
FROM tagged WHERE kind <> 'boilerplate'
"""


@query("extract_spans", sql=_EXTRACT_SQL)
def extract_spans(sf_dir: str) -> ray.data.Dataset:
    """Full extraction over the plain (no-glyph) interleaved corpus; flat output."""
    corpus = ensure_corpus(sf_dir, glyphs=False)
    return extract_spans_flat(read_documents(corpus), num_buckets=default_buckets())


@query("extract_glyphs", sql=_EXTRACT_SQL)
def extract_glyphs(sf_dir: str) -> ray.data.Dataset:
    """Extraction over the glyph corpus: encoded spans must decode (segment +
    nearest-template recognize) back to the exact withheld text, so the
    oracle is the same SQL as ``extract_spans``."""
    corpus = ensure_corpus(sf_dir, glyphs=True)
    return extract_spans_flat(read_documents(corpus), num_buckets=default_buckets())


@query("extract_spans_local", sql=_EXTRACT_SQL)
def extract_spans_local_q(sf_dir: str) -> ray.data.Dataset:
    """Zero-shuffle extraction (shard-aligned path): input rows are whole
    documents, so reassembly is batch-local — no groupby anywhere. Same
    output (and oracle) as ``extract_glyphs``, different physical plan."""
    from ocr_ray.pipelines.extract import extract_documents_local
    from ocr_ray.stages.explode import explode_documents

    corpus = ensure_corpus(sf_dir, glyphs=True)
    nested = extract_documents_local(read_documents(corpus))
    return nested.map_batches(
        explode_documents, batch_format="pyarrow", fn_kwargs={"sentinels": False}
    )


@query(
    "extract_media_index",
    sql="""
WITH src AS (
  SELECT doc_id AS d, string_split(text, ' ') AS ws FROM documents
), w AS (
  SELECT d, generate_subscripts(ws, 1) AS i FROM src
), spans AS (
  SELECT d, (i - 1) // 8 AS si FROM w GROUP BY d, (i - 1) // 8
)
SELECT printf('doc-%08d', d) AS doc_id,
       CAST(count(*) FILTER (WHERE (d + si) % 7 <> 0 AND (d + si) % 5 = 3) AS BIGINT) AS n_media,
       CAST(count(*) FILTER (WHERE (d + si) % 7 <> 0 AND (d + si) % 5 <> 3) AS BIGINT) AS n_content
FROM spans GROUP BY d
""",
)
def extract_media_index(sf_dir: str) -> ray.data.Dataset:
    """Per-doc media/content span counts from the extracted corpus."""
    corpus = ensure_corpus(sf_dir, glyphs=False)
    flat = extract_spans_flat(read_documents(corpus), num_buckets=default_buckets())

    def counts(t: pa.Table) -> pa.Table:
        # per-batch partial: one row per (doc_id) per batch
        media = pc.cast(pc.equal(t["kind"], "media"), pa.int64())
        g = (
            pa.table({"doc_id": t["doc_id"], "is_media": media, "one": pa.array(np.ones(t.num_rows, dtype=np.int64))})
            .group_by("doc_id")
            .aggregate([("is_media", "sum"), ("one", "sum")])
        )
        return g.rename_columns(["doc_id", "n_media", "n_total"])

    from ocr_ray.functions.relational import bucketed_aggregate

    # per-doc counts: doc cardinality scales with the corpus -> bucketed fold
    agg = bucketed_aggregate(
        flat.map_batches(counts, batch_format="pyarrow"),
        keys=["doc_id"],
        aggs={"n_media": ("n_media", "sum"), "n_total": ("n_total", "sum")},
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_media": pc.cast(t["n_media"], pa.int64()),
                "n_content": pc.cast(pc.subtract(t["n_total"], t["n_media"]), pa.int64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


