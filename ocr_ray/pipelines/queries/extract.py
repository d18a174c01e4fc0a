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




@query("extract_snapshot_spans", sql=_EXTRACT_SQL)
def extract_snapshot_spans(sf_dir: str) -> ray.data.Dataset:
    """TIME-TRAVEL isolation over the resumable sink: extract -> commit
    snapshot v1 (hard-link pinned, ``state/manifest.snapshot_commit``) ->
    DESTRUCTIVELY rewrite one committed partition in place (rows dropped)
    -> commit v2 -> read the table AS OF v1. The query returns the v1
    read, so the oracle (the plain extraction SQL) passes ONLY if the
    snapshot is fully isolated from the later rewrite. Runtime gates
    assert the live table really lost rows and that ``snapshot_diff``
    pins exactly the rewritten partition — a silent-sharing bug in the
    link/commit protocol fails loudly here, not just in unit tests."""
    import shutil
    import tempfile

    from ocr_ray.pipelines.extract import extract_and_write
    from ocr_ray.sources.readers import read_documents as _read_docs
    from ocr_ray.stages.explode import explode_documents
    from ocr_ray.state.manifest import (
        ResumableSink,
        load_manifest,
        read_fragments,
        read_snapshot,
        snapshot_commit,
        snapshot_diff,
    )

    corpus = ensure_corpus(sf_dir, glyphs=False)
    out = tempfile.mkdtemp(prefix="ocr_ray_snap_")
    shutil.rmtree(out)  # extract_and_write owns layout creation
    try:
        manifest, _ = extract_and_write(
            _read_docs(corpus), out, num_parts=8, num_buckets=8
        )
        total_rows = int(manifest["row_count"].sum())
        v1 = snapshot_commit(out, note="post-extract")

        # destructive in-place rewrite: drop half the rows of one partition
        # (format-dispatched like delete_keys — the sink may have committed
        # Lance fragments when that package is importable)
        man = load_manifest(out)
        part = sorted(man)[0]
        fmt = man[part].get("format", "parquet")
        if fmt == "lance":  # pragma: no cover - lance absent in this sandbox
            import lance as _lance

            frag = _lance.dataset(man[part]["file"]).to_table()
        else:
            import pyarrow.parquet as _pq

            frag = _pq.read_table(man[part]["file"])
        kept = frag.slice(0, frag.num_rows // 2)
        ResumableSink(out, data_format=fmt).write(kept, part)
        v2 = snapshot_commit(out, note="post-truncate")

        d = snapshot_diff(out, v1, v2)
        if d["changed"] != [part] or d["added"] or d["removed"]:
            raise AssertionError(f"snapshot_diff should pin part {part}: {d}")
        live_rows = read_fragments(
            [r["file"] for r in load_manifest(out).values()]
        ).count()
        if live_rows != total_rows - (frag.num_rows - kept.num_rows):
            raise AssertionError(
                f"live table should have lost rows: {live_rows} vs {total_rows}"
            )
        return (
            read_snapshot(out, v1)
            .map_batches(
                explode_documents, batch_format="pyarrow", fn_kwargs={"sentinels": False}
            )
            .materialize()
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


_EXTRACT_DELETE_SQL = (
    "WITH base AS (" + _EXTRACT_SQL + ") SELECT * FROM base "
    "WHERE CAST(substr(doc_id, 5) AS BIGINT) % 97 <> 0"
)


@query("extract_delete_doc_spans", sql=_EXTRACT_DELETE_SQL)
def extract_delete_doc_spans(sf_dir: str) -> ray.data.Dataset:
    """Targeted DELETE over the extraction table (GDPR-takedown shape):
    extract -> ``state.manifest.delete_keys`` removes every doc whose id
    is 0 mod 97, rewriting ONLY the fragments the partition law says can
    hold an affected key (a runtime gate asserts exactly those and no
    others were touched) -> read back. The oracle is the extraction SQL
    minus the deleted docs, so an over-delete, under-delete, or a
    rewrite that corrupts an untouched sibling row all fail the hash."""
    import shutil
    import tempfile

    import pyarrow.parquet as _pq

    from ocr_ray.pipelines.extract import extract_and_write
    from ocr_ray.sources.readers import read_documents as _read_docs
    from ocr_ray.stages.explode import explode_documents
    from ocr_ray.state.manifest import (
        delete_keys,
        load_manifest,
        partition_of,
        read_fragments,
    )

    corpus = ensure_corpus(sf_dir, glyphs=False)
    raw = _pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    ids = raw["doc_id"].to_numpy(zero_copy_only=False)
    victims = [f"doc-{int(d):08d}" for d in ids if int(d) % 97 == 0]

    out = tempfile.mkdtemp(prefix="ocr_ray_del_")
    shutil.rmtree(out)
    try:
        manifest, _ = extract_and_write(
            _read_docs(corpus), out, num_parts=8, num_buckets=8
        )
        total = int(manifest["row_count"].sum())
        planned = sorted(set(partition_of(victims, 8).tolist()))
        result = delete_keys(out, victims)
        if sorted(result["partition"]) != planned:
            raise AssertionError(
                f"delete touched {sorted(result['partition'])}, law says {planned}"
            )
        if int(result["deleted"].sum()) != len(victims):
            raise AssertionError(
                f"deleted {int(result['deleted'].sum())} rows for "
                f"{len(victims)} victim docs"
            )
        live = read_fragments([r["file"] for r in load_manifest(out).values()])
        if live.count() != total - len(victims):
            raise AssertionError("live row count does not reflect the delete")
        return (
            live.map_batches(
                explode_documents, batch_format="pyarrow", fn_kwargs={"sentinels": False}
            )
            .materialize()
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


@query(
    "segment_cc_docs",
    sql="SELECT doc_id, text AS recovered_text FROM documents",
)
def segment_cc_docs(sf_dir: str) -> ray.data.Dataset:
    """The north rule's segmentation leg stated literally: documents
    render as 2D glyph BITMAP PAGES (deterministic connected-blob font,
    word-wrapped layout) and the engine recovers the text by REAL
    CONNECTED-COMPONENT segmentation — vectorized min-label propagation
    over the pixel grid — clustering the component boxes into LINE/WORD
    boxes from geometry alone, and recognizing each component by
    feature-vector nearest-template matching (bbox-normalized pixel
    mask, Hamming distance). The oracle is brutal: recovered_text must
    equal the source text byte-for-byte for every document, so any bug
    in labeling, box clustering, reading order, word-gap detection or
    template matching fails the hash (``stages/ccseg.py``)."""
    from ocr_ray.pipelines.queries._shared import read_docs
    from ocr_ray.stages.ccseg import attach_page_bitmaps, segment_batch

    docs = read_docs(sf_dir, columns=["doc_id", "text"])
    pages = docs.map_batches(attach_page_bitmaps, batch_format="pyarrow", batch_size=256)
    # task pool, not actor pool: the font/template state is process-cached
    # (ccseg.font()), so tasks pay zero spin-up and scale with free CPUs
    return pages.map_batches(segment_batch, batch_format="pyarrow", batch_size=256)


_CAPTION_SQL = """
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
), final AS (
  SELECT d, kind, text, media_ref,
    row_number() OVER (PARTITION BY d ORDER BY si) - 1 AS off
  FROM tagged WHERE kind <> 'boilerplate'
), paired AS (
  SELECT d, kind, media_ref, off,
    LEAD(kind) OVER (PARTITION BY d ORDER BY off) AS next_kind,
    LEAD(text) OVER (PARTITION BY d ORDER BY off) AS next_text
  FROM final
)
SELECT printf('doc-%08d', d) AS doc_id, media_ref,
  CAST(off AS INTEGER) AS "offset",
  CASE WHEN next_kind = 'text' THEN next_text ELSE '' END AS caption
FROM paired WHERE kind = 'media'
"""


@query("extract_media_captions", sql=_CAPTION_SQL)
def extract_media_captions(sf_dir: str) -> ray.data.Dataset:
    """Image-text PAIRING over the interleaved corpus — the multimodal
    training-set primitive (LAION-style): every media span paired with
    the text span that FOLLOWS it in reading order (the figure-caption
    heuristic; empty when the next span is media or the document ends).

    The pairing runs on the REAL extraction output in its NESTED form
    (``extract_documents`` — spans already reassembled per doc), so
    adjacency is list-local and costs ZERO shuffles beyond extraction's
    own: one vectorized pass over the flattened span buffers (parent
    offsets from the list layout, next-span = flat index + 1 within the
    same parent). The oracle replays synthesis + extraction + LEAD, so a
    recognition, ordering, or pairing bug all break the hash."""
    from ocr_ray.corpus import ensure_corpus
    from ocr_ray.pipelines.extract import extract_documents

    corpus = ensure_corpus(sf_dir, glyphs=False)
    docs = extract_documents(read_documents(corpus), num_buckets=default_buckets())

    out_schema = pa.schema(
        [
            ("doc_id", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
            ("caption", pa.string()),
        ]
    )

    def pair(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        spans = t["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = spans.flatten()
        offs = spans.offsets.to_numpy(zero_copy_only=False)
        n_flat = len(flat)
        parents = np.repeat(
            np.arange(t.num_rows, dtype=np.int64), np.diff(offs)
        )
        kind = pc.struct_field(flat, "kind").to_numpy(zero_copy_only=False)
        text = pc.struct_field(flat, "text")
        media = pc.struct_field(flat, "media_ref").to_numpy(zero_copy_only=False)
        off = pc.struct_field(flat, "offset").to_numpy(zero_copy_only=False)
        is_media = kind == "media"
        idx = np.flatnonzero(is_media)
        nxt = idx + 1
        same_doc = (nxt < n_flat) & (parents[np.clip(nxt, 0, n_flat - 1)] == parents[idx])
        next_is_text = np.zeros(len(idx), dtype=bool)
        ok = np.flatnonzero(same_doc)
        next_is_text[ok] = kind[nxt[same_doc]] == "text"
        caption = np.full(len(idx), "", dtype=object)
        take_from = nxt[next_is_text]
        caption[next_is_text] = text.take(
            pa.array(take_from, type=pa.int64())
        ).to_numpy(zero_copy_only=False)
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)[parents[idx]]
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.string()),
                "media_ref": pa.array(media[idx], type=pa.string()),
                "offset": pa.array(off[idx].astype(np.int32), type=pa.int32()),
                "caption": pa.array(caption, type=pa.string()),
            }
        )

    return docs.map_batches(pair, batch_format="pyarrow")


@query("extract_delete_mor_spans", sql=_EXTRACT_DELETE_SQL)
def extract_delete_mor_spans(sf_dir: str) -> ray.data.Dataset:
    """MERGE-ON-READ variant of the targeted delete (same victims, same
    oracle as ``extract_delete_doc_spans``): instead of rewriting
    fragments, ``delete_keys_mor`` records deletion-vector sidecars
    (O(deleted keys), data files untouched) and ``read_with_deletes``
    applies them as a broadcast anti-filter inside the read — the
    Iceberg/Delta deletion-vector trade for delete-heavy tables. The
    runtime gate then COMPACTS (``compact_deletes`` folds vectors into
    the files) and asserts the physical table now matches the MoR view
    row-for-row, proving the two delete paths agree end to end."""
    import shutil
    import tempfile

    import pyarrow.parquet as _pq

    from ocr_ray.pipelines.extract import extract_and_write
    from ocr_ray.sources.readers import read_documents as _read_docs
    from ocr_ray.stages.explode import explode_documents
    from ocr_ray.state.manifest import (
        compact_deletes,
        delete_keys_mor,
        load_manifest,
        read_fragments,
        read_with_deletes,
    )

    corpus = ensure_corpus(sf_dir, glyphs=False)
    raw = _pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    ids = raw["doc_id"].to_numpy(zero_copy_only=False)
    victims = [f"doc-{int(d):08d}" for d in ids if int(d) % 97 == 0]

    out = tempfile.mkdtemp(prefix="ocr_ray_mor_")
    shutil.rmtree(out)
    try:
        manifest, _ = extract_and_write(
            _read_docs(corpus), out, num_parts=8, num_buckets=8
        )
        total = int(manifest["row_count"].sum())
        # MoR delete: sidecars only — assert no data file was rewritten
        before = {
            p: r["file"] for p, r in load_manifest(out).items()
        }
        delete_keys_mor(out, victims)
        # idempotence: a retried delete merges to the same vectors
        delete_keys_mor(out, victims)
        after = {p: r["file"] for p, r in load_manifest(out).items()}
        if before != after:
            raise AssertionError("MoR delete rewrote data fragments")
        live = read_with_deletes(out).materialize()
        if live.count() != total - len(victims):
            raise AssertionError("MoR view row count does not reflect the delete")
        # compact: vectors fold into the files; physical == MoR view
        compact_deletes(out)
        physical = read_fragments(
            [r["file"] for r in load_manifest(out).values()]
        )
        if physical.count() != total - len(victims):
            raise AssertionError("compaction result disagrees with the MoR view")
        return (
            live.map_batches(
                explode_documents, batch_format="pyarrow", fn_kwargs={"sentinels": False}
            )
            .materialize()
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)
