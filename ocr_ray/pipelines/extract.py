"""The flagship pipeline: main-content extraction over interleaved documents.

Stage graph (all lazy; Ray Data's streaming executor pipelines them with
backpressure — the engine-level analogue of the reference's
dependence-driven scheduling, SURVEY.md §3.1):

    read(nested corpus)
      -> explode (spans -> rows, + per-doc sentinel)        [stateless map]
      -> normalize (trim / degenerate-drop)                  [stateless map]
      -> Recognizer (glyph decode, nearest-template)         [ACTOR POOL]
      -> strip_boilerplate                                   [stateless map]
      -> reassemble (hash-bucket groupby, re-index, implode) [THE shuffle]

Knobs are sized for a multi-node run: ``batch_size`` bounds per-task heap
for wide rows; ``recognizer_concurrency`` is the actor-pool size
(templates load once per actor); ``num_buckets`` is the shuffle fan-in
(size so a bucket fits a worker's heap, see ``stages/assemble.py``).
"""

from __future__ import annotations

import ray.data

from ocr_ray.stages.assemble import reassemble, reassemble_two_phase
from ocr_ray.stages.boilerplate import strip_boilerplate
from ocr_ray.stages.explode import explode_documents
from ocr_ray.stages.glyphs import Recognizer
from ocr_ray.stages.normalize import normalize_spans


def extract_documents(
    ds: ray.data.Dataset,
    *,
    batch_size: int = 8192,
    doc_batch_size: int = 1024,
    recognizer_concurrency: int | tuple[int, int] = 2,
    num_buckets: int = 64,
    two_phase: bool = False,
    chunk_size: int = 1024,
) -> ray.data.Dataset:
    """Nested corpus Dataset -> nested extracted Dataset (same schema).

    A FIXED actor-pool size (int) avoids the autoscaling ramp that
    serializes small runs, but the pool reserves its CPUs for the whole
    execution: size it STRICTLY below the cluster/session CPU count or
    upstream read/shuffle tasks starve and the pipeline deadlocks.
    ``doc_batch_size`` batches the NESTED side (one row explodes to many
    spans) and therefore sets the task count of the fused
    explode->normalize->recognize actor-pool stage — size it so
    ``n_docs / doc_batch_size >> actor pool size`` or the pool starves;
    ``batch_size`` bounds the exploded span batches. ``two_phase=True``
    switches reassembly to the skew-safe chunked partial+final shape —
    required when documents can be pathologically large (group > block);
    at 100 TB scale it should be the default.
    """
    # NOTE: these three fuse into ONE actor-pool operator; the largest
    # batch_size among fused stages drives task bundling, so the Recognizer
    # deliberately inherits the doc-level batches (one 1024-doc bundle ->
    # one ~25k-span recognition matmul) instead of pinning its own
    # batch_size, which would starve the pool (5 tasks for 16 actors).
    ds = ds.map_batches(explode_documents, batch_format="pyarrow", batch_size=doc_batch_size)
    ds = ds.map_batches(normalize_spans, batch_format="pyarrow")
    ds = ds.map_batches(
        Recognizer,
        batch_format="pyarrow",
        concurrency=recognizer_concurrency,
    )
    ds = ds.map_batches(strip_boilerplate, batch_format="pyarrow")
    if two_phase:
        return reassemble_two_phase(ds, num_buckets=num_buckets, chunk_size=chunk_size)
    return reassemble(ds, num_buckets=num_buckets)


def extract_and_write(
    ds: ray.data.Dataset,
    out_dir: str,
    *,
    num_parts: int = 64,
    batch_size: int = 8192,
    doc_batch_size: int = 1024,
    recognizer_concurrency: int | tuple[int, int] = 2,
    num_buckets: int = 64,
    two_phase: bool = True,
    chunk_size: int = 1024,
    resume: bool = True,
):
    """Extraction with the resumable sink FUSED into the final reassembly
    groupby: bucket id == fragment id, so the nested output is written by
    the same task that assembles it — one less all-to-all than
    ``extract_documents(...)`` + ``write_extracted_resumable(...)``.

    Returns ``(manifest_df, skipped_fragments)``. With ``resume=True``,
    fragments already committed are filtered out at the READ (no decode /
    recognition / shuffle is spent on them).
    """
    from ocr_ray.state.manifest import ResumableSink, skip_completed_partitions

    skipped = 0
    if resume:
        ds, skipped = skip_completed_partitions(ds, out_dir, num_parts)
    sink = ResumableSink(out_dir)
    ds = ds.map_batches(explode_documents, batch_format="pyarrow", batch_size=doc_batch_size)
    ds = ds.map_batches(normalize_spans, batch_format="pyarrow")
    ds = ds.map_batches(
        Recognizer, batch_format="pyarrow", concurrency=recognizer_concurrency
    )
    ds = ds.map_batches(strip_boilerplate, batch_format="pyarrow")
    if two_phase:
        manifest = reassemble_two_phase(
            ds,
            num_buckets=num_buckets,
            chunk_size=chunk_size,
            final_buckets=num_parts,
            sink=sink,
        )
    else:
        manifest = reassemble(ds, num_buckets=num_parts, sink=sink)
    return manifest.to_pandas(), skipped


def extract_spans_flat(
    ds: ray.data.Dataset,
    **kwargs,
) -> ray.data.Dataset:
    """Extraction with flat (exploded) output — one row per surviving span.

    Runs the full pipeline (including reassembly, so offsets are re-indexed
    in reading order) then re-explodes without sentinels; documents whose
    spans were all stripped contribute no rows, matching the SQL oracle's
    relational output shape.
    """
    nested = extract_documents(ds, **kwargs)
    return nested.map_batches(
        explode_documents, batch_format="pyarrow", fn_kwargs={"sentinels": False}
    )
