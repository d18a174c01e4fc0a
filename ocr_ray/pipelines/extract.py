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

Knobs are sized for a multi-node run: ``doc_batch_size`` bounds per-task
heap (one nested doc row explodes to many spans) and sets the fused
stage's task count; ``recognizer_concurrency`` is the actor-pool size
(templates load once per actor); ``num_buckets`` is the shuffle fan-in
(size so a bucket fits a worker's heap, see ``stages/assemble.py``).
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data

from ocr_ray.stages.assemble import (
    _with_sink,
    add_bucket,
    add_chunk_bucket,
    merge_chunks_bucket,
    partial_assemble_bucket,
    reassemble_bucket,
)
from ocr_ray.stages.boilerplate import strip_boilerplate
from ocr_ray.stages.explode import explode_documents
from ocr_ray.stages.glyphs import Recognizer
from ocr_ray.stages.normalize import normalize_spans


class ExtractMapper:
    """The whole pre-shuffle chain (explode -> normalize -> recognize ->
    strip -> bucket-tag) as ONE actor-pool stage.

    Ray Data would fuse these five map_batches into at most two physical
    operators (actor + task pool) with an object-store block handoff
    between them; running them inside one ``__call__`` removes that
    round trip entirely — measurably faster at both 8 and 32 CPUs (the
    copy path is the single-node resource that does not scale with
    cores). The recognizer templates still load once per actor here.
    """

    def __init__(self, *, num_buckets: int, chunked: bool = False, chunk_size: int = 1024):
        self.rec = Recognizer()
        self.num_buckets = num_buckets
        self.chunked = chunked
        self.chunk_size = chunk_size

    def __call__(self, batch: "ray.data.block.DataBatch"):
        t = explode_documents(batch)
        t = normalize_spans(t)
        t = self.rec(t)
        t = strip_boilerplate(t)
        if self.chunked:
            return add_chunk_bucket(t, num_buckets=self.num_buckets, chunk_size=self.chunk_size)
        return add_bucket(t, num_buckets=self.num_buckets)


# Per-worker-process mapper cache for task-pool mode: Ray reuses worker
# processes across tasks, so the recognizer templates build once per worker
# (actor-pool __init__ semantics) WITHOUT an actor pool's startup cost,
# CPU reservation, or deadlock footgun. Measured (BENCH/BASELINE.md): the
# fixed actor pool pays ~2-4 s spawning fresh processes per run while task
# mode reuses the already-warm workers — task mode is never slower here.
# An explicit actor pool remains the right call when per-actor state is
# genuinely expensive (multi-GB model weights); pass an int/tuple then.
_TASK_MAPPER_CACHE: dict[tuple, ExtractMapper] = {}


def _task_mapper(batch, *, num_buckets: int, chunked: bool, chunk_size: int):
    key = (num_buckets, chunked, chunk_size)
    m = _TASK_MAPPER_CACHE.get(key)
    if m is None:
        m = _TASK_MAPPER_CACHE[key] = ExtractMapper(
            num_buckets=num_buckets, chunked=chunked, chunk_size=chunk_size
        )
    return m(batch)


def _mapped(ds, *, doc_batch_size, recognizer_concurrency, num_buckets, chunked, chunk_size):
    """The fused pre-shuffle stage: task pool (concurrency=None, default)
    or fixed/autoscaling actor pool (int / tuple)."""
    kwargs = dict(
        batch_format="pyarrow",
        batch_size=doc_batch_size,
    )
    fn_kwargs = {"num_buckets": num_buckets, "chunked": chunked, "chunk_size": chunk_size}
    if recognizer_concurrency is None:
        return ds.map_batches(_task_mapper, fn_kwargs=fn_kwargs, **kwargs)
    return ds.map_batches(
        ExtractMapper,
        concurrency=recognizer_concurrency,
        fn_constructor_kwargs=fn_kwargs,
        **kwargs,
    )


def extract_documents(
    ds: ray.data.Dataset,
    *,
    doc_batch_size: int = 1024,
    recognizer_concurrency: int | tuple[int, int] | None = None,
    num_buckets: int | None = None,
    two_phase: bool = True,
    chunk_size: int = 1024,
) -> ray.data.Dataset:
    """Nested corpus Dataset -> nested extracted Dataset (same schema).

    ``recognizer_concurrency=None`` (default) runs the fused mapper as a
    TASK pool with per-worker-process template caching — see
    ``_task_mapper``. An int gives a FIXED actor pool (avoids the
    autoscaling ramp that serializes small runs, but reserves its CPUs for
    the whole execution: size it STRICTLY below the cluster/session CPU
    count or upstream read/shuffle tasks starve and the pipeline
    deadlocks).
    ``doc_batch_size`` batches the NESTED side (one row explodes to many
    spans) and therefore sets the task count of the fused
    explode->normalize->recognize stage — size it so
    ``n_docs / doc_batch_size >> pool size`` or the pool starves.
    ``two_phase=True`` (the default) uses the skew-safe chunked
    partial+final reassembly shape — required when documents can be
    pathologically large (group > block), which at 100 TB scale must be
    assumed. Pass ``two_phase=False`` only for corpora with a proven
    document-size bound, where the single groupby saves one shuffle.
    """
    if num_buckets is None:
        from ocr_ray.sizing import buckets_for_input

        num_buckets = buckets_for_input(ds)
    ds = _mapped(
        ds,
        doc_batch_size=doc_batch_size,
        recognizer_concurrency=recognizer_concurrency,
        num_buckets=num_buckets,
        chunked=two_phase,
        chunk_size=chunk_size,
    )
    if two_phase:
        partial = ds.groupby("bucket").map_groups(
            partial_assemble_bucket, batch_format="pyarrow"
        )
        partial = partial.map_batches(
            add_bucket, batch_format="pyarrow", fn_kwargs={"num_buckets": max(num_buckets // 4, 1)}
        )
        return partial.groupby("bucket").map_groups(
            merge_chunks_bucket, batch_format="pyarrow"
        )
    return ds.groupby("bucket").map_groups(reassemble_bucket, batch_format="pyarrow")


def extract_and_write(
    ds: ray.data.Dataset,
    out_dir: str,
    *,
    num_parts: int | None = None,
    doc_batch_size: int = 1024,
    recognizer_concurrency: int | tuple[int, int] | None = None,
    num_buckets: int | None = None,
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
    from ocr_ray.state.manifest import (
        ResumableSink,
        _check_layout,
        skip_completed_partitions,
    )

    if num_parts is None or num_buckets is None:
        from ocr_ray.sizing import buckets_for_input

        derived = buckets_for_input(ds)
        num_parts = num_parts if num_parts is not None else derived
        num_buckets = num_buckets if num_buckets is not None else derived
    # the fused sink bypasses write_extracted_resumable, so record the
    # partition law here (and refuse a mismatched resume)
    _check_layout(out_dir, num_parts, write=True)
    skipped = 0
    if resume:
        ds, skipped = skip_completed_partitions(ds, out_dir, num_parts)
    sink = ResumableSink(out_dir)
    ds = _mapped(
        ds,
        doc_batch_size=doc_batch_size,
        recognizer_concurrency=recognizer_concurrency,
        num_buckets=num_buckets if two_phase else num_parts,
        chunked=two_phase,
        chunk_size=chunk_size,
    )
    if two_phase:
        partial = ds.groupby("bucket").map_groups(
            partial_assemble_bucket, batch_format="pyarrow"
        )
        partial = partial.map_batches(
            add_bucket, batch_format="pyarrow", fn_kwargs={"num_buckets": num_parts}
        )
        manifest = partial.groupby("bucket").map_groups(
            _with_sink(merge_chunks_bucket, sink), batch_format="pyarrow"
        )
    else:
        manifest = ds.groupby("bucket").map_groups(
            _with_sink(reassemble_bucket, sink), batch_format="pyarrow"
        )
    return manifest.to_pandas(), skipped


# ---------------------------------------------------------------------------
# Shard-aligned (zero-shuffle) extraction
# ---------------------------------------------------------------------------
#
# The corpus shape of BASELINE.json's input_hint stores WHOLE documents per
# row (doc_id, spans list) — so after the in-task explode, every span of a
# document already sits inside the document's own batch, and reading-order
# restoration is a purely batch-local sort. The `groupby('bucket')` shuffle
# in `extract_documents` exists to co-locate spans that arrive scattered
# (pre-exploded / multi-source inputs); for whole-doc inputs it is pure
# data movement. This path removes it: one map task per input shard
# (parquet row group), local reassembly, fragment id == shard id for the
# resumable sink. At 100 TB that means NO all-to-all anywhere in the
# flagship pipeline — extraction is embarrassingly parallel per shard, and
# resume skips completed shards before any byte is read. The assumption it
# relies on (documented per the brief): input rows are whole documents and
# the corpus writer bounds row-group size (~512 MB-1 GB), so one shard's
# output fits a worker's heap; `max_docs_per_fragment` additionally splits
# a pathological row group into several output fragments inside its task.


class LocalExtractMapper:
    """ExtractMapper plus in-task reassembly — the zero-shuffle fused stage."""

    def __init__(self):
        self.rec = Recognizer()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ocr_ray.stages.assemble import assemble_local
        from ocr_ray.stages.normalize import normalize_and_strip

        t = explode_documents(batch)
        # fused filter: normalize + boilerplate strip in one mask/copy
        # (recognizer runs after — boilerplate never reaches the matmul)
        t = normalize_and_strip(t)
        t = self.rec(t)
        return assemble_local(t)


_LOCAL_MAPPER_CACHE: list = []


def _local_task_mapper(batch: pa.Table) -> pa.Table:
    if not _LOCAL_MAPPER_CACHE:
        _LOCAL_MAPPER_CACHE.append(LocalExtractMapper())
    return _LOCAL_MAPPER_CACHE[0](batch)


def extract_documents_local(
    ds: ray.data.Dataset, *, doc_batch_size: int = 1024
) -> ray.data.Dataset:
    """Nested corpus Dataset -> nested extracted Dataset with NO shuffle.

    Valid whenever input rows are whole documents (the input_hint shape);
    output row order is batch-local but the per-document span order is the
    same reading order `extract_documents` produces.
    """
    return ds.map_batches(
        _local_task_mapper, batch_format="pyarrow", batch_size=doc_batch_size
    )


def list_parquet_shards(path: str) -> list[dict]:
    """Deterministic shard inventory of a parquet directory: one shard per
    (file, row_group), enumerated in sorted-filename order so shard ids are
    stable across runs (the resume contract). Driver-side METADATA read
    only — footers, never data."""
    import pyarrow.parquet as pq
    from pathlib import Path

    shards: list[dict] = []
    for f in sorted(str(p) for p in Path(path).glob("*.parquet")):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            shards.append(
                {
                    "shard": len(shards),
                    "path": f,
                    "row_group": rg,
                    "rows": md.row_group(rg).num_rows,
                }
            )
    return shards


def _shard_fragments(shards: list[dict], max_docs: int | None) -> list[dict]:
    """Split shard rows into fragments of <= max_docs docs; fragment ids are
    assigned sequentially over the (sorted) shard/slice enumeration, so they
    are a pure function of the input layout — the resume invariant."""
    frags: list[dict] = []
    for s in shards:
        n = s["rows"]
        step = n if not max_docs else max_docs
        for start in range(0, max(n, 1), max(step, 1)):
            frags.append(
                {
                    "fragment": len(frags),
                    "path": s["path"],
                    "row_group": s["row_group"],
                    "row_start": start,
                    "row_len": min(step, n - start) if n else 0,
                }
            )
    return frags


class _ShardExtractor:
    """Per-task body of the shard-aligned pipeline: read ONE row group,
    extract, write its fragment(s). Recognizer templates cache per worker
    process (same discipline as `_task_mapper`)."""

    def __init__(self, out_dir: str, doc_batch_size: int):
        from ocr_ray.state.manifest import ResumableSink

        self.mapper = LocalExtractMapper()
        self.sink = ResumableSink(out_dir)
        self.doc_batch_size = doc_batch_size

    def extract_nested(self, docs: pa.Table) -> pa.Table:
        parts = []
        for off in range(0, docs.num_rows, self.doc_batch_size):
            parts.append(self.mapper(docs.slice(off, self.doc_batch_size)))
        if not parts:
            # typed empty: a zero-row fragment must still carry the full
            # output schema or the committed dataset becomes mixed-schema
            from ocr_ray.schema import DOCUMENTS_SCHEMA

            return DOCUMENTS_SCHEMA.empty_table()
        return pa.concat_tables(parts)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import json as _json

        import pyarrow.parquet as pq

        out = []
        for spec_json in batch["spec"].to_pylist():
            for spec in _json.loads(spec_json):
                pf = pq.ParquetFile(spec["path"])
                rg = pf.read_row_group(spec["row_group"], columns=["doc_id", "spans"])
                for frag in spec["fragments"]:
                    docs = rg.slice(frag["row_start"], frag["row_len"])
                    nested = self.extract_nested(docs)
                    out.append(
                        self.sink.write(
                            nested,
                            frag["fragment"],
                            extra={
                                "source": spec["path"],
                                "row_group": spec["row_group"],
                                "row_start": frag["row_start"],
                            },
                        )
                    )
        return pa.concat_tables(out)


_SHARD_EXTRACTOR_CACHE: dict[tuple, _ShardExtractor] = {}


def _shard_task(batch: pa.Table, *, out_dir: str, doc_batch_size: int) -> pa.Table:
    key = (out_dir, doc_batch_size)
    ex = _SHARD_EXTRACTOR_CACHE.get(key)
    if ex is None:
        ex = _SHARD_EXTRACTOR_CACHE[key] = _ShardExtractor(out_dir, doc_batch_size)
    return ex(batch)


def extract_shard_aligned(
    corpus_path: str,
    out_dir: str,
    *,
    doc_batch_size: int = 4096,
    max_docs_per_fragment: int | None = 65536,
    resume: bool = True,
    tasks_per_cpu: int = 8,
    fragment_ids: str = "positional",
):
    """Zero-shuffle resumable extraction: fragment id == input shard id.

    read(one row group) -> fused extract + LOCAL reassembly -> atomic
    fragment commit, all inside one map task per shard. Returns
    ``(manifest_df, skipped_fragments)``; with ``resume=True``, fragments
    already committed are dropped from the shard list BEFORE any read —
    cheaper than `extract_and_write`'s hash filter, which still has to
    scan every input row.

    ``fragment_ids``:

    - ``"positional"`` (default): fragment id = index in the sorted shard
      enumeration. Resume is guarded by a whole-layout signature — ANY
      corpus change (files added/removed) refuses to resume, the safe
      default for a fixed input.
    - ``"content"``: fragment id = 63-bit hash of (file name, row group,
      row slice, row count) — CONTINUOUS-INGEST mode. Appending new shard
      files to the corpus and re-running extracts ONLY the new files'
      fragments; committed fragments are untouched. The per-file shape
      (row-group count, rows) of every previously-seen file is recorded
      and verified on resume, so an in-place rewrite of an existing file
      is refused rather than silently served stale.
    """
    import hashlib as _hashlib
    import json as _json
    import time as _time

    from ocr_ray.state.manifest import load_manifest

    assert fragment_ids in ("positional", "content"), fragment_ids
    t0 = _time.perf_counter()  # includes the serial listing/packing phases
    shards = list_parquet_shards(corpus_path)
    frags = _shard_fragments(shards, max_docs_per_fragment)
    if fragment_ids == "content":
        for f in frags:
            key = (
                f"{os.path.basename(f['path'])}:{f['row_group']}:"
                f"{f['row_start']}:{f['row_len']}"
            )
            f["fragment"] = int.from_bytes(
                _hashlib.sha256(key.encode()).digest()[:8], "big"
            ) >> 1

    # Layout guard: fragment ids are POSITIONAL, so resuming against a
    # manifest written under a different fragment layout (changed
    # max_docs_per_fragment, or corpus files added/removed/reordered)
    # would silently skip slices that were never extracted. Record the
    # layout signature next to the manifest and refuse a mismatched resume.
    sig = _hashlib.sha256(
        _json.dumps(
            [[f["fragment"], f["path"], f["row_group"], f["row_start"], f["row_len"]] for f in frags]
        ).encode()
    ).hexdigest()
    # content mode: the resume invariant is PER-FILE shape stability, not
    # whole-layout equality (appends are the point)
    file_shapes: dict[str, list[int]] = {}
    for s in shards:
        rec = file_shapes.setdefault(os.path.basename(s["path"]), [0, 0])
        rec[0] += 1  # row groups
        rec[1] += s["rows"]
    mdir0 = os.path.join(out_dir, "_manifest")
    layout_path = os.path.join(mdir0, "layout.json")
    done = set(load_manifest(out_dir)) if resume else set()
    if resume and os.path.exists(layout_path):
        prev = _json.load(open(layout_path))
        if prev.get("mode", "positional") != fragment_ids:
            raise ValueError(
                "extract_shard_aligned: output manifest was written in "
                f"fragment_ids={prev.get('mode', 'positional')!r} mode; "
                f"cannot resume in {fragment_ids!r} mode."
            )
        if fragment_ids == "content":
            prev_shapes = prev.get("file_shapes", {})
            changed = sorted(
                n for n, shape in prev_shapes.items()
                if n in file_shapes and file_shapes[n] != shape
            )
            if changed:
                raise ValueError(
                    "extract_shard_aligned: previously-extracted corpus "
                    f"file(s) changed in place: {changed} — content-mode "
                    "resume would serve stale fragments. Use a fresh "
                    "out_dir or resume=False."
                )
            # carry forward shapes of files no longer present, so a file
            # deleted then re-added with different content is still caught
            file_shapes = {**prev_shapes, **file_shapes}
        elif prev.get("signature") != sig:
            raise ValueError(
                "extract_shard_aligned: output manifest was written under a "
                "different fragment layout (corpus files or "
                "max_docs_per_fragment changed) — resuming would silently "
                "skip unprocessed slices. Use a fresh out_dir or resume=False, "
                "or fragment_ids='content' for append-only corpora."
            )
    elif resume and done:
        raise ValueError(
            "extract_shard_aligned: manifest exists but has no layout "
            "record; cannot prove resume safety. Use a fresh out_dir or "
            "resume=False."
        )
    os.makedirs(mdir0, exist_ok=True)
    # content mode rewrites the layout record every run (the file set
    # legitimately grows); positional mode writes it once
    if fragment_ids == "content" or not os.path.exists(layout_path):
        tmp = layout_path + ".tmp"
        with open(tmp, "w") as f:
            _json.dump(
                {"signature": sig, "max_docs_per_fragment": max_docs_per_fragment,
                 "n_fragments": len(frags), "mode": fragment_ids,
                 "file_shapes": file_shapes},
                f,
            )
        os.replace(tmp, layout_path)

    pending = [f for f in frags if f["fragment"] not in done]
    skipped = len(frags) - len(pending)
    mdir = os.path.join(out_dir, "_metrics")
    if not pending:
        import pandas as pd

        # refresh the summary so a fully-resumed no-op never leaves a
        # stale record describing an earlier execution
        os.makedirs(mdir, exist_ok=True)
        with open(os.path.join(mdir, "run_summary.json"), "w") as f:
            _json.dump(
                {
                    "pipeline": "extract_shard_aligned",
                    "wall_sec": round(_time.perf_counter() - t0, 3),
                    "fragments_written": 0,
                    "fragments_skipped": int(skipped),
                    "rows": 0,
                    "spans": 0,
                    "resumed_noop": True,
                },
                f,
            )
        return pd.DataFrame(columns=["partition", "row_count", "span_count"]), skipped

    # One spec per (file, row_group): the task reads its row group once and
    # writes every pending fragment sliced from it.
    by_rg: dict[tuple, dict] = {}
    for f in pending:
        key = (f["path"], f["row_group"])
        spec = by_rg.setdefault(
            key, {"path": f["path"], "row_group": f["row_group"], "fragments": []}
        )
        spec["fragments"].append(
            {"fragment": f["fragment"], "row_start": f["row_start"], "row_len": f["row_len"]}
        )
    specs = list(by_rg.values())
    # Pack row groups so the TASK count scales with the session's CPUs, not
    # with data: per-task driver dispatch is a serial cost, so one task per
    # row group makes the serial floor grow linearly with input size
    # (measured: ~2.6k tasks cost several seconds of driver time at 82M
    # docs). ``tasks_per_cpu`` waves keep dynamic load balance; fragment
    # ids are untouched, so packing never affects resume.
    from ocr_ray.sizing import session_cpus

    cpus = session_cpus()  # cluster CPUs, or the host's before ray.init
    target_tasks = min(len(specs), max(1, cpus * tasks_per_cpu))
    per_task = -(-len(specs) // target_tasks)
    items = [
        {"spec": _json.dumps(specs[i : i + per_task])}
        for i in range(0, len(specs), per_task)
    ]
    manifest = ray.data.from_items(items, override_num_blocks=len(items)).map_batches(
        _shard_task,
        batch_format="pyarrow",
        batch_size=None,
        fn_kwargs={"out_dir": out_dir, "doc_batch_size": doc_batch_size},
    )
    df = manifest.to_pandas()
    # Per-run lineage + metrics next to the fragments (the statistics-
    # framework analogue, same protocol as run_pipeline's dump).
    os.makedirs(mdir, exist_ok=True)
    with open(os.path.join(mdir, "run_summary.json"), "w") as f:
        _json.dump(
            {
                "pipeline": "extract_shard_aligned",
                "wall_sec": round(_time.perf_counter() - t0, 3),
                "fragments_written": int(len(df)),
                "fragments_skipped": int(skipped),
                "rows": int(df["row_count"].sum()) if len(df) else 0,
                "spans": int(df["span_count"].sum()) if len(df) else 0,
            },
            f,
        )
    with open(os.path.join(mdir, "stage_stats.txt"), "w") as f:
        f.write(manifest.stats())
    return df, skipped


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
