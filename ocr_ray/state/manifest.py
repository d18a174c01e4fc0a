"""Checkpoint manifest + per-partition lineage & metrics (resumable sink).

The north rule requires a killed run to resume without reprocessing
completed fragments. The reference's nearest semantics are IDEM events
(duplicate satisfactions dropped,
``/root/reference/src/event/hc/hc-event.c:202-208``) and the statistics
framework (per-object Lamport-clock dumps,
``/root/reference/src/inc/ocr-statistics.h:20-120``). Here:

- output is hash-partitioned on ``doc_id`` into P fragments, each written
  as ``part=K/data.parquet`` via temp-file + atomic rename;
- every completed fragment gets a sidecar lineage record
  ``_manifest/part-K.json`` (atomic rename) carrying row/span counts, a
  content checksum (uint64 sum of per-doc span fingerprints), wall time
  and engine version — the per-partition lineage + metrics;
- on resume, fragments present in the manifest are *skipped at the read*
  (the input is filtered by partition before any work runs), so a doc_id
  lands in exactly one fragment across runs (single-assignment invariant).

Scale: P is the unit of resumability and of sink parallelism; pick
P ≈ input_bytes / 1 GB. The partition filter is a vectorized hash on
``doc_id`` — no shuffle is added beyond the pipeline's own reassembly.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

try:  # pragma: no cover - 'lance' is not installed in this sandbox
    import lance  # type: ignore

    HAVE_LANCE = True
except ImportError:
    lance = None
    HAVE_LANCE = False

ENGINE_VERSION = "ocr_ray-0.1.0"


def partition_of(doc_ids, num_parts: int) -> np.ndarray:
    from ocr_ray.functions.hashing import doc_bucket

    return doc_bucket(doc_ids, num_parts)


def _span_checksum(tbl: pa.Table) -> int:
    """Order-insensitive uint64 checksum over (doc_id, span content) —
    vectorized field-wise polynomial hashes mixed with distinct odd
    multipliers, wrap-summed (order-insensitive so fragment-internal row
    order never matters)."""
    import pyarrow.compute as pc

    from ocr_ray.functions.hashing import hash_utf8_column

    spans = tbl["spans"].combine_chunks()
    parent = pc.list_parent_indices(spans)
    if len(parent) == 0:
        return 0
    flat = pc.list_flatten(spans)

    def _hash_via_dict(col) -> np.ndarray:
        # hash each DISTINCT value once, gather per row — bit-identical to
        # hashing every row (null and "" both hash to the empty seed, so
        # fill_null("") is value-preserving) but the byte-crunching cost
        # is per unique value. kind has 4 distinct values and doc_id
        # repeats once per span, so this removes most of the checksum's
        # memory traffic (it was ~1/3 of a shard task's CPU).
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        enc = pc.dictionary_encode(pc.fill_null(col, ""))
        uniq = hash_utf8_column(enc.dictionary)
        return uniq[enc.indices.to_numpy(zero_copy_only=False)]

    parent_np = parent.to_numpy(zero_copy_only=False)
    with np.errstate(over="ignore"):
        h = _hash_via_dict(tbl["doc_id"])[parent_np] * np.uint64(0xA24BAED4963EE407)
        h ^= _hash_via_dict(pc.struct_field(flat, "kind")) * np.uint64(0x9FB21C651E98DF25)
        h ^= hash_utf8_column(pc.struct_field(flat, "text")) * np.uint64(0xC2B2AE3D27D4EB4F)
        h ^= _hash_via_dict(pc.struct_field(flat, "media_ref")) * np.uint64(0x165667B19E3779F9)
        # fill_null first: NaN->uint64 is undefined in numpy and would make
        # the checksum nondeterministic on tables with null offsets
        offs = (
            pc.fill_null(pc.struct_field(flat, "offset"), -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
            .astype(np.uint64)
        )
        h ^= (offs + np.uint64(1)) * np.uint64(0x27D4EB2F165667C5)
        return int(h.sum(dtype=np.uint64))


def _column_stats(tbl: pa.Table) -> dict:
    """{column: [min, max]} for primitive (int/float/string/date) columns
    of a fragment — one vectorized min_max kernel per column, JSON-safe.
    Nested/binary columns and all-null/empty columns are skipped."""
    import pyarrow.compute as pc_

    out: dict = {}
    if tbl.num_rows == 0:
        return out
    for field in tbl.schema:
        t = field.type
        if not (
            pa.types.is_integer(t)
            or pa.types.is_floating(t)
            or pa.types.is_string(t)
            or pa.types.is_large_string(t)
            or pa.types.is_date(t)
            or pa.types.is_timestamp(t)
        ):
            continue
        mm = pc_.min_max(tbl[field.name])
        lo, hi = mm["min"].as_py(), mm["max"].as_py()
        if lo is None:
            continue  # all-null column has no range
        if pa.types.is_date(t) or pa.types.is_timestamp(t):
            lo, hi = str(lo), str(hi)
        out[field.name] = [lo, hi]
    return out


def load_manifest(out_dir: str) -> dict[int, dict]:
    """{partition_id: lineage record} for every completed fragment."""
    mdir = Path(out_dir) / "_manifest"
    out: dict[int, dict] = {}
    if not mdir.is_dir():
        return out
    for f in mdir.glob("part-*.json"):
        rec = json.loads(f.read_text())
        if rec.get("status") != "complete":
            continue  # demoted mid-rewrite (see ResumableSink._demote)
        out[int(rec["partition"])] = rec
    return out


def read_fragments(files: list[str]):
    """Streaming Dataset over committed fragment files of either format
    (``data.parquet`` files and/or ``data.lance`` dataset dirs — a manifest
    can only hold one format, but callers may pass files from several
    manifests). Lance dirs go through the readers' streaming dispatch."""
    import ray as _ray

    from ocr_ray.sizing import read_blocks_for_bytes
    from ocr_ray.sources.readers import read_documents

    pq_files = [f for f in files if not f.endswith(".lance")]
    parts = []
    if pq_files:
        # byte-proportional block count: fragment files are often small
        # (fine-grained resumable layouts), and Ray's default ~2x-CPU read
        # parallelism would hand every downstream shuffle one reduce
        # partition per near-empty block (the r3-measured pathology)
        nbytes = sum(os.path.getsize(f) for f in pq_files)
        parts.append(
            _ray.data.read_parquet(
                pq_files, override_num_blocks=read_blocks_for_bytes(nbytes)
            )
        )
    for f in files:
        if f.endswith(".lance"):
            parts.append(read_documents(f))
    if not parts:
        raise ValueError("read_fragments: empty file list")
    ds = parts[0]
    return ds.union(*parts[1:]) if len(parts) > 1 else ds


class ResumableSink:
    """Per-partition writer run inside ``groupby('_part').map_groups``.

    Writes one fragment atomically and returns its lineage record as the
    group result (the manifest rows come back through the Dataset, so the
    sink is itself a streaming stage, not a driver loop).
    """

    def __init__(self, out_dir: str, *, data_format: str = "auto"):
        """``data_format``: ``"lance"`` | ``"parquet"`` | ``"auto"``
        (Lance when the package is importable, else Parquet — the same
        availability dispatch as ``sources/readers.py``; the north rule's
        output tables are Lance, this sandbox lacks the package)."""
        if data_format == "auto":
            data_format = "lance" if HAVE_LANCE else "parquet"
        if data_format not in ("lance", "parquet"):
            raise ValueError(f"unknown sink data_format {data_format!r}")
        if data_format == "lance" and not HAVE_LANCE:
            raise ImportError(
                "ResumableSink(data_format='lance') but the 'lance' package "
                "is unavailable; use 'parquet' or 'auto'"
            )
        self.out_dir = out_dir
        self.data_format = data_format

    def __call__(self, group: pa.Table) -> pa.Table:
        part = int(group["_part"][0].as_py())
        return self.write(group.drop_columns(["_part"]), part)

    def _demote(self, part: int) -> None:
        """Atomically mark a committed partition as 'rewriting' before a
        destructive in-place swap; ``load_manifest`` then excludes it, so
        a crash mid-swap is repaired by the next resume."""
        mp = Path(self.out_dir) / "_manifest" / f"part-{part:05d}.json"
        if not mp.exists():
            return
        rec = json.loads(mp.read_text())
        rec["status"] = "rewriting"
        tmp = mp.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(rec))
        os.replace(tmp, mp)

    def write(self, tbl: pa.Table, part: int, extra: dict | None = None) -> pa.Table:
        """Commit one fragment + its lineage record; returns manifest row.

        Callable directly from a reassembly group body (fused sink — no
        extra shuffle between reassembly and write) or via ``__call__``
        on ``_part``-tagged nested tables. ``extra`` merges additional
        lineage fields into the sidecar record (e.g. the input shard a
        fragment was derived from, for shard-aligned layouts).
        """
        t0 = time.perf_counter()
        pdir = Path(self.out_dir) / f"part={part:05d}"
        pdir.mkdir(parents=True, exist_ok=True)
        if self.data_format == "lance":
            # A Lance fragment is a directory; write to a hidden temp dir,
            # then commit with a directory rename. The manifest sidecar is
            # the commit point. REWRITING an already-committed fragment
            # has a destructive window (rmtree of the old dir before the
            # rename of the new one), so the sidecar is DEMOTED first: a
            # crash anywhere in the swap leaves status != 'complete' and
            # the next resume rewrites this partition instead of trusting
            # a missing/partial data.lance.
            import shutil

            tmp = pdir / f".tmp-{uuid.uuid4().hex}.lance"
            lance.write_dataset(tbl, str(tmp))
            final = pdir / "data.lance"
            if final.exists():
                self._demote(part)
                shutil.rmtree(final)
            os.replace(tmp, final)
        else:
            tmp = pdir / f".tmp-{uuid.uuid4().hex}.parquet"
            pq.write_table(tbl, tmp)
            final = pdir / "data.parquet"
            os.replace(tmp, final)  # atomic commit of the fragment

        # spans-typed fragments carry the span lineage checksum; other
        # schemas (the sink is generic — any registry pipeline can end in
        # it) record row counts only.
        has_spans = "spans" in tbl.column_names
        n_spans = (
            int(pa.compute.sum(pa.compute.list_value_length(tbl["spans"])).as_py() or 0)
            if has_spans
            else 0
        )
        rec = {
            "partition": part,
            "status": "complete",
            "row_count": tbl.num_rows,
            "span_count": n_spans,
            "span_checksum": _span_checksum(tbl) if has_spans else 0,
            "wall_ms": round((time.perf_counter() - t0) * 1000, 2),
            "engine": ENGINE_VERSION,
            "file": str(final),
            "format": self.data_format,
            # automatic zone maps: per-column min/max for every primitive
            # column (the Parquet-row-group/Iceberg-manifest discipline) —
            # range scans on ANY such column can file-skip via
            # read_range_pruned(column=...) with no opt-in at write time
            "stats": _column_stats(tbl),
        }
        if extra:
            rec.update(extra)
        mdir = Path(self.out_dir) / "_manifest"
        mdir.mkdir(parents=True, exist_ok=True)
        mtmp = mdir / f".tmp-{uuid.uuid4().hex}.json"
        mtmp.write_text(json.dumps(rec))
        os.replace(mtmp, mdir / f"part-{part:05d}.json")  # manifest commit
        return pa.table(
            {
                # int64: content-addressed fragment ids are 63-bit hashes
                "partition": pa.array([part], type=pa.int64()),
                "row_count": pa.array([tbl.num_rows], type=pa.int64()),
                "span_count": pa.array([n_spans], type=pa.int64()),
            }
        )


def _check_layout(out_dir: str, num_parts: int, *, write: bool, extra: dict | None = None) -> None:
    """Record/validate the partition law parameters next to the manifest.

    Fragment membership is ``partition_of(doc_id, num_parts)`` — POSITIONAL
    in ``num_parts`` — so resuming a manifest written under a different
    partition count would silently drop or duplicate documents. The layout
    sidecar makes that a loud error instead.
    """
    mdir = Path(out_dir) / "_manifest"
    lp = mdir / "layout.json"
    if lp.exists():
        prev = json.loads(lp.read_text())
        if prev.get("num_parts") != num_parts:
            raise ValueError(
                f"resumable sink at {out_dir!r} was written with "
                f"num_parts={prev.get('num_parts')}; resuming with "
                f"num_parts={num_parts} would silently corrupt the output. "
                "Use a fresh out_dir or the original partition count."
            )
        missing = {}
        for k, v in (extra or {}).items():
            if k in prev:
                if prev[k] != v:
                    raise ValueError(
                        f"resumable sink at {out_dir!r}: layout field {k!r} "
                        f"changed ({prev[k]!r} -> {v!r}); resuming would mix "
                        "outputs of different pipelines. Use a fresh out_dir."
                    )
            else:
                missing[k] = v
        if missing and write:
            # Persist keys a later caller introduced (e.g. data_format is
            # recorded by the sink but the layout may have been created by
            # skip_completed_partitions first) — otherwise the guard for
            # that key is dead on every subsequent resume.
            prev.update(missing)
            tmp = Path(str(lp) + ".tmp")
            tmp.write_text(json.dumps(prev))
            os.replace(tmp, lp)
        return
    if load_manifest(out_dir):
        raise ValueError(
            f"manifest at {out_dir!r} has no layout record; cannot prove "
            "resume safety. Use a fresh out_dir."
        )
    if write:
        mdir.mkdir(parents=True, exist_ok=True)
        tmp = Path(str(lp) + ".tmp")
        tmp.write_text(json.dumps({"num_parts": num_parts, **(extra or {})}))
        os.replace(tmp, lp)


def skip_completed_partitions(ds, out_dir: str, num_parts: int, *, extra_layout: dict | None = None):
    """Filter the *input* corpus down to docs in unfinished partitions.

    Returns (filtered_ds, completed_count). Vectorized hash filter; no
    work (decode/recognize/shuffle) is spent on completed fragments.
    Validates that the manifest being resumed was written under the same
    ``num_parts`` (see ``_check_layout``).
    """
    _check_layout(out_dir, num_parts, write=True, extra=extra_layout)
    done = set(load_manifest(out_dir))
    if not done:
        return ds, 0  # fresh run: no filter stage, no per-batch hashing
    done_arr = np.fromiter(done, dtype=np.int64)

    def drop_done(t: pa.Table) -> pa.Table:
        parts = partition_of(t["doc_id"], num_parts)
        return t.filter(pa.array(~np.isin(parts, done_arr)))

    return ds.map_batches(drop_done, batch_format="pyarrow"), len(done)


def write_extracted_resumable(
    extracted_ds,
    out_dir: str,
    *,
    num_parts: int = 16,
    return_stats: bool = False,
    data_format: str = "auto",
):
    """Write an extracted (nested) Dataset as P resumable fragments.

    Returns the manifest rows produced by THIS run (skipped fragments do
    not reappear) — with ``return_stats=True``, a ``(manifest_df,
    stats_text)`` tuple where ``stats_text`` is the executed pipeline's
    per-stage ``ds.stats()`` dump. Combine with
    ``skip_completed_partitions`` on the input for end-to-end resume.
    """

    sink = ResumableSink(out_dir, data_format=data_format)
    # record the RESOLVED format in the layout sidecar: resuming a lance
    # manifest with a parquet sink (or vice versa) would mix fragment
    # formats within one output directory — make it a loud error.
    _check_layout(out_dir, num_parts, write=True, extra={"data_format": sink.data_format})

    def tag(t: pa.Table) -> pa.Table:
        if "doc_id" not in t.column_names:
            raise ValueError(
                "resumable sink requires a 'doc_id' column to derive the "
                f"fragment partition; got columns {t.column_names}"
            )
        return t.append_column("_part", pa.array(partition_of(t["doc_id"], num_parts)))

    def write_part(group: pa.Table) -> pa.Table:
        # named wrapper: Ray's map_groups needs fn.__name__; the sink's
        # __call__ carries the actual semantics (no duplicate logic here)
        return sink(group)

    tagged = extracted_ds.map_batches(tag, batch_format="pyarrow")
    manifest_rows = tagged.groupby("_part").map_groups(write_part, batch_format="pyarrow")
    df = manifest_rows.to_pandas()
    if return_stats:
        return df, manifest_rows.stats()
    return df


def sink_partitioned(ds_tagged, out_dir: str, num_parts: int, empty_tbl, extra: dict):
    """`_part`-tagged rows -> committed fragments, plus explicit EMPTY
    fragments for untouched partitions so "manifest has P rows" is the
    unambiguous build-complete condition (a resume/consistency check can
    then distinguish 'legitimately empty' from 'crashed mid-build').
    Shared by the persisted-structure builders (inverted index, minhash
    store, IVF cell store). A rebuild after a crash rewrites ALL
    partitions (atomic rewrites are idempotent) — there is no
    skip-completed fast path here because the partition key is derived
    from row content, not input shards."""
    sink = ResumableSink(out_dir, data_format="auto")
    _check_layout(
        out_dir, num_parts, write=True, extra={"data_format": sink.data_format, **extra}
    )

    def write_part(group: pa.Table) -> pa.Table:
        return sink(group)

    df = (
        ds_tagged.groupby("_part")
        .map_groups(write_part, batch_format="pyarrow")
        .to_pandas()
    )
    done = load_manifest(out_dir)
    for p in range(num_parts):
        if p not in done:
            sink.write(empty_tbl, p)
    return df


GEN_MARKER = "_gen_committed.json"


def load_generations(out_dir: str) -> list[str]:
    """Registered delta-generation directory names (name-ordered — the
    zero-padded sequence prefix makes that append order) of an
    incremental store. A generation is visible iff its COMMIT MARKER
    (``<gen>/_gen_committed.json``) exists: a crashed update leaves an
    unmarked (invisible) directory, never a half-visible one. Legacy
    stores registered through a root ``_generations.json`` keep
    working (union of both mechanisms)."""
    names = set()
    root = Path(out_dir)
    legacy = root / "_generations.json"
    if legacy.exists():
        names.update(json.loads(legacy.read_text())["deltas"])
    if root.is_dir():
        for child in root.iterdir():
            if child.is_dir() and (child / GEN_MARKER).exists():
                names.add(child.name)
    return sorted(names)


def register_generation(out_dir: str, name: str) -> None:
    """Commit one delta generation by atomically creating its marker
    file. Registration is PER-GENERATION (one atomic file create inside
    the generation's own directory), not a read-modify-write of shared
    root state — concurrent updaters of the same store each commit
    their own delta and neither can erase the other's registration."""
    gdir = Path(out_dir) / name
    tmp = gdir / f".tmp-{uuid.uuid4().hex}.json"
    tmp.write_text(json.dumps({"generation": name}))
    os.replace(tmp, gdir / GEN_MARKER)


def require_complete_manifest(out_dir: str, num_parts: int, *, what: str) -> dict:
    """Load a store manifest and FAIL LOUDLY if any partition is missing
    (a crashed build) — the check that makes partial stores unreadable
    instead of silently incomplete."""
    manifest = load_manifest(out_dir)
    missing = [p for p in range(num_parts) if p not in manifest]
    if missing:
        raise ValueError(
            f"{what}: store at {out_dir} is incomplete — partitions {missing} "
            f"missing from the manifest (crashed build?); rebuild the store"
        )
    return manifest


def compact_partitions(in_dir: str, out_dir: str, *, num_parts: int):
    """Compact a committed fragment directory to a coarser layout — the
    100 TB small-file remedy (a resumable run that checkpointed at fine
    granularity, or many incremental runs, leaves more files than the
    downstream reader wants).

    Streams the COMMITTED fragments (enumerated from the manifest, so
    half-written files are never compacted), re-partitions every row with
    the same ``partition_of(doc_id, num_parts)`` law at the new coarser
    count, and writes through the same atomic ``ResumableSink`` — the
    output directory is itself resumable and readable by everything that
    reads sink output.

    Self-verifying without a second data pass: the per-fragment
    ``span_checksum`` is an order-insensitive wrap-sum, so the SUM over
    fragments is layout-invariant. Compaction asserts (total rows, total
    spans, total checksum) match the source manifest and raises on any
    discrepancy. Returns the new manifest DataFrame.
    """
    import ray as _ray

    if os.path.abspath(in_dir) == os.path.abspath(out_dir):
        raise ValueError(
            "compact_partitions: in-place compaction would overwrite source "
            "fragments while they are still being read; use a distinct out_dir."
        )
    if load_manifest(out_dir):
        raise ValueError(
            f"compact_partitions: {out_dir!r} already holds a manifest — "
            "stale records would poison the self-verification. Use a fresh "
            "out_dir."
        )
    src = load_manifest(in_dir)
    if not src:
        raise ValueError(f"no committed fragments under {in_dir!r}")
    files = [rec["file"] for _, rec in sorted(src.items())]
    src_rows = sum(rec["row_count"] for rec in src.values())
    src_spans = sum(rec["span_count"] for rec in src.values())
    src_sum = sum(rec["span_checksum"] for rec in src.values()) % (1 << 64)

    ds = read_fragments(files)
    manifest_df = write_extracted_resumable(ds, out_dir, num_parts=num_parts)

    new = load_manifest(out_dir)
    new_rows = sum(rec["row_count"] for rec in new.values())
    new_spans = sum(rec["span_count"] for rec in new.values())
    new_sum = sum(rec["span_checksum"] for rec in new.values()) % (1 << 64)
    if (new_rows, new_spans, new_sum) != (src_rows, src_spans, src_sum):
        raise RuntimeError(
            "compaction verification failed: "
            f"rows {src_rows}->{new_rows}, spans {src_spans}->{new_spans}, "
            f"checksum {src_sum:#x}->{new_sum:#x}"
        )
    return manifest_df


def sorted_export(
    ds,
    out_dir: str,
    *,
    value_col: str,
    tiebreak_col: str,
    out_cols: list[str],
    num_fragments: int = 16,
):
    """Distributed ORDER BY export: write ``ds`` as ``num_fragments``
    value-ordered, non-overlapping fragments (fragment i's values all sort
    before fragment i+1's; rows inside each fragment are sorted) WITHOUT a
    global sort — the range-bucket + prefix-offset ranking primitive
    (``functions/ranking.partitioned_rank``) assigns every row its exact
    global rank and NTILE in one coarse shuffle, and each tile is written
    by its own group task through the atomic ``ResumableSink``. Fragment
    lineage records carry ``min_value``/``max_value`` so readers (and the
    self-check below) can verify the total order from the manifest alone.

    Returns the manifest DataFrame; raises if fragment ranges overlap.
    """
    import pyarrow.compute as pc_

    from ocr_ray.functions.ranking import partitioned_rank

    if value_col not in out_cols:
        raise ValueError(
            f"sorted_export: value_col {value_col!r} must be in out_cols "
            "(the write body and the lineage min/max need it)"
        )
    if load_manifest(out_dir):
        raise ValueError(
            f"sorted_export: {out_dir!r} already holds a manifest — a "
            "different-fragment-count rerun would mix stale and new records. "
            "Use a fresh out_dir."
        )

    const = "__all__"

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("_g", pa.array([const] * t.num_rows, type=pa.string()))

    ranked = partitioned_rank(
        ds.map_batches(tag, batch_format="pyarrow"),
        part_col="_g",
        value_col=value_col,
        tiebreak_col=tiebreak_col,
        out_cols=out_cols,
        ntile=num_fragments,
    )
    sink = ResumableSink(out_dir)

    def write_tile(g: pd.DataFrame) -> pa.Table:
        tile = int(g["tile"].iloc[0])
        g = g.sort_values("rn", kind="mergesort").drop(columns=["tile"])
        tbl = pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)
        return sink.write(
            tbl.drop_columns(["rn"]),
            tile,
            extra={
                "min_value": float(g[value_col].iloc[0]),
                "max_value": float(g[value_col].iloc[-1]),
                "rank_start": int(g["rn"].iloc[0]),
            },
        )

    df = ranked.groupby("tile").map_groups(write_tile, batch_format="pandas").to_pandas()
    recs = sorted(load_manifest(out_dir).values(), key=lambda r: r["partition"])
    for a, b in zip(recs, recs[1:]):
        if a["max_value"] > b["min_value"]:
            raise RuntimeError(
                f"sorted_export: fragments {a['partition']} and {b['partition']} overlap "
                f"({a['max_value']} > {b['min_value']})"
            )
    return df


# ---------------------------------------------------------------------------
# Snapshots: time-travel reads over the resumable sink's manifest
# ---------------------------------------------------------------------------


def snapshot_commit(out_dir: str, *, note: str | None = None) -> int:
    """Pin the table's CURRENT committed state as an immutable snapshot.

    Zero-copy copy-on-write at the file level: every committed fragment is
    HARD-LINKED into ``_snapshots/snap-<id>-files/`` (fragments are
    immutable once written — rewrites go through temp-file +
    ``os.replace``, which unlinks the old *name* but the snapshot's link
    keeps the old *inode* alive), then the snapshot record
    ``_snapshots/snap-<id>.json`` is renamed into place as the COMMIT
    POINT. A crash mid-link leaves an orphan files dir that the next
    commit clears; no half-snapshot is ever readable.

    Driver-side cost is O(partitions) links + one small JSON — no data
    bytes move, so this is as cheap at 100 TB as at 100 MB. Returns the
    new snapshot id (monotonic, parent-chained).
    """
    import shutil

    man = load_manifest(out_dir)
    if not man:
        raise ValueError(f"snapshot_commit: no committed fragments under {out_dir}")
    sdir = Path(out_dir) / "_snapshots"
    sdir.mkdir(parents=True, exist_ok=True)
    existing = sorted(int(p.stem.split("-", 1)[1]) for p in sdir.glob("snap-*.json"))
    sid = (existing[-1] + 1) if existing else 1
    fdir = sdir / f"snap-{sid:05d}-files"
    if fdir.exists():
        shutil.rmtree(fdir)  # orphan from a crashed commit attempt
    fdir.mkdir()
    files = []
    for part, rec in sorted(man.items()):
        src = Path(rec["file"])
        dst = fdir / f"part-{part:05d}{src.suffix or '.parquet'}"
        if src.is_dir():  # a Lance fragment is a directory: link per file
            shutil.copytree(src, dst, copy_function=os.link)
        else:
            os.link(src, dst)
        files.append(
            {
                "partition": part,
                "file": str(dst),
                "row_count": rec["row_count"],
                "span_checksum": rec.get("span_checksum", 0),
            }
        )
    srec = {
        "snapshot": sid,
        "parent": existing[-1] if existing else None,
        "note": note,
        "engine": ENGINE_VERSION,
        "files": files,
    }
    tmp = sdir / f".tmp-{uuid.uuid4().hex}.json"
    tmp.write_text(json.dumps(srec))
    os.replace(tmp, sdir / f"snap-{sid:05d}.json")
    return sid


def list_snapshots(out_dir: str) -> list[dict]:
    """Snapshot log, oldest first: id, parent, note, fragment/row totals."""
    sdir = Path(out_dir) / "_snapshots"
    out = []
    if not sdir.is_dir():
        return out
    for f in sorted(sdir.glob("snap-*.json")):
        rec = json.loads(f.read_text())
        out.append(
            {
                "snapshot": rec["snapshot"],
                "parent": rec["parent"],
                "note": rec["note"],
                "n_fragments": len(rec["files"]),
                "row_count": sum(r["row_count"] for r in rec["files"]),
            }
        )
    return out


def _snapshot_record(out_dir: str, snapshot_id: int) -> dict:
    p = Path(out_dir) / "_snapshots" / f"snap-{snapshot_id:05d}.json"
    if not p.exists():
        known = [s["snapshot"] for s in list_snapshots(out_dir)]
        raise ValueError(
            f"snapshot {snapshot_id} not found under {out_dir} (have {known})"
        )
    return json.loads(p.read_text())


def read_snapshot(out_dir: str, snapshot_id: int):
    """Streaming Dataset over the table AS OF ``snapshot_id`` — the
    time-travel read. Later rewrites/compactions of the live table do not
    affect it (the snapshot owns hard links to the original immutable
    fragment files)."""
    rec = _snapshot_record(out_dir, snapshot_id)
    return read_fragments([r["file"] for r in rec["files"]])


def snapshot_diff(out_dir: str, a: int, b: int) -> dict:
    """Lineage diff between two snapshots from their manifests alone —
    no data read. Partitions are compared by span checksum (content
    fingerprint), so a rewrite that lands identical bytes reports
    unchanged."""
    fa = {r["partition"]: r for r in _snapshot_record(out_dir, a)["files"]}
    fb = {r["partition"]: r for r in _snapshot_record(out_dir, b)["files"]}
    added = sorted(set(fb) - set(fa))
    removed = sorted(set(fa) - set(fb))
    changed = sorted(
        p
        for p in set(fa) & set(fb)
        if (fa[p]["span_checksum"], fa[p]["row_count"])
        != (fb[p]["span_checksum"], fb[p]["row_count"])
    )
    return {
        "added": added,
        "removed": removed,
        "changed": changed,
        "rows_a": sum(r["row_count"] for r in fa.values()),
        "rows_b": sum(r["row_count"] for r in fb.values()),
    }


def read_range_pruned(out_dir: str, *, lo=None, hi=None, column: str | None = None):
    """Zone-map scan: stream only the fragments whose lineage min/max
    interval intersects ``[lo, hi]`` — file skipping decided from the
    manifest ALONE (no data bytes touched for skipped fragments).

    Two stat sources: ``column=None`` uses the sort-key interval that
    ``sorted_export`` records (``min_value``/``max_value`` — non-
    overlapping tiles, maximal pruning); ``column='c'`` uses the
    AUTOMATIC per-column stats every ``ResumableSink.write`` records
    (``stats['c']`` — any primitive column of any sink table, pruning
    power proportional to how clustered that column is in the layout).
    At 100 TB this is the difference between a range query scanning one
    fragment and scanning the corpus.

    Returns ``(Dataset, n_skipped)``. Rows inside kept fragments still
    need the residual predicate (zone maps prune files, not rows).
    Raises if any fragment lacks the requested stats.
    """
    recs = sorted(load_manifest(out_dir).values(), key=lambda r: r["partition"])
    if not recs:
        raise ValueError(f"read_range_pruned: no manifest under {out_dir}")

    def bounds(r: dict):
        if column is None:
            if "min_value" not in r or "max_value" not in r:
                return None
            return r["min_value"], r["max_value"]
        st = r.get("stats", {}).get(column)
        return (st[0], st[1]) if st else None

    def _coerce(v, sample):
        # date/timestamp stats are stored as their str() form; coerce
        # caller-supplied datetime/date bounds the same way (ISO-style
        # strings order lexicographically)
        if isinstance(sample, str) and v is not None and not isinstance(v, str):
            return str(v)
        return v

    # empty fragments carry no stats by construction (nothing to bound) —
    # they are trivially skippable, never an error
    nonempty = [r for r in recs if r["row_count"] > 0]
    missing = [r["partition"] for r in nonempty if bounds(r) is None]
    if missing:
        what = f"stats for column {column!r}" if column else "sort-key min/max"
        raise ValueError(
            f"read_range_pruned: fragments {missing} carry no {what} "
            "(write through sorted_export / a current ResumableSink, or "
            "pass min/max via extra=...)"
        )
    keep = []
    for r in nonempty:
        b0, b1 = bounds(r)
        lo_c, hi_c = _coerce(lo, b0), _coerce(hi, b0)
        if (hi_c is None or b0 <= hi_c) and (lo_c is None or b1 >= lo_c):
            keep.append(r)
    if not keep:
        import ray as _ray

        return _ray.data.from_items([]), len(recs)
    return read_fragments([r["file"] for r in keep]), len(recs) - len(keep)


def expire_snapshots(out_dir: str, *, keep_last: int = 1) -> list[int]:
    """Retention: drop all but the newest ``keep_last`` snapshots,
    deleting each expired snapshot's JSON first (the record disappears
    atomically before any file is unlinked — a crash mid-vacuum leaves
    only unreferenced link dirs, never a readable-but-broken snapshot)
    and then its hard-link dir (frees the pinned inodes unless a newer
    snapshot or the live table still links them). Returns expired ids."""
    import shutil

    if keep_last < 1:
        raise ValueError("expire_snapshots: keep_last must be >= 1")
    sdir = Path(out_dir) / "_snapshots"
    snaps = sorted(p for p in sdir.glob("snap-*.json")) if sdir.is_dir() else []
    expired = []
    for p in snaps[:-keep_last] if keep_last else snaps:
        sid = int(p.stem.split("-", 1)[1])
        fdir = sdir / f"snap-{sid:05d}-files"
        p.unlink()
        if fdir.is_dir():
            shutil.rmtree(fdir)
        expired.append(sid)
    return expired


# ---------------------------------------------------------------------------
# Per-fragment Bloom filters: point-lookup file skipping on secondary keys
# ---------------------------------------------------------------------------
# Zone maps (above) skip files for RANGE predicates on the cluster key; a
# table clustered one way still gets point lookups another way (orders
# clustered by customer, fetched by order id). A small per-fragment Bloom
# of the secondary key, carried in the lineage record, answers "which
# fragment(s) may hold key X" from the manifest alone.


def column_bloom(values, *, nbits: int = 131072, k: int = 4) -> dict:
    """Build a Bloom filter over an int64 key column, vectorized: k hash
    positions per key via double hashing of the splitmix64-mixed value
    (h_i = h1 + i*h2 mod nbits). Returns a JSON-safe dict
    {hex, nbits, k} sized ~nbits/8 bytes (16 KiB at the default) —
    negligible next to the fragment it describes."""
    v = np.asarray(values, dtype=np.int64).view(np.uint64)
    from ocr_ray.functions.hashing import mix64

    h1 = mix64(v)
    h2 = mix64(v ^ np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
    bits = np.zeros(nbits, dtype=bool)
    for i in range(k):
        bits[((h1 + np.uint64(i) * h2) % np.uint64(nbits)).astype(np.int64)] = True
    return {"hex": np.packbits(bits).tobytes().hex(), "nbits": nbits, "k": k}


def bloom_may_contain(bloom: dict, values) -> np.ndarray:
    """Vectorized membership probe: True = fragment MAY hold the key
    (false positives bounded by the filter size), False = definitely
    not. Aligned with ``values``."""
    from ocr_ray.functions.hashing import mix64

    bits = np.unpackbits(
        np.frombuffer(bytes.fromhex(bloom["hex"]), dtype=np.uint8)
    ).astype(bool)
    nbits, k = bloom["nbits"], bloom["k"]
    v = np.asarray(values, dtype=np.int64).view(np.uint64)
    h1 = mix64(v)
    h2 = mix64(v ^ np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
    ok = np.ones(len(v), dtype=bool)
    for i in range(k):
        ok &= bits[((h1 + np.uint64(i) * h2) % np.uint64(nbits)).astype(np.int64)]
    return ok


def read_key_pruned(out_dir: str, bloom_field: str, keys) -> tuple:
    """Point-lookup scan: stream only the fragments whose per-fragment
    Bloom (lineage field ``bloom_field``, written via
    ``ResumableSink.write(..., extra={bloom_field: column_bloom(...)})``)
    may contain ANY of ``keys`` — planned from the manifest alone.
    Returns ``(Dataset, n_skipped, candidate_checks)`` where
    ``candidate_checks`` is the total number of (key, fragment) candidate
    pairs (the measure of Bloom selectivity: ~len(keys) when the filter
    is doing its job, len(keys) x fragments when it isn't)."""
    recs = sorted(load_manifest(out_dir).values(), key=lambda r: r["partition"])
    if not recs:
        raise ValueError(f"read_key_pruned: no manifest under {out_dir}")
    missing = [r["partition"] for r in recs if bloom_field not in r]
    if missing:
        raise ValueError(
            f"read_key_pruned: fragments {missing} carry no {bloom_field!r} "
            "lineage field"
        )
    keys = np.asarray(list(keys), dtype=np.int64)
    keep, checks = [], 0
    for r in recs:
        hits = bloom_may_contain(r[bloom_field], keys)
        n = int(hits.sum())
        checks += n
        if n:
            keep.append(r)
    if not keep:
        import ray as _ray

        return _ray.data.from_items([]), len(recs), checks
    return read_fragments([r["file"] for r in keep]), len(recs) - len(keep), checks


def delete_keys(out_dir: str, keys, *, key_col: str = "doc_id") -> pd.DataFrame:
    """Targeted DELETE over a resumable-sink table: remove every row whose
    ``key_col`` is in ``keys``, rewriting ONLY the fragments that can hold
    an affected key — planned from the partition law (``partition_of`` on
    the layout's ``num_parts``), so a delete of k keys touches at most k
    fragments no matter how large the table is. Untouched fragments are
    never opened.

    Rewrites go fragment-parallel through ``ResumableSink.write`` (same
    demote -> temp -> atomic-replace protocol as any rewrite: a crash
    mid-delete leaves the partition demoted and the next resume repairs
    it; earlier snapshots keep the pre-delete bytes via their hard
    links). An emptied fragment is committed as an empty table — the
    partition stays complete, the resume law intact.

    Returns a DataFrame (partition, rows_before, rows_after, deleted)
    for the rewritten fragments only.
    """
    import ray as _ray

    man = load_manifest(out_dir)
    if not man:
        raise ValueError(f"delete_keys: no manifest under {out_dir}")
    lp = Path(out_dir) / "_manifest" / "layout.json"
    if not lp.exists():
        raise ValueError(f"delete_keys: no layout record under {out_dir}")
    num_parts = json.loads(lp.read_text())["num_parts"]
    keys = list(keys)
    if not keys:
        return pd.DataFrame(
            columns=["partition", "rows_before", "rows_after", "deleted"]
        )
    affected = sorted(set(partition_of(keys, num_parts).tolist()) & set(man))
    if not affected:
        return pd.DataFrame(
            columns=["partition", "rows_before", "rows_after", "deleted"]
        )
    fmt = man[affected[0]].get("format", "parquet")
    sink = ResumableSink(out_dir, data_format=fmt)
    key_arr = pa.array(keys)
    plan = pa.table(
        {
            "partition": pa.array(affected, type=pa.int64()),
            "file": pa.array([man[p]["file"] for p in affected], type=pa.string()),
        }
    )

    def rewrite(batch: pa.Table) -> pa.Table:
        rows = []
        for part, f in zip(
            batch["partition"].to_pylist(), batch["file"].to_pylist()
        ):
            if f.endswith(".lance"):  # pragma: no cover - lance absent here
                tbl = lance.dataset(f).to_table()
            else:
                tbl = pq.read_table(f)
            keep = pa.compute.invert(
                pa.compute.is_in(tbl[key_col], value_set=key_arr)
            )
            kept = tbl.filter(keep)
            sink.write(kept, int(part), extra={"deleted": tbl.num_rows - kept.num_rows})
            rows.append((int(part), tbl.num_rows, kept.num_rows))
        return pa.table(
            {
                "partition": pa.array([r[0] for r in rows], type=pa.int64()),
                "rows_before": pa.array([r[1] for r in rows], type=pa.int64()),
                "rows_after": pa.array([r[2] for r in rows], type=pa.int64()),
                "deleted": pa.array([r[1] - r[2] for r in rows], type=pa.int64()),
            }
        )

    out = (
        _ray.data.from_arrow(plan)
        .repartition(len(affected))
        .map_batches(rewrite, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    return out.sort_values("partition", ignore_index=True)


def read_copartitioned_join(
    dir_a: str,
    dir_b: str,
    *,
    on: str,
    schema: pa.Schema,
    how: str = "inner",
    suffix: str = "_r",
):
    """SHUFFLE-FREE join of two resumable-sink tables written under the
    SAME partition law on the join key (``partition_of(key, num_parts)``
    with equal ``num_parts``): matching keys are already in matching
    fragments, so the join is one map task per partition PAIR reading two
    files — no all-to-all, ever. This is the write-once/join-forever
    contract: at 100 TB you pay the partitioned write once and every
    subsequent join of co-partitioned tables is embarrassingly parallel.

    Validates both layouts agree before reading a byte; a partition
    missing on one side joins against empty (inner drops, left keeps
    with null fills). ``schema`` pins the joined output (the engine's
    explicit-schema discipline: every partition emits the same block
    type, including empty ones). Returns a streaming Dataset.
    """
    import ray as _ray

    la = json.loads((Path(dir_a) / "_manifest" / "layout.json").read_text())
    lb = json.loads((Path(dir_b) / "_manifest" / "layout.json").read_text())
    if la["num_parts"] != lb["num_parts"]:
        raise ValueError(
            f"co-partitioned join needs equal partition counts: "
            f"{la['num_parts']} vs {lb['num_parts']}"
        )
    man_a, man_b = load_manifest(dir_a), load_manifest(dir_b)
    parts = sorted(set(man_a) | set(man_b))
    plan = pa.table(
        {
            "part": pa.array(parts, type=pa.int64()),
            "file_a": pa.array(
                [man_a[p]["file"] if p in man_a else "" for p in parts],
                type=pa.string(),
            ),
            "file_b": pa.array(
                [man_b[p]["file"] if p in man_b else "" for p in parts],
                type=pa.string(),
            ),
        }
    )
    names = [f.name for f in schema]

    def join_pair(batch: pa.Table) -> pa.Table:
        outs = [schema.empty_table()]
        for fa, fb in zip(batch["file_a"].to_pylist(), batch["file_b"].to_pylist()):
            a = pq.read_table(fa).to_pandas() if fa else None
            b = pq.read_table(fb).to_pandas() if fb else None
            if a is None and b is None:
                continue
            if a is None:
                if how in ("inner", "left"):
                    continue
                a = pd.DataFrame({on: pd.Series([], dtype="int64")})
            if b is None:
                if how == "inner":
                    continue
                b = pd.DataFrame({on: pd.Series([], dtype="int64")})
            m = a.merge(b, on=on, how=how, suffixes=("", suffix))
            # a side absent from this partition contributes no columns to
            # the merge output: null-fill them so every block matches the
            # pinned schema (outer semantics, not a KeyError)
            for col in names:
                if col not in m.columns:
                    m[col] = pd.NA
            if len(m):
                outs.append(
                    pa.Table.from_pandas(m[names], preserve_index=False).cast(schema)
                )
        return pa.concat_tables(outs)

    return (
        _ray.data.from_arrow(plan)
        .repartition(len(parts))
        .map_batches(join_pair, batch_format="pyarrow", batch_size=None)
    )


def manifest_aggregate(out_dir: str, column: str | None = None) -> dict:
    """METADATA-ONLY aggregates: COUNT(*) (and MIN/MAX of ``column``)
    answered from the lineage records alone — zero data files opened,
    constant work regardless of table size. The lakehouse fast path for
    ``SELECT count(*), min(c), max(c)`` with no predicate: row counts
    sum from the manifest and the global min/max fold over the
    per-fragment zone-map stats every sink write records.

    Returns ``{"row_count": n}`` plus ``{"min": lo, "max": hi}`` when a
    column is named. Raises if any fragment lacks stats for it (the
    fallback is an ordinary scan — the caller decides)."""
    recs = sorted(load_manifest(out_dir).values(), key=lambda r: r["partition"])
    if not recs:
        raise ValueError(f"manifest_aggregate: no manifest under {out_dir}")
    out: dict = {"row_count": sum(r["row_count"] for r in recs)}
    if column is not None:
        nonempty = [r for r in recs if r["row_count"] > 0]
        missing = [
            r["partition"] for r in nonempty if column not in r.get("stats", {})
        ]
        if missing:
            raise ValueError(
                f"manifest_aggregate: fragments {missing} carry no stats "
                f"for column {column!r} — fall back to a scan"
            )
        if nonempty:
            out["min"] = min(r["stats"][column][0] for r in nonempty)
            out["max"] = max(r["stats"][column][1] for r in nonempty)
        else:
            out["min"] = out["max"] = None
    return out


def zorder_export(
    ds,
    out_dir: str,
    *,
    cols: tuple,
    tiebreak_col: str,
    out_cols: list,
    num_fragments: int = 32,
):
    """MULTI-COLUMN clustering export: rows are ordered by the Morton
    (Z-order) interleave of two columns and tiled into ``num_fragments``
    equal fragments via ``sorted_export`` — so the AUTOMATIC per-column
    zone maps every sink write records become selective on BOTH columns
    at once. A single-column sort prunes only its own column (the other
    spans every fragment); Z-order trades a little pruning power on each
    for real pruning on both — the standard lakehouse answer to
    two-dimensional range queries at 100 TB.

    ``cols`` must be two numeric column names present in ``out_cols``.
    Returns the manifest DataFrame (fragments carry ``stats`` for both).
    """
    ca, cb = cols

    # one cheap pass for the two global ranges: per-batch normalization
    # would break the global ordering, so every task must normalize with
    # the same bounds
    from ray.data.aggregate import Max, Min

    mm = ds.aggregate(Min(ca), Max(ca), Min(cb), Max(cb))
    lo_a, hi_a = float(mm[f"min({ca})"]), float(mm[f"max({ca})"])
    lo_b, hi_b = float(mm[f"min({cb})"]), float(mm[f"max({cb})"])

    def add_z(t: pa.Table) -> pa.Table:
        from ocr_ray.functions.hashing import morton_code

        z = morton_code(
            t[ca].to_numpy(zero_copy_only=False),
            t[cb].to_numpy(zero_copy_only=False),
            bounds_a=(lo_a, hi_a),
            bounds_b=(lo_b, hi_b),
        )
        return t.append_column("_z", pa.array(z))

    return sorted_export(
        ds.map_batches(add_z, batch_format="pyarrow"),
        out_dir,
        value_col="_z",
        tiebreak_col=tiebreak_col,
        out_cols=[*out_cols, "_z"],
        num_fragments=num_fragments,
    )


# ---------------------------------------------------------------------------
# Merge-on-read deletes (deletion vectors)
# ---------------------------------------------------------------------------


def delete_keys_mor(out_dir: str, keys, *, key_col: str = "doc_id") -> pd.DataFrame:
    """MERGE-ON-READ delete: record the keys in per-partition DELETION
    VECTOR sidecars instead of rewriting data files — the Iceberg/Delta
    deletion-vector pattern, the right trade when deletes are frequent
    and reads can afford a filter (``delete_keys`` stays the
    copy-on-write path; ``compact_deletes`` folds vectors back into the
    data). O(deleted keys) work regardless of table size: only the
    sidecars of the partitions the partition law maps the keys to are
    touched (temp + atomic rename, idempotent merge with any existing
    vector — a retried delete is a no-op).

    Returns a DataFrame (partition, n_delete_keys) with each affected
    partition's TOTAL vector size after the merge.
    """
    man = load_manifest(out_dir)
    if not man:
        raise ValueError(f"delete_keys_mor: no manifest under {out_dir}")
    lp = Path(out_dir) / "_manifest" / "layout.json"
    if not lp.exists():
        raise ValueError(f"delete_keys_mor: no layout record under {out_dir}")
    num_parts = json.loads(lp.read_text())["num_parts"]
    keys = list(keys)
    if not keys:
        return pd.DataFrame(columns=["partition", "n_delete_keys"])
    parts = partition_of(keys, num_parts)
    rows = []
    mdir = Path(out_dir) / "_manifest"
    for p in sorted(set(parts.tolist())):
        if p not in man:
            continue
        new_keys = {k for k, kp in zip(keys, parts.tolist()) if kp == p}
        dv_path = mdir / f"deletes-part-{p:05d}.json"
        if dv_path.exists():
            new_keys |= set(json.loads(dv_path.read_text())["keys"])
        tmp = dv_path.with_suffix(".json.tmp")
        tmp.write_text(
            json.dumps(
                {"partition": p, "key_col": key_col, "keys": sorted(new_keys)}
            )
        )
        os.replace(tmp, dv_path)
        rows.append((p, len(new_keys)))
    return pd.DataFrame(rows, columns=["partition", "n_delete_keys"])


def load_delete_vectors(out_dir: str) -> dict[int, list]:
    """{partition: deleted keys} from every deletion-vector sidecar."""
    mdir = Path(out_dir) / "_manifest"
    out: dict[int, list] = {}
    if not mdir.is_dir():
        return out
    for f in mdir.glob("deletes-part-*.json"):
        rec = json.loads(f.read_text())
        out[int(rec["partition"])] = rec["keys"]
    return out


def read_with_deletes(out_dir: str):
    """Streaming read of a MoR table: fragments stream as usual and the
    UNION of all deletion vectors (each key lives in exactly one
    partition, so the union is duplicate-free) broadcasts once as an
    anti-membership filter inside the read tasks — no data file is
    rewritten, no extra shuffle. Vector size is bounded by deleted keys,
    the same broadcast budget as the semi/anti join family."""
    import ray as _ray

    from ocr_ray.functions.relational import semi_filter

    man = load_manifest(out_dir)
    if not man:
        raise ValueError(f"read_with_deletes: no manifest under {out_dir}")
    ds = read_fragments([man[p]["file"] for p in sorted(man)])
    dvs = load_delete_vectors(out_dir)
    if not dvs:
        return ds
    first = next(iter(sorted(dvs)))
    key_col = json.loads(
        (Path(out_dir) / "_manifest" / f"deletes-part-{first:05d}.json").read_text()
    )["key_col"]
    all_keys: list = []
    for ks in dvs.values():
        all_keys.extend(ks)
    return semi_filter(ds, _ray.put(all_keys), key_col, anti=True)


def compact_deletes(out_dir: str, *, key_col: str = "doc_id") -> pd.DataFrame:
    """Fold the deletion vectors into the data files (MoR -> CoW): apply
    ``delete_keys`` for the union of all vectors, then remove the
    sidecars — after which ``read_with_deletes`` and a plain fragment
    read agree. Returns ``delete_keys``' rewrite report."""
    dvs = load_delete_vectors(out_dir)
    if not dvs:
        return pd.DataFrame(
            columns=["partition", "rows_before", "rows_after", "deleted"]
        )
    all_keys: list = []
    for ks in dvs.values():
        all_keys.extend(ks)
    report = delete_keys(out_dir, all_keys, key_col=key_col)
    mdir = Path(out_dir) / "_manifest"
    for f in mdir.glob("deletes-part-*.json"):
        f.unlink()
    return report
