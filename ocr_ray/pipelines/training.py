"""Training-set materialization: land the flagship extract → curate →
pack pipeline (``queries.training_windows``) as a RESUMABLE, Hive-layout
on-disk artifact::

    out_dir/split=train/part=00003/data.parquet   (+ _manifest/ sidecars)
    out_dir/split=val/...
    out_dir/split=test/...

Each (split, part) fragment commits atomically through the same
``ResumableSink`` (tmp-write + rename + manifest sidecar) as the
extraction sink, so a killed run resumes by dropping already-committed
fragments' windows BEFORE the sink shuffle — no decode, dedup or packing
work is respent on finished partitions, and re-running a complete
artifact writes nothing. This is the "user points the engine at raw
interleaved shards and gets a training set" deliverable; the row-level
content is oracle-checked via the ``extract_training_set`` registry
entry (same pipeline, chunk text dropped for the value-hash).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ocr_ray.state.manifest import ResumableSink, load_manifest, partition_of

SPLITS = ("train", "val", "test")


def write_training_set(sf_dir: str, out_dir: str, *, num_parts: int = 8) -> pd.DataFrame:
    """Run the flagship pipeline and commit it under ``out_dir``.

    Returns the manifest rows written by THIS run (a complete artifact
    re-run returns zero rows). ``num_parts`` fragments per split —
    size from input bytes at scale (``sizing.buckets_for_input``).
    """
    from ocr_ray.pipelines.queries import training_windows

    done = {
        s: set(load_manifest(os.path.join(out_dir, f"split={s}"))) for s in SPLITS
    }
    any_done = any(done.values())

    def tag_and_skip(t: pa.Table) -> pa.Table:
        part = partition_of(t["doc_id"], num_parts).astype(np.int32)
        t = t.append_column("_part", pa.array(part))
        if not any_done:
            return t
        split = t["split"].to_numpy(zero_copy_only=False)
        keep = np.ones(t.num_rows, dtype=bool)
        for s, parts_done in done.items():
            if parts_done:
                keep &= ~((split == s) & np.isin(part, list(parts_done)))
        return t.filter(pa.array(keep))

    def write_group(g: pa.Table, out_dir: str) -> pa.Table:
        split = g["split"][0].as_py()
        part = int(g["_part"][0].as_py())
        sink = ResumableSink(os.path.join(out_dir, f"split={split}"))
        rec = sink.write(g.drop_columns(["_part"]), part, extra={"split": split})
        return rec.append_column("split", pa.array([split], type=pa.string()))

    windows = training_windows(sf_dir, keep_chunk=True).map_batches(
        tag_and_skip, batch_format="pyarrow"
    )
    manifest_rows = windows.groupby(["split", "_part"]).map_groups(
        functools.partial(write_group, out_dir=out_dir), batch_format="pyarrow"
    )
    return manifest_rows.to_pandas()


def read_training_set(out_dir: str, *, split: str | None = None):
    """Read a committed artifact back as one Dataset (optionally one
    split) — only fragments recorded complete in the manifests, so a
    concurrent or crashed writer's partial files are never read."""
    from ocr_ray.state.manifest import read_fragments

    files = []
    for s in SPLITS if split is None else (split,):
        sdir = os.path.join(out_dir, f"split={s}")
        for rec in load_manifest(sdir).values():
            files.append(rec["file"])
    return read_fragments(files)
