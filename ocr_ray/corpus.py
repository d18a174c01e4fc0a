"""Deterministic interleaved-span corpus synthesis.

The engine's authoritative input shape (``BASELINE.json`` ``input_hint``) is
a table of interleaved text+media documents
``(doc_id: string, spans: large_list<struct<kind,text,media_ref,offset>>)``.
No such table ships with the testdata, so it is synthesized *deterministically*
from each scale factor's ``documents.parquet`` (doc_id int64, text) with pure
integer arithmetic — simple enough that a DuckDB SQL oracle reproduces the
synthesis + extraction end-to-end (see ``__ray_entry__.oracle_sql``):

- the doc's words (``text.split(' ')``) are grouped into spans of
  ``WORDS_PER_SPAN`` consecutive words; span index ``si`` = reading order;
- span kind from ``k = doc_id + si``:
  ``k % 7 == 0`` -> boilerplate; else ``k % 5 == 3`` -> media
  (empty text, ``media_ref = 'm-%d' % ((doc_id*1000 + si) % 9973)``);
  else text;
- in the glyph variant, text spans with ``k % 11 == 5`` become
  ``kind='glyphs'``: the text is withheld and replaced by the encoded
  glyph byte stream (``ocr_ray.stages.glyphs.GlyphCodec``) that the
  recognition stages must invert;
- ``doc_id`` string form is ``'doc-%08d' % doc_id``; spans are stored in a
  deterministically *shuffled* order within each document (seeded per doc)
  so reassembly genuinely has to restore reading order — the analogue of
  the reference's out-of-order event satisfaction
  (``/root/reference/src/task/hc/hc-task.c:236-270``).

``ensure_corpus`` materializes the corpus once per (sf_dir, variant) as
partitioned Parquet under /tmp and reuses it (atomic rename + _SUCCESS
marker, same idempotent-commit discipline as the engine's own sinks).
"""

from __future__ import annotations

import os
import random
import shutil
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ocr_ray.schema import (
    KIND_BOILERPLATE,
    KIND_GLYPHS,
    KIND_MEDIA,
    KIND_TEXT,
    SPAN_STRUCT,
)
from ocr_ray.stages.glyphs import GlyphCodec

WORDS_PER_SPAN = 8
MEDIA_MOD = 9973
CORPUS_ROOT = Path(os.environ.get("OCR_RAY_CORPUS_DIR", "/tmp/ocr_ray_corpus"))

SPAN_STRUCT_PAYLOAD = pa.struct(list(SPAN_STRUCT) + [pa.field("payload", pa.large_binary())])


def doc_id_str(d: int) -> str:
    return "doc-%08d" % d


def span_kind(d: int, si: int) -> str:
    k = d + si
    if k % 7 == 0:
        return KIND_BOILERPLATE
    if k % 5 == 3:
        return KIND_MEDIA
    return KIND_TEXT


def is_glyph_span(d: int, si: int) -> bool:
    return (d + si) % 11 == 5


def synthesize_doc(d: int, text: str, *, glyphs: bool, codec: GlyphCodec | None = None) -> list[dict]:
    """Spans of one document, in reading order (offset == list position)."""
    words = text.split(" ")
    spans: list[dict] = []
    for si in range(0, (len(words) + WORDS_PER_SPAN - 1) // WORDS_PER_SPAN):
        s = " ".join(words[si * WORDS_PER_SPAN : (si + 1) * WORDS_PER_SPAN])
        kind = span_kind(d, si)
        span = {"kind": kind, "text": s, "media_ref": "", "offset": si}
        if kind == KIND_MEDIA:
            span["text"] = ""
            span["media_ref"] = "m-%d" % ((d * 1000 + si) % MEDIA_MOD)
        if glyphs:
            span["payload"] = None
            if kind == KIND_TEXT and is_glyph_span(d, si):
                span["kind"] = KIND_GLYPHS
                span["payload"] = (codec or GlyphCodec()).encode(s)
                span["text"] = ""
        spans.append(span)
    return spans


def synthesize_batch(batch: pa.Table, *, glyphs: bool, shuffle: bool = True) -> pa.Table:
    """documents(doc_id:int64, text) batch -> nested span-corpus batch."""
    codec = GlyphCodec() if glyphs else None
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    doc_ids: list[str] = []
    span_lists: list[list[dict]] = []
    for d, t in zip(ids, texts):
        spans = synthesize_doc(int(d), t, glyphs=glyphs, codec=codec)
        if shuffle:
            random.Random(int(d) * 7919 + 13).shuffle(spans)
        doc_ids.append(doc_id_str(int(d)))
        span_lists.append(spans)
    struct_t = SPAN_STRUCT_PAYLOAD if glyphs else SPAN_STRUCT
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.string()),
            "spans": pa.array(span_lists, type=pa.large_list(struct_t)),
        }
    )


def replicate_documents(batch: pa.Table, *, reps: int, stride: int) -> pa.Table:
    """Deterministic corpus up-scaling for benchmarks: ``reps`` copies of
    each source document under distinct doc ids (``d + rep*stride``)."""
    if reps <= 1:
        return batch
    parts = [batch]
    for r in range(1, reps):
        shifted = pa.compute.add(batch["doc_id"], pa.scalar(r * stride, type=pa.int64()))
        parts.append(batch.set_column(batch.column_names.index("doc_id"), "doc_id", shifted))
    return pa.concat_tables(parts)


def ensure_corpus(
    sf_dir: str,
    *,
    glyphs: bool = True,
    reps: int = 1,
    force: bool = False,
) -> str:
    """Materialize (once) the span corpus for one sf dir; return its path.

    Runs through Ray Data so synthesis itself scales; cached by
    (sf name, variant, reps) with an atomic directory rename.
    """
    import ray.data

    sf_name = Path(sf_dir).name or "sf"
    tag = f"{sf_name}-{'glyphs' if glyphs else 'plain'}-x{reps}"
    out = CORPUS_ROOT / tag
    marker = out / "_SUCCESS"
    if marker.exists() and not force:
        return str(out)
    if out.exists():
        shutil.rmtree(out)
    tmp = CORPUS_ROOT / (tag + ".tmp")
    if tmp.exists():
        shutil.rmtree(tmp)
    tmp.mkdir(parents=True)

    n_src = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    stride = int(10 ** np.ceil(np.log10(max(n_src, 10))))
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    if reps > 1:
        ds = ds.map_batches(
            replicate_documents,
            batch_format="pyarrow",
            fn_kwargs={"reps": reps, "stride": stride},
        )
    ds = ds.map_batches(
        synthesize_batch, batch_format="pyarrow", fn_kwargs={"glyphs": glyphs}
    )
    ds.write_parquet(str(tmp))
    (tmp / "_SUCCESS").touch()
    tmp.rename(out)
    return str(out)
