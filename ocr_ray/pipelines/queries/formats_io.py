"""Interchange-format roundtrips: ORC, Arrow IPC, gzipped JSONL.

Each query is a full write -> read -> aggregate pipeline through one of the
``sources/formats.py`` sinks+sources: the table is exported block-parallel
to the format under a fresh /tmp dir, read back through the distributed
(per-stripe / per-batch-range / per-file) reader, and aggregated. The
oracle aggregates the original parquet view directly — so ANY fidelity
loss in the export or ingest (type coercion, float truncation, dropped
rows, encoding corruption) breaks the value hash. This is the coverage a
mixed-estate corpus needs: warehouse ORC exports, Arrow IPC handoffs,
gzipped-JSONL crawler drops, all through the same streaming contract as
the parquet path.
"""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ocr_ray.functions.relational import to_units, units_to_double
from ocr_ray.pipelines.queries._shared import query, read_docs
from ocr_ray.sources import read_table
from ocr_ray.sources.avro import read_avro, write_avro
from ocr_ray.sources.formats import (
    read_csv_dir,
    read_ipc,
    read_jsonl_gz,
    read_orc,
    write_csv_dir,
    write_ipc,
    write_jsonl_gz,
    write_orc,
)


def _roundtrip_dir(tag: str) -> str:
    # fresh dir per call: concurrent runs never see each other's parts
    return tempfile.mkdtemp(prefix=f"ocr_ray_{tag}_")


_EVENTS_AGG_SQL = """
SELECT event_type, COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
  CAST(MIN(value) AS DOUBLE) AS min_value,
  CAST(MAX(value) AS DOUBLE) AS max_value
FROM events GROUP BY event_type
"""


def _events_rollup(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Shared post-roundtrip aggregate: exact integer-unit sums so the
    result is bit-comparable to the DECIMAL oracle regardless of block
    order."""
    from ray.data.aggregate import Count, Max, Min, Sum

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"event_type": t["event_type"], "value_c": to_units(t["value"])}
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n_events"),
            Sum("value_c", alias_name="value_c"),
            Min("value_c", alias_name="min_c"),
            Max("value_c", alias_name="max_c"),
        )
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "n_events": df["n_events"].astype(np.int64),
                "sum_value": units_to_double(df["value_c"], 2),
                "min_value": units_to_double(df["min_c"], 2),
                "max_value": units_to_double(df["max_c"], 2),
            }
        )

    return agg.map_batches(finalize, batch_format="pandas")


@query("orc_roundtrip_events", sql=_EVENTS_AGG_SQL)
def orc_roundtrip_events(sf_dir: str) -> ray.data.Dataset:
    """events -> block-parallel ORC export -> per-STRIPE distributed
    read-back -> rollup. Exercises ORC string/double/int64 fidelity and
    the stripe-granular task fan-out (driver reads footers only)."""
    src = read_table(sf_dir, "events", columns=["event_type", "value", "user_id"])
    out = _roundtrip_dir("orc")
    try:
        # materialize the manifest = wait for every part file to land
        n = write_orc(src, out).sum("rows")
        assert n and n > 0
        return _events_rollup(read_orc(out)).materialize()
    finally:
        shutil.rmtree(out, ignore_errors=True)


@query("avro_roundtrip_events", sql=_EVENTS_AGG_SQL)
def avro_roundtrip_events(sf_dir: str) -> ray.data.Dataset:
    """events -> block-parallel Avro export (from-scratch container-file
    codec, deflate blocks) -> block-header-indexed distributed read-back
    -> rollup. Exercises zigzag-varint longs, length-prefixed strings,
    IEEE doubles and nullable-union encoding against the same bit-exact
    oracle as the other interchange legs (see ``sources/avro.py``)."""
    src = read_table(sf_dir, "events", columns=["event_type", "value", "user_id"])
    out = _roundtrip_dir("avro")
    try:
        n = write_avro(src, out).sum("rows")
        assert n and n > 0
        return _events_rollup(read_avro(out)).materialize()
    finally:
        shutil.rmtree(out, ignore_errors=True)


@query("csv_roundtrip_events", sql=_EVENTS_AGG_SQL)
def csv_roundtrip_events(sf_dir: str) -> ray.data.Dataset:
    """events -> block-parallel CSV export -> per-file distributed
    read-back with a pinned schema -> rollup. CSV is untyped text, so
    this leg proves (a) Arrow's shortest-roundtrip float serialization
    survives parse (2-decimal doubles bit-exact vs the DECIMAL oracle)
    and (b) the explicit ``column_types`` schema prevents per-file type
    drift (an all-integral part file would otherwise infer int64)."""
    src = read_table(sf_dir, "events", columns=["event_type", "value", "user_id"])
    out = _roundtrip_dir("csv")
    schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("user_id", pa.int64()),
        ]
    )
    try:
        n = write_csv_dir(src, out).sum("rows")
        assert n and n > 0
        return _events_rollup(read_csv_dir(out, schema=schema)).materialize()
    finally:
        shutil.rmtree(out, ignore_errors=True)


@query("jsonl_gz_roundtrip_events", sql=_EVENTS_AGG_SQL)
def jsonl_gz_roundtrip_events(sf_dir: str) -> ray.data.Dataset:
    """events -> block-parallel gzipped-JSONL export -> per-file
    distributed ingest (Arrow gzip stream codec inside read tasks) ->
    rollup. JSON is the lossiest leg here (text floats): the bit-exact
    oracle proves 2-decimal doubles survive serialize/parse."""
    src = read_table(sf_dir, "events", columns=["event_type", "value", "user_id"])
    out = _roundtrip_dir("jgz")
    try:
        n = write_jsonl_gz(src, out).sum("rows")
        assert n and n > 0
        return _events_rollup(read_jsonl_gz(out)).materialize()
    finally:
        shutil.rmtree(out, ignore_errors=True)


@query(
    "ipc_roundtrip_documents",
    sql="""
SELECT lang, COUNT(*) AS n_docs,
  SUM(n_chars) AS sum_chars,
  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
FROM documents GROUP BY lang
""",
)
def ipc_roundtrip_documents(sf_dir: str) -> ray.data.Dataset:
    """documents -> block-parallel Arrow-IPC export -> batch-range
    distributed read-back (zero-copy mmap) -> per-language rollup, with
    column pruning pushed into the IPC projection (text is written but
    never read back)."""
    from ray.data.aggregate import Count, Max, Min, Sum

    src = read_docs(sf_dir, columns=["doc_id", "lang", "n_chars", "text"])
    out = _roundtrip_dir("ipc")
    try:
        n = write_ipc(src, out).sum("rows")
        assert n and n > 0
        back = read_ipc(out, columns=["doc_id", "lang", "n_chars"])
        agg = back.groupby("lang").aggregate(
            Count(alias_name="n_docs"),
            Sum("n_chars", alias_name="sum_chars"),
            Min("doc_id", alias_name="min_doc"),
            Max("doc_id", alias_name="max_doc"),
        )

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "lang": df["lang"],
                    "n_docs": df["n_docs"].astype(np.int64),
                    "sum_chars": df["sum_chars"].astype(np.int64),
                    "min_doc": df["min_doc"].astype(np.int64),
                    "max_doc": df["max_doc"].astype(np.int64),
                }
            )

        return agg.map_batches(finalize, batch_format="pandas").materialize()
    finally:
        shutil.rmtree(out, ignore_errors=True)


@query("tfrecord_roundtrip_events", sql=_EVENTS_AGG_SQL)
def tfrecord_roundtrip_events(sf_dir: str) -> ray.data.Dataset:
    """events -> block-parallel TFRecord export (from-scratch framing:
    masked-CRC32C record envelope + tf.train.Example protobuf wire codec)
    -> per-file distributed read-back WITH CRC verification -> rollup.
    float_list is IEEE float32 on the wire; the 2-decimal integer-unit
    rollup proves the values survive that precision leg bit-exactly
    (see ``sources/tfrecord.py`` fidelity note)."""
    from ocr_ray.sources.tfrecord import read_tfrecord, write_tfrecord

    src = read_table(sf_dir, "events", columns=["event_type", "value", "user_id"])
    out = _roundtrip_dir("tfr")
    try:
        n = write_tfrecord(src, out).sum("rows")
        assert n and n > 0
        schema = pa.schema(
            [("event_type", pa.string()), ("value", pa.float64()), ("user_id", pa.int64())]
        )
        return _events_rollup(read_tfrecord(out, schema)).materialize()
    finally:
        shutil.rmtree(out, ignore_errors=True)


@query(
    "webdataset_roundtrip_documents",
    sql="""
SELECT lang, COUNT(*) AS n_docs,
  SUM(n_chars) AS sum_chars,
  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
FROM documents GROUP BY lang
""",
)
def webdataset_roundtrip_documents(sf_dir: str) -> ray.data.Dataset:
    """documents -> block-parallel WebDataset tar shards (stdlib tarfile,
    one sample = consecutive ``{doc_id}.{col}.{ext}`` members) -> per-shard
    distributed read-back with column pruning (text member payloads are
    written but their bytes never read back — tar size headers skip them)
    -> per-language rollup. The multimodal-corpus layout leg."""
    from ray.data.aggregate import Count, Max, Min, Sum

    from ocr_ray.sources.webdataset import read_webdataset, write_webdataset

    src = read_docs(sf_dir, columns=["doc_id", "lang", "n_chars", "text"])
    out = _roundtrip_dir("wds")
    try:
        n = write_webdataset(src, out, key_column="doc_id").sum("rows")
        assert n and n > 0
        schema = pa.schema(
            [
                ("doc_id", pa.int64()),
                ("lang", pa.string()),
                ("n_chars", pa.int64()),
                ("text", pa.string()),
            ]
        )
        back = read_webdataset(out, schema, columns=["doc_id", "lang", "n_chars"])
        agg = back.groupby("lang").aggregate(
            Count(alias_name="n_docs"),
            Sum("n_chars", alias_name="sum_chars"),
            Min("doc_id", alias_name="min_doc"),
            Max("doc_id", alias_name="max_doc"),
        )

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "lang": df["lang"],
                    "n_docs": df["n_docs"].astype(np.int64),
                    "sum_chars": df["sum_chars"].astype(np.int64),
                    "min_doc": df["min_doc"].astype(np.int64),
                    "max_doc": df["max_doc"].astype(np.int64),
                }
            )

        return agg.map_batches(finalize, batch_format="pandas").materialize()
    finally:
        shutil.rmtree(out, ignore_errors=True)


@query(
    "evolved_schema_docs",
    sql="""
SELECT lang, COUNT(*) AS n_docs,
  CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN length(text) ELSE 0 END) AS BIGINT)
    AS gen1_chars,
  CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN n_chars ELSE 0 END) AS BIGINT)
    AS gen2_chars
FROM documents GROUP BY lang
""",
)
def evolved_schema_docs(sf_dir: str) -> ray.data.Dataset:
    """SCHEMA EVOLUTION across corpus generations, end to end: even docs
    export as generation 1 ``(doc_id, lang, text)``, odd docs as
    generation 2 ``(doc_id, lang, n_chars)`` — different files, different
    schemas, one directory — and ``read_parquet_evolved`` aligns both to
    the union schema (per-generation column pruning, null fill for the
    columns a generation lacks). The rollup aggregates one column from
    EACH generation, so a misaligned read (dropped generation, wrong null
    fill, column mixup) breaks the hash. This is the long-lived-corpus
    reality: schemas drift across years of appends and the reader, not a
    migration job, absorbs it."""
    import pyarrow.compute as _pc

    from ocr_ray.sources.readers import read_parquet_evolved

    src = read_docs(sf_dir, columns=["doc_id", "lang", "text", "n_chars"])
    out = _roundtrip_dir("evolved")
    try:
        def export_gen(t: pa.Table) -> pa.Table:
            import pyarrow.parquet as _pq

            even = _pc.equal(_pc.bit_wise_and(t["doc_id"], 1), 0)
            g1 = t.filter(even).select(["doc_id", "lang", "text"])
            g2 = t.filter(_pc.invert(even)).select(["doc_id", "lang", "n_chars"])
            import uuid as _uuid

            n = 0
            for gen, tbl in (("g1", g1), ("g2", g2)):
                if tbl.num_rows:
                    _pq.write_table(
                        tbl, f"{out}/{gen}-{_uuid.uuid4().hex}.parquet"
                    )
                    n += tbl.num_rows
            return pa.table({"rows": pa.array([n], pa.int64())})

        assert src.map_batches(
            export_gen, batch_format="pyarrow", batch_size=None
        ).sum("rows")

        back = read_parquet_evolved(out, columns=["doc_id", "lang", "text", "n_chars"])

        def rollup(t: pa.Table) -> pa.Table:
            even = _pc.equal(_pc.bit_wise_and(t["doc_id"], 1), 0)
            tl = _pc.if_else(
                even, _pc.coalesce(_pc.utf8_length(t["text"]), 0), 0
            )
            nc = _pc.if_else(
                _pc.invert(even), _pc.coalesce(t["n_chars"], 0), 0
            )
            return pa.table(
                {
                    "lang": t["lang"],
                    "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                    "g1c": _pc.cast(tl, pa.int64()),
                    "g2c": _pc.cast(nc, pa.int64()),
                }
            )

        from ray.data.aggregate import Sum

        agg = (
            back.map_batches(rollup, batch_format="pyarrow")
            .groupby("lang")
            .aggregate(
                Sum("one", alias_name="n_docs"),
                Sum("g1c", alias_name="gen1_chars"),
                Sum("g2c", alias_name="gen2_chars"),
            )
        )

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "lang": df["lang"],
                    "n_docs": df["n_docs"].astype(np.int64),
                    "gen1_chars": df["gen1_chars"].astype(np.int64),
                    "gen2_chars": df["gen2_chars"].astype(np.int64),
                }
            )

        return agg.map_batches(finalize, batch_format="pandas").materialize()
    finally:
        shutil.rmtree(out, ignore_errors=True)
