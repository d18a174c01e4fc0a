"""Query registry: every operator surfaced to the driver.

Each entry pairs a Ray Data implementation (callable ``fn(sf_dir)``) with,
where SQL-expressible, an equivalent DuckDB oracle over the registered
views (``region nation customer supplier part orders lineitem events
documents embeddings``). Column names AND numeric semantics match exactly:

- money/2-decimal aggregates are computed in integer units on the Ray side
  and as DECIMAL sums cast to DOUBLE in SQL — identical nearest-doubles of
  identical exact rationals (see ``functions/relational.py``);
- every top-k/sort has a deterministic tiebreak on a key column;
- extraction queries run the *real* engine over the deterministically
  synthesized span corpus (``ocr_ray.corpus``), whose synthesis rule is
  arithmetic on (doc_id, span_index) so the SQL oracle reproduces
  synthesis + extraction end-to-end — including the glyph variant, whose
  recognized output must equal the withheld source text.
"""

from __future__ import annotations

import datetime
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ocr_ray.corpus import ensure_corpus
from ocr_ray.functions.relational import (
    hash_join,
    lookup,
    semi_filter,
    to_units,
    units_to_double,
)
from ocr_ray.functions import text as textfn
from ocr_ray.pipelines.extract import extract_spans_flat
from ocr_ray.sizing import buckets_for_input, pool_size
from ocr_ray.sources import read_documents, read_table

QUERY_FNS: dict[str, Callable[[str], Any]] = {}
ORACLE_SQL: dict[str, str] = {}


def read_docs(sf_dir: str, columns: list[str] | None = None, **kwargs) -> ray.data.Dataset:
    """documents-table read for COMPUTE-BOUND pipelines (shingling,
    minhash, tokenization, quality kernels): a 256 KiB-per-block target,
    because map-task parallelism equals block count, text compresses
    ~10x on disk, and the downstream kernels cost far more per byte
    than relational scans — the 4 MB relational default would run them
    on 2-3 cores at small scale. A/B at sf0.1 (one session, interleaved):
    minhash 3.6-3.8 s @ 4 MB vs 1.8-2.3 s @ 256 KiB; 16 KiB is worse
    everywhere (per-task overhead + shuffle fan-in dominate). Still
    byte-derived and capped at Ray's own parallelism — at 100 TB this
    override never engages."""
    return read_table(sf_dir, "documents", columns=columns, per_block=256 << 10, **kwargs)


def read_embeddings(sf_dir: str, columns: list[str] | None = None, **kwargs) -> ray.data.Dataset:
    """embeddings-table read for matmul/ANN pipelines — same rationale
    as ``read_docs``."""
    return read_table(sf_dir, "embeddings", columns=columns, per_block=256 << 10, **kwargs)


def arrow_out(df: pd.DataFrame, schema: pa.Schema) -> pa.Table:
    """Convert a pandas group-body result to an ARROW block with an explicit
    schema.

    Group bodies MUST emit Arrow: Ray keeps whatever the body returns as
    the block format, and its ``groupby().aggregate()`` path over pandas
    blocks degenerates to a per-group pandas loop — measured 19.8 s for a
    65 k-row AggregateMap (3.3 k rows/s) vs milliseconds over the same rows
    as Arrow. The explicit schema keeps every group's output block
    type-identical (empty frames and all-null object columns would
    otherwise infer conflicting types and break schema unification)."""
    return pa.Table.from_pandas(
        df, schema=schema, preserve_index=False
    ).replace_schema_metadata(None)


def load_small_table(sf_dir: str, name: str, columns: list[str] | None = None) -> pa.Table:
    """Driver-side read of a SMALL (dimension/broadcast) table.

    The broadcast-small-side pattern: dimension tables ship once via
    ``ray.put``; reading them through a distributed Dataset would cost a
    full streaming execution (~seconds of fixed overhead) to move a few MB.
    Only ever used for sides that are broadcast afterwards.
    """
    import pyarrow.parquet as pq

    return pq.read_table(f"{sf_dir}/{name}.parquet", columns=columns)


def _big_spenders(sf_dir: str) -> list:
    """Distinct custkeys of orders above a price threshold (small key set,
    computed with a vectorized pre-filter then ``unique`` — broadcast side
    of the semi/anti joins)."""
    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], pa.scalar(450000.0))).select(
            ["o_custkey"]
        ),
        batch_format="pyarrow",
    )
    return ds.unique("o_custkey")


def query(name: str, sql: str | None = None):
    def deco(fn):
        QUERY_FNS[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco




def arrow_topk(
    t: pa.Table, sort_keys: list[tuple[str, str]], k: int | None = None
) -> pa.Table:
    """Arrow-native per-batch partial top-k: ``pc.sort_indices`` + ``take``,
    no pandas round trip in the hot map body. Callers must pass sort keys
    that form a UNIQUE total order (every registry use tiebreaks on a key
    column), so sort stability is irrelevant to the result."""
    idx = pc.sort_indices(t, sort_keys=sort_keys)
    if k is not None:
        idx = idx[:k]
    return t.take(idx)


def stateless_stage(ds, cls, *, batch_size: int = 512):
    """Run a STATELESS decoder/extractor class as a TASK-pool stage with
    per-worker construction (the ``_prepared`` cache): measured 3.2x
    faster per query than ``map_batches(cls, concurrency=...)`` at sf0.1
    because a fixed actor pool pays its spin-up on every query call,
    while worker processes are reused across queries. Heavier codecs
    still build once per worker — the same tradeoff the extraction
    recognizer measured (``pipelines/extract.py``). Classes whose
    constructor takes arguments (a model, a vocab) keep real actor
    pools."""
    from ocr_ray.functions.relational import _prepared

    def fn(t: pa.Table) -> pa.Table:
        inst = _prepared(("stateless_stage", cls.__qualname__), cls)
        return inst(t)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def gate_by_sampled_recheck(out_ds, raw_ds, *, id_col: str, checker):
    """Shared harness for the non-SQL entries' ``gate_ok`` columns
    (VERDICT r3 item 7): take the deterministic ``id % 97 == 0`` sample
    of BOTH the engine output and the raw input, run ``checker(eng_df,
    raw_df)`` (raw indexed by ``id_col``; returns truthy iff every
    sampled row re-verifies), and append a constant ``gate_ok`` column
    to the full output. Sample-bounded driver work — no O(n) state."""
    import numpy as np
    import pyarrow as _pa

    def sample_rows(t: _pa.Table) -> _pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return t.filter(_pa.array(ids % 97 == 0))

    eng = out_ds.map_batches(sample_rows, batch_format="pyarrow").to_pandas()
    if len(eng) == 0:
        # The stride missed every id (small corpus / shifted id space);
        # a vacuous all-pass gate would certify zero re-verified rows.
        # Fall back to the guaranteed-nonempty sample: the minimum id.
        from ray.data.aggregate import Min

        mn = out_ds.aggregate(Min(id_col))[f"min({id_col})"]
        if mn is None:
            raise ValueError(
                "gate_by_sampled_recheck: output is empty — nothing to gate"
            )

        def sample_rows(t: _pa.Table) -> _pa.Table:  # noqa: F811
            ids = t[id_col].to_numpy(zero_copy_only=False)
            return t.filter(_pa.array(ids == mn))

        eng = out_ds.map_batches(sample_rows, batch_format="pyarrow").to_pandas()
    raw = (
        raw_ds.map_batches(sample_rows, batch_format="pyarrow")
        .to_pandas()
        .set_index(id_col)
    )
    if len(eng) == 0:
        raise ValueError(
            "gate_by_sampled_recheck: sampled zero rows — gate would be vacuous"
        )
    gate = bool(checker(eng, raw))
    return out_ds.map_batches(
        lambda t: t.append_column("gate_ok", _pa.array([gate] * t.num_rows)),
        batch_format="pyarrow",
    )



def arrival_shard_docs(t: pa.Table) -> pa.Table:
    """The canonical synthetic ARRIVING SHARD for the incremental-store
    entries: every 5th doc re-tagged doc_id + 1e6. Load-bearing — must
    match the SQL oracles' ``doc_id % 5 = 0 ... + 1000000`` clause
    exactly, so both incremental index entries share THIS definition."""
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    s = t.filter(pa.array(ids % 5 == 0))
    return pa.table(
        {
            "doc_id": pc.add(s["doc_id"], pa.scalar(1_000_000, pa.int64())),
            "text": s["text"],
        }
    )


def store_root(kind: str) -> str:
    """Per-user, mode-0700 root for the persisted stores (inverted index,
    BM25 index, minhash store, IVF cells). The previous fixed
    world-readable ``/tmp/ocr_ray_*`` paths were squattable: any local
    user could pre-create the directory (or plant a 'complete' store
    that passes the manifest check) and the oracle-checked queries would
    serve its contents. Rooting at ``$TMPDIR/ocr_ray-<uid>`` and
    verifying ownership + 0700 on every open means a store is only ever
    read from a directory this uid created; ``store_key``'s
    size+mtime+path fingerprint continues to guard staleness."""
    import os
    import stat
    import tempfile

    root = os.path.join(tempfile.gettempdir(), f"ocr_ray-{os.getuid()}")
    try:
        os.mkdir(root, 0o700)
    except FileExistsError:
        pass
    st = os.lstat(root)
    if (
        not stat.S_ISDIR(st.st_mode)
        or st.st_uid != os.getuid()
        or (st.st_mode & 0o077)
    ):
        raise RuntimeError(
            f"store_root: {root} is not a private directory owned by uid "
            f"{os.getuid()} (mode {oct(st.st_mode)}, uid {st.st_uid}) — "
            "refusing to trust persisted stores under it"
        )
    d = os.path.join(root, kind)
    os.makedirs(d, mode=0o700, exist_ok=True)
    return d


def store_key(sf_dir: str, table: str) -> str:
    """Cache key identifying a source table's CONTENT for the persisted
    /tmp stores (inverted index, minhash store, IVF cells): absolute-path
    hash + file size + mtime. A regenerated corpus with the same row
    count, or a different corpus under the same basename, changes the
    key — a stale persisted store can then never silently answer for the
    wrong data (the failure mode of keying on basename + row count)."""
    import os
    import zlib

    path = os.path.join(sf_dir, f"{table}.parquet")
    st = os.stat(path)
    ident = zlib.crc32(os.path.abspath(path).encode()) & 0xFFFFFFFF
    return f"{os.path.basename(os.path.normpath(sf_dir))}-{ident:08x}-b{st.st_size}-m{st.st_mtime_ns}"


def mapside_count_sum(ds, *, keys: list[str], sum_cols: list[str]):
    """Per-batch Arrow ``group_by`` combine (COUNT(*) + sums) before the
    Ray fold — the q1 partial+final idiom as a helper. Without it,
    ``Dataset.groupby().aggregate`` sorts every raw row to produce a
    handful of groups (the regr_price_by_qty pathology). Returns a
    Dataset with ``keys + [n (count), <sum_cols>...]``; the final fold is
    a Dataset.groupby over the (tiny) per-batch partials, so it is only
    for LOW-cardinality keys — data-scaled keys need bucketed_aggregate.
    """
    import pyarrow as _pa

    from ray.data.aggregate import Sum

    def combine(t: _pa.Table) -> _pa.Table:
        part = t.group_by(keys).aggregate(
            [([], "count_all")] + [(c, "sum") for c in sum_cols]
        )
        cols = {k: part[k] for k in keys}
        cols["n"] = part["count_all"]
        for c in sum_cols:
            cols[c] = part[f"{c}_sum"]
        return _pa.table(cols)

    return (
        ds.map_batches(combine, batch_format="pyarrow")
        .groupby(keys)
        .aggregate(
            Sum("n", alias_name="n"),
            *[Sum(c, alias_name=c) for c in sum_cols],
        )
    )
