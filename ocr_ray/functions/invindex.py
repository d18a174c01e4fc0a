"""Materialized inverted text index over the resumable-sink layout.

The write-once/query-forever retrieval structure a training-data corpus
keeps NEXT TO the documents: one corpus-scale tokenize pass emits
(token, doc_id, tf) postings, hash-partitioned by TOKEN into the same
atomic fragment + manifest-sidecar layout every other sink in the engine
uses (``state/manifest.ResumableSink``). A term lookup then plans its
scan from the manifest alone — ``hash(term) % P`` names the only
fragment that can hold the term's postings list, so a Q-term query opens
at most Q fragments no matter how large the corpus is (the text sibling
of ``read_key_pruned``'s bloom point lookups; here the partition law
itself is the index).

Scale notes: the build is one map pass + one bucket shuffle (the
partition tag), identical in shape to the flagship extraction sink;
fragments commit through the same demote/atomic-rename protocol, so a
rebuild after a crash is IDEMPOTENT (every partition rewrites — there
is no skip-completed fast path, because the partition key derives from
row content, not input shards; callers detect a crashed build via the
loud completeness check in ``index_lookup``). tf counting is per-batch
vectorized — no Python loop over tokens.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

POSTINGS_SCHEMA = pa.schema(
    {"token": pa.string(), "doc_id": pa.int64(), "tf": pa.int64()}
)


def token_partition(tokens, num_parts: int) -> np.ndarray:
    """Partition id of each token string under the index's law."""
    from ocr_ray.functions.hashing import hash_utf8_column

    arr = tokens if isinstance(tokens, pa.Array) else pa.array(tokens, type=pa.string())
    return (hash_utf8_column(arr) % np.uint64(num_parts)).astype(np.int32)


def postings_partial(t: pa.Table, *, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """One batch -> (token, doc_id, tf) rows (per-batch combined)."""
    from ocr_ray.functions.text import split_tokens

    parents, _, flat = split_tokens(t[text_col])
    if len(flat) == 0:
        return POSTINGS_SCHEMA.empty_table()
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    df = pd.DataFrame({"token": flat.to_pylist(), "doc_id": ids[parents]})
    red = df.groupby(["token", "doc_id"], as_index=False, sort=False).size()
    return pa.table(
        {
            "token": pa.array(red["token"], type=pa.string()),
            "doc_id": pa.array(red["doc_id"].to_numpy(dtype=np.int64)),
            "tf": pa.array(red["size"].to_numpy(dtype=np.int64)),
        }
    )


def build_inverted_index(
    docs_ds,
    out_dir: str,
    *,
    num_parts: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pd.DataFrame:
    """Build (or resume) the token-partitioned postings index; returns the
    manifest rows committed by this run."""
    from ocr_ray.state.manifest import sink_partitioned

    def tag(t: pa.Table) -> pa.Table:
        part = postings_partial(t, text_col=text_col, id_col=id_col)
        return part.append_column(
            "_part", pa.array(token_partition(part["token"], num_parts))
        )

    return sink_partitioned(
        docs_ds.map_batches(tag, batch_format="pyarrow"),
        out_dir,
        num_parts,
        POSTINGS_SCHEMA.empty_table(),
        {"index": "inverted", "key": "token"},
    )


def index_lookup(out_dir: str, terms: list[str], *, num_parts: int = 16) -> pa.Table:
    """Postings of ``terms`` — opens ONLY the fragments the partition law
    names (<= len(terms) of the P committed fragments). Raises loudly on
    an incomplete store (crashed build) instead of silently returning
    partial postings; reads either fragment format via
    ``read_fragments``."""
    import ray

    from ocr_ray.state.manifest import read_fragments, require_complete_manifest

    manifest = require_complete_manifest(out_dir, num_parts, what="index_lookup")
    wanted_parts = sorted(set(int(p) for p in token_partition(list(terms), num_parts)))
    files = [manifest[p]["file"] for p in wanted_parts]
    term_set = pa.array(sorted(set(terms)), type=pa.string())

    def pick(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return POSTINGS_SCHEMA.empty_table()
        return t.filter(pc.is_in(t["token"], value_set=term_set)).select(
            ["token", "doc_id", "tf"]
        )

    hits = [
        t
        for t in ray.get(
            read_fragments(files)
            .map_batches(pick, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    if not hits:
        return POSTINGS_SCHEMA.empty_table()
    return pa.concat_tables(hits)
