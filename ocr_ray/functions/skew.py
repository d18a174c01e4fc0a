"""Key-skew diagnostics: the measurement half of the engine's skew story.

Every bucketed shuffle here assumes hot keys are bounded (per-bucket
bodies are per-KEY-RUN vectorized, hot LSH bands are capped, clique
expansion is star-reduced). This operator MEASURES a key column's skew
before a pipeline commits to a partitioning: exact top-k hot keys with
their global share, computed with one bucketed count fold + partial
top-k — the driver sees k rows, never a key histogram.

At 100 TB this is the pre-flight a groupby/join on an unknown key runs
first: a top key holding >1/buckets of the rows means that bucket is a
straggler and the caller should salt or star-reduce (see
``graph.star_edges_from_key``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def key_skew_profile(
    ds,
    *,
    key: str,
    top_k: int = 20,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Exact hottest-``top_k`` keys of ``ds[key]`` as
    ``(key, n, share)`` — ``share`` = n / total rows, ONE float division
    per output row (oracle-reproducible).

    Shape: per-batch partial counts -> one key-hash bucket shuffle (all
    rows of a key meet in one bucket, so in-bucket sums are exact global
    counts) -> per-bucket top-k partial -> tiny driver merge. The total
    row count rides along as per-bucket partial sums, so the input is
    scanned ONCE."""
    from ocr_ray.functions.relational import bucketed_aggregate
    from ocr_ray.sizing import buckets_for_input

    nb = num_buckets or buckets_for_input(ds)

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"key": t[key].to_numpy(zero_copy_only=False)})
        red = df.groupby("key", as_index=False).size()
        return pa.table(
            {
                "key": pa.array(red["key"].to_numpy()),
                "n": pa.array(red["size"].to_numpy(dtype=np.int64)),
            }
        )

    counts = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["key"],
        aggs={"n": ("n", "sum")},
        num_buckets=nb,
    )

    def local_topk(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.sort_indices(
            t, sort_keys=[("n", "descending"), ("key", "ascending")]
        )
        # carry this block's total so the global total is the sum of
        # block partials — no second scan
        top = t.select(["key", "n"]).take(idx[:top_k])
        return top.append_column(
            "_block_total",
            pa.array(
                np.r_[
                    np.int64(pc.sum(t["n"]).as_py() or 0),
                    np.zeros(max(top.num_rows - 1, 0), dtype=np.int64),
                ][: top.num_rows]
            ),
        )

    parts = counts.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    total = int(parts["_block_total"].sum())
    merged = parts.sort_values(
        ["n", "key"], ascending=[False, True], kind="mergesort"
    ).head(top_k)
    out = pa.table(
        {
            "key": pa.array(merged["key"].to_numpy()),
            "n": pa.array(merged["n"].to_numpy(dtype=np.int64)),
            "share": pa.array(
                merged["n"].to_numpy(dtype=np.float64) / float(max(total, 1))
            ),
        }
    )
    return ray.data.from_arrow(out)
