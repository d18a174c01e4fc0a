"""Query registry section: simsearch (split from the former monolithic queries.py)."""

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

from ocr_ray.pipelines.queries._shared import (
    ORACLE_SQL,
    QUERY_FNS,
    _big_spenders,
    load_small_table,
    query,
)


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------


def _query_vectors(sf_dir: str, n: int = 8):
    from ocr_ray.functions.ann import _as_matrix

    t = load_small_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    tbl = t.filter(pc.less(t["vec_id"], pa.scalar(n, type=pa.int64()))).to_pandas()
    tbl = tbl.sort_values("vec_id")
    qmat = np.stack(tbl["embedding"].to_numpy()).astype(np.float64)
    return tbl["vec_id"].to_numpy(dtype=np.int64), qmat


@query(
    "embedding_topk",
    sql="""
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 8),
s AS (
  SELECT qid, vec_id, list_cosine_similarity(qe, embedding) AS sc
  FROM q, embeddings WHERE vec_id <> qid
)
SELECT qid AS query_id, vec_id,
  CAST(row_number() OVER (PARTITION BY qid ORDER BY sc DESC, vec_id) AS BIGINT) AS rank
FROM s QUALIFY rank <= 5
""",
)
def embedding_topk(sf_dir: str) -> ray.data.Dataset:
    """Brute-force cosine top-5 for 8 broadcast query vectors: per-batch
    numpy matmul partial top-k, tiny final merge. Scores are not emitted
    (float-kernel differences); ranks have a deterministic tiebreak."""
    from ocr_ray.functions.ann import brute_topk

    qids, qmat = _query_vectors(sf_dir)
    queries_ref = ray.put((qids, qmat))
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = brute_topk(ds, queries_ref, k=5)
    return out.map_batches(
        lambda t: t.select(["query_id", "vec_id", "rank"]), batch_format="pyarrow"
    )


@query("ann_ivf_topk", sql=None)
def ann_ivf_topk(sf_dir: str) -> ray.data.Dataset:
    """IVF approximate top-5 (nprobe=4 of 16 centroids) — the 100TB-scale
    path; recall vs brute force asserted in tests."""
    from ocr_ray.functions.ann import _as_matrix, ivf_topk, make_centroids

    from ocr_ray.sources.readers import sample_parquet_rows

    qids, qmat = _query_vectors(sf_dir)
    queries_ref = ray.put((qids, qmat))
    # centroid training sample: systematic sample via ROW-GROUP PRUNING —
    # evenly spaced row groups, stride inside; representative of the whole
    # table at any scale (unlike the round-1 first-256-rows driver slice)
    # with I/O proportional to the 256-row sample, not the table (the
    # round-2a version paid a full distributed scan to keep 256 rows).
    sample = sample_parquet_rows(
        f"{sf_dir}/embeddings.parquet", 256, columns=["vec_id", "embedding"]
    ).to_pandas()
    cent = make_centroids(np.stack(sample["embedding"].to_numpy()).astype(np.float64), n_centroids=16)
    centroids_ref = ray.put(cent)
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = ivf_topk(ds, queries_ref, centroids_ref, k=5, nprobe=4)
    return out.map_batches(
        lambda t: t.select(["query_id", "vec_id", "rank"]), batch_format="pyarrow"
    )


@query("embedding_neardup_pairs", sql=None)
def embedding_neardup_pairs(sf_dir: str) -> ray.data.Dataset:
    """Embedding-cosine near-dup over a corpus seeded with perturbed
    copies: sign-LSH keys through coarse buckets, vectorized exact cosine
    verify (tau=0.8), distributed cross-table pair dedup."""
    from ocr_ray.functions.ann import _as_matrix, _normalize, hyperplanes, lsh_buckets, with_perturbed
    from ocr_ray.functions.dedup import bucketed_pairs, run_index_pairs

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"]).map_batches(
        with_perturbed, batch_format="pyarrow"
    )
    planes = hyperplanes(64, n_bits=8, n_tables=4)
    bucketed = ds.map_batches(
        lsh_buckets, batch_format="pyarrow", fn_kwargs={"planes": planes}
    )

    def pair_body(g: pd.DataFrame, max_group: int = 512, tau: float = 0.8) -> pd.DataFrame:
        g = g.sort_values(["pair_key", "vec_id"], kind="mergesort")
        keys = g["pair_key"].to_numpy(dtype=np.uint64)
        ids = g["vec_id"].to_numpy(dtype=np.int64)
        ia, ib = run_index_pairs(keys, max_group=max_group, presorted=True)
        if len(ia) == 0:
            return pd.DataFrame(
                {
                    "vec_a": pd.Series([], dtype=np.int64),
                    "vec_b": pd.Series([], dtype=np.int64),
                }
            )
        m = _normalize(np.stack(g["embedding"].to_numpy()).astype(np.float64))
        cos = np.einsum("ij,ij->i", m[ia], m[ib])
        keep = cos >= tau
        return pd.DataFrame({"vec_a": ids[ia[keep]], "vec_b": ids[ib[keep]]}).drop_duplicates()

    from ocr_ray.functions.dedup import dedup_pairs

    cands = bucketed_pairs(
        bucketed, key_col="pair_key", id_col="vec_id", pair_body=pair_body
    )
    # cross-table duplicates of a pair land in one coarse bucket -> exact
    # distributed dedup (cosine was already verified inside pair_body).
    return dedup_pairs(cands, cols=("vec_a", "vec_b"))


