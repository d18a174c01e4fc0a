"""Connected components (large-star/small-star) and dedup clustering.

The component operator is the bridge from near-dup PAIRS to dedup
CLUSTERS; these tests pin exact labels on adversarial topologies (long
chains force multiple rounds) and the end-to-end seeded-mutant guarantee.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ocr_ray.functions.graph import connected_components, star_edges_from_key


def _edges_ds(edges):
    return ray.data.from_arrow(
        pa.table(
            {
                "u": pa.array([e[0] for e in edges], type=pa.int64()),
                "v": pa.array([e[1] for e in edges], type=pa.int64()),
            }
        )
    )


def _labels(ds) -> dict[int, int]:
    df = ds.to_pandas()
    return dict(zip(df["node"], df["component"]))


def test_cc_chain_clique_singleton_exact():
    # chain (multi-round convergence), triangle, isolated pair, long chain
    edges = (
        [(i, i + 1) for i in range(9)]
        + [(20, 21), (21, 22), (20, 22), (30, 31)]
        + [(i, i + 1) for i in range(100, 139)]
    )
    rng = np.random.default_rng(7)
    edges = [edges[i] for i in rng.permutation(len(edges))]
    comp = _labels(connected_components(_edges_ds(edges), num_buckets=4))
    expect = {i: 0 for i in range(10)}
    expect.update({i: 20 for i in (20, 21, 22)})
    expect.update({30: 30, 31: 30})
    expect.update({i: 100 for i in range(100, 140)})
    assert comp == expect


def test_cc_duplicate_and_reversed_edges():
    edges = [(1, 2), (2, 1), (1, 2), (3, 3), (2, 4)]
    comp = _labels(connected_components(_edges_ds(edges), num_buckets=2))
    # self-loop (3,3) is dropped entirely; 1-2-4 one component
    assert comp == {1: 1, 2: 1, 4: 1}


def test_cc_empty_edge_set():
    out = connected_components(_edges_ds([]), num_buckets=2)
    # empty-Dataset to_pandas drops columns (Ray quirk) — check the schema
    assert out.schema().names == ["node", "component"]
    assert out.count() == 0


def test_star_edges_match_clique_connectivity():
    # two key groups sharing node 5 must merge into one component
    ds = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(["a", "a", "a", "b", "b"]),
                "n": pa.array([5, 7, 9, 5, 11], type=pa.int64()),
            }
        )
    )
    stars = star_edges_from_key(ds, key_col="k", node_col="n", num_buckets=2)
    comp = _labels(connected_components(stars, num_buckets=2))
    assert comp == {5: 5, 7: 5, 9: 5, 11: 5}


def test_minhash_clusters_recover_seeded_mutants(sf_smoke):
    from ocr_ray.functions.dedup import MUTANT_OFFSET
    from ocr_ray.pipelines.queries import QUERY_FNS

    df = QUERY_FNS["minhash_dedup_clusters"](sf_smoke).to_pandas()
    comp = dict(zip(df["doc_id"], df["cluster_id"]))
    origs = [d for d in comp if d < MUTANT_OFFSET]
    assert origs, "expected seeded near-dup population"
    assert all(comp.get(d + MUTANT_OFFSET) == comp[d] for d in origs)
