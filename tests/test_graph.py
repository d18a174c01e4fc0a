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


def _pagerank_reference(edges: list[tuple[int, int]], iterations: int = 3) -> dict[int, int]:
    """Plain-python mirror of the fixed-point recurrence."""
    scale, teleport = 10**9, (15 * 10**9) // 100
    nodes = sorted({n for e in edges for n in e})
    deg: dict[int, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    r = {n: scale for n in nodes}
    for _ in range(iterations):
        s = {n: 0 for n in nodes}
        for u, v in edges:
            s[v] += r[u] // deg[u]
        r = {n: teleport + (85 * s[n]) // 100 for n in nodes}
    return r


def test_pagerank_matches_reference_recurrence():
    from ocr_ray.functions.graph import pagerank

    # star (hub drains to leaves + back), chain with a dangling tail,
    # one in-degree-0 source, duplicate (counted) edges
    edges = (
        [(1, k) for k in range(2, 7)]
        + [(k, 1) for k in range(2, 7)]
        + [(10, 11), (11, 12), (12, 10), (13, 10), (13, 10)]
    )
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], type=pa.int64()),
                "dst": pa.array([e[1] for e in edges], type=pa.int64()),
            }
        )
    )
    got = pagerank(ds, iterations=3).to_pandas()
    want = _pagerank_reference(edges, iterations=3)
    assert dict(zip(got["node"], got["rank"])) == want
    # node 13 has no in-edges: must survive with bare teleport rank
    assert want[13] == (15 * 10**9) // 100


def test_pagerank_rank_mass_and_determinism():
    from ocr_ray.functions.graph import pagerank

    rng = np.random.default_rng(7)
    src = rng.integers(0, 40, size=200)
    dst = rng.integers(0, 40, size=200)
    keep = src != dst
    t = pa.table(
        {
            "src": pa.array(src[keep], type=pa.int64()),
            "dst": pa.array(dst[keep], type=pa.int64()),
        }
    )
    a = pagerank(ray.data.from_arrow(t), iterations=2).to_pandas().sort_values("node")
    b = pagerank(ray.data.from_arrow(t), iterations=2).to_pandas().sort_values("node")
    assert (a.to_numpy() == b.to_numpy()).all()
    ref = _pagerank_reference(list(zip(src[keep], dst[keep])), iterations=2)
    assert dict(zip(a["node"], a["rank"])) == ref


def test_pagerank_state_block_count_stays_pinned():
    """Regression: Ray's sort-shuffle makes one reduce partition per input
    block, so without repartition the union in the iteration loop grows
    the rank state's block count (and wall time) linearly per round. The
    returned state must stay at <= num_buckets blocks regardless of
    iteration count and of how fragmented the input edge set is."""
    from ocr_ray.functions.graph import pagerank

    rng = np.random.default_rng(11)
    src = rng.integers(0, 30, size=120).astype(np.int64)
    dst = rng.integers(0, 30, size=120).astype(np.int64)
    keep = src != dst
    t = pa.table({"src": pa.array(src[keep]), "dst": pa.array(dst[keep])})
    # fragment the input into many tiny blocks
    ds = ray.data.from_arrow([t.slice(i, 1) for i in range(t.num_rows)])
    out = pagerank(ds, iterations=3, num_buckets=4)
    assert out.num_blocks() <= 4
    ref = _pagerank_reference(list(zip(src[keep], dst[keep])), iterations=3)
    got = out.to_pandas()
    assert dict(zip(got["node"], got["rank"])) == ref


def test_pagerank_checkpoint_resume_bit_identical(ray_session, tmp_path):
    """Checkpointed PageRank resumes from the last complete iteration and
    produces BIT-IDENTICAL ranks to an uninterrupted run; a torn
    checkpoint (missing marker / fragment) falls back to the previous
    complete one."""
    import shutil

    import numpy as np
    import pyarrow as pa
    import ray

    from ocr_ray.functions.graph import pagerank, pagerank_checkpointed

    rng_edges = pa.table(
        {
            "src": pa.array(np.arange(200, dtype=np.int64) % 37),
            "dst": pa.array((np.arange(200, dtype=np.int64) * 7 + 3) % 41),
        }
    )
    ds = lambda: ray.data.from_arrow(rng_edges)
    want = (
        pagerank(ds(), iterations=4, num_buckets=4)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )

    ck = str(tmp_path / "pr")
    # phase 1: run 2 of 4 iterations, checkpointing each
    _, start = pagerank_checkpointed(ds(), ck, iterations=2, num_buckets=4)
    assert start == 0
    # phase 2: ask for 4 — must fast-forward past the 2 committed rounds
    ranks, start = pagerank_checkpointed(ds(), ck, iterations=4, num_buckets=4)
    assert start == 2
    got = ranks.to_pandas().sort_values("node").reset_index(drop=True)
    pd_testing = __import__("pandas").testing
    pd_testing.assert_frame_equal(got, want)

    # torn checkpoint: drop iter=4's marker -> resume falls back to iter=3
    import os as _os

    _os.remove(f"{ck}/iter=0004/_COMPLETE")
    ranks2, start2 = pagerank_checkpointed(ds(), ck, iterations=4, num_buckets=4)
    assert start2 == 3
    got2 = ranks2.to_pandas().sort_values("node").reset_index(drop=True)
    pd_testing.assert_frame_equal(got2, want)


def test_bfs_levels_matches_python_reference():
    """Distributed BFS distances equal a plain-Python BFS capped at the
    iteration budget, including the unreached sentinel; empty edge sets
    return a typed empty state instead of crashing."""
    import collections

    import pyarrow as pa
    import ray.data

    from ocr_ray.functions.graph import bfs_levels

    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (2, 7), (7, 8), (10, 11)]
    sym = edges + [(b, a) for a, b in edges]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in sym], pa.int64()),
                "dst": pa.array([b for _, b in sym], pa.int64()),
            }
        )
    )
    got = {
        r["node"]: r["dist"]
        for r in bfs_levels(ds, iterations=3, num_buckets=4).take_all()
    }

    adj = collections.defaultdict(set)
    for a, b in sym:
        adj[a].add(b)
    want = {n: 999 for n in adj}
    want[1] = 0
    frontier = {1}
    for depth in range(1, 4):
        frontier = {v for u in frontier for v in adj[u] if want[v] == 999}
        for v in frontier:
            want[v] = depth
    assert got == want

    empty = ray.data.from_arrow(
        pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    )
    out = bfs_levels(empty, iterations=2, num_buckets=2)
    assert out.count() == 0
    assert set(out.schema().names) == {"node", "dist"}


def _sym(pairs):
    out = []
    for a, b in pairs:
        out.append((a, b))
        out.append((b, a))
    return out


def test_kcore_triangle_plus_tail():
    """Triangle {1,2,3} with a tail 3-4-5: 2-core keeps exactly the
    triangle (degree 2 each); the tail peels over two rounds."""
    from ocr_ray.functions.graph import kcore

    ds = _edges_ds(_sym([(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]))
    out, rounds = kcore(ds, k=2, src_col="u", dst_col="v", num_buckets=4, max_rounds=10)
    got = {r["node"]: r["core_deg"] for r in out.take_all()}
    assert got == {1: 2, 2: 2, 3: 2}
    assert rounds >= 2  # the tail needs one peel per hop


def test_kcore_empty_core_and_fixpoint_first_round():
    from ocr_ray.functions.graph import kcore

    # a path graph has no 3-core
    path = _edges_ds(_sym([(1, 2), (2, 3), (3, 4)]))
    out, _ = kcore(path, k=3, src_col="u", dst_col="v", num_buckets=2, max_rounds=10)
    assert out.count() == 0

    # a 4-clique IS its own 3-core: fixpoint in one round
    clique = _sym([(a, b) for a in range(4) for b in range(4) if a < b])
    out, rounds = kcore(_edges_ds(clique), k=3, src_col="u", dst_col="v", num_buckets=2, max_rounds=10)
    assert rounds == 1
    assert {r["node"]: r["core_deg"] for r in out.take_all()} == {
        0: 3, 1: 3, 2: 3, 3: 3
    }


def test_kcore_round_bound_raises_on_long_chain():
    """A long path peeled with k=2 loses one node per end per round —
    more rounds than the bound, which must raise (the bounded-unroll
    oracle contract), not silently return a pre-fixpoint state."""
    import pytest

    from ocr_ray.functions.graph import kcore

    chain = _sym([(i, i + 1) for i in range(30)])
    with pytest.raises(RuntimeError, match="no fixpoint"):
        kcore(_edges_ds(chain), k=2, src_col="u", dst_col="v", num_buckets=2, max_rounds=3)


def test_sssp_weighted_matches_hand_relaxation():
    from ocr_ray.functions.graph import sssp_weighted

    # 1 --2--> 2 --3--> 3; 1 --10--> 3; shortest 1->3 is 5, found at round 2
    rows = [(1, 2, 2), (2, 3, 3), (1, 3, 10), (3, 4, 1)]
    sym = rows + [(b, a, w) for a, b, w in rows]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _, _ in sym], pa.int64()),
                "dst": pa.array([b for _, b, _ in sym], pa.int64()),
                "w": pa.array([w for _, _, w in sym], pa.int64()),
            }
        )
    )
    got = {
        r["node"]: r["dist"]
        for r in sssp_weighted(ds, iterations=4, num_buckets=4).take_all()
    }
    assert got == {1: 0, 2: 2, 3: 5, 4: 6}

    # 2 rounds only: node 4 still reachable via 1->2->3? no — needs 3 hops
    got2 = {
        r["node"]: r["dist"]
        for r in sssp_weighted(ds, iterations=2, num_buckets=4).take_all()
    }
    assert got2[3] == 5 and got2[4] == 11  # via the direct 10-edge + 1


def test_sssp_weight_validation():
    import pytest

    from ocr_ray.functions.graph import sssp_weighted

    bad = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([1], pa.int64()),
                "dst": pa.array([2], pa.int64()),
                "w": pa.array([0], pa.int64()),
            }
        )
    )
    with pytest.raises(Exception, match="weights must be"):
        sssp_weighted(bad, iterations=1, num_buckets=2)


def test_kcore_converging_on_last_permitted_filter_returns():
    """max_rounds counts FILTERS; an 8-node path peeled with k=2 empties
    on exactly the 4th filter — max_rounds=4 must return the (empty)
    fixpoint, not raise one convergence check short (review finding)."""
    from ocr_ray.functions.graph import kcore

    path8 = _sym([(i, i + 1) for i in range(1, 8)])
    # 3 filters peel the path to nothing; the 4th CHECK sees the empty
    # core — max_rounds=3 (exactly the filter budget) must return via
    # that extra bracketing check instead of raising
    out, rounds = kcore(
        _edges_ds(path8), k=2, src_col="u", dst_col="v", num_buckets=2, max_rounds=3
    )
    assert out.count() == 0
    assert rounds == 4  # 3 filters + the final convergence check


def test_graph_shuffle_paths_match_broadcast_paths():
    """broadcast_threshold=0 forces the bucketed-join branches (otherwise
    unreachable under 4M nodes) — results must equal the broadcast
    rounds exactly (all-integer recurrences)."""
    from ocr_ray.functions.graph import bfs_levels, kcore, pagerank, sssp_weighted

    tri_tail = _sym([(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)])
    ds = _edges_ds(tri_tail)
    out_b, _ = kcore(ds, k=2, src_col="u", dst_col="v", num_buckets=2)
    out_s, _ = kcore(
        ds, k=2, src_col="u", dst_col="v", num_buckets=2, broadcast_threshold=0
    )
    assert {r["node"]: r["core_deg"] for r in out_b.take_all()} == {
        r["node"]: r["core_deg"] for r in out_s.take_all()
    }

    w_rows = [(1, 2, 2), (2, 3, 3), (1, 3, 10), (3, 4, 1)]
    w_sym = w_rows + [(b, a, w) for a, b, w in w_rows]
    wds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _, _ in w_sym], pa.int64()),
                "dst": pa.array([b for _, b, _ in w_sym], pa.int64()),
                "w": pa.array([w for _, _, w in w_sym], pa.int64()),
            }
        )
    )
    d_b = {r["node"]: r["dist"] for r in sssp_weighted(wds, iterations=4, num_buckets=4).take_all()}
    d_s = {
        r["node"]: r["dist"]
        for r in sssp_weighted(
            wds, iterations=4, num_buckets=4, broadcast_threshold=0
        ).take_all()
    }
    assert d_b == d_s == {1: 0, 2: 2, 3: 5, 4: 6}

    eds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, b in _sym([(1, 2), (2, 3)])], pa.int64()),
                "dst": pa.array([b for a, b in _sym([(1, 2), (2, 3)])], pa.int64()),
            }
        )
    )
    b_b = {r["node"]: r["dist"] for r in bfs_levels(eds, iterations=3, num_buckets=2).take_all()}
    b_s = {
        r["node"]: r["dist"]
        for r in bfs_levels(
            eds, iterations=3, num_buckets=2, broadcast_threshold=0
        ).take_all()
    }
    assert b_b == b_s == {1: 0, 2: 1, 3: 2}

    p_b = {r["node"]: r["rank"] for r in pagerank(eds, iterations=2, num_buckets=2).take_all()}
    p_s = {
        r["node"]: r["rank"]
        for r in pagerank(
            eds, iterations=2, num_buckets=2, broadcast_threshold=0
        ).take_all()
    }
    assert p_b == p_s


def test_driver_fold_state_bound_pinned_at_threshold():
    """VERDICT r3 item 8: below broadcast_threshold the iterative engines
    fold O(nodes) int64 state on the driver. Pin the default so it cannot
    drift upward unexamined: 4M nodes x two int64 columns = 64 MiB of
    driver state, asserted <= 128 MiB. Raising any engine's default past
    that budget must consciously edit this test."""
    import inspect

    from ocr_ray.functions import graph

    for fn in (graph.pagerank, graph.bfs_levels, graph.sssp_weighted, graph.kcore):
        thr = inspect.signature(fn).parameters["broadcast_threshold"].default
        assert thr == 4_000_000, (fn.__name__, thr)
        assert 2 * 8 * thr <= (128 << 20), (fn.__name__, thr)
