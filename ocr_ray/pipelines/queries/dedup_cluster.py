"""Query registry section: dedup_cluster (split from the former monolithic queries.py)."""

from __future__ import annotations


import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ocr_ray.functions.relational import hash_join
from ocr_ray.sizing import default_buckets
from ocr_ray.sources import read_table

from ocr_ray.pipelines.queries._shared import query, read_docs
from ocr_ray.pipelines.queries.dedup import _MINHASH_CLUSTERS_SQL, minhash_dedup_pairs


# ---------------------------------------------------------------------------
# dedup clustering: near-dup pairs -> connected components
# ---------------------------------------------------------------------------


@query(
    "dedup_clusters",
    sql="""
WITH RECURSIVE k AS (
  SELECT doc_id,
         substr(text, 1, 16) AS pre,
         substr(text, greatest(1, length(text) - 15)) AS suf
  FROM documents
), stars AS (
  SELECT min(doc_id) OVER (PARTITION BY pre) AS u, doc_id AS v FROM k
  UNION ALL
  SELECT min(doc_id) OVER (PARTITION BY suf) AS u, doc_id AS v FROM k
), edges AS (
  SELECT u, v FROM stars WHERE u <> v
  UNION
  SELECT v AS u, u AS v FROM stars WHERE u <> v
), reach(n, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.n
)
SELECT n AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id FROM reach GROUP BY n
""",
)
def dedup_clusters(sf_dir: str) -> ray.data.Dataset:
    """Key-equality dedup CLUSTERS: documents sharing a 16-char text
    prefix OR a 16-char suffix are duplicates; transitive closure labels
    each doc with its component's smallest doc_id.

    Distributed shape: shared-key cliques reduced to star edges (one
    coarse-bucket groupby per key family, O(group) not O(group^2) edges —
    the boilerplate hot-key guard), alternating large-star/small-star
    connected components (O(log^2 n) bucketed-shuffle rounds,
    ``functions/graph.py``), then ONE left-outer ``hash_join`` back to the
    doc universe so singletons label themselves. The oracle computes the
    same closure with a recursive CTE."""
    from ocr_ray.functions.graph import connected_components, star_edges_from_key

    docs = read_docs(sf_dir, columns=["doc_id", "text"])

    def keys(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "pre": pc.utf8_slice_codeunits(t["text"], 0, 16),
                "suf": pc.utf8_slice_codeunits(t["text"], -16),
            }
        )

    keyed = docs.map_batches(keys, batch_format="pyarrow")
    edges = star_edges_from_key(keyed, key_col="pre", node_col="doc_id").union(
        star_edges_from_key(keyed, key_col="suf", node_col="doc_id")
    )
    labels = connected_components(edges)

    ids = docs.map_batches(lambda t: t.select(["doc_id"]), batch_format="pyarrow")
    joined = hash_join(
        ids,
        labels,
        on="doc_id",
        right_on="node",
        how="left",
        num_buckets=default_buckets(),
        left_schema=pa.schema({"doc_id": pa.int64()}),
        right_schema=pa.schema({"node": pa.int64(), "component": pa.int64()}),
    )

    def finalize(t: pa.Table) -> pa.Table:
        comp = pc.coalesce(t["component"], t["doc_id"])
        return pa.table(
            {"doc_id": t["doc_id"], "cluster_id": pc.cast(comp, pa.int64())}
        )

    return joined.map_batches(finalize, batch_format="pyarrow")


def _pagerank_sql(iterations: int = 3) -> str:
    """Unrolled integer-PageRank oracle: every iteration is exact int64
    arithmetic (floor division on non-negative values, SUM(BIGINT) →
    HUGEINT in DuckDB), so K chained CTEs reproduce the distributed
    iteration bit-for-bit — the impl and the oracle share the recurrence
    ``r' = 15%*scale + 85% * sum(r//deg)`` at scale = 1e9."""
    iters = []
    for k in range(1, iterations + 1):
        iters.append(
            f"""s{k} AS (
  SELECT e.dst AS node, SUM(r.pr // g.d) AS s
  FROM edges e JOIN r{k-1} r ON r.node = e.src JOIN deg g ON g.src = e.src
  GROUP BY e.dst
),
r{k} AS (
  SELECT n.node, CAST(150000000 + (85 * COALESCE(s.s, 0)) // 100 AS BIGINT) AS pr
  FROM nodes n LEFT JOIN s{k} s ON s.node = n.node
)"""
        )
    return (
        """
WITH pairs AS (
  SELECT DISTINCT 2 * o.o_custkey AS c, 2 * l.l_suppkey + 1 AS s
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
edges AS (
  SELECT c AS src, s AS dst FROM pairs
  UNION ALL
  SELECT s AS src, c AS dst FROM pairs
),
deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
nodes AS (SELECT DISTINCT src AS node FROM edges),
r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS pr FROM nodes),
"""
        + ",\n".join(iters)
        + f"\nSELECT node, pr AS pr_rank FROM r{iterations}"
    )


@query("purchase_graph_pagerank", sql=_pagerank_sql(3))
def purchase_graph_pagerank(sf_dir: str) -> ray.data.Dataset:
    """PageRank over the customer↔supplier purchase graph — the engine's
    iterative-algorithm showcase, oracle-checked bit-exact.

    Graph: one undirected edge per distinct (customer, supplier) pair that
    appears on an order's lineitems (node ids disambiguated as 2*custkey /
    2*suppkey+1), symmetrized into directed edges both ways. Ranks are
    FIXED-POINT int64 (scale 1e9, damping 85/100 with floor division), so
    three distributed iterations and three unrolled SQL CTEs produce
    identical integers — the trick that makes an iterative algorithm pass
    the bit-exact gate (float PageRank can't: reduction order drifts ulps).

    Distributed shape: orders⋈lineitem bucketed join with per-bucket pair
    dedup, one global edge-distinct pass, then ``functions/graph.pagerank``
    — per iteration ONE edges⋈ranks join (per-dst partial sums combined
    inside the join bucket) + one small groupby over partials, with the
    O(nodes) rank state materialized between rounds."""
    from ocr_ray.functions import graph as graphfn

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])

    def local_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "u": 2 * df["o_custkey"].to_numpy(dtype=np.int64),
                "v": 2 * df["l_suppkey"].to_numpy(dtype=np.int64) + 1,
            }
        )
        return out.drop_duplicates(ignore_index=True)

    pairs = hash_join(
        orders,
        li,
        on="o_orderkey",
        right_on="l_orderkey",
        num_buckets=default_buckets(),
        left_schema=pa.schema({"o_orderkey": pa.int64(), "o_custkey": pa.int64()}),
        right_schema=pa.schema({"l_orderkey": pa.int64(), "l_suppkey": pa.int64()}),
        bucket_post=local_pairs,
        post_schema=pa.schema({"u": pa.int64(), "v": pa.int64()}),
    )
    distinct = graphfn._dedup_edges(pairs, 16)

    def sym(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.concatenate([u, v]), type=pa.int64()),
                "dst": pa.array(np.concatenate([v, u]), type=pa.int64()),
            }
        )

    edges = distinct.map_batches(sym, batch_format="pyarrow")
    ranks = graphfn.pagerank(edges, iterations=3)
    return ranks.map_batches(
        lambda t: pa.table({"node": t["node"], "pr_rank": t["rank"]}),
        batch_format="pyarrow",
    )


def _kcore_sql(k: int = 2, rounds: int = 10) -> str:
    """Bounded-unroll k-core oracle: R chained (semi-join + degree) CTE
    rounds over the repeat-purchase graph. Pure integer arithmetic, and
    peeling is monotone — once converged the remaining rounds are
    identity, so an R-round unroll equals the fixpoint whenever the
    engine (which asserts convergence within the same bound,
    ``functions/graph.py:kcore``) returns at all."""
    # every chained CTE is MATERIALIZED: DuckDB inlines plain CTEs, so an
    # R-round unroll would re-expand e0 exponentially (2^R base scans —
    # observed as fd exhaustion at R = 10)
    parts = [
        """
WITH pairs AS MATERIALIZED (
  SELECT 2 * o.o_custkey AS c, 2 * l.l_suppkey + 1 AS s2
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2 HAVING count(DISTINCT o.o_orderkey) >= 2
),
e0 AS MATERIALIZED (
  SELECT c AS src, s2 AS dst FROM pairs
  UNION ALL
  SELECT s2 AS src, c AS dst FROM pairs
)"""
    ]
    for r in range(rounds):
        parts.append(
            f"""d{r} AS (SELECT src, count(*) AS deg FROM e{r} GROUP BY src),
a{r} AS (SELECT src AS node FROM d{r} WHERE deg >= {k}),
e{r + 1} AS MATERIALIZED (
  SELECT e.src, e.dst FROM e{r} e
  JOIN a{r} u ON u.node = e.src JOIN a{r} v ON v.node = e.dst
)"""
        )
    last = rounds
    return (
        ",\n".join(parts)
        + f""",
dF AS (SELECT src, count(*) AS deg FROM e{last} GROUP BY src)
SELECT src AS node, CAST(deg AS BIGINT) AS core_deg FROM dF WHERE deg >= {k}"""
    )


@query("purchase_graph_kcore", sql=_kcore_sql(2, 10))
def purchase_graph_kcore(sf_dir: str) -> ray.data.Dataset:
    """2-core of the REPEAT-purchase graph (customer↔supplier edges only
    where the pair shares >= 2 distinct orders — the loyalty backbone,
    much sparser than the raw copurchase graph): iterative peeling drops
    degree-<2 nodes and their edges until fixpoint, leaving each
    surviving node with its in-core degree.

    Distributed shape: orders⋈lineitem bucketed join with in-bucket
    triple dedup (the join key co-locates each order, so the in-bucket
    distinct is globally distinct), a (cust, supp)-keyed bucketed fold
    counting distinct orders per pair, then ``functions/graph.kcore`` —
    per peel round one bucketed degree fold + two bucketed semi joins
    over the SHRINKING edge set, convergence detected from O(1) counts.
    The oracle unrolls the same rounds as chained CTEs (peeling is
    monotone: converged rounds are identity), and the engine raises if
    fixpoint needs more rounds than the unroll bound."""
    from ocr_ray.functions import graph as graphfn

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])

    def local_triples(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "u": 2 * df["o_custkey"].to_numpy(dtype=np.int64),
                "v": 2 * df["l_suppkey"].to_numpy(dtype=np.int64) + 1,
                "okey": df["o_orderkey"].to_numpy(dtype=np.int64),
            }
        )
        return out.drop_duplicates(ignore_index=True)

    triples = hash_join(
        orders,
        li,
        on="o_orderkey",
        right_on="l_orderkey",
        num_buckets=default_buckets(),
        left_schema=pa.schema({"o_orderkey": pa.int64(), "o_custkey": pa.int64()}),
        right_schema=pa.schema({"l_orderkey": pa.int64(), "l_suppkey": pa.int64()}),
        bucket_post=local_triples,
        post_schema=pa.schema(
            {"u": pa.int64(), "v": pa.int64(), "okey": pa.int64()}
        ),
    )

    from ocr_ray.functions.relational import bucketed_aggregate

    per_pair = bucketed_aggregate(
        triples, keys=["u", "v"], aggs={"n_orders": ("okey", "size")}
    )

    def sym_repeat(t: pa.Table) -> pa.Table:
        keep = t.filter(
            pc.greater_equal(pc.cast(t["n_orders"], pa.int64()), pa.scalar(2))
        )
        u = keep["u"].to_numpy(zero_copy_only=False)
        v = keep["v"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.concatenate([u, v]), type=pa.int64()),
                "dst": pa.array(np.concatenate([v, u]), type=pa.int64()),
            }
        )

    edges = per_pair.map_batches(sym_repeat, batch_format="pyarrow")
    survivors, _rounds = graphfn.kcore(
        edges, k=2, num_buckets=default_buckets(), max_rounds=10
    )
    return survivors


@query("minhash_dedup_clusters", sql=_MINHASH_CLUSTERS_SQL)
def minhash_dedup_clusters(sf_dir: str) -> ray.data.Dataset:
    """MinHash near-dup pairs promoted to dedup clusters: the verified
    pair set (``minhash_dedup_pairs``) is the edge list; alternating
    large-star/small-star connected components label every involved doc
    with its cluster's smallest doc_id. Seeded mutated copies must land in
    their original's cluster (asserted in tests/test_graph.py).
    Oracle-checked: the bit-exact MinHash pair SQL extended with a
    recursive-CTE transitive closure to the component minimum."""
    from ocr_ray.functions.graph import connected_components

    pairs = minhash_dedup_pairs(sf_dir)
    labels = connected_components(pairs, left_col="doc_a", right_col="doc_b")
    return labels.map_batches(
        lambda t: pa.table(
            {"doc_id": t["node"], "cluster_id": pc.cast(t["component"], pa.int64())}
        ),
        batch_format="pyarrow",
    )




def _sssp_sql(iterations: int = 4) -> str:
    """Unrolled Bellman-Ford oracle: K MATERIALIZED rounds of
    min-plus relaxation over the quantity-weighted purchase graph —
    integer arithmetic only, so K distributed rounds reproduce it
    bit-for-bit (same contract as the BFS/PageRank unrolls)."""
    parts = [
        """
WITH pairs AS MATERIALIZED (
  SELECT 2 * o.o_custkey AS c, 2 * l.l_suppkey + 1 AS s2,
         CAST(MIN(l.l_quantity) AS BIGINT) AS w
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
),
edges AS MATERIALIZED (
  SELECT c AS src, s2 AS dst, w FROM pairs
  UNION ALL
  SELECT s2 AS src, c AS dst, w FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
s0 AS (SELECT MIN(node) AS s FROM nodes),
d0 AS (
  SELECT node, CASE WHEN node = (SELECT s FROM s0) THEN 0 ELSE 999999 END AS dist
  FROM nodes
)"""
    ]
    for k in range(1, iterations + 1):
        parts.append(
            f"""c{k} AS (
  SELECT e.dst AS node, MIN(d.dist + e.w) AS dist
  FROM edges e JOIN d{k - 1} d ON d.node = e.src GROUP BY e.dst
),
d{k} AS MATERIALIZED (
  SELECT n.node, LEAST(p.dist, COALESCE(c.dist, 999999)) AS dist
  FROM nodes n JOIN d{k - 1} p ON p.node = n.node
  LEFT JOIN c{k} c ON c.node = n.node
)"""
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT node, CAST(dist AS BIGINT) AS dist FROM d{iterations}"
    )


@query("purchase_graph_sssp", sql=_sssp_sql(4))
def purchase_graph_sssp(sf_dir: str) -> ray.data.Dataset:
    """Weighted single-source shortest paths (4 Bellman-Ford rounds)
    over the purchase graph with edge weight = the pair's minimum line
    quantity — ``bfs_levels`` lifted to the min-plus semiring
    (``functions/graph.py:sssp_weighted``). Source = MIN(node)
    (deterministic, oracle-derivable). All-integer relaxation, so the
    four distributed rounds equal four unrolled MATERIALIZED CTEs
    bit-for-bit; nodes beyond 4 hops keep the 999999 sentinel in both
    engines (candidates through unreached nodes always lose the min)."""
    from ocr_ray.functions import graph as graphfn
    from ocr_ray.functions.relational import bucketed_aggregate

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_quantity"]
    )

    def local_min(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "u": 2 * df["o_custkey"].to_numpy(dtype=np.int64),
                "v": 2 * df["l_suppkey"].to_numpy(dtype=np.int64) + 1,
                "w": df["l_quantity"].to_numpy(dtype=np.int64),
            }
        )
        # join key (orderkey) co-locates each order, but a (cust, supp)
        # pair spans orders -> this is a PARTIAL min, folded exactly below
        return out.groupby(["u", "v"], as_index=False)["w"].min()

    partial = hash_join(
        orders,
        li,
        on="o_orderkey",
        right_on="l_orderkey",
        num_buckets=default_buckets(),
        left_schema=pa.schema({"o_orderkey": pa.int64(), "o_custkey": pa.int64()}),
        right_schema=pa.schema(
            {
                "l_orderkey": pa.int64(),
                "l_suppkey": pa.int64(),
                "l_quantity": pa.float64(),
            }
        ),
        bucket_post=local_min,
        post_schema=pa.schema({"u": pa.int64(), "v": pa.int64(), "w": pa.int64()}),
    )
    pairs = bucketed_aggregate(partial, keys=["u", "v"], aggs={"w": ("w", "min")})

    def sym(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.concatenate([u, v]), type=pa.int64()),
                "dst": pa.array(np.concatenate([v, u]), type=pa.int64()),
                "w": pa.array(np.concatenate([w, w]), type=pa.int64()),
            }
        )

    edges = pairs.map_batches(sym, batch_format="pyarrow")
    return graphfn.sssp_weighted(
        edges, iterations=4, num_buckets=default_buckets()
    )
