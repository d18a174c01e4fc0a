"""Query registry section: setops_window (split from the former monolithic queries.py)."""

from __future__ import annotations

import datetime

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ocr_ray.functions.relational import (
    hash_join,
    lookup,
    to_units,
    units_to_double,
)
from ocr_ray.sizing import buckets_for_input, default_buckets
from ocr_ray.sources import read_table

from ocr_ray.pipelines.queries._shared import arrow_topk, query, read_docs


# ---------------------------------------------------------------------------
# Relational: set ops / sampling / window / as-of join / scalar functions
# ---------------------------------------------------------------------------


def _nation_setop(sf_dir: str, op: str) -> ray.data.Dataset:
    """Distributed set op over the two nationkey columns — ONE tag-side
    shuffle (``set_op``); no driver-side set algebra anywhere."""
    from ocr_ray.functions.relational import set_op

    return set_op(
        read_table(sf_dir, "customer", columns=["c_nationkey"]),
        read_table(sf_dir, "supplier", columns=["s_nationkey"]),
        on="c_nationkey",
        right_on="s_nationkey",
        op=op,
        key_type=pa.int64(),
        out_name="nationkey",
        num_buckets=8,
    )


@query(
    "nations_union",
    sql="""
SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
UNION
SELECT CAST(s_nationkey AS BIGINT) FROM supplier
""",
)
def nations_union(sf_dir: str) -> ray.data.Dataset:
    return _nation_setop(sf_dir, "union")


@query(
    "nations_intersect",
    sql="""
SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
INTERSECT
SELECT CAST(s_nationkey AS BIGINT) FROM supplier
""",
)
def nations_intersect(sf_dir: str) -> ray.data.Dataset:
    return _nation_setop(sf_dir, "intersect")


@query(
    "nations_except",
    sql="""
SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
EXCEPT
SELECT CAST(s_nationkey AS BIGINT) FROM supplier
""",
)
def nations_except(sf_dir: str) -> ray.data.Dataset:
    return _nation_setop(sf_dir, "except")


@query(
    "custkeys_except_orders",
    sql="""
SELECT c_custkey FROM customer
EXCEPT
SELECT o_custkey FROM orders
""",
)
def custkeys_except_orders(sf_dir: str) -> ray.data.Dataset:
    """Set op over two LARGE key columns (customers without orders) — the
    scale shape: both sides stream through one tag-side shuffle."""
    from ocr_ray.functions.relational import set_op

    return set_op(
        read_table(sf_dir, "customer", columns=["c_custkey"]),
        read_table(sf_dir, "orders", columns=["o_custkey"]),
        on="c_custkey",
        right_on="o_custkey",
        op="except",
        num_buckets=default_buckets(),
    )


@query(
    "custkeys_intersect_orders",
    sql="""
SELECT c_custkey FROM customer
INTERSECT
SELECT o_custkey FROM orders
""",
)
def custkeys_intersect_orders(sf_dir: str) -> ray.data.Dataset:
    from ocr_ray.functions.relational import set_op

    return set_op(
        read_table(sf_dir, "customer", columns=["c_custkey"]),
        read_table(sf_dir, "orders", columns=["o_custkey"]),
        on="c_custkey",
        right_on="o_custkey",
        op="intersect",
        num_buckets=default_buckets(),
    )


@query(
    "customer_orders_full_outer",
    sql="""
SELECT c.c_custkey, c.c_name, o.n_orders
FROM customer c FULL OUTER JOIN (
  SELECT o_custkey, COUNT(*) AS n_orders FROM orders WHERE o_totalprice > 450000
  GROUP BY o_custkey
) o ON c.c_custkey = o.o_custkey
""",
)
def customer_orders_full_outer(sf_dir: str) -> ray.data.Dataset:
    """FULL OUTER join through the bucketed hash join (outer fills are
    null-typed by the explicit bucket output schema). The right side is a
    filtered per-customer order count, so unmatched rows exist on BOTH
    sides (big spenders missing from customer would be left-only; customers
    without big orders are right-null)."""
    from ray.data.aggregate import Count

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])
    from ocr_ray.functions.relational import bucketed_aggregate

    counts = bucketed_aggregate(
        read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
        .map_batches(
            lambda t: t.filter(pc.greater(t["o_totalprice"], pa.scalar(450000.0))).select(
                ["o_custkey"]
            ),
            batch_format="pyarrow",
        ),
        keys=["o_custkey"],
        aggs={"n_orders": ("o_custkey", "size")},
    )
    return hash_join(
        cust,
        counts,
        on="c_custkey",
        right_on="o_custkey",
        how="full",
        num_buckets=8,
        left_schema=pa.schema({"c_custkey": pa.int64(), "c_name": pa.string()}),
        right_schema=pa.schema({"o_custkey": pa.int64(), "n_orders": pa.int64()}),
    ).map_batches(
        lambda t: t.select(["c_custkey", "c_name", "n_orders"]), batch_format="pyarrow"
    )


@query(
    "merge_changeset_orders",
    sql="""
WITH chg AS (
  SELECT o_orderkey, 'D' AS op, '' AS o_orderstatus, 0.0 AS o_totalprice
  FROM orders WHERE o_orderkey % 10 = 7
  UNION ALL
  SELECT o_orderkey, 'U', 'U', CAST(o_orderkey % 1000 AS DOUBLE)
  FROM orders WHERE o_orderkey % 10 = 3
  UNION ALL
  SELECT o_orderkey + 10000000, 'U', 'I', CAST(o_orderkey % 500 AS DOUBLE)
  FROM orders WHERE o_orderkey % 10 = 0
)
SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice
FROM orders b LEFT JOIN chg c ON c.o_orderkey = b.o_orderkey
WHERE c.op IS NULL
UNION ALL
SELECT o_orderkey, o_orderstatus, o_totalprice FROM chg WHERE op = 'U'
""",
)
def merge_changeset_orders(sf_dir: str) -> ray.data.Dataset:
    """Warehouse ``MERGE INTO``: apply a changeset (deletes for keys
    ending in 7, payload updates for keys ending in 3, inserts of new
    keys derived from keys ending in 0) to the orders snapshot —
    ``functions/relational.merge_upsert``. One bucketed full-outer join
    with per-key resolution inside the join bucket; the changeset here is
    derived deterministically from the snapshot itself so the oracle can
    rebuild it in SQL."""
    from ocr_ray.functions.relational import merge_upsert

    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    base = read_table(sf_dir, "orders", columns=cols)

    def mk_changes(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        status = t["o_orderstatus"].to_numpy(zero_copy_only=False)
        price = t["o_totalprice"].to_numpy(zero_copy_only=False)
        del_m = k % 10 == 7
        upd_m = k % 10 == 3
        ins_m = k % 10 == 0
        keys = np.concatenate([k[del_m], k[upd_m], k[ins_m] + 10_000_000])
        ops = np.concatenate(
            [
                np.full(del_m.sum(), "D", dtype=object),
                np.full(upd_m.sum(), "U", dtype=object),
                np.full(ins_m.sum(), "U", dtype=object),
            ]
        )
        st = np.concatenate(
            [
                np.full(del_m.sum(), "", dtype=object),
                np.full(upd_m.sum(), "U", dtype=object),
                np.full(ins_m.sum(), "I", dtype=object),
            ]
        )
        pr = np.concatenate(
            [
                np.zeros(del_m.sum()),
                (k[upd_m] % 1000).astype(np.float64),
                (k[ins_m] % 500).astype(np.float64),
            ]
        )
        return pa.table(
            {
                "o_orderkey": pa.array(keys, type=pa.int64()),
                "op": pa.array(ops, type=pa.string()),
                "o_orderstatus": pa.array(st, type=pa.string()),
                "o_totalprice": pa.array(pr, type=pa.float64()),
            }
        )

    changes = base.map_batches(mk_changes, batch_format="pyarrow")
    return merge_upsert(
        base,
        changes,
        on="o_orderkey",
        num_buckets=default_buckets(),
        base_schema=pa.schema(
            {"o_orderkey": pa.int64(), "o_orderstatus": pa.string(), "o_totalprice": pa.float64()}
        ),
        changes_schema=pa.schema(
            {
                "o_orderkey": pa.int64(),
                "op": pa.string(),
                "o_orderstatus": pa.string(),
                "o_totalprice": pa.float64(),
            }
        ),
    )


@query(
    "incremental_agg_orders",
    sql="""
WITH chg AS (
  SELECT o_orderkey, 'D' AS op, '' AS o_orderstatus, 0.0 AS o_totalprice
  FROM orders WHERE o_orderkey % 10 = 7
  UNION ALL
  SELECT o_orderkey, 'U', 'U', CAST(o_orderkey % 1000 AS DOUBLE)
  FROM orders WHERE o_orderkey % 10 = 3
  UNION ALL
  SELECT o_orderkey + 10000000, 'U', 'I', CAST(o_orderkey % 500 AS DOUBLE)
  FROM orders WHERE o_orderkey % 10 = 0
),
merged AS (
  SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice
  FROM orders b LEFT JOIN chg c ON c.o_orderkey = b.o_orderkey
  WHERE c.op IS NULL
  UNION ALL
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM chg WHERE op = 'U'
)
SELECT o_orderstatus, COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM merged GROUP BY o_orderstatus
""",
)
def incremental_agg_orders(sf_dir: str) -> ray.data.Dataset:
    """Materialized-view maintenance: keep a per-status (count, sum)
    aggregate current under the same changeset as ``merge_changeset_orders``
    WITHOUT re-aggregating the snapshot rows it doesn't touch.

    View' = view + signed deltas: each delete/update retracts (-1, -old)
    under the old status (old payload fetched by ONE bucketed left join of
    the changeset to the snapshot) and each update/insert asserts
    (+1, +new) under the new status; a tiny groupby folds base partials
    and deltas. The oracle recomputes the view from the fully-merged
    table — maintenance must equal recomputation exactly, which the
    integer-unit money arithmetic makes bit-exact. At 100 TB the
    maintenance path shuffles only the changeset (+ the join's bucketed
    probe of the snapshot), never re-aggregates the snapshot."""
    from ray.data.aggregate import Sum

    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    base = read_table(sf_dir, "orders", columns=cols)

    # -- base view partials: map-side combine to <= |status| rows/batch --
    def base_partial(t: pa.Table) -> pa.Table:
        tbl = pa.table(
            {
                "o_orderstatus": t["o_orderstatus"],
                "n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "sum_c": to_units(t["o_totalprice"]),
            }
        )
        part = tbl.group_by(["o_orderstatus"]).aggregate([("n", "sum"), ("sum_c", "sum")])
        return pa.table(
            {
                "o_orderstatus": part["o_orderstatus"],
                "n": part["n_sum"],
                "sum_c": part["sum_c_sum"],
            }
        )

    view_parts = base.map_batches(base_partial, batch_format="pyarrow")

    # -- changeset with old payload attached (one bucketed left join) --
    def mk_changes(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        del_m = k % 10 == 7
        upd_m = k % 10 == 3
        ins_m = k % 10 == 0
        keys = np.concatenate([k[del_m], k[upd_m], k[ins_m] + 10_000_000])
        ops = np.concatenate(
            [
                np.full(del_m.sum(), "D", dtype=object),
                np.full(upd_m.sum(), "U", dtype=object),
                np.full(ins_m.sum(), "U", dtype=object),
            ]
        )
        st = np.concatenate(
            [
                np.full(del_m.sum(), "", dtype=object),
                np.full(upd_m.sum(), "U", dtype=object),
                np.full(ins_m.sum(), "I", dtype=object),
            ]
        )
        # new payload in integer cents (prices are integer-valued here)
        pr = np.concatenate(
            [
                np.zeros(del_m.sum(), dtype=np.int64),
                (k[upd_m] % 1000).astype(np.int64) * 100,
                (k[ins_m] % 500).astype(np.int64) * 100,
            ]
        )
        return pa.table(
            {
                "o_orderkey": pa.array(keys, type=pa.int64()),
                "op": pa.array(ops, type=pa.string()),
                "new_status": pa.array(st, type=pa.string()),
                "new_c": pa.array(pr, type=pa.int64()),
            }
        )

    changes = base.map_batches(mk_changes, batch_format="pyarrow")

    def old_payload(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "old_status": t["o_orderstatus"],
                "old_c": to_units(t["o_totalprice"]),
            }
        )

    def deltas(df: pd.DataFrame) -> pd.DataFrame:
        out_status = []
        out_n = []
        out_sum = []
        matched = df["old_status"].notna().to_numpy()
        # retraction under the OLD status for every change that hit a row
        out_status.append(df["old_status"].to_numpy()[matched])
        out_n.append(np.full(int(matched.sum()), -1, dtype=np.int64))
        out_sum.append(-df["old_c"].to_numpy()[matched].astype(np.int64))
        # assertion under the NEW status for every upsert
        ups = (df["op"] == "U").to_numpy()
        out_status.append(df["new_status"].to_numpy()[ups])
        out_n.append(np.ones(int(ups.sum()), dtype=np.int64))
        out_sum.append(df["new_c"].to_numpy()[ups].astype(np.int64))
        g = pd.DataFrame(
            {
                "o_orderstatus": np.concatenate(out_status),
                "n": np.concatenate(out_n),
                "sum_c": np.concatenate(out_sum),
            }
        )
        # combine inside the bucket: <= |status| rows leave the task
        return g.groupby("o_orderstatus", as_index=False)[["n", "sum_c"]].sum()

    delta_parts = hash_join(
        changes,
        base.map_batches(old_payload, batch_format="pyarrow"),
        on="o_orderkey",
        how="left",
        num_buckets=default_buckets(),
        left_schema=pa.schema(
            {
                "o_orderkey": pa.int64(),
                "op": pa.string(),
                "new_status": pa.string(),
                "new_c": pa.int64(),
            }
        ),
        right_schema=pa.schema(
            {"o_orderkey": pa.int64(), "old_status": pa.string(), "old_c": pa.int64()}
        ),
        bucket_post=deltas,
        post_schema=pa.schema(
            {"o_orderstatus": pa.string(), "n": pa.int64(), "sum_c": pa.int64()}
        ),
    )

    folded = (
        view_parts.union(delta_parts)
        .groupby("o_orderstatus")
        .aggregate(Sum("n", alias_name="n_orders"), Sum("sum_c", alias_name="sum_all"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["n_orders"], pa.scalar(0, type=pa.int64())))
        return pa.table(
            {
                "o_orderstatus": t["o_orderstatus"],
                "n_orders": pc.cast(t["n_orders"], pa.int64()),
                "sum_price": pa.array(
                    units_to_double(t["sum_all"].to_numpy(zero_copy_only=False), 2)
                ),
            }
        )

    return folded.map_batches(finalize, batch_format="pyarrow")


@query(
    "range_join_followup_events",
    sql="""
SELECT b.event_id AS event_id, b.user_id AS user_id, b.ts AS ts,
       a.event_id AS event_id_r, a.ts AS ts_r
FROM events b JOIN events a ON b.user_id = a.user_id
WHERE b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
""",
)
def range_join_followup_events(sf_dir: str) -> ray.data.Dataset:
    """Equality+range join (pairs of same-user events where the second
    fires within one hour after the first): co-partition on the equality
    key through the ONE-shuffle bucketed join, apply the time-range
    predicate inside each bucket body so non-qualifying pairs never leave
    the task (``range_join``). Self-join flavor: the right side's
    colliding columns arrive suffixed ``_r``, and the range value column
    is named post-rename (``ts_r``)."""
    from ocr_ray.functions.relational import range_join

    ts = pa.timestamp("us")
    schema = pa.schema({"event_id": pa.int64(), "user_id": pa.int64(), "ts": ts})
    followup = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    anchor = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    return range_join(
        followup,
        anchor,
        on="user_id",
        left_val="ts",
        right_val="ts_r",
        lo=pd.Timedelta(microseconds=1),
        hi=pd.Timedelta(hours=1),
        num_buckets=default_buckets(),
        left_schema=schema,
        right_schema=schema,
    )


@query(
    "sample_orders_systematic",
    sql="""
SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 97 = 3
""",
)
def sample_orders_systematic(sf_dir: str) -> ray.data.Dataset:
    """Deterministic ~1% systematic sample (key-residue filter) — the
    reproducible cousin of ``Dataset.random_sample`` for pipelines that
    must be re-runnable/resumable (same sample every run, any cluster)."""
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def pick(t: pa.Table) -> pa.Table:
        keep = pc.equal(
            pc.subtract(
                t["o_orderkey"],
                pc.multiply(pc.divide(t["o_orderkey"], pa.scalar(97, type=pa.int64())), pa.scalar(97, type=pa.int64())),
            ),
            pa.scalar(3, type=pa.int64()),
        )
        return t.filter(keep)

    return ds.map_batches(pick, batch_format="pyarrow")


@query(
    "stratified_sample_orders",
    sql="""
SELECT o_orderstatus, o_orderkey, o_totalprice FROM (
  SELECT o_orderstatus, o_orderkey, o_totalprice,
    row_number() OVER (PARTITION BY o_orderstatus
      ORDER BY (o_orderkey * 2654435761) % 4294967296, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 50
""",
)
def stratified_sample_orders(sf_dir: str) -> ray.data.Dataset:
    """Deterministic stratified sample: exactly 50 rows per stratum
    (o_orderstatus), chosen by a Knuth multiplicative pseudo-hash of the
    key — reproducible on any cluster, unlike ``random_sample``.

    Distributed shape: per-batch partial top-50 per stratum (each batch
    contributes at most 50 x strata rows), then a tiny per-stratum final
    merge — the same partial-top-k discipline as q3, so no task ever holds
    a stratum's full population even when strata are few and huge."""
    K = 50
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        out = t.append_column(
            "_h", pa.array((k * np.int64(2654435761)) % np.int64(4294967296))
        )
        out = arrow_topk(
            out,
            [
                ("o_orderstatus", "ascending"),
                ("_h", "ascending"),
                ("o_orderkey", "ascending"),
            ],
        )
        # first K rows of each stratum of the (status, _h, key)-sorted batch
        status = out["o_orderstatus"].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, status[1:] != status[:-1]])
        bounds = np.r_[starts, len(status)]
        keep = np.concatenate(
            [np.arange(a, min(a + K, b)) for a, b in zip(bounds[:-1], bounds[1:])]
        ) if len(status) else np.empty(0, dtype=np.int64)
        return out.take(pa.array(keep, type=pa.int64()))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["_h", "o_orderkey"], kind="mergesort").head(K)
        return g[["o_orderstatus", "o_orderkey", "o_totalprice"]]

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderstatus")
        .map_groups(final, batch_format="pandas")
    )


@query(
    "collect_orders_per_customer",
    sql="""
SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
       string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderdate, o_orderkey) AS order_keys
FROM orders GROUP BY o_custkey
""",
)
def collect_orders_per_customer(sf_dir: str) -> ray.data.Dataset:
    """collect_list / string_agg: per-key ordered list of values, emitted
    as a deterministic comma-joined string. Coarse-bucket shuffle on the
    grouping key, one vectorized sort + group-concat pass per bucket —
    bucket count (not customer count) is the parallelism knob."""
    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_orderdate"])

    nb = np.uint64(buckets_for_input(ds))

    def bucketize(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(t["o_custkey"].to_numpy(zero_copy_only=False))
        return t.append_column("_bucket", pa.array((h % nb).astype(np.int32)))

    def body(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort"
        )
        keys = g["o_orderkey"].astype(str).to_numpy()
        cust = g["o_custkey"].to_numpy()
        new = np.empty(len(g), dtype=bool)
        new[0] = True
        new[1:] = cust[1:] != cust[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.concatenate([starts, [len(g)]]))
        joined = [",".join(keys[s : s + c]) for s, c in zip(starts, counts)]
        return pd.DataFrame(
            {
                "o_custkey": cust[starts],
                "n_orders": counts.astype(np.int64),
                "order_keys": joined,
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(body, batch_format="pandas")
    )


@query(
    "tfidf_doc_tokens",
    sql="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY doc_id, token
), idf AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token
), n AS (SELECT COUNT(*) AS n FROM documents)
SELECT tf.doc_id, tf.token, tf.tf, idf.df,
       CAST(tf.tf AS DOUBLE) * ln(CAST(n.n AS DOUBLE) / CAST(idf.df AS DOUBLE)) AS tfidf
FROM tf, idf, n WHERE tf.token = idf.token
""",
)
def tfidf_doc_tokens(sf_dir: str) -> ray.data.Dataset:
    """TF-IDF over the document corpus, the canonical two-shuffle shape:

    1. map_batches: tokenize + per-(doc, token) term counts with one Arrow
       ``group_by`` per batch (documents are whole rows, so per-batch tf is
       exact — no cross-batch combine needed);
    2. ``groupby(token).count()`` for document frequency (shuffle #1);
    3. bucketed ``hash_join`` tf x df on token (shuffle #2), tfidf computed
       vectorized inside the downstream map.

    N (corpus size) is a parquet metadata count — no execution. The idf
    join is a real shuffle join, not a broadcast, because at web scale the
    vocabulary does not fit a broadcast side."""
    from ray.data.aggregate import Count

    ds = read_docs(sf_dir, columns=["doc_id", "text"])
    n_docs = float(ds.count())  # parquet metadata count — no execution

    def term_counts(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        parents = pc.list_parent_indices(toks)
        flat = pa.table(
            {
                "doc_id": pc.take(t["doc_id"].combine_chunks(), parents),
                "token": pc.list_flatten(toks),
            }
        )
        out = flat.group_by(["doc_id", "token"]).aggregate([([], "count_all")])
        return out.rename_columns(["doc_id", "token", "tf"]).set_column(
            2, "tf", pc.cast(out["count_all"], pa.int64())
        )

    from ocr_ray.functions.relational import bucketed_aggregate

    tf = ds.map_batches(term_counts, batch_format="pyarrow")
    # per-token: vocabulary scales with the corpus -> bucketed fold
    df = bucketed_aggregate(tf, keys=["token"], aggs={"df": ("doc_id", "size")})
    joined = hash_join(
        tf,
        df.map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("df"), "df", pc.cast(t["df"], pa.int64())
            ),
            batch_format="pyarrow",
        ),
        on="token",
        num_buckets=default_buckets(),
        left_schema=pa.schema(
            {"doc_id": pa.int64(), "token": pa.string(), "tf": pa.int64()}
        ),
        right_schema=pa.schema({"token": pa.string(), "df": pa.int64()}),
    )

    def score(t: pa.Table) -> pa.Table:
        import math

        tf_d = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        df_d = t["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        # numpy's SIMD log differs from libm ln by 1 ulp on some inputs;
        # libm (math.log) matches DuckDB bit-exact. df has few distinct
        # values per batch, so libm-log only the uniques, then gather.
        uniq, inv = np.unique(df_d, return_inverse=True)
        idf = np.array([math.log(n_docs / d) for d in uniq])[inv]
        return t.append_column("tfidf", pa.array(tf_d * idf))

    return joined.map_batches(score, batch_format="pyarrow")


@query(
    "top_orders_per_customer",
    sql="""
SELECT o_custkey, o_orderkey, o_totalprice,
  CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk
FROM orders
QUALIFY rnk <= 2
""",
)
def top_orders_per_customer(sf_dir: str) -> ray.data.Dataset:
    """Windowed top-k per group (row_number PARTITION BY): coarse-bucket
    shuffle on the partition key, one vectorized rank pass per bucket."""
    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"])

    nb = np.uint64(buckets_for_input(ds))

    def bucketize(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(t["o_custkey"].to_numpy(zero_copy_only=False))
        return t.append_column("_bucket", pa.array((h % nb).astype(np.int32)))

    def rank_body(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        cust = g["o_custkey"].to_numpy()
        new = np.empty(len(g), dtype=bool)
        new[0] = True
        new[1:] = cust[1:] != cust[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.concatenate([starts, [len(g)]]))
        rnk = np.arange(len(g), dtype=np.int64) - np.repeat(starts, counts)
        out = g[["o_custkey", "o_orderkey", "o_totalprice"]].copy()
        out["rnk"] = rnk + 1
        return out[rnk < 2]

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(rank_body, batch_format="pandas")
    )


@query(
    "asof_join_events_orders",
    sql="""
WITH e AS (
  SELECT event_id, user_id,
    TIMESTAMP '1995-01-01' + INTERVAL ((event_id % 2400)) DAY AS ed
  FROM events
), o AS (
  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS matched_date
FROM e ASOF JOIN o ON e.user_id = o.o_custkey AND e.ed >= o.o_orderdate
""",
)
def asof_join_events_orders(sf_dir: str) -> ray.data.Dataset:
    """As-of (backward) join: each event (with a derived event date) to the
    latest order of the matching customer at or before that date. Both
    sides co-partition on the by-key through one coarse-bucket shuffle;
    each bucket runs one vectorized ``pandas.merge_asof``. Date ties are
    pre-collapsed to max(o_orderkey) so the match is deterministic."""
    events = read_table(sf_dir, "events", columns=["event_id", "user_id"])
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_orderkey"])
    num_buckets = buckets_for_input(orders)

    def prep_events(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(t["user_id"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "o_orderkey": pa.nulls(t.num_rows, type=pa.int64()),
                "o_orderdate": pa.nulls(t.num_rows, type=pa.timestamp("us")),
                "_side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
                "_bucket": pa.array((h % np.uint64(num_buckets)).astype(np.int32)),
            }
        )

    def prep_orders(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(t["o_custkey"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "event_id": pa.nulls(t.num_rows, type=pa.int64()),
                "user_id": pc.cast(t["o_custkey"], pa.int64()),
                "o_orderkey": t["o_orderkey"],
                "o_orderdate": t["o_orderdate"],
                "_side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
                "_bucket": pa.array((h % np.uint64(num_buckets)).astype(np.int32)),
            }
        )

    both = events.map_batches(prep_events, batch_format="pyarrow").union(
        orders.map_batches(prep_orders, batch_format="pyarrow")
    )

    def asof_body(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["_side"] == 0][["event_id", "user_id"]].copy()
        o = g[g["_side"] == 1][["user_id", "o_orderdate", "o_orderkey"]].copy()
        e["ed"] = (
            pd.Timestamp("1995-01-01")
            + pd.to_timedelta(e["event_id"].to_numpy() % 2400, unit="D")
        ).astype(o["o_orderdate"].dtype)
        # collapse date ties deterministically: max orderkey per (cust, date)
        o = (
            o.sort_values(["user_id", "o_orderdate", "o_orderkey"], kind="mergesort")
            .drop_duplicates(["user_id", "o_orderdate"], keep="last")
        )
        e = e.sort_values("ed", kind="mergesort")
        o = o.sort_values("o_orderdate", kind="mergesort")
        m = pd.merge_asof(
            e,
            o,
            left_on="ed",
            right_on="o_orderdate",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
        ).dropna(subset=["o_orderkey"])
        return pd.DataFrame(
            {
                "event_id": m["event_id"].astype(np.int64),
                "user_id": m["user_id"].astype(np.int64),
                "o_orderkey": m["o_orderkey"].astype(np.int64),
                "matched_date": m["o_orderdate"].dt.strftime("%Y-%m-%d"),
            }
        )

    return both.groupby("_bucket").map_groups(asof_body, batch_format="pandas")


@query(
    "date_functions_orders",
    sql="""
SELECT o_orderkey,
  CAST(year(o_orderdate) AS BIGINT) AS yr,
  CAST(month(o_orderdate) AS BIGINT) AS mon,
  CAST(day(o_orderdate) AS BIGINT) AS dom,
  CAST(isodow(o_orderdate) AS BIGINT) AS dow_iso,
  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
  strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS due_date
FROM orders
""",
)
def date_functions_orders(sf_dir: str) -> ray.data.Dataset:
    """Date/time scalar kernels (year/month/day/isodow/quarter/date math)."""
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])

    def fx(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"]
        due = pc.add(d, pa.scalar(datetime.timedelta(days=90)))
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "yr": pc.cast(pc.year(d), pa.int64()),
                "mon": pc.cast(pc.month(d), pa.int64()),
                "dom": pc.cast(pc.day(d), pa.int64()),
                "dow_iso": pc.cast(
                    pc.day_of_week(d, count_from_zero=False, week_start=1), pa.int64()
                ),
                "qtr": pc.cast(pc.quarter(d), pa.int64()),
                "due_date": pc.strftime(due, format="%Y-%m-%d"),
            }
        )

    return ds.map_batches(fx, batch_format="pyarrow")


@query(
    "math_functions_lineitem",
    sql="""
SELECT l_orderkey, l_linenumber,
  sqrt(l_quantity) AS qty_sqrt,
  l_quantity * l_quantity AS qty_sq,
  abs(l_discount - 0.05) AS disc_dev,
  ceil(l_extendedprice / 100) AS price_ceil,
  floor(l_extendedprice / 100) AS price_floor,
  round(l_extendedprice) AS price_round,
  CAST(l_orderkey % 7 AS BIGINT) AS key_mod7
FROM lineitem
""",
)
def math_functions_lineitem(sf_dir: str) -> ray.data.Dataset:
    """Math scalar kernels chosen for IEEE bit-exactness across engines
    (sqrt/abs/ceil/floor/integer-valued round/multiply/mod)."""
    ds = read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"]
    )

    def fx(t: pa.Table) -> pa.Table:
        price100 = pc.divide(t["l_extendedprice"], pa.scalar(100.0))
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_linenumber": pc.cast(t["l_linenumber"], pa.int32()),
                "qty_sqrt": pc.sqrt(t["l_quantity"]),
                "qty_sq": pc.multiply(t["l_quantity"], t["l_quantity"]),
                "disc_dev": pc.abs(pc.subtract(t["l_discount"], pa.scalar(0.05))),
                "price_ceil": pc.ceil(price100),
                "price_floor": pc.floor(price100),
                "price_round": pc.round(
                    t["l_extendedprice"], ndigits=0, round_mode="half_towards_infinity"
                ),
                "key_mod7": pc.subtract(
                    t["l_orderkey"],
                    pc.multiply(
                        pc.divide(t["l_orderkey"], pa.scalar(7, type=pa.int64())),
                        pa.scalar(7, type=pa.int64()),
                    ),
                ),
            }
        )

    return ds.map_batches(fx, batch_format="pyarrow")


@query(
    "json_extract_events",
    sql="""
SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k_value,
  CAST(length(props) AS BIGINT) AS props_len
FROM events
""",
)
def json_extract_events(sf_dir: str) -> ray.data.Dataset:
    """JSON scalar extraction over the events.props column — vectorized
    regex field extraction (no Python json.loads per row)."""
    ds = read_table(sf_dir, "events", columns=["event_id", "props"])

    def fx(t: pa.Table) -> pa.Table:
        ext = pc.extract_regex(t["props"], pattern=r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(ext, "k"), pa.int64())
        return pa.table(
            {
                "event_id": t["event_id"],
                "k_value": k,
                "props_len": pc.cast(pc.utf8_length(t["props"]), pa.int64()),
            }
        )

    return ds.map_batches(fx, batch_format="pyarrow")


@query(
    "supplier_stats_by_nation",
    sql="""
SELECT CAST(s_nationkey AS BIGINT) AS nationkey, COUNT(*) AS n_suppliers,
  CAST(MIN(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS min_bal,
  CAST(MAX(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS max_bal,
  CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_bal
FROM supplier GROUP BY s_nationkey
""",
)
def supplier_stats_by_nation(sf_dir: str) -> ray.data.Dataset:
    """Min/Max/Count/Avg aggregate suite with exact integer-unit money."""
    from ray.data.aggregate import Count, Max, Min, Sum

    ds = read_table(sf_dir, "supplier", columns=["s_nationkey", "s_acctbal"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "nationkey": pc.cast(t["s_nationkey"], pa.int64()),
                "bal_c": to_units(t["s_acctbal"]),
            }
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("nationkey")
        .aggregate(
            Count(alias_name="n_suppliers"),
            Min("bal_c", alias_name="min_c"),
            Max("bal_c", alias_name="max_c"),
            Sum("bal_c", alias_name="sum_c"),
        )
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n_suppliers"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "nationkey": df["nationkey"].astype(np.int64),
                "n_suppliers": n,
                "min_bal": units_to_double(df["min_c"], 2),
                "max_bal": units_to_double(df["max_c"], 2),
                "avg_bal": units_to_double(df["sum_c"], 2) / n,
            }
        )

    return agg.map_batches(finalize, batch_format="pandas")


@query(
    "events_tumbling_5min",
    sql="""
SELECT strftime(time_bucket(INTERVAL 5 MINUTE, ts), '%Y-%m-%d %H:%M') AS window_start,
  event_type, COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY window_start, event_type
""",
)
def events_tumbling_5min(sf_dir: str) -> ray.data.Dataset:
    """Tumbling-window aggregate (5-min windows) — the finite-log idiom for
    the reference's absent streaming surface: window id is pure integer
    arithmetic on the epoch, then a standard partial+final groupby."""
    ds = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])
    w_us = 5 * 60 * 1_000_000

    def prep(t: pa.Table) -> pa.Table:
        epoch = pc.cast(t["ts"], pa.int64())
        start = pc.multiply(pc.divide(epoch, pa.scalar(w_us, type=pa.int64())), pa.scalar(w_us, type=pa.int64()))
        tbl = pa.table(
            {
                "window_start": pc.strftime(
                    pc.cast(start, pa.timestamp("us")), format="%Y-%m-%d %H:%M"
                ),
                "event_type": t["event_type"],
                "value_c": to_units(t["value"]),
            }
        )
        # map-side combine: the window-key cardinality scales with the
        # log's time span (~rows/window at sf0.1), so the fold must be
        # bucketed, with per-batch partials shrinking the shuffle
        part = tbl.group_by(["window_start", "event_type"]).aggregate(
            [([], "count_all"), ("value_c", "sum"), ("value_c", "count")]
        )
        return pa.table(
            {
                "window_start": part["window_start"],
                "event_type": part["event_type"],
                "n_events": part["count_all"],
                "value_c": part["value_c_sum"],
                # non-null count: the bucketed pandas fold turns an
                # all-NULL group's sum into 0, but SQL SUM yields NULL —
                # finalize nulls the sum when n_valid == 0
                "n_valid": part["value_c_count"],
            }
        )

    from ocr_ray.functions.relational import bucketed_aggregate

    agg = bucketed_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"),
        keys=["window_start", "event_type"],
        aggs={
            "n_events": ("n_events", "sum"),
            "value_c": ("value_c", "sum"),
            "n_valid": ("n_valid", "sum"),
        },
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        sv = units_to_double(df["value_c"], 2)
        sv = np.where(df["n_valid"].to_numpy(dtype=np.int64) == 0, np.nan, sv)
        return pd.DataFrame(
            {
                "window_start": df["window_start"],
                "event_type": df["event_type"],
                "n_events": df["n_events"].astype(np.int64),
                "sum_value": sv,
            }
        )

    return agg.map_batches(finalize, batch_format="pandas")


@query(
    "events_hopping_10min",
    sql="""
WITH assigned AS (
  SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS w, value FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL 5 MINUTE, ts) - INTERVAL 5 MINUTE AS w, value FROM events
)
SELECT strftime(w, '%Y-%m-%d %H:%M') AS window_start, COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM assigned GROUP BY w
""",
)
def events_hopping_10min(sf_dir: str) -> ray.data.Dataset:
    """Hopping windows (size 10 min, hop 5 min): each event replicates into
    its two overlapping windows inside map_batches (flat-map shape), then
    one groupby — replication happens before the shuffle, no driver loop."""
    ds = read_table(sf_dir, "events", columns=["ts", "value"])
    hop_us = 5 * 60 * 1_000_000

    def assign(t: pa.Table) -> pa.Table:
        epoch = pc.cast(t["ts"], pa.int64())
        b = pc.multiply(pc.divide(epoch, pa.scalar(hop_us, type=pa.int64())), pa.scalar(hop_us, type=pa.int64()))
        value_c = to_units(t["value"])
        starts = pa.concat_arrays(
            [
                pc.cast(b, pa.int64()).combine_chunks(),
                pc.subtract(b, pa.scalar(hop_us, type=pa.int64())).combine_chunks(),
            ]
        )
        vals = pa.concat_arrays([value_c.combine_chunks()] * 2)
        tbl = pa.table(
            {
                "window_start": pc.strftime(
                    pc.cast(starts, pa.timestamp("us")), format="%Y-%m-%d %H:%M"
                ),
                "value_c": vals,
            }
        )
        part = tbl.group_by("window_start").aggregate(
            [([], "count_all"), ("value_c", "sum"), ("value_c", "count")]
        )
        return pa.table(
            {
                "window_start": part["window_start"],
                "n_events": part["count_all"],
                "value_c": part["value_c_sum"],
                "n_valid": part["value_c_count"],  # see tumbling note
            }
        )

    from ocr_ray.functions.relational import bucketed_aggregate

    agg = bucketed_aggregate(
        ds.map_batches(assign, batch_format="pyarrow"),
        keys=["window_start"],
        aggs={
            "n_events": ("n_events", "sum"),
            "value_c": ("value_c", "sum"),
            "n_valid": ("n_valid", "sum"),
        },
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        sv = units_to_double(df["value_c"], 2)
        sv = np.where(df["n_valid"].to_numpy(dtype=np.int64) == 0, np.nan, sv)
        return pd.DataFrame(
            {
                "window_start": df["window_start"],
                "n_events": df["n_events"].astype(np.int64),
                "sum_value": sv,
            }
        )

    return agg.map_batches(finalize, batch_format="pandas")


@query(
    "doc_tokens_exploded",
    sql="""
WITH s AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
SELECT doc_id, unnest(ws) AS token,
  CAST(generate_subscripts(ws, 1) - 1 AS BIGINT) AS pos
FROM s
""",
)
def doc_tokens_exploded(sf_dir: str) -> ray.data.Dataset:
    """Unnest/explode: one output row per token with its position — the
    flat_map primitive, fully inside Arrow kernels."""
    ds = read_docs(sf_dir, columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        parents = pc.list_parent_indices(toks)
        counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
        pos = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(starts, counts)
        return pa.table(
            {
                "doc_id": pc.take(t["doc_id"].combine_chunks(), parents),
                "token": pc.list_flatten(toks),
                "pos": pa.array(pos),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


@query(
    "q6_forecast_revenue",
    sql="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.05 AND l_quantity < 24
""",
)
def q6_forecast_revenue(sf_dir: str) -> pa.Table:
    """TPC-H Q6-style global aggregate: vectorized filter + exact
    integer-unit partial sums per batch, one tiny driver-side reduce."""
    ds = read_table(
        sf_dir, "lineitem", columns=["l_extendedprice", "l_discount", "l_quantity", "l_shipdate"]
    )
    lo, hi = datetime.datetime(1996, 1, 1), datetime.datetime(1997, 1, 1)

    def partial(t: pa.Table) -> pa.Table:
        disc_c = to_units(t["l_discount"])
        mask = pc.and_(
            pc.and_(
                pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                pc.less(t["l_shipdate"], pa.scalar(hi)),
            ),
            pc.and_(
                pc.and_(
                    pc.greater_equal(disc_c, pa.scalar(3, type=pa.int64())),
                    pc.less_equal(disc_c, pa.scalar(5, type=pa.int64())),
                ),
                pc.less(t["l_quantity"], pa.scalar(24.0)),
            ),
        )
        t2 = t.filter(mask)
        rev_u4 = pc.multiply(to_units(t2["l_extendedprice"]), to_units(t2["l_discount"]))
        return pa.table({"rev_u4": pa.array([pc.sum(rev_u4).as_py() or 0], type=pa.int64())})

    total = sum(
        r["rev_u4"] for r in ds.map_batches(partial, batch_format="pyarrow").take_all()
    )
    return pa.table({"revenue": pa.array([total / 1e4], type=pa.float64())})


@query(
    "orders_rollup_year_status",
    sql="""
SELECT COALESCE(CAST(year(o_orderdate) AS VARCHAR), 'ALL') AS yr,
  COALESCE(o_orderstatus, 'ALL') AS status, COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY ROLLUP (year(o_orderdate), o_orderstatus)
""",
)
def orders_rollup_year_status(sf_dir: str) -> ray.data.Dataset:
    """ROLLUP hierarchy (year, status) -> the partial+final idiom: ONE
    fine-grained distributed groupby, then the two coarser levels fold
    from the (tiny) finest level — no second pass over the data."""
    ds = read_table(sf_dir, "orders", columns=["o_orderdate", "o_orderstatus", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "yr": pc.cast(pc.year(t["o_orderdate"]), pa.string()),
                "status": t["o_orderstatus"],
                "price_c": to_units(t["o_totalprice"]),
            }
        )

    from ocr_ray.pipelines.queries._shared import mapside_count_sum

    fine = (
        mapside_count_sum(
            ds.map_batches(prep, batch_format="pyarrow"),
            keys=["yr", "status"],
            sum_cols=["price_c"],
        )
        .to_pandas()
        .rename(columns={"n": "n_orders"})
    )
    lvl1 = (
        fine.groupby("yr", as_index=False)[["n_orders", "price_c"]].sum().assign(status="ALL")
    )
    lvl0 = pd.DataFrame(
        {"yr": ["ALL"], "status": ["ALL"], "n_orders": [fine["n_orders"].sum()],
         "price_c": [fine["price_c"].sum()]}
    )
    allv = pd.concat([fine, lvl1, lvl0], ignore_index=True)
    return pa.table(
        {
            "yr": pa.array(allv["yr"], type=pa.string()),
            "status": pa.array(allv["status"], type=pa.string()),
            "n_orders": pa.array(allv["n_orders"].to_numpy(dtype=np.int64)),
            "total_price": pa.array(units_to_double(allv["price_c"], 2)),
        }
    )


@query(
    "customers_above_nation_avg",
    sql="""
WITH nation_avg AS (
  SELECT c_nationkey, CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_bal
  FROM customer GROUP BY c_nationkey
)
SELECT c.c_custkey, c.c_name, c.c_acctbal
FROM customer c JOIN nation_avg n ON c.c_nationkey = n.c_nationkey
WHERE CAST(c.c_acctbal AS DOUBLE) > n.avg_bal
""",
)
def customers_above_nation_avg(sf_dir: str) -> ray.data.Dataset:
    """Correlated-subquery shape (value vs its group's aggregate): the
    group aggregate is tiny (25 nations) so it broadcasts — one pass to
    aggregate, one map-side filtered pass; no join shuffle."""
    from ray.data.aggregate import Count, Sum

    ds = read_table(sf_dir, "customer", columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"c_nationkey": pc.cast(t["c_nationkey"], pa.int64()), "bal_c": to_units(t["c_acctbal"])}
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("c_nationkey")
        .aggregate(Sum("bal_c", alias_name="sum_c"), Count(alias_name="n"))
        .to_pandas()
    )
    avg_by_nation = {
        int(k): units_to_double(np.array([s]), 2)[0] / n
        for k, s, n in zip(agg["c_nationkey"], agg["sum_c"], agg["n"])
    }
    avg_ref = ray.put({k: (v,) for k, v in avg_by_nation.items()})

    def above(t: pa.Table) -> pa.Table:
        keep = pc.greater(t["c_acctbal"], t["_avg"])
        return t.filter(keep).select(["c_custkey", "c_name", "c_acctbal"])

    withavg = lookup(ds, avg_ref, "c_nationkey", [("_avg", pa.float64())])
    return withavg.map_batches(above, batch_format="pyarrow")


@query(
    "median_price_by_status",
    sql="""
SELECT o_orderstatus, median(o_totalprice) AS median_price, COUNT(*) AS n_orders
FROM orders GROUP BY o_orderstatus
""",
)
def median_price_by_status(sf_dir: str) -> pa.Table:
    """Exact per-group median WITHOUT holding a whole group in one task:
    distributed histogram selection (min/max pass -> per-(group, bin)
    histogram groupby -> exact recount of only the bracketing bins). The
    round-1 ``groupby('o_orderstatus').map_groups`` put ~1/3 of all orders
    in one pandas frame — the canonical low-cardinality skew killer at
    100x scale."""
    from ocr_ray.functions.sketch import grouped_exact_median

    ds = read_table(sf_dir, "orders", columns=["o_orderstatus", "o_totalprice"])
    out = grouped_exact_median(ds, group_col="o_orderstatus", value_col="o_totalprice")
    return pa.table(
        {
            "o_orderstatus": pa.array(out["o_orderstatus"], type=pa.string()),
            "median_price": pa.array(out["median"].to_numpy(dtype=np.float64)),
            "n_orders": pa.array(out["n"].to_numpy(dtype=np.int64)),
        }
    )


@query(
    "orders_pivot_status_by_year",
    sql="""
SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_partial
FROM orders GROUP BY yr
""",
)
def orders_pivot_status_by_year(sf_dir: str) -> ray.data.Dataset:
    """Pivot via conditional aggregation: status becomes columns with
    map-side 0/1 indicator columns summed in one groupby."""
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "orders", columns=["o_orderdate", "o_orderstatus"])

    def prep(t: pa.Table) -> pa.Table:
        s = t["o_orderstatus"]
        tbl = pa.table(
            {
                "yr": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
                "is_o": pc.cast(pc.equal(s, "O"), pa.int64()),
                "is_f": pc.cast(pc.equal(s, "F"), pa.int64()),
                "is_p": pc.cast(pc.equal(s, "P"), pa.int64()),
            }
        )
        # map-side combine: fold each batch to <= |years| rows first
        part = tbl.group_by("yr").aggregate(
            [("is_o", "sum"), ("is_f", "sum"), ("is_p", "sum")]
        )
        return pa.table(
            {
                "yr": part["yr"],
                "is_o": part["is_o_sum"],
                "is_f": part["is_f_sum"],
                "is_p": part["is_p_sum"],
            }
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("yr")
        .aggregate(
            Sum("is_o", alias_name="n_open"),
            Sum("is_f", alias_name="n_filled"),
            Sum("is_p", alias_name="n_partial"),
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "yr": t["yr"],
                "n_open": pc.cast(t["n_open"], pa.int64()),
                "n_filled": pc.cast(t["n_filled"], pa.int64()),
                "n_partial": pc.cast(t["n_partial"], pa.int64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


@query(
    "approx_quantiles_totalprice",
    sql="""
WITH mm AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi,
            count(*) AS n FROM orders),
bb AS (
  SELECT least(greatest(CAST(trunc((o_totalprice - mm.lo) / (mm.hi - mm.lo) * 4096)
               AS BIGINT), 0), 4095) AS bin
  FROM orders, mm
),
hist AS (SELECT bin, count(*) AS c FROM bb GROUP BY bin),
cum AS (SELECT bin, c, SUM(c) OVER (ORDER BY bin) AS cm FROM hist),
qs(q) AS (VALUES (0.1), (0.5), (0.9), (0.99)),
tgt AS (SELECT q, q * (mm.n - 1) AS target, mm.lo, mm.hi FROM qs, mm),
pick AS (
  SELECT t.q, t.target, t.lo, t.hi, min(c.bin) AS bsel
  FROM tgt t JOIN cum c ON CAST(c.cm AS DOUBLE) >= t.target + 1
  GROUP BY t.q, t.target, t.lo, t.hi
)
SELECT p.q AS quantile,
  p.lo + (p.bsel + (p.target - COALESCE(
      (SELECT SUM(h.c) FROM hist h WHERE h.bin < p.bsel), 0)) / c.c)
    * ((p.hi - p.lo) / 4096) AS value
FROM pick p JOIN cum c ON c.bin = p.bsel
""",
)
def approx_quantiles_totalprice(sf_dir: str) -> pa.Table:
    """Approximate quantiles (p10/p50/p90/p99) of o_totalprice via the
    mergeable fixed-range histogram sketch: one cheap min/max pass, one
    histogram-partial pass (combiner inside map_batches), tiny driver
    merge. Error bounded by (max-min)/4096; asserted vs exact in tests.

    "Approximate" yet fully DETERMINISTIC — bin assignment, the cum-CDF
    search and the in-bin interpolation are fixed float expressions of
    (lo, hi, counts), so the SQL oracle reproduces the sketch's own
    output bit for bit (same op order: (v-lo)/(hi-lo)*bins truncated;
    lo + (b + (target-prev)/count) * (hi-lo)/bins)."""
    import functools

    from ray.data.aggregate import Max, Min

    from ocr_ray.functions.sketch import histogram_partial, histogram_quantiles

    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "orders", columns=["o_totalprice"])
    mm = ds.aggregate(Min("o_totalprice"), Max("o_totalprice"))
    lo, hi = float(mm["min(o_totalprice)"]), float(mm["max(o_totalprice)"])
    # distributed partial merge: driver input bounded by bin count (4096),
    # not by batch count.
    merged = (
        ds.map_batches(
            functools.partial(histogram_partial, col="o_totalprice", lo=lo, hi=hi),
            batch_format="pyarrow",
        )
        .groupby("bin")
        .aggregate(Sum("count", alias_name="count"))
        .to_pandas()
    )
    qs = [0.1, 0.5, 0.9, 0.99]
    vals = histogram_quantiles(merged, qs, lo=lo, hi=hi)
    return pa.table(
        {
            "quantile": pa.array(qs, type=pa.float64()),
            "value": pa.array(vals, type=pa.float64()),
        }
    )


@query(
    "frequent_tokens",
    sql="""
SELECT tok AS token, CAST(COUNT(*) AS BIGINT) AS count
FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
GROUP BY tok ORDER BY count DESC, token LIMIT 32
""",
)
def frequent_tokens(sf_dir: str) -> pa.Table:
    """Misra-Gries frequent-items sketch over the corpus token stream:
    per-batch bounded counter summaries (the combiner), merged driver-side,
    exact-recount verification of the surviving candidates via one
    broadcast semi-filtered aggregation. Guarantees: every token with
    frequency > N/k survives; reported counts are exact (recounted).

    The exact-recount of a candidate superset of the true top-32 makes
    the OUTPUT exact and deterministic (ties broken by token asc), so
    the oracle is the plain exact top-k SQL — the sketch only bounds the
    candidate set; it never changes the answer (the MG survival
    guarantee holds with 2x margin: 64 candidates for a top-32)."""
    from ocr_ray.functions.sketch import misra_gries_partial

    from ray.data.aggregate import Sum

    ds = read_docs(sf_dir, columns=["text"])
    # distributed partial merge: driver input bounded by surviving-candidate
    # cardinality (tokens that appear in ANY batch summary), not batch count.
    from ocr_ray.functions.relational import bucketed_aggregate

    merged = bucketed_aggregate(
        ds.map_batches(misra_gries_partial, batch_format="pyarrow"),
        keys=["token"],
        aggs={"count": ("count", "sum")},
    ).to_pandas()
    cand = merged.set_index("token")["count"].nlargest(64)
    cand_ref = ray.put(sorted(cand.index))

    class Recount:
        def __init__(self, ref):
            self.keys = pa.array(ray.get(ref), type=pa.string())

        def __call__(self, t: pa.Table) -> pa.Table:
            toks = pc.split_pattern(t["text"], " ")
            flat = pc.list_flatten(
                toks if not isinstance(toks, pa.ChunkedArray) else toks.combine_chunks()
            )
            hit = flat.filter(pc.is_in(flat, value_set=self.keys))
            vc = hit.value_counts()  # Arrow kernel, no Python rows
            return pa.table(
                {
                    "token": pc.struct_field(vc, "values"),
                    "count": pc.cast(pc.struct_field(vc, "counts"), pa.int64()),
                }
            )

    recount = Recount(cand_ref)

    exact = (
        ds.map_batches(recount, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("count", alias_name="count"))
        .to_pandas()
        .sort_values(["count", "token"], ascending=[False, True])
        .head(32)
    )
    return pa.table(
        {
            "token": pa.array(exact["token"], type=pa.string()),
            "count": pa.array(exact["count"].to_numpy(dtype=np.int64)),
        }
    )


@query(
    "approx_distinct_users",
    sql="""
WITH base AS (SELECT DISTINCT event_type, user_id FROM events),
h0 AS (SELECT event_type, CAST(user_id AS UBIGINT) AS x FROM base),
h1 AS (SELECT * EXCLUDE (x), xor(x, x >> 30) AS x FROM h0),
h2 AS (SELECT * EXCLUDE (x), CAST((
    CAST(x % 4294967296 AS HUGEINT) * '13787848793156543929'::HUGEINT
    + (CAST(x // 4294967296 AS HUGEINT) * '13787848793156543929'::HUGEINT % 4294967296) * 4294967296
  ) % '18446744073709551616'::HUGEINT AS UBIGINT) AS x FROM h1),
h3 AS (SELECT * EXCLUDE (x), xor(x, x >> 27) AS x FROM h2),
h4 AS (SELECT * EXCLUDE (x), CAST((
    CAST(x % 4294967296 AS HUGEINT) * '10723151780598845931'::HUGEINT
    + (CAST(x // 4294967296 AS HUGEINT) * '10723151780598845931'::HUGEINT % 4294967296) * 4294967296
  ) % '18446744073709551616'::HUGEINT AS UBIGINT) AS x FROM h3),
h5 AS (SELECT * EXCLUDE (x), xor(x, x >> 31) AS h FROM h4),
rr AS (SELECT event_type,
         CAST(h >> 56 AS BIGINT) AS register,
         CASE WHEN CAST(h % 72057594037927936 AS BIGINT) = 0 THEN 57
              ELSE 1 + CAST(floor(log2(CAST(
                 CAST(h % 72057594037927936 AS BIGINT)
                 & (-CAST(h % 72057594037927936 AS BIGINT)) AS DOUBLE))) AS BIGINT)
         END AS rho
       FROM h5),
m AS (SELECT event_type, register, MAX(rho) AS rho FROM rr GROUP BY 1, 2),
agg AS (SELECT event_type,
          CAST(SUM(1::BIGINT << (57 - rho)) AS HUGEINT) AS s_present,
          COUNT(*) AS n_present
        FROM m GROUP BY 1),
e2 AS (SELECT event_type,
   256 - n_present AS zeros,
   0.7213 / (1 + 1.079 / 256) * 65536 * 144115188075855872
     / CAST(s_present + CAST(256 - n_present AS HUGEINT)
            * '144115188075855872'::HUGEINT AS DOUBLE) AS raw
 FROM agg)
SELECT event_type,
  CAST(floor(CASE WHEN raw <= 640.0 AND zeros > 0
                  THEN 256 * ln(256.0 / zeros) ELSE raw END + 0.5) AS BIGINT)
    AS approx_users
FROM e2
""",
)
def approx_distinct_users(sf_dir: str) -> pa.Table:
    """HyperLogLog approximate COUNT(DISTINCT user_id) per event_type:
    per-batch partial registers (the combiner), one tiny groupby on
    (event_type, register), integer-exact register merge + linear-counting
    correction. ORACLE-CHECKED BIT-EXACT: the estimator itself is
    deterministic arithmetic — splitmix64 (HUGEINT split-multiply SQL),
    register = top-8 bits, rho = first set bit of the low 56, and the
    harmonic denominator as ONE exact integer sum of 2^(57-rho), so the
    DuckDB oracle reproduces the estimate to the last bit, not just
    within error bounds (accuracy vs exact is asserted in tests too)."""
    from ocr_ray.functions.sketch import hll_estimate, hll_partial_registers

    ds = read_table(sf_dir, "events", columns=["event_type", "user_id"])
    partials = ds.map_batches(hll_partial_registers, batch_format="pyarrow")

    from ray.data.aggregate import Max

    merged = (
        partials.groupby(["event_type", "register"])
        .aggregate(Max("rho", alias_name="rho"))
        .to_pandas()
    )
    out = hll_estimate(merged)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], type=pa.string()),
            "approx_users": pa.array(out["approx_users"], type=pa.int64()),
        }
    )




@query(
    "events_hopping_window",
    sql="""
WITH g AS (
  SELECT time_bucket(INTERVAL '15 minutes', ts) AS tb, event_type FROM events
),
x AS (
  SELECT tb - unnest([0, 1, 2, 3]) * INTERVAL '15 minutes' AS ws, event_type FROM g
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events
FROM x GROUP BY ws, event_type
""",
)
def events_hopping_window(sf_dir: str) -> ray.data.Dataset:
    """HOPPING-window event counts: 60-minute windows advancing every 15
    minutes, so each event lands in exactly 4 overlapping windows — the
    sliding-window aggregate a streaming pipeline computes continuously,
    expressed batch-style. Window assignment is pure vectorized integer
    arithmetic on the epoch-microsecond column (floor to the hop grid,
    emit the 4 covering window starts); per-batch partial counts combine
    before ONE bucketed fold keyed on (window, type) — window cardinality
    scales with the time range, so ``Dataset.aggregate`` is avoided."""
    from ocr_ray.functions.relational import bucketed_aggregate

    HOP_US = 15 * 60 * 1_000_000
    HOPS_PER_WINDOW = 4

    ds = read_table(sf_dir, "events", columns=["ts", "event_type"])

    def assign(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        tb = (us // HOP_US) * HOP_US
        n = len(us)
        starts = np.repeat(tb, HOPS_PER_WINDOW) - np.tile(
            np.arange(HOPS_PER_WINDOW, dtype=np.int64) * HOP_US, n
        )
        et = t["event_type"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {"ws": starts, "event_type": np.repeat(et, HOPS_PER_WINDOW)}
        )
        red = df.groupby(["ws", "event_type"], as_index=False).size()
        return pa.table(
            {
                "ws": pa.array(red["ws"].to_numpy(dtype=np.int64)),
                "event_type": pa.array(red["event_type"], type=pa.string()),
                "n_events": pa.array(red["size"].to_numpy(dtype=np.int64)),
            }
        )

    agg = bucketed_aggregate(
        ds.map_batches(assign, batch_format="pyarrow"),
        keys=["ws", "event_type"],
        aggs={"n_events": ("n_events", "sum")},
    )

    def finalize(t: pa.Table) -> pa.Table:
        ws = t["ws"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        label = np.char.replace(np.datetime_as_string(ws, unit="s"), "T", " ")
        return pa.table(
            {
                "window_start": pa.array(label, type=pa.string()),
                "event_type": t["event_type"],
                "n_events": t["n_events"],
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


@query(
    "skew_profile_custkey",
    sql="""
WITH c AS (SELECT o_custkey AS key, CAST(COUNT(*) AS BIGINT) AS n
           FROM orders GROUP BY o_custkey),
t AS (SELECT SUM(n) AS total FROM c)
SELECT key, n, CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS share
FROM c, t ORDER BY n DESC, key LIMIT 20
""",
)
def skew_profile_custkey(sf_dir: str) -> ray.data.Dataset:
    """Pre-flight skew diagnostics (``functions/skew.key_skew_profile``):
    exact top-20 hottest customer keys with their global row share — the
    measurement a pipeline runs BEFORE committing a groupby/join
    partitioning on an unknown key (a share near or above 1/buckets
    flags a straggler bucket; the fix is salting or star-reduction).
    One scan, one bucketed count fold, per-bucket top-k, k-row driver
    merge."""
    from ocr_ray.functions.skew import key_skew_profile

    ds = read_table(sf_dir, "orders", columns=["o_custkey"])
    return key_skew_profile(ds, key="o_custkey", top_k=20)


@query(
    "mad_robust_stats_events",
    sql="""
WITH m AS (
  SELECT event_type, median(value) AS med, COUNT(value) AS n_values
  FROM events GROUP BY event_type
),
d AS (
  SELECT e.event_type, ABS(e.value - m.med) AS dev
  FROM events e JOIN m USING (event_type) WHERE e.value IS NOT NULL
),
md AS (SELECT event_type, median(dev) AS mad FROM d GROUP BY event_type)
SELECT m.event_type, CAST(m.med AS DOUBLE) AS median_value,
  CAST(md.mad AS DOUBLE) AS mad, CAST(m.n_values AS BIGINT) AS n_values
FROM m JOIN md USING (event_type)
""",
)
def mad_robust_stats_events(sf_dir: str) -> pa.Table:
    """Robust dispersion (median absolute deviation) — the outlier-proof
    sibling of ``zscore_outliers_events``: TWO chained holistic aggregates,
    each via the distributed histogram-selection primitive (no task ever
    holds a whole group): (1) per-type exact median; (2) the tiny
    per-type median table broadcasts, a stateless map derives
    ``|value - med|``, and a SECOND histogram selection takes the
    median of deviations. Both selections use the barrier-free
    bit-pattern binning, so the whole query is FOUR passes (was six:
    a min/max barrier per selection plus one up front — the VERDICT-r3
    chained-selection pass cut). Floats only in the derived subtraction
    (same op order as SQL), so both medians compare bit-exact."""
    from ocr_ray.functions.relational import broadcast
    from ocr_ray.functions.sketch import grouped_exact_median

    ds = read_table(sf_dir, "events", columns=["event_type", "value"])
    med = grouped_exact_median(ds, group_col="event_type", value_col="value")
    med_ref = broadcast(dict(zip(med["event_type"], med["median"])))

    def deviations(t: pa.Table) -> pa.Table:
        meds = ray.get(med_ref)
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        # dict lookup once per DISTINCT event_type, numpy gather per row
        col = t["event_type"]
        enc = (
            col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        ).dictionary_encode()
        lut = np.array(
            [meds.get(s, np.nan) for s in enc.dictionary.to_pylist()] + [np.nan],
            dtype=np.float64,
        )
        # null event_type -> sentinel index -> NaN (filtered below), the
        # tolerance the replaced pandas .map had
        idx = pc.fill_null(enc.indices, len(lut) - 1).to_numpy(zero_copy_only=False)
        m = lut[idx.astype(np.int64)]
        ok = np.isfinite(v)
        return pa.table(
            {
                "event_type": t["event_type"].filter(pa.array(ok)),
                "dev": pa.array(np.abs(v - m)[ok]),
            }
        )

    mad = grouped_exact_median(
        ds.map_batches(deviations, batch_format="pyarrow"),
        group_col="event_type",
        value_col="dev",
    )
    joined = med.merge(mad, on="event_type", suffixes=("", "_mad")).sort_values(
        "event_type", ignore_index=True
    )
    return pa.table(
        {
            "event_type": pa.array(joined["event_type"], type=pa.string()),
            "median_value": pa.array(joined["median"].to_numpy(dtype=np.float64)),
            "mad": pa.array(joined["median_mad"].to_numpy(dtype=np.float64)),
            "n_values": pa.array(joined["n"].to_numpy(dtype=np.int64)),
        }
    )


@query(
    "orders_grouping_sets",
    sql="""
SELECT COALESCE(CAST(year(o_orderdate) AS VARCHAR), 'ALL') AS yr,
  COALESCE(o_orderstatus, 'ALL') AS status,
  COALESCE(o_orderpriority, 'ALL') AS priority,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY GROUPING SETS ((year(o_orderdate), o_orderstatus),
                        (o_orderstatus, o_orderpriority), (year(o_orderdate)))
""",
)
def orders_grouping_sets(sf_dir: str) -> ray.data.Dataset:
    """GROUPING SETS (the general form ROLLUP/CUBE specialize): three
    arbitrary grouping combinations — (yr, status), (status, priority),
    (yr) — answered by ONE fine-grained distributed groupby over the
    union of all referenced dimensions, with every requested set folded
    from that tiny finest level driver-side. One pass over the data for
    any number of sets, the same partial+final idiom as ROLLUP/CUBE."""
    ds = read_table(
        sf_dir,
        "orders",
        columns=["o_orderdate", "o_orderstatus", "o_orderpriority", "o_totalprice"],
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "yr": pc.cast(pc.year(t["o_orderdate"]), pa.string()),
                "status": t["o_orderstatus"],
                "priority": t["o_orderpriority"],
                "price_c": to_units(t["o_totalprice"]),
            }
        )

    from ocr_ray.pipelines.queries._shared import mapside_count_sum

    fine = (
        mapside_count_sum(
            ds.map_batches(prep, batch_format="pyarrow"),
            keys=["yr", "status", "priority"],
            sum_cols=["price_c"],
        )
        .to_pandas()
        .rename(columns={"n": "n_orders"})
    )

    def fold(keep: list[str]) -> pd.DataFrame:
        out = fine.groupby(keep, as_index=False)[["n_orders", "price_c"]].sum()
        for col in ("yr", "status", "priority"):
            if col not in keep:
                out[col] = "ALL"
        return out

    allv = pd.concat(
        [fold(["yr", "status"]), fold(["status", "priority"]), fold(["yr"])],
        ignore_index=True,
    )
    return pa.table(
        {
            "yr": pa.array(allv["yr"], type=pa.string()),
            "status": pa.array(allv["status"], type=pa.string()),
            "priority": pa.array(allv["priority"], type=pa.string()),
            "n_orders": pa.array(allv["n_orders"].to_numpy(dtype=np.int64)),
            "total_price": pa.array(units_to_double(allv["price_c"], 2)),
        }
    )


@query(
    "events_watermarked_window",
    sql="""
WITH wm AS (
  SELECT MAX(ts) - INTERVAL 10 MINUTE AS watermark FROM events
),
w AS (
  SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS win_start,
         event_type, value, ts
  FROM events WHERE ts IS NOT NULL
)
SELECT w.win_start, w.event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(w.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
  CAST(w.win_start + INTERVAL 5 MINUTE <= (SELECT watermark FROM wm) AS BOOLEAN)
    AS is_final
FROM w GROUP BY w.win_start, w.event_type
""",
)
def events_watermarked_window(sf_dir: str) -> ray.data.Dataset:
    """WATERMARK semantics over tumbling windows — the batch statement of
    the streaming contract: windows whose end precedes the watermark
    (max event time - 10 min lateness bound) are FINAL (a streaming run
    may emit and drop their state); later windows are still OPEN. One
    cheap max-ts aggregate broadcasts as the watermark scalar; window
    assignment + integer-unit sums stay one distributed groupby. The
    is_final flag is part of the oracle hash, so the
    watermark arithmetic (bucket end vs bound) is pinned bit-exactly."""
    from ray.data.aggregate import Max

    ds = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])
    wm = ds.aggregate(Max("ts"))["max(ts)"]
    FIVE_MIN = 300_000_000  # microseconds
    watermark_us = int(pd.Timestamp(wm).value // 1000) - 600_000_000

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["ts"]))
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        win = (us // FIVE_MIN) * FIVE_MIN
        tbl = pa.table(
            {
                "win_us": pa.array(win),
                "event_type": t["event_type"],
                "value_c": to_units(t["value"]),
            }
        )
        part = tbl.group_by(["win_us", "event_type"]).aggregate(
            [([], "count_all"), ("value_c", "sum"), ("value_c", "count")]
        )
        return pa.table(
            {
                "win_us": part["win_us"],
                "event_type": part["event_type"],
                "n_events": part["count_all"],
                "value_c": part["value_c_sum"],
                "n_valid": part["value_c_count"],  # see tumbling note
            }
        )

    from ocr_ray.functions.relational import bucketed_aggregate

    agg = bucketed_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"),
        keys=["win_us", "event_type"],
        aggs={
            "n_events": ("n_events", "sum"),
            "value_c": ("value_c", "sum"),
            "n_valid": ("n_valid", "sum"),
        },
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        win_us = df["win_us"].to_numpy(dtype=np.int64)
        sv = units_to_double(df["value_c"], 2)
        sv = np.where(df["n_valid"].to_numpy(dtype=np.int64) == 0, np.nan, sv)
        return pd.DataFrame(
            {
                "win_start": pd.to_datetime(win_us, unit="us"),
                "event_type": df["event_type"],
                "n_events": df["n_events"].astype(np.int64),
                "sum_value": sv,
                "is_final": (win_us + FIVE_MIN) <= watermark_us,
            }
        )

    return agg.map_batches(finalize, batch_format="pandas")


@query(
    "countmin_user_events",
    sql="""
WITH seeds(d, s) AS (VALUES
  (0, 0::UBIGINT),
  (1, '11400714819323198485'::UBIGINT),
  (2, '14029467366897019727'::UBIGINT),
  (3, '1609587929392839161'::UBIGINT)),
du AS (SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL),
x0 AS (SELECT user_id, d, xor(CAST(user_id AS UBIGINT), s) AS x FROM du, seeds),
x1 AS (SELECT * EXCLUDE (x), xor(x, x >> 30) AS x FROM x0),
x2 AS (SELECT * EXCLUDE (x), CAST((
    CAST(x % 4294967296 AS HUGEINT) * '13787848793156543929'::HUGEINT
    + (CAST(x // 4294967296 AS HUGEINT) * '13787848793156543929'::HUGEINT % 4294967296) * 4294967296
  ) % '18446744073709551616'::HUGEINT AS UBIGINT) AS x FROM x1),
x3 AS (SELECT * EXCLUDE (x), xor(x, x >> 27) AS x FROM x2),
x4 AS (SELECT * EXCLUDE (x), CAST((
    CAST(x % 4294967296 AS HUGEINT) * '10723151780598845931'::HUGEINT
    + (CAST(x // 4294967296 AS HUGEINT) * '10723151780598845931'::HUGEINT % 4294967296) * 4294967296
  ) % '18446744073709551616'::HUGEINT AS UBIGINT) AS x FROM x3),
x5 AS (SELECT * EXCLUDE (x), xor(x, x >> 31) AS h FROM x4),
slotmap AS (SELECT user_id, d, CAST(h % 1024 AS BIGINT) AS w FROM x5),
cnt AS (SELECT user_id, COUNT(*) AS c FROM events
        WHERE user_id IS NOT NULL GROUP BY user_id),
counters AS (
  SELECT m.d, m.w, SUM(c.c) AS cnt
  FROM slotmap m JOIN cnt c USING (user_id) GROUP BY 1, 2),
top AS (SELECT user_id, c AS exact_count FROM cnt
        ORDER BY c DESC, user_id LIMIT 20),
est AS (
  SELECT t.user_id, t.exact_count, MIN(co.cnt) AS cm
  FROM top t JOIN slotmap m USING (user_id)
  JOIN counters co ON co.d = m.d AND co.w = m.w
  GROUP BY 1, 2)
SELECT user_id, CAST(exact_count AS BIGINT) AS exact_count,
  CAST(cm AS BIGINT) AS cm_estimate
FROM est
""",
)
def countmin_user_events(sf_dir: str) -> pa.Table:
    """Count-Min sketch (depth 4 x width 1024) of per-user event counts,
    reported for the exact top-20 users next to their true counts — the
    mergeable frequency sketch a streaming pipeline keeps when exact
    per-key counters don't fit.

    Distributed shape: ONE pass of per-batch partial counter matrices
    (``cm_partial`` — nonzero (slot, count) rows, so the shuffle carries
    <= 4096 rows per batch regardless of batch size), merged by a tiny
    bucketed slot-sum; the 32 KB merged matrix and the exact top-20
    (bucketed per-user fold + per-block partial top-k) resolve
    driver-side. ORACLE-CHECKED BIT-EXACT, not bound-checked: the sketch
    is deterministic integer arithmetic — splitmix64 rows seeded by XOR
    constants, counter sums, min-over-rows — all reproduced in HUGEINT
    SQL, so a hash, merge, or min bug changes the value hash. The
    eps-delta overestimate guarantee (estimate >= exact, within eN at
    the chosen width) is asserted in tests/test_sketch_cm.py."""
    from ocr_ray.functions.relational import bucketed_aggregate
    from ocr_ray.functions.sketch import CM_DEPTH, CM_WIDTH, cm_estimate, cm_partial

    ds = read_table(sf_dir, "events", columns=["user_id"])

    def valid(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t["user_id"]))

    clean = ds.map_batches(valid, batch_format="pyarrow")

    merged = bucketed_aggregate(
        clean.map_batches(
            lambda t: cm_partial(t, key_col="user_id"), batch_format="pyarrow"
        ),
        keys=["slot"],
        aggs={"count": ("count", "sum")},
    ).to_pandas()  # <= CM_DEPTH * CM_WIDTH rows, bounded
    counters = np.zeros(CM_DEPTH * CM_WIDTH, dtype=np.int64)
    counters[merged["slot"].to_numpy(dtype=np.int64)] = merged["count"].to_numpy(
        dtype=np.int64
    )

    per_user = bucketed_aggregate(
        clean, keys=["user_id"], aggs={"c": ("user_id", "size")}
    )

    def local_top(t: pa.Table) -> pa.Table:
        out = arrow_topk(t, [("c", "descending"), ("user_id", "ascending")], 20)
        return pa.table(
            {
                "user_id": pc.cast(out["user_id"], pa.int64()),
                "c": pc.cast(out["c"], pa.int64()),
            }
        )

    top = (
        per_user.map_batches(local_top, batch_format="pyarrow")
        .sort(["c", "user_id"], descending=[True, False])
        .limit(20)
        .to_pandas()
    )
    users = top["user_id"].to_numpy(dtype=np.int64)
    return pa.table(
        {
            "user_id": pa.array(users),
            "exact_count": pa.array(top["c"].to_numpy(dtype=np.int64)),
            "cm_estimate": pa.array(cm_estimate(counters, users)),
        }
    )


@query(
    "approx_common_users",
    sql="""
WITH h0 AS (SELECT DISTINCT event_type, CAST(user_id AS UBIGINT) AS x
            FROM events WHERE user_id IS NOT NULL),
h1 AS (SELECT * EXCLUDE (x), xor(x, x >> 30) AS x FROM h0),
h2 AS (SELECT * EXCLUDE (x), CAST((
    CAST(x % 4294967296 AS HUGEINT) * '13787848793156543929'::HUGEINT
    + (CAST(x // 4294967296 AS HUGEINT) * '13787848793156543929'::HUGEINT % 4294967296) * 4294967296
  ) % '18446744073709551616'::HUGEINT AS UBIGINT) AS x FROM h1),
h3 AS (SELECT * EXCLUDE (x), xor(x, x >> 27) AS x FROM h2),
h4 AS (SELECT * EXCLUDE (x), CAST((
    CAST(x % 4294967296 AS HUGEINT) * '10723151780598845931'::HUGEINT
    + (CAST(x // 4294967296 AS HUGEINT) * '10723151780598845931'::HUGEINT % 4294967296) * 4294967296
  ) % '18446744073709551616'::HUGEINT AS UBIGINT) AS x FROM h3),
h5 AS (SELECT * EXCLUDE (x), xor(x, x >> 31) AS h FROM h4),
rr AS (SELECT event_type,
         CAST(h >> 56 AS BIGINT) AS register,
         CASE WHEN CAST(h % 72057594037927936 AS BIGINT) = 0 THEN 57
              ELSE 1 + CAST(floor(log2(CAST(
                 CAST(h % 72057594037927936 AS BIGINT)
                 & (-CAST(h % 72057594037927936 AS BIGINT)) AS DOUBLE))) AS BIGINT)
         END AS rho
       FROM h5),
m AS (SELECT event_type, register, MAX(rho) AS rho FROM rr GROUP BY 1, 2),
types AS (SELECT DISTINCT event_type FROM events),
sets AS (
  SELECT a.event_type AS ta, b.event_type AS tb
  FROM types a JOIN types b ON a.event_type < b.event_type
  UNION ALL
  SELECT event_type, event_type FROM types
),
mu AS (
  SELECT s.ta, s.tb, m.register, MAX(m.rho) AS rho
  FROM sets s JOIN m ON m.event_type IN (s.ta, s.tb)
  GROUP BY 1, 2, 3
),
agg AS (SELECT ta, tb,
          CAST(SUM(1::BIGINT << (57 - rho)) AS HUGEINT) AS s_present,
          COUNT(*) AS n_present
        FROM mu GROUP BY 1, 2),
e2 AS (SELECT ta, tb,
   256 - n_present AS zeros,
   0.7213 / (1 + 1.079 / 256) * 65536 * 144115188075855872
     / CAST(s_present + CAST(256 - n_present AS HUGEINT)
            * '144115188075855872'::HUGEINT AS DOUBLE) AS raw
 FROM agg),
estu AS (SELECT ta, tb,
  CAST(floor(CASE WHEN raw <= 640.0 AND zeros > 0
                  THEN 256 * ln(256.0 / zeros) ELSE raw END + 0.5) AS BIGINT)
    AS approx
 FROM e2)
SELECT p.ta AS type_a, p.tb AS type_b,
  ea.approx AS approx_a, eb.approx AS approx_b, eu.approx AS approx_union,
  ea.approx + eb.approx - eu.approx AS approx_common
FROM (SELECT ta, tb FROM sets WHERE ta < tb) p
JOIN estu eu ON eu.ta = p.ta AND eu.tb = p.tb
JOIN estu ea ON ea.ta = p.ta AND ea.tb = p.ta
JOIN estu eb ON eb.ta = p.tb AND eb.tb = p.tb
""",
)
def approx_common_users(sf_dir: str) -> pa.Table:
    """HLL SET OPERATIONS: approximate distinct users per event-type
    PAIR — union by elementwise register max (the one set operation HLL
    supports natively) and intersection by inclusion-exclusion
    (|A∩B| ≈ est(A) + est(B) − est(A∪B)) — the sketch algebra an
    engagement-overlap dashboard runs when exact pairwise distincts
    are too expensive.

    Distribution: the SAME one-pass per-batch register partials as
    ``approx_distinct_users`` (combiner shuffles <= types x 256 rows per
    batch), one tiny (type, register) groupby-max; all 15 set unions
    and estimates fold driver-side from the 5 x 256 register table —
    nothing about the pair count touches the corpus again. Bit-exact
    oracle: register merge is integer max, the harmonic denominator an
    exact dyadic-rational sum, and inclusion-exclusion integer
    subtraction, so DuckDB reproduces every estimate to the last bit
    (accuracy vs exact overlap asserted in tests/test_sketch_cm.py)."""
    from ocr_ray.functions.sketch import hll_estimate, hll_partial_registers

    ds = read_table(sf_dir, "events", columns=["event_type", "user_id"])
    partials = ds.map_batches(hll_partial_registers, batch_format="pyarrow")

    from ray.data.aggregate import Max

    merged = (
        partials.groupby(["event_type", "register"])
        .aggregate(Max("rho", alias_name="rho"))
        .to_pandas()
    )
    types = sorted(merged["event_type"].unique())
    frames = [merged]
    for i, a in enumerate(types):
        for b in types[i + 1 :]:
            u = (
                merged[merged["event_type"].isin([a, b])]
                .groupby("register", as_index=False)["rho"]
                .max()
            )
            u["event_type"] = f"{a}|{b}"
            frames.append(u[["event_type", "register", "rho"]])
    est = hll_estimate(pd.concat(frames, ignore_index=True))
    lut = dict(zip(est["event_type"], est["approx_users"]))

    rows = []
    for i, a in enumerate(types):
        for b in types[i + 1 :]:
            ea, eb, eu = lut[a], lut[b], lut[f"{a}|{b}"]
            rows.append((a, b, ea, eb, eu, ea + eb - eu))
    out = pd.DataFrame(
        rows,
        columns=[
            "type_a",
            "type_b",
            "approx_a",
            "approx_b",
            "approx_union",
            "approx_common",
        ],
    )
    return pa.table(
        {
            "type_a": pa.array(out["type_a"], type=pa.string()),
            "type_b": pa.array(out["type_b"], type=pa.string()),
            "approx_a": pa.array(out["approx_a"].to_numpy(dtype=np.int64)),
            "approx_b": pa.array(out["approx_b"].to_numpy(dtype=np.int64)),
            "approx_union": pa.array(out["approx_union"].to_numpy(dtype=np.int64)),
            "approx_common": pa.array(out["approx_common"].to_numpy(dtype=np.int64)),
        }
    )
