"""Query registry section: per-key time-series state machines.

These are the operators whose per-row value depends RECURSIVELY on the
previous row of the same key in time order — the per-key state a
streaming job carries between events. The distributed shape is the
sessionization idiom (hash-bucket by key, one shuffle, a vectorized
in-bucket pass), but the in-bucket body is a *recurrence*, vectorized
ACROSS groups per time step instead of across rows: step ``t`` updates
every group's ``t``-th row with one fused numpy expression, so the loop
length is the longest group (tens), not the row count (billions at
100 TB). The oracles are recursive CTEs performing the IDENTICAL IEEE
double operation sequence row by row — the halving recurrence uses only
one rounding addition and an exact division by two per step, so the
engine and DuckDB produce bit-identical doubles and the value hash is
exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ocr_ray.pipelines.queries._shared import arrow_out, query
from ocr_ray.sizing import buckets_for_input
from ocr_ray.sources import read_table


@query(
    "ewma_customer_orders",
    sql="""
WITH RECURSIVE o AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
           AS rn
  FROM orders
),
r AS (
  SELECT o_orderkey, o_custkey, rn, o_totalprice AS ewma FROM o WHERE rn = 1
  UNION ALL
  SELECT o.o_orderkey, o.o_custkey, o.rn, (o.o_totalprice + r.ewma) / 2
  FROM o JOIN r ON o.o_custkey = r.o_custkey AND o.rn = r.rn + 1
)
SELECT o_orderkey, o_custkey, CAST(rn AS BIGINT) AS rn, ewma FROM r
""",
)
def ewma_customer_orders(sf_dir: str) -> ray.data.Dataset:
    """Exponentially-weighted moving average of each customer's order
    totals over order-date order (alpha = 1/2): ``s_1 = x_1``,
    ``s_t = (x_t + s_{t-1}) / 2`` — the canonical per-key recursive
    feature a fraud/trend pipeline maintains per entity.

    Distribution: ONE hash-bucket shuffle on custkey, then a per-bucket
    body that sorts (custkey, date, orderkey) and runs the recurrence
    vectorized across groups — iteration ``t`` updates the ``t``-th row
    of every group at once (rows of a group are contiguous after the
    sort, so the predecessor is always ``idx - 1``), giving
    ``O(max_group_len)`` numpy steps per bucket. State never leaves the
    bucket; at 100 TB the only coordination is the one shuffle.

    Bit-exactness: alpha = 1/2 makes each step one rounding IEEE add and
    one exact halving, the same two ops the recursive-CTE oracle performs
    per row — no reassociation anywhere, so doubles match exactly.
    """
    ds = read_table(
        sf_dir,
        "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    NB = buckets_for_input(ds)
    out_schema = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("o_custkey", pa.int64()),
            ("rn", pa.int64()),
            ("ewma", pa.float64()),
        ]
    )

    def bucketize(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(t["o_custkey"].to_numpy(zero_copy_only=False))
        return t.append_column(
            "_bucket", pa.array((h % np.uint64(NB)).astype(np.int32))
        )

    def ewma_body(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return out_schema.empty_table()
        g = g.sort_values(
            ["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort"
        )
        cust = g["o_custkey"].to_numpy()
        x = g["o_totalprice"].to_numpy(dtype=np.float64)
        new_grp = np.empty(len(g), dtype=bool)
        new_grp[0] = True
        new_grp[1:] = cust[1:] != cust[:-1]
        # rn = position within group, 1-based
        idx_all = np.arange(len(g), dtype=np.int64)
        start_of_grp = np.maximum.accumulate(np.where(new_grp, idx_all, 0))
        rn = idx_all - start_of_grp + 1
        s = x.copy()
        max_rn = int(rn.max())
        for t in range(2, max_rn + 1):
            idx = np.flatnonzero(rn == t)
            if idx.size == 0:
                break
            # same two IEEE ops as the oracle's recursive step
            s[idx] = (x[idx] + s[idx - 1]) / 2
        return arrow_out(
            pd.DataFrame(
                {
                    "o_orderkey": g["o_orderkey"].to_numpy(),
                    "o_custkey": cust,
                    "rn": rn,
                    "ewma": s,
                }
            ),
            out_schema,
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(ewma_body, batch_format="pandas")
    )


@query(
    "locf_last_purchase",
    sql="""
SELECT user_id, event_id,
  last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
    OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    AS last_purchase_value
FROM events
""",
)
def locf_last_purchase(sf_dir: str) -> ray.data.Dataset:
    """Per-key LAST-OBSERVATION-CARRIED-FORWARD: every event annotated
    with the value of its user's most recent 'purchase' at or before it
    (NULL until the first purchase) — the gap-repair primitive feature
    stores run per entity, and the windowed form of an as-of self-join.

    Distribution: the sessionization idiom (one user-hash bucket
    shuffle, in-bucket sort), with the carry computed by ONE vectorized
    segment-scan — candidate indices encoded as
    ``group_rank * stride + local_index`` so a single global
    ``np.maximum.accumulate`` respects group boundaries (a decoded rank
    from another group means "no purchase yet"); no per-group loop, no
    cross-bucket state. The carried value is copied, never operated on,
    so floats compare bit-exact against the IGNORE NULLS window oracle.
    """
    ds = read_table(
        sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type", "value"]
    )

    NB = buckets_for_input(ds)
    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("event_id", pa.int64()),
            ("last_purchase_value", pa.float64()),
        ]
    )

    def bucketize(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(t["user_id"].to_numpy(zero_copy_only=False))
        return t.append_column(
            "_bucket", pa.array((h % np.uint64(NB)).astype(np.int32))
        )

    def locf_body(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return out_schema.empty_table()
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        val = g["value"].to_numpy(dtype=np.float64)
        is_p = g["event_type"].to_numpy() == "purchase"
        n = len(g)
        new_grp = np.empty(n, dtype=bool)
        new_grp[0] = True
        new_grp[1:] = uid[1:] != uid[:-1]
        grp_rank = np.cumsum(new_grp) - 1
        idx = np.arange(n, dtype=np.int64)
        start = np.maximum.accumulate(np.where(new_grp, idx, 0))
        local = idx - start
        stride = np.int64(n + 1)
        enc = grp_rank * stride + np.where(is_p, local + 1, 0)
        acc = np.maximum.accumulate(enc)
        have = (acc // stride == grp_rank) & (acc % stride > 0)
        src = start + (acc % stride) - 1  # row of the carried purchase
        out_val = np.where(have, val[np.clip(src, 0, n - 1)], np.nan)
        return pa.table(
            {
                "user_id": pa.array(uid, type=pa.int64()),
                "event_id": pa.array(
                    g["event_id"].to_numpy(dtype=np.int64)
                ),
                "last_purchase_value": pa.array(
                    out_val, type=pa.float64(), from_pandas=True
                ),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(locf_body, batch_format="pandas")
    )


@query(
    "cumulative_unique_users",
    sql="""
WITH first_seen AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS day FROM events
  WHERE user_id IS NOT NULL GROUP BY user_id
),
per_day AS (SELECT day, COUNT(*) AS n_new_users FROM first_seen GROUP BY day)
SELECT strftime(day, '%Y-%m-%d') AS day,
  CAST(n_new_users AS BIGINT) AS n_new_users,
  CAST(SUM(n_new_users) OVER (ORDER BY day
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    AS n_total_users
FROM per_day
""",
)
def cumulative_unique_users(sf_dir: str) -> pa.Table:
    """Cumulative DISTINCT users by day — the audience-growth curve
    (``COUNT(DISTINCT) OVER`` that SQL engines refuse to run directly):
    decomposed exactly into first-seen-day per user + a running sum.

    Distribution: one user-bucketed fold takes each user's min day (key
    cardinality = users, so the high-cardinality bucketed path); the
    per-day new-user counts that remain are bounded by the DATE SPINE
    (days, not users — a few thousand rows at any corpus size), so the
    running sum folds driver-side like the other spine-sized finals.
    All integers; bit-exact by construction."""
    from ocr_ray.functions.relational import bucketed_aggregate

    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pa.compute.is_valid(t["user_id"]))
        day = pa.compute.cast(
            pa.compute.floor_temporal(t["ts"], unit="day"), pa.date32()
        )
        return pa.table(
            {
                "user_id": pa.compute.cast(t["user_id"], pa.int64()),
                "day": pa.compute.cast(day, pa.int32()),
            }
        )

    first_seen = bucketed_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"),
        keys=["user_id"],
        aggs={"day": ("day", "min")},
    )

    def per_day_partial(t: pa.Table) -> pa.Table:
        d = t["day"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, counts = np.unique(d, return_counts=True)
        return pa.table(
            {
                "day": pa.array(uniq),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    # spine-sized (days) final: exact running sum driver-side
    from ray.data.aggregate import Sum

    per_day = (
        first_seen.map_batches(per_day_partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("n", alias_name="n_new_users"))
        .to_pandas()
        .sort_values("day", ignore_index=True)
    )
    days = pd.to_datetime(per_day["day"].to_numpy(dtype=np.int64), unit="D")
    new = per_day["n_new_users"].to_numpy(dtype=np.int64)
    return pa.table(
        {
            "day": pa.array(days.strftime("%Y-%m-%d"), type=pa.string()),
            "n_new_users": pa.array(new),
            "n_total_users": pa.array(np.cumsum(new)),
        }
    )


@query(
    "interval_coalesce_users",
    sql="""
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 1800000000 AS e
  FROM events WHERE user_id IS NOT NULL
),
w AS (
  SELECT user_id, s, e,
    MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_e
  FROM iv
),
f AS (
  SELECT user_id, s, e,
    CASE WHEN prev_max_e IS NULL OR s > prev_max_e THEN 1 ELSE 0 END AS brk
  FROM w
),
g AS (
  SELECT user_id, s, e,
    SUM(brk) OVER (PARTITION BY user_id ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM f
),
isl AS (
  SELECT user_id, island, MIN(s) AS lo, MAX(e) AS hi
  FROM g GROUP BY user_id, island
)
SELECT user_id, COUNT(*) AS n_intervals,
  CAST(SUM(hi - lo) AS BIGINT) AS covered_us
FROM isl GROUP BY user_id
""",
)
def interval_coalesce_users(sf_dir: str) -> ray.data.Dataset:
    """Interval COALESCING (gaps-and-islands with geometry): each event
    opens a 30-minute presence interval; overlapping intervals per user
    merge into maximal islands, and the output is each user's island
    count and total covered time — the utilization/uptime primitive
    that sessionization's activity-gap count cannot express (sessions
    count BREAKS; this measures COVERAGE).

    Distribution: the sessionization idiom (one user-hash bucket
    shuffle), with the in-bucket body fully vectorized: sort by
    (user, start) — intervals here are CONSTANT width, so interval end
    is non-decreasing within each user and the running max is the end
    column itself (variable-width intervals would need the encoded
    segment-scan used by ``locf_last_purchase``) — island breaks where
    start > previous end-so-far, per-island fold with ``reduceat``.
    Integer microseconds end to end — bit-exact vs the window-function
    oracle."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    NB = buckets_for_input(ds)
    HALF_HOUR = np.int64(1_800_000_000)
    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("n_intervals", pa.int64()),
            ("covered_us", pa.int64()),
        ]
    )

    def bucketize(t: pa.Table) -> pa.Table:
        # NULL user_ids would each become their own NaN group in pandas
        # (NaN != NaN) while SQL partitions them together — drop them on
        # both sides instead (the oracle filters identically)
        t = t.filter(pa.compute.is_valid(t["user_id"]))
        h = pd.util.hash_array(t["user_id"].to_numpy(zero_copy_only=False))
        return t.append_column(
            "_bucket", pa.array((h % np.uint64(NB)).astype(np.int32))
        )

    def coalesce_body(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return out_schema.empty_table()
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        s = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        e = s + HALF_HOUR
        n = len(g)
        new_grp = np.empty(n, dtype=bool)
        new_grp[0] = True
        new_grp[1:] = uid[1:] != uid[:-1]
        # running max of e within each user, EXCLUSIVE of the current row:
        # encode (group_rank, e) so one global accumulate respects groups
        # CONSTANT-width intervals: after the (user, start) sort, e is
        # non-decreasing within each user, so the inclusive running max
        # is e itself — no segment-scan needed (variable-width intervals
        # would need the encoded-accumulate trick used by locf)
        run_incl = e
        prev_max = np.empty(n, dtype=np.int64)
        prev_max[0] = 0
        prev_max[1:] = run_incl[:-1]
        brk = new_grp | (s > prev_max)
        island_starts = np.flatnonzero(brk)
        # per-island lo = s at island start; hi = running max at island end
        ends = np.concatenate([island_starts[1:] - 1, [n - 1]])
        lo = s[island_starts]
        hi = run_incl[ends]
        owner = uid[island_starts]
        # per-user fold over islands (islands are contiguous per user)
        u_starts = np.flatnonzero(np.concatenate([[True], owner[1:] != owner[:-1]]))
        n_iv = np.diff(np.concatenate([u_starts, [len(owner)]]))
        covered = np.add.reduceat(hi - lo, u_starts)
        return pa.table(
            {
                "user_id": pa.array(owner[u_starts].astype(np.int64)),
                "n_intervals": pa.array(n_iv.astype(np.int64)),
                "covered_us": pa.array(covered.astype(np.int64)),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(coalesce_body, batch_format="pandas")
    )


@query(
    "cusum_daily_value",
    sql="""
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
    SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS x_c
  FROM events GROUP BY 1, 2
),
drift AS (
  SELECT event_type, SUM(x_c) // COUNT(*) AS k_c FROM daily GROUP BY 1
),
seq AS (
  SELECT d.event_type, d.day, d.x_c, dr.k_c,
    row_number() OVER (PARTITION BY d.event_type ORDER BY d.day) AS rn
  FROM daily d JOIN drift dr USING (event_type)
),
r AS (
  SELECT event_type, day, x_c, rn,
    GREATEST(0, x_c - k_c) AS cusum_c
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.event_type, s.day, s.x_c, s.rn,
    GREATEST(0, r.cusum_c + s.x_c - s.k_c)
  FROM seq s JOIN r ON s.event_type = r.event_type AND s.rn = r.rn + 1
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
  CAST(x_c AS BIGINT) AS daily_c, CAST(cusum_c AS BIGINT) AS cusum_c
FROM r
""",
)
def cusum_daily_value(sf_dir: str) -> pa.Table:
    """CUSUM change-point statistic per event type — the classic
    drift detector a monitoring pipeline keeps per metric:
    ``s_t = max(0, s_{t-1} + (x_t - k))`` over the daily value series,
    with drift ``k`` = the type's integer mean daily total.

    Distribution: ONE distributed (type, day) aggregate in integer
    cents — the only pass that touches the corpus; what remains is
    SPINE-sized (types x days, thousands of rows at any corpus scale),
    so the per-type recurrence folds driver-side like the other
    spine-sized finals (documented bound, same as
    ``cumulative_unique_users``). All-integer recurrence — the
    recursive-CTE oracle reproduces it bit-for-bit."""
    from ray.data.aggregate import Sum

    from ocr_ray.functions.relational import to_units

    ds = read_table(sf_dir, "events", columns=["event_type", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        day = pa.compute.cast(
            pa.compute.floor_temporal(t["ts"], unit="day"), pa.date32()
        )
        tbl = pa.table(
            {
                "event_type": t["event_type"],
                "day": pa.compute.cast(day, pa.int32()),
                "x_c": to_units(t["value"]),
            }
        )
        # map-side combine: <= |types x days in batch| partial rows
        part = tbl.group_by(["event_type", "day"]).aggregate([("x_c", "sum")])
        return pa.table(
            {
                "event_type": part["event_type"],
                "day": part["day"],
                "x_c": part["x_c_sum"],
            }
        )

    daily = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(Sum("x_c", alias_name="x_c"))
        .to_pandas()
        .sort_values(["event_type", "day"], ignore_index=True)
    )
    if len(daily) == 0:
        return pa.schema(
            [
                ("event_type", pa.string()),
                ("day", pa.string()),
                ("daily_c", pa.int64()),
                ("cusum_c", pa.int64()),
            ]
        ).empty_table()
    x = daily["x_c"].to_numpy(dtype=np.int64)
    et = daily["event_type"].to_numpy()
    new_grp = np.concatenate([[True], et[1:] != et[:-1]])
    # per-type integer drift
    grp_id = np.cumsum(new_grp) - 1
    # DuckDB's // TRUNCATES toward zero; numpy's floors — match SQL
    # explicitly so a negative per-type total stays bit-exact
    def _trunc_div(a: int, b: int) -> int:
        q = abs(a) // b
        return q if a >= 0 else -q

    k_per_grp = np.array(
        [
            _trunc_div(int(x[grp_id == g].sum()), int((grp_id == g).sum()))
            for g in range(grp_id[-1] + 1)
        ],
        dtype=np.int64,
    )
    k = k_per_grp[grp_id]
    s = np.zeros(len(x), dtype=np.int64)
    for i in range(len(x)):
        prev = 0 if new_grp[i] else s[i - 1]
        v = prev + x[i] - k[i]
        s[i] = v if v > 0 else 0
    days = pd.to_datetime(daily["day"].to_numpy(dtype=np.int64), unit="D")
    return pa.table(
        {
            "event_type": pa.array(daily["event_type"], type=pa.string()),
            "day": pa.array(days.strftime("%Y-%m-%d"), type=pa.string()),
            "daily_c": pa.array(x),
            "cusum_c": pa.array(s),
        }
    )


@query(
    "capped_sessions",
    sql="""
WITH RECURSIVE seq AS (
  SELECT user_id, epoch_us(ts) AS t,
    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events WHERE user_id IS NOT NULL
),
r AS (
  SELECT user_id, rn, t, t AS sess_start FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.rn, s.t,
    CASE WHEN s.t - r.t <= 1800000000
          AND s.t - r.sess_start <= 7200000000
         THEN r.sess_start ELSE s.t END
  FROM seq s JOIN r ON s.user_id = r.user_id AND s.rn = r.rn + 1
)
SELECT user_id,
  CAST(COUNT(DISTINCT sess_start) AS BIGINT) AS n_sessions,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(MAX(t - sess_start) AS BIGINT) AS max_sess_span_us
FROM r GROUP BY user_id
""",
)
def capped_sessions(sf_dir: str) -> ray.data.Dataset:
    """DURATION-CAPPED sessionization (the analytics-suite rule
    ``user_sessions`` can't express): a session breaks on a 30-minute
    inactivity gap OR when it has lasted two hours since its start —
    the cap makes the boundary depend RECURSIVELY on the running
    session start, not just the previous event, so no window function
    computes it; it is a per-key state machine.

    Distribution: the sessionization idiom (one user-hash bucket
    shuffle), with the recurrence vectorized ACROSS users per event
    step (the EWMA pattern): step ``t`` resolves every user's ``t``-th
    event with one fused numpy expression, so the loop length is the
    busiest user's event count, not the row count. All integer
    microseconds — the recursive-CTE oracle replays the identical
    state machine bit-for-bit."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    NB = buckets_for_input(ds)
    GAP = np.int64(1_800_000_000)
    CAP = np.int64(7_200_000_000)
    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("n_sessions", pa.int64()),
            ("n_events", pa.int64()),
            ("max_sess_span_us", pa.int64()),
        ]
    )

    def bucketize(t: pa.Table) -> pa.Table:
        t = t.filter(pa.compute.is_valid(t["user_id"]))
        h = pd.util.hash_array(t["user_id"].to_numpy(zero_copy_only=False))
        return t.append_column(
            "_bucket", pa.array((h % np.uint64(NB)).astype(np.int32))
        )

    def sessions_body(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return out_schema.empty_table()
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        t = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        n = len(g)
        new_grp = np.empty(n, dtype=bool)
        new_grp[0] = True
        new_grp[1:] = uid[1:] != uid[:-1]
        idx_all = np.arange(n, dtype=np.int64)
        start_of_grp = np.maximum.accumulate(np.where(new_grp, idx_all, 0))
        rn = idx_all - start_of_grp  # 0-based position within user
        sess = t.copy()  # sess_start; first event of each user starts one
        max_rn = int(rn.max())
        for k in range(1, max_rn + 1):
            idx = np.flatnonzero(rn == k)
            if idx.size == 0:
                break
            prev = idx - 1
            cont = (t[idx] - t[prev] <= GAP) & (t[idx] - sess[prev] <= CAP)
            sess[idx] = np.where(cont, sess[prev], t[idx])
        # per-user fold: distinct session starts, events, max span
        brk = new_grp | (sess != np.concatenate([[0], sess[:-1]]))
        brk[new_grp] = True
        u_starts = np.flatnonzero(new_grp)
        n_events = np.diff(np.concatenate([u_starts, [n]]))
        n_sessions = np.add.reduceat(brk.astype(np.int64), u_starts)
        span = t - sess
        max_span = np.maximum.reduceat(span, u_starts)
        return pa.table(
            {
                "user_id": pa.array(uid[u_starts].astype(np.int64)),
                "n_sessions": pa.array(n_sessions),
                "n_events": pa.array(n_events),
                "max_sess_span_us": pa.array(max_span.astype(np.int64)),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(sessions_body, batch_format="pandas")
    )
