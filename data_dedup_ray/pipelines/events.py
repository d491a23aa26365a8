"""Temporal / relational operators over the ``events`` table.

The reference has no time-based operators (SURVEY.md §2.6: no joins, no
windows) — these are the training-data-pipeline extensions the north_rule
calls for where Ray Data lacks a built-in: windowed aggregate, gap
sessionization, as-of join, range join, grouped top-k (custom-operator
option (a): compositions of ``map_batches`` + one keyed exchange).

Scale plan shared by every operator here
----------------------------------------
- ONE wide data movement each: a ``hash_exchange`` keyed on the user id
  (``engine/exchange.py`` — co-location without sorting).  Event-time
  order is NOT assumed of the input; each partition sorts only its own
  rows (per-user order is total once users are co-located).
- Vectorized prep in ``map_batches(batch_format="pyarrow")``: timestamps
  become int64 epoch-μs columns, money becomes int64 cents (exact sums —
  float accumulation order would make results nondeterministic under
  re-partitioning).
- Map-side combiners (``pre``) wherever the op is algebraic: windowed
  counts/sums combine partial rows, top-k prunes to k rows per user per
  split group — the shuffle moves aggregates, not events.
- Skew: the exchange key is the user id, so one pathological user lands
  in one partition.  Every per-partition kernel is O(rows log rows)
  (sort + linear scans), never O(rows²), so hot users degrade linearly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from data_dedup_ray.engine.exchange import hash_exchange

_US_PER_S = 1_000_000
#: splitmix64-style multiplier — decorrelates sequential user ids from
#: the partition index (plain ``user % P`` would stripe synthetic ids)
_HASH_K = np.uint64(0x9E3779B97F4A7C15)


def read_events(sf_dir: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """The ``events`` table with column pruning at the read."""
    return ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


def _user_part(user: np.ndarray, P: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        h = user.astype(np.uint64) * _HASH_K
    return (h % np.uint64(P)).astype(np.int64)


def _ts_us(t: pa.Table, col: str = "ts") -> np.ndarray:
    return t[col].combine_chunks().cast(pa.int64()).to_numpy()


def _cents(t: pa.Table, col: str = "value") -> np.ndarray:
    # exact int money: avoids order-dependent float-sum drift AND matches
    # the SQL oracle's round(value*100) bit-for-bit.  DuckDB round() is
    # half-AWAY-from-zero, so np.rint (half-to-even) would diverge on any
    # exact-.5 product — use pyarrow's half_towards_infinity mode.
    return (
        pc.round(pc.multiply(t[col], 100.0),
                 round_mode="half_towards_infinity")
        .cast(pa.int64())
        .to_numpy(zero_copy_only=False)
    )


# --------------------------------------------------------------------------
# Tumbling windowed aggregate
# --------------------------------------------------------------------------


def windowed_agg(
    events: ray.data.Dataset,
    *,
    window_s: int = 3600,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Per-(user, tumbling window) event count + exact value sum.

    ``(user_id, window_start, n_events, sum_value_cents)`` where
    ``window_start`` is the window's epoch-second origin.  Counts/sums are
    algebraic, so the map-side ``pre`` combiner collapses each split group
    to one partial row per (user, window) — the shuffle volume is bounded
    by the number of ACTIVE windows, not the event count (SURVEY.md §4:
    pre-aggregate before the wide step).
    """
    P = num_partitions
    win_us = window_s * _US_PER_S

    def prep(t: pa.Table) -> pa.Table:
        user = t["user_id"].to_numpy(zero_copy_only=False)
        win = (_ts_us(t) // win_us) * window_s
        return pa.table({
            "user_id": pa.array(user),
            "window_start": pa.array(win),
            "cents": pa.array(_cents(t)),
            "_part": pa.array(_user_part(user, P)),
        })

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id", "window_start", "_part"]).aggregate(
            [("cents", "sum"), ("cents", "count")]
        )
        return g.rename_columns(
            ["user_id", "window_start", "_part", "cents", "n"]
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby(["user_id", "window_start"], sort=False, as_index=False)
            .agg(n_events=("n", "sum"), sum_value_cents=("cents", "sum"))
        )
        return out[["user_id", "window_start", "n_events", "sum_value_cents"]]

    prepped = events.map_batches(prep, batch_format="pyarrow")
    part_schema = pa.schema([
        ("user_id", pa.int64()), ("window_start", pa.int64()),
        ("cents", pa.int64()), ("n", pa.int64()),
    ])
    return hash_exchange(
        [prepped],
        final,
        num_partitions=P,
        schema=pa.schema([
            ("user_id", pa.int64()), ("window_start", pa.int64()),
            ("n_events", pa.int64()), ("sum_value_cents", pa.int64()),
        ]),
        in_schemas=[part_schema],
        pre=[combine],
    )


# --------------------------------------------------------------------------
# Gap-based sessionization
# --------------------------------------------------------------------------


def sessionize(
    events: ray.data.Dataset,
    *,
    gap_s: int = 1800,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Split each user's event stream into sessions at gaps > ``gap_s``.

    Returns ``(user_id, session_idx, n_events, duration_us)`` — one row
    per session, ``session_idx`` 1-based in time order.  A stateful
    streaming op in most engines; here each user's whole timeline
    co-locates in one partition, so session boundaries are a vectorized
    diff + cumsum (no cross-partition watermark state needed — event time
    is bounded per input, the batch analog of a closed window).
    """
    P = num_partitions
    gap_us = gap_s * _US_PER_S

    def prep(t: pa.Table) -> pa.Table:
        user = t["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": pa.array(user),
            "ts_us": pa.array(_ts_us(t)),
            "_part": pa.array(_user_part(user, P)),
        })

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "session_idx", "n_events", "duration_us"]
        if not len(g):
            return pd.DataFrame({c: pd.Series(dtype=np.int64) for c in cols})
        order = np.lexsort((g["ts_us"].to_numpy(), g["user_id"].to_numpy()))
        user = g["user_id"].to_numpy()[order]
        ts = g["ts_us"].to_numpy()[order]
        n = len(user)
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = user[1:] != user[:-1]
        gap = np.empty(n, dtype=np.int64)
        gap[0] = 0
        gap[1:] = ts[1:] - ts[:-1]
        brk = new_user | (gap > gap_us)
        sid = np.cumsum(brk)  # global session counter across the partition
        # per-user 1-based index: subtract the user's first session id
        first_sid = np.maximum.accumulate(np.where(new_user, sid, 0))
        sess_idx = sid - first_sid + 1
        df = pd.DataFrame({"user_id": user, "session_idx": sess_idx, "ts": ts})
        out = (
            df.groupby(["user_id", "session_idx"], sort=False, as_index=False)
            .agg(n_events=("ts", "size"), t0=("ts", "min"), t1=("ts", "max"))
        )
        out["duration_us"] = out["t1"] - out["t0"]
        return out[cols]

    prepped = events.map_batches(prep, batch_format="pyarrow")
    return hash_exchange(
        [prepped],
        per_part,
        num_partitions=P,
        schema=pa.schema([
            ("user_id", pa.int64()), ("session_idx", pa.int64()),
            ("n_events", pa.int64()), ("duration_us", pa.int64()),
        ]),
        in_schemas=[pa.schema([("user_id", pa.int64()),
                               ("ts_us", pa.int64())])],
    )


# --------------------------------------------------------------------------
# As-of join (event attribution)
# --------------------------------------------------------------------------


def asof_join(
    events: ray.data.Dataset,
    *,
    left_type: str = "click",
    right_type: str = "view",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Match each ``left_type`` event to the latest same-user
    ``right_type`` event at-or-before it (inner as-of; unmatched dropped).

    ``(event_id, matched_event_id, lag_us)``.  Ray Data has no as-of
    join; this is the two-sided exchange composition: both filtered
    streams co-partition on ``hash(user) % P`` in ONE multi-input
    exchange round, then each partition runs one ``pd.merge_asof``
    (a sorted-merge — O(n log n) in the partition, no pairwise blowup).
    Partitioning assumption: a user's rows fit one partition (same as
    every keyed window op here).
    """
    P = num_partitions

    def side(evt_type: str):
        def fn(t: pa.Table) -> pa.Table:
            keep = pa.compute.equal(t["event_type"], evt_type)
            t = t.filter(keep)
            user = t["user_id"].to_numpy(zero_copy_only=False)
            return pa.table({
                "event_id": t["event_id"].combine_chunks(),
                "user_id": pa.array(user),
                "ts_us": pa.array(_ts_us(t)),
                "_part": pa.array(_user_part(user, P)),
            })
        return fn

    side_schema = pa.schema([
        ("event_id", pa.int64()), ("user_id", pa.int64()),
        ("ts_us", pa.int64()),
    ])

    def per_part(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        cols = ["event_id", "matched_event_id", "lag_us"]
        if not len(l) or not len(r):
            return pd.DataFrame({c: pd.Series(dtype=np.int64) for c in cols})
        l = l.sort_values("ts_us", kind="stable")
        r = r.sort_values("ts_us", kind="stable").rename(
            columns={"event_id": "matched_event_id", "ts_us": "ts_m"}
        )
        m = pd.merge_asof(
            l, r, left_on="ts_us", right_on="ts_m", by="user_id",
            direction="backward",
        )
        m = m[m["matched_event_id"].notna()]
        return pd.DataFrame({
            "event_id": m["event_id"].to_numpy(),
            "matched_event_id": m["matched_event_id"].astype(np.int64),
            "lag_us": (m["ts_us"] - m["ts_m"]).astype(np.int64),
        })

    left = events.map_batches(side(left_type), batch_format="pyarrow")
    right = events.map_batches(side(right_type), batch_format="pyarrow")
    return hash_exchange(
        [left, right],
        per_part,
        num_partitions=P,
        schema=pa.schema([
            ("event_id", pa.int64()), ("matched_event_id", pa.int64()),
            ("lag_us", pa.int64()),
        ]),
        in_schemas=[side_schema, side_schema],
    )


# --------------------------------------------------------------------------
# Range join (sliding-window count)
# --------------------------------------------------------------------------


def range_counts(
    events: ray.data.Dataset,
    *,
    window_s: int = 3600,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """For every event: how many same-user events fell in the preceding
    window ``[ts - window_s, ts)``.

    ``(event_id, n_prev)``.  A range join in disguise — implemented as
    rank arithmetic on the per-user sorted timeline (two sorted merges),
    NOT an interval product: ``n_prev = rank(ts) - #(events < ts - w)``,
    where the second term is one ``merge_asof`` of the shifted
    timestamps against the timeline.  O(n log n) per partition, immune
    to dense-burst skew that would blow up an interval join.
    """
    P = num_partitions
    win_us = window_s * _US_PER_S

    def prep(t: pa.Table) -> pa.Table:
        user = t["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_id": t["event_id"].combine_chunks(),
            "user_id": pa.array(user),
            "ts_us": pa.array(_ts_us(t)),
            "_part": pa.array(_user_part(user, P)),
        })

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        cols = ["event_id", "n_prev"]
        if not len(g):
            return pd.DataFrame({c: pd.Series(dtype=np.int64) for c in cols})
        order = np.lexsort((g["ts_us"].to_numpy(), g["user_id"].to_numpy()))
        user = g["user_id"].to_numpy()[order]
        ts = g["ts_us"].to_numpy()[order]
        eid = g["event_id"].to_numpy()[order]
        n = len(user)
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = user[1:] != user[:-1]
        starts = np.maximum.accumulate(
            np.where(new_user, np.arange(n), 0)
        )
        rank_pos = np.arange(n) - starts  # positional rank within user
        # strictly-before count must NOT count equal-timestamp events
        # that happen to sort earlier (SQL: e2.ts < e.ts excludes ties):
        # a run of equal (user, ts) rows all share the run-start's rank
        new_run = new_user.copy()
        new_run[1:] |= ts[1:] != ts[:-1]
        run_starts = np.maximum.accumulate(
            np.where(new_run, np.arange(n), 0)
        )
        rank_lt = run_starts - starts  # #(same-user events with ts' < ts)
        # merge_asof needs BOTH frames globally sorted on the `on` key
        # (the per-user split comes from `by=`, not from the sort)
        base = pd.DataFrame({"user_id": user, "ts_us": ts,
                             "rank": rank_pos}) \
            .sort_values("ts_us", kind="stable")
        q = pd.DataFrame({
            "user_id": user, "t": ts - win_us, "event_id": eid,
            "rank": rank_lt,
        }).sort_values("t", kind="stable")
        m = pd.merge_asof(
            q, base, left_on="t", right_on="ts_us", by="user_id",
            direction="backward", allow_exact_matches=False,
            suffixes=("", "_lo"),
        )
        # last base row with ts' < ts - w is positional, so its rank_pos
        # + 1 == #(ts' < ts - w) even when that ts' value is duplicated
        lower = m["rank_lo"].fillna(-1).to_numpy(dtype=np.int64) + 1
        return pd.DataFrame({
            "event_id": m["event_id"].to_numpy(),
            "n_prev": m["rank"].to_numpy(dtype=np.int64) - lower,
        })

    prepped = events.map_batches(prep, batch_format="pyarrow")
    return hash_exchange(
        [prepped],
        per_part,
        num_partitions=P,
        schema=pa.schema([("event_id", pa.int64()), ("n_prev", pa.int64())]),
        in_schemas=[pa.schema([
            ("event_id", pa.int64()), ("user_id", pa.int64()),
            ("ts_us", pa.int64()),
        ])],
    )


# --------------------------------------------------------------------------
# Grouped top-k
# --------------------------------------------------------------------------


def top_k_per_user(
    events: ray.data.Dataset,
    *,
    k: int = 3,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Each user's top-``k`` events by value (ties → lower event_id).

    ``(user_id, event_id, rnk, value_cents)``.  Top-k is algebraic, so
    the map-side ``pre`` combiner prunes every split group to ≤k rows per
    user BEFORE the shuffle — the exchange moves O(users·k), not O(events).
    """
    P = num_partitions

    def prep(t: pa.Table) -> pa.Table:
        user = t["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": pa.array(user),
            "event_id": t["event_id"].combine_chunks(),
            "value_cents": pa.array(_cents(t)),
            "_part": pa.array(_user_part(user, P)),
        })

    def _topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["user_id", "value_cents", "event_id"],
            ascending=[True, False, True], kind="stable",
        )
        return df.groupby("user_id", sort=False).head(k)

    def combine(t: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(
            _topk(t.to_pandas()), preserve_index=False
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "event_id", "rnk", "value_cents"]
        if not len(g):
            return pd.DataFrame({c: pd.Series(dtype=np.int64) for c in cols})
        top = _topk(g)
        top = top.assign(rnk=top.groupby("user_id", sort=False).cumcount() + 1)
        return top[cols]

    prepped = events.map_batches(prep, batch_format="pyarrow")
    return hash_exchange(
        [prepped],
        final,
        num_partitions=P,
        schema=pa.schema([
            ("user_id", pa.int64()), ("event_id", pa.int64()),
            ("rnk", pa.int64()), ("value_cents", pa.int64()),
        ]),
        in_schemas=[pa.schema([
            ("user_id", pa.int64()), ("event_id", pa.int64()),
            ("value_cents", pa.int64()),
        ])],
        pre=[combine],
    )


def dedup_events_windowed(
    events: ray.data.Dataset,
    *,
    window_s: int = 3600,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Streaming-style event dedup: ONE surviving event per ``(user_id,
    event_type, tumbling window)`` — the earliest, ties broken by
    ``event_id``.  ``(event_id, user_id, event_type, window_start)``.

    This is the dedup engine's semantics applied to an event stream
    (retries / double-fires collapse to the first occurrence), the
    windowed analogue of exact.collapse_identity.  Keep-first is
    algebraic, so the map-side ``pre`` combiner keeps one row per key per
    split group and the shuffle moves survivors, not events."""
    P = num_partitions

    def prep(t: pa.Table) -> pa.Table:
        user = t["user_id"].to_numpy(zero_copy_only=False)
        ts = _ts_us(t)
        win = (ts // (window_s * _US_PER_S)) * window_s
        return pa.table({
            "event_id": t["event_id"].combine_chunks(),
            "user_id": pa.array(user),
            "event_type": t["event_type"].combine_chunks(),
            "window_start": pa.array(win),
            "ts_us": pa.array(ts),
            "_part": pa.array(_user_part(user, P)),
        })

    def _first(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["user_id", "event_type", "window_start", "ts_us", "event_id"],
            kind="stable",
        )
        return df.groupby(
            ["user_id", "event_type", "window_start"], sort=False
        ).head(1)

    def combine(t: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(_first(t.to_pandas()),
                                    preserve_index=False)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = _first(df)
        return out[["event_id", "user_id", "event_type", "window_start"]]

    part_schema = pa.schema([
        ("event_id", pa.int64()), ("user_id", pa.int64()),
        ("event_type", pa.string()), ("window_start", pa.int64()),
        ("ts_us", pa.int64()),
    ])
    return hash_exchange(
        [events.map_batches(prep, batch_format="pyarrow")],
        final,
        num_partitions=P,
        schema=pa.schema([
            ("event_id", pa.int64()), ("user_id", pa.int64()),
            ("event_type", pa.string()), ("window_start", pa.int64()),
        ]),
        in_schemas=[part_schema],
        pre=[combine],
    )


def dedup_events_windowed_sql(window_s: int = 3600) -> str:
    return f"""
SELECT event_id, user_id, event_type, window_start FROM (
  SELECT event_id, user_id, event_type,
         (epoch_us(ts) // ({window_s} * CAST(1000000 AS BIGINT))) * {window_s}
           AS window_start,
         row_number() OVER (
           PARTITION BY user_id, event_type,
                        epoch_us(ts) // ({window_s} * CAST(1000000 AS BIGINT))
           ORDER BY ts, event_id) AS rn
  FROM events)
WHERE rn = 1"""
