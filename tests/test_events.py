"""Temporal operators (pipelines/events.py) vs DuckDB oracles, plus
hand-built edge cases and determinism under different partition counts."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data

from data_dedup_ray import oracles
from data_dedup_ray.pipelines import events


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    c.execute(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    return c


def _cmp(got, want, keys):
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    g = got.sort_index(axis=1).sort_values(keys).reset_index(drop=True)
    w = want.sort_index(axis=1).sort_values(keys).reset_index(drop=True)
    assert list(g.columns) == list(w.columns)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_windowed_agg_oracle(sf_dir, con):
    _cmp(events.windowed_agg(events.read_events(sf_dir)),
         con.execute(oracles.windowed_agg_sql(3600)).fetchdf(),
         ["user_id", "window_start"])


def test_sessionize_oracle(sf_dir, con):
    _cmp(events.sessionize(events.read_events(sf_dir)),
         con.execute(oracles.sessionize_sql(1800)).fetchdf(),
         ["user_id", "session_idx"])


def test_asof_join_oracle(sf_dir, con):
    _cmp(events.asof_join(events.read_events(sf_dir)),
         con.execute(oracles.asof_join_sql("click", "view")).fetchdf(),
         ["event_id"])


def test_range_counts_oracle(sf_dir, con):
    _cmp(events.range_counts(events.read_events(sf_dir)),
         con.execute(oracles.range_counts_sql(3600)).fetchdf(),
         ["event_id"])


def test_top_k_oracle(sf_dir, con):
    _cmp(events.top_k_per_user(events.read_events(sf_dir)),
         con.execute(oracles.top_k_per_user_sql(3)).fetchdf(),
         ["user_id", "rnk"])


# --------------------------------------------------------------------------
# Hand-built edge cases (timestamps in μs via datetime64)
# --------------------------------------------------------------------------


def _mk(rows):
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value"])
    df["ts"] = pd.to_datetime(df["ts"], format="ISO8601").astype("datetime64[us]")
    return ray.data.from_pandas(df)


def test_sessionize_gap_boundary(ray_session):
    # gaps of exactly gap_s do NOT split; gap_s + 1μs does
    t0 = "2024-01-01 00:00:00"
    ds = _mk([
        (1, t0, 7, "view", 1.0),
        (2, "2024-01-01 00:30:00", 7, "view", 1.0),       # gap == 1800s
        (3, "2024-01-01 01:00:00.000001", 7, "view", 1.0),  # gap > 1800s
        (4, t0, 8, "view", 1.0),                           # other user
    ])
    out = events.sessionize(ds, gap_s=1800).to_pandas() \
        .sort_values(["user_id", "session_idx"]).reset_index(drop=True)
    assert out[out.user_id == 7]["n_events"].tolist() == [2, 1]
    assert out[out.user_id == 7]["session_idx"].tolist() == [1, 2]
    assert out[out.user_id == 7]["duration_us"].tolist() == [1800_000_000, 0]
    assert out[out.user_id == 8]["n_events"].tolist() == [1]


def test_asof_join_picks_latest_prior(ray_session):
    ds = _mk([
        (1, "2024-01-01 00:00:00", 7, "view", 1.0),
        (2, "2024-01-01 00:10:00", 7, "view", 1.0),
        (3, "2024-01-01 00:10:00", 7, "click", 1.0),  # ties with view 2
        (4, "2024-01-01 00:05:00", 8, "click", 1.0),  # no prior view
        (5, "2024-01-01 00:20:00", 8, "view", 1.0),
        (6, "2024-01-01 00:25:00", 8, "click", 1.0),
    ])
    out = events.asof_join(ds).to_pandas().set_index("event_id")
    assert out.loc[3, "matched_event_id"] == 2  # at-or-before includes ties
    assert out.loc[3, "lag_us"] == 0
    assert 4 not in out.index  # inner join: unmatched click dropped
    assert out.loc[6, "matched_event_id"] == 5
    assert out.loc[6, "lag_us"] == 300_000_000


def test_range_counts_window_bounds(ray_session):
    # window is [ts - w, ts): event exactly w before counts, itself doesn't
    ds = _mk([
        (1, "2024-01-01 00:00:00", 7, "view", 1.0),
        (2, "2024-01-01 01:00:00", 7, "view", 1.0),  # 1 in window (ev 1)
        (3, "2024-01-01 02:00:00", 7, "view", 1.0),
        (4, "2024-01-01 00:30:00", 9, "view", 1.0),  # other user isolated
    ])
    out = events.range_counts(ds, window_s=3600).to_pandas() \
        .set_index("event_id")["n_prev"]
    assert out.loc[1] == 0
    assert out.loc[2] == 1  # ev1 at exactly ts-1h is included
    assert out.loc[3] == 1  # ev2 at boundary in, ev1 (2h before) out
    assert out.loc[4] == 0


def test_windowed_agg_exact_cents(ray_session):
    ds = _mk([
        (1, "2024-01-01 00:59:59", 7, "view", 0.1),
        (2, "2024-01-01 00:00:00", 7, "view", 0.2),
        (3, "2024-01-01 01:00:00", 7, "view", 5.0),  # next window
    ])
    out = events.windowed_agg(ds, window_s=3600).to_pandas() \
        .sort_values("window_start").reset_index(drop=True)
    assert out["n_events"].tolist() == [2, 1]
    # 0.1 + 0.2 in cents is exactly 30 (float sum would give 0.30000000000000004)
    assert out["sum_value_cents"].tolist() == [30, 500]


def test_top_k_ties_and_short_groups(ray_session):
    ds = _mk([
        (5, "2024-01-01 00:00:00", 7, "view", 2.0),
        (3, "2024-01-01 00:01:00", 7, "view", 2.0),  # tie → lower event_id first
        (9, "2024-01-01 00:02:00", 7, "view", 9.0),
        (1, "2024-01-01 00:03:00", 7, "view", 1.0),
        (2, "2024-01-01 00:00:00", 8, "view", 4.0),  # group smaller than k
    ])
    out = events.top_k_per_user(ds, k=3).to_pandas() \
        .sort_values(["user_id", "rnk"]).reset_index(drop=True)
    u7 = out[out.user_id == 7]
    assert u7["event_id"].tolist() == [9, 3, 5]
    assert u7["rnk"].tolist() == [1, 2, 3]
    assert out[out.user_id == 8]["event_id"].tolist() == [2]


def test_partition_count_invariance(sf_dir):
    """Results are identical at P=4 and P=32 (determinism under
    re-partitioning — SURVEY.md §7.4)."""
    ds = events.read_events(sf_dir)
    for fn in [events.windowed_agg, events.sessionize, events.asof_join,
               events.range_counts, events.top_k_per_user]:
        a = fn(ds, num_partitions=4).to_pandas()
        b = fn(ds, num_partitions=32).to_pandas()
        cols = list(a.columns)
        a = a.sort_values(cols).reset_index(drop=True)
        b = b.sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


def test_dedup_events_windowed_oracle(sf_dir, con):
    got = events.dedup_events_windowed(events.read_events(sf_dir)).to_pandas()
    want = con.execute(events.dedup_events_windowed_sql()).fetchdf()
    g = got.sort_index(axis=1).sort_values("event_id").reset_index(drop=True)
    w = want.sort_index(axis=1).sort_values("event_id").reset_index(drop=True)
    assert list(g.columns) == list(w.columns)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_dedup_events_windowed_one_per_key(sf_dir):
    got = events.dedup_events_windowed(events.read_events(sf_dir)).to_pandas()
    assert not got.duplicated(
        ["user_id", "event_type", "window_start"]
    ).any()
    # survivors are a subset of the events and every key is covered
    all_ev = events.read_events(sf_dir).to_pandas()
    all_ev["window_start"] = (
        all_ev["ts"].astype("int64") // 10**6 // 3600 * 3600
    )
    n_keys = all_ev.groupby(
        ["user_id", "event_type", "window_start"]
    ).ngroups
    assert len(got) == n_keys


def test_range_counts_equal_timestamp_ties(ray_session):
    # SQL counts e2.ts < e.ts STRICTLY: equal-ts same-user events must not
    # count each other, regardless of their arbitrary sort order
    t0 = "2024-01-01 00:10:00"
    ds = _mk([
        (1, t0, 7, "view", 1.0),
        (2, t0, 7, "view", 1.0),
        (3, t0, 7, "view", 1.0),
        (4, "2024-01-01 00:40:00", 7, "view", 1.0),
        (5, "2024-01-01 00:00:00", 7, "view", 1.0),  # 10 min before ties
    ])
    out = events.range_counts(ds, window_s=3600).to_pandas() \
        .set_index("event_id")["n_prev"]
    assert out.loc[1] == 1 and out.loc[2] == 1 and out.loc[3] == 1
    assert out.loc[4] == 4
    assert out.loc[5] == 0


def test_range_counts_boundary_ties(ray_session):
    # two events exactly window_s before: both at the CLOSED lower bound
    ds = _mk([
        (1, "2024-01-01 00:00:00", 7, "view", 1.0),
        (2, "2024-01-01 00:00:00", 7, "view", 1.0),
        (3, "2024-01-01 01:00:00", 7, "view", 1.0),
        (4, "2023-12-31 23:59:59", 7, "view", 1.0),  # 1s outside for ev3
    ])
    out = events.range_counts(ds, window_s=3600).to_pandas() \
        .set_index("event_id")["n_prev"]
    assert out.loc[3] == 2  # evs 1,2 included at ts-w, ev4 excluded


def test_cents_half_away_from_zero(ray_session):
    # 0.125*100 == 12.5 exactly in binary; DuckDB round() is half-away
    # (→ ±13) while np.rint is half-to-even (→ ±12)
    ds = _mk([
        (1, "2024-01-01 00:00:00", 7, "view", 0.125),
        (2, "2024-01-01 00:00:00", 8, "view", -0.125),
    ])
    out = events.windowed_agg(ds, window_s=3600).to_pandas() \
        .set_index("user_id")["sum_value_cents"]
    assert out.loc[7] == 13 and out.loc[8] == -13
