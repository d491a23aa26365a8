"""Token-budget corpus mixing: oracle parity, budget adherence, and
sample-stability laws."""

import duckdb
import pandas as pd

from data_dedup_ray.pipelines import mixing

SF = "/root/testdata/sf0.001"


def _got(budgets=None):
    return (mixing.mix_web_snapshots(SF, budgets).to_pandas()
            .sort_values(["source", "url"]).reset_index(drop=True))


def test_oracle_parity():
    got = _got()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = (con.execute(mixing.mix_web_snapshots_sql())
            .fetchdf().sort_values(["source", "url"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got, want.astype({"n_tokens": "int64"}))
    assert set(got["source"]) == {"web", "snap2"}


def test_budgets_hit_in_expectation():
    got = _got()
    per = got.groupby("source")["n_tokens"].sum()
    # hash sampling: within 3x of the requested budget at this scale
    for src, budget in mixing.DEFAULT_BUDGETS.items():
        assert budget / 3 <= per[src] <= budget * 3


def test_sample_is_monotone_in_budget():
    """A bigger budget strictly grows (never reshuffles) the kept set —
    the property that makes the hash rule resumable/stable."""
    small = _got({"web": 10_000, "snap2": 5_000})
    big = _got({"web": 60_000, "snap2": 30_000})
    small_keys = set(zip(small["source"], small["url"]))
    big_keys = set(zip(big["source"], big["url"]))
    assert small_keys < big_keys
