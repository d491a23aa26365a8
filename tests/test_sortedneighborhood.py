"""Sorted-neighborhood blocking (pipelines/sortedneighborhood.py): rank
correctness vs SQL row_number, window-pair laws, oracle parity for both
passes, and partition/bound invariance."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data

from data_dedup_ray.pipelines import sortedneighborhood as sn

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    return c


def _bp(df: pd.DataFrame) -> pd.DataFrame:
    out = pd.DataFrame({
        "url_a": df["url_a"], "url_b": df["url_b"],
        "jaccard_bp": np.floor(df["jaccard"] * 10000).astype(np.int64)})
    return out.sort_values(["url_a", "url_b"]).reset_index(drop=True)


def test_ranks_match_sql_row_number(con):
    from data_dedup_ray.corpus import WEB_PAGES_CTE, web_pages
    got = (sn._rank_rows(web_pages(SF), key_len=24, num_partitions=5)
           .to_pandas().sort_values("url").reset_index(drop=True))
    want = con.execute(
        f"WITH {WEB_PAGES_CTE} SELECT url, CAST(row_number() OVER ("
        "ORDER BY substr(text, 1, 24), url) - 1 AS BIGINT) AS rank"
        " FROM web_pages ORDER BY url").fetchdf()
    pd.testing.assert_frame_equal(got, want)


def test_window_candidates_exact_set():
    """Candidates over dense ranks 0..n-1 = exactly the (b-a < w) pairs."""
    n, w = 57, 6
    ranked = ray.data.from_pandas(pd.DataFrame({
        "url": [f"u{i:03d}" for i in range(n)],
        "rank": np.arange(n, dtype=np.int64)}))
    got = sn._window_candidates(ranked, window=w, num_partitions=4
                                ).to_pandas()
    got_set = set(zip(got["url_a"], got["url_b"]))
    want = {(f"u{i:03d}", f"u{j:03d}")
            for i in range(n) for j in range(i + 1, min(i + w, n))}
    assert got_set == want
    assert len(got) == len(want)          # emitted exactly once each


@pytest.mark.parametrize("window,key_len,threshold",
                         [(10, 24, 0.5), (4, 12, 0.7)])
def test_pairs_oracle(con, window, key_len, threshold):
    got = _bp(sn.sorted_neighborhood_pairs(
        SF, window=window, key_len=key_len, threshold=threshold
    ).to_pandas())
    want = con.execute(sn.sorted_neighborhood_pairs_sql(
        window=window, key_len=key_len, threshold=threshold
    )).fetchdf().astype({"jaccard_bp": "int64"})
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))


def test_multipass_oracle(con):
    got = _bp(sn.snm_multipass_pairs(SF).to_pandas())
    want = con.execute(sn.snm_multipass_pairs_sql()).fetchdf().astype(
        {"jaccard_bp": "int64"})
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))


def test_multipass_superset_of_single_pass():
    single = _bp(sn.sorted_neighborhood_pairs(SF).to_pandas())
    multi = _bp(sn.snm_multipass_pairs(SF).to_pandas())
    s = set(zip(single["url_a"], single["url_b"]))
    m = set(zip(multi["url_a"], multi["url_b"]))
    assert s <= m and len(m) > len(s)     # suffix pass adds pairs here


def test_window_recall_oracle(con):
    got = sn.snm_window_recall(SF).to_pandas().reset_index(drop=True)
    want = con.execute(sn.snm_window_recall_sql()).fetchdf()
    pd.testing.assert_frame_equal(
        got, want.astype({c: "int64" for c in want.columns}))


def test_window_recall_monotone_and_consistent():
    df = sn.snm_window_recall(SF).to_pandas()
    assert (df["n_found"].diff().dropna() >= 0).all()
    assert (df["recall_bp"] == df["n_found"] * 10000 // df["n_truth"]).all()


def test_clusters_oracle(con):
    got = sn.snm_clusters(SF).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    want = con.execute(sn.snm_clusters_sql()).fetchdf() \
        .sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_clusters_label_propagation_fallback_matches_dsu():
    dsu = sn.snm_clusters(SF).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    lp = sn.snm_clusters(SF, dsu_max_edges=0).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(dsu, lp)


def test_partition_invariance():
    a = _bp(sn.sorted_neighborhood_pairs(SF, num_partitions=3).to_pandas())
    b = _bp(sn.sorted_neighborhood_pairs(SF, num_partitions=16).to_pandas())
    pd.testing.assert_frame_equal(a, b)


def test_window_recall_empty_truth_parity(con):
    """threshold above any possible Jaccard → empty truth set: BOTH
    sides must still emit one row per window with n_found = 0 and
    recall_bp = 0 (the SQL drives from wins, not a join against the
    empty gap table)."""
    got = (sn.snm_window_recall(SF, threshold=1.5)
           .to_pandas().reset_index(drop=True))
    want = con.execute(sn.snm_window_recall_sql(threshold=1.5)).fetchdf()
    pd.testing.assert_frame_equal(
        got, want.astype({c: "int64" for c in want.columns}))
    assert len(got) == 4
    assert (got["n_truth"] == 0).all()
    assert (got["recall_bp"] == 0).all()
