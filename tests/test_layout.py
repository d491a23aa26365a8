"""Similarity-ordered layout (pipelines/layout.py): position and
locality-metric oracle parity, the locality win itself, density laws,
partition invariance."""

import duckdb
import pandas as pd
import pytest

from data_dedup_ray.pipelines import layout

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    return c


def test_positions_oracle(con):
    got = layout.similarity_layout(SF).to_pandas().reset_index(drop=True)
    want = con.execute(layout.similarity_layout_sql()).fetchdf().astype(
        {"layout_pos": "int64"})
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))


def test_positions_dense_and_exact_copies_adjacent():
    got = layout.similarity_layout(SF).to_pandas()
    pos = sorted(got["layout_pos"])
    assert pos == list(range(len(got)))
    # byte-identical mirror/base pages share a fingerprint, so they
    # must occupy consecutive positions
    by_pos = got.sort_values("layout_pos")
    m = got[got["url"] == "https://mirror.example/p/0"]
    b = got[got["url"] == "https://site0.example/p/0"]
    gap = abs(int(m["layout_pos"].iloc[0]) - int(b["layout_pos"].iloc[0]))
    # other fp-identical family members may sit between them
    assert gap <= 3


def test_locality_oracle_and_win(con):
    got = layout.layout_locality(SF).to_pandas().reset_index(drop=True)
    want = con.execute(layout.layout_locality_sql()).fetchdf().astype(
        {"n_pairs": "int64", "mean_adj_jaccard_bp": "int64"})
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))
    sim = int(got.loc[got["ordering"] == "simhash",
                      "mean_adj_jaccard_bp"].iloc[0])
    url = int(got.loc[got["ordering"] == "url",
                      "mean_adj_jaccard_bp"].iloc[0])
    assert sim > 3 * url          # the layout must actually help


def test_partition_invariance():
    a = layout.similarity_layout(SF, num_partitions=3).to_pandas()
    b = layout.similarity_layout(SF, num_partitions=16).to_pandas()
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))
