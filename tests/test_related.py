"""Exact text-knn (pipelines/related.py): oracle parity, family
semantics, rank laws, partition invariance."""

import duckdb
import pandas as pd
import pytest

from data_dedup_ray.pipelines import related

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    return c


@pytest.mark.parametrize("topk,every", [(3, 50), (5, 100)])
def test_oracle_parity(con, topk, every):
    got = related.similar_docs_topk(SF, topk=topk, every=every) \
        .to_pandas().reset_index(drop=True)
    want = con.execute(related.similar_docs_topk_sql(
        topk=topk, every=every)).fetchdf().astype(
        {"jaccard_bp": "int64", "rank": "int64"})
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))


def test_rank_laws_and_family_semantics():
    got = related.similar_docs_topk(SF).to_pandas()
    # ranks dense 1..k per query, jaccard non-increasing within a query
    for _, g in got.groupby("query_url"):
        assert g["rank"].tolist() == list(range(1, len(g) + 1))
        assert (g["jaccard_bp"].diff().dropna() <= 0).all()
    # a query with a byte-identical mirror must rank it (or another
    # exact copy) first with jaccard 1.0
    q0 = got[got["query_url"] == "https://site0.example/p/0"]
    assert int(q0.iloc[0]["jaccard_bp"]) == 10000


def test_no_self_neighbors():
    got = related.similar_docs_topk(SF).to_pandas()
    assert (got["query_url"] != got["neighbor_url"]).all()


def test_partition_invariance():
    a = related.similar_docs_topk(SF, num_partitions=3).to_pandas()
    b = related.similar_docs_topk(SF, num_partitions=16).to_pandas()
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))
