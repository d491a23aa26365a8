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


def test_max_df_drops_hot_shingle_candidates(ray_session):
    """A ubiquitous shingle (df over the cap) must stop generating
    candidates: pairs connected ONLY through it vanish, pairs sharing
    rare shingles keep their exact Jaccard — the 100 TB guard against
    boilerplate fan-out."""
    import ray.data

    common = "alpha beta gamma delta epsilon"       # shared by ALL docs
    rare = "zeta eta theta iota kappa"              # docs 0 and 1 only
    rows = []
    for i in range(6):
        body = common + f" filler{i} " + " ".join(
            f"tok{i}x{j}" for j in range(8))
        if i in (0, 1):
            body += " " + rare
        rows.append({"url": f"https://site0.example/p/{i}",
                     "text": body})
    pages = ray.data.from_items(rows)

    exact = related.similar_docs_topk(
        "", every=1, topk=5, _pages=pages).to_pandas()
    capped = related.similar_docs_topk(
        "", every=1, topk=5, max_df=3, _pages=pages).to_pandas()

    # every doc shares the common shingle → exact mode links everything
    assert set(exact["query_url"]) == {r["url"] for r in rows}
    # the common shingle has df=6 > 3; the rare one df=2 ≤ 3
    key = ["query_url", "neighbor_url"]
    exact_pairs = set(map(tuple, exact[key].to_numpy()))
    capped_pairs = set(map(tuple, capped[key].to_numpy()))
    assert capped_pairs < exact_pairs
    assert ("https://site0.example/p/0",
            "https://site0.example/p/1") in capped_pairs
    # only-hot-shingle links are gone
    assert ("https://site0.example/p/2",
            "https://site0.example/p/3") not in capped_pairs
    # surviving pairs keep the exact score (verify uses full sets)
    m = exact.merge(capped, on=key, suffixes=("_e", "_c"))
    assert (m["jaccard_bp_e"] == m["jaccard_bp_c"]).all()
