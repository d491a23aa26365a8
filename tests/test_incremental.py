"""Incremental near-dup CLUSTERING against a persisted index: the folded
(old labels + cross/new edges) assignment must be byte-identical to
re-clustering the tagged union corpus flat — the supernode identity the
module docstring states."""

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa

from data_dedup_ray.corpus import web_pages
from data_dedup_ray.pipelines import incremental, index, near, snapshots

SF = "/root/testdata/sf0.001"
STORE = "/tmp/test_incr_clusters_store"


def _tagged_union():
    def tag(prefix):
        def fn(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return pa.table({
                "url": pc.binary_join_element_wise(
                    pa.scalar(prefix),
                    t["url"].combine_chunks().cast(pa.string()), ""),
                "text": t["text"].combine_chunks().cast(pa.string()),
            })
        return fn

    idx = web_pages(SF).select_columns(["url", "text"]).map_batches(
        tag("i|"), batch_format="pyarrow")
    new = snapshots.snapshot2(SF).select_columns(["url", "text"]).map_batches(
        tag("n|"), batch_format="pyarrow")
    return idx.union(new)


def _build(new_ds):
    shutil.rmtree(STORE, ignore_errors=True)
    index.build_shingle_store(web_pages(SF), STORE)
    old = near.minhash_dedup_clusters(web_pages(SF), threshold=0.7)
    res = incremental.incremental_near_dup_clusters(
        new_ds, STORE, old, threshold=0.7)
    return (res.to_pandas().sort_values(["side", "url"])
            .reset_index(drop=True)), old


def test_incremental_equals_flat_reclustering():
    got, _ = _build(snapshots.snapshot2(SF))
    flat = near.minhash_dedup_clusters(
        _tagged_union(), threshold=0.7).to_pandas()
    flat["u"] = flat["url"].str[2:]
    flat["cid"] = flat.groupby("cluster_id")["u"].transform("min")
    flat["side"] = np.where(flat["url"].str[:1] == "i", "index", "new")
    exp = (flat[["side", "u", "cid"]]
           .rename(columns={"u": "url", "cid": "cluster_id"})
           .sort_values(["side", "url"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)
    # the fold actually merged something across sides: at least one new
    # page shares a cluster with an index page
    merged = got.groupby("cluster_id")["side"].nunique()
    assert (merged > 1).any()


def test_incremental_empty_new_crawl_keeps_old_labels():
    got, old = _build(snapshots.snapshot2(SF).limit(0))
    assert (got["side"] == "index").all()
    exp = (old.to_pandas().sort_values("url").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["url", "cluster_id"]].reset_index(drop=True), exp)


def test_rolling_three_crawls_equals_flat_union():
    """Two successive folds (s2 then s3), each seeing history only via
    persisted stores + the previous label table, equal flat clustering
    of the tagged 3-crawl union."""
    import duckdb

    from data_dedup_ray.pipelines.incremental import (
        rolling_incremental_clusters, rolling_incremental_clusters_sql)

    root = "/tmp/test_roll_store"
    shutil.rmtree(root, ignore_errors=True)
    got = rolling_incremental_clusters(
        [("s1", web_pages(SF)), ("s2", snapshots.snapshot2(SF)),
         ("s3", snapshots.snapshot3(SF))], root, threshold=0.7,
    ).to_pandas().sort_values(["crawl", "url"]).reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    exp = con.execute(rolling_incremental_clusters_sql(0.7)).df(
    ).sort_values(["crawl", "url"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype(str), exp.astype(str))
    # a cluster actually spans all three crawls (doc_id % 15 == 0 urls
    # recur in s2 and s3)
    spans = got.groupby("cluster_id")["crawl"].nunique()
    assert (spans == 3).any()
    # append-only store layout: one directory per crawl
    assert sorted(os.listdir(root)) == ["crawl=s1", "crawl=s2", "crawl=s3"]
