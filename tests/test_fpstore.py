"""Tiny-fingerprint stores (32 B content sha / 8 B SimHash per doc):
SQL parity for both incremental ops, brute-force parity for the fast
hash, store layout + lineage."""

import json
import os
import shutil

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from data_dedup_ray.corpus import web_pages
from data_dedup_ray.pipelines import fpstore, snapshots
from data_dedup_ray.stages.simhash import popcount64, simhash_batch

SF = "/root/testdata/sf0.001"
HASH_STORE = "/tmp/test_fp_hash_store"
SIM_STORE = "/tmp/test_fp_sim_store"
SIM_STORE_SHA = "/tmp/test_fp_sim_store_sha"


def _con():
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    return con


def test_incremental_new_content_matches_sql():
    shutil.rmtree(HASH_STORE, ignore_errors=True)
    fpstore.build_content_hash_store(web_pages(SF), HASH_STORE)
    got = fpstore.incremental_new_content(
        snapshots.snapshot2(SF), HASH_STORE
    ).to_pandas().sort_values("url").reset_index(drop=True)
    exp = _con().execute(fpstore.incremental_new_content_sql()).df(
    ).sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype(str), exp.astype(str))
    assert len(got) > 0


def test_incremental_simhash_sha_matches_sql():
    shutil.rmtree(SIM_STORE_SHA, ignore_errors=True)
    fpstore.build_simhash_store(web_pages(SF), SIM_STORE_SHA,
                                hash_fn="sha")
    got = fpstore.incremental_simhash_pairs(
        snapshots.snapshot2(SF), SIM_STORE_SHA, hash_fn="sha"
    ).to_pandas().sort_values(["new_url", "index_url"]
                              ).reset_index(drop=True)
    exp = _con().execute(fpstore.incremental_simhash_pairs_sql()).df(
    ).sort_values(["new_url", "index_url"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype(str), exp.astype(str))
    assert len(got) > 0


def test_incremental_simhash_fast_matches_brute_force():
    shutil.rmtree(SIM_STORE, ignore_errors=True)
    fpstore.build_simhash_store(web_pages(SF), SIM_STORE)
    got = fpstore.incremental_simhash_pairs(
        snapshots.snapshot2(SF), SIM_STORE).to_pandas()
    wp = web_pages(SF).to_pandas()
    s2 = snapshots.snapshot2(SF).to_pandas()
    fpi, hi = simhash_batch(wp["text"].tolist())
    fpn, hn = simhash_batch(s2["text"].tolist())
    ui = wp["url"].to_numpy(dtype=object)[hi]
    un = s2["url"].to_numpy(dtype=object)[hn]
    hd = popcount64(fpn[:, None] ^ fpi[None, :])
    ii, jj = np.nonzero(hd <= 3)
    exp = pd.DataFrame({"new_url": un[ii], "index_url": ui[jj],
                        "hamming": hd[ii, jj].astype(np.int64)})
    key = ["new_url", "index_url"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        exp.sort_values(key).reset_index(drop=True))
    # byte-identical recrawls are hamming-0 with their own url
    planted = s2.loc[s2["inode_id"] % 6 == 0, "url"]
    zero = got[(got["hamming"] == 0) & (got["new_url"] == got["index_url"])]
    assert set(planted) <= set(zero["new_url"])


def test_store_layout_and_lineage():
    assert os.path.isdir(HASH_STORE) and os.path.isdir(SIM_STORE)
    p = [d for d in os.listdir(HASH_STORE) if d.startswith("part=")][0]
    meta = json.load(open(os.path.join(HASH_STORE, p, "_META.json")))
    assert meta["config"]["kind"] == "content_hash_store"
    t = pq.read_table(os.path.join(HASH_STORE, p, "data.parquet"))
    assert set(t.column_names) == {"url", "sha"}
    assert all(len(s) == 64 for s in t["sha"].to_pylist())
    p = [d for d in os.listdir(SIM_STORE) if d.startswith("part=")][0]
    meta = json.load(open(os.path.join(SIM_STORE, p, "_META.json")))
    assert meta["config"] == {"kind": "simhash_store", "hash_fn": "fast",
                              "id_col": "url"}
    t = pq.read_table(os.path.join(SIM_STORE, p, "data.parquet"))
    # 8 bytes of similarity state per doc
    assert set(t.column_names) == {"url", "fp"}
    assert t["fp"].type == "int64"
