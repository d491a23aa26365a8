"""Persisted MinHash SIGNATURE store: constant 1 KB/doc incremental
state.  The sha-token-hash variant is pinned bit-for-bit against the
DuckDB restatement of the whole signature chain; the default-hash
variant is pinned against exact Jaccard (estimator error + planted
recall)."""

import json
import os
import shutil

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from data_dedup_ray.corpus import web_pages
from data_dedup_ray.pipelines import index, sigstore, snapshots

SF = "/root/testdata/sf0.001"
STORE = "/tmp/test_sig_store"
STORE_SHA = "/tmp/test_sig_store_sha"


def _ensure_store(path=STORE, token_hash=None):
    if not os.path.isdir(path):
        sigstore.build_signature_store(web_pages(SF), path,
                                       token_hash=token_hash)


def test_sha_variant_matches_sql_bit_for_bit():
    shutil.rmtree(STORE_SHA, ignore_errors=True)
    _ensure_store(STORE_SHA, token_hash="sha")
    got = sigstore.incremental_sig_near_pairs(
        snapshots.snapshot2(SF), STORE_SHA, threshold=0.7,
        token_hash="sha",
    ).to_pandas().sort_values(["new_url", "index_url"]
                              ).reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    exp = con.execute(sigstore.incremental_sig_near_pairs_sql(0.7)).df(
    ).sort_values(["new_url", "index_url"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype(str), exp.astype(str))
    assert len(got) > 0


def test_store_layout_and_fixed_width():
    shutil.rmtree(STORE, ignore_errors=True)
    _ensure_store()
    parts = [d for d in os.listdir(STORE) if d.startswith("part=")]
    assert parts
    meta = json.load(open(os.path.join(STORE, parts[0], "_META.json")))
    assert meta["config"]["kind"] == "signature_store"
    assert meta["config"]["n_perm"] == 126
    assert meta["config"]["seed"] == 42
    t = pq.read_table(os.path.join(STORE, parts[0], "data.parquet"))
    assert set(t.column_names) == {"url", "sig"}
    widths = {len(b) for b in t["sig"].to_pylist()}
    # fixed 1 KB/doc state: every signature is n_perm×8 B (or empty for
    # shingle-less docs)
    assert widths <= {0, 126 * 8}
    assert 126 * 8 in widths


def test_estimate_tracks_exact_jaccard():
    """est = n_agree/126 within 4.5σ of exact Jaccard for every pair the
    exact path reports (binomial σ = sqrt(j(1-j)/126) ≤ 0.045)."""
    _ensure_store()
    est = sigstore.incremental_sig_near_pairs(
        snapshots.snapshot2(SF), STORE, threshold=0.5).to_pandas()
    shstore = "/tmp/test_sig_shingle_store"
    shutil.rmtree(shstore, ignore_errors=True)
    index.build_shingle_store(web_pages(SF), shstore)
    exact = index.incremental_near_pairs(
        snapshots.snapshot2(SF), shstore, threshold=0.65).to_pandas()
    m = exact.merge(est, on=["new_url", "index_url"], how="left")
    found = m["n_agree"].notna()
    # pairs well above the sig threshold must all be found
    assert found[m["jaccard"] >= 0.8].all()
    e = m.loc[found, "n_agree"].to_numpy() / 126.0
    j = m.loc[found, "jaccard"].to_numpy()
    assert np.abs(e - j).max() <= 4.5 * np.sqrt(np.maximum(
        j * (1 - j), 0.25 / 126) / 126).max() + 1e-9


def test_planted_identical_recall_is_one():
    """Byte-identical recrawls (doc_id % 6 == 0) agree on every
    permutation and are always reported."""
    _ensure_store()
    pairs = sigstore.incremental_sig_near_pairs(
        snapshots.snapshot2(SF), STORE, threshold=0.7).to_pandas()
    s2 = snapshots.snapshot2(SF).to_pandas()
    planted = s2.loc[s2["inode_id"] % 6 == 0, "url"]
    got = pairs[(pairs["new_url"] == pairs["index_url"])
                & (pairs["n_agree"] == 126)]["new_url"]
    assert set(planted) <= set(got)
