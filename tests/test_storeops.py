"""Store compaction: latest-wins union of crawl store directories,
payload-agnostic, itself a readable resumable store."""

import os
import shutil

import duckdb
import pandas as pd

from data_dedup_ray.corpus import web_pages
from data_dedup_ray.pipelines import fpstore, snapshots, storeops

SF = "/root/testdata/sf0.001"
S1 = "/tmp/test_comp_hash_s1"
S2 = "/tmp/test_comp_hash_s2"
OUT = "/tmp/test_comp_hash_out"


def _stores():
    for p in (S1, S2, OUT):
        shutil.rmtree(p, ignore_errors=True)
    fpstore.build_content_hash_store(web_pages(SF), S1)
    fpstore.build_content_hash_store(snapshots.snapshot2(SF), S2)


def test_compact_matches_arg_max_sql():
    _stores()
    got = storeops.compact_store([S1, S2], OUT).to_pandas(
    ).sort_values("url").reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    exp = con.execute(storeops.compact_hash_store_sql()).df(
    ).sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype(str), exp.astype(str))
    # revisited urls took the LATER crawl's hash: at least one url whose
    # snapshot2 text changed must differ from its crawl-1 hash
    s1 = fpstore.read_content_hash_store(S1).to_pandas()
    m = got.merge(s1, on="url", suffixes=("", "_old"))
    assert (m["sha"] != m["sha_old"]).any()


def test_compacted_dir_is_a_readable_store():
    if not os.path.isdir(OUT):
        _stores()
        storeops.compact_store([S1, S2], OUT)
    back = fpstore.read_content_hash_store(OUT).to_pandas(
    ).sort_values("url").reset_index(drop=True)
    live = storeops.compact_store([S1, S2]).to_pandas(
    ).sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(back, live)
    # lineage meta records the source count
    import json
    part = [d for d in os.listdir(OUT) if d.startswith("part=")][0]
    meta = json.load(open(os.path.join(OUT, part, "_META.json")))
    assert meta["config"]["kind"] == "compacted_store"
    assert meta["config"]["n_sources"] == 2


def test_store_audit_matches_sql():
    if not os.path.isdir(S1):
        _stores()
    got = storeops.store_audit([S1, S2]).to_pandas(
    ).sort_values("crawl").reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    exp = con.execute(storeops.store_audit_sql()).df(
    ).sort_values("crawl").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.sort_index(axis=1).astype(str),
        exp.sort_index(axis=1).astype(str))
    # the first crawl can never have seen anything earlier; snapshot2's
    # byte-identical re-captures (doc_id%6==0 of the %3 revisits) make
    # its carryover rate ~50%
    assert got.iloc[0].n_seen_earlier == 0
    assert 4000 < got.iloc[1].seen_earlier_bp < 6000


def test_store_audit_order_sensitivity():
    """Crawl order defines 'earlier': swapping the ladder moves the
    carryover to the other side."""
    if not os.path.isdir(S1):
        _stores()
    fwd = storeops.store_audit([S1, S2]).to_pandas().set_index("crawl")
    rev = storeops.store_audit([S2, S1]).to_pandas().set_index("crawl")
    assert fwd.loc[1].n_seen_earlier == rev.loc[1].n_seen_earlier == 0
    # identical content seen in both directions: the repeat SET is the
    # same pages, so both orderings find carryover on the second crawl
    assert fwd.loc[2].n_seen_earlier > 0 and rev.loc[2].n_seen_earlier > 0
    # totals are order-independent
    assert (fwd.n_rows.sum() == rev.n_rows.sum()
            and fwd.loc[1].n_distinct_payloads
            == rev.loc[2].n_distinct_payloads)


def test_compact_is_payload_agnostic():
    """Same kernel compacts the simhash store (int64 payload)."""
    a, b = "/tmp/test_comp_sim_s1", "/tmp/test_comp_sim_s2"
    for p in (a, b):
        shutil.rmtree(p, ignore_errors=True)
    fpstore.build_simhash_store(web_pages(SF), a)
    fpstore.build_simhash_store(snapshots.snapshot2(SF), b)
    got = storeops.compact_store([a, b]).to_pandas(
    ).sort_values("url").reset_index(drop=True)
    da = fpstore.read_simhash_store(a).to_pandas()
    db = fpstore.read_simhash_store(b).to_pandas()
    exp = (pd.concat([da.assign(_k=0), db.assign(_k=1)])
           .sort_values("_k").drop_duplicates("url", keep="last")
           [["url", "fp"]].sort_values("url").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)


def test_compact_handles_binary_blob_payload():
    """Payload-agnostic includes large_binary: compacting two shingle
    stores (url -> uint64-blob) keeps the LATER crawl's blob."""
    from data_dedup_ray.pipelines import index

    a, b = "/tmp/test_comp_blob_s1", "/tmp/test_comp_blob_s2"
    for p in (a, b):
        shutil.rmtree(p, ignore_errors=True)
    index.build_shingle_store(web_pages(SF), a)
    index.build_shingle_store(snapshots.snapshot2(SF), b)
    got = storeops.compact_store([a, b]).to_pandas(
    ).sort_values("url").reset_index(drop=True)
    da = index.read_shingle_store(a).to_pandas()
    db = index.read_shingle_store(b).to_pandas()
    exp = (pd.concat([da.assign(_k=0), db.assign(_k=1)])
           .sort_values("_k", kind="stable")
           .drop_duplicates("url", keep="last")
           [["url", "sh"]].sort_values("url").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)
    # a revisited url whose text changed carries a different blob
    m = got.merge(da, on="url", suffixes=("", "_old"))
    assert (m["sh"] != m["sh_old"]).any()


def test_compact_rejects_empty_paths():
    import pytest

    with pytest.raises(ValueError):
        storeops.compact_store([])
    with pytest.raises(ValueError):
        storeops.store_audit([])
