"""Persisted shingle store + incremental near-dup: equality with the live
cross-corpus pipeline, store resumability, and store content shape."""

import json
import os
import shutil

import pandas as pd
import pyarrow.parquet as pq

from data_dedup_ray.corpus import web_pages
from data_dedup_ray.pipelines import index, near, snapshots

SF = "/root/testdata/sf0.001"
STORE = "/tmp/test_shingle_store"


def _pairs_frame(res) -> pd.DataFrame:
    df = res.to_pandas()
    df["jaccard"] = df["jaccard"].round(6)
    return df.sort_values(["new_url", "index_url"]).reset_index(drop=True)


def test_incremental_equals_live_cross_corpus():
    shutil.rmtree(STORE, ignore_errors=True)
    index.build_shingle_store(web_pages(SF), STORE)
    inc = _pairs_frame(index.incremental_near_pairs(
        snapshots.snapshot2(SF), STORE, threshold=0.7))
    live = _pairs_frame(near.cross_corpus_near_pairs(
        snapshots.snapshot2(SF), web_pages(SF), threshold=0.7))
    pd.testing.assert_frame_equal(inc, live)
    assert len(inc) > 0


def test_store_layout_and_lineage():
    # built by the previous test; rebuild if running standalone
    if not os.path.isdir(STORE):
        index.build_shingle_store(web_pages(SF), STORE)
    parts = [d for d in os.listdir(STORE) if d.startswith("part=")]
    assert parts
    meta = json.load(open(os.path.join(STORE, parts[0], "_META.json")))
    assert meta["config"]["kind"] == "shingle_store"
    assert meta["config"]["shingle_k"] == 5
    # the store is the verify wire format: (url, sh binary), nothing else
    f = pq.read_table(os.path.join(STORE, parts[0], "data.parquet"))
    assert set(f.column_names) == {"url", "sh"}


def test_store_build_is_resumable():
    if not os.path.isdir(STORE):
        index.build_shingle_store(web_pages(SF), STORE)
    # second build over a finished store writes nothing new
    status = index.build_shingle_store(web_pages(SF), STORE)
    assert not status["written"].any()
