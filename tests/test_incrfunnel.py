"""Incremental tiered dedup funnel: disposition of every new-crawl page
(exact via the 32 B hash store, near via the shingle store, else
unique) equals the flat SQL truth; exact pages provably skip the
expensive tier."""

import shutil

import duckdb
import pandas as pd
import pyarrow as pa
import ray.data

from data_dedup_ray.corpus import web_pages
from data_dedup_ray.pipelines import fpstore, incrfunnel, index, snapshots

SF = "/root/testdata/sf0.001"
HS = "/tmp/test_funnel_hash"
SS = "/tmp/test_funnel_shingle"


def _stores():
    shutil.rmtree(HS, ignore_errors=True)
    shutil.rmtree(SS, ignore_errors=True)
    fpstore.build_content_hash_store(web_pages(SF), HS)
    index.build_shingle_store(web_pages(SF), SS)


def test_funnel_matches_flat_sql():
    _stores()
    got = incrfunnel.incremental_tiered_dedup(
        snapshots.snapshot2(SF), HS, SS, threshold=0.7
    ).to_pandas().sort_values("url").reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    exp = con.execute(incrfunnel.incremental_tiered_dedup_sql(0.7)).df(
    ).sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype(str), exp.astype(str))
    # every snapshot2 page got exactly one row; both tiers fired
    assert len(got) == snapshots.snapshot2(SF).count()
    counts = got["disposition"].value_counts()
    assert counts.get("exact", 0) > 0 and counts.get("near", 0) > 0


def test_unique_disposition_for_novel_pages():
    """Pages whose text exists nowhere in the index come out 'unique'
    with an empty match_url."""
    _stores()
    novel = ray.data.from_arrow(pa.table({
        "url": ["https://novel.example/a", "https://novel.example/b"],
        "text": ["entirely fresh words never crawled before at all here",
                 "zz"],  # second has <5 tokens: no shingles either
    }))
    got = incrfunnel.incremental_tiered_dedup(
        novel, HS, SS, threshold=0.7).to_pandas()
    assert (got["disposition"] == "unique").all()
    assert (got["match_url"] == "").all()
    assert len(got) == 2
