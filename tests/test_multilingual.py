"""Per-language near-dup clustering: cross-language refinement on a
constructed corpus, flat-pipeline agreement where families never cross
languages, and SQL-oracle parity."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray

from data_dedup_ray.corpus import web_pages
from data_dedup_ray.pipelines import multilingual, near

SF = "/root/testdata/sf0.001"


def _labels(res) -> dict:
    df = res.to_pandas()
    return dict(zip(df["url"], df["cluster_id"]))


def test_cross_lang_twins_stay_apart():
    """Identical text in two languages: flat merges, by-lang splits."""
    txt = " ".join(f"tok{i}" for i in range(40))
    ds = ray.data.from_arrow(pa.table({
        "url": ["u/en1", "u/en2", "u/fr1", "u/de1"],
        "lang": ["en", "en", "fr", "de"],
        "text": [txt, txt, txt, "something else entirely " * 10],
    }))
    flat = _labels(near.minhash_dedup_clusters(ds, threshold=0.7))
    by = _labels(multilingual.near_dup_clusters_by_lang(ds, threshold=0.7))
    assert flat["u/en1"] == flat["u/en2"] == flat["u/fr1"]  # flat merges
    assert by["u/en1"] == by["u/en2"] == "u/en1"            # same lang: dup
    assert by["u/fr1"] == "u/fr1"                           # split by lang
    assert by["u/de1"] == "u/de1"


def test_refines_flat_clusters():
    """By-lang is a REFINEMENT of the flat clustering: two docs sharing a
    by-lang cluster always share the flat cluster AND the language — and
    the corpus genuinely contains cross-language near-dups (e.g. docs 120
    es / 360 fr carry near-identical text), so the refinement is strict."""
    ds = web_pages(SF)
    flat = near.minhash_dedup_clusters(ds, threshold=0.7).to_pandas()
    by = multilingual.near_dup_clusters_by_lang(ds, threshold=0.7) \
        .to_pandas()
    m = by.merge(flat.rename(columns={"cluster_id": "flat_id"}), on="url")
    for _, grp in m.groupby("cluster_id"):
        assert grp["flat_id"].nunique() == 1   # refinement
        assert grp["lang"].nunique() == 1      # same-language components
    # strictly finer: at least one flat cluster splits across languages
    split = m.groupby("flat_id")["cluster_id"].nunique()
    assert (split > 1).any()


def test_oracle_parity():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    got = (multilingual.near_dup_clusters_by_lang(web_pages(SF),
                                                  threshold=0.7)
           .to_pandas().sort_values("url").reset_index(drop=True))
    want = (con.execute(multilingual.near_dup_clusters_by_lang_sql(0.7))
            .fetchdf().sort_values("url").reset_index(drop=True))
    pd.testing.assert_frame_equal(got[["url", "lang", "cluster_id"]],
                                  want[["url", "lang", "cluster_id"]])
