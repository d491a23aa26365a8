"""Persisted span-fingerprint store + incremental substring dup
(pipelines/spanstore.py) vs the md5-window DuckDB twin."""

import json
import os

import duckdb
import pandas as pd
import pytest
import ray.data

from data_dedup_ray.corpus import web_pages
from data_dedup_ray.pipelines import spanstore

SF = "/root/testdata/sf0.001"


def test_incremental_exact_matches_sql(ray_session):
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    got = spanstore.incremental_substring_dup_web(SF, mode="exact") \
        .to_pandas().sort_values("url").reset_index(drop=True)
    want = con.execute(spanstore.incremental_substring_dup_sql()) \
        .fetchdf().sort_values("url").reset_index(drop=True)
    assert len(got) > 0
    pd.testing.assert_frame_equal(got.sort_index(axis=1),
                                  want.sort_index(axis=1),
                                  check_dtype=False)


def test_store_layout_lineage_and_mode_mismatch(ray_session, tmp_path):
    docs = web_pages(SF).select_columns(["url", "text"]).limit(40)
    path = str(tmp_path / "store")
    spanstore.build_span_store(docs, path, num_partitions=4)
    parts = [d for d in os.listdir(path) if d.startswith("part=")]
    meta = json.load(open(os.path.join(path, parts[0], "_META.json")))
    assert meta["config"]["kind"] == "span_store"
    assert meta["config"]["mode"] == "winnowed"
    assert meta["config"]["winnow_w"] == 8
    # querying a winnowed store with exact mode (or another window
    # rule) fails loudly
    for kw in ({"mode": "exact"}, {"min_tokens": 40},
               {"winnow_w": 4}):
        with pytest.raises(ValueError, match="different configuration"):
            spanstore.incremental_substring_dup(docs, path, **kw)


def test_winnowed_detects_planted_long_span(ray_session, tmp_path):
    """A 60-token span copied verbatim into a new page is guaranteed a
    winnowed fingerprint hit (span ≥ min_tokens + winnow_w − 1 at the
    store's rule); an all-novel page scores no rows."""
    words = [f"tok{i}" for i in range(120)]
    span = " ".join(words[:60])
    idx_docs = ray.data.from_items(
        [{"url": "i0", "text": span + " " + " ".join(words[60:])},
         {"url": "i1", "text": " ".join(f"w{i}" for i in range(80))}])
    new_docs = ray.data.from_items(
        [{"url": "n0",
          "text": "prefix words here " + span + " suffix words"},
         {"url": "n1",
          "text": " ".join(f"novel{i}" for i in range(80))}])
    path = str(tmp_path / "store")
    spanstore.build_span_store(idx_docs, path, min_tokens=50,
                               winnow_w=8, num_partitions=2)
    got = spanstore.incremental_substring_dup(
        new_docs, path, min_tokens=50, winnow_w=8).to_pandas()
    assert set(got["url"]) == {"n0"}
    assert (got["n_dup_windows"] >= 1).all()


def test_partition_invariance(ray_session, tmp_path):
    docs = web_pages(SF).select_columns(["url", "text"])
    outs = []
    for p in (4, 16):
        path = str(tmp_path / f"s{p}")
        spanstore.build_span_store(docs, path, mode="exact",
                                   num_partitions=p)
        outs.append(spanstore.incremental_substring_dup(
            docs, path, mode="exact", num_partitions=p).to_pandas()
            .sort_values("url").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
