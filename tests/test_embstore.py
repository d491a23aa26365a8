"""Persisted int8 embedding index (pipelines/embstore.py) — the
semantic tier of the fingerprint-store ladder.  The incremental
bipartite grid join is pinned bit-for-bit against the DuckDB
restatement of the shared quantization + HUGEINT predicate; planted
exact re-captures must score cos2_bp = 10000 (quantization is
loss-free on true duplicates)."""

import json
import os

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data

from data_dedup_ray.pipelines import embstore

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW embeddings AS "
              f"SELECT * FROM '{SF}/embeddings.parquet'")
    return c


def _emb(sf=SF):
    return ray.data.read_parquet(f"{sf}/embeddings.parquet",
                                 columns=["vec_id", "embedding"])


def _pairs(tmp_path, **kw):
    path = str(tmp_path / "idx")
    embstore.build_embedding_index(_emb(), path)
    return embstore.incremental_embedding_dup_pairs(
        embstore.recrawl_embeddings(SF), path, **kw).to_pandas() \
        .sort_values(["new_id", "index_id"]).reset_index(drop=True)


def test_store_layout_and_lineage(ray_session, tmp_path):
    path = str(tmp_path / "idx")
    embstore.build_embedding_index(_emb(), path, num_partitions=4)
    parts = [d for d in os.listdir(path) if d.startswith("part=")]
    assert parts
    meta = json.load(open(os.path.join(path, parts[0], "_META.json")))
    assert meta["config"]["kind"] == "embedding_index"
    assert meta["config"]["quantizer"] == "sym127"
    assert meta["config"]["b"] == 8
    # the tier really is d bytes per vector (dim 64 in the synthetic
    # corpus) and norms are precomputed
    t = embstore.read_embedding_index(path).to_pandas()
    assert {len(b) for b in t["q8"]} == {64}
    assert (t["n2"] > 0).all()
    assert len(t) == _emb().count()


def test_quantizer_mismatch_fails_loudly(ray_session, tmp_path):
    """An index persisted under a DIFFERENT quantization rule must be
    rejected, not silently mis-scored."""
    path = str(tmp_path / "idx")
    embstore.build_embedding_index(_emb(), path, num_partitions=2)
    mp = os.path.join(path, "part=0", "_META.json")
    meta = json.load(open(mp))
    meta["config"]["quantizer"] = "asym255"
    json.dump(meta, open(mp, "w"))
    with pytest.raises(ValueError, match="different configuration"):
        embstore.read_embedding_index(path)


def test_incremental_pairs_match_sql(ray_session, tmp_path, con):
    got = _pairs(tmp_path)
    want = con.execute(
        embstore.incremental_embedding_dup_pairs_sql()).fetchdf() \
        .sort_values(["new_id", "index_id"]).reset_index(drop=True)
    assert list(got.columns) == ["new_id", "index_id", "cos2_bp"]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # every re-captured vector matches its source exactly, loss-free
    n_new = len([i for i in range(_emb().count()) if i % 3 == 1])
    exact = got[got["new_id"] - 200000 == got["index_id"]]
    assert len(exact) == n_new
    assert (exact["cos2_bp"] == 10000).all()


def test_grid_shape_invariance(ray_session, tmp_path):
    outs = [_pairs(tmp_path / f"g{b}{c}", num_blocks=b,
                   num_new_blocks=c)
            for b, c in ((3, 2), (7, 5), (1, 1))]
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])


def test_dim_guard(ray_session, tmp_path):
    """Dims past the int64-exact bound fail loudly at quantize time
    (Ray wraps the task's ValueError as a raisable subclass)."""
    wide = ray.data.from_items(
        [{"vec_id": i, "embedding": [0.5] * 2000} for i in range(2)])
    with pytest.raises(Exception, match="int64-exact"):
        embstore.quantized_rows(wide).materialize()


def test_incremental_topk_matches_sql(ray_session, tmp_path, con):
    path = str(tmp_path / "idx")
    embstore.build_embedding_index(_emb(), path)
    got = embstore.incremental_embedding_topk(
        embstore.recrawl_embeddings(SF), path).to_pandas() \
        .sort_values(["new_id", "rank"]).reset_index(drop=True)
    want = con.execute(
        embstore.incremental_embedding_topk_sql()).fetchdf() \
        .sort_values(["new_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.sort_index(axis=1),
                                  want.sort_index(axis=1),
                                  check_dtype=False)
    # every re-captured vector retrieves its exact source at rank 1
    # with the loss-free maximal score
    top1 = got[got["rank"] == 1]
    assert ((top1["new_id"] - 200000) == top1["index_id"]).all()
    assert (top1["cos2_sgn_bp"] == 10000).all()
    # exactly k rows per new vector with contiguous ranks
    per = got.groupby("new_id")["rank"].agg(["size", "max"])
    assert (per["size"] == 5).all() and (per["max"] == 5).all()


def test_incremental_topk_grid_invariance(ray_session, tmp_path):
    path = str(tmp_path / "idx")
    embstore.build_embedding_index(_emb(), path)
    outs = [embstore.incremental_embedding_topk(
        embstore.recrawl_embeddings(SF), path, k=3,
        num_blocks=b, num_new_blocks=c).to_pandas()
        .sort_values(["new_id", "rank"]).reset_index(drop=True)
        for b, c in ((2, 3), (9, 1))]
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_semantic_estimator_eval(ray_session, con):
    """The int8 tier graded against exact float truth: loss-free on
    the planted re-crawl ⇒ all four counts agree and the metric row is
    pinned bit-for-bit by the SQL twin."""
    got = embstore.semantic_estimator_eval(SF).to_pandas()
    want = con.execute(
        embstore.semantic_estimator_eval_sql()).fetchdf()
    pd.testing.assert_frame_equal(got.sort_index(axis=1),
                                  want.sort_index(axis=1),
                                  check_dtype=False)
    r = got.iloc[0]
    assert r["tier"] == "int8_semantic"
    assert r["n_pred"] == r["n_true"] == r["n_hit"] > 0
    assert r["recall_bp"] == 10000 and r["precision_bp"] == 10000


def test_incremental_semantic_clusters_match_sql(ray_session, con):
    """The incremental fold equals flat clustering of the union
    (supernode induction) — pinned by the closure SQL twin; every
    re-captured vector lands in its source's cluster."""
    got = embstore.incremental_semantic_clusters_web(SF).to_pandas() \
        .sort_values(["side", "vec_id"]).reset_index(drop=True)
    want = con.execute(
        embstore.incremental_semantic_clusters_sql()).fetchdf() \
        .sort_values(["side", "vec_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.sort_index(axis=1),
                                  want.sort_index(axis=1),
                                  check_dtype=False)
    g = got.set_index("vec_id")["cluster_id"]
    new = got[got["side"] == "new"]
    assert len(new) > 0
    # each new vector shares its source's final cluster id
    assert (new["cluster_id"].to_numpy()
            == g.loc[new["vec_id"] - 200000].to_numpy()).all()
    # index rows keep a complete assignment (one row per base vector)
    assert (got["side"] == "index").sum() == _emb().count()


def test_int8_dup_clusters_labels_are_min_members(ray_session):
    flat = embstore.int8_dup_clusters(_emb()).to_pandas()
    assert len(flat) == _emb().count()
    mins = flat.groupby("cluster_id")["vec_id"].min()
    assert (mins.index.to_numpy() == mins.to_numpy()).all()
