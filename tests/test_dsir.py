"""DSIR importance weights (pipelines/dsir.py): oracle parity, feature
kernel laws, selection-signal sanity, and partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data

from data_dedup_ray.pipelines import dsir

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    return c


def test_bigrams_never_cross_doc_boundaries():
    d, b, c = dsir._doc_bucket_counts(["alpha beta", "beta gamma"], 64)
    # doc 0: 2 unigrams + 1 bigram; doc 1: same — 3 features each
    tot = pd.Series(c).groupby(pd.Series(d)).sum()
    assert tot.tolist() == [3, 3]
    # the cross-boundary bigram (beta, beta) must NOT appear: rebuild
    # with the docs concatenated and check it gains exactly one feature
    d2, b2, c2 = dsir._doc_bucket_counts(["alpha beta beta gamma"], 64)
    assert int(c2.sum()) == 7   # 4 unigrams + 3 bigrams


def test_empty_and_single_token_docs():
    d, b, c = dsir._doc_bucket_counts(["", "only"], 64)
    tot = pd.Series(c).groupby(pd.Series(d)).sum()
    assert tot.to_dict() == {1: 1}    # doc 0 absent, doc 1: 1 unigram


def test_weights_oracle(con):
    got = dsir.dsir_weights(SF).to_pandas().reset_index(drop=True)
    want = con.execute(dsir.dsir_weights_sql()).fetchdf().astype(
        {"n_feats": "int64", "dsir_msum": "int64"})
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))


def test_target_lang_scores_highest(con):
    got = dsir.dsir_weights(SF).to_pandas()
    langs = con.execute("SELECT doc_id, lang FROM documents").fetchdf()
    per_tok = got.merge(langs, on="doc_id")
    per_tok = per_tok[per_tok["n_feats"] > 0]
    per_tok["w"] = per_tok["dsir_msum"] / per_tok["n_feats"]
    means = per_tok.groupby("lang")["w"].mean()
    assert means.idxmax() == "en"


def test_partition_invariance():
    a = dsir.dsir_weights(SF, num_partitions=3).to_pandas()
    b = dsir.dsir_weights(SF, num_partitions=8).to_pandas()
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))


@pytest.mark.parametrize("frac_bp", [2000, 5000, 10000])
def test_select_oracle(con, frac_bp):
    got = dsir.dsir_select(SF, frac_bp=frac_bp).to_pandas()
    want = con.execute(dsir.dsir_select_sql(frac_bp=frac_bp)).fetchdf() \
        .astype({"wnorm_m": "int64"})
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True))


def test_select_count_and_threshold_law():
    w = dsir.dsir_weights(SF).to_pandas()
    scored = w[w["n_feats"] > 0]
    sel = dsir.dsir_select(SF, frac_bp=2000).to_pandas()
    assert len(sel) == len(scored) * 2000 // 10000
    # every selected doc's wnorm is >= every unselected doc's wnorm
    wn = (scored["dsir_msum"] + 1_000_000 * scored["n_feats"]) \
        // scored["n_feats"]
    scored = scored.assign(wnorm=wn)
    out = scored[~scored["doc_id"].isin(set(sel["doc_id"]))]
    assert sel["wnorm_m"].min() >= out["wnorm"].max() or not len(out)


def test_other_target_lang_oracle(con):
    got = dsir.dsir_weights(SF, target_lang="fr").to_pandas()
    want = con.execute(
        dsir.dsir_weights_sql(target_lang="fr")).fetchdf().astype(
        {"n_feats": "int64", "dsir_msum": "int64"})
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True))
