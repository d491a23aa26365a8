"""Hashed-linear scorer: SQL-oracle parity, brute-force parity, and the
weight function's integer contract."""

import hashlib
import re

import duckdb
import pandas as pd

from data_dedup_ray.pipelines import classifier

SF = "/root/testdata/sf0.001"
TOKEN_RE = re.compile(r"[a-z0-9]+")


def test_weight_contract():
    for tok in ["the", "a1", "zzz"]:
        w = classifier._weight(tok)
        assert -1000 <= w <= 1000
        h = hashlib.md5(b"w|" + tok.encode()).hexdigest()
        assert w == int(h[:8], 16) % 2001 - 1000


def test_matches_bruteforce_and_oracle():
    got = (classifier.quality_classifier_scores(SF).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'").fetchdf()
    for _, r in docs.head(25).iterrows():
        toks = TOKEN_RE.findall(r["text"].lower())
        want = sum(classifier._weight(t) for t in toks)
        row = got.loc[got["doc_id"] == r["doc_id"]].iloc[0]
        assert row["score"] == want and row["n_tokens"] == len(toks)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = (con.execute(classifier.quality_classifier_scores_sql())
            .fetchdf().sort_values("doc_id").reset_index(drop=True)
            .astype("int64"))
    pd.testing.assert_frame_equal(got, want)
    # scores genuinely discriminate (non-constant)
    assert got["score"].nunique() > 1


def test_top_quality_per_domain_oracle():
    from data_dedup_ray.corpus import web_pages

    got = (classifier.top_quality_per_domain(web_pages(SF), k=3)
           .to_pandas().sort_values(["domain", "url"])
           .reset_index(drop=True))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = (con.execute(classifier.top_quality_per_domain_sql(3)).fetchdf()
            .sort_values(["domain", "url"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got, want.astype({"score": "int64"}))
    # every domain contributes, capped at k
    assert got.groupby("domain").size().max() <= 3
    assert got.groupby("domain").size().min() >= 1


def test_top_quality_partition_invariance():
    from data_dedup_ray.corpus import web_pages

    a = (classifier.top_quality_per_domain(web_pages(SF), k=2,
                                           num_partitions=4)
         .to_pandas().sort_values(["domain", "url"])
         .reset_index(drop=True))
    b = (classifier.top_quality_per_domain(web_pages(SF), k=2,
                                           num_partitions=32)
         .to_pandas().sort_values(["domain", "url"])
         .reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
