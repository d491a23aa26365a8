"""Weighted priority sampling: brute-force parity + weight-monotonicity."""

import hashlib

import numpy as np
import pandas as pd

from data_dedup_ray.pipelines import sampling


def _bruteforce(sf_dir, k, weight_col="n_chars"):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    h = np.array([int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
                  for i in docs["doc_id"]], dtype=np.int64)
    pri = h // np.maximum(docs[weight_col].to_numpy(np.int64), 1)
    df = pd.DataFrame({"doc_id": docs["doc_id"], "priority": pri})
    return (df.sort_values(["priority", "doc_id"]).head(k)
            .reset_index(drop=True).astype("int64"))


def test_matches_bruteforce(sf_dir):
    got = (sampling.weighted_sample_docs(sf_dir, k=50).to_pandas()
           .reset_index(drop=True).astype("int64"))
    assert got.equals(_bruteforce(sf_dir, 50))


def test_k_larger_than_corpus(sf_dir):
    got = sampling.weighted_sample_docs(sf_dir, k=10**6).to_pandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    assert len(got) == len(docs)


def test_sample_is_prefix_stable(sf_dir):
    # bottom-k ordering means a smaller k is a prefix of a larger one —
    # the property that makes the sample reproducible across budget changes
    small = sampling.weighted_sample_docs(sf_dir, k=20).to_pandas()
    big = sampling.weighted_sample_docs(sf_dir, k=60).to_pandas()
    assert big.head(20).reset_index(drop=True).equals(
        small.reset_index(drop=True))


def test_weight_monotone_inclusion(sf_dir, tmp_path):
    # doubling every weight halves every priority: the selected SET can
    # only be reordered by ties, never changed — and raising ONE doc's
    # weight can only pull it IN, never push it out
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    base = _bruteforce(sf_dir, 30)
    boosted = docs.copy()
    out_doc = int(
        docs.loc[~docs["doc_id"].isin(base["doc_id"]), "doc_id"].iloc[0])
    boosted.loc[boosted["doc_id"] == out_doc, "n_chars"] = 10**9
    d = tmp_path / "boost"
    d.mkdir()
    boosted.to_parquet(d / "documents.parquet", index=False)
    got = sampling.weighted_sample_docs(str(d), k=30).to_pandas()
    assert out_doc in set(got["doc_id"])
    # everyone else's relative order among themselves is unchanged
    rest_got = [i for i in got["doc_id"] if i != out_doc]
    rest_want = [i for i in base["doc_id"]][:len(rest_got)]
    assert rest_got == rest_want
