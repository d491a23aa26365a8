"""Bigram LM scoring: brute-force parity, partition invariance, held-out
unseen accounting."""

import math
import re
from collections import Counter

import pandas as pd
import ray.data

from data_dedup_ray.pipelines import lm


def _bruteforce(docs: pd.DataFrame):
    cab = Counter()
    by_doc = {}
    for did, t in zip(docs["doc_id"], docs["text"]):
        toks = re.findall(r"[a-z0-9]+", t.lower())
        bgs = list(zip(toks[:-1], toks[1:]))
        if bgs:
            by_doc[did] = bgs
        cab.update(bgs)
    ca = Counter()
    for (a, _), c in cab.items():
        ca[a] += c
    nll = {k: math.floor(-math.log(c / ca[k[0]]) * 10000)
           for k, c in cab.items()}
    return nll, by_doc


def test_scores_match_bruteforce(sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    nll, by_doc = _bruteforce(docs)
    want = pd.DataFrame(
        [(d, len(b), 0, sum(nll[p] for p in b))
         for d, b in sorted(by_doc.items())],
        columns=["doc_id", "n_bigrams", "n_unseen", "nll_msum"])
    got = (lm.bigram_lm_scores(sf_dir).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got.astype("int64").equals(want.astype("int64"))


def test_partition_invariance(sf_dir):
    a = (lm.bigram_lm_scores(sf_dir, num_partitions=3).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (lm.bigram_lm_scores(sf_dir, num_partitions=16).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    assert a.equals(b)


def test_heldout_unseen_bigrams_counted_not_scored():
    train = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["alpha beta gamma", "alpha beta delta"],
    }))
    model = lm.fit_bigram_model(train, num_partitions=2).to_pandas()
    # (alpha,beta) c=2/2 -> nll 0; (beta,gamma) 1/2; (beta,delta) 1/2
    m = {(a, b): v for a, b, v in
         zip(model["a"], model["b"], model["nll_m"])}
    assert m[("alpha", "beta")] == 0
    assert m[("beta", "gamma")] == math.floor(math.log(2) * 10000)
    heldout = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [7, 8],
        "text": ["alpha beta gamma zeta", "solo"],
    }))
    got = lm.score_docs(heldout, model).to_pandas()
    assert len(got) == 1  # "solo" has no bigram
    row = got.iloc[0]
    # (alpha,beta)=0 + (beta,gamma)=6931 seen; (gamma,zeta) unseen
    assert row["doc_id"] == 7 and row["n_bigrams"] == 3
    assert row["n_unseen"] == 1
    assert row["nll_msum"] == math.floor(math.log(2) * 10000)


def test_empty_and_single_token_docs():
    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["", "one", "two words"],
    }))
    model = lm.fit_bigram_model(docs, num_partitions=2).to_pandas()
    assert len(model) == 1  # only ("two","words")
    got = lm.score_docs(docs, model).to_pandas()
    assert list(got["doc_id"]) == [3]
    assert list(got["nll_msum"]) == [0]


def _bucket_df(sf_dir):
    return (lm.ppl_buckets(sf_dir).to_pandas()
            .sort_values(["lang", "lang_rank"]).reset_index(drop=True))


def test_ppl_buckets_match_bruteforce(sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    nll, by_doc = _bruteforce(docs)
    lang = dict(zip(docs["doc_id"], docs["lang"]))
    rows = [(d, lang[d], sum(nll[p] for p in b) // len(b))
            for d, b in by_doc.items()]
    rows.sort(key=lambda r: (r[1], r[2], r[0]))
    want = []
    from collections import Counter
    n_by_lang = Counter(r[1] for r in rows)
    rank = Counter()
    for d, la, ppl in rows:
        rank[la] += 1
        n = n_by_lang[la]
        code = 3 * (rank[la] - 1) // n
        want.append((d, la, ppl, rank[la], n,
                     ["head", "middle", "tail"][code]))
    want = pd.DataFrame(want, columns=[
        "doc_id", "lang", "ppl_m", "lang_rank", "n_lang", "bucket"])
    got = _bucket_df(sf_dir)
    pd.testing.assert_frame_equal(
        got, want.sort_values(["lang", "lang_rank"])
        .reset_index(drop=True), check_dtype=False)


def test_ppl_buckets_third_cut_law(sf_dir):
    got = _bucket_df(sf_dir)
    sizes = got.groupby(["lang", "bucket"]).size().unstack(fill_value=0)
    # the 3·(rank−1)//n cut yields thirds whose sizes differ by ≤ 1
    assert (sizes.max(axis=1) - sizes.min(axis=1) <= 1).all()
    # head holds the best (lowest) scores: per lang, max(head) ≤ min(tail)
    for la, g in got.groupby("lang"):
        assert (g.loc[g["bucket"] == "head", "ppl_m"].max()
                <= g.loc[g["bucket"] == "tail", "ppl_m"].min())


def test_ppl_buckets_partition_invariance(sf_dir):
    a = (lm.ppl_buckets(sf_dir, num_partitions=3, band_width=256)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (lm.ppl_buckets(sf_dir, num_partitions=16, band_width=8192)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_ppl_buckets_oracle_parity(sf_dir):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')")
    want = (con.execute(lm.ppl_buckets_sql()).df()
            .sort_values(["lang", "lang_rank"]).reset_index(drop=True))
    got = _bucket_df(sf_dir)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
