"""Sparse TF / TF-IDF cosine pairs: brute-force parity, threshold and
df-cut semantics, SQL-oracle parity at sf0.001."""

import math
import re

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray

from data_dedup_ray.pipelines import tfidf

SF = "/root/testdata/sf0.001"
TOKEN_RE = re.compile(r"[a-z0-9]+")


def _brute(docs: dict, *, max_df: int, weighting: str = "tf",
           n_docs: int | None = None):
    """Reference pairwise cosine over the df-pruned token space.

    Returns {(a, b): (dot, cos)} for every pair with dot > 0."""
    tf = {d: pd.Series(TOKEN_RE.findall(t.lower())).value_counts()
          for d, t in docs.items()}
    df: dict = {}
    for d, c in tf.items():
        for tok in c.index:
            df[tok] = df.get(tok, 0) + 1
    vocab = {t for t, v in df.items() if v <= max_df}
    n = len(docs) if n_docs is None else n_docs
    vecs = {}
    for d, c in tf.items():
        v = {}
        for tok, cnt in c.items():
            if tok not in vocab:
                continue
            if weighting == "tf":
                v[tok] = int(cnt)
            else:
                v[tok] = cnt * (math.log((1 + n) / (1 + df[tok])) + 1)
        vecs[d] = v
    out = {}
    ids = sorted(vecs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            va, vb = vecs[a], vecs[b]
            dot = sum(w * vb[t] for t, w in va.items() if t in vb)
            if not dot:
                continue
            na = sum(w * w for w in va.values())
            nb = sum(w * w for w in vb.values())
            out[(a, b)] = (dot, dot / math.sqrt(na * nb), na, nb)
    return out


DOCS = {
    "d01": "apple banana cherry apple kiwi",
    "d02": "apple banana cherry apple kiwi",          # exact copy of d01
    "d03": "apple banana cherry plum kiwi",           # near copy
    "d04": "xylophone quartz jazz vortex glyph",      # disjoint
    "d05": "xylophone quartz jazz vortex glyph nymph",  # near copy of d04
    "d06": "apple xylophone plum nymph quartz",       # mixed, medium sim
    "d07": "",                                        # empty
    "d08": "stop stop stop stop word word",           # repetition-heavy
    "d09": "stop word apple",                         # shares stopish toks
}


def _run(weighting, *, max_df=9, min_cos2_bp=0, min_cos=0.0, P=8):
    ds = ray.data.from_items(
        [{"url": k, "text": v} for k, v in DOCS.items()])
    out = tfidf.sparse_cosine_pairs(
        ds, id_col="url", text_col="text", weighting=weighting,
        max_df=max_df, min_cos2_bp=min_cos2_bp, min_cos=min_cos,
        num_partitions=P,
    ).to_pandas()
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def test_tf_pairs_match_bruteforce(ray_session):
    got = _run("tf")
    want = _brute(DOCS, max_df=9)
    assert set(zip(got["id_a"], got["id_b"])) == set(want)
    for _, r in got.iterrows():
        dot, _, na, nb = want[(r["id_a"], r["id_b"])]
        assert r["dot"] == dot
        assert r["cos2_bp"] == dot * dot * 10_000 // (na * nb)


def test_tf_threshold_is_exact_integer(ray_session):
    # d01/d02 are exact copies: cos = 1 → cos2_bp = 10000, kept at any
    # threshold; the mixed pairs fall below 0.81 and must drop
    got = _run("tf", min_cos2_bp=8100)
    pairs = set(zip(got["id_a"], got["id_b"]))
    assert ("d01", "d02") in pairs
    want = _brute(DOCS, max_df=9)
    expect = {p for p, (d, c, na, nb) in want.items()
              if d * d * 10_000 >= 8100 * na * nb}
    assert pairs == expect
    # boundary: a pair at exactly the threshold stays in (>= semantics)
    for p, (d, c, na, nb) in want.items():
        if d * d * 10_000 == 8100 * na * nb:  # pragma: no cover
            assert p in pairs


def test_max_df_prunes_vector_space(ray_session):
    # with max_df=2, 'apple' (df=4) and 'stop'/'word' (df=2 ok) change
    # membership: pairs connected only via high-df terms vanish
    got = _run("tf", max_df=2)
    want = _brute(DOCS, max_df=2)
    assert set(zip(got["id_a"], got["id_b"])) == set(want)
    for _, r in got.iterrows():
        dot, _, na, nb = want[(r["id_a"], r["id_b"])]
        assert r["dot"] == dot


def test_tfidf_pairs_match_bruteforce(ray_session):
    got = _run("tfidf")
    want = _brute(DOCS, max_df=9, weighting="tfidf")
    assert set(zip(got["id_a"], got["id_b"])) == set(want)
    for _, r in got.iterrows():
        dot, cos, _, _ = want[(r["id_a"], r["id_b"])]
        assert r["dot"] == pytest.approx(dot, rel=1e-12)
        assert abs(r["cos_bp"] - round(cos * 10_000)) <= 1


def test_tfidf_threshold(ray_session):
    got = _run("tfidf", min_cos=0.9)
    want = _brute(DOCS, max_df=9, weighting="tfidf")
    expect = {p for p, (d, c, _, _) in want.items() if c >= 0.9}
    assert set(zip(got["id_a"], got["id_b"])) == expect


def test_partition_count_invariance(ray_session):
    a = _run("tf", P=3)
    b = _run("tf", P=16)
    pd.testing.assert_frame_equal(a, b)


def test_tf_cosine_pairs_oracle_parity(ray_session):
    from data_dedup_ray.oracles import tf_cosine_pairs_sql

    got = (tfidf.tf_cosine_pairs(SF).to_pandas()
           .sort_values(["url_a", "url_b"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = (con.execute(tf_cosine_pairs_sql()).fetchdf()
            .sort_values(["url_a", "url_b"]).reset_index(drop=True))
    assert len(got) == len(want) > 0
    g = got.sort_index(axis=1)
    w = want.sort_index(axis=1)
    assert list(g.columns) == list(w.columns)
    for c in g.columns:
        assert (g[c].astype(str).values == w[c].astype(str).values).all(), c
