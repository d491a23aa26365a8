"""One-Permutation Hashing (Li-Owen-Zhang 2012, rotation densification
Shrivastava-Li 2014): signature-kernel parity vs a pure-Python
reference, exact-dup lane identity, bit-for-bit SQL parity in sha mode,
estimator accuracy vs exact Jaccard, partition invariance."""

import math

import duckdb
import numpy as np
import pandas as pd
import ray.data

from data_dedup_ray.corpus import web_pages
from data_dedup_ray.pipelines import oph
from data_dedup_ray.stages.minhash import shingle_sets

SF = "/root/testdata/sf0.001"
C = 0x100000001B3
M = 1 << 64


def _ref_signature(shingles: set, K: int) -> list:
    """Pure-Python OPH reference: bin minima + rotation densification."""
    shift = 64 - int(math.log2(K))
    vmin = {}
    for s in shingles:
        b = s >> shift
        vmin[b] = min(vmin.get(b, M), s)
    sig = []
    for k in range(K):
        t = 0
        while (k + t) % K not in vmin:
            t += 1
        sig.append((vmin[(k + t) % K] + t * C) % M)
    return sig


def test_signature_kernel_matches_reference():
    texts = ["the quick brown fox jumps over the lazy dog and then "
             "runs far away into the deep green forest tonight",
             "an entirely different page about distributed arrow "
             "batches moving through object stores under backpressure"]
    cat, sizes = shingle_sets(
        __import__("pyarrow").chunked_array(
            [__import__("pyarrow").array(texts)]), 5)
    got = oph.oph_signatures(cat, sizes, 128)
    off = 0
    for i, n in enumerate(sizes):
        sh = set(int(x) for x in cat[off:off + n])
        off += n
        assert [int(x) for x in got[i]] == _ref_signature(sh, 128)


def test_exact_duplicates_agree_on_every_lane():
    t = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lambda mu nu xi omicron pi rho sigma tau upsilon")
    cat, sizes = shingle_sets(
        __import__("pyarrow").chunked_array(
            [__import__("pyarrow").array([t, t])]), 5)
    sig = oph.oph_signatures(cat, sizes, 128)
    assert (sig[0] == sig[1]).all()


def test_sha_variant_matches_sql_bit_for_bit(ray_session):
    got = oph.oph_pairs_web(SF, token_hash="sha").to_pandas() \
        .sort_values(["url_a", "url_b"]).reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute(oph.oph_pairs_sql(0.7)).df() \
        .sort_values(["url_a", "url_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype(str), want.astype(str))
    assert len(got) > 0


def test_estimator_tracks_exact_jaccard(ray_session):
    """For every emitted pair, n_agree/128 must sit within the binomial
    4.5σ band around the exact shingle Jaccard."""
    from data_dedup_ray.pipelines import near

    got = oph.oph_pairs_web(SF).to_pandas()
    exact = near.ngram_jaccard_pairs(
        web_pages(SF), threshold=0.5).to_pandas()
    jmap = {(a, b): float(j) for a, b, j in zip(
        exact["url_a"], exact["url_b"], exact["jaccard"])}
    checked = 0
    for a, b, n in zip(got["url_a"], got["url_b"], got["n_agree"]):
        j = jmap.get((a, b))
        if j is None:
            continue
        sd = math.sqrt(max(j * (1 - j), 1e-9) / 128)
        assert abs(n / 128 - j) <= 4.5 * sd + 1e-9, (a, b, n, j)
        checked += 1
    assert checked > 50


def test_partition_invariance(ray_session):
    outs = [oph.oph_near_dup_pairs(
        web_pages(SF), num_partitions=p).to_pandas()
        .sort_values(["url_a", "url_b"]).reset_index(drop=True)
        for p in (4, 16)]
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_empty_and_short_docs(ray_session):
    ds = ray.data.from_items([
        {"url": "a", "text": ""},
        {"url": "b", "text": "two words"},
        {"url": "c", "text": "alpha beta gamma delta epsilon zeta"},
    ])
    rows = oph.oph_signature_rows(ds).to_pandas().set_index("url")
    assert rows.loc["a", "sig"] == b""
    assert rows.loc["b", "sig"] == b""   # < k tokens → no shingles
    assert len(rows.loc["c", "sig"]) == 128 * 8
    pairs = oph.oph_near_dup_pairs(ds).to_pandas()
    assert len(pairs) == 0
