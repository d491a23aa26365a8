"""Bottom-k minwise sketches (pipelines/bottomk.py): estimator kernel
laws, the exact-merge law, SQL oracle parity, and tier-eval sanity."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from data_dedup_ray.pipelines import bottomk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    return c


def _ref_est(A: np.ndarray, B: np.ndarray, k: int) -> tuple[int, int]:
    """Reference union estimator from two bottom-k sketches."""
    bka, bkb = set(A[:k].tolist()), set(B[:k].tolist())
    U = sorted(bka | bkb)[:k]
    num = sum(1 for x in U if x in bka and x in bkb)
    return num, len(U)


def test_estimate_kernel_matches_reference():
    rng = np.random.default_rng(5)
    k = 8
    pids, vals, want = [], [], []
    for p in range(300):
        A = np.unique(rng.integers(0, 60, size=rng.integers(1, 30))
                      .astype(np.uint64))[:k]
        B = np.unique(rng.integers(0, 60, size=rng.integers(1, 30))
                      .astype(np.uint64))[:k]
        pids.append(np.full(len(A) + len(B), p))
        vals.append(np.concatenate([A, B]))
        want.append(_ref_est(A, B, k))
    num, den = bottomk._estimate(
        np.concatenate(pids).astype(np.int64),
        np.concatenate(vals), k, 300)
    w_num, w_den = zip(*want)
    assert num.tolist() == list(w_num)
    assert den.tolist() == list(w_den)


def test_exact_merge_law():
    """B_k(A ∪ B) == bottom-k of (B_k(A) ∪ B_k(B)) — set-level, the
    property that makes per-shard sketches roll up losslessly."""
    rng = np.random.default_rng(9)
    k = 16
    for _ in range(50):
        A = np.unique(rng.integers(0, 10**12, size=rng.integers(0, 200))
                      .astype(np.uint64))
        B = np.unique(rng.integers(0, 10**12, size=rng.integers(0, 200))
                      .astype(np.uint64))
        direct = np.unique(np.concatenate([A, B]))[:k]
        merged = np.unique(np.concatenate([A[:k], B[:k]]))[:k]
        assert direct.tolist() == merged.tolist()


def test_estimator_is_exact_for_identical_and_disjoint():
    k = 8
    A = np.arange(20, dtype=np.uint64)
    num, den = bottomk._estimate(
        np.zeros(2 * k, np.int64), np.concatenate([A[:k], A[:k]]), k, 1)
    assert num[0] == den[0] == k            # J = 1 → est 1
    B = np.arange(100, 120, dtype=np.uint64)
    num, den = bottomk._estimate(
        np.zeros(2 * k, np.int64), np.concatenate([A[:k], B[:k]]), k, 1)
    assert num[0] == 0 and den[0] == k      # J = 0 → est 0


def test_pairs_oracle(con):
    got = bottomk.bottomk_sig_pairs(SF).to_pandas().reset_index(drop=True)
    want = con.execute(bottomk.bottomk_sig_pairs_sql()).fetchdf().astype(
        {"est_bp": "int64"})
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))


def test_estimator_eval_oracle(con):
    got = bottomk.bottomk_estimator_eval(SF).to_pandas()
    want = con.execute(bottomk.bottomk_estimator_eval_sql()).fetchdf()
    ints = [c for c in want.columns if c != "tier"]
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want.astype({c: "int64" for c in ints}).reset_index(drop=True))


def test_partition_invariance():
    a = bottomk.bottomk_sig_pairs(SF, num_partitions=3).to_pandas()
    b = bottomk.bottomk_sig_pairs(SF, num_partitions=16).to_pandas()
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))


def test_distinct_estimate_oracle_and_error(con):
    got = bottomk.bottomk_distinct_estimate(SF).to_pandas()
    want = con.execute(bottomk.bottomk_distinct_estimate_sql()).fetchdf()
    pd.testing.assert_frame_equal(
        got.astype("int64").reset_index(drop=True),
        want.astype("int64").reset_index(drop=True))
    # relative error of a k=1024 bottom-k cardinality estimate is
    # ~1/sqrt(k-2) ≈ 3.1%; assert a loose 10% band vs exact truth
    from data_dedup_ray.corpus import WEB_PAGES_CTE
    truth = con.execute(
        f"WITH {WEB_PAGES_CTE}, toks AS (SELECT url,"
        " regexp_extract_all(text, '[a-z0-9]+') AS t FROM web_pages),"
        " sh AS (SELECT DISTINCT array_to_string(t[i:i+4], ' ') AS s"
        " FROM toks, UNNEST(generate_series(1, len(t)-4)) AS g(i)"
        " WHERE len(t) >= 5) SELECT count(*) FROM sh").fetchone()[0]
    est = int(got["n_distinct_est"].iloc[0])
    assert abs(est - truth) / truth < 0.10


def test_distinct_estimate_exact_below_k(con):
    """With fewer than k distinct values the sketch IS the set: k above
    the corpus' distinct-shingle count must report the EXACT count —
    end-to-end through the pipeline and its oracle."""
    k = 1 << 20
    got = bottomk.bottomk_distinct_estimate(SF, k=k).to_pandas()
    want = con.execute(
        bottomk.bottomk_distinct_estimate_sql(k=k)).fetchdf()
    pd.testing.assert_frame_equal(
        got.astype("int64").reset_index(drop=True),
        want.astype("int64").reset_index(drop=True))
    from data_dedup_ray.pipelines.sigstore import sig_chain_ctes
    truth = con.execute(
        f"WITH {sig_chain_ctes(single_corpus=True)}"
        " SELECT count(DISTINCT s) FROM msh").fetchone()[0]
    assert int(got["n_distinct_est"].iloc[0]) == truth


def test_exact_copies_estimate_10000():
    """Planted byte-identical mirrors (doc_id % 10 == 0) must estimate
    J = 1 exactly: est_bp = 10000 rows for every mirror/base pair."""
    got = bottomk.bottomk_sig_pairs(SF).to_pandas()
    mirrors = got[got["url_b"].str.startswith("https://mirror")
                  | got["url_a"].str.startswith("https://mirror")]
    assert len(mirrors) > 0
    full = got[got["est_bp"] == 10000]
    assert len(full) >= len(mirrors[mirrors["est_bp"] == 10000]) > 0
