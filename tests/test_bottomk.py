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


def _store(tmp_path, name):
    return str(tmp_path / name)


def test_incremental_store_pairs_oracle(con, tmp_path):
    from data_dedup_ray.corpus import web_pages
    from data_dedup_ray.pipelines import snapshots
    store = _store(tmp_path, "bk_store")
    bottomk.build_bottomk_store(web_pages(SF), store, token_hash="sha")
    got = bottomk.incremental_bottomk_pairs(
        snapshots.snapshot2(SF), store).to_pandas().reset_index(drop=True)
    want = con.execute(
        bottomk.incremental_bottomk_pairs_sql()).fetchdf().astype(
        {"est_bp": "int64"})
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))


def test_store_config_mismatch_fails_loudly(tmp_path):
    from data_dedup_ray.corpus import web_pages
    from data_dedup_ray.pipelines import snapshots
    store = _store(tmp_path, "bk_cfg")
    bottomk.build_bottomk_store(web_pages(SF), store, k=16,
                                token_hash="sha")
    with pytest.raises(ValueError):
        bottomk.incremental_bottomk_pairs(
            snapshots.snapshot2(SF), store, k=32)


def test_store_merge_reproduces_full_build(tmp_path):
    """Disjoint-url slice stores merge to the byte-identical full-corpus
    store — the lossless roll-up."""
    from data_dedup_ray.corpus import web_pages
    from data_dedup_ray.pipelines.fpstore import _read_store
    pages = web_pages(SF)

    def half(par):
        def fn(df):
            return df[(df["inode_id"] % 2) == par]
        return fn

    sa, sb, sm, full = (_store(tmp_path, n)
                        for n in ("a", "b", "m", "full"))
    bottomk.build_bottomk_store(
        pages.map_batches(half(0), batch_format="pandas"), sa,
        token_hash="sha")
    bottomk.build_bottomk_store(
        pages.map_batches(half(1), batch_format="pandas"), sb,
        token_hash="sha")
    bottomk.merge_bottomk_stores([sa, sb], sm)
    bottomk.build_bottomk_store(pages, full, token_hash="sha")
    a = _read_store(sm).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    b = _read_store(full).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    a["bk"] = a["bk"].apply(bytes)
    b["bk"] = b["bk"].apply(bytes)
    pd.testing.assert_frame_equal(a, b)


def test_store_merge_overlapping_urls(tmp_path):
    """Same url in BOTH stores with different shingle sets: merged
    sketch must equal bottom-k of the two sketches' union (the Cohen &
    Kaplan law, end-to-end through parquet)."""
    import ray.data

    from data_dedup_ray.pipelines.fpstore import _read_store
    d1 = ray.data.from_pandas(pd.DataFrame({
        "url": ["u1", "u2"],
        "text": ["alpha beta gamma delta epsilon zeta eta",
                 "one two three four five six seven"]}))
    d2 = ray.data.from_pandas(pd.DataFrame({
        "url": ["u1", "u3"],
        "text": ["alpha beta gamma delta epsilon NINE TEN eleven",
                 "eight nine ten eleven twelve"]}))
    sa, sb, sm = (_store(tmp_path, n) for n in ("oa", "ob", "om"))
    k = 4
    bottomk.build_bottomk_store(d1, sa, k=k, token_hash="sha")
    bottomk.build_bottomk_store(d2, sb, k=k, token_hash="sha")
    bottomk.merge_bottomk_stores([sa, sb], sm, k=k)
    m = {r["url"]: bytes(r["bk"])
         for r in _read_store(sm).to_pandas().to_dict("records")}
    a = {r["url"]: bytes(r["bk"])
         for r in _read_store(sa).to_pandas().to_dict("records")}
    b = {r["url"]: bytes(r["bk"])
         for r in _read_store(sb).to_pandas().to_dict("records")}
    assert set(m) == {"u1", "u2", "u3"}
    u1 = np.unique(np.concatenate([
        np.frombuffer(a["u1"], np.uint64),
        np.frombuffer(b["u1"], np.uint64)]))[:k]
    assert m["u1"] == u1.tobytes()
    assert m["u2"] == a["u2"] and m["u3"] == b["u3"]


def test_estimate_sides_agrees_with_plain_kernel():
    """The side-aware kernel's (num, den_u) must equal the reference
    kernel for every random pair."""
    rng = np.random.default_rng(17)
    k = 8
    pids, vals, sides = [], [], []
    for p in range(200):
        A = np.unique(rng.integers(0, 50, size=rng.integers(1, 25))
                      .astype(np.uint64))[:k]
        B = np.unique(rng.integers(0, 50, size=rng.integers(1, 25))
                      .astype(np.uint64))[:k]
        pids.append(np.full(len(A) + len(B), p))
        vals.append(np.concatenate([A, B]))
        sides.append(np.concatenate([np.zeros(len(A), np.int64),
                                     np.ones(len(B), np.int64)]))
    pid = np.concatenate(pids).astype(np.int64)
    v = np.concatenate(vals)
    s = np.concatenate(sides)
    n1, d1 = bottomk._estimate(pid, v, k, 200)
    n2, d2, ia, ib = bottomk._estimate_sides(pid, v, s, k, 200)
    assert (n1 == n2).all() and (d1 == d2).all()
    assert (ia <= d2).all() and (ib <= d2).all()
    assert (ia + ib >= d2).all()          # every U value is in A or B


def test_containment_pairs_oracle(con):
    got = bottomk.bottomk_containment_pairs(SF).to_pandas()
    want = con.execute(bottomk.bottomk_containment_pairs_sql()).fetchdf() \
        .astype({"cont_ab_bp": "int64", "cont_ba_bp": "int64"})
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True))


def test_containment_catches_quote_family():
    """quote pages (base text + appended span) must show high
    containment of the base (A = base side: C(A→B) ≈ 1) even where
    Jaccard is diluted."""
    got = bottomk.bottomk_containment_pairs(SF, min_cont_bp=9000) \
        .to_pandas()
    q = got[got["url_b"].str.startswith("https://quote")
            | got["url_a"].str.startswith("https://quote")]
    assert len(q) > 0
    assert (q[["cont_ab_bp", "cont_ba_bp"]].max(axis=1) >= 9000).all()


def test_host_distinct_shingles_oracle(con):
    got = bottomk.host_distinct_shingles(SF).to_pandas()
    want = con.execute(bottomk.host_distinct_shingles_sql()).fetchdf() \
        .astype({"n_pages": "int64", "n_distinct_est": "int64"})
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True))


def test_host_distinct_shingles_batch_invariance():
    """Partial sketches must merge identically however batches split."""
    a = bottomk.host_distinct_shingles(SF, num_partitions=3).to_pandas()
    b = bottomk.host_distinct_shingles(SF, num_partitions=16).to_pandas()
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))


def test_bottomk_clusters_oracle(con):
    got = bottomk.bottomk_clusters(SF).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    want = con.execute(bottomk.bottomk_clusters_sql()).fetchdf() \
        .sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_bottomk_clusters_fallback_matches_dsu(con):
    dsu = bottomk.bottomk_clusters(SF).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    lp = bottomk.bottomk_clusters(SF, dsu_max_edges=0).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(dsu, lp)


def test_exact_copies_estimate_10000():
    """Planted byte-identical mirrors (doc_id % 10 == 0) must estimate
    J = 1 exactly: est_bp = 10000 rows for every mirror/base pair."""
    got = bottomk.bottomk_sig_pairs(SF).to_pandas()
    mirrors = got[got["url_b"].str.startswith("https://mirror")
                  | got["url_a"].str.startswith("https://mirror")]
    assert len(mirrors) > 0
    full = got[got["est_bp"] == 10000]
    assert len(full) >= len(mirrors[mirrors["est_bp"] == 10000]) > 0
