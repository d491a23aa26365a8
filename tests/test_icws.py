"""ICWS weighted-Jaccard sketches (pipelines/icws.py): estimator
unbiasedness vs exact WJ, CWS collision law, determinism/batch
invariance, pipeline recall vs the exact weighted truth."""

import numpy as np
import pandas as pd
import pytest

from data_dedup_ray.pipelines import icws

SF = "/root/testdata/sf0.001"


def _sets_to_flat(sets):
    vals, cnts, sizes = [], [], []
    for s in sets:
        ks = sorted(s)
        vals.append(np.array(ks, np.uint64))
        cnts.append(np.array([s[k] for k in ks], np.int64))
        sizes.append(len(ks))
    return (np.concatenate(vals), np.concatenate(cnts),
            np.array(sizes, np.int64))


def _wj(a, b):
    keys = set(a) | set(b)
    num = sum(min(a.get(k, 0), b.get(k, 0)) for k in keys)
    den = sum(max(a.get(k, 0), b.get(k, 0)) for k in keys)
    return num / den


def test_estimator_unbiased_within_binomial_bound():
    rng = np.random.default_rng(2)
    K = 2048
    for _ in range(5):
        a = {int(rng.integers(0, 60)): int(rng.integers(1, 9))
             for _ in range(25)}
        b = dict(a)
        for k in list(b)[:8]:
            b[k] = max(1, b[k] + int(rng.integers(-3, 4)))
        b[999] = 4
        vals, cnts, sizes = _sets_to_flat([a, b])
        sig = icws.icws_signatures_flat(vals, cnts, sizes, n_samples=K)
        est = (sig[0] == sig[1]).mean()
        true = _wj(a, b)
        # 5 sigma of the binomial std
        assert abs(est - true) <= 5 * np.sqrt(true * (1 - true) / K) + 1e-9


def test_identical_sets_collide_everywhere_and_disjoint_never():
    a = {i: i % 5 + 1 for i in range(30)}
    d = {i + 1000: 3 for i in range(30)}
    vals, cnts, sizes = _sets_to_flat([a, a, d])
    sig = icws.icws_signatures_flat(vals, cnts, sizes, n_samples=256)
    assert (sig[0] == sig[1]).all()
    assert not (sig[0] == sig[2]).any()


def test_signature_is_batch_invariant():
    """A doc's signature must not depend on which other docs share its
    batch (pure function of the weighted set)."""
    a = {1: 2, 5: 1, 9: 7}
    b = {2: 4, 5: 5}
    va, ca, sa = _sets_to_flat([a])
    vab, cab, sab = _sets_to_flat([a, b])
    s1 = icws.icws_signatures_flat(va, ca, sa, n_samples=64)
    s2 = icws.icws_signatures_flat(vab, cab, sab, n_samples=64)
    assert (s1[0] == s2[0]).all()


def test_weight_sensitivity():
    """Doubling every count leaves WJ=1 with itself but changes WJ vs
    the original — the sketch must see it (unlike set MinHash)."""
    a = {i: 1 for i in range(40)}
    b = {i: 2 for i in range(40)}       # WJ(a,b) = 40/80 = 0.5
    vals, cnts, sizes = _sets_to_flat([a, b])
    sig = icws.icws_signatures_flat(vals, cnts, sizes, n_samples=2048)
    est = (sig[0] == sig[1]).mean()
    assert abs(est - 0.5) < 0.06


def test_pipeline_recall_vs_exact_weighted_truth():
    from data_dedup_ray.pipelines import weighted
    pred = icws.icws_sig_pairs(SF, min_est_bp=5000).to_pandas()
    truth = weighted.weighted_jaccard_sig_pairs(
        SF, min_wjac_bp=7000).to_pandas()
    ps = set(zip(pred["url_a"], pred["url_b"]))
    ts = set(zip(truth["url_a"], truth["url_b"]))
    assert ts and len(ps & ts) / len(ts) >= 0.98


def test_estimator_eval_row():
    ev = icws.icws_estimator_eval(SF).to_pandas()
    assert ev["tier"].iloc[0] == "icws64"
    assert int(ev["recall_bp"].iloc[0]) >= 9000
    assert int(ev["n_true"].iloc[0]) > 0


# ---- fixed (integer-exact, SQL-twinned) mode ----


def test_fixed_tables_shape_and_monotone():
    lnq, lnw, lgc = icws._fixed_tables()
    assert len(lnq) == 4096 and len(lgc) == 4096 and len(lnw) == 4097
    # ln is increasing; inverse-CDF of a distribution is increasing
    assert (np.diff(lnq) >= 0).all() and (lnq < 0).all()
    assert (np.diff(lnw[1:]) >= 0).all() and lnw[1] == 0
    assert (np.diff(lgc) >= 0).all()
    # r = -(lnq_i + lnq_j) is strictly positive for every index pair
    assert -(lnq[-1] + lnq[-1]) > 0


def test_fixed_identical_sets_collide_everywhere():
    vals = np.arange(1, 40, dtype=np.uint64) * np.uint64(2654435761)
    cnts = (np.arange(39) % 5 + 1).astype(np.int64)
    flat_v = np.concatenate([vals, vals])
    flat_c = np.concatenate([cnts, cnts])
    sizes = np.array([39, 39], np.int64)
    sv, st = icws.icws_fixed_signatures_flat(flat_v, flat_c, sizes,
                                             n_samples=32)
    assert (sv[0] == sv[1]).all() and (st[0] == st[1]).all()
    # disjoint sets never collide on v
    flat_v2 = np.concatenate([vals, vals + np.uint64(1)])
    sv2, _ = icws.icws_fixed_signatures_flat(flat_v2, flat_c, sizes,
                                             n_samples=32)
    assert not (sv2[0] == sv2[1]).any()


def test_fixed_signature_batch_invariant():
    rng = np.random.default_rng(7)
    vals = rng.integers(1, 2**63, size=120, dtype=np.uint64)
    cnts = rng.integers(1, 9, size=120).astype(np.int64)
    sizes = np.array([50, 70], np.int64)
    sv, st = icws.icws_fixed_signatures_flat(vals, cnts, sizes,
                                             n_samples=16)
    sv0, st0 = icws.icws_fixed_signatures_flat(
        vals[:50], cnts[:50], np.array([50], np.int64), n_samples=16)
    sv1, st1 = icws.icws_fixed_signatures_flat(
        vals[50:], cnts[50:], np.array([70], np.int64), n_samples=16)
    assert (sv[0] == sv0[0]).all() and (st[1] == st1[0]).all()


def test_fixed_empty_doc_rows():
    sv, st = icws.icws_fixed_signatures_flat(
        np.empty(0, np.uint64), np.empty(0, np.int64),
        np.array([0, 0], np.int64), n_samples=8)
    assert (sv == 0).all() and (st == -1).all()


@pytest.fixture(scope="module")
def con():
    import duckdb
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    return c


def test_fixed_pairs_sql_parity(con):
    got = (icws.icws_fixed_sig_pairs(SF).to_pandas()
           .reset_index(drop=True))
    want = con.execute(icws.icws_fixed_pairs_sql()).fetchdf() \
        .astype({"est_bp": "int64"})
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))
    assert len(got) > 0


def test_fixed_estimator_eval_sql_parity(con):
    got = icws.icws_fixed_estimator_eval(SF).to_pandas() \
        .reset_index(drop=True)
    want = con.execute(icws.icws_fixed_estimator_eval_sql()).fetchdf()
    want = want.astype({c: "int64" for c in want.columns if c != "tier"})
    pd.testing.assert_frame_equal(got.sort_index(axis=1),
                                  want.sort_index(axis=1))
    # the graded tier must stay a usable detector
    assert got["recall_bp"].iloc[0] >= 9000
    assert got["precision_bp"].iloc[0] >= 9000


def test_fixed_pairs_partition_invariance():
    a = icws.icws_fixed_sig_pairs(SF, num_partitions=3).to_pandas()
    b = icws.icws_fixed_sig_pairs(SF, num_partitions=16).to_pandas()
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))


def test_fixed_incremental_store_parity(con, tmp_path):
    """The persisted fixed-ICWS store rung: build → incremental query
    equals the tagged-union SQL twin bit-for-bit; config mismatch fails
    loudly; store reuse skips the rebuild (resumable sink)."""
    store = str(tmp_path / "icwsfx_store")
    got = icws.incremental_icws_fixed_pairs_web(
        SF, store_dir=store).to_pandas().reset_index(drop=True)
    want = con.execute(icws.incremental_icws_fixed_pairs_sql()) \
        .fetchdf().astype({"est_bp": "int64"})
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))
    assert len(got) > 0
    # mismatched parameters must be rejected by config lineage
    from data_dedup_ray.pipelines.snapshots import snapshot2
    with pytest.raises(ValueError):
        icws.incremental_icws_fixed_pairs(snapshot2(SF), store,
                                          n_samples=32)
    # second run against the existing store reproduces the result
    again = icws.incremental_icws_fixed_pairs_web(
        SF, store_dir=store).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, again)


def test_fixed_clusters_closure_oracle(con):
    got = (icws.icws_fixed_clusters(SF).to_pandas()
           .sort_values("url").reset_index(drop=True))
    want = con.execute(icws.icws_fixed_clusters_sql()).fetchdf() \
        .sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert (got["cluster_id"] <= got["url"]).all()  # min-member labels


def test_fixed_estimator_tracks_wj_within_binomial_bound():
    """The quantized-draw fixed mode must still estimate WJ: lane match
    fraction within 5σ binomial + a small quantization allowance
    (12-bit inverse-CDF tables ⇒ per-lane bias O(2⁻¹²))."""
    rng = np.random.default_rng(7)
    K = 2048
    for _ in range(5):
        a = {int(rng.integers(0, 1 << 60)): int(rng.integers(1, 9))
             for _ in range(25)}
        b = dict(a)
        for k in list(b)[:8]:
            b[k] = max(1, b[k] + int(rng.integers(-3, 4)))
        b[int(rng.integers(0, 1 << 60))] = 4
        vals, cnts, sizes = _sets_to_flat([a, b])
        sv, st = icws.icws_fixed_signatures_flat(vals, cnts, sizes,
                                                 n_samples=K)
        est = ((sv[0] == sv[1]) & (st[0] == st[1])).mean()
        true = _wj(a, b)
        bound = 5 * np.sqrt(true * (1 - true) / K) + 0.01
        assert abs(est - true) <= bound, (est, true, bound)


def test_fixed_incremental_disjoint_slices_roll_up(tmp_path):
    """A list of disjoint crawl-slice sketch stores must reproduce the
    single full-store result exactly."""
    import pyarrow.compute as pc
    from data_dedup_ray.corpus import web_pages
    from data_dedup_ray.pipelines.snapshots import snapshot2

    full, s1, s2 = (str(tmp_path / n) for n in ("full", "s1", "s2"))
    pages = web_pages(SF).materialize()
    icws.build_icws_fixed_store(pages, full)

    def half(which):
        def fn(t):
            keep = pc.equal(
                pc.bit_wise_and(pc.utf8_length(t["url"]), 1), which)
            return t.filter(keep)
        return fn

    icws.build_icws_fixed_store(
        pages.map_batches(half(0), batch_format="pyarrow"), s1)
    icws.build_icws_fixed_store(
        pages.map_batches(half(1), batch_format="pyarrow"), s2)
    new = snapshot2(SF)
    a = icws.incremental_icws_fixed_pairs(new, full) \
        .to_pandas().reset_index(drop=True)
    b = icws.incremental_icws_fixed_pairs(new, [s1, s2]) \
        .to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0
