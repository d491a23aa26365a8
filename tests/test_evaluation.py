"""Dedup-tier quality metrics: integer-exact precision/recall/F1 of the
cheap tiers against exact-Jaccard truth, with a full DuckDB twin."""

import duckdb
import pandas as pd
import pyarrow as pa
import ray.data

from data_dedup_ray import oracles
from data_dedup_ray.corpus import web_pages
from data_dedup_ray.pipelines import evaluation

SF = "/root/testdata/sf0.001"


def _pairs(rows):
    return ray.data.from_arrow(pa.table({
        "url_a": [a for a, _ in rows], "url_b": [b for _, b in rows],
    }))


def _metrics(pred, true, P=4):
    return evaluation.dedup_pair_metrics(
        _pairs(pred), _pairs(true), tier="t", num_partitions=P
    ).to_pandas().iloc[0]


def test_micro_metrics_exact():
    pred = [("a", "b"), ("a", "c"), ("d", "e")]
    true = [("a", "b"), ("d", "e"), ("f", "g")]
    m = _metrics(pred, true)
    assert (m.n_pred, m.n_true, m.n_hit) == (3, 3, 2)
    assert m.precision_bp == 10000 * 2 // 3
    assert m.recall_bp == 10000 * 2 // 3
    assert m.f1_bp == 20000 * 2 // 6


def test_identical_and_disjoint_sets():
    same = [("a", "b"), ("c", "d")]
    m = _metrics(same, same)
    assert (m.precision_bp, m.recall_bp, m.f1_bp) == (10000, 10000, 10000)
    m = _metrics([("a", "b")], [("c", "d")])
    assert (m.n_hit, m.precision_bp, m.recall_bp, m.f1_bp) == (0, 0, 0, 0)


def test_duplicate_pair_rows_collapse():
    # a detector emitting the same pair twice must not double-count
    m = _metrics([("a", "b"), ("a", "b")], [("a", "b")])
    assert (m.n_pred, m.n_hit, m.precision_bp) == (1, 1, 10000)


def test_empty_pred_side():
    m = evaluation.dedup_pair_metrics(
        ray.data.from_arrow(evaluation._PAIR_SCHEMA.empty_table()),
        _pairs([("a", "b")]), tier="t", num_partitions=2,
    ).to_pandas().iloc[0]
    assert (m.n_pred, m.n_true, m.precision_bp, m.recall_bp) == (0, 1, 0, 0)


def test_tier_eval_matches_sql_oracle():
    got = evaluation.dedup_tier_eval(
        web_pages(SF).select_columns(["url", "text"])
    ).to_pandas().sort_values("tier").reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    exp = con.execute(oracles.dedup_tier_eval_sql()).df(
    ).sort_values("tier").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype(str), exp.astype(str))
    # the eval is informative at this scale: simhash is the
    # high-precision tier, truth is non-trivial
    sim = got[got.tier == "simhash_sha"].iloc[0]
    assert sim.n_true > 0 and sim.precision_bp > 9000


def test_partition_invariance():
    pages = web_pages(SF).select_columns(["url", "text"])
    a = evaluation.dedup_tier_eval(pages, num_partitions=1).to_pandas()
    b = evaluation.dedup_tier_eval(pages, num_partitions=16).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("tier").reset_index(drop=True),
        b.sort_values("tier").reset_index(drop=True))


def test_threshold_sweep_matches_sql_and_is_monotone():
    got = evaluation.simhash_threshold_sweep(
        web_pages(SF).select_columns(["url", "text"])
    ).to_pandas().sort_values("tier").reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    exp = con.execute(oracles.simhash_threshold_sweep_sql()).df(
    ).sort_values("tier").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype(str), exp.astype(str))
    # the curve behaves like a curve: looser cutoff => more predictions
    # and at least as many hits (recall non-decreasing)
    assert list(got.tier) == ["h0", "h1", "h2", "h3"]
    assert got.n_pred.is_monotonic_increasing
    assert got.n_hit.is_monotonic_increasing
    assert got.recall_bp.is_monotonic_increasing
    # hamming-0 = identical sha fingerprints: every such pair is a real
    # near-dup on this corpus
    assert got.iloc[0].precision_bp == 10000


def test_dedup_savings_matches_sql_and_keep_first():
    pages = web_pages(SF).select_columns(["url", "text"])
    got = evaluation.dedup_savings(pages).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    exp = con.execute(oracles.dedup_savings_sql()).df()
    pd.testing.assert_frame_equal(
        got.sort_index(axis=1).astype(str),
        exp.sort_index(axis=1).astype(str))
    m = got.iloc[0]
    # removed docs == exactly what near_dup_keep_first drops
    from data_dedup_ray.pipelines import clean
    kept = clean.near_dup_keep_first(SF).count()
    assert m.n_docs - m.n_removed == kept
    assert 0 < m.tokens_removed_bp < 10000


def test_dedup_savings_no_dups_zero():
    import pyarrow as pa
    import ray.data
    docs = ray.data.from_arrow(pa.table({
        "url": [f"u{i}" for i in range(4)],
        "text": [f"completely distinct document number {i} "
                 f"with its own unique words w{i}a w{i}b w{i}c w{i}d"
                 for i in range(4)]}))
    m = evaluation.dedup_savings(docs, num_partitions=2
                                 ).to_pandas().iloc[0]
    assert (m.n_removed, m.tokens_removed, m.tokens_removed_bp) == (0, 0, 0)
    assert m.n_docs == 4 and m.tokens_total > 0


def test_sig_estimator_eval_matches_sql_and_recall_bar():
    import shutil

    from data_dedup_ray.pipelines import near, sigstore, snapshots
    from data_dedup_ray.pipelines import evaluation as ev

    store = "/tmp/test_sigeval_store"
    shutil.rmtree(store, ignore_errors=True)
    sigstore.build_signature_store(web_pages(SF), store,
                                   token_hash="sha")
    pred = sigstore.incremental_sig_near_pairs(
        snapshots.snapshot2(SF), store, threshold=0.7,
        token_hash="sha")
    truth = near.cross_corpus_near_pairs(
        snapshots.snapshot2(SF), web_pages(SF), threshold=0.7)
    got = ev.estimator_pair_eval(pred, truth,
                                 tier="sig_estimate").to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    exp = con.execute(oracles.sig_estimator_eval_sql()).df()
    pd.testing.assert_frame_equal(
        got.sort_index(axis=1).astype(str),
        exp.sort_index(axis=1).astype(str))
    # the north-rule bar: dup-pair recall >= 0.99 from stored
    # signatures alone (and precision stays high)
    m = got.iloc[0]
    assert m.recall_bp >= 9900 and m.precision_bp >= 9900


def test_ensemble_oracle_unchanged_by_fragment_refactor():
    """The shared-CTE extraction must leave ensemble_clusters_sql's
    result identical (regression for the oracles.py refactor)."""
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    df = con.execute(oracles.ensemble_clusters_sql()).df()
    from data_dedup_ray.corpus import web_pages_sql
    n = con.execute(web_pages_sql(
        "SELECT count(*) AS n FROM web_pages")).fetchone()[0]
    assert len(df) == n > 0 and set(df.columns) == {"url", "cluster_id"}
    assert (df.cluster_id <= df.url).all()


def _assign(items):
    return ray.data.from_items(
        [{"url": u, "cluster_id": c} for u, c in items])


def _brute_rand(a: dict, b: dict):
    """Pair-counting reference: iterate all unordered doc pairs."""
    from itertools import combinations

    ids = sorted(a)
    n = len(ids)
    big_c = n * (n - 1) // 2
    s_a = s_b = s_ab = 0
    for x, y in combinations(ids, 2):
        ta, tb = a[x] == a[y], b[x] == b[y]
        s_a += ta
        s_b += tb
        s_ab += ta and tb
    rand_bp = 10000 * (big_c - s_a - s_b + 2 * s_ab) // big_c
    num = 10000 * 2 * (big_c * s_ab - s_a * s_b)
    den = big_c * (s_a + s_b) - 2 * s_a * s_b
    if den == 0:
        ari_bp = 10000
    else:
        q = abs(num) // abs(den)
        ari_bp = -q if (num < 0) != (den < 0) else q
    return n, s_a, s_b, s_ab, rand_bp, ari_bp


def test_rand_index_micro():
    a = {"1": "x", "2": "x", "3": "x", "4": "y", "5": "y", "6": "z"}
    b = {"1": "p", "2": "p", "3": "q", "4": "q", "5": "q", "6": "r"}
    got = evaluation.clustering_rand_index(
        _assign(a.items()), _assign(b.items()),
        num_partitions=4).to_pandas().iloc[0]
    n, s_a, s_b, s_ab, rand_bp, ari_bp = _brute_rand(a, b)
    assert got["n_docs"] == n
    assert (int(got["s_a"]), int(got["s_b"]), int(got["s_ab"])) \
        == (s_a, s_b, s_ab)
    assert got["rand_bp"] == rand_bp
    assert got["ari_bp"] == ari_bp


def test_rand_index_laws():
    a = {str(i): f"c{i % 3}" for i in range(12)}
    # identical partitions (relabeled): RI = ARI = 1
    b = {k: v.replace("c", "k") for k, v in a.items()}
    got = evaluation.clustering_rand_index(
        _assign(a.items()), _assign(b.items()),
        num_partitions=3).to_pandas().iloc[0]
    assert got["rand_bp"] == 10000 and got["ari_bp"] == 10000
    # all-singletons vs all-singletons: degenerate-identical → 10000
    s = {str(i): str(i) for i in range(5)}
    got = evaluation.clustering_rand_index(
        _assign(s.items()), _assign(s.items()),
        num_partitions=2).to_pandas().iloc[0]
    assert got["rand_bp"] == 10000 and got["ari_bp"] == 10000
    # independent-looking split: ARI can go negative; engine must agree
    # with the brute-force reference exactly (trunc-toward-zero)
    a2 = {"1": "x", "2": "x", "3": "y", "4": "y"}
    b2 = {"1": "p", "2": "q", "3": "p", "4": "q"}
    got = evaluation.clustering_rand_index(
        _assign(a2.items()), _assign(b2.items()),
        num_partitions=2).to_pandas().iloc[0]
    _, _, _, _, rand_bp, ari_bp = _brute_rand(a2, b2)
    assert got["rand_bp"] == rand_bp
    assert got["ari_bp"] == ari_bp and ari_bp < 0


def test_rand_index_partition_invariance():
    a = {str(i): f"c{i % 4}" for i in range(40)}
    b = {str(i): f"k{i % 5}" for i in range(40)}
    outs = [evaluation.clustering_rand_index(
        _assign(a.items()), _assign(b.items()),
        num_partitions=p).to_pandas() for p in (1, 7)]
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_clustering_agreement_matches_sql_oracle():
    got = evaluation.clustering_agreement(SF).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = con.execute(evaluation.clustering_agreement_sql()).fetchdf()
    assert len(got) == len(want) == 1
    for c in got.columns:
        assert str(got[c].iloc[0]) == str(want[c].iloc[0]), c
    # tightening the threshold only splits clusters (refinement):
    # every pair co-clustered in B is co-clustered in A
    assert int(got["s_ab"].iloc[0]) == int(got["s_b"].iloc[0])


def test_bbit_and_oph_estimator_evals_match_sql(ray_session):
    """The 16 B b-bit tier and the cheap OPH kernel join the
    estimator-quality ladder: both metric rows pinned by their SQL
    twins; the b-bit estimator clears the north-rule recall bar on
    this corpus."""
    import duckdb

    import __ray_entry__ as entry
    from data_dedup_ray import oracles

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    for key, sql in (
            ("bbit_estimator_eval", oracles.bbit_estimator_eval_sql()),
            ("oph_estimator_eval", oracles.oph_estimator_eval_sql())):
        got = entry.queries()[key](sf).to_pandas()
        want = con.execute(sql).fetchdf()
        pd.testing.assert_frame_equal(got.sort_index(axis=1),
                                      want.sort_index(axis=1),
                                      check_dtype=False)
    bb = entry.queries()["bbit_estimator_eval"](sf).to_pandas().iloc[0]
    assert bb["recall_bp"] >= 9900 and bb["n_true"] > 0


def test_lsh_config_recall_matches_sql_and_laws(ray_session):
    """The (b, r) banding tuning table pinned bit-for-bit; candidate
    volume shrinks monotonically as rows-per-band grow while recall
    holds on this corpus."""
    import duckdb

    from data_dedup_ray.pipelines import evaluation

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    got = evaluation.lsh_config_recall(sf).to_pandas() \
        .sort_values("tier").reset_index(drop=True)
    want = con.execute(evaluation.lsh_config_recall_sql()).fetchdf() \
        .sort_values("tier").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.sort_index(axis=1),
                                  want.sort_index(axis=1),
                                  check_dtype=False)
    by_r = got.set_index("tier")
    assert by_r.loc["bandr_2", "n_pred"] > by_r.loc["bandr_3", "n_pred"] \
        > by_r.loc["bandr_6", "n_pred"]
    assert (got["recall_bp"] == 10000).all()
    assert by_r.loc["bandr_6", "precision_bp"] \
        > by_r.loc["bandr_2", "precision_bp"]


def test_shingle_k_sweep_matches_sql(ray_session):
    import duckdb

    from data_dedup_ray.pipelines import evaluation

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    got = evaluation.shingle_k_sweep(sf).to_pandas() \
        .sort_values("shingle_k").reset_index(drop=True)
    want = con.execute(evaluation.shingle_k_sweep_sql()).fetchdf() \
        .sort_values("shingle_k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.sort_index(axis=1),
                                  want.sort_index(axis=1),
                                  check_dtype=False)
    base = got[got["shingle_k"] == 5].iloc[0]
    assert base["jaccard_to_base_bp"] == 10000
    assert base["n_pairs"] == base["n_shared_with_base"]
    assert (got["n_shared_with_base"] <= got["n_pairs"]).all()
