"""Dedup policy planners: soft-dedup weights and the Jaccard threshold
sweep — micro-exact laws, partition invariance, distributed-fallback
identity, and full SQL-oracle parity."""

import duckdb
import pandas as pd
import ray

from data_dedup_ray.pipelines import policy

SF = "/root/testdata/sf0.001"

_BASE = ("quick brown fox jumps over the lazy dog while seven wizards "
         "brew strong potions under a silver moon and the river sings "
         "softly through tall pines where owls watch patient travelers "
         "carry bright lanterns toward the distant harbor gates tonight")
_DOCS = {
    "a": _BASE,
    "b": _BASE.replace("silver", "golden"),   # j(a,b) ≈ 0.76
    "d": ("completely different content describing spacecraft "
          "navigation systems orbiting remote planets using ion "
          "thrusters plus gravity assists plotted by careful engineers"),
    "e": _BASE,                               # j(a,e) = 1.0
}


def _ds():
    return ray.data.from_items(
        [{"url": k, "text": v} for k, v in _DOCS.items()])


def test_soft_weights_micro(ray_session):
    w = (policy.soft_dedup_weights(_ds(), num_partitions=4).to_pandas()
         .set_index("url"))
    assert set(w.index) == set(_DOCS)
    # {a, b, e} is one near-dup family → each member weighted 10000//3
    for u in "abe":
        assert w.loc[u, "cluster_id"] == "a"
        assert w.loc[u, "n_copies"] == 3
        assert w.loc[u, "weight_bp"] == 3333
    # the unique page keeps full weight
    assert w.loc["d", "n_copies"] == 1
    assert w.loc["d", "weight_bp"] == 10000
    # family mass law: a cluster of size m contributes m*(10000//m) bp,
    # never more than one full document
    mass = w.groupby("cluster_id")["weight_bp"].sum()
    assert (mass <= 10000).all()


def test_soft_weights_partition_invariance(ray_session):
    a = (policy.soft_dedup_weights(_ds(), num_partitions=1).to_pandas()
         .sort_values("url").reset_index(drop=True))
    b = (policy.soft_dedup_weights(_ds(), num_partitions=7).to_pandas()
         .sort_values("url").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_sweep_micro_curve(ray_session):
    got = (policy.dedup_threshold_sweep(
        _ds(), thresholds_bp=(7000, 9000), num_partitions=4)
        .to_pandas().set_index("t_bp"))
    # at 0.7: pairs a-b, a-e, b-e → one 3-doc component, 2 removals
    assert got.loc[7000, "n_dup_pairs"] == 3
    assert got.loc[7000, "n_dup_docs"] == 3
    assert got.loc[7000, "n_clusters"] == 1
    assert got.loc[7000, "n_removed"] == 2
    assert got.loc[7000, "docs_kept"] == len(_DOCS) - 2
    # at 0.9: only the exact copy a-e survives → 1 removal
    assert got.loc[9000, "n_dup_pairs"] == 1
    assert got.loc[9000, "n_dup_docs"] == 2
    assert got.loc[9000, "n_clusters"] == 1
    assert got.loc[9000, "n_removed"] == 1


def test_sweep_monotone_laws(ray_session):
    got = policy.dedup_threshold_sweep(_ds()).to_pandas() \
        .sort_values("t_bp").reset_index(drop=True)
    assert (got["n_dup_pairs"].diff().dropna() <= 0).all()
    assert (got["docs_kept"].diff().dropna() >= 0).all()
    assert (got["n_removed"] == got["n_dup_docs"] - got["n_clusters"]).all()


def test_sweep_distributed_fallback_identity(ray_session):
    """dsu_max_edges=0 forces the label-propagation path; the planner
    rows must be identical to the driver-DSU path."""
    fast = (policy.dedup_threshold_sweep(
        _ds(), thresholds_bp=(7000, 9000), num_partitions=4)
        .to_pandas().sort_values("t_bp").reset_index(drop=True))
    slow = (policy.dedup_threshold_sweep(
        _ds(), thresholds_bp=(7000, 9000), num_partitions=4,
        dsu_max_edges=0)
        .to_pandas().sort_values("t_bp").reset_index(drop=True))
    pd.testing.assert_frame_equal(fast, slow)


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    out = con.execute(sql).fetchdf()
    con.close()
    return out


def _assert_frames(got: pd.DataFrame, want: pd.DataFrame):
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    assert len(g) == len(w) > 0
    for c in cols:
        assert (g[c].astype(str).values == w[c].astype(str).values).all(), c


def test_soft_weights_oracle_parity(ray_session):
    from data_dedup_ray.corpus import web_pages

    got = policy.soft_dedup_weights(
        web_pages(SF).select_columns(["url", "text"])).to_pandas()
    want = _oracle(policy.soft_dedup_weights_sql())
    _assert_frames(got, want)


def test_sweep_oracle_parity(ray_session):
    from data_dedup_ray.corpus import web_pages

    got = policy.dedup_threshold_sweep(
        web_pages(SF).select_columns(["url", "text"])).to_pandas()
    want = _oracle(policy.dedup_threshold_sweep_sql())
    _assert_frames(got, want)
