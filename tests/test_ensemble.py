"""Multi-signal ensemble dedup: union semantics, signal counts,
transitive closure, and the full recursive-closure SQL oracle."""

import duckdb
import pandas as pd
import pytest
import ray

from data_dedup_ray.pipelines import ensemble

SF = "/root/testdata/sf0.001"

#: 40 words so a one-word edit keeps shingle Jaccard over 0.7
#: ((36-5)/(36+5) ≈ 0.76)
_BASE = ("quick brown fox jumps over the lazy dog while seven wizards "
         "brew strong potions under a silver moon and the river sings "
         "softly through tall pines where owls watch patient travelers "
         "carry bright lanterns toward the distant harbor gates tonight")
_DOCS = {
    # a~b: high shingle Jaccard AND high bag cosine (one word changed);
    # simhash votes are too thin at 40 tokens for hamming ≤ 3
    "a": _BASE,
    "b": _BASE.replace("silver", "golden"),
    # c: b's exact bag REORDERED — shingles break (no Jaccard edge),
    # both bag detectors fire (cos = 1, hamming = 0)
    "c": " ".join(reversed(_BASE.replace("silver", "golden").split())),
    "d": ("completely different content describing spacecraft "
          "navigation systems orbiting remote planets using ion "
          "thrusters plus gravity assists plotted by careful engineers"),
    # e: exact copy of a — every detector fires
    "e": _BASE,
}


def _ds():
    return ray.data.from_items(
        [{"url": k, "text": v} for k, v in _DOCS.items()])


def test_union_edges_and_signal_counts(ray_session):
    edges = ensemble.ensemble_dup_edges(
        _ds(), max_df=10, num_partitions=4).to_pandas()
    got = {(r.url_a, r.url_b): r.signals for r in edges.itertuples()}
    # exact copy: all three detectors fire
    assert got.get(("a", "e")) == 3
    # one-word edit: Jaccard + tf-cosine (simhash margins too thin)
    assert got.get(("a", "b")) >= 2
    # reordered bag: exactly the two bag-level detectors
    assert got.get(("b", "c")) == 2
    # and the shingle detector really is the absent one for b-c
    from data_dedup_ray.pipelines import near

    jac = near.minhash_dedup_pairs(_ds(), threshold=0.7).to_pandas()
    jac_pairs = set(zip(jac["url_a"], jac["url_b"]))
    assert ("b", "c") not in jac_pairs
    assert ("a", "b") in jac_pairs
    # d is isolated
    assert not any("d" in p for p in got)


def test_closure_merges_across_signals(ray_session):
    out = (ensemble.ensemble_dedup_clusters(
        _ds(), max_df=10, num_partitions=4).to_pandas()
        .set_index("url")["cluster_id"])
    # a~b (shingle+bag), b~c (bag only), a~e (all) → one component
    assert out["a"] == out["b"] == out["c"] == out["e"] == "a"
    assert out["d"] == "d"


def test_ensemble_oracle_parity(ray_session):
    from data_dedup_ray.oracles import ensemble_clusters_sql

    got = (ensemble.ensemble_clusters(SF).to_pandas()
           .sort_values("url").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = (con.execute(ensemble_clusters_sql()).fetchdf()
            .sort_values("url").reset_index(drop=True))
    assert len(got) == len(want) > 0
    g = got.sort_index(axis=1)
    w = want.sort_index(axis=1)
    assert list(g.columns) == list(w.columns)
    for c in g.columns:
        assert (g[c].astype(str).values == w[c].astype(str).values).all(), c
    # the ensemble must be at least as coarse as any single signal:
    # within one minhash cluster, the ensemble label is constant
    from data_dedup_ray.corpus import web_pages
    from data_dedup_ray.pipelines import near

    single = (near.minhash_dedup_clusters(
        web_pages(SF).select_columns(["url", "text"])).to_pandas()
        .set_index("url")["cluster_id"])
    ens = got.set_index("url")["cluster_id"]
    merged = pd.DataFrame({"single": single, "ens": ens})
    assert (merged.groupby("single")["ens"].nunique() == 1).all()


def test_detector_agreement_matches_sql():
    import duckdb

    from data_dedup_ray import oracles
    from data_dedup_ray.corpus import web_pages
    from data_dedup_ray.pipelines import ensemble

    got = ensemble.detector_agreement(
        web_pages(SF).select_columns(["url", "text"])).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = con.execute(oracles.detector_agreement_sql()).fetchdf()
    con.close()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)
    m = g.set_index(["detector_a", "detector_b"])["n_pairs"]
    # an intersection can never exceed either diagonal
    assert m[("jaccard", "simhash")] <= min(m[("jaccard", "jaccard")],
                                            m[("simhash", "simhash")])
