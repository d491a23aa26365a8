"""Weighted (multiset) Jaccard (pipelines/weighted.py): kernel parity vs
brute force, oracle parity, measure laws, partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data

from data_dedup_ray.pipelines import weighted

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    return c


def _brute_wjac(a: str, b: str, k: int = 5) -> tuple[int, int]:
    """(Σmin, Σmax) over k-token window multisets, token strings."""
    import re
    from collections import Counter

    def windows(s):
        t = re.findall(r"[a-z0-9]+", s)
        return Counter(tuple(t[i:i + k]) for i in range(len(t) - k + 1))

    wa, wb = windows(a), windows(b)
    num = sum(min(wa[s], wb[s]) for s in wa.keys() & wb.keys())
    den = sum(wa.values()) + sum(wb.values()) - num
    return num, den


def test_pipeline_matches_bruteforce_on_tiny_corpus():
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = pd.DataFrame({
        "url": ["u1", "u2", "u3"],
        "text": [base + " " + base,            # doubled: repetition
                 base,                         # single copy
                 "unrelated words here that share nothing at all ok"],
    })
    ds = ray.data.from_pandas(docs)
    got = weighted.weighted_jaccard_pairs(
        ds, min_wjac_bp=1, num_partitions=3).to_pandas()
    rows = {(r["url_a"], r["url_b"]): r["wjac_bp"]
            for _, r in got.iterrows()}
    num, den = _brute_wjac(docs["text"][0], docs["text"][1])
    assert rows == {("u1", "u2"): 10000 * num // den}
    # set Jaccard of u1/u2 would be ~1.0 (same distinct windows except
    # the doubling seam); the weighted form must score strictly lower
    assert 0 < rows[("u1", "u2")] < 9000


def test_oracle_parity(con):
    got = weighted.weighted_jaccard_sig_pairs(SF).to_pandas() \
        .reset_index(drop=True)
    want = con.execute(weighted.weighted_jaccard_sig_pairs_sql()) \
        .fetchdf().astype({"wjac_bp": "int64"})
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))


def test_identical_docs_score_10000():
    got = weighted.weighted_jaccard_sig_pairs(SF).to_pandas()
    mirrors = got[got["url_a"].str.startswith("https://mirror")
                  | got["url_b"].str.startswith("https://mirror")]
    assert len(mirrors) > 0
    assert (mirrors["wjac_bp"] == 10000).any()


def test_weighted_bounded_by_set_jaccard_on_multiset_free_docs():
    """When every window count is 1 on both sides, WJ equals set
    Jaccard — cross-check against the exact ngram path at the same
    threshold."""
    from data_dedup_ray.corpus import web_pages
    from data_dedup_ray.pipelines import near
    wj = weighted.weighted_jaccard_sig_pairs(
        SF, min_wjac_bp=7000).to_pandas()
    sj = near.ngram_jaccard_pairs(
        web_pages(SF), threshold=0.7).to_pandas()
    wset = set(zip(wj["url_a"], wj["url_b"]))
    sset = set(zip(sj["url_a"], sj["url_b"]))
    # multiset Jaccard ≤ set Jaccard is NOT an identity in general,
    # but on this corpus (near/quote are append-constructed, counts
    # mostly 1) the weighted pair set is a subset of the set-Jaccard
    # pair set at the same threshold
    assert wset <= sset


def test_clusters_oracle(con):
    got = weighted.weighted_jaccard_clusters(SF).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    want = con.execute(weighted.weighted_jaccard_clusters_sql()) \
        .fetchdf().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_clusters_label_propagation_fallback_matches_dsu():
    dsu = weighted.weighted_jaccard_clusters(SF).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    lp = weighted.weighted_jaccard_clusters(SF, dsu_max_edges=0) \
        .to_pandas().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(dsu, lp)


def test_partition_invariance():
    a = weighted.weighted_jaccard_sig_pairs(SF, num_partitions=3) \
        .to_pandas().reset_index(drop=True)
    b = weighted.weighted_jaccard_sig_pairs(SF, num_partitions=16) \
        .to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_containment_oracle_parity(con):
    got = (weighted.weighted_containment_sig_pairs(SF).to_pandas()
           .reset_index(drop=True))
    want = con.execute(
        weighted.weighted_containment_sig_pairs_sql()).fetchdf() \
        .astype({"wcont_bp": "int64"})
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))
    assert len(got) > 0


def test_containment_is_directional_and_repetition_aware():
    """quote pages (base + shared span) contain their base almost fully
    in the weighted sense; the reverse direction scores lower when the
    quote page added material — and a doubled doc fully contains its
    single copy while the reverse is ~5000 bp."""
    docs = [
        {"url": "u/base", "text": " ".join(f"w{i}" for i in range(60))},
        {"url": "u/double",
         "text": " ".join(f"w{i}" for i in range(60)) * 2},
    ]
    ds = ray.data.from_items(docs)
    got = weighted.weighted_containment_pairs(
        ds, min_wcont_bp=1, num_partitions=2).to_pandas()
    m = {(r.url_a, r.url_b): r.wcont_bp for r in got.itertuples()}
    # base ⊂ double fully; double ⊂ base only ~half its windows
    assert m[("u/base", "u/double")] == 10000
    assert 4000 < m[("u/double", "u/base")] < 6000


def test_containment_clusters_closure_oracle(con):
    got = (weighted.weighted_containment_clusters(SF).to_pandas()
           .sort_values("url").reset_index(drop=True))
    want = con.execute(
        weighted.weighted_containment_clusters_sql()).fetchdf() \
        .sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # quote pages must co-cluster with their base (planted family)
    quotes = got[got["url"].str.startswith("https://quote.")]
    assert len(quotes) and (quotes["cluster_id"] != quotes["url"]).any()


def test_host_containment_stats_oracle(con):
    got = weighted.host_containment_stats(SF).to_pandas() \
        .reset_index(drop=True)
    want = con.execute(weighted.host_containment_stats_sql()).fetchdf() \
        .astype({"n_contained": "int64", "n_containers": "int64"})
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))
    # tallies are two ends of the same directed edges
    assert got["n_contained"].sum() == got["n_containers"].sum()


def test_incremental_store_parity_and_lineage(con, tmp_path):
    """Exact weighted store rung: build → incremental query equals the
    tagged-union SQL twin bit-for-bit; config mismatch fails loudly."""
    store = str(tmp_path / "wstore")
    got = weighted.incremental_weighted_jaccard_pairs_web(
        SF, store_dir=store).to_pandas().reset_index(drop=True)
    want = con.execute(
        weighted.incremental_weighted_jaccard_pairs_sql()).fetchdf() \
        .astype({"wjac_bp": "int64"})
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))
    assert len(got) > 0
    # unchanged recaptures (doc_id % 6 == 0) score exactly 10000
    assert (got["wjac_bp"] == 10000).any()
    from data_dedup_ray.pipelines.snapshots import snapshot2
    with pytest.raises(ValueError):
        weighted.incremental_weighted_jaccard_pairs(
            snapshot2(SF), store, shingle_k=7)


def test_incremental_containment_parity_and_direction_law(con, tmp_path):
    """Containment rung over the SAME store: SQL parity, and unchanged
    recaptures (byte-identical re-crawls) must contain AND be
    contained at exactly 10000 bp in both directions."""
    store = str(tmp_path / "wstore_c")
    got = weighted.incremental_weighted_containment_pairs_web(
        SF, store_dir=store).to_pandas().reset_index(drop=True)
    want = con.execute(
        weighted.incremental_weighted_containment_pairs_sql()).fetchdf() \
        .astype({"wcont_bp": "int64"})
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))
    assert set(got["direction"]) <= {"new_in_index", "index_in_new"}
    # a byte-identical recapture appears in both directions at 10000
    full = got[got["wcont_bp"] == 10000]
    both = full.groupby(["new_url", "index_url"])["direction"].nunique()
    assert (both == 2).any()


def test_incremental_store_disjoint_slices_roll_up(con, tmp_path):
    """A list of disjoint crawl-slice stores must reproduce the single
    full-store result exactly (multiset blobs of distinct urls
    concatenate losslessly — no merge pass)."""
    import ray.data

    from data_dedup_ray.corpus import web_pages
    from data_dedup_ray.pipelines.snapshots import snapshot2

    full = str(tmp_path / "full")
    s1 = str(tmp_path / "s1")
    s2 = str(tmp_path / "s2")
    pages = web_pages(SF).materialize()
    weighted.build_weighted_store(pages, full)

    def half(which):
        def fn(t):
            import pyarrow.compute as pc
            h = pc.bit_wise_and(
                pc.utf8_length(t["url"]), 1)
            keep = pc.equal(h, which)
            return t.filter(keep)
        return fn

    weighted.build_weighted_store(
        pages.map_batches(half(0), batch_format="pyarrow"), s1)
    weighted.build_weighted_store(
        pages.map_batches(half(1), batch_format="pyarrow"), s2)

    new = snapshot2(SF)
    a = weighted.incremental_weighted_jaccard_pairs(
        new, full).to_pandas().reset_index(drop=True)
    b = weighted.incremental_weighted_jaccard_pairs(
        new, [s1, s2]).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0
