"""MinHash/LSH + SimHash near-dup pipelines vs exact oracles."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from data_dedup_ray.corpus import web_pages
from data_dedup_ray.oracles import minhash_pairs_sql, near_dup_clusters_sql
from data_dedup_ray.pipelines import near
from data_dedup_ray.pipelines.components import dsu_components, label_propagation
from data_dedup_ray.stages.minhash import shingle_sets
from data_dedup_ray.stages.simhash import popcount64, simhash_batch


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    return c


@pytest.fixture(scope="module")
def pages(sf_dir):
    return web_pages(sf_dir)


def test_shingle_sets_deterministic():
    texts = ["a b c d e f g", "a b c d e f g", "x y z", ""]
    cat, sizes = shingle_sets(texts, 5)
    assert sizes.tolist() == [3, 3, 0, 0]
    assert (cat[:3] == cat[3:6]).all()


def test_minhash_pairs_match_exact_jaccard(pages, con, sf_dir):
    pairs = near.minhash_dedup_pairs(pages, threshold=0.7).to_pandas()
    got = pd.DataFrame(
        {
            "url_a": pairs["url_a"],
            "url_b": pairs["url_b"],
            "jaccard_bp": np.floor(pairs["jaccard"] * 10000).astype(np.int64),
        }
    ).sort_values(["url_a", "url_b"]).reset_index(drop=True)
    want = con.execute(minhash_pairs_sql(0.7)).fetchdf().sort_values(
        ["url_a", "url_b"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # planted exact dups (mirror family) must be J=1.0 pairs
    assert (got[got["url_a"].str.contains("mirror")]["jaccard_bp"] == 10000).any() or (
        got[got["url_b"].str.contains("mirror")]["jaccard_bp"] == 10000
    ).any()


def test_near_clusters_match_closure_oracle(pages, con):
    got = (
        near.minhash_dedup_clusters(pages, threshold=0.7)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    want = con.execute(near_dup_clusters_sql(0.7)).fetchdf().sort_values(
        "url"
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_simhash_pairs_match_bruteforce(pages):
    got = near.simhash_pairs(pages).to_pandas()
    df = pages.to_pandas()
    fp, has = simhash_batch(df["text"].tolist())
    ids = df["url"].to_numpy(dtype=object)[has]
    order = np.argsort(ids)
    ids, fp = ids[order], fp[order]
    ai, bi = np.triu_indices(len(ids), k=1)
    hd = popcount64(fp[ai] ^ fp[bi])
    keep = hd <= 3
    want = pd.DataFrame(
        {"url_a": ids[ai[keep]], "url_b": ids[bi[keep]], "hamming": hd[keep]}
    )
    m = got.merge(want, on=["url_a", "url_b"], how="outer", indicator=True,
                  suffixes=("_g", "_w"))
    assert (m["_merge"] == "both").all()
    assert (m["hamming_g"] == m["hamming_w"]).all()


def test_dsu_components_deterministic():
    edges = pd.DataFrame({"url_a": ["b", "c", "x"], "url_b": ["c", "a", "y"]})
    out = dsu_components(edges)
    assert out == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_label_propagation_matches_dsu(pages):
    import ray.data

    edges_df = near.minhash_dedup_pairs(pages, threshold=0.7) \
        .to_pandas()[["url_a", "url_b"]]
    dsu = dsu_components(edges_df)
    nodes = pages.select_columns(["url"])
    lp = label_propagation(nodes, ray.data.from_pandas(edges_df)).to_pandas()
    lp_map = dict(zip(lp["url"], lp["cluster_id"]))
    for n, c in dsu.items():
        assert lp_map[n] == c, (n, c, lp_map[n])
    # non-edge nodes keep their own label
    all_urls = set(pages.to_pandas()["url"])
    for u in all_urls - set(dsu):
        assert lp_map[u] == u


def test_ngram_jaccard_exact_pairs(pages, con):
    """Prefix-filtered exact all-pairs must equal the SQL ground truth at
    t=0.8 — deterministic recall 1.0 (no LSH randomness involved)."""
    got = (
        near.ngram_jaccard_pairs(pages, threshold=0.8)
        .to_pandas()
        .assign(jaccard_bp=lambda d: np.floor(d["jaccard"] * 10000).astype(np.int64))
        [["url_a", "url_b", "jaccard_bp"]]
        .sort_values(["url_a", "url_b"])
        .reset_index(drop=True)
    )
    want = con.execute(minhash_pairs_sql(0.8)).fetchdf().sort_values(
        ["url_a", "url_b"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_pairs_in_partition_skew_star_fallback():
    """A hot key beyond group_cap must emit a linear star (min-member hub),
    preserving component connectivity without O(g^2) pairs."""
    from data_dedup_ray.pipelines.near import _pairs_in_partition

    g = pd.DataFrame({
        "band_id": np.zeros(500, dtype=np.int32),
        "band_hash": np.zeros(500, dtype=np.int64),
        "url": [f"u{i:03d}" for i in range(500)],
    })
    out = _pairs_in_partition(g, key_cols=["band_id", "band_hash"],
                              id_col="url", group_cap=100)
    # star: exactly n-1 edges, all touching the min member
    assert len(out) == 499
    assert (out["url_a"] == "u000").all() or (out["url_b"] == "u000").all()
    d = dsu_components(out)
    assert all(v == "u000" for v in d.values())


def test_cluster_fallback_label_propagation(pages):
    """Forcing the DSU guard to trip must route through distributed label
    propagation — edges handed over as a Dataset, never collected — and
    produce the identical clustering."""
    want = (
        near.minhash_dedup_clusters(pages, threshold=0.7)
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    got = (
        near.minhash_dedup_clusters(pages, threshold=0.7, dsu_max_edges=0)
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["url", "cluster_id"]], want[["url", "cluster_id"]]
    )


def test_determinism_across_partitioning(sf_dir):
    """Cluster assignments and verified pairs must be independent of the
    physical partitioning (north_rule: run-order / parallelism invariant)."""
    a = web_pages(sf_dir, override_num_blocks=2)
    b = web_pages(sf_dir, override_num_blocks=13)

    pa_ = near.minhash_dedup_pairs(a, threshold=0.7).to_pandas().sort_values(
        ["url_a", "url_b"]).reset_index(drop=True)
    pb_ = near.minhash_dedup_pairs(b, threshold=0.7, num_partitions=17
                                   ).to_pandas().sort_values(
        ["url_a", "url_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(pa_, pb_)

    ca = near.minhash_dedup_clusters(a, threshold=0.7).to_pandas(
    ).sort_values("url").reset_index(drop=True)
    cb = near.minhash_dedup_clusters(b, threshold=0.7, num_partitions=17
                                     ).to_pandas(
    ).sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(ca, cb)


def test_cross_corpus_near_pairs_oracle(sf_dir, con):
    import numpy as np

    from data_dedup_ray.pipelines import snapshots

    pairs = near.cross_corpus_near_pairs(
        snapshots.snapshot2(sf_dir), web_pages(sf_dir), threshold=0.7
    ).to_pandas()
    got = pd.DataFrame({
        "new_url": pairs["new_url"], "index_url": pairs["index_url"],
        "jaccard_bp": np.floor(pairs["jaccard"] * 10000).astype(np.int64),
    })
    want = con.execute(near.cross_corpus_near_pairs_sql(0.7)).fetchdf()
    g = got.sort_index(axis=1).sort_values(
        ["new_url", "index_url"]).reset_index(drop=True)
    w = want.sort_index(axis=1).sort_values(
        ["new_url", "index_url"]).reset_index(drop=True)
    assert list(g.columns) == list(w.columns)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_cross_corpus_includes_unchanged_recrawls(sf_dir):
    from data_dedup_ray.pipelines import snapshots

    pairs = near.cross_corpus_near_pairs(
        snapshots.snapshot2(sf_dir), web_pages(sf_dir), threshold=0.7
    ).to_pandas()
    # byte-identical re-crawls (doc_id % 6 == 0) must match themselves at
    # jaccard 1.0; changed re-crawls (same url, trailing edit) score < 1.0
    self_pairs = pairs[pairs["new_url"] == pairs["index_url"]].copy()
    ids = self_pairs["new_url"].str.rsplit("/", n=1).str[1].astype(int)
    unchanged = self_pairs[ids % 6 == 0]
    assert len(unchanged) > 0
    assert (unchanged["jaccard"] == 1.0).all()


@pytest.mark.parametrize("cap", [2, 8, 256])
def test_skew_split_pairs_equal_plain(sf_dir, pages, cap):
    sh = near.shingle_rows(pages).materialize()
    plain = near.lsh_candidate_pairs(
        pages, sh=sh, group_cap=cap, distinct=True
    ).to_pandas()
    split = near.lsh_candidate_pairs_skew_split(
        pages, sh=sh, group_cap=cap, distinct=True
    ).to_pandas()
    p = set(map(tuple, plain[["url_a", "url_b"]].values))
    s = set(map(tuple, split[["url_a", "url_b"]].values))
    assert p == s and len(p) > 0


def test_skew_split_verified_pipeline_unchanged(sf_dir, pages, con):
    """End to end at a forcing cap: the skew-split candidates verify to
    exactly what the plain path's candidates verify to (the star design
    trades pair completeness for cluster connectivity identically in
    both paths), and at the default cap — where no group is over cap —
    verified pairs equal the SQL ground truth (covered by
    test_minhash_pairs_match_exact_jaccard)."""
    sh = near.shingle_rows(pages).materialize()
    cand_split = near.lsh_candidate_pairs_skew_split(
        pages, sh=sh, group_cap=4, distinct=False
    )
    cand_plain = near.lsh_candidate_pairs(
        pages, sh=sh, group_cap=4, distinct=False
    )
    ver_split = near.verify_pairs_partitioned(
        pages, cand_split, threshold=0.7, sh=sh
    ).to_pandas()
    ver_plain = near.verify_pairs_partitioned(
        pages, cand_plain, threshold=0.7, sh=sh
    ).to_pandas()
    got = set(map(tuple, ver_split[["url_a", "url_b"]].values))
    want = set(map(tuple, ver_plain[["url_a", "url_b"]].values))
    assert got == want and len(got) > 0


def test_containment_pairs_oracle(sf_dir, pages, con):
    res = near.containment_pairs(pages, threshold=0.8).to_pandas()
    got = pd.DataFrame({
        "url_a": res["url_a"], "url_b": res["url_b"],
        "containment_bp": np.floor(res["containment"] * 10000)
        .astype(np.int64),
    }).sort_values(["url_a", "url_b"]).reset_index(drop=True)
    want = con.execute(near.containment_pairs_sql(0.8)).fetchdf(
    ).sort_values(["url_a", "url_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_containment_is_directional(sf_dir, pages):
    res = near.containment_pairs(pages, threshold=0.8).to_pandas()
    # exact duplicates appear in BOTH directions at containment 1.0
    fwd = set(map(tuple, res[["url_a", "url_b"]].values))
    ones = res[res["containment"] == 1.0]
    both = [
        (a, b) for a, b in zip(ones["url_a"], ones["url_b"])
        if (b, a) in fwd
    ]
    assert len(both) > 0
    # and containment of A in B never requires B in A
    asym = [(a, b) for a, b in fwd if (b, a) not in fwd]
    assert len(asym) > 0


# --------------------------------------------------------------------------
# Threshold-boundary regressions: the prefix bound must use exact integer
# ceil(t*n) — float ceil overshoots (t=0.8, n=5 → ceil(4.0000000000000001)=5)
# and under-sizes the probe prefix, silently dropping pairs whose score sits
# EXACTLY at the threshold when the absent shingle is the set's minimum.
# --------------------------------------------------------------------------


def _plant_boundary_pair(k=5, seed=0):
    """Texts (a, b) where b's shingle set is exactly a's minus a's MINIMUM
    hash: containment(a in b) = jaccard(a, b) = 4/5 = threshold 0.8, and a
    1-element probe prefix of `a` (the float-ceil bug) misses the pair."""
    import random

    rnd = random.Random(seed)
    words = [f"w{i}" for i in range(997)]
    for _ in range(10_000):
        toks = [rnd.choice(words) for _ in range(9)]
        a_text, b_text = " ".join(toks), " ".join(toks[:8])
        cat_a, size_a = shingle_sets([a_text], k)
        cat_b, size_b = shingle_sets([b_text], k)
        if size_a[0] != 5 or size_b[0] != 4:
            continue
        set_a, set_b = set(cat_a.tolist()), set(cat_b.tolist())
        if not set_b < set_a:
            continue
        if (set_a - set_b).pop() == min(set_a):
            return a_text, b_text
    raise AssertionError("planting failed")


def test_containment_exact_threshold_pair(ray_session):
    import ray.data

    a_text, b_text = _plant_boundary_pair()
    ds = ray.data.from_pandas(
        pd.DataFrame({"url": ["a", "b"], "text": [a_text, b_text]}))
    out = near.containment_pairs(
        ds, threshold=0.8, shingle_k=5, num_partitions=4).to_pandas()
    got = {(r.url_a, r.url_b): r.containment for r in out.itertuples()}
    assert got.get(("a", "b")) == pytest.approx(0.8)   # 4/5, at threshold
    assert got.get(("b", "a")) == pytest.approx(1.0)   # b ⊂ a


def test_ngram_jaccard_exact_threshold_pair(ray_session):
    import ray.data

    a_text, b_text = _plant_boundary_pair()
    ds = ray.data.from_pandas(
        pd.DataFrame({"url": ["a", "b"], "text": [a_text, b_text]}))
    out = near.ngram_jaccard_pairs(
        ds, threshold=0.8, shingle_k=5, num_partitions=4).to_pandas()
    got = {tuple(sorted((r.url_a, r.url_b))): r.jaccard
           for r in out.itertuples()}
    assert got.get(("a", "b")) == pytest.approx(0.8)


def test_map_roots_int64_no_float_corruption():
    from data_dedup_ray.pipelines.components import map_roots_int64

    # values near ±2^63 are NOT representable in float64: a pandas
    # map+fillna fallback would collapse/overflow them
    vals = np.array([2**63 - 7, 2**63 - 9, -(2**63) + 5, 42],
                    dtype=np.int64)
    out = map_roots_int64(vals, {42: 7})
    assert out.tolist() == [2**63 - 7, 2**63 - 9, -(2**63) + 5, 7]
    assert out.dtype == np.int64


def test_label_propagation_path_graph(ray_session):
    """A path graph needs multiple propagation rounds (min label crosses
    one hop per round) — stresses the per-round exchange + convergence
    check, unlike the star/clique components near-dup produces."""
    import ray.data

    nodes = ray.data.from_pandas(
        pd.DataFrame({"url": list("abcdef") + ["zz"]}))
    edges = ray.data.from_pandas(pd.DataFrame({
        "url_a": list("abcde"),
        "url_b": list("bcdef"),
    }))
    lp = label_propagation(nodes, edges).to_pandas()
    m = dict(zip(lp["url"], lp["cluster_id"]))
    assert all(m[u] == "a" for u in "abcdef")
    assert m["zz"] == "zz"  # isolated node keeps its own label


def test_label_propagation_empty_edges(ray_session):
    import ray.data

    nodes = ray.data.from_pandas(pd.DataFrame({"url": ["x", "y"]}))
    edges = ray.data.from_pandas(
        pd.DataFrame({"url_a": pd.Series(dtype=str),
                      "url_b": pd.Series(dtype=str)}))
    lp = label_propagation(nodes, edges).to_pandas().sort_values("url")
    assert lp["cluster_id"].tolist() == ["x", "y"]


def test_simhash_clusters_fallback_matches_dsu(pages):
    """Forcing the fp-edge DSU guard to trip must route simhash_clusters
    through _simhash_clusters_lp (distributed label propagation + exchange
    joins — no driver collect) and produce the identical clustering."""
    want = (
        near.simhash_clusters(pages)
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    got = (
        near.simhash_clusters(pages, dsu_max_edges=0)
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["url", "cluster_id"]], want[["url", "cluster_id"]]
    )


def test_dsu_find_iterative_deep_chain():
    """A 30k-long union chain in worst-case order must not recurse: the
    old recursive find blew Python's recursion limit (~1000 frames)."""
    from data_dedup_ray.pipelines.components import DSU

    d = DSU()
    n = 30_000
    # build a chain rooted at 0 where each union attaches the next node
    # to the current deepest: parent pointers form one long path
    for i in range(n - 1, 0, -1):
        d.union(i - 1, i)
    # a find from the far end must walk (and compress) the whole path
    assert d.find(n - 1) == 0
    assert all(d.find(i) == 0 for i in range(0, n, 997))


def test_pad_fp_preserves_uint64_order():
    fps = np.array([0, 1, 2**40, -1, -2, 2**63 - 1, -(2**63)],
                   dtype=np.int64)
    padded = near._pad_fp(fps)
    u = fps.view(np.uint64)
    order_u = np.argsort(u, kind="stable")
    order_s = np.argsort(padded, kind="stable")
    assert (order_u == order_s).all()
    assert all(len(s) == 20 for s in padded)


def test_nearest_dup_attribution_oracle(sf_dir, con):
    from data_dedup_ray.pipelines import snapshots

    pairs = near.cross_corpus_near_pairs(
        snapshots.snapshot2(sf_dir), web_pages(sf_dir), threshold=0.7)
    got = near.nearest_dup_attribution(pairs).to_pandas()
    want = con.execute(near.nearest_dup_attribution_sql(0.7)).fetchdf()
    g = got.sort_index(axis=1).sort_values("new_url").reset_index(drop=True)
    w = want.sort_index(axis=1).sort_values("new_url").reset_index(drop=True)
    assert list(g.columns) == list(w.columns)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)
    # one row per matched new page; match counts conserve the pair total
    flat = pairs.to_pandas()
    assert len(got) == flat["new_url"].nunique()
    assert int(got.n_matches.sum()) == len(flat)


def test_nearest_dup_attribution_tie_order():
    import numpy as np
    import pyarrow as pa_
    import ray.data as rd

    # n1: zz scores higher; n2: exact bp tie -> lexicographic min wins
    pairs = rd.from_arrow(pa_.table({
        "new_url": ["n1", "n1", "n2", "n2", "n2"],
        "index_url": ["zz", "aa", "zz", "aa", "mm"],
        "jaccard": [0.9, 0.8, 0.75, 0.75, 0.71],
    }))
    got = near.nearest_dup_attribution(pairs, num_partitions=3
                                       ).to_pandas().set_index("new_url")
    assert got.loc["n1", "best_index_url"] == "zz"
    assert got.loc["n1", "jaccard_bp"] == 8999 or \
        got.loc["n1", "jaccard_bp"] == 9000  # float floor of 0.9*1e4
    assert got.loc["n2", "best_index_url"] == "aa"
    assert int(got.loc["n2", "n_matches"]) == 3


def test_simhash_sha_clusters_matches_closure_oracle(ray_session):
    """The sha-variant cluster assignment is pinned bit-for-bit by the
    recursive closure over the brute-force sha-simhash pair graph."""
    import duckdb

    from data_dedup_ray import oracles
    from data_dedup_ray.corpus import web_pages

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    got = near.simhash_clusters(web_pages(sf), hash_fn="sha") \
        .to_pandas().sort_values("url").reset_index(drop=True)
    want = con.execute(oracles.simhash_sha_clusters_sql()).fetchdf() \
        .sort_values("url").reset_index(drop=True)
    assert got["url"].tolist() == want["url"].tolist()
    assert got["cluster_id"].tolist() == want["cluster_id"].tolist()
    # real families exist and every cluster label is a member url
    assert got["cluster_id"].nunique() < len(got)


def test_pairs_in_partition_on_cap_error():
    """Exactness-claimed callers pass on_cap='error': a hot blocking key
    must raise instead of silently star-degrading recall."""
    from data_dedup_ray.pipelines.near import _pairs_in_partition

    g = pd.DataFrame({
        "h": np.zeros(50, dtype=np.int64),
        "url": [f"u{i:03d}" for i in range(50)],
    })
    with pytest.raises(ValueError, match="group_cap"):
        _pairs_in_partition(g, key_cols=["h"], id_col="url",
                            group_cap=10, on_cap="error")
    # below the cap the exact path is untouched
    out = _pairs_in_partition(g, key_cols=["h"], id_col="url",
                              group_cap=100, on_cap="error")
    assert len(out) == 50 * 49 // 2


def test_oph_candidates_match_perm_pipeline(pages):
    """The OPH candidate default must reproduce the permutation
    pipeline's verified pair set exactly (the verify join restores
    precision; banding recall is checked pair-for-pair here)."""
    perm = near.minhash_dedup_pairs(pages, threshold=0.7,
                                    method="perm").to_pandas()
    oph = near.minhash_dedup_pairs(pages, threshold=0.7).to_pandas()
    key = ["url_a", "url_b"]
    pd.testing.assert_frame_equal(
        perm.sort_values(key).reset_index(drop=True),
        oph.sort_values(key).reset_index(drop=True))
    with pytest.raises(ValueError, match="method"):
        near.lsh_candidate_pairs(pages, method="nope")


def test_skew_split_oph_matches_plain_oph(pages):
    """The skew-split scale path composes with the OPH kernel: same
    candidate pair set as the plain OPH path when no band is hot, and
    the ValueError guard matches lsh_candidate_pairs'."""
    kw = dict(n_perm=256, band_r=4)
    plain = near.lsh_candidate_pairs(pages, method="oph", **kw).to_pandas()
    split = near.lsh_candidate_pairs_skew_split(
        pages, method="oph", **kw).to_pandas()
    key = ["url_a", "url_b"]
    pd.testing.assert_frame_equal(
        plain.sort_values(key).reset_index(drop=True),
        split.sort_values(key).reset_index(drop=True))
    with pytest.raises(ValueError, match="method"):
        near.lsh_candidate_pairs_skew_split(pages, method="nope")
