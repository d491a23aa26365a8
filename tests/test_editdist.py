"""Edit-distance dedup (pipelines/editdist.py): banded-DP kernel parity
vs a reference DP, FastSS blocking completeness vs brute force, pipeline
parity vs the DuckDB levenshtein oracle, and partitioning invariance."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from data_dedup_ray.pipelines import editdist

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    return c


def _ref_lev(a: str, b: str) -> int:
    """Textbook full-DP Levenshtein (reference implementation)."""
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[lb]


def _rand_strings(rng, n, alphabet="ab0/x", max_len=9):
    return np.array(
        ["".join(rng.choice(list(alphabet), size=rng.integers(0, max_len)))
         for _ in range(n)], dtype=object)


@pytest.mark.parametrize("k", [1, 2, 3])
def test_lev_banded_matches_reference_dp(k):
    rng = np.random.default_rng(11)
    a = _rand_strings(rng, 1500)
    b = _rand_strings(rng, 1500)
    got = editdist.lev_banded(a, b, k)
    want = np.array([min(_ref_lev(x, y), k + 1) for x, y in zip(a, b)])
    assert (got == want).all()


def test_lev_banded_edge_cases():
    a = np.array(["", "", "abc", "abc", "abc", "abcdef"], dtype=object)
    b = np.array(["", "x", "abc", "abd", "xyzvw", "abc"], dtype=object)
    assert editdist.lev_banded(a, b, 1).tolist() == [0, 1, 0, 1, 2, 2]
    assert editdist.lev_banded(a, b, 3).tolist() == [0, 1, 0, 1, 4, 3]


@pytest.mark.parametrize("k", [1, 2])
def test_fastss_blocking_is_complete(k):
    """Every true ed ≤ k pair shares at least one deletion-variant hash
    (recall 1.0 — hash collisions can only add candidates)."""
    rng = np.random.default_rng(23)
    strs = np.array(sorted(set(_rand_strings(rng, 300))), dtype=object)
    vh, ridx = editdist.deletion_variant_hashes(strs, k=k)
    df = pd.DataFrame({"vh": vh, "r": ridx}).drop_duplicates()
    m = df.merge(df, on="vh")
    cand = set(zip(m[m.r_x < m.r_y].r_x, m[m.r_x < m.r_y].r_y))
    for x in range(len(strs)):
        for y in range(x + 1, len(strs)):
            if _ref_lev(strs[x], strs[y]) <= k:
                assert (x, y) in cand, (strs[x], strs[y])


def test_variant_hash_is_padding_invariant():
    """The same string must hash identically regardless of batch-padding
    width (different co-batched max lengths)."""
    s = np.array(["abc"], dtype=object)
    h1, _ = editdist.deletion_variant_hashes(s, k=1)
    s2 = np.array(["abc", "a-much-longer-string-here"], dtype=object)
    h2, r2 = editdist.deletion_variant_hashes(s2, k=1)
    assert sorted(h1.tolist()) == sorted(h2[r2 == 0].tolist())


@pytest.mark.parametrize("k", [1, 2])
def test_url_editdist_pairs_oracle(con, k):
    got = (editdist.url_editdist_pairs(SF, k=k).to_pandas()
           .reset_index(drop=True))
    want = con.execute(editdist.url_editdist_pairs_sql(k)).fetchdf()
    pd.testing.assert_frame_equal(got, want.astype({"dist": "int64"}))


def test_url_editdist_clusters_oracle(con):
    got = (editdist.url_editdist_clusters(SF, k=1).to_pandas()
           .sort_values("url").reset_index(drop=True))
    want = (con.execute(editdist.url_editdist_clusters_sql(1)).fetchdf()
            .sort_values("url").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


def test_host_editdist_pairs_oracle(con):
    got = (editdist.host_editdist_pairs(SF, k=1).to_pandas()
           .reset_index(drop=True))
    want = con.execute(editdist.host_editdist_pairs_sql(1)).fetchdf()
    pd.testing.assert_frame_equal(got, want.astype({"dist": "int64"}))


def test_partitioning_invariance():
    a = editdist.url_editdist_pairs(SF, k=1, num_partitions=3).to_pandas()
    b = editdist.url_editdist_pairs(SF, k=1, num_partitions=16).to_pandas()
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))


def test_label_propagation_fallback_matches_dsu():
    """Forcing the distributed fallback (dsu_max_edges=0) must produce
    the identical cluster assignment."""
    dsu = (editdist.url_editdist_clusters(SF, k=1).to_pandas()
           .sort_values("url").reset_index(drop=True))
    lp = (editdist.url_editdist_clusters(SF, k=1, dsu_max_edges=0)
          .to_pandas().sort_values("url").reset_index(drop=True))
    pd.testing.assert_frame_equal(dsu, lp)
