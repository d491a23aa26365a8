"""SRP binary embedding sketches (pipelines/srp.py): oracle parity,
planted-copy guarantee, angle-monotonicity, banding recall vs brute
force, partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data

from data_dedup_ray.pipelines import srp

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    return c


def test_oracle_parity(con):
    got = srp.srp_pairs(SF).to_pandas().reset_index(drop=True)
    want = con.execute(srp.srp_pairs_sql()).fetchdf().astype(
        {c: "int64" for c in ["vec_id_a", "vec_id_b", "hamming"]})
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))


def test_planted_copies_all_at_hamming_zero(con):
    got = srp.srp_pairs(SF).to_pandas()
    n_planted = con.execute(
        "SELECT count(*) FROM embeddings WHERE vec_id % 10 = 0"
    ).fetchone()[0]
    planted = got[got["vec_id_b"] == got["vec_id_a"] + 100000]
    assert len(planted) == n_planted
    assert (planted["hamming"] == 0).all()


def test_hamming_tracks_angle():
    """Small perturbations → small Hamming; orthogonal-ish vectors →
    Hamming near b/2."""
    rng = np.random.default_rng(3)
    d, n_bits = 32, 128
    base = rng.normal(size=d)
    vecs = [base,
            base + 0.02 * rng.normal(size=d),    # tiny angle
            rng.normal(size=d)]                  # unrelated
    ds = ray.data.from_pandas(pd.DataFrame({
        "vec_id": [0, 1, 2],
        "embedding": [v.astype(np.float32) for v in vecs]}))
    sigs = srp.srp_signatures(ds, n_bits=n_bits).to_pandas()
    w = {r["vec_id"]: np.frombuffer(bytes(r["sig"]), np.uint64)
         for _, r in sigs.iterrows()}

    def ham(a, b):
        return int(sum(bin(int(x ^ y)).count("1")
                       for x, y in zip(w[a], w[b])))

    assert ham(0, 1) < 20
    assert abs(ham(0, 2) - n_bits // 2) < n_bits // 4


def test_banding_recall_matches_bruteforce():
    """Candidates from 16 bands must find EVERY pair with ham ≤ 10
    (pigeonhole) — cross-check against an all-pairs popcount."""
    from data_dedup_ray.pipelines.search import augmented_embeddings
    ds = augmented_embeddings(SF)
    sigs = srp.srp_signatures(ds).to_pandas()
    ids = sigs["vec_id"].to_numpy()
    W = np.frombuffer(b"".join(bytes(s) for s in sigs["sig"]),
                      np.uint64).reshape(len(sigs), -1)
    from data_dedup_ray.stages.simhash import popcount64
    brute = set()
    for i in range(len(ids)):
        h = popcount64(W[i][None, :] ^ W[i + 1:]).sum(axis=1)
        for j in np.nonzero(h <= 10)[0]:
            a, b = ids[i], ids[i + 1 + j]
            brute.add((min(a, b), max(a, b)))
    got = srp.srp_pairs(SF).to_pandas()
    assert set(zip(got["vec_id_a"], got["vec_id_b"])) == brute


def test_partition_invariance():
    a = srp.srp_pairs(SF, num_partitions=3).to_pandas()
    b = srp.srp_pairs(SF, num_partitions=16).to_pandas()
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))


def test_band_width_validation():
    """Band widths that overflow or straddle 64-bit signature words are
    rejected up front (silent truncation otherwise)."""
    with pytest.raises(ValueError, match="band width"):
        srp.srp_hamming_pairs(None, n_bits=96, n_bands=4, max_hamming=1)
    with pytest.raises(ValueError, match="band width"):
        srp.srp_hamming_pairs(None, n_bits=256, n_bands=2, max_hamming=1)
    with pytest.raises(ValueError, match="pigeonhole"):
        srp.srp_hamming_pairs(None, n_bits=128, n_bands=2, max_hamming=5)
