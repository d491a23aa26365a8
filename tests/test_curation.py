"""SemDeDup-style curation: k-means assignment + within-cluster prune."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from data_dedup_ray.pipelines import curation
from data_dedup_ray.pipelines.search import augmented_embeddings

SF = "/root/testdata/sf0.001"


def _emb(sf=SF):
    return ray.data.read_parquet(f"{sf}/embeddings.parquet",
                                 columns=["vec_id", "embedding"])


def test_kmeans_assign_oracle(ray_session):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    got = curation.kmeans_assign(_emb(), k=8, iters=0).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    want = con.execute(curation.kmeans_assign_sql(8)).fetchdf() \
        .sort_values("vec_id").reset_index(drop=True)
    assert got["cluster_id"].astype(int).tolist() == \
        want["cluster_id"].astype(int).tolist()
    assert got["cos_bp"].astype(int).tolist() == \
        want["cos_bp"].astype(int).tolist()
    # sane partition: every seed assigns to itself at cos 1.0
    seeds = got[got.vec_id < 8]
    assert (seeds.cluster_id.to_numpy() == seeds.vec_id.to_numpy()).all()
    assert (seeds.cos_bp == 10000).all()


def test_kmeans_lloyd_matches_numpy_reference(ray_session):
    """iters>0 has no SQL twin (iterative); pin it against a local numpy
    re-implementation of the exact same algorithm."""
    df = _emb().to_pandas().sort_values("vec_id").reset_index(drop=True)
    X = np.array(df["embedding"].tolist(), dtype=np.float64)
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    k, iters = 8, 3
    cent = X[:k].copy()
    for _ in range(iters):
        a = np.argmax(X @ cent.T, axis=1)
        nxt = cent.copy()
        for c in range(k):
            rows = X[a == c]
            if len(rows):
                nxt[c] = rows.mean(axis=0)
        norm = np.linalg.norm(nxt, axis=1, keepdims=True)
        norm[norm == 0] = 1.0
        cent = nxt / norm
    a = np.argmax(X @ cent.T, axis=1)
    best = (X @ cent.T)[np.arange(len(a)), a]

    got = curation.kmeans_assign(_emb(), k=k, iters=iters).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert got["cluster_id"].to_numpy().tolist() == a.tolist()
    assert got["cos_bp"].to_numpy().tolist() == \
        np.floor(best * 10000 + 0.5).astype(np.int64).tolist()


def test_semdedup_keep_oracle_augmented(ray_session):
    """Planted copies land in their original's cluster and lose to it —
    prune path provably non-vacuous, full DuckDB twin."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    got = curation.semdedup_keep(augmented_embeddings(SF), k=8, iters=0,
                                 tau=0.5).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    want = con.execute(
        curation.semdedup_keep_sql(8, 0.5, augmented=True)).fetchdf() \
        .sort_values("vec_id").reset_index(drop=True)
    assert got["cluster_id"].astype(int).tolist() == \
        want["cluster_id"].astype(int).tolist()
    assert got["keep"].astype(bool).tolist() == \
        want["keep"].astype(bool).tolist()
    pruned = got[~got.keep]
    assert len(pruned) >= 50  # every planted copy must be pruned
    assert (pruned.vec_id >= 100000).all()


def test_semdedup_transitive_group_keeps_min(ray_session):
    """Three exact copies + distinct vectors: the duplicate group keeps
    only its minimum vec_id, everything else survives."""
    rng = np.random.default_rng(3)
    base = rng.standard_normal((6, 16)).astype(np.float32)
    vecs = np.vstack([base, base[2], base[2]])  # ids 6,7 copy id 2
    t = pa.table({
        "vec_id": pa.array(np.arange(8, dtype=np.int64)),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(t)
    got = curation.semdedup_keep(ds, k=4, iters=0, tau=0.999) \
        .to_pandas().sort_values("vec_id")
    keep = dict(zip(got.vec_id, got.keep))
    assert keep[2] and not keep[6] and not keep[7]
    assert all(keep[i] for i in (0, 1, 3, 4, 5))


def test_kmeans_assign_empty_seed_guard(ray_session):
    t = pa.table({
        "vec_id": pa.array([100, 101], pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [0.0, 1.0]],
                              pa.list_(pa.float32())),
    })
    with pytest.raises(ValueError, match="seed"):
        curation.kmeans_assign(ray.data.from_arrow(t), k=4, iters=0)


def test_semdedup_long_transitive_chain(ray_session):
    """A chain of vectors where only NEIGHBORS exceed tau (cos 20deg =
    0.94 >= 0.9, cos 40deg = 0.77 < 0.9) forms ONE component that needs
    multiple propagation rounds — keep-first leaves only vec_id 0."""
    n = 16
    ang = np.arange(n) * np.deg2rad(20.0)
    vecs = np.stack([np.cos(ang), np.sin(ang)], axis=1).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
    })
    got = curation.semdedup_keep(ray.data.from_arrow(t), k=1, iters=0,
                                 tau=0.9).to_pandas().sort_values("vec_id")
    assert got["keep"].tolist() == [True] + [False] * (n - 1)
