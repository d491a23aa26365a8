"""Embedding similarity search + embedding-cosine near-dup.

Training-data-pipeline operators (task brief "similarity search"):

- ``knn_topk``: exact brute-force cosine top-k — broadcast query matrix
  (``ray.put`` once, read per actor), per-batch float64 matmul, per-batch
  partial top-k, one small ``groupby(query_id)`` finalize.  The scale
  baseline: O(N·Q) flops streamed over blocks, no N×N materialization.
- ``ann_lsh_topk``: the scale path — random-hyperplane LSH buckets
  restrict candidates to colliding buckets across ``n_tables`` tables;
  approximate (recall measured in tests, no SQL oracle).
- ``embedding_dup_pairs``: pairs with cosine ≥ threshold via the same
  broadcast-matmul pattern (small side = the corpus itself at test scale;
  at real scale the LSH bucket grouping replaces the broadcast).

Cosine values are emitted as basis points (floor(cos·10000), float64
math) for driver-hash-stable comparison with DuckDB's
``list_cosine_similarity``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from data_dedup_ray.util import autoscale_pool


def _matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    x = np.array(batch[col].to_pylist(), dtype=np.float64)
    return x


def _normalize(x: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(x, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return x / n


def augmented_embeddings(sf_dir: str) -> ray.data.Dataset:
    """embeddings + planted exact-copy vectors (vec_id % 10 == 0 → copy at
    vec_id + 100000) — deterministic, SQL-twin in oracles.py."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def dup(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        mask = ids % 10 == 0
        sub = batch.filter(pa.array(mask))
        copies = pa.table(
            {
                "vec_id": pa.array(sub["vec_id"].to_numpy(zero_copy_only=False)
                                   + 100000),
                "embedding": sub["embedding"],
            }
        )
        return pa.concat_tables([batch.select(["vec_id", "embedding"]), copies])

    return ds.map_batches(dup, batch_format="pyarrow")


def _empty_topk() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "query_id": pd.Series(dtype="int64"),
            "neighbor_id": pd.Series(dtype="int64"),
            "rank": pd.Series(dtype="int64"),
            "cos_bp": pd.Series(dtype="int64"),
        }
    )


def knn_topk(
    emb: ray.data.Dataset,
    *,
    k: int = 5,
    n_queries: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    concurrency: int | tuple | None = None,
) -> pd.DataFrame:
    """Exact cosine top-k for the queries ``vec_id < n_queries``.

    → (query_id, neighbor_id, rank, cos_bp); self-matches excluded;
    deterministic tie-break (cos desc, neighbor_id asc)."""
    qdf = emb.filter(lambda r: r[id_col] < n_queries).to_pandas()
    if len(qdf) == 0:
        return _empty_topk()
    qdf = qdf.sort_values(id_col)
    qids = qdf[id_col].to_numpy()
    Q = _normalize(np.array(qdf[emb_col].tolist(), dtype=np.float64))
    ref = ray.put((qids, Q))

    def _partial_topk(batch: pa.Table) -> pa.Table:
            # plain task: ray.get of the broadcast matrix is a zero-copy
            # local plasma read — no actor state needed
            qids_, Q_ = ray.get(ref)
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            X = _normalize(_matrix(batch, emb_col))
            sims = X @ Q_.T  # (batch, nq)
            out_q, out_n, out_s = [], [], []
            kk = min(k, len(ids))
            for j, q in enumerate(qids_):
                s = sims[:, j]
                keep = ids != q
                order = np.lexsort((ids[keep], -s[keep]))[:kk]
                sel = np.flatnonzero(keep)[order]
                out_q.append(np.full(len(sel), q, dtype=np.int64))
                out_n.append(ids[sel])
                out_s.append(s[sel])
            return pa.table(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "cos": np.concatenate(out_s),
                }
            )

    partial = emb.map_batches(_partial_topk, batch_format="pyarrow")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", "neighbor_id"], ascending=[False, True],
                          kind="stable").head(k)
        return pd.DataFrame(
            {
                "query_id": g["query_id"].to_numpy(),
                "neighbor_id": g["neighbor_id"].to_numpy(),
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
                "cos_bp": np.floor(g["cos"].to_numpy() * 10000 + 0.5).astype(np.int64),
            }
        )

    return (
        partial.groupby("query_id")
        .map_groups(final, batch_format="pandas")
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


def embedding_dup_pairs(
    emb: ray.data.Dataset,
    *,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    concurrency: int | tuple | None = None,
) -> pd.DataFrame:
    """All pairs with cosine ≥ threshold → (vec_id_a < vec_id_b, cos_bp).

    Pattern: broadcast the (normalized) full matrix once, stream batches
    against it.  At 100 TB the broadcast side becomes LSH buckets
    (``ann_lsh_topk``'s table layout) — same output contract."""
    all_df = emb.to_pandas().sort_values(id_col)
    ids_all = all_df[id_col].to_numpy()
    M = _normalize(np.array(all_df[emb_col].tolist(), dtype=np.float64))
    ref = ray.put((ids_all, M))

    def _pairs(batch: pa.Table) -> pa.Table:
            ids_all_, M_ = ray.get(ref)
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            X = _normalize(_matrix(batch, emb_col))
            sims = X @ M_.T
            bi, bj = np.nonzero(sims >= threshold)
            a, b = ids[bi], ids_all_[bj]
            keep = a < b  # dedupe orientation + drop self
            return pa.table(
                {
                    "vec_id_a": a[keep],
                    "vec_id_b": b[keep],
                    "cos_bp": np.floor(sims[bi, bj][keep] * 10000 + 0.5).astype(np.int64),
                }
            )

    return (
        emb.map_batches(_pairs, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["vec_id_a", "vec_id_b"])
        .reset_index(drop=True)
    )


def ann_lsh_topk(
    emb: ray.data.Dataset,
    *,
    k: int = 5,
    n_queries: int = 10,
    n_tables: int = 16,
    n_bits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    concurrency: int | tuple | None = None,
) -> pd.DataFrame:
    """Approximate top-k: random-hyperplane LSH bucket candidates, then
    exact cosine within candidates.  The scale path — candidates per query
    are bounded by bucket occupancy instead of the corpus size."""
    qdf = emb.filter(lambda r: r[id_col] < n_queries).to_pandas()
    if len(qdf) == 0:
        return _empty_topk()
    qdf = qdf.sort_values(id_col)
    dim = len(qdf[emb_col].iloc[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_bits, dim))
    Q = _normalize(np.array(qdf[emb_col].tolist(), dtype=np.float64))
    qids = qdf[id_col].to_numpy()
    qsig = np.stack([(Q @ planes[t].T > 0) for t in range(n_tables)])  # (T, nq, bits)
    pow2 = 1 << np.arange(n_bits)
    qbuckets = (qsig * pow2).sum(axis=2)  # (T, nq)
    ref = ray.put((qids, Q, planes, qbuckets))

    def _candidates(batch: pa.Table) -> pa.Table:
        qids_, Q_, planes_, qb_ = ray.get(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        X = _normalize(_matrix(batch, emb_col))
        cand = np.zeros((len(ids), len(qids_)), dtype=bool)
        for t in range(len(planes_)):
            xb = ((X @ planes_[t].T > 0) * pow2).sum(axis=1)
            cand |= xb[:, None] == qb_[t][None, :]
        sims = X @ Q_.T
        bi, bj = np.nonzero(cand)
        keep = ids[bi] != qids_[bj]
        return pa.table(
            {
                "query_id": qids_[bj][keep],
                "neighbor_id": ids[bi][keep],
                "cos": sims[bi, bj][keep],
            }
        )

    cands = emb.map_batches(_candidates, batch_format="pyarrow")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", "neighbor_id"], ascending=[False, True],
                          kind="stable").head(k)
        return pd.DataFrame(
            {
                "query_id": g["query_id"].to_numpy(),
                "neighbor_id": g["neighbor_id"].to_numpy(),
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
                "cos_bp": np.floor(g["cos"].to_numpy() * 10000 + 0.5).astype(np.int64),
            }
        )

    return (
        cands.groupby("query_id")
        .map_groups(final, batch_format="pandas")
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


def _kmeans(X: np.ndarray, nlist: int, seed: int = 42,
            n_iter: int = 8) -> np.ndarray:
    """Deterministic mini k-means on unit vectors (spherical): seeded
    farthest-point init, Lloyd iterations, centroids re-normalized.
    numpy-only — the training sample is driver-sized by construction."""
    rng = np.random.default_rng(seed)
    n = len(X)
    nlist = min(nlist, n)
    # farthest-point init from a seeded start for spread, deterministic
    first = int(rng.integers(0, n))
    cent = [X[first]]
    d = 1.0 - X @ cent[0]
    for _ in range(nlist - 1):
        nxt = int(np.argmax(d))
        cent.append(X[nxt])
        d = np.minimum(d, 1.0 - X @ cent[-1])
    C = np.stack(cent)
    for _ in range(n_iter):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(nlist):
            m = assign == c
            if m.any():
                C[c] = X[m].mean(axis=0)
        C = _normalize(C)
    return C


def ann_ivf_topk(
    emb: ray.data.Dataset,
    *,
    k: int = 5,
    n_queries: int = 10,
    nlist: int = 32,
    nprobe: int = 4,
    train_size: int = 2048,
    seed: int = 42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    concurrency: int | tuple | None = None,
) -> pd.DataFrame:
    """Approximate top-k via an IVF coarse quantizer: vectors partition
    into ``nlist`` centroid cells; each query probes its ``nprobe``
    nearest cells and ranks exactly within them.

    The complementary scale path to ``ann_lsh_topk``: centroids are
    trained ONCE on a driver-sized sample (deterministic mini k-means),
    broadcast via ``ray.put``, and cell assignment is one matmul-argmax
    per batch — candidates per query are bounded by cell occupancy
    (≈ nprobe/nlist of the corpus) instead of the corpus size."""
    qdf = emb.filter(lambda r: r[id_col] < n_queries).to_pandas()
    if len(qdf) == 0:
        return _empty_topk()
    qdf = qdf.sort_values(id_col)
    train = emb.limit(train_size).to_pandas()
    C = _kmeans(
        _normalize(np.array(train[emb_col].tolist(), dtype=np.float64)),
        nlist, seed=seed,
    )
    Q = _normalize(np.array(qdf[emb_col].tolist(), dtype=np.float64))
    qids = qdf[id_col].to_numpy()
    nprobe = min(nprobe, len(C))
    qcells = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    ref = ray.put((qids, Q, C, qcells))

    def _candidates(batch: pa.Table) -> pa.Table:
        qids_, Q_, C_, qcells_ = ray.get(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        X = _normalize(_matrix(batch, emb_col))
        cell = np.argmax(X @ C_.T, axis=1)  # (batch,)
        cand = (cell[:, None, None] == qcells_[None, :, :]).any(
            axis=2
        )  # (batch, nq)
        sims = X @ Q_.T
        bi, bj = np.nonzero(cand)
        keep = ids[bi] != qids_[bj]
        return pa.table(
            {
                "query_id": qids_[bj][keep],
                "neighbor_id": ids[bi][keep],
                "cos": sims[bi, bj][keep],
            }
        )

    cands = emb.map_batches(_candidates, batch_format="pyarrow")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", "neighbor_id"], ascending=[False, True],
                          kind="stable").head(k)
        return pd.DataFrame(
            {
                "query_id": g["query_id"].to_numpy(),
                "neighbor_id": g["neighbor_id"].to_numpy(),
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
                "cos_bp": np.floor(g["cos"].to_numpy() * 10000 + 0.5).astype(np.int64),
            }
        )

    return (
        cands.groupby("query_id")
        .map_groups(final, batch_format="pandas")
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


def embedding_centroids(sf_dir: str) -> ray.data.Dataset:
    """Per-label centroid accumulators over the embedding column:
    ``(label, dim, sum_e6, n_vecs)`` — the vector-aggregation primitive
    behind IVF training / class prototypes / dedup-cluster centroids.

    Exactness: each float32 component is scaled to an int64 (×1e6,
    half-away rounding of its exact double value) BEFORE summation, so
    the distributed partial sums are order-independent and match the
    SQL oracle bit-for-bit (float accumulation would drift in the last
    ulp under re-partitioning).  The caller divides ``sum_e6 / n_vecs``
    for the mean.  Scale shape: each batch collapses to one partial row
    per (label, dim) — shuffle volume is O(labels × dims × batches),
    independent of vector count.
    """
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    )

    def partial(t: pa.Table) -> pa.Table:
        emb = t["embedding"].combine_chunks()
        flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        n, d = len(t), len(flat) // max(len(t), 1)
        mat = flat.reshape(n, d)
        # exact half-away-from-zero on the double values (DuckDB round()):
        # ax - floor(ax) is computed exactly, so the >= 0.5 test never
        # suffers the classic +0.5 last-ulp misround
        ax = np.abs(mat * 1e6)
        base = np.floor(ax)
        scaled = (np.sign(mat * 1e6) * (base + (ax - base >= 0.5))
                  ).astype(np.int64)
        labels = t["label"].to_numpy(zero_copy_only=False)
        out_lab, out_dim, out_sum, out_n = [], [], [], []
        for lab in np.unique(labels):
            rows = scaled[labels == lab]
            out_lab.extend([int(lab)] * d)
            out_dim.extend(range(1, d + 1))
            out_sum.extend(rows.sum(axis=0).tolist())
            out_n.extend([rows.shape[0]] * d)
        return pa.table({
            "label": pa.array(out_lab, pa.int64()),
            "dim": pa.array(out_dim, pa.int64()),
            "sum_e6": pa.array(out_sum, pa.int64()),
            "n_vecs": pa.array(out_n, pa.int64()),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Sum(on="sum_e6", alias_name="sum_e6"),
                   Sum(on="n_vecs", alias_name="n_vecs"))
    )


def embedding_centroids_sql() -> str:
    return """
SELECT CAST(label AS BIGINT) AS label, CAST(g.i AS BIGINT) AS dim,
       CAST(sum(CAST(round(CAST(embedding[g.i] AS DOUBLE) * 1000000)
                     AS BIGINT)) AS BIGINT) AS sum_e6,
       count(*) AS n_vecs
FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS g(i)
GROUP BY label, g.i"""


def embedding_dup_clusters(
    sf_dir: str, *, threshold: float = 0.99
) -> ray.data.Dataset:
    """SemDeDup-style semantic dedup clusters: connected components of the
    cosine-≥-threshold pair graph over the augmented embedding table,
    labeled by min vec_id (singletons self-labeled): ``(vec_id,
    cluster_id)``.  Same component machinery as the MinHash clusters
    (driver DSU below the edge guard, distributed label propagation past
    it); the edge list is output-sized by construction."""
    from data_dedup_ray.pipelines.components import dsu_components

    emb = augmented_embeddings(sf_dir)
    edges = embedding_dup_pairs(emb, threshold=threshold)
    try:
        assignment = dsu_components(edges, a="vec_id_a", b="vec_id_b")
    except ValueError:
        # past the driver DSU edge guard: distributed min-label
        # propagation over width-stable string ids (order-preserving for
        # the non-negative vec_ids, so min-label semantics carry over)
        import ray.data as rd

        from data_dedup_ray.pipelines.components import label_propagation

        sedges = pd.DataFrame({
            "url_a": [f"{v:012d}" for v in edges["vec_id_a"]],
            "url_b": [f"{v:012d}" for v in edges["vec_id_b"]],
        })
        nodes = emb.map_batches(
            lambda t: pa.table({"url": pa.array(
                [f"{int(v):012d}" for v in
                 t["vec_id"].to_numpy(zero_copy_only=False)], pa.string())}),
            batch_format="pyarrow",
        )
        lp = label_propagation(nodes, rd.from_pandas(sedges)).to_pandas()
        assignment = dict(zip(lp["url"].astype(int), lp["cluster_id"].astype(int)))
    ref = ray.put({int(k): int(v) for k, v in assignment.items()})

    def attach(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        vals = np.fromiter(
            (m.get(int(i), int(i)) for i in ids), np.int64, len(ids)
        )
        return pa.table({
            "vec_id": t["vec_id"].combine_chunks(),
            "cluster_id": pa.array(vals),
        })

    return emb.map_batches(attach, batch_format="pyarrow")


def embedding_dup_clusters_sql(threshold: float = 0.99) -> str:
    cos = (
        "list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),"
        " CAST(b.embedding AS DOUBLE[]))"
    )
    return f"""
WITH RECURSIVE emb AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id % 10 = 0),
dup AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM emb a JOIN emb b ON a.vec_id < b.vec_id
  WHERE {cos} >= {threshold}),
edges AS (SELECT va AS a, vb AS b FROM dup
          UNION SELECT vb, va FROM dup),
reach(a, b) AS (SELECT a, b FROM edges
                UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
comp AS (SELECT a AS vec_id, least(a, min(b)) AS cluster_id
         FROM reach GROUP BY a)
SELECT e.vec_id, coalesce(c.cluster_id, e.vec_id) AS cluster_id
FROM emb e LEFT JOIN comp c ON c.vec_id = e.vec_id"""
