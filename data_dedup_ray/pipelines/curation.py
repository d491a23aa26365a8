"""SemDeDup-style semantic data curation: k-means partitioning of the
embedding space + within-cluster cosine pruning.

Published method (Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", 2023): cluster embeddings with
k-means, then inside each cluster drop all but one member of every group
of semantic duplicates (pairwise cosine ≥ tau).  The scale contract is
the paper's own: ``k`` grows with corpus size so cluster populations stay
bounded (they use k≈11k for 100M docs), which keeps the within-cluster
pairwise step O(N²/k) and embarrassingly parallel across clusters.

Ray-Data shape:

- centroids are DRIVER state by design — a k×d float matrix (a few MB
  even at web scale), broadcast per iteration via ``ray.put`` and read
  zero-copy inside ``map_batches`` tasks; per-batch partial sums make
  each Lloyd iteration ONE streaming pass (classic combiner), nothing
  else ever leaves the workers;
- assignment is a vectorized matmul against the broadcast centroid
  matrix (same kernel discipline as ``search.knn_topk``);
- the prune step co-locates each cluster with one ``hash_exchange`` on
  ``cluster_id`` (the engine's sortless bucketing primitive) and runs
  the within-cluster pair scan as chunked matmuls; components keep the
  repo-wide keep-first convention (min vec_id survives).

Oracle strategy: with ``iters=0`` the centroids are the deterministic
seed rows (vec_id < k), so assignment AND the full prune pipeline are
restatable in DuckDB (``list_cosine_similarity`` + recursive
reachability); Lloyd-refined variants (iters > 0) are iterative and
driver-checked rows-only, pinned exactly by a numpy reference in tests.

Cosine convention matches pipelines/search.py: float64, unit-row
matmuls, basis points ``floor(cos·10000 + 0.5)``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from data_dedup_ray.pipelines.search import _matrix, _normalize


def _seed_centroids(emb: ray.data.Dataset, k: int, id_col: str,
                    emb_col: str):
    """Deterministic init: the embeddings of ``vec_id < k``, in id order
    (k rows — driver-small by the paper's own k ≪ N contract).  Returns
    ``(seed_ids, unit_matrix)``; cluster labels are the seeds' ACTUAL
    ids, so output semantics never depend on id contiguity, and a corpus
    missing some of the first k ids fails loudly instead of silently
    shrinking k."""
    seeds = emb.filter(expr=f"{id_col} < {int(k)}").to_pandas()
    if len(seeds) != k:
        raise ValueError(
            f"expected {k} seed rows with {id_col} < {k}, found "
            f"{len(seeds)} — pass a k matching the corpus's id range")
    seeds = seeds.sort_values(id_col)
    seed_ids = seeds[id_col].to_numpy().astype(np.int64)
    return seed_ids, _normalize(
        np.array(seeds[emb_col].tolist(), dtype=np.float64))


def _lloyd_refine(emb: ray.data.Dataset, cent: np.ndarray, iters: int,
                  id_col: str, emb_col: str) -> np.ndarray:
    """``iters`` Lloyd rounds, one streaming pass each: per-batch partial
    (count, vector-sum) per cluster — ≤ k tiny rows cross the wire per
    batch — reduced to the new k×d matrix on the driver.  Empty clusters
    keep their previous centroid (deterministic)."""
    k, d = cent.shape
    for _ in range(iters):
        ref = ray.put(cent)

        def partial(batch: pa.Table) -> pa.Table:
            C = ray.get(ref)
            X = _normalize(_matrix(batch, emb_col))
            a = np.argmax(X @ C.T, axis=1)
            counts = np.bincount(a, minlength=k)
            sums = np.zeros((k, X.shape[1]))
            np.add.at(sums, a, X)
            live = np.flatnonzero(counts)
            return pa.table({
                "cluster_id": pa.array(live, pa.int64()),
                "n": pa.array(counts[live], pa.int64()),
                "vec_sum": pa.array(list(sums[live]),
                                    pa.list_(pa.float64())),
            })

        parts = emb.map_batches(partial, batch_format="pyarrow").to_pandas()
        nxt = cent.copy()
        if len(parts):
            grouped = parts.groupby("cluster_id")
            for cid, g in grouped:
                tot = np.sum(np.stack(g["vec_sum"].to_numpy()), axis=0)
                n = g["n"].sum()
                if n:
                    nxt[int(cid)] = tot / n
        cent = _normalize(nxt)
    return cent


def kmeans_assign(
    emb: ray.data.Dataset,
    *,
    k: int = 8,
    iters: int = 0,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> ray.data.Dataset:
    """(vec_id, cluster_id, cos_bp): nearest-centroid assignment after
    ``iters`` Lloyd refinements of the deterministic seed centroids.
    Cluster labels are the seed rows' vec_ids; ties break to the lowest
    (argmax-first over id-sorted seeds = DuckDB's ``ORDER BY cos DESC,
    cid``)."""
    seed_ids, cent = _seed_centroids(emb, k, id_col, emb_col)
    cent = _lloyd_refine(emb, cent, iters, id_col, emb_col)
    ref = ray.put((seed_ids, cent))

    def assign(batch: pa.Table) -> pa.Table:
        sids, C = ray.get(ref)
        X = _normalize(_matrix(batch, emb_col))
        sims = X @ C.T
        a = np.argmax(sims, axis=1)
        best = sims[np.arange(len(a)), a]
        return pa.table({
            "vec_id": batch[id_col].combine_chunks(),
            "cluster_id": pa.array(sids[a]),
            "cos_bp": pa.array(
                np.floor(best * 10000 + 0.5).astype(np.int64)),
        })

    return emb.map_batches(assign, batch_format="pyarrow")


def kmeans_assign_sql(k: int = 8) -> str:
    """DuckDB twin of ``kmeans_assign(iters=0)``: seed centroids are the
    vec_id < k rows; assignment is argmax cosine with the same tie-break."""
    cos = ("list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),"
           " CAST(c.embedding AS DOUBLE[]))")
    return f"""
WITH cent AS (
  SELECT vec_id AS cid, embedding FROM embeddings WHERE vec_id < {k}),
scored AS (
  SELECT e.vec_id, c.cid, {cos} AS cos,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {cos} DESC, c.cid) AS rn
  FROM embeddings e CROSS JOIN cent c)
SELECT vec_id, CAST(cid AS BIGINT) AS cluster_id,
       CAST(round(cos * 10000) AS BIGINT) AS cos_bp
FROM scored WHERE rn = 1"""


def semdedup_keep(
    emb: ray.data.Dataset,
    *,
    k: int = 8,
    iters: int = 0,
    tau: float = 0.95,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    num_partitions: int = 32,
    chunk: int = 4096,
) -> ray.data.Dataset:
    """(vec_id, cluster_id, keep): SemDeDup pruning decision per vector.

    Within each k-means cluster, vectors whose pairwise cosine ≥ ``tau``
    form duplicate groups (connected components, transitively — the
    repo-wide convention); only the minimum vec_id of each group is kept.
    Clusters are co-located with ONE sortless ``hash_exchange`` on
    ``cluster_id`` (embedding payloads cross the object store once); the
    per-cluster scan is chunked matmuls, O(|cluster|²) flops bounded by
    the paper's k ∝ N sizing."""
    from data_dedup_ray.engine.exchange import hash_exchange

    # assignment recomputed inline so the embedding rides along with its
    # cluster id in ONE pass (no join between an assignment table and the
    # embedding table)
    seed_ids, cent = _seed_centroids(emb, k, id_col, emb_col)
    cent = _lloyd_refine(emb, cent, iters, id_col, emb_col)
    ref = ray.put((seed_ids, cent))
    P = num_partitions

    def tag(batch: pa.Table) -> pa.Table:
        sids, C = ray.get(ref)
        X = _normalize(_matrix(batch, emb_col))
        a = np.argmax(X @ C.T, axis=1)
        return pa.table({
            "vec_id": batch[id_col].combine_chunks(),
            "cluster_id": pa.array(sids[a]),
            "embedding": batch[emb_col].combine_chunks(),
            "_part": pa.array(a.astype(np.int64) % P),
        })

    tagged = emb.map_batches(tag, batch_format="pyarrow")
    in_schema = pa.schema([
        ("vec_id", pa.int64()), ("cluster_id", pa.int64()),
        ("embedding", pa.list_(pa.float32())),
    ])
    out_schema = pa.schema([
        ("vec_id", pa.int64()), ("cluster_id", pa.int64()),
        ("keep", pa.bool_()),
    ])

    def prune(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        cids = t["cluster_id"].to_numpy(zero_copy_only=False)
        X = _normalize(_matrix(t, "embedding"))
        order = np.argsort(ids, kind="stable")
        keep_out = np.ones(t.num_rows, dtype=bool)
        for cid in np.unique(cids):
            rows = order[cids[order] == cid]
            n = len(rows)
            if n < 2:
                continue
            sub = X[rows]
            # matmul row-chunks sized so sims stays bounded (~64 MB) no
            # matter how large a dup-heavy cluster gets
            step = max(1, min(chunk, (64 << 20) // (8 * n)))
            ii_all, jj_all = [], []
            for s in range(0, n, step):
                e = min(s + step, n)
                sims = sub[s:e] @ sub.T
                ii, jj = np.nonzero(sims >= tau)
                keep_ut = (s + ii) < jj  # upper triangle, each pair once
                ii_all.append(ii[keep_ut] + s)
                jj_all.append(jj[keep_ut])
            if not ii_all or not sum(len(a) for a in ii_all):
                continue
            ei = np.concatenate(ii_all)
            ej = np.concatenate(jj_all)
            # connected components as vectorized min-label propagation:
            # every round pushes each edge's smaller label across it with
            # np.minimum.at (no per-edge Python); converges in O(graph
            # diameter) rounds — tiny for cosine-ball dup groups
            labels = np.arange(n)
            while True:
                prev = labels.copy()
                m = np.minimum(labels[ei], labels[ej])
                np.minimum.at(labels, ei, m)
                np.minimum.at(labels, ej, m)
                labels = labels[labels]  # pointer-halving compaction
                if np.array_equal(labels, prev):
                    break
            keep_out[rows] = labels == np.arange(n)
        return pa.table({
            "vec_id": t["vec_id"].combine_chunks(),
            "cluster_id": t["cluster_id"].combine_chunks(),
            "keep": pa.array(keep_out),
        })

    return hash_exchange(
        [tagged], prune, num_partitions=P, schema=out_schema,
        in_schemas=[in_schema], apply_format="pyarrow",
    )


def semdedup_keep_sql(k: int = 8, tau: float = 0.95,
                      augmented: bool = False) -> str:
    """DuckDB twin of ``semdedup_keep(iters=0)``: seed-centroid
    assignment, within-cluster cos ≥ tau edges, recursive reachability,
    keep = (vec_id is its component's minimum).  ``augmented`` swaps in
    the planted-copy table (search.augmented_embeddings' SQL twin) so the
    prune path is provably non-vacuous — every planted copy must fall in
    its original's cluster and lose to it."""
    emb_src = ("""(
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id % 10 = 0)"""
               if augmented else "embeddings")
    cos_assign = ("list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),"
                  " CAST(c.embedding AS DOUBLE[]))")
    cos_pair = ("list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),"
                " CAST(y.embedding AS DOUBLE[]))")
    return f"""
WITH RECURSIVE src AS (SELECT * FROM {emb_src}),
cent AS (
  SELECT vec_id AS cid, embedding FROM src WHERE vec_id < {k}),
scored AS (
  SELECT e.vec_id, e.embedding, c.cid, {cos_assign} AS cos,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {cos_assign} DESC, c.cid) AS rn
  FROM src e CROSS JOIN cent c),
asg AS (SELECT vec_id, embedding, cid AS cluster_id
        FROM scored WHERE rn = 1),
dup AS (
  SELECT x.vec_id AS va, y.vec_id AS vb
  FROM asg x JOIN asg y
    ON x.cluster_id = y.cluster_id AND x.vec_id < y.vec_id
  WHERE {cos_pair} >= {tau}),
edges AS (SELECT va AS a, vb AS b FROM dup
          UNION SELECT vb, va FROM dup),
reach(a, b) AS (SELECT a, b FROM edges
                UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
comp AS (SELECT a AS vec_id, least(a, min(b)) AS root
         FROM reach GROUP BY a)
SELECT s.vec_id, CAST(s.cluster_id AS BIGINT) AS cluster_id,
       coalesce(c.root, s.vec_id) = s.vec_id AS keep
FROM asg s LEFT JOIN comp c ON c.vec_id = s.vec_id"""
