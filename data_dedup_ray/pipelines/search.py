"""Embedding similarity search + embedding-cosine near-dup.

Training-data-pipeline operators (task brief "similarity search"):

- ``knn_topk``: exact brute-force cosine top-k — broadcast query matrix
  (``ray.put`` once, read per actor), per-batch float64 matmul, per-batch
  partial top-k, one small ``groupby(query_id)`` finalize.  The scale
  baseline: O(N·Q) flops streamed over blocks, no N×N materialization.
- ``ann_lsh_topk``: the scale path — random-hyperplane LSH buckets
  restrict candidates to colliding buckets across ``n_tables`` tables;
  approximate (recall measured in tests, no SQL oracle).
- ``embedding_dup_pairs``: EXACT cosine-≥-threshold pairs via a
  distributed block-pair join (triangular bucket partitioning, chunked
  matmuls, nothing on the driver); ``embedding_dup_pairs_lsh`` is the
  sub-quadratic scale path (signature buckets + exact verify).

Cosine values are emitted as basis points (floor(cos·10000), float64
math) for driver-hash-stable comparison with DuckDB's
``list_cosine_similarity``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from data_dedup_ray.util import autoscale_pool


def _matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    """Fixed-width list column → (n, d) float64 matrix without the
    to_pylist() per-value PyObject round trip: flatten() slices the
    values buffer (zero-copy for the common no-null case)."""
    arr = batch[col].combine_chunks()
    n = len(arr)
    if n == 0:
        return np.zeros((0, 0), dtype=np.float64)
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    if len(flat) % n:
        raise ValueError(
            f"ragged embedding column {col!r}: {len(flat)} values over "
            f"{n} rows — all rows must share one dimension"
        )
    d = len(flat) // n
    lens = pc.list_value_length(arr).to_numpy(zero_copy_only=False)
    if len(lens) and (lens.min() != d or lens.max() != d):
        raise ValueError(
            f"ragged embedding column {col!r}: row lengths span "
            f"[{lens.min()}, {lens.max()}], expected uniform {d}"
        )
    return flat.reshape(n, d)


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
    qdf = emb.filter(expr=f"{id_col} < {int(n_queries)}").to_pandas()
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


_PAIR_SCHEMA = pa.schema([
    ("vec_id_a", pa.int64()), ("vec_id_b", pa.int64()),
    ("cos_bp", pa.int64()),
])


def _block_pair_emit(id_col: str, emb_col: str, B: int):
    """The triangular block-pair EMIT stage shared by the exact float
    join and the int8 variant: each row is sent to the ``B`` bucket
    pairs its id-hash block belongs to, with the partition's (lo, hi)
    packed into ``_lohi`` so the join side derives the block pair from
    the PARTITION identity, never from the data it happens to receive
    (a mixed partition fed rows from only one side must emit nothing,
    not fall back to a duplicate diagonal join)."""
    from data_dedup_ray.engine.exchange import key_partition

    def emit(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        n = len(ids)
        if n == 0:
            return t.append_column("_blk", pa.array([], pa.int64())) \
                    .append_column("_part", pa.array([], pa.int64()))
        blk = key_partition(ids, B)
        rep = np.repeat(np.arange(n), B)
        peer = np.tile(np.arange(B, dtype=np.int64), n)
        myb = blk[rep]
        lo = np.minimum(myb, peer)
        hi = np.maximum(myb, peer)
        part = lo * B - lo * (lo - 1) // 2 + (hi - lo)
        sub = t.select([id_col, emb_col]).take(pa.array(rep))
        return sub.append_column("_blk", pa.array(myb)) \
                  .append_column("_lohi", pa.array((lo << 32) | hi)) \
                  .append_column("_part", pa.array(part))

    return emit


def _emit_pairs(ids: np.ndarray, X: np.ndarray, jds: np.ndarray,
                Y: np.ndarray, threshold: float, *,
                diagonal: bool, chunk: int = 4096) -> pa.Table:
    """Exact cosine-≥-threshold pairs between two unit-row matrices,
    matmul'd in row chunks so partition memory stays bounded.
    ``diagonal=True`` means X is Y (emit each unordered pair once)."""
    out_a, out_b, out_c = [], [], []
    for s in range(0, len(ids), chunk):
        e = min(s + chunk, len(ids))
        sims = X[s:e] @ Y.T
        ii, jj = np.nonzero(sims >= threshold)
        if diagonal:
            keep = (s + ii) < jj  # upper triangle: each pair once, no self
            ii, jj = ii[keep], jj[keep]
        a, b = ids[s + ii], jds[jj]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        ns = lo < hi  # drop self-pairs (overlapping sides, e.g. star hub)
        out_a.append(lo[ns])
        out_b.append(hi[ns])
        out_c.append(
            np.floor(sims[ii, jj][ns] * 10000 + 0.5).astype(np.int64))
    if not out_a:
        return _PAIR_SCHEMA.empty_table()
    return pa.table({
        "vec_id_a": np.concatenate(out_a),
        "vec_id_b": np.concatenate(out_b),
        "cos_bp": np.concatenate(out_c),
    })


def embedding_dup_pairs(
    emb: ray.data.Dataset,
    *,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    num_blocks: int = 8,
    concurrency: int | tuple | None = None,
) -> ray.data.Dataset:
    """All pairs with cosine ≥ threshold → (vec_id_a < vec_id_b, cos_bp).

    EXACT distributed block-pair join — nothing touches the driver:
    rows hash into ``num_blocks`` blocks by id; each row is emitted to
    the ``num_blocks`` bucket-pairs its block belongs to (triangular
    partition index), and each of the B(B+1)/2 partitions matmuls its
    two block sides (upper triangle on the diagonal) in bounded row
    chunks.  Every unordered pair lands in exactly ONE partition, so no
    dedup pass is needed.  Memory per task is O((N/B)·d); shuffle volume
    is N·B rows — size ``num_blocks`` so a block side fits a worker
    (B ≈ N·d·8 / target_task_bytes).  Total flops stay O(N²) — inherent
    to an exact all-pairs join; ``embedding_dup_pairs_lsh`` is the
    sub-quadratic scale path (signature-bucketed, exact-verify,
    recall <1 only for non-identical near-pairs)."""
    from data_dedup_ray.engine.exchange import hash_exchange, key_partition

    B = num_blocks
    P = B * (B + 1) // 2
    emitted = emb.map_batches(_block_pair_emit(id_col, emb_col, B),
                              batch_format="pyarrow")

    def pair_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PAIR_SCHEMA.empty_table()
        lohi = int(t["_lohi"][0].as_py())
        lo, hi = lohi >> 32, lohi & 0xFFFFFFFF
        ids = t[id_col].to_numpy(zero_copy_only=False)
        blk = t["_blk"].to_numpy(zero_copy_only=False)
        X = _normalize(_matrix(t, emb_col))
        if lo == hi:
            return _emit_pairs(ids, X, ids, X, threshold, diagonal=True)
        mi, mj = blk == lo, blk == hi
        if not mi.any() or not mj.any():
            # one side of this block pair is empty: the cross join is
            # empty by definition (the within-block pairs of the present
            # side belong to its own diagonal partition)
            return _PAIR_SCHEMA.empty_table()
        return _emit_pairs(ids[mi], X[mi], ids[mj], X[mj], threshold,
                           diagonal=False)

    return hash_exchange(
        [emitted], pair_part, num_partitions=P,
        schema=_PAIR_SCHEMA, apply_format="pyarrow",
    )


def embedding_dup_pairs_lsh(
    emb: ray.data.Dataset,
    *,
    threshold: float = 0.99,
    n_tables: int = 8,
    n_bits: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    num_partitions: int = 64,
    dim: int | None = None,
    group_cap: int = 4096,
) -> ray.data.Dataset:
    """Sub-quadratic scale path for semantic dedup: random-hyperplane
    signature buckets → exact cosine verify within buckets → cross-table
    pair dedup.  Same output contract as ``embedding_dup_pairs``.

    Skew guard: a bucket larger than ``group_cap`` (identical-vector
    mega-clusters — boilerplate pages — land whole in one bucket of
    EVERY table) emits a linear STAR around its min-id member instead of
    all O(g²) pairs: emitted pairs are still exact-cosine-verified real
    pairs (a subset of the exact join), and component CONNECTIVITY is
    preserved for the downstream clustering, trading only pair-list
    completeness inside one oversized bucket — the same trade as the
    MinHash band star fallback (pipelines/near._pairs_in_partition).

    Recall: IDENTICAL vectors share every signature, so exact-duplicate
    recall is 1.0 by construction; a non-identical pair at angle θ
    collides in one table with (1-θ/π)^n_bits and is missed with
    (1-(1-θ/π)^n_bits)^n_tables — at cos ≥ 0.99 (θ ≤ 8.1°),
    16 bits / 8 tables ⇒ miss ≈ 2.6e-4.  Candidates are verified with
    exact cosine, so precision is always 1 vs the SQL oracle."""
    from data_dedup_ray.engine.exchange import hash_exchange, key_partition

    P = num_partitions
    if dim is None:
        first = emb.limit(1).to_pandas()
        if not len(first):
            return ray.data.from_arrow(_PAIR_SCHEMA.empty_table())
        dim = len(first[emb_col].iloc[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_bits, dim))
    pref = ray.put(planes)
    pow2 = 1 << np.arange(n_bits, dtype=np.uint64)

    def emit(t: pa.Table) -> pa.Table:
        planes_ = ray.get(pref)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        n = len(ids)
        if n == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                emb_col: t[emb_col].combine_chunks(),
                "_bkt": pa.array([], pa.uint64()),
                "_part": pa.array([], pa.int64()),
            })
        X = _normalize(_matrix(t, emb_col))
        tabs, bkts = [], []
        for ti in range(n_tables):
            sig = ((X @ planes_[ti].T > 0) * pow2).sum(axis=1,
                                                       dtype=np.uint64)
            # fold the table id into the bucket key so buckets from
            # different tables never merge
            bkts.append(sig * np.uint64(0x9E3779B97F4A7C15)
                        + np.uint64(ti))
        bkt = np.concatenate(bkts)
        rep = np.tile(np.arange(n), n_tables)
        sub = t.select([id_col, emb_col]).take(pa.array(rep))
        return sub.append_column("_bkt", pa.array(bkt)) \
                  .append_column(
                      "_part",
                      pa.array((bkt % np.uint64(P)).astype(np.int64)))

    emitted = emb.map_batches(emit, batch_format="pyarrow")

    def bucket_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PAIR_SCHEMA.empty_table()
        ids = t[id_col].to_numpy(zero_copy_only=False)
        bkt = t["_bkt"].to_numpy(zero_copy_only=False)
        X = _normalize(_matrix(t, emb_col))
        order = np.argsort(bkt, kind="stable")
        bs, Xs, ids_s = bkt[order], X[order], ids[order]
        cuts = np.flatnonzero(np.concatenate(
            [[True], bs[1:] != bs[:-1], [True]]))
        outs = []
        for gi in range(len(cuts) - 1):
            s, e = cuts[gi], cuts[gi + 1]
            if e - s < 2:
                continue
            if e - s > group_cap:
                # star fallback: hub = min id; one (1, g) matmul instead
                # of (g, g) — connectivity preserved, exact cos values
                hub = s + int(np.argmin(ids_s[s:e]))
                outs.append(_emit_pairs(
                    ids_s[hub:hub + 1], Xs[hub:hub + 1],
                    ids_s[s:e], Xs[s:e], threshold, diagonal=False))
                continue
            outs.append(_emit_pairs(ids_s[s:e], Xs[s:e], ids_s[s:e],
                                    Xs[s:e], threshold, diagonal=True))
        if not outs:
            return _PAIR_SCHEMA.empty_table()
        cat = pa.concat_tables(outs)
        # map-side pair dedup (a pair can fire in several buckets of
        # THIS partition); cross-partition dedup happens in round 2
        df = cat.to_pandas().drop_duplicates(["vec_id_a", "vec_id_b"])
        return pa.Table.from_pandas(df, preserve_index=False)

    cand = hash_exchange(
        [emitted], bucket_pairs, num_partitions=P,
        schema=_PAIR_SCHEMA, apply_format="pyarrow",
    )

    # round 2: global pair dedup — key on the pair, keep first (cos is
    # deterministic per pair, so "first" is well-defined output-wise)
    def rekey(t: pa.Table) -> pa.Table:
        a = t["vec_id_a"].to_numpy(zero_copy_only=False)
        b = t["vec_id_b"].to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            h = (a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                 + b.astype(np.uint64))
        return t.append_column(
            "_part", pa.array((h % np.uint64(P)).astype(np.int64)))

    def distinct(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["vec_id_a", "vec_id_b"])

    return hash_exchange(
        [cand.map_batches(rekey, batch_format="pyarrow")], distinct,
        num_partitions=P, schema=_PAIR_SCHEMA,
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
    qdf = emb.filter(expr=f"{id_col} < {int(n_queries)}").to_pandas()
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
    qdf = emb.filter(expr=f"{id_col} < {int(n_queries)}").to_pandas()
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
    sf_dir: str, *, threshold: float = 0.99,
    dsu_max_edges: int = 20_000_000,
) -> ray.data.Dataset:
    """SemDeDup-style semantic dedup clusters: connected components of the
    cosine-≥-threshold pair graph over the augmented embedding table,
    labeled by min vec_id (singletons self-labeled): ``(vec_id,
    cluster_id)``.

    The edge list stays a Dataset; a ``count()`` aggregate decides the
    component strategy — driver DSU below the guard, fully distributed
    label propagation past it (edges are handed over as a Dataset of
    width-stable zero-padded string ids — order-preserving for the
    non-negative vec_ids, so min-label semantics carry over — and the
    result maps back without any driver collection)."""
    from data_dedup_ray.pipelines.components import dsu_components

    emb = augmented_embeddings(sf_dir)
    # materialize once: count() then reads metadata; the collect (or the
    # label-propagation input) reuses the same blocks
    edges = embedding_dup_pairs(emb, threshold=threshold).materialize()
    if edges.count() > dsu_max_edges:
        from data_dedup_ray.pipelines.components import label_propagation

        def _pad(col: pa.ChunkedArray) -> pa.Array:
            return pa.array(
                [f"{int(v):012d}" for v in
                 col.to_numpy(zero_copy_only=False)], pa.string())

        sedges = edges.map_batches(
            lambda t: pa.table({"url_a": _pad(t["vec_id_a"]),
                                "url_b": _pad(t["vec_id_b"])}),
            batch_format="pyarrow",
        )
        nodes = emb.map_batches(
            lambda t: pa.table({"url": _pad(t["vec_id"])}),
            batch_format="pyarrow",
        )
        lp = label_propagation(nodes, sedges)
        return lp.map_batches(
            lambda t: pa.table({
                "vec_id": pc.cast(t["url"].combine_chunks(), pa.int64()),
                "cluster_id": pc.cast(t["cluster_id"].combine_chunks(),
                                      pa.int64()),
            }),
            batch_format="pyarrow",
        )
    assignment = dsu_components(edges.to_pandas(), a="vec_id_a",
                                b="vec_id_b")
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


_PAIR_I8_SCHEMA = pa.schema([
    ("vec_id_a", pa.int64()), ("vec_id_b", pa.int64()),
    ("cos2_bp", pa.int64()),
])

#: largest embedding dim for which the int8 predicate is int64-exact:
#: |dot| ≤ d·127², so dot²·10⁴ ≤ d²·127⁴·10⁴ < 2⁶³ ⇔ d ≤ 1882 — at
#: 1883 the all-saturated dot already wraps ((1883·127²)²·10⁴ ≈
#: 9.2239e18 > 2⁶³ ≈ 9.2234e18).  The min_cos2_bp·den side obeys the
#: same bound since min_cos2_bp ≤ 10⁴.
_INT8_MAX_DIM = 1882


def quantize_int8(X: np.ndarray) -> np.ndarray:
    """Per-vector symmetric int8 quantization: ``q_i = floor(x_i · 127 /
    max|x|)`` ∈ [−127, 127] — the FAISS-SQ8-style scalar quantizer as a
    DETERMINISTIC rule DuckDB can restate (all arithmetic in float64:
    the float32→float64 cast is exact, and both sides evaluate the same
    multiply-then-divide-then-floor IEEE sequence).  Zero vectors stay
    zero."""
    X = X.astype(np.float64)
    mx = np.abs(X).max(axis=1, keepdims=True)
    safe = np.where(mx == 0, 1.0, mx)
    return np.floor(X * 127.0 / safe).astype(np.int64)


def _emit_pairs_int8(ids: np.ndarray, Qx: np.ndarray, jds: np.ndarray,
                     Qy: np.ndarray, min_cos2_bp: int, *,
                     diagonal: bool, chunk: int = 4096) -> pa.Table:
    """Integer-exact quantized-cosine pairs: keep (a, b) iff the int
    dot is positive and ``dot²·10⁴ ≥ min_cos2_bp · n2a · n2b`` — the
    same cross-multiplied floor-division predicate as tf_cosine.

    The matmul runs in float64 (exact while every dot < 2⁵³ — true for
    any dim ≤ 5·10⁸ at |q| ≤ 127); the final square/scale returns to
    int64, so the reported ``cos2_bp = dot²·10⁴ // (n2a·n2b)`` is
    bit-reproducible.  int64 bound ENFORCED: worst-case
    ``dot²·10⁴ ≤ (d·127²)²·10⁴ < 2⁶³`` requires ``d ≤ 1883`` — larger
    dims would silently wrap in numpy while the HUGEINT SQL twin stays
    exact, so they fail loudly here instead."""
    d = Qx.shape[1] if Qx.ndim == 2 else 0
    if d > _INT8_MAX_DIM:
        raise ValueError(
            f"embedding dim {d} exceeds the int64-exact bound "
            f"({_INT8_MAX_DIM}) for the quantized cosine predicate; "
            "use embedding_dup_pairs (float path) for wider vectors")
    n2x = (Qx * Qx).sum(axis=1)
    n2y = (Qy * Qy).sum(axis=1)
    Fy = Qy.astype(np.float64).T
    out_a, out_b, out_c = [], [], []
    for s in range(0, len(ids), chunk):
        e = min(s + chunk, len(ids))
        dot = (Qx[s:e].astype(np.float64) @ Fy).astype(np.int64)
        den = n2x[s:e, None] * n2y[None, :]
        num = dot * dot * 10000
        ok = (dot > 0) & (num >= min_cos2_bp * den)
        ii, jj = np.nonzero(ok)
        if diagonal:
            keep = (s + ii) < jj
            ii, jj = ii[keep], jj[keep]
        a, b = ids[s + ii], jds[jj]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        ns = lo < hi
        ii, jj = ii[ns], jj[ns]
        out_a.append(lo[ns])
        out_b.append(hi[ns])
        out_c.append(num[ii, jj] // den[ii, jj])
    if not out_a:
        return _PAIR_I8_SCHEMA.empty_table()
    return pa.table({
        "vec_id_a": np.concatenate(out_a),
        "vec_id_b": np.concatenate(out_b),
        "cos2_bp": np.concatenate(out_c),
    })


def embedding_dup_pairs_int8(
    emb: ray.data.Dataset,
    *,
    min_cos2_bp: int = 9801,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    num_blocks: int = 8,
) -> ray.data.Dataset:
    """``(vec_id_a < vec_id_b, cos2_bp)`` over int8-QUANTIZED vectors —
    the memory tier of the exact block-pair join: 1 B/dim instead of
    4–8, so each of the B(B+1)/2 partitions holds 4–8× more rows per
    byte (the vector analogue of the b-bit MinHash tier; FAISS's SQ8).

    Same triangular partitioning as ``embedding_dup_pairs`` (every
    unordered pair in exactly ONE partition, O((N/B)·d) task memory, no
    driver involvement) with the quantized integer scorer; the default
    ``min_cos2_bp = 9801`` is the cos ≥ 0.99 bar squared.  Quantization
    moves the measured similarity — planted EXACT copies still score
    cos² = 1 exactly (identical int vectors), so the dedup contract on
    true duplicates is loss-free; near-pairs shift by O(1/127) and the
    threshold semantics are 'quantized cosine', stated, not hidden."""
    from data_dedup_ray.engine.exchange import hash_exchange

    B = num_blocks
    P = B * (B + 1) // 2
    emitted = emb.map_batches(_block_pair_emit(id_col, emb_col, B),
                              batch_format="pyarrow")

    def pair_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PAIR_I8_SCHEMA.empty_table()
        lohi = int(t["_lohi"][0].as_py())
        lo, hi = lohi >> 32, lohi & 0xFFFFFFFF
        ids = t[id_col].to_numpy(zero_copy_only=False)
        blk = t["_blk"].to_numpy(zero_copy_only=False)
        Q = quantize_int8(_matrix(t, emb_col))
        if lo == hi:
            return _emit_pairs_int8(ids, Q, ids, Q, min_cos2_bp,
                                    diagonal=True)
        mi, mj = blk == lo, blk == hi
        if not mi.any() or not mj.any():
            return _PAIR_I8_SCHEMA.empty_table()
        return _emit_pairs_int8(ids[mi], Q[mi], ids[mj], Q[mj],
                                min_cos2_bp, diagonal=False)

    return hash_exchange(
        [emitted], pair_part, num_partitions=P,
        schema=_PAIR_I8_SCHEMA, apply_format="pyarrow",
    )
