"""Persisted int8 embedding index — the SEMANTIC tier of the
fingerprint-store ladder (SURVEY §8): 32 B content sha (exact
re-capture) → 8 B SimHash → 16 B b-bit MinHash → 1 KB signatures →
**d B quantized embedding (cosine near-dup, 1 B/dim — the FAISS-SQ8
storage shape)** → full shingle blobs (exact verify).

``build_embedding_index`` quantizes each vector ONCE with the
deterministic symmetric rule (``search.quantize_int8`` —
``floor(x·127/max|x|)``, SQL-restatable) and persists
``(vec_id, q8 blob, n2)`` rows through the resumable sink: the float
vectors are never written, the squared norm is precomputed so the query
path never re-reduces the blob, and the quantizer identity is lineage
(``validate_store_config`` rejects a query whose rule could drift).

``incremental_embedding_dup_pairs`` joins a new crawl's vectors against
the stored tier with a bipartite GRID block join — the cross-corpus
analogue of ``search.embedding_dup_pairs``'s triangular self-join:
index rows hash into ``B`` blocks, new rows into ``C`` blocks, each
(index-block, new-block) cell is ONE of ``B·C`` exchange partitions, so
every cross pair is scored in exactly one task with
O(|idx|/B + |new|/C) rows in memory and zero driver involvement.
Scoring is the int64-exact quantized-cosine predicate
(``dot²·10⁴ ≥ min_cos2_bp·n2_i·n2_n``, dot > 0) shared with
``embedding_dup_pairs_int8`` — dim-guarded (≤ 1882) so numpy can never
silently wrap where the HUGEINT SQL twin stays exact.  Quantization is
loss-free on exact copies: an unchanged re-embedded page scores
``cos2_bp = 10000`` and recall on true duplicates is 1.

At 100 TB: the index is ~d bytes/doc (64 B at dim 64 — between the
b-bit and signature tiers), append-only per crawl (a list of store
dirs reads as one index), and the grid join's shuffle volume is
``|idx|·C + |new|·B`` fixed-width rows — size B and C so a cell's two
sides fit one worker; floats never shuffle, nothing re-embeds.

Reference anchor: the same store-ladder generalization of Data-Dedup's
cheapest-digest-first cascade (lib/Data/Dedup/Engine.pm:558-566) as
pipelines/bbit.py, at the semantic-similarity rung.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from data_dedup_ray.engine.exchange import hash_exchange, key_partition
from data_dedup_ray.pipelines.search import (
    _INT8_MAX_DIM,
    _matrix,
    quantize_int8,
)

_STORE_SCHEMA = pa.schema([("vec_id", pa.int64()),
                           ("q8", pa.large_binary()),
                           ("n2", pa.int64())])
_PAIR_OUT = pa.schema([("new_id", pa.int64()), ("index_id", pa.int64()),
                       ("cos2_bp", pa.int64())])

_CONFIG = {"kind": "embedding_index", "b": 8, "quantizer": "sym127"}


def quantized_rows(emb: ray.data.Dataset, *, id_col: str = "vec_id",
                   emb_col: str = "embedding") -> ray.data.Dataset:
    """``(vec_id, q8, n2)`` — per-vector int8 blob (d bytes, two's
    complement) + precomputed squared norm."""

    def fn(t: pa.Table) -> pa.Table:
        X = _matrix(t, emb_col)
        if X.shape[1] > _INT8_MAX_DIM:
            raise ValueError(
                f"embedding dim {X.shape[1]} exceeds the int64-exact "
                f"bound ({_INT8_MAX_DIM}) for the quantized predicate")
        Q = quantize_int8(X) if X.size else X.astype(np.int64)
        n2 = (Q * Q).sum(axis=1).astype(np.int64) if X.size else \
            np.zeros(len(t), np.int64)
        blobs = [q.astype(np.int8).tobytes() for q in Q] if X.size \
            else [b""] * len(t)
        return pa.table({
            "vec_id": t[id_col].combine_chunks().cast(pa.int64()),
            "q8": pa.array(blobs, pa.large_binary()),
            "n2": pa.array(n2),
        })

    return emb.map_batches(fn, batch_format="pyarrow")


def build_embedding_index(
    emb: ray.data.Dataset, path: str, *, id_col: str = "vec_id",
    emb_col: str = "embedding", num_partitions: int = 32,
):
    """Quantize once, persist the d-byte/vector tier (resumable sink +
    quantizer lineage).  Floats never reach disk."""
    from data_dedup_ray.state.sink import resumable_write_parquet

    return resumable_write_parquet(
        quantized_rows(emb, id_col=id_col, emb_col=emb_col), path,
        key_col="vec_id", num_partitions=num_partitions,
        config=dict(_CONFIG),
    )


def read_embedding_index(path) -> ray.data.Dataset:
    """The stored ``(vec_id, q8, n2)`` table; a list reads several
    crawls' stores as one append-only index."""
    import glob
    import os

    from data_dedup_ray.state.sink import validate_store_config

    validate_store_config(path, dict(_CONFIG))
    paths = path if isinstance(path, (list, tuple)) else [path]
    files: list[str] = []
    for p in paths:
        files += sorted(glob.glob(os.path.join(p, "part=*",
                                               "*.parquet")))
    return ray.data.read_parquet(files, partitioning=None)


def _blobs_to_matrix(blobs, d: int) -> np.ndarray:
    return np.frombuffer(b"".join(blobs), dtype=np.int8) \
        .reshape(-1, d).astype(np.int64)


def _score_cross(ids_i: np.ndarray, Qi: np.ndarray, n2i: np.ndarray,
                 ids_n: np.ndarray, Qn: np.ndarray, n2n: np.ndarray,
                 min_cos2_bp: int, chunk: int = 4096) -> pa.Table:
    """Bipartite int64-exact quantized-cosine pairs: keep (new, index)
    iff ``dot > 0`` and ``dot²·10⁴ ≥ min_cos2_bp·n2_i·n2_n`` — the
    sides are NOT lo/hi-normalized (unlike the self-join emitter): the
    output row says which corpus each endpoint came from."""
    out_n, out_i, out_c = [], [], []
    Fi = Qi.astype(np.float64).T
    for s in range(0, len(ids_n), chunk):
        e = min(s + chunk, len(ids_n))
        dot = (Qn[s:e].astype(np.float64) @ Fi).astype(np.int64)
        den = n2n[s:e, None] * n2i[None, :]
        num = dot * dot * 10000
        ok = (dot > 0) & (num >= min_cos2_bp * den)
        jj, ii = np.nonzero(ok)
        out_n.append(ids_n[s + jj])
        out_i.append(ids_i[ii])
        out_c.append(num[jj, ii] // den[jj, ii])
    if not out_n:
        return _PAIR_OUT.empty_table()
    return pa.table({
        "new_id": np.concatenate(out_n),
        "index_id": np.concatenate(out_i),
        "cos2_bp": np.concatenate(out_c),
    })


def incremental_embedding_dup_pairs(
    new_emb: ray.data.Dataset, index_path, *,
    min_cos2_bp: int = 9801, id_col: str = "vec_id",
    emb_col: str = "embedding", num_blocks: int = 8,
    num_new_blocks: int | None = None,
) -> ray.data.Dataset:
    """``(new_id, index_id, cos2_bp)`` — semantic near-dup pairs between
    the new crawl's vectors and the persisted int8 index at quantized
    cos² ≥ ``min_cos2_bp`` (default 9801 = the cos ≥ 0.99 bar squared).

    Bipartite grid block join (see module docstring): every cross pair
    scored in exactly one of B·C partitions, no dedup pass, no driver
    collect.  The new side quantizes live through the same rule the
    index persisted — ``validate_store_config`` pins that identity."""
    B = num_blocks
    C = num_new_blocks or max(1, num_blocks // 2)

    idx = read_embedding_index(index_path)

    def emit_idx(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        n = len(ids)
        if n == 0:
            return t.append_column("_part", pa.array([], pa.int64()))
        blk = key_partition(ids, B)
        rep = np.repeat(np.arange(n), C)
        peer = np.tile(np.arange(C, dtype=np.int64), n)
        part = blk[rep] * C + peer
        return t.take(pa.array(rep)).append_column(
            "_part", pa.array(part))

    def emit_new(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        n = len(ids)
        if n == 0:
            return t.append_column("_part", pa.array([], pa.int64()))
        blk = key_partition(ids, C)
        rep = np.repeat(np.arange(n), B)
        peer = np.tile(np.arange(B, dtype=np.int64), n)
        part = peer * C + blk[rep]
        return t.take(pa.array(rep)).append_column(
            "_part", pa.array(part))

    new_rows = quantized_rows(new_emb, id_col=id_col, emb_col=emb_col) \
        .map_batches(emit_new, batch_format="pyarrow")
    idx_rows = idx.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("q8"), "q8",
            t["q8"].combine_chunks().cast(pa.large_binary())),
        batch_format="pyarrow",
    ).map_batches(emit_idx, batch_format="pyarrow")

    def _side(t: pa.Table):
        import pyarrow.compute as pc

        lens = pc.binary_length(t["q8"].combine_chunks()) \
            .to_numpy(zero_copy_only=False)
        dims = set(np.unique(lens)) - {0}
        if len(dims) > 1:
            raise ValueError(
                f"mixed embedding dims in one index: {sorted(dims)}")
        d = dims.pop() if dims else 0
        mask = lens == d if d else np.zeros(len(lens), dtype=bool)
        blobs = [b for b in t["q8"].to_pylist() if len(b) == d] \
            if d else []
        return (t["vec_id"].to_numpy(zero_copy_only=False)[mask],
                _blobs_to_matrix(blobs, d) if d
                else np.zeros((0, 1), np.int64),
                t["n2"].to_numpy(zero_copy_only=False)[mask], d)

    def score(ti: pa.Table, tn: pa.Table) -> pa.Table:
        ids_i, Qi, n2i, di = _side(ti)
        ids_n, Qn, n2n, dn = _side(tn)
        if not len(ids_i) or not len(ids_n):
            return _PAIR_OUT.empty_table()
        if di != dn:
            raise ValueError(
                f"index dim {di} != new-side dim {dn}")
        return _score_cross(ids_i, Qi, n2i, ids_n, Qn, n2n,
                            min_cos2_bp)

    return hash_exchange(
        [idx_rows, new_rows], score, num_partitions=B * C,
        schema=_PAIR_OUT, apply_format="pyarrow",
        in_schemas=[_STORE_SCHEMA, _STORE_SCHEMA],
    )


def recrawl_embeddings(sf_dir: str) -> ray.data.Dataset:
    """The deterministic 'new crawl' vector set the driver query uses:
    every third vector re-captured unchanged (vec_id % 3 == 1, tagged at
    +200000) — each matches its source exactly (quantization loss-free ⇒
    cos2_bp = 10000), and near-identical index vectors surface below it.
    SQL twin restates the same projection."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def pick(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        keep = ids % 3 == 1
        sub = t.filter(pa.array(keep))
        return pa.table({
            "vec_id": pa.array(
                sub["vec_id"].to_numpy(zero_copy_only=False) + 200000),
            "embedding": sub["embedding"],
        })

    return ds.map_batches(pick, batch_format="pyarrow")


def incremental_embedding_dup_pairs_sql(
        min_cos2_bp: int = 9801) -> str:
    """DuckDB twin: quantize BOTH sides with the shared rule (DOUBLE
    floor sequence identical to numpy's), exact HUGEINT dot/norm
    arithmetic, the same cross-multiplied floor predicate — over
    index = embeddings, new = the vec_id % 3 = 1 re-crawl projection."""
    return f"""
WITH sides AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 200000, embedding FROM embeddings WHERE vec_id % 3 = 1),
x AS (
  SELECT vec_id, g.i AS i, CAST(embedding[g.i] AS DOUBLE) AS v
  FROM sides, UNNEST(generate_series(1, len(embedding))) AS g(i)),
mx AS (SELECT vec_id, max(abs(v)) AS m FROM x GROUP BY 1),
q AS (
  SELECT x.vec_id, i,
         CAST(floor(v * 127 / CASE WHEN m = 0 THEN 1 ELSE m END)
              AS BIGINT) AS q
  FROM x JOIN mx USING (vec_id)),
n2 AS (SELECT vec_id, CAST(sum(q*q) AS HUGEINT) AS n2 FROM q GROUP BY 1),
d AS (
  SELECT n.vec_id AS new_id, i.vec_id AS index_id,
         CAST(sum(n.q * i.q) AS HUGEINT) AS dot
  FROM q n JOIN q i ON n.i = i.i
  WHERE n.vec_id >= 200000 AND i.vec_id < 200000
  GROUP BY 1, 2)
SELECT new_id, index_id,
       CAST(dot*dot*10000 // (nn.n2 * ni.n2) AS BIGINT) AS cos2_bp
FROM d JOIN n2 nn ON nn.vec_id = d.new_id
       JOIN n2 ni ON ni.vec_id = d.index_id
WHERE dot > 0 AND dot*dot*10000 >= {int(min_cos2_bp)} * nn.n2 * ni.n2"""


_TOPK_SCHEMA = pa.schema([
    ("new_id", pa.int64()), ("index_id", pa.int64()),
    ("rank", pa.int64()), ("cos2_sgn_bp", pa.int64()),
])


def incremental_embedding_topk(
    new_emb: ray.data.Dataset, index_path, *, k: int = 5,
    id_col: str = "vec_id", emb_col: str = "embedding",
    num_blocks: int = 8, num_new_blocks: int | None = None,
) -> ray.data.Dataset:
    """``(new_id, index_id, rank, cos2_sgn_bp)`` — for every new
    vector, its ``k`` nearest INDEX vectors by quantized cosine, ranked
    with deterministic ties (score desc, index_id asc): the semantic
    RETRIEVAL form of the incremental tier (nearest-dup attribution /
    "what does this new page semantically duplicate"), where
    ``incremental_embedding_dup_pairs`` is the thresholded form.

    Scoring is int64-exact and SIGN-AWARE: ``cos2_sgn_bp =
    sign(dot) · (dot²·10⁴ // (n2_n·n2_i))`` — monotone in the true
    cosine (it equals ``10⁴·cos·|cos|`` floored), so the integer rank
    order IS the cosine rank order, restated verbatim in the SQL twin.
    Zero vectors (no direction) are excluded from both sides.

    Same bipartite grid join as the pairs path; each of the B·C cells
    reduces to ≤ k rows per new vector BEFORE the final per-new_id
    top-k fold, so the all-pairs score matrix never leaves a task."""
    B = num_blocks
    C = num_new_blocks or max(1, num_blocks // 2)

    idx = read_embedding_index(index_path)

    def emit_idx(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        n = len(ids)
        if n == 0:
            return t.append_column("_part", pa.array([], pa.int64()))
        blk = key_partition(ids, B)
        rep = np.repeat(np.arange(n), C)
        peer = np.tile(np.arange(C, dtype=np.int64), n)
        part = blk[rep] * C + peer
        return t.take(pa.array(rep)).append_column(
            "_part", pa.array(part))

    def emit_new(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        n = len(ids)
        if n == 0:
            return t.append_column("_part", pa.array([], pa.int64()))
        blk = key_partition(ids, C)
        rep = np.repeat(np.arange(n), B)
        peer = np.tile(np.arange(B, dtype=np.int64), n)
        part = peer * C + blk[rep]
        return t.take(pa.array(rep)).append_column(
            "_part", pa.array(part))

    new_rows = quantized_rows(new_emb, id_col=id_col, emb_col=emb_col) \
        .map_batches(emit_new, batch_format="pyarrow")
    idx_rows = idx.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("q8"), "q8",
            t["q8"].combine_chunks().cast(pa.large_binary())),
        batch_format="pyarrow",
    ).map_batches(emit_idx, batch_format="pyarrow")

    def _side(t: pa.Table):
        import pyarrow.compute as pc

        lens = pc.binary_length(t["q8"].combine_chunks()) \
            .to_numpy(zero_copy_only=False)
        n2 = t["n2"].to_numpy(zero_copy_only=False)
        dims = set(np.unique(lens)) - {0}
        if len(dims) > 1:
            raise ValueError(
                f"mixed embedding dims in one index: {sorted(dims)}")
        d = dims.pop() if dims else 0
        mask = (lens == d) & (n2 > 0) if d \
            else np.zeros(len(lens), dtype=bool)
        blobs = [b for b, m in zip(t["q8"].to_pylist(), mask) if m]
        return (t["vec_id"].to_numpy(zero_copy_only=False)[mask],
                _blobs_to_matrix(blobs, d) if d and blobs
                else np.zeros((0, max(d, 1)), np.int64),
                n2[mask], d)

    def cell_topk(ti: pa.Table, tn: pa.Table) -> pa.Table:
        ids_i, Qi, n2i, di = _side(ti)
        ids_n, Qn, n2n, dn = _side(tn)
        if not len(ids_i) or not len(ids_n):
            return pa.schema([("new_id", pa.int64()),
                              ("index_id", pa.int64()),
                              ("cos2_sgn_bp", pa.int64())]).empty_table()
        if di != dn:
            raise ValueError(f"index dim {di} != new-side dim {dn}")
        Fi = Qi.astype(np.float64).T
        out_n, out_i, out_s = [], [], []
        chunk = 4096
        kk = min(k, len(ids_i))
        for s in range(0, len(ids_n), chunk):
            e = min(s + chunk, len(ids_n))
            dot = (Qn[s:e].astype(np.float64) @ Fi).astype(np.int64)
            den = n2n[s:e, None] * n2i[None, :]
            mag = (dot * dot * 10000) // den
            sgn = np.where(dot < 0, -mag, mag)
            # per-row local top-k with (score desc, index_id asc) ties:
            # lexsort on (-score, id) prefix
            order = np.lexsort((np.broadcast_to(ids_i, sgn.shape),
                                -sgn), axis=1)[:, :kk]
            rows = np.repeat(np.arange(e - s), kk)
            cols = order.reshape(-1)
            out_n.append(ids_n[s + rows])
            out_i.append(ids_i[cols])
            out_s.append(sgn[rows, cols])
        return pa.table({
            "new_id": np.concatenate(out_n),
            "index_id": np.concatenate(out_i),
            "cos2_sgn_bp": np.concatenate(out_s),
        })

    partial = hash_exchange(
        [idx_rows, new_rows], cell_topk, num_partitions=B * C,
        schema=pa.schema([("new_id", pa.int64()),
                          ("index_id", pa.int64()),
                          ("cos2_sgn_bp", pa.int64())]),
        apply_format="pyarrow",
        in_schemas=[_STORE_SCHEMA, _STORE_SCHEMA],
    )

    import pandas as pd

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos2_sgn_bp", "index_id"],
                          ascending=[False, True],
                          kind="stable").head(k)
        return pd.DataFrame({
            "new_id": g["new_id"].to_numpy(),
            "index_id": g["index_id"].to_numpy(),
            "rank": np.arange(1, len(g) + 1, dtype=np.int64),
            "cos2_sgn_bp": g["cos2_sgn_bp"].to_numpy(),
        })

    return partial.groupby("new_id").map_groups(
        final, batch_format="pandas")


def incremental_embedding_topk_sql(k: int = 5) -> str:
    """DuckDB twin of ``incremental_embedding_topk`` over the shared
    re-crawl projection: quantize both sides, signed HUGEINT square
    score, ``row_number`` with the identical tie order."""
    return f"""
WITH sides AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 200000, embedding FROM embeddings WHERE vec_id % 3 = 1),
x AS (
  SELECT vec_id, g.i AS i, CAST(embedding[g.i] AS DOUBLE) AS v
  FROM sides, UNNEST(generate_series(1, len(embedding))) AS g(i)),
mx AS (SELECT vec_id, max(abs(v)) AS m FROM x GROUP BY 1),
q AS (
  SELECT x.vec_id, i,
         CAST(floor(v * 127 / CASE WHEN m = 0 THEN 1 ELSE m END)
              AS BIGINT) AS q
  FROM x JOIN mx USING (vec_id)),
n2 AS (SELECT vec_id, CAST(sum(q*q) AS HUGEINT) AS n2 FROM q GROUP BY 1),
d AS (
  SELECT n.vec_id AS new_id, i.vec_id AS index_id,
         CAST(sum(n.q * i.q) AS HUGEINT) AS dot
  FROM q n JOIN q i ON n.i = i.i
  WHERE n.vec_id >= 200000 AND i.vec_id < 200000
  GROUP BY 1, 2),
s AS (
  SELECT new_id, index_id,
         CASE WHEN dot >= 0
              THEN CAST(dot*dot*10000 // (nn.n2 * ni.n2) AS BIGINT)
              ELSE -CAST(dot*dot*10000 // (nn.n2 * ni.n2) AS BIGINT)
         END AS cos2_sgn_bp
  FROM d JOIN n2 nn ON nn.vec_id = d.new_id
         JOIN n2 ni ON ni.vec_id = d.index_id
  WHERE nn.n2 > 0 AND ni.n2 > 0)
SELECT new_id, index_id, CAST(rank AS BIGINT) AS rank, cos2_sgn_bp
FROM (SELECT *, row_number() OVER (
        PARTITION BY new_id
        ORDER BY cos2_sgn_bp DESC, index_id) AS rank FROM s)
WHERE rank <= {int(k)}"""


def cross_embedding_dup_pairs_float(
    new_emb: ray.data.Dataset, idx_emb: ray.data.Dataset, *,
    threshold: float = 0.99, id_col: str = "vec_id",
    emb_col: str = "embedding", num_blocks: int = 8,
    num_new_blocks: int | None = None,
) -> ray.data.Dataset:
    """``(new_id, index_id, cos_bp)`` — EXACT float-cosine cross pairs
    between two raw embedding sets through the same bipartite grid
    join: the truth side the int8 tier is graded against (the store
    never holds floats, so truth must come from the raw vectors)."""
    from data_dedup_ray.pipelines.search import _matrix, _normalize

    B = num_blocks
    C = num_new_blocks or max(1, num_blocks // 2)
    emb_schema = pa.schema([("vec_id", pa.int64()),
                            ("embedding", pa.list_(pa.float32()))])

    def emit(side: str):
        reps, tiles = (C, B) if side == "idx" else (B, C)

        def fn(t: pa.Table) -> pa.Table:
            ids = t[id_col].to_numpy(zero_copy_only=False)
            n = len(ids)
            if n == 0:
                return t.append_column("_part",
                                       pa.array([], pa.int64()))
            blk = key_partition(ids, B if side == "idx" else C)
            rep = np.repeat(np.arange(n), reps)
            peer = np.tile(np.arange(reps, dtype=np.int64), n)
            part = (blk[rep] * C + peer if side == "idx"
                    else peer * C + blk[rep])
            return t.take(pa.array(rep)).append_column(
                "_part", pa.array(part))
        return fn

    idx_rows = idx_emb.select_columns([id_col, emb_col]) \
        .map_batches(emit("idx"), batch_format="pyarrow")
    new_rows = new_emb.select_columns([id_col, emb_col]) \
        .map_batches(emit("new"), batch_format="pyarrow")

    out_schema = pa.schema([("new_id", pa.int64()),
                            ("index_id", pa.int64()),
                            ("cos_bp", pa.int64())])

    def score(ti: pa.Table, tn: pa.Table) -> pa.Table:
        if ti.num_rows == 0 or tn.num_rows == 0:
            return out_schema.empty_table()
        ids_i = ti[id_col].to_numpy(zero_copy_only=False)
        ids_n = tn[id_col].to_numpy(zero_copy_only=False)
        Xi = _normalize(_matrix(ti, emb_col))
        Xn = _normalize(_matrix(tn, emb_col))
        out_n, out_i, out_c = [], [], []
        for s in range(0, len(ids_n), 4096):
            e = min(s + 4096, len(ids_n))
            sims = Xn[s:e] @ Xi.T
            jj, ii = np.nonzero(sims >= threshold)
            out_n.append(ids_n[s + jj])
            out_i.append(ids_i[ii])
            out_c.append(np.floor(sims[jj, ii] * 10000 + 0.5)
                         .astype(np.int64))
        return pa.table({
            "new_id": np.concatenate(out_n),
            "index_id": np.concatenate(out_i),
            "cos_bp": np.concatenate(out_c),
        })

    return hash_exchange(
        [idx_rows, new_rows], score, num_partitions=B * C,
        schema=out_schema, apply_format="pyarrow",
        in_schemas=[emb_schema, emb_schema],
    )


def semantic_estimator_eval(sf_dir: str, *,
                            min_cos2_bp: int = 9801,
                            threshold: float = 0.99) -> ray.data.Dataset:
    """Can semantic dedup run from the 1 B/dim stored tier alone?  One
    ``(tier, n_pred, n_true, n_hit, precision_bp, recall_bp, f1_bp)``
    row grading the int8 index's incremental pairs against the EXACT
    float-cosine cross truth over the same vectors — the semantic
    rung's entry in the estimator-quality ladder beside
    ``sig_estimator_eval`` (1 KB signatures) and ``dedup_tier_eval``
    (cheap text tiers).  Quantization is loss-free on exact
    re-captures, so recall on true duplicates is pinned at 10000 by
    the planted re-crawl."""
    import ray.data as rd

    from data_dedup_ray.pipelines.evaluation import estimator_pair_eval
    from data_dedup_ray.util import scratch_dir

    idx_path = scratch_dir("semeval_idx", sf_dir)
    raw = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    build_embedding_index(raw, idx_path)
    pred = incremental_embedding_dup_pairs(
        recrawl_embeddings(sf_dir), idx_path, min_cos2_bp=min_cos2_bp)
    truth = cross_embedding_dup_pairs_float(
        recrawl_embeddings(sf_dir), raw, threshold=threshold)
    return estimator_pair_eval(pred, truth, tier="int8_semantic",
                               pair_cols=("new_id", "index_id"))


def semantic_estimator_eval_sql(min_cos2_bp: int = 9801,
                                threshold: float = 0.99) -> str:
    """SQL twin: the int8 pair oracle vs the float-cosine cross truth,
    both over the shared re-crawl projection, folded to the standard
    integer metric row (``sig_estimator_eval_sql`` shape)."""
    pred = incremental_embedding_dup_pairs_sql(min_cos2_bp)
    cos = ("list_cosine_similarity(CAST(n.embedding AS DOUBLE[]),"
           " CAST(i.embedding AS DOUBLE[]))")
    return f"""
WITH pred AS MATERIALIZED (
  SELECT new_id, index_id FROM ({pred}) p),
tru AS MATERIALIZED (
  SELECT n.vec_id + 200000 AS new_id, i.vec_id AS index_id
  FROM (SELECT vec_id, embedding FROM embeddings
        WHERE vec_id % 3 = 1) n, embeddings i
  WHERE {cos} >= {threshold}),
m AS (SELECT
  (SELECT count(*) FROM pred) AS n_pred,
  (SELECT count(*) FROM tru) AS n_true,
  (SELECT count(*) FROM pred p JOIN tru t
     ON p.new_id = t.new_id AND p.index_id = t.index_id) AS n_hit)
SELECT 'int8_semantic' AS tier,
       CAST(n_pred AS BIGINT) AS n_pred,
       CAST(n_true AS BIGINT) AS n_true, CAST(n_hit AS BIGINT) AS n_hit,
       CAST(10000 * n_hit // greatest(n_pred, 1) AS BIGINT) AS precision_bp,
       CAST(10000 * n_hit // greatest(n_true, 1) AS BIGINT) AS recall_bp,
       CAST(20000 * n_hit // greatest(n_pred + n_true, 1) AS BIGINT) AS f1_bp
FROM m"""


def int8_dup_clusters(
    emb: ray.data.Dataset, *, min_cos2_bp: int = 9801,
    num_blocks: int = 8, dsu_max_edges: int = 20_000_000,
) -> ray.data.Dataset:
    """``(vec_id, cluster_id)`` — connected components of the
    int8-quantized cos² ≥ bar pair graph over one embedding set,
    labeled by min vec_id (singletons self-labeled): the flat
    assignment whose INCREMENTAL fold is
    ``incremental_embedding_dup_clusters``.  Same count()-gated
    DSU / label-propagation ladder as ``search.embedding_dup_clusters``
    (padded string ids on the distributed path)."""
    import pyarrow.compute as pc
    import ray

    from data_dedup_ray.pipelines.search import embedding_dup_pairs_int8

    edges = embedding_dup_pairs_int8(
        emb, min_cos2_bp=min_cos2_bp, num_blocks=num_blocks,
    ).materialize()
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
        return label_propagation(nodes, sedges).map_batches(
            lambda t: pa.table({
                "vec_id": pc.cast(t["url"].combine_chunks(), pa.int64()),
                "cluster_id": pc.cast(
                    t["cluster_id"].combine_chunks(), pa.int64()),
            }),
            batch_format="pyarrow",
        )

    from data_dedup_ray.pipelines.components import dsu_components

    assignment = dsu_components(edges.to_pandas(), a="vec_id_a",
                                b="vec_id_b")
    ref = ray.put({int(k): int(v) for k, v in assignment.items()})

    def attach(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        vals = np.fromiter((m.get(int(i), int(i)) for i in ids),
                           np.int64, len(ids))
        return pa.table({
            "vec_id": pa.array(ids.astype(np.int64)),
            "cluster_id": pa.array(vals),
        })

    return emb.select_columns(["vec_id"]).map_batches(
        attach, batch_format="pyarrow")


def incremental_embedding_dup_clusters(
    new_emb: ray.data.Dataset, index_path,
    old_labels: ray.data.Dataset, *, min_cos2_bp: int = 9801,
    num_blocks: int = 8, num_new_blocks: int | None = None,
    dsu_max_edges: int = 20_000_000, num_partitions: int = 32,
) -> ray.data.Dataset:
    """``(side, vec_id, cluster_id)`` for every vector of index ∪ new —
    the SEMANTIC rung of the incremental cluster fold
    (``incremental.incremental_near_dup_clusters``' shape): the new
    crawl's vectors join the standing assignment through the stored
    int8 tier; index floats are never touched, index-index pairs are
    never recomputed (``old_labels`` already encodes them).

    ``old_labels`` is the index's flat int8 assignment (min-member
    labels, ``int8_dup_clusters``); index and new ``vec_id`` spaces
    MUST be disjoint (the re-crawl projection's +200000 convention) —
    supernodes then stay plain int64s.  Equal to flat clustering of
    the union by supernode induction: each old label is ≤ every member
    it stands for, so min-of-mins is the union minimum."""
    import ray

    from data_dedup_ray.pipelines.search import embedding_dup_pairs_int8

    P = num_partitions

    # cross edges, index endpoint rewritten to its old label
    cross = incremental_embedding_dup_pairs(
        new_emb, index_path, min_cos2_bp=min_cos2_bp,
        num_blocks=num_blocks, num_new_blocks=num_new_blocks)

    def part_on(col: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column("_part", pa.array(key_partition(
                t[col].to_numpy(zero_copy_only=False), P)))
        return fn

    lab = old_labels.map_batches(part_on("vec_id"),
                                 batch_format="pyarrow")

    def rewrite(cp, lg):
        import pandas as pd
        if not len(cp) or not len(lg):
            return pd.DataFrame({
                "vec_id_a": pd.Series(dtype=np.int64),
                "vec_id_b": pd.Series(dtype=np.int64)})
        m = cp.merge(lg.rename(columns={"vec_id": "index_id",
                                        "cluster_id": "lab"}),
                     on="index_id", how="inner")
        return pd.DataFrame({"vec_id_a": m["new_id"].to_numpy(),
                             "vec_id_b": m["lab"].to_numpy()})

    lab_schema = pa.schema([("vec_id", pa.int64()),
                            ("cluster_id", pa.int64())])
    sup_cross = hash_exchange(
        [cross.map_batches(part_on("index_id"),
                           batch_format="pyarrow"), lab],
        rewrite, num_partitions=P,
        schema=pa.schema([("vec_id_a", pa.int64()),
                          ("vec_id_b", pa.int64())]),
        in_schemas=[_PAIR_OUT, lab_schema],
    )

    newnew = embedding_dup_pairs_int8(
        new_emb, min_cos2_bp=min_cos2_bp, num_blocks=num_blocks,
    ).map_batches(lambda t: t.select(["vec_id_a", "vec_id_b"]),
                  batch_format="pyarrow")

    edges = sup_cross.union(newnew).materialize()

    if edges.count() > dsu_max_edges:
        raise NotImplementedError(
            "distributed fold past dsu_max_edges: hand the supernode "
            "edge list to components.label_propagation with padded ids "
            "(int8_dup_clusters shows the exact shape); the driver "
            "corpora stay far under the guard")

    from data_dedup_ray.pipelines.components import dsu_components

    assignment = dsu_components(edges.to_pandas(), a="vec_id_a",
                                b="vec_id_b")
    ref = ray.put({int(k): int(v) for k, v in assignment.items()})

    def new_out(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        vals = np.fromiter((m.get(int(i), int(i)) for i in ids),
                           np.int64, len(ids))
        return pa.table({
            "side": pa.array(["new"] * len(ids), pa.string()),
            "vec_id": pa.array(ids.astype(np.int64)),
            "cluster_id": pa.array(vals),
        })

    def index_out(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        labs = t["cluster_id"].to_numpy(zero_copy_only=False)
        vals = np.fromiter((m.get(int(v), int(v)) for v in labs),
                           np.int64, len(labs))
        return pa.table({
            "side": pa.array(["index"] * t.num_rows, pa.string()),
            "vec_id": t["vec_id"].combine_chunks().cast(pa.int64()),
            "cluster_id": pa.array(vals),
        })

    new_ids = quantized_rows(new_emb).map_batches(
        lambda t: t.select(["vec_id"]), batch_format="pyarrow")
    return old_labels.map_batches(index_out, batch_format="pyarrow") \
        .union(new_ids.map_batches(new_out, batch_format="pyarrow"))


def incremental_semantic_clusters_web(sf_dir: str) -> ray.data.Dataset:
    """Driver query: the re-crawl's vectors folded into the flat int8
    assignment of the base embeddings through the stored tier."""
    import ray.data as rd

    from data_dedup_ray.util import scratch_dir

    raw = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    idx_path = scratch_dir("semclu_idx", sf_dir)
    build_embedding_index(raw, idx_path)
    old = int8_dup_clusters(raw)
    return incremental_embedding_dup_clusters(
        recrawl_embeddings(sf_dir), idx_path, old)


def incremental_semantic_clusters_sql(min_cos2_bp: int = 9801) -> str:
    """DuckDB twin: by supernode induction the fold equals FLAT
    clustering of the union, so the oracle is the recursive closure
    over the int8 pair graph of the union side set (index ∪ re-crawl
    projection), min-member labels, singletons self-labeled."""
    return f"""
WITH RECURSIVE sides AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 200000, embedding FROM embeddings WHERE vec_id % 3 = 1),
x AS (
  SELECT vec_id, g.i AS i, CAST(embedding[g.i] AS DOUBLE) AS v
  FROM sides, UNNEST(generate_series(1, len(embedding))) AS g(i)),
mx AS (SELECT vec_id, max(abs(v)) AS m FROM x GROUP BY 1),
q AS (
  SELECT x.vec_id, i,
         CAST(floor(v * 127 / CASE WHEN m = 0 THEN 1 ELSE m END)
              AS BIGINT) AS q
  FROM x JOIN mx USING (vec_id)),
n2 AS (SELECT vec_id, CAST(sum(q*q) AS HUGEINT) AS n2 FROM q GROUP BY 1),
d AS (
  SELECT a.vec_id AS va, b.vec_id AS vb,
         CAST(sum(a.q * b.q) AS HUGEINT) AS dot
  FROM q a JOIN q b ON a.i = b.i AND a.vec_id < b.vec_id
  GROUP BY 1, 2),
dup AS (
  SELECT va, vb FROM d JOIN n2 na ON na.vec_id = d.va
                       JOIN n2 nb ON nb.vec_id = d.vb
  WHERE dot > 0 AND dot*dot*10000 >= {int(min_cos2_bp)} * na.n2 * nb.n2),
edges AS (SELECT va AS a, vb AS b FROM dup
          UNION SELECT vb, va FROM dup),
reach(a, b) AS (SELECT a, b FROM edges
                UNION SELECT r.a, e.b FROM reach r JOIN edges e
                      ON r.b = e.a),
comp AS (SELECT a AS vec_id, least(a, min(b)) AS cluster_id
         FROM reach GROUP BY a)
SELECT CASE WHEN s.vec_id >= 200000 THEN 'new' ELSE 'index' END AS side,
       s.vec_id, coalesce(c.cluster_id, s.vec_id) AS cluster_id
FROM sides s LEFT JOIN comp c ON c.vec_id = s.vec_id"""
