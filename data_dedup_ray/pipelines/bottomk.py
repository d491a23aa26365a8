"""Bottom-k minwise sketches — the single-hash member of the sketch
ladder (k-perm MinHash · OPH · b-bit · HLL · CMS · bottom-k).

Bottom-k (Cohen, "Size-Estimation Framework", 1997; Cohen & Kaplan,
"Summarizing data using bottom-k sketches", PODC 2007) keeps the k
SMALLEST distinct shingle hashes of each document under ONE hash
function — no permutation family, no per-perm state.  What it buys over
k-perm MinHash at 100 TB:

- **exactly mergeable**: B_k(A ∪ B) = k smallest of B_k(A) ∪ B_k(B) —
  sketches of crawl slices union losslessly (the law HLL/CMS already
  satisfy; k-perm sketches only merge per-permutation), so per-shard
  sketches roll up to corpus sketches without re-reading text.
- **subset queries are exact**: x ∈ B_k(A∪B) ∧ x ∈ A ⟹ x ∈ B_k(A), so
  the Jaccard estimator needs only the two sketches:
  ``est = |{x ∈ U : x in both sketches}| / |U|`` with
  ``U = B_k(A∪B)`` = k smallest of the sketch union, denominator
  ``min(k, |A∪B|)`` — integer-exact given the hashes, hence fully
  SQL-restatable under the sha token hash (the same msh chain as the
  signature-store oracles, sigstore.sig_chain_ctes).
- **candidates for free**: two documents share a bottom-k value with
  probability ≈ J·k/|A∪B|-ish per slot; grouping the exploded
  ``(hash, url)`` rows (k per doc — 8k bytes) by value is the
  single-row-band LSH analogue, with the same coarse sortless exchange
  and the same group-cap skew guard as every band pipeline here.

Pipeline shape: one corpus pass → (url, blob) sketches (k·8 B/doc,
materialized — the store tier) → exploded value rows → candidate pairs
in-partition → two skinny blob-attach exchanges → vectorized estimator
(one lexsort + bincounts across the PAIR axis, no per-pair Python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from data_dedup_ray.corpus import web_pages
from data_dedup_ray.engine.exchange import bucketize, hash_exchange
from data_dedup_ray.stages.minhash import sha256_token_hash, shingle_sets

_PAIR_OUT = pa.schema([("url_a", pa.string()), ("url_b", pa.string()),
                       ("est_bp", pa.int64())])


def _resolve_token_hash(token_hash):
    if token_hash == "sha":
        return sha256_token_hash
    return token_hash


def bottomk_blobs(
    ds: ray.data.Dataset, *, k: int = 32, shingle_k: int = 5,
    token_hash=None, id_col: str = "url", text_col: str = "text",
) -> ray.data.Dataset:
    """``(url, bk)`` — each doc's k smallest distinct shingle hashes as
    a little-endian uint64 blob (ascending; ``np.unique`` output is
    already sorted, so bottom-k is the segment's first k values).  Docs
    with no shingles keep an empty blob (id-universe convention of
    near.shingle_rows)."""
    th = _resolve_token_hash(token_hash)

    def fn(t: pa.Table) -> pa.Table:
        cat, sizes = shingle_sets(t[text_col], shingle_k, token_hash=th)
        starts = np.zeros(len(sizes) + 1, np.int64)
        np.cumsum(sizes, out=starts[1:])
        take = np.minimum(sizes, k)
        blobs = [cat[starts[i]: starts[i] + take[i]].tobytes()
                 for i in range(len(sizes))]
        return pa.table({
            id_col: t[id_col].combine_chunks(),
            "bk": pa.array(blobs, pa.large_binary()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow")


def _estimate(pid: np.ndarray, vals: np.ndarray, k: int,
              n_pairs: int) -> tuple[np.ndarray, np.ndarray]:
    """(numerator, denominator) per pair of the bottom-k union
    estimator, vectorized across all pairs: sort (pair, value), detect
    in-both values by adjacency, rank distinct values per pair, count
    within rank < k."""
    order = np.lexsort((vals, pid))
    pid, vals = pid[order], vals[order]
    same = np.zeros(len(pid), dtype=bool)
    if len(pid) > 1:
        same[1:] = (pid[1:] == pid[:-1]) & (vals[1:] == vals[:-1])
    first = ~same                       # first occurrence of each value
    pid_u = pid[first]
    in_both = np.zeros(len(pid_u), dtype=bool)
    nxt = np.nonzero(first)[0] + 1      # the element after each first
    valid = nxt < len(pid)
    in_both[valid] = same[nxt[valid]]
    # rank of each distinct value within its pair
    _, starts, counts = np.unique(pid_u, return_index=True,
                                  return_counts=True)
    rank = np.arange(len(pid_u)) - np.repeat(starts, counts)
    in_u = rank < k
    num = np.bincount(pid_u[in_u & in_both], minlength=n_pairs)
    den = np.bincount(pid_u[in_u], minlength=n_pairs)
    return num.astype(np.int64), den.astype(np.int64)


def _estimate_sides(pid: np.ndarray, vals: np.ndarray, side: np.ndarray,
                    k: int, n_pairs: int):
    """Side-aware union estimator: per pair ``(num_both, den_u, in_a,
    in_b)`` over U = bottom-k of the sketch union — the numerators/
    denominators of both the Jaccard form (num/den_u) and the two
    DIRECTIONAL containment forms (num/in_a, num/in_b; the bottom-k
    subset estimator Ĉ(A→B) = |U∩A∩B| / |U∩A|)."""
    order = np.lexsort((side, vals, pid))    # A (side 0) first in ties
    pid, vals, side = pid[order], vals[order], side[order]
    same = np.zeros(len(pid), dtype=bool)
    if len(pid) > 1:
        same[1:] = (pid[1:] == pid[:-1]) & (vals[1:] == vals[:-1])
    first = ~same
    pid_u, side_u = pid[first], side[first]
    in_both = np.zeros(len(pid_u), dtype=bool)
    nxt = np.nonzero(first)[0] + 1
    valid = nxt < len(pid)
    in_both[valid] = same[nxt[valid]]
    in_a = in_both | (side_u == 0)
    in_b = in_both | (side_u == 1)
    _, starts, counts = np.unique(pid_u, return_index=True,
                                  return_counts=True)
    rank = np.arange(len(pid_u)) - np.repeat(starts, counts)
    in_u = rank < k

    def bc(mask):
        return np.bincount(pid_u[mask], minlength=n_pairs) \
            .astype(np.int64)

    return (bc(in_u & in_both), bc(in_u), bc(in_u & in_a),
            bc(in_u & in_b))


def bottomk_pairs(
    ds: ray.data.Dataset, *, k: int = 32, shingle_k: int = 5,
    min_est_bp: int = 5000, token_hash=None, id_col: str = "url",
    text_col: str = "text", num_partitions: int = 16,
    group_cap: int = 100_000,
) -> ray.data.Dataset:
    """``(url_a, url_b, est_bp)`` — candidate pairs sharing ≥ 1 bottom-k
    value whose union-estimator Jaccard ≥ ``min_est_bp`` basis points.
    Integer-exact given the hashes; ``token_hash="sha"`` makes it
    bit-reproducible in DuckDB."""
    P = num_partitions
    blobs = bottomk_blobs(ds, k=k, shingle_k=shingle_k,
                          token_hash=token_hash, id_col=id_col,
                          text_col=text_col).materialize()
    cand = _candidate_pairs(blobs, id_col=id_col, num_partitions=P,
                            group_cap=group_cap)
    return _pairs_with_estimates(cand, blobs, k=k, min_est_bp=min_est_bp,
                                 id_col=id_col, num_partitions=P)


def _candidate_pairs(blobs: ray.data.Dataset, *, id_col: str = "url",
                     num_partitions: int = 16,
                     group_cap: int = 100_000) -> ray.data.Dataset:
    """Distinct unordered pairs sharing ≥ 1 bottom-k value."""
    from data_dedup_ray.pipelines.near import (_blob_views,
                                               _distinct_pairs,
                                               _pairs_in_partition)
    P = num_partitions

    def explode(t: pa.Table) -> pa.Table:
        data, offs = _blob_views(t["bk"])
        lens = np.diff(offs)
        urls = t[id_col].to_numpy(zero_copy_only=False)
        return pa.table({
            "h": pa.array(data, pa.uint64()),
            "url": pa.array(np.repeat(urls, lens), pa.string()),
            "_part": pa.array((data % np.uint64(P)).astype(np.int64)),
        })

    def cand_fn(g: pd.DataFrame) -> pd.DataFrame:
        # exact contract: every pair sharing a bottom-k value must
        # surface, so a hot value fails loudly instead of star-degrading
        return _pairs_in_partition(g, key_cols=["h"], id_col="url",
                                   group_cap=group_cap, on_cap="error")

    cand = hash_exchange(
        [blobs.map_batches(explode, batch_format="pyarrow")],
        cand_fn, num_partitions=P,
        schema=pa.schema([("url_a", pa.string()), ("url_b", pa.string())]),
        in_schemas=[pa.schema([("h", pa.uint64()), ("url", pa.string())])],
    )
    return _distinct_pairs(cand, ["url_a", "url_b"], num_partitions=P)


def _pairs_with_estimates(
    cand: ray.data.Dataset, blobs: ray.data.Dataset, *, k: int,
    min_est_bp: int, id_col: str = "url", num_partitions: int = 16,
    mode: str = "jaccard",
) -> ray.data.Dataset:
    """Attach both sketches to each candidate pair (two skinny keyed
    exchanges over one bucketized blob split) and compute the union
    estimator vectorized; sorted ``(url_a, url_b, est_bp)``
    (``mode="jaccard"``) or ``(url_a, url_b, cont_ab_bp, cont_ba_bp)``
    (``mode="containment"``, kept when EITHER direction ≥ the
    threshold)."""
    from data_dedup_ray.pipelines.near import (_blob_views,
                                               _hash_str_column,
                                               _seg_gather)
    P = num_partitions

    def with_part(col):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t.append_column("_part",
                                       pa.array([], type=pa.int64()))
            h = _hash_str_column(t[col])
            return t.append_column(
                "_part", pa.array((h % np.uint64(P)).astype(np.int64)))
        return fn

    blob_schema = pa.schema([(id_col, pa.string()),
                             ("bk", pa.large_binary())])
    blobs_p = blobs.map_batches(with_part(id_col), batch_format="pyarrow")
    blob_buckets = bucketize(blobs_p, num_partitions=P,
                             in_schema=blob_schema)

    def join_a(pt: pa.Table, bt: pa.Table) -> pa.Table:
        m = pt.join(bt, keys=["url_a"], right_keys=[id_col],
                    join_type="inner")
        return m.select(["url_a", "url_b", "bk"]).rename_columns(
            ["url_a", "url_b", "bk_a"])

    step_a = hash_exchange(
        [cand.map_batches(with_part("url_a"), batch_format="pyarrow"),
         blob_buckets],
        join_a, num_partitions=P,
        schema=pa.schema([("url_a", pa.string()), ("url_b", pa.string()),
                          ("bk_a", pa.large_binary())]),
        in_schemas=[pa.schema([("url_a", pa.string()),
                               ("url_b", pa.string())]), blob_schema],
        apply_format="pyarrow",
    )

    containment = mode == "containment"
    if containment:
        out_schema = pa.schema([
            ("url_a", pa.string()), ("url_b", pa.string()),
            ("cont_ab_bp", pa.int64()), ("cont_ba_bp", pa.int64())])
    else:
        out_schema = _PAIR_OUT

    def join_b(pt: pa.Table, bt: pa.Table) -> pa.Table:
        if pt.num_rows == 0 or bt.num_rows == 0:
            return out_schema.empty_table()
        idx = pd.Index(bt[id_col].to_pandas()).get_indexer(
            pd.Series(pt["url_b"].to_pandas()))
        found = idx >= 0
        if not found.all():
            pt = pt.filter(pa.array(found))
            idx = idx[found]
        da, oa = _blob_views(pt["bk_a"])
        db, ob = _blob_views(bt["bk"])
        n = pt.num_rows
        la = np.diff(oa)
        sb = ob[idx]
        lb = ob[idx + 1] - sb
        # gather both segments per pair fully vectorized; A-then-B
        # interleaving is irrelevant before the estimator's lexsort
        from data_dedup_ray.pipelines.near import _seg_gather
        pair_a, gidx_a = _seg_gather(oa[:-1], la)
        pair_b, gidx_b = _seg_gather(sb, lb)
        pid = np.concatenate([pair_a, pair_b]).astype(np.int64)
        vals = np.concatenate([da[gidx_a], db[gidx_b]])
        side = np.concatenate([
            np.zeros(len(pair_a), np.int64),
            np.ones(len(pair_b), np.int64)])
        num, den_u, in_a, in_b = _estimate_sides(pid, vals, side, k, n)
        if containment:
            ca = (10000 * num) // np.maximum(in_a, 1)
            cb = (10000 * num) // np.maximum(in_b, 1)
            keep = np.maximum(ca, cb) >= min_est_bp
            return pa.table({
                "url_a": pt["url_a"].combine_chunks()
                .filter(pa.array(keep)),
                "url_b": pt["url_b"].combine_chunks()
                .filter(pa.array(keep)),
                "cont_ab_bp": pa.array(ca[keep], pa.int64()),
                "cont_ba_bp": pa.array(cb[keep], pa.int64()),
            })
        est = (10000 * num) // np.maximum(den_u, 1)
        keep = est >= min_est_bp
        return pa.table({
            "url_a": pt["url_a"].combine_chunks().filter(pa.array(keep)),
            "url_b": pt["url_b"].combine_chunks().filter(pa.array(keep)),
            "est_bp": pa.array(est[keep], pa.int64()),
        })

    return hash_exchange(
        [step_a.map_batches(with_part("url_b"), batch_format="pyarrow"),
         blob_buckets],
        join_b, num_partitions=P,
        schema=out_schema,
        in_schemas=[pa.schema([("url_a", pa.string()),
                               ("url_b", pa.string()),
                               ("bk_a", pa.large_binary())]), blob_schema],
        apply_format="pyarrow",
    ).sort(["url_a", "url_b"])


def bottomk_sig_pairs(sf_dir: str, *, k: int = 32, shingle_k: int = 5,
                      min_est_bp: int = 5000,
                      num_partitions: int = 16) -> ray.data.Dataset:
    """sha-token bottom-k pairs over web_pages (the oracle variant)."""
    return bottomk_pairs(web_pages(sf_dir), k=k, shingle_k=shingle_k,
                         min_est_bp=min_est_bp, token_hash="sha",
                         num_partitions=num_partitions)


def bottomk_sig_pairs_sql(*, k: int = 32, shingle_k: int = 5,
                          min_est_bp: int = 5000) -> str:
    """Bit-exact twin: the shared msh shingle chain (sha token hash +
    FNV rolling combine — sigstore.sig_chain_ctes; the unreferenced
    msig/perms CTEs are never evaluated), bottom-k via row_number,
    candidates via shared values, estimator via the distinct-union
    rank."""
    from data_dedup_ray.pipelines.sigstore import sig_chain_ctes
    return f"""
WITH {sig_chain_ctes(shingle_k=shingle_k, single_corpus=True)},
bkk AS (SELECT url, s FROM (
    SELECT id AS url, s,
           row_number() OVER (PARTITION BY id ORDER BY s) AS rn
    FROM msh) WHERE rn <= {k}),
cand AS (SELECT DISTINCT a.url AS ua, b.url AS ub
         FROM bkk a JOIN bkk b ON a.s = b.s AND a.url < b.url),
uv AS (SELECT c.ua, c.ub, x.s, count(*) AS cnt
       FROM cand c JOIN bkk x ON x.url = c.ua OR x.url = c.ub
       GROUP BY 1, 2, 3),
ur AS (SELECT ua, ub, cnt,
              row_number() OVER (PARTITION BY ua, ub ORDER BY s) AS rn
       FROM uv)
SELECT ua AS url_a, ub AS url_b,
       CAST((10000 * count(*) FILTER (WHERE cnt = 2 AND rn <= {k}))
            // (count(*) FILTER (WHERE rn <= {k})) AS BIGINT) AS est_bp
FROM ur GROUP BY 1, 2
HAVING (10000 * count(*) FILTER (WHERE cnt = 2 AND rn <= {k}))
       // (count(*) FILTER (WHERE rn <= {k})) >= {min_est_bp}
ORDER BY url_a, url_b"""


def bottomk_containment_pairs(
    sf_dir: str, *, k: int = 32, shingle_k: int = 5,
    min_cont_bp: int = 8000, num_partitions: int = 16,
) -> ray.data.Dataset:
    """DIRECTIONAL containment estimated from the sketches alone:
    ``(url_a, url_b, cont_ab_bp, cont_ba_bp)`` for candidate pairs
    where either direction's bottom-k subset estimator
    ``Ĉ(A→B) = |U∩A∩B| / |U∩A|`` ≥ ``min_cont_bp`` — the quote/subset
    signal (a short page contained in a long one keeps C high while
    Jaccard collapses), at 256 B/doc instead of the full shingle sets
    near.containment_pairs reads."""
    P = num_partitions
    blobs = bottomk_blobs(web_pages(sf_dir), k=k, shingle_k=shingle_k,
                          token_hash="sha").materialize()
    cand = _candidate_pairs(blobs, num_partitions=P)
    return _pairs_with_estimates(cand, blobs, k=k,
                                 min_est_bp=min_cont_bp,
                                 num_partitions=P, mode="containment")


def bottomk_containment_pairs_sql(*, k: int = 32, shingle_k: int = 5,
                                  min_cont_bp: int = 8000) -> str:
    """Twin: per-side presence flags on the distinct-union ranks."""
    from data_dedup_ray.pipelines.sigstore import sig_chain_ctes
    ca = (f"(10000 * count(*) FILTER (WHERE a_has = 1 AND b_has = 1"
          f" AND rn <= {k})) // greatest(count(*) FILTER"
          f" (WHERE a_has = 1 AND rn <= {k}), 1)")
    cb = (f"(10000 * count(*) FILTER (WHERE a_has = 1 AND b_has = 1"
          f" AND rn <= {k})) // greatest(count(*) FILTER"
          f" (WHERE b_has = 1 AND rn <= {k}), 1)")
    return f"""
WITH {sig_chain_ctes(shingle_k=shingle_k, single_corpus=True)},
bkk AS (SELECT url, s FROM (
    SELECT id AS url, s,
           row_number() OVER (PARTITION BY id ORDER BY s) AS rn
    FROM msh) WHERE rn <= {k}),
cand AS (SELECT DISTINCT a.url AS ua, b.url AS ub
         FROM bkk a JOIN bkk b ON a.s = b.s AND a.url < b.url),
uv AS (SELECT c.ua, c.ub, x.s,
              max(CASE WHEN x.url = c.ua THEN 1 ELSE 0 END) AS a_has,
              max(CASE WHEN x.url = c.ub THEN 1 ELSE 0 END) AS b_has
       FROM cand c JOIN bkk x ON x.url = c.ua OR x.url = c.ub
       GROUP BY 1, 2, 3),
ur AS (SELECT ua, ub, a_has, b_has,
              row_number() OVER (PARTITION BY ua, ub ORDER BY s) AS rn
       FROM uv)
SELECT ua AS url_a, ub AS url_b,
       CAST({ca} AS BIGINT) AS cont_ab_bp,
       CAST({cb} AS BIGINT) AS cont_ba_bp
FROM ur GROUP BY 1, 2
HAVING greatest({ca}, {cb}) >= {min_cont_bp}
ORDER BY url_a, url_b"""


def bottomk_clusters(
    sf_dir: str, *, k: int = 32, shingle_k: int = 5,
    min_est_bp: int = 5000, num_partitions: int = 16,
    dsu_max_edges: int = 20_000_000,
) -> ray.data.Dataset:
    """SKETCH-ONLY cluster view: components over the bottom-k estimated
    pair graph — ``(url, cluster_id)`` with min-member labels for every
    page, computed from 256 B/doc sketches without a single exact-
    verify pass over text (the cluster assignment a pure-sketch store
    can produce on its own); count-gated DSU with the distributed
    label-propagation fallback."""
    from data_dedup_ray.pipelines.components import (attach_clusters,
                                                     dsu_components,
                                                     label_propagation)
    pages = web_pages(sf_dir).select_columns(["url"])
    edges = bottomk_sig_pairs(
        sf_dir, k=k, shingle_k=shingle_k, min_est_bp=min_est_bp,
        num_partitions=num_partitions).materialize()
    if edges.count() > dsu_max_edges:
        return label_propagation(
            pages, edges.select_columns(["url_a", "url_b"]),
            node_col="url")
    assignment = dsu_components(edges.to_pandas())
    return attach_clusters(pages, assignment, id_col="url")


def bottomk_clusters_sql(*, k: int = 32, shingle_k: int = 5,
                         min_est_bp: int = 5000) -> str:
    pairs = bottomk_sig_pairs_sql(k=k, shingle_k=shingle_k,
                                  min_est_bp=min_est_bp)
    from data_dedup_ray.corpus import WEB_PAGES_CTE
    return f"""
WITH RECURSIVE {WEB_PAGES_CTE},
dup AS (SELECT url_a, url_b FROM ({pairs}) p),
edges AS (SELECT url_a AS a, url_b AS b FROM dup
          UNION SELECT url_b, url_a FROM dup),
reach(a, b) AS (SELECT a, b FROM edges
                UNION SELECT r.a, e.b FROM reach r
                JOIN edges e ON r.b = e.a),
comp AS (SELECT a AS url, least(a, min(b)) AS cluster_id
         FROM reach GROUP BY a)
SELECT w.url, coalesce(c.cluster_id, w.url) AS cluster_id
FROM web_pages w LEFT JOIN comp c ON c.url = w.url"""


def _token_hash_name(token_hash) -> str:
    return "sha" if token_hash == "sha" \
        or token_hash is sha256_token_hash else "default"


def build_bottomk_store(
    ds: ray.data.Dataset, path: str, *, k: int = 32, shingle_k: int = 5,
    token_hash=None, id_col: str = "url", text_col: str = "text",
    num_partitions: int = 16,
) -> None:
    """Persist ``(url, bk)`` sketches as the bottom-k rung of the
    fingerprint-store ladder — k·8 B/doc, resumable hash-partitioned
    parquet with config lineage.  Unlike the signature/b-bit rungs this
    rung is EXACTLY mergeable across stores (merge_bottomk_stores)."""
    from data_dedup_ray.state.sink import resumable_write_parquet
    resumable_write_parquet(
        bottomk_blobs(ds, k=k, shingle_k=shingle_k,
                      token_hash=token_hash, id_col=id_col,
                      text_col=text_col),
        path, key_col=id_col, num_partitions=num_partitions,
        config={"kind": "bottomk_store", "k": k, "shingle_k": shingle_k,
                "token_hash": _token_hash_name(token_hash)})


def incremental_bottomk_pairs(
    new_ds: ray.data.Dataset, store_path: str, *, k: int = 32,
    shingle_k: int = 5, min_est_bp: int = 5000, token_hash="sha",
    num_partitions: int = 16, group_cap: int = 100_000,
) -> ray.data.Dataset:
    """``(new_url, index_url, est_bp)`` — each new-crawl page's
    bottom-k similarity against the persisted sketch store; index text
    is never re-read.  Store config is validated against the query's
    parameters (mismatches fail loudly)."""
    from data_dedup_ray.pipelines.fpstore import _read_store
    from data_dedup_ray.pipelines.near import (_distinct_pairs,
                                               _pairs_in_partition)
    from data_dedup_ray.state.sink import validate_store_config
    validate_store_config(store_path, {
        "kind": "bottomk_store", "k": k, "shingle_k": shingle_k,
        "token_hash": _token_hash_name(token_hash)})
    P = num_partitions

    def tag(prefix):
        def fn(t: pa.Table) -> pa.Table:
            u = pc.binary_join_element_wise(
                pa.array([prefix] * t.num_rows, pa.string()),
                t["url"].combine_chunks().cast(pa.string()), "")
            return pa.table({
                "url": u,
                "bk": t["bk"].combine_chunks().cast(pa.large_binary()),
            })
        return fn

    new_blobs = bottomk_blobs(
        new_ds, k=k, shingle_k=shingle_k, token_hash=token_hash
    ).map_batches(tag("n|"), batch_format="pyarrow")
    idx_blobs = _read_store(store_path).map_batches(
        tag("i|"), batch_format="pyarrow")
    blobs = new_blobs.union(idx_blobs).materialize()

    from data_dedup_ray.pipelines.near import _blob_views

    def explode(t: pa.Table) -> pa.Table:
        data, offs = _blob_views(t["bk"])
        lens = np.diff(offs)
        urls = t["url"].to_numpy(zero_copy_only=False)
        return pa.table({
            "h": pa.array(data, pa.uint64()),
            "url": pa.array(np.repeat(urls, lens), pa.string()),
            "_part": pa.array((data % np.uint64(P)).astype(np.int64)),
        })

    def cand_fn(g: pd.DataFrame) -> pd.DataFrame:
        p = _pairs_in_partition(g, key_cols=["h"], id_col="url",
                                group_cap=group_cap, on_cap="error")
        if not len(p):
            return p
        # cross-side only; 'i|' < 'n|' makes url_a the index side
        return p[p["url_a"].str.startswith("i|")
                 & p["url_b"].str.startswith("n|")]

    cand = hash_exchange(
        [blobs.map_batches(explode, batch_format="pyarrow")],
        cand_fn, num_partitions=P,
        schema=pa.schema([("url_a", pa.string()), ("url_b", pa.string())]),
        in_schemas=[pa.schema([("h", pa.uint64()), ("url", pa.string())])],
    )
    cand = _distinct_pairs(cand, ["url_a", "url_b"], num_partitions=P)
    est = _pairs_with_estimates(cand, blobs, k=k, min_est_bp=min_est_bp,
                                num_partitions=P)

    def strip(t: pa.Table) -> pa.Table:
        return pa.table({
            "new_url": pc.utf8_slice_codeunits(
                t["url_b"].combine_chunks(), 2),
            "index_url": pc.utf8_slice_codeunits(
                t["url_a"].combine_chunks(), 2),
            "est_bp": t["est_bp"].combine_chunks(),
        })

    return est.map_batches(strip, batch_format="pyarrow") \
        .sort(["new_url", "index_url"])


def incremental_bottomk_pairs_sql(*, k: int = 32, shingle_k: int = 5,
                                  min_est_bp: int = 5000) -> str:
    """Twin over the tagged web_pages ('i|') × snapshot2 ('n|') union —
    the same msh chain the signature-store oracles use."""
    from data_dedup_ray.pipelines.sigstore import sig_chain_ctes
    return f"""
WITH {sig_chain_ctes(shingle_k=shingle_k, single_corpus=False)},
bkk AS (SELECT url, s FROM (
    SELECT id AS url, s,
           row_number() OVER (PARTITION BY id ORDER BY s) AS rn
    FROM msh) WHERE rn <= {k}),
cand AS (SELECT DISTINCT a.url AS ua, b.url AS ub
         FROM bkk a JOIN bkk b ON a.s = b.s
         WHERE substr(a.url, 1, 2) = 'i|' AND substr(b.url, 1, 2) = 'n|'),
uv AS (SELECT c.ua, c.ub, x.s, count(*) AS cnt
       FROM cand c JOIN bkk x ON x.url = c.ua OR x.url = c.ub
       GROUP BY 1, 2, 3),
ur AS (SELECT ua, ub, cnt,
              row_number() OVER (PARTITION BY ua, ub ORDER BY s) AS rn
       FROM uv)
SELECT substr(ub, 3) AS new_url, substr(ua, 3) AS index_url,
       CAST((10000 * count(*) FILTER (WHERE cnt = 2 AND rn <= {k}))
            // (count(*) FILTER (WHERE rn <= {k})) AS BIGINT) AS est_bp
FROM ur GROUP BY 1, 2
HAVING (10000 * count(*) FILTER (WHERE cnt = 2 AND rn <= {k}))
       // (count(*) FILTER (WHERE rn <= {k})) >= {min_est_bp}
ORDER BY new_url, index_url"""


def merge_bottomk_stores(
    paths: list, out_path: str, *, k: int = 32, shingle_k: int = 5,
    token_hash_name: str = "sha", num_partitions: int = 16,
) -> None:
    """LOSSLESS store merge — the property that distinguishes this rung:
    for a url present in several stores, B_k(∪ sets) = bottom-k of the
    union of the per-store sketches (Cohen & Kaplan), so crawl-slice
    stores roll up to a corpus store without re-reading any text.  One
    url-keyed exchange; every input store's config must match."""
    from data_dedup_ray.pipelines.fpstore import _read_store
    from data_dedup_ray.pipelines.near import (_blob_views,
                                               _hash_str_column)
    from data_dedup_ray.state.sink import (resumable_write_parquet,
                                           validate_store_config)
    validate_store_config(list(paths), {
        "kind": "bottomk_store", "k": k, "shingle_k": shingle_k,
        "token_hash": token_hash_name})
    P = num_partitions

    def with_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_part", pa.array([], type=pa.int64()))
        h = _hash_str_column(t["url"])
        return t.append_column(
            "_part", pa.array((h % np.uint64(P)).astype(np.int64)))

    ins = [_read_store(p).map_batches(with_part, batch_format="pyarrow")
           for p in paths]

    def merge(*dfs: pd.DataFrame) -> pd.DataFrame:
        df = pd.concat(list(dfs), ignore_index=True)
        if not len(df):
            return pd.DataFrame({"url": pd.Series(dtype=object),
                                 "bk": pd.Series(dtype=object)})
        # vectorized per-url fold: explode every blob, one lexsort,
        # adjacency dedup, rank-<k keep — the same rank machinery as
        # the pair estimator; no per-url Python reduction
        raw = df["bk"].to_numpy()
        lens = np.fromiter((len(b) // 8 for b in raw), np.int64,
                           len(raw))
        urls, codes = np.unique(df["url"].to_numpy(), return_inverse=True)
        vals = np.frombuffer(b"".join(raw), dtype=np.uint64)
        owner = np.repeat(codes, lens)
        order = np.lexsort((vals, owner))
        owner, vals = owner[order], vals[order]
        first = np.ones(len(owner), bool)
        if len(owner) > 1:
            first[1:] = (owner[1:] != owner[:-1]) | (vals[1:] != vals[:-1])
        owner, vals = owner[first], vals[first]
        _, starts, counts = np.unique(owner, return_index=True,
                                      return_counts=True)
        rank = np.arange(len(owner)) - np.repeat(starts, counts)
        owner, vals = owner[rank < k], vals[rank < k]
        lo = np.searchsorted(owner, np.arange(len(urls)))
        hi = np.searchsorted(owner, np.arange(len(urls)) + 1)
        return pd.DataFrame({
            "url": urls,
            "bk": [vals[lo[i]:hi[i]].tobytes()
                   for i in range(len(urls))],
        })

    schema = pa.schema([("url", pa.string()), ("bk", pa.large_binary())])
    merged = hash_exchange(
        ins, merge, num_partitions=P, schema=schema,
        in_schemas=[schema] * len(ins))
    resumable_write_parquet(
        merged, out_path, key_col="url", num_partitions=P,
        config={"kind": "bottomk_store", "k": k, "shingle_k": shingle_k,
                "token_hash": token_hash_name})


def bottomk_distinct_estimate(
    sf_dir: str, *, k: int = 1024, shingle_k: int = 5,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """One-row corpus-wide distinct-shingle cardinality estimate from
    the MERGED bottom-k sketch — the classic size-estimation use
    (Cohen '97): n̂ = (k−1)·2⁶⁴ // v_k where v_k is the k-th smallest
    hash of the union.  Deterministic and integer-exact given the
    hashes, so fully SQL-twinned (HUGEINT) — the bottom-k sibling of
    hll_raw_estimate, with a different merge law (k-smallest vs
    register-max).

    Merge is the exact law the tests pin: per-batch bottom-k partials
    (k rows each) → one tiny exchange → bottom-k of the union.  Text
    never shuffles; the driver sees k values."""
    import ray

    pages = web_pages(sf_dir)
    P = num_partitions

    def partial(t: pa.Table) -> pa.Table:
        cat, _ = shingle_sets(t["text"], shingle_k,
                              token_hash=sha256_token_hash)
        u = np.unique(cat)[:k]
        return pa.table({
            "h": pa.array(u, pa.uint64()),
            "_part": pa.array((u % np.uint64(P)).astype(np.int64)),
        })

    def merge_part(df: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(df["h"].to_numpy())[:k]
        return pd.DataFrame({"h": u})

    merged = hash_exchange(
        [pages.select_columns(["text"])
              .map_batches(partial, batch_format="pyarrow")],
        merge_part, num_partitions=P,
        schema=pa.schema([("h", pa.uint64())]),
        in_schemas=[pa.schema([("h", pa.uint64())])],
    ).to_pandas()                     # ≤ P·k rows — sketch-sized
    u = np.unique(merged["h"].to_numpy())[:k]
    n_exact_lt_k = len(u) if len(u) < k else None
    if n_exact_lt_k is not None:
        # fewer than k distinct values: the sketch IS the set — exact
        est = int(n_exact_lt_k)
    else:
        vk = int(u[k - 1])
        est = ((k - 1) * (1 << 64)) // (vk + 1)
    return ray.data.from_arrow(pa.table({
        "k": pa.array([k], pa.int64()),
        "n_distinct_est": pa.array([est], pa.int64()),
    }))


def bottomk_distinct_estimate_sql(*, k: int = 1024,
                                  shingle_k: int = 5) -> str:
    """Exact twin: k-th smallest sha-shingle hash over the corpus-wide
    distinct set, same integer estimator in HUGEINT."""
    from data_dedup_ray.pipelines.sigstore import sig_chain_ctes
    return f"""
WITH {sig_chain_ctes(shingle_k=shingle_k, single_corpus=True)},
ds AS (SELECT DISTINCT s FROM msh),
bk AS (SELECT s, row_number() OVER (ORDER BY s) AS rn FROM ds),
stats AS (SELECT count(*) AS n,
                 max(s) FILTER (WHERE rn = {k}) AS vk FROM bk)
SELECT CAST({k} AS BIGINT) AS k,
       CAST(CASE WHEN n < {k} THEN n
                 ELSE ({k} - 1) * 18446744073709551616::HUGEINT
                      // (vk + 1)
            END AS BIGINT) AS n_distinct_est
FROM stats"""


def host_distinct_shingles(
    sf_dir: str, *, k: int = 256, shingle_k: int = 5,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """``(host, n_pages, n_distinct_est)`` — per-host distinct-shingle
    cardinality from GROUPED bottom-k sketches: the group-by-aggregate
    use of a mergeable sketch (how diverse is a host's content vs its
    page count — template farms score low).  Per-batch per-host partial
    sketches (≤ k values each) merge through one host-keyed exchange;
    estimates are computed IN the partition, so the output is
    host-count-sized and the driver never aggregates.  Below-k hosts
    report their exact distinct count."""
    pages = web_pages(sf_dir)
    P = num_partitions

    def partial(t: pa.Table) -> pa.Table:
        cat, sizes = shingle_sets(t["text"], shingle_k,
                                  token_hash=sha256_token_hash)
        urls = t["url"].to_pandas()
        # fillna("") matches split_part(url, '/', 3) in the SQL twin:
        # DuckDB returns '' for a url with fewer than two slashes, while
        # .str[2] yields NaN, which would poison np.unique/object hashing
        hosts = (urls.str.split("/").str[2]
                 .fillna("").to_numpy(dtype=object))
        owner = np.repeat(np.arange(len(sizes)), sizes)
        hu, hcode = np.unique(hosts, return_inverse=True)
        hown = hcode[owner]
        order = np.lexsort((cat, hown))
        hown, vals = hown[order], cat[order]
        first = np.ones(len(hown), bool)
        if len(hown) > 1:
            first[1:] = (hown[1:] != hown[:-1]) | (vals[1:] != vals[:-1])
        hown, vals = hown[first], vals[first]
        _, starts, counts = np.unique(hown, return_index=True,
                                      return_counts=True)
        rank = np.arange(len(hown)) - np.repeat(starts, counts)
        keep = rank < k
        hown, vals = hown[keep], vals[keep]
        npages = np.bincount(hcode, minlength=len(hu)).astype(np.int64)
        part = pd.util.hash_array(hu) % np.uint64(P)
        # sketch rows + one n_pages sentinel row per host (h = NULL)
        return pa.table({
            "host": pa.array(np.concatenate([hu[hown], hu]), pa.string()),
            "h": pa.array(np.concatenate(
                [vals, np.zeros(len(hu), np.uint64)]), pa.uint64()),
            "is_val": pa.array(np.concatenate(
                [np.ones(len(hown), bool), np.zeros(len(hu), bool)])),
            "n": pa.array(np.concatenate(
                [np.zeros(len(hown), np.int64), npages])),
            "_part": pa.array(np.concatenate(
                [part[hown], part]).astype(np.int64)),
        })

    def reduce_host(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "host": pd.Series(dtype=object),
                "n_pages": pd.Series(dtype=np.int64),
                "n_distinct_est": pd.Series(dtype=np.int64)})
        pages_n = (df[~df["is_val"]].groupby("host")["n"].sum())
        v = df[df["is_val"]]
        out = []
        for host, g in v.groupby("host", sort=False):
            u = np.unique(g["h"].to_numpy().astype(np.uint64))[:k]
            if len(u) < k:
                est = len(u)
            else:
                est = ((k - 1) * (1 << 64)) // (int(u[k - 1]) + 1)
            out.append((host, est))
        est_df = pd.DataFrame(out, columns=["host", "n_distinct_est"]) \
            if out else pd.DataFrame({"host": pd.Series(dtype=object),
                                      "n_distinct_est":
                                          pd.Series(dtype=np.int64)})
        res = pages_n.reset_index().rename(columns={"n": "n_pages"}) \
            .merge(est_df, on="host", how="left")
        res["n_distinct_est"] = res["n_distinct_est"] \
            .fillna(0).astype(np.int64)
        return res[["host", "n_pages", "n_distinct_est"]]

    return hash_exchange(
        [pages.select_columns(["url", "text"])
              .map_batches(partial, batch_format="pyarrow")],
        reduce_host, num_partitions=P,
        schema=pa.schema([("host", pa.string()), ("n_pages", pa.int64()),
                          ("n_distinct_est", pa.int64())]),
        in_schemas=[pa.schema([("host", pa.string()), ("h", pa.uint64()),
                               ("is_val", pa.bool_()),
                               ("n", pa.int64())])],
    ).sort("host")


def host_distinct_shingles_sql(*, k: int = 256,
                               shingle_k: int = 5) -> str:
    """Twin: per-host k-th order statistic over the distinct sha-shingle
    set; hosts below k report the exact count."""
    from data_dedup_ray.pipelines.sigstore import sig_chain_ctes
    return f"""
WITH {sig_chain_ctes(shingle_k=shingle_k, single_corpus=True)},
hp AS (SELECT split_part(url, '/', 3) AS host, count(*) AS n_pages
       FROM web_pages GROUP BY 1),
hs AS (SELECT DISTINCT split_part(id, '/', 3) AS host, s FROM msh),
rk AS (SELECT host, s,
              row_number() OVER (PARTITION BY host ORDER BY s) AS rn
       FROM hs),
st AS (SELECT host, count(*) AS n,
              max(s) FILTER (WHERE rn = {k}) AS vk
       FROM rk GROUP BY host)
SELECT hp.host, hp.n_pages,
       CAST(coalesce(CASE WHEN st.n < {k} THEN st.n
                 ELSE ({k} - 1) * 18446744073709551616::HUGEINT
                      // (st.vk + 1) END, 0) AS BIGINT) AS n_distinct_est
FROM hp LEFT JOIN st ON st.host = hp.host
ORDER BY hp.host"""


def bottomk_estimator_eval_sql(*, k: int = 32, shingle_k: int = 5,
                               threshold: float = 0.7) -> str:
    """SQL twin of the bottom-k tier grade (the b-bit/oph eval shape):
    pred = the bit-exact bottom-k estimator pairs at est ≥ threshold,
    truth = the exact all-pairs Jaccard ≥ threshold set."""
    from data_dedup_ray.oracles import minhash_pairs_sql
    pred = bottomk_sig_pairs_sql(k=k, shingle_k=shingle_k,
                                 min_est_bp=int(threshold * 10000))
    tru = minhash_pairs_sql(threshold)
    return f"""
WITH pred AS MATERIALIZED (
  SELECT url_a, url_b FROM ({pred}) p),
tru AS MATERIALIZED (
  SELECT url_a, url_b FROM ({tru}) t),
m AS (SELECT
  (SELECT count(*) FROM pred) AS n_pred,
  (SELECT count(*) FROM tru) AS n_true,
  (SELECT count(*) FROM pred p JOIN tru t
     ON p.url_a = t.url_a AND p.url_b = t.url_b) AS n_hit)
SELECT 'bottomk{k}' AS tier,
       CAST(n_pred AS BIGINT) AS n_pred,
       CAST(n_true AS BIGINT) AS n_true, CAST(n_hit AS BIGINT) AS n_hit,
       CAST(10000 * n_hit // greatest(n_pred, 1) AS BIGINT) AS precision_bp,
       CAST(10000 * n_hit // greatest(n_true, 1) AS BIGINT) AS recall_bp,
       CAST(20000 * n_hit // greatest(n_pred + n_true, 1) AS BIGINT) AS f1_bp
FROM m"""


def bottomk_estimator_eval(sf_dir: str, *, k: int = 32,
                           shingle_k: int = 5, threshold: float = 0.7,
                           num_partitions: int = 16) -> ray.data.Dataset:
    """Grade the bottom-k tier against exact Jaccard truth (the
    dedup_pair_metrics row every sketch tier in this repo reports):
    can near-dup candidate generation run from k·8 B/doc bottom-k
    sketches alone?"""
    from data_dedup_ray.pipelines import near
    from data_dedup_ray.pipelines.evaluation import dedup_pair_metrics
    pages = web_pages(sf_dir)
    pred = bottomk_pairs(
        pages, k=k, shingle_k=shingle_k,
        min_est_bp=int(threshold * 10000), token_hash="sha",
        num_partitions=num_partitions,
    ).select_columns(["url_a", "url_b"])
    truth = near.ngram_jaccard_pairs(
        pages, shingle_k=shingle_k, threshold=threshold,
        num_partitions=num_partitions,
    ).select_columns(["url_a", "url_b"])
    return dedup_pair_metrics(pred, truth, tier=f"bottomk{k}",
                              num_partitions=num_partitions)
