"""Edit-distance (Levenshtein ≤ k) near-duplicate url pairs/clusters via
FastSS deletion-neighborhood blocking.

The reference groups files whose digest CHAIN collides and verifies the
survivors with an exact full-content hash (/root/reference/lib/Data/Dedup/
Engine.pm:160-208's block/key cascade); this module is the same
block-then-verify shape for a metric the digest chain cannot express:
*character edit distance* over short identifier strings (urls, titles,
paths).  Web corpora are full of url families that differ by one
character — trailing-digit page counters, http/https, index.htm[l] — and
edit-distance grouping is the standard record-linkage primitive for
collapsing them.

Blocking — FastSS (Bocek, Hunt, Stiller, "Fast Similarity Search in
Large Dictionaries", 2007): two strings with ed(u, v) ≤ k share at least
one variant obtainable by ≤ k character deletions from each (align the
edit script; substitutions delete both sides, insertions delete one).
Candidate pairs = pairs sharing a deletion-variant, an exact-recall
superset of the ed ≤ k pairs; an exact banded-DP verify then filters.

100 TB shape:

- variant HASHES, not variant strings, are the shuffle key: a rolling
  polynomial hash over 2⁶⁴ lets every ≤ k-deletion variant be derived
  from ONE prefix-sum pass in closed form (O(L) vector ops per batch for
  k=1, O(L²) masked matrix for k=2) — no per-variant string
  materialization, no per-row Python.  Hash collisions only ever ADD
  candidates (removed by the verify), never lose a pair.
- one sortless ``hash_exchange`` on the variant hash; pair emission and
  the banded Levenshtein verify run INSIDE the partition, so candidate
  pairs that fail the distance predicate never travel a second time.
- group sizes are structurally bounded: the strings sharing one variant
  v are v with ≤ k characters re-inserted — ≤ (|v|+1)·|Σ| for k=1 —
  so per-group pair emission cannot go quadratic in the corpus (the
  unbounded-group risk of naive prefix blocking).  Input urls are
  distinct by construction (corpus.py derivation).
- the verify is a band-limited Myers/Ukkonen DP vectorized ACROSS the
  pair axis: 2k+1 diagonals × max-length rounds of numpy ops, O(k·L)
  per pair, no Python loop over pairs.

Clusters reuse the repo's count-gated DSU / distributed label-propagation
split (pipelines/components.py), identical to minhash_dedup_clusters
(near.py:977).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from data_dedup_ray.corpus import web_pages
from data_dedup_ray.engine.exchange import hash_exchange

#: FNV-1a 64-bit prime — odd, hence invertible modulo 2⁶⁴, which is what
#: lets a deletion variant's hash be recovered from prefix sums computed
#: at a FIXED padded width (the Binv^(pad) factor renormalizes).
_B = np.uint64(0x100000001B3)
_BINV = np.uint64(pow(0x100000001B3, -1, 1 << 64))

_PAIR_SCHEMA = pa.schema([
    ("url_a", pa.string()), ("url_b", pa.string()), ("dist", pa.int64()),
])


def _codes(strs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Object array of str → (uint64 codepoint matrix (n, L), int64
    lengths).  Fixed-width '<U' view: one C-level conversion, no per-row
    Python."""
    u = np.asarray(strs, dtype="U")
    n = len(u)
    L = u.dtype.itemsize // 4
    if n == 0 or L == 0:
        return np.zeros((n, 0), np.uint64), np.zeros(n, np.int64)
    codes = u.view(np.uint32).reshape(n, L).astype(np.uint64)
    lens = np.char.str_len(u).astype(np.int64)
    return codes, lens


def deletion_variant_hashes(
    strs: np.ndarray, *, k: int = 1
) -> tuple[np.ndarray, np.ndarray]:
    """Polynomial hashes of every ≤ k-deletion variant of every string.

    Returns ``(vhash uint64, row_idx int64)`` flat arrays — one entry per
    (string, variant).  The hash of a variant of length m is
    ``(Σ c_j·B^(m-1-j))·B + m`` mod 2⁶⁴ — identical strings hash equal
    regardless of which row/deletions produced them, so FastSS recall is
    exact.  Derivation is closed-form from one prefix-sum pass:
    dropping position d multiplies the prefix's weights by B⁻¹; the
    fixed-pad-width convention is renormalized by B^-(pad-L) per row.
    """
    if k not in (1, 2):
        raise ValueError(f"k must be 1 or 2, got {k}")
    with np.errstate(over="ignore"):          # mod-2⁶⁴ wrap is the point
        return _variant_hashes(strs, k)


def _variant_hashes(strs, k):
    codes, lens = _codes(strs)
    n, L = codes.shape
    if n == 0:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64)
    rows = np.arange(n, dtype=np.int64)
    if L == 0:
        return np.zeros(n, np.uint64), rows  # identity variants only
    # weights with pad-width exponents: w[:, j] = c_j · B^(L-1-j)
    powv = np.empty(L, np.uint64)
    powv[L - 1] = np.uint64(1)
    for j in range(L - 2, -1, -1):
        powv[j] = powv[j + 1] * _B
    w = codes * powv[None, :]
    S = np.cumsum(w, axis=1, dtype=np.uint64)     # inclusive, wraps mod 2⁶⁴
    tot = S[:, -1]
    A = S - w                                     # exclusive prefix sums
    # per-row renormalization  f = Binv^(pad - len)
    powinv = np.empty(L + 1, np.uint64)
    powinv[0] = np.uint64(1)
    for t in range(1, L + 1):
        powinv[t] = powinv[t - 1] * _BINV
    f = powinv[L - lens]
    ulens = lens.astype(np.uint64)

    out_h = [tot * f * _B + ulens]                # identity variant
    out_r = [rows]
    # depth 1: delete position d  →  f·(A[d]·Binv + suf(d+1))
    suf = tot[:, None] - S                        # suf[:, d] = Σ_{j>d} w_j
    h1 = (A * _BINV + suf) * f[:, None]
    h1 = h1 * _B + (ulens[:, None] - np.uint64(1))
    m1 = np.arange(L)[None, :] < lens[:, None]
    out_h.append(h1[m1])
    out_r.append(np.broadcast_to(rows[:, None], (n, L))[m1])
    if k == 2 and L >= 2:
        # depth 2: delete d1 < d2 →
        # f·(A[d1]·Binv² + (A[d2]-A[d1]-w[d1])·Binv + suf(d2+1))
        len2 = ulens - np.uint64(2)
        for d1 in range(L - 1):
            a1 = A[:, d1] * (_BINV * _BINV)
            mid = (A[:, d1 + 1:] - S[:, d1][:, None]) * _BINV
            h2 = (a1[:, None] + mid + suf[:, d1 + 1:]) * f[:, None]
            h2 = h2 * _B + len2[:, None]
            m2 = np.arange(d1 + 1, L)[None, :] < lens[:, None]
            out_h.append(h2[m2])
            out_r.append(
                np.broadcast_to(rows[:, None], m2.shape)[m2])
    return np.concatenate(out_h), np.concatenate(out_r)


def lev_banded(a_strs: np.ndarray, b_strs: np.ndarray, k: int) -> np.ndarray:
    """Levenshtein distance per pair, saturated at k+1 — the Ukkonen
    band (2k+1 diagonals), vectorized across the PAIR axis: the scalar
    loop is max_len·(2k+1) numpy steps, independent of pair count."""
    ca, la = _codes(a_strs)
    cb, lb = _codes(b_strs)
    n = len(la)
    if n == 0:
        return np.zeros(0, np.int64)
    W = max(ca.shape[1], cb.shape[1])
    if ca.shape[1] < W:
        ca = np.pad(ca, ((0, 0), (0, W - ca.shape[1])))
    if cb.shape[1] < W:
        cb = np.pad(cb, ((0, 0), (0, W - cb.shape[1])))
    swap = la > lb
    if swap.any():                                # a = shorter side
        sw = swap[:, None]
        ca, cb = np.where(sw, cb, ca), np.where(sw, ca, cb)
        la, lb = np.where(swap, lb, la), np.where(swap, la, lb)
    INF = np.int64(k + 1)
    width = 2 * k + 1
    # D[:, o] = dist(a[:i], b[:j]),  j = i + o - k
    D = np.full((n, width), INF, np.int64)
    for o in range(width):
        j = o - k
        if 0 <= j:
            D[:, o] = np.where(j <= lb, np.int64(j), INF)
    res = np.where(la == 0, np.minimum(lb, INF), INF)
    idx = np.arange(n)
    for i in range(1, int(la.max() if n else 0) + 1):
        Dn = np.full((n, width), INF, np.int64)
        ai = ca[:, i - 1] if i - 1 < W else None
        for o in range(width):
            j = i + o - k
            if j < 0 or ai is None:
                continue
            if j == 0:
                Dn[:, o] = np.where(i <= la, np.int64(i), INF)
                continue
            if j - 1 >= W:
                continue
            cost = (ai != cb[:, j - 1]).astype(np.int64)
            cand = D[:, o] + cost                    # match / substitute
            if o + 1 < width:
                cand = np.minimum(cand, D[:, o + 1] + 1)   # delete from a
            if o - 1 >= 0:
                cand = np.minimum(cand, Dn[:, o - 1] + 1)  # insert into a
            valid = (j <= lb) & (i <= la)
            Dn[:, o] = np.where(valid, np.minimum(cand, INF), INF)
        D = Dn
        done = la == i
        if done.any():
            oo = lb - la + k                          # final diagonal
            inband = done & (oo < width)
            vals = D[idx, np.clip(oo, 0, width - 1)]
            res = np.where(inband, vals, np.where(done, INF, res))
    return res


def editdist_pairs(
    ds: ray.data.Dataset, *, k: int = 1, id_col: str = "url",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """``(url_a, url_b, dist)`` for every unordered pair of distinct
    ``id_col`` values with Levenshtein distance ≤ k — exact (FastSS
    blocking has recall 1.0; the banded DP is exact within the band)."""
    from data_dedup_ray.pipelines.near import (_distinct_pairs,
                                               _pairs_in_partition)
    P = num_partitions

    def emit(t: pa.Table) -> pa.Table:
        urls = t.column(id_col).to_numpy(zero_copy_only=False)
        vh, ridx = deletion_variant_hashes(urls, k=k)
        return pa.table({
            "vh": pa.array(vh, pa.uint64()),
            "url": pa.array(urls[ridx], pa.string()),
            "_part": pa.array((vh % np.uint64(P)).astype(np.int64)),
        })

    empty = pd.DataFrame({"url_a": pd.Series(dtype=object),
                          "url_b": pd.Series(dtype=object),
                          "dist": pd.Series(dtype=np.int64)})

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        # group sizes are bounded by (L+1)·|Σ| per the module docstring,
        # so the full cross-pair emit is safe: cap never binds (a star
        # fallback would silently lose exactness here).
        pairs = _pairs_in_partition(g, key_cols=["vh"], id_col="url",
                                    group_cap=1 << 30)
        if not len(pairs):
            return empty
        d = lev_banded(pairs["url_a"].to_numpy(),
                       pairs["url_b"].to_numpy(), k)
        keep = d <= k
        out = pairs.loc[keep, ["url_a", "url_b"]].copy()
        out["dist"] = d[keep]
        return out

    cand = hash_exchange(
        [ds.select_columns([id_col])
           .map_batches(emit, batch_format="pyarrow")],
        verify,
        num_partitions=P,
        schema=_PAIR_SCHEMA,
        in_schemas=[pa.schema([("vh", pa.uint64()), ("url", pa.string())])],
    )
    # a pair can surface under several shared variants / partitions
    return _distinct_pairs(cand, ["url_a", "url_b"],
                           keep_cols=["url_a", "url_b", "dist"],
                           num_partitions=P)


def url_editdist_pairs(sf_dir: str, *, k: int = 1,
                       num_partitions: int = 16) -> ray.data.Dataset:
    """Edit-distance ≤ k url pairs over the web_pages corpus, sorted."""
    return editdist_pairs(web_pages(sf_dir), k=k,
                          num_partitions=num_partitions
                          ).sort(["url_a", "url_b"])


def url_editdist_clusters(
    sf_dir: str, *, k: int = 1, num_partitions: int = 16,
    dsu_max_edges: int = 20_000_000,
) -> ray.data.Dataset:
    """Every url labeled with the min url of its edit-distance-≤k
    component — the url-family collapse (page counters, scheme variants)
    a crawl frontier runs before content dedup.  Count-gated driver DSU
    with the distributed label-propagation fallback, exactly like
    minhash_dedup_clusters (near.py:977)."""
    from data_dedup_ray.pipelines.components import (attach_clusters,
                                                     dsu_components,
                                                     label_propagation)
    pages = web_pages(sf_dir).select_columns(["url"])
    edges = editdist_pairs(pages, k=k,
                           num_partitions=num_partitions).materialize()
    if edges.count() > dsu_max_edges:
        return label_propagation(
            pages, edges.select_columns(["url_a", "url_b"]),
            node_col="url")
    assignment = dsu_components(edges.to_pandas())
    return attach_clusters(pages, assignment, id_col="url")


def host_editdist_pairs(sf_dir: str, *, k: int = 1,
                        num_partitions: int = 16) -> ray.data.Dataset:
    """Edit-distance ≤ k pairs over DISTINCT hosts — the typosquat /
    mirror-host-family signal (site1.example vs site2.example):
    host-level url intelligence at one deletion-variant pass over the
    (tiny) distinct-host set.  Same FastSS + banded-DP machinery; the
    distinct-host table is derived with one vectorized split, so the
    corpus is read once and only hosts enter the exchange."""
    import pyarrow.compute as pc

    def hosts(t: pa.Table) -> pa.Table:
        h = pc.split_pattern(t["url"].combine_chunks(), "/")
        host = pc.list_element(h, 2)
        return pa.table({"host": pa.array(
            pd.unique(host.to_numpy(zero_copy_only=False)), pa.string())})

    ds = web_pages(sf_dir).select_columns(["url"]).map_batches(
        hosts, batch_format="pyarrow")
    from data_dedup_ray.pipelines.near import _distinct_pairs
    dd = _distinct_pairs(ds, ["host"], num_partitions=num_partitions)
    out = editdist_pairs(dd, k=k, id_col="host",
                         num_partitions=num_partitions)
    return out.map_batches(
        lambda t: t.rename_columns(["host_a", "host_b", "dist"]),
        batch_format="pyarrow").sort(["host_a", "host_b"])


def host_editdist_pairs_sql(k: int = 1) -> str:
    from data_dedup_ray.corpus import web_pages_sql
    return web_pages_sql(f""",
h AS (SELECT DISTINCT split_part(url, '/', 3) AS host FROM web_pages)
SELECT a.host AS host_a, b.host AS host_b,
       CAST(levenshtein(a.host, b.host) AS BIGINT) AS dist
FROM h a JOIN h b ON a.host < b.host
WHERE levenshtein(a.host, b.host) <= {k}
ORDER BY host_a, host_b""")


# --------------------------------------------------------------------------
# DuckDB oracles
# --------------------------------------------------------------------------


def url_editdist_pairs_sql(k: int = 1) -> str:
    """Exact twin: DuckDB's levenshtein() over the distinct-url cross
    join (quadratic — oracle-scale only)."""
    from data_dedup_ray.corpus import web_pages_sql
    return web_pages_sql(f""",
u AS (SELECT DISTINCT url FROM web_pages)
SELECT a.url AS url_a, b.url AS url_b,
       CAST(levenshtein(a.url, b.url) AS BIGINT) AS dist
FROM u a JOIN u b ON a.url < b.url
WHERE levenshtein(a.url, b.url) <= {k}
ORDER BY url_a, url_b""")


def url_editdist_clusters_sql(k: int = 1) -> str:
    """Transitive closure of the ed ≤ k pair graph; singleton urls keep
    their own url (same shape as near_dup_clusters_sql)."""
    from data_dedup_ray.corpus import WEB_PAGES_CTE
    return (
        f"WITH RECURSIVE {WEB_PAGES_CTE},\n"
        "u AS (SELECT DISTINCT url FROM web_pages),\n"
        "dup AS (SELECT a.url AS ua, b.url AS ub FROM u a JOIN u b"
        f" ON a.url < b.url AND levenshtein(a.url, b.url) <= {k}),\n"
        "edges AS (SELECT ua AS a, ub AS b FROM dup"
        " UNION SELECT ub, ua FROM dup),\n"
        "reach(a, b) AS (SELECT a, b FROM edges"
        " UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),\n"
        "comp AS (SELECT a AS url, least(a, min(b)) AS cluster_id"
        " FROM reach GROUP BY a)\n"
        "SELECT u.url, coalesce(c.cluster_id, u.url) AS cluster_id"
        " FROM u LEFT JOIN comp c ON c.url = u.url"
    )
