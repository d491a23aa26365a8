"""Weighted (multiset) Jaccard near-dup pairs — the similarity measure
for REPETITION-sensitive dedup.

Set Jaccard (near.ngram_jaccard_pairs) treats a shingle that appears 40
times the same as one that appears once, so template spam that repeats a
block, and pages that differ only in how often they repeat shared
boilerplate, score identically to genuinely-similar pages.  The
multiset form

    WJ(A, B) = Σ_s min(c_A(s), c_B(s)) / Σ_s max(c_A(s), c_B(s))

(the discrete special case of weighted Jaccard à la Ioffe 2010 / Chum
et al. 2008) counts every occurrence.  Integer-exact by construction:
``wjac_bp = 10⁴·Σmin // (w_A + w_B − Σmin)`` over integer window
counts, so the DuckDB twin is exact-equal, not approximate.

Blocking is complete with recall 1.0: WJ ≥ t > 0 implies a shared
shingle VALUE, so candidates = pairs sharing any distinct shingle (the
share-any join the exact Jaccard oracle uses), generated through the
coarse sortless exchange with the group-cap skew guard — group sizes
are bounded by shingle document frequency.  The verify is the rank-
packed searchsorted intersect of near.py's Jaccard join, extended to
gather BOTH sides' counts at the matched positions and reduce
``Σ min`` per pair with one weights-bincount — no per-pair Python.

Per-doc state: (sorted distinct values, counts, total windows) packed
as two parallel blobs + one int — 24 B per distinct shingle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from data_dedup_ray.corpus import web_pages
from data_dedup_ray.engine.exchange import bucketize, hash_exchange
from data_dedup_ray.stages.minhash import sha256_token_hash, tokenize_batch

_CONT_OUT = pa.schema([("url_a", pa.string()), ("url_b", pa.string()),
                       ("wcont_bp", pa.int64())])
_PAIR_OUT = pa.schema([("url_a", pa.string()), ("url_b", pa.string()),
                       ("wjac_bp", pa.int64())])


def _weighted_shingles(texts, k: int, token_hash=None):
    """Per-doc weighted k-shingle multisets: ``(vals_cat uint64,
    cnts_cat int64, per-doc distinct sizes, per-doc total windows)`` —
    the same FNV rolling combine as stages/minhash.shingle_sets (SQL
    parity), but KEEPING multiplicity."""
    hashes, counts = tokenize_batch(texts, token_hash=token_hash)
    with np.errstate(over="ignore"):
        c = np.uint64(0x100000001B3)
        n = len(hashes)
        if n >= k:
            win = hashes[: n - k + 1].copy()
            for j in range(1, k):
                win = win * c + hashes[j: n - k + 1 + j]
        else:
            win = np.empty(0, dtype=np.uint64)
    starts = np.concatenate([[0], np.cumsum(counts)])
    out_v, out_c = [], []
    sizes = np.zeros(len(counts), dtype=np.int64)
    totals = np.zeros(len(counts), dtype=np.int64)
    for i in range(len(counts)):
        s, e = starts[i], starts[i + 1]
        if e - s >= k:
            seg = win[s: e - k + 1]
            u, cnt = np.unique(seg, return_counts=True)
            out_v.append(u)
            out_c.append(cnt.astype(np.int64))
            sizes[i] = len(u)
            totals[i] = len(seg)
    vals = np.concatenate(out_v) if out_v else np.empty(0, np.uint64)
    cnts = np.concatenate(out_c) if out_c else np.empty(0, np.int64)
    return vals, cnts, sizes, totals


def weighted_blobs(
    ds: ray.data.Dataset, *, shingle_k: int = 5, token_hash=None,
    id_col: str = "url", text_col: str = "text",
) -> ray.data.Dataset:
    """``(url, sv, sc, w)`` — sorted distinct shingle values, aligned
    counts, total window count.  Empty docs keep empty blobs."""

    def fn(t: pa.Table) -> pa.Table:
        vals, cnts, sizes, totals = _weighted_shingles(
            t[text_col], shingle_k, token_hash=token_hash)
        offs = np.zeros(len(sizes) + 1, np.int64)
        np.cumsum(sizes, out=offs[1:])
        sv = [vals[offs[i]: offs[i + 1]].tobytes()
              for i in range(len(sizes))]
        sc = [cnts[offs[i]: offs[i + 1]].tobytes()
              for i in range(len(sizes))]
        return pa.table({
            id_col: t[id_col].combine_chunks(),
            "sv": pa.array(sv, pa.large_binary()),
            "sc": pa.array(sc, pa.large_binary()),
            "w": pa.array(totals),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow")


def _wjac_verify(pt: pa.Table, bt: pa.Table, *, id_col: str,
                 min_wjac_bp: int, metric: str = "jaccard") -> pa.Table:
    """Vectorized Σmin intersect across the pair axis (near.py _join_b
    shape: hash-indexer lookup into the bucket's unique blob buffer,
    rank-packed searchsorted membership, weights-bincount)."""
    from data_dedup_ray.pipelines.near import _blob_views, _seg_gather
    out_schema = _PAIR_OUT if metric == "jaccard" else _CONT_OUT
    if pt.num_rows == 0 or bt.num_rows == 0:
        return out_schema.empty_table()
    idx = pd.Index(bt[id_col].to_pandas()).get_indexer(
        pd.Series(pt["url_b"].to_pandas()))
    found = idx >= 0
    if not found.all():
        pt = pt.filter(pa.array(found))
        idx = idx[found]
    va, oa = _blob_views(pt["sv_a"])
    ca_all, oca = _blob_views(pt["sc_a"])
    ca_all = ca_all.view(np.int64)
    vb, ob = _blob_views(bt["sv"])
    cb_all, ocb = _blob_views(bt["sc"])
    cb_all = cb_all.view(np.int64)
    # values and counts are parallel arrays; the gathers index the
    # counts buffer with VALUE offsets, which is only sound if the two
    # columns' physical layouts agree (they do — both flow through the
    # same take/filter chain; this guards against a future divergence)
    assert (oa == oca).all() and (ob == ocb).all()
    wa = pt["w_a"].to_numpy(zero_copy_only=False)
    wb_full = bt["w"].to_numpy(zero_copy_only=False)
    wb = wb_full[idx]
    n = pt.num_rows
    la = np.diff(oa)
    sbst = ob[idx]
    lb = ob[idx + 1] - sbst
    num = np.zeros(n, dtype=np.int64)
    CHUNK = 1 << 16
    for s in range(0, n, CHUNK):
        e = min(s + CHUNK, n)
        naa, nbb = la[s:e], lb[s:e]
        saa, sbb = oa[:-1][s:e], sbst[s:e]
        swap = naa > nbb                       # probe = smaller side
        plen = np.where(swap, nbb, naa)
        tlen = np.where(swap, naa, nbb)
        pstart = np.where(swap, sbb, saa)
        tstart = np.where(swap, saa, sbb)
        p_from_b = swap
        t_from_b = ~swap

        def gather(startv, lens, from_b):
            pair_of, gidx = _seg_gather(startv, lens)
            fb = from_b[pair_of]
            v = np.empty(len(gidx), np.uint64)
            cnt = np.empty(len(gidx), np.int64)
            v[~fb] = va[gidx[~fb]]
            cnt[~fb] = ca_all[gidx[~fb]]
            v[fb] = vb[gidx[fb]]
            cnt[fb] = cb_all[gidx[fb]]
            return pair_of, v, cnt

        pair_p, val_p, cnt_p = gather(pstart, plen, p_from_b)
        pair_t, val_t, cnt_t = gather(tstart, tlen, t_from_b)
        if len(val_p) == 0 or len(val_t) == 0:
            continue
        u = np.unique(np.concatenate([val_p, val_t]))
        kp = (pair_p.astype(np.uint64) << np.uint64(32)) \
            | np.searchsorted(u, val_p).astype(np.uint64)
        kt = (pair_t.astype(np.uint64) << np.uint64(32)) \
            | np.searchsorted(u, val_t).astype(np.uint64)
        pos = np.searchsorted(kt, kp)
        pos[pos == len(kt)] = len(kt) - 1
        member = kt[pos] == kp
        mins = np.minimum(cnt_p[member], cnt_t[pos[member]])
        num[s:e] = np.bincount(pair_p[member], weights=mins,
                               minlength=e - s).astype(np.int64)
    if metric == "containment":
        # directional Σmin/|A|: each unordered candidate yields up to
        # two rows — (a ⊂ b) and (b ⊂ a) are independent claims
        ua = pt["url_a"].combine_chunks()
        ub = pt["url_b"].combine_chunks()
        est_ab = (10000 * num) // np.maximum(wa, 1)
        est_ba = (10000 * num) // np.maximum(wb, 1)
        k_ab = est_ab >= min_wjac_bp
        k_ba = est_ba >= min_wjac_bp
        return pa.table({
            "url_a": pa.concat_arrays([
                ua.filter(pa.array(k_ab)), ub.filter(pa.array(k_ba))]),
            "url_b": pa.concat_arrays([
                ub.filter(pa.array(k_ab)), ua.filter(pa.array(k_ba))]),
            "wcont_bp": pa.array(
                np.concatenate([est_ab[k_ab], est_ba[k_ba]]), pa.int64()),
        })
    den = wa + wb - num
    den = np.maximum(den, 1)
    est = (10000 * num) // den
    keep = est >= min_wjac_bp
    return pa.table({
        "url_a": pt["url_a"].combine_chunks().filter(pa.array(keep)),
        "url_b": pt["url_b"].combine_chunks().filter(pa.array(keep)),
        "wjac_bp": pa.array(est[keep], pa.int64()),
    })


def weighted_jaccard_pairs(
    ds: ray.data.Dataset, *, shingle_k: int = 5, min_wjac_bp: int = 5000,
    token_hash=None, id_col: str = "url", text_col: str = "text",
    num_partitions: int = 16, group_cap: int = 100_000,
    _metric: str = "jaccard",
    _blobs: ray.data.Dataset | None = None,
    _cross: tuple | None = None,
) -> ray.data.Dataset:
    """``(url_a, url_b, wjac_bp)`` — every pair with weighted Jaccard
    ≥ ``min_wjac_bp`` basis points, exact (share-any-value blocking has
    recall 1.0 for any positive threshold; a hot shingle value beyond
    ``group_cap`` fails loudly rather than degrading recall).
    ``_metric="containment"`` reuses the whole pipeline for the
    directional Σmin/|A| measure (weighted_containment_pairs);
    ``_blobs``/``_cross`` feed a prebuilt (possibly tagged-union) blob
    table and keep only cross-side candidates — the incremental-store
    path (incremental_weighted_jaccard_pairs)."""
    from data_dedup_ray.pipelines.near import (_blob_views,
                                               _distinct_pairs,
                                               _hash_str_column,
                                               _pairs_in_partition)
    P = num_partitions
    if _blobs is not None:
        blobs = _blobs
    else:
        blobs = weighted_blobs(ds, shingle_k=shingle_k,
                               token_hash=token_hash, id_col=id_col,
                               text_col=text_col).materialize()

    def explode(t: pa.Table) -> pa.Table:
        data, offs = _blob_views(t["sv"])
        lens = np.diff(offs)
        urls = t[id_col].to_numpy(zero_copy_only=False)
        return pa.table({
            "h": pa.array(data, pa.uint64()),
            "url": pa.array(np.repeat(urls, lens), pa.string()),
            "_part": pa.array((data % np.uint64(P)).astype(np.int64)),
        })

    def cand_fn(g: pd.DataFrame) -> pd.DataFrame:
        out = _pairs_in_partition(g, key_cols=["h"], id_col="url",
                                  group_cap=group_cap, on_cap="error")
        if len(out) and _cross is not None:
            # 'i|' < 'n|' ⇒ the index side is always url_a
            pidx, pnew = _cross
            out = out[out["url_a"].str.startswith(pidx)
                      & out["url_b"].str.startswith(pnew)]
        return out

    cand = hash_exchange(
        [blobs.map_batches(explode, batch_format="pyarrow")],
        cand_fn,
        num_partitions=P,
        schema=pa.schema([("url_a", pa.string()), ("url_b", pa.string())]),
        in_schemas=[pa.schema([("h", pa.uint64()), ("url", pa.string())])],
    )
    cand = _distinct_pairs(cand, ["url_a", "url_b"], num_partitions=P)

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
                             ("sv", pa.large_binary()),
                             ("sc", pa.large_binary()),
                             ("w", pa.int64())])
    blob_buckets = bucketize(
        blobs.map_batches(with_part(id_col), batch_format="pyarrow"),
        num_partitions=P, in_schema=blob_schema)

    def join_a(pt: pa.Table, bt: pa.Table) -> pa.Table:
        m = pt.join(bt, keys=["url_a"], right_keys=[id_col],
                    join_type="inner")
        return m.select(["url_a", "url_b", "sv", "sc", "w"]) \
            .rename_columns(["url_a", "url_b", "sv_a", "sc_a", "w_a"])

    step_a = hash_exchange(
        [cand.map_batches(with_part("url_a"), batch_format="pyarrow"),
         blob_buckets],
        join_a, num_partitions=P,
        schema=pa.schema([("url_a", pa.string()), ("url_b", pa.string()),
                          ("sv_a", pa.large_binary()),
                          ("sc_a", pa.large_binary()),
                          ("w_a", pa.int64())]),
        in_schemas=[pa.schema([("url_a", pa.string()),
                               ("url_b", pa.string())]), blob_schema],
        apply_format="pyarrow",
    )

    return hash_exchange(
        [step_a.map_batches(with_part("url_b"), batch_format="pyarrow"),
         blob_buckets],
        lambda pt, bt: _wjac_verify(pt, bt, id_col=id_col,
                                    min_wjac_bp=min_wjac_bp,
                                    metric=_metric),
        num_partitions=P,
        schema=_PAIR_OUT if _metric == "jaccard" else _CONT_OUT,
        in_schemas=[pa.schema([("url_a", pa.string()),
                               ("url_b", pa.string()),
                               ("sv_a", pa.large_binary()),
                               ("sc_a", pa.large_binary()),
                               ("w_a", pa.int64())]), blob_schema],
        apply_format="pyarrow",
    ).sort(["url_a", "url_b"])


def weighted_jaccard_sig_pairs(
    sf_dir: str, *, shingle_k: int = 5, min_wjac_bp: int = 5000,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """sha-token weighted-Jaccard pairs over web_pages (oracle variant)."""
    return weighted_jaccard_pairs(
        web_pages(sf_dir), shingle_k=shingle_k, min_wjac_bp=min_wjac_bp,
        token_hash=sha256_token_hash, num_partitions=num_partitions)


def weighted_jaccard_clusters(
    sf_dir: str, *, shingle_k: int = 5, min_wjac_bp: int = 5000,
    num_partitions: int = 16, dsu_max_edges: int = 20_000_000,
) -> ray.data.Dataset:
    """Connected components over the weighted-Jaccard pair graph —
    ``(url, cluster_id)`` with min-member labels (the repetition-aware
    cluster view: a page and its doubled-boilerplate variant stay in
    separate families where the set-Jaccard clusters would merge them);
    count-gated DSU with the distributed fallback."""
    from data_dedup_ray.pipelines.components import (attach_clusters,
                                                     dsu_components,
                                                     label_propagation)
    pages = web_pages(sf_dir).select_columns(["url"])
    edges = weighted_jaccard_sig_pairs(
        sf_dir, shingle_k=shingle_k, min_wjac_bp=min_wjac_bp,
        num_partitions=num_partitions).materialize()
    if edges.count() > dsu_max_edges:
        return label_propagation(
            pages, edges.select_columns(["url_a", "url_b"]),
            node_col="url")
    assignment = dsu_components(edges.to_pandas())
    return attach_clusters(pages, assignment, id_col="url")


def weighted_jaccard_clusters_sql(*, shingle_k: int = 5,
                                  min_wjac_bp: int = 5000) -> str:
    pairs = weighted_jaccard_sig_pairs_sql(shingle_k=shingle_k,
                                           min_wjac_bp=min_wjac_bp)
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


def weighted_jaccard_sig_pairs_sql(*, shingle_k: int = 5,
                                   min_wjac_bp: int = 5000) -> str:
    """Exact twin: the sha-token FNV window chain WITH multiplicity
    (same formulas as sigstore.sig_chain_ctes' msh, minus the
    DISTINCT), Σleast / (w_a + w_b − Σleast) in HUGEINT."""
    from data_dedup_ray.corpus import WEB_PAGES_CTE
    k = shingle_k
    leads = ",\n         ".join(
        f"lead(h, {j - 1}) OVER w AS h{j}" for j in range(2, k + 1))
    expr = "h1"
    for j in range(2, k + 1):
        expr = (f"(({expr} * 1099511628211::HUGEINT + h{j})"
                " % 18446744073709551616::HUGEINT)")
    return f"""
WITH {WEB_PAGES_CTE},
mtok AS (SELECT url AS id, g.i AS pos, t[g.i] AS tok
         FROM (SELECT url, regexp_extract_all(text, '[a-z0-9]+') AS t
               FROM web_pages) u,
              UNNEST(generate_series(1, len(t))) AS g(i)),
mh AS (SELECT id, pos,
              CAST(('0x' || substr(sha256(tok), 1, 16)) AS UBIGINT) AS h
       FROM mtok),
mw AS (SELECT id, h AS h1,
         {leads}
       FROM mh WINDOW w AS (PARTITION BY id ORDER BY pos)),
ws AS (SELECT id, {expr} AS s FROM mw WHERE h{k} IS NOT NULL),
shc AS (SELECT id, s, CAST(count(*) AS BIGINT) AS c
        FROM ws GROUP BY 1, 2),
tot AS (SELECT id, CAST(sum(c) AS BIGINT) AS w FROM shc GROUP BY 1),
inter AS (SELECT a.id AS ia, b.id AS ib,
                 CAST(sum(least(a.c, b.c)) AS BIGINT) AS m
          FROM shc a JOIN shc b ON a.s = b.s AND a.id < b.id
          GROUP BY 1, 2)
SELECT ia AS url_a, ib AS url_b,
       CAST((10000 * m) // (ta.w + tb.w - m) AS BIGINT) AS wjac_bp
FROM inter
JOIN tot ta ON ta.id = ia
JOIN tot tb ON tb.id = ib
WHERE (10000 * m) // (ta.w + tb.w - m) >= {min_wjac_bp}
ORDER BY url_a, url_b"""


def weighted_containment_pairs(
    ds: ray.data.Dataset, *, shingle_k: int = 5, min_wcont_bp: int = 8000,
    token_hash=None, id_col: str = "url", text_col: str = "text",
    num_partitions: int = 16, group_cap: int = 100_000,
) -> ray.data.Dataset:
    """``(url_a, url_b, wcont_bp)`` — DIRECTIONAL weighted containment
    ``Σ_s min(c_A, c_B) / |A|`` ≥ ``min_wcont_bp``: url_a is the
    (mostly-)contained side.  The repetition-aware quote/subset
    detector — a page that embeds another's text N times still scores
    the source as contained, where set containment (near.
    containment_pairs) collapses the repeats.  Same complete blocking
    + exact integer verify as weighted_jaccard_pairs (one shared
    pipeline, different reduction); up to two rows per document pair,
    one per direction."""
    return weighted_jaccard_pairs(
        ds, shingle_k=shingle_k, min_wjac_bp=min_wcont_bp,
        token_hash=token_hash, id_col=id_col, text_col=text_col,
        num_partitions=num_partitions, group_cap=group_cap,
        _metric="containment")


def weighted_containment_sig_pairs(
    sf_dir: str, *, shingle_k: int = 5, min_wcont_bp: int = 8000,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Driver query: sha-token weighted containment over web_pages
    (twin = weighted_containment_sig_pairs_sql)."""
    return weighted_containment_pairs(
        web_pages(sf_dir), shingle_k=shingle_k,
        min_wcont_bp=min_wcont_bp, token_hash=sha256_token_hash,
        num_partitions=num_partitions)


def weighted_containment_sig_pairs_sql(*, shingle_k: int = 5,
                                       min_wcont_bp: int = 8000) -> str:
    """Exact twin: the shared sha/FNV multiset chain, directional
    Σleast // w_a in HUGEINT."""
    from data_dedup_ray.corpus import WEB_PAGES_CTE
    k = shingle_k
    leads = ",\n         ".join(
        f"lead(h, {j - 1}) OVER w AS h{j}" for j in range(2, k + 1))
    expr = "h1"
    for j in range(2, k + 1):
        expr = (f"(({expr} * 1099511628211::HUGEINT + h{j})"
                " % 18446744073709551616::HUGEINT)")
    return f"""
WITH {WEB_PAGES_CTE},
mtok AS (SELECT url AS id, g.i AS pos, t[g.i] AS tok
         FROM (SELECT url, regexp_extract_all(text, '[a-z0-9]+') AS t
               FROM web_pages) u,
              UNNEST(generate_series(1, len(t))) AS g(i)),
mh AS (SELECT id, pos,
              CAST(('0x' || substr(sha256(tok), 1, 16)) AS UBIGINT) AS h
       FROM mtok),
mw AS (SELECT id, h AS h1,
         {leads}
       FROM mh WINDOW w AS (PARTITION BY id ORDER BY pos)),
ws AS (SELECT id, {expr} AS s FROM mw WHERE h{k} IS NOT NULL),
shc AS (SELECT id, s, CAST(count(*) AS BIGINT) AS c
        FROM ws GROUP BY 1, 2),
tot AS (SELECT id, CAST(sum(c) AS BIGINT) AS w FROM shc GROUP BY 1),
inter AS (SELECT a.id AS ia, b.id AS ib,
                 CAST(sum(least(a.c, b.c)) AS BIGINT) AS m
          FROM shc a JOIN shc b ON a.s = b.s AND a.id <> b.id
          GROUP BY 1, 2)
SELECT ia AS url_a, ib AS url_b,
       CAST((10000 * m) // ta.w AS BIGINT) AS wcont_bp
FROM inter
JOIN tot ta ON ta.id = ia
WHERE (10000 * m) // ta.w >= {min_wcont_bp}
ORDER BY url_a, url_b"""


def weighted_containment_clusters(
    sf_dir: str, *, shingle_k: int = 5, min_wcont_bp: int = 8000,
    num_partitions: int = 16, dsu_max_edges: int = 20_000_000,
) -> ray.data.Dataset:
    """Connected components over the containment-LINKED graph — an
    undirected edge wherever EITHER direction clears ``min_wcont_bp``
    (quote chains: A ⊂ B ⊂ C all land in one family even when A and C
    share no direct edge).  ``(url, cluster_id)`` min-member labels,
    count-gated DSU with the distributed fallback."""
    from data_dedup_ray.pipelines.components import (attach_clusters,
                                                     dsu_components,
                                                     label_propagation)
    pages = web_pages(sf_dir).select_columns(["url"])
    edges = weighted_containment_sig_pairs(
        sf_dir, shingle_k=shingle_k, min_wcont_bp=min_wcont_bp,
        num_partitions=num_partitions).materialize()
    if edges.count() > dsu_max_edges:
        return label_propagation(
            pages, edges.select_columns(["url_a", "url_b"]),
            node_col="url")
    assignment = dsu_components(edges.to_pandas())
    return attach_clusters(pages, assignment, id_col="url")


def weighted_containment_clusters_sql(*, shingle_k: int = 5,
                                      min_wcont_bp: int = 8000) -> str:
    """RECURSIVE closure over the directional pair twin (symmetrized)."""
    pairs = weighted_containment_sig_pairs_sql(
        shingle_k=shingle_k, min_wcont_bp=min_wcont_bp)
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


def host_containment_stats(
    sf_dir: str, *, shingle_k: int = 5, min_wcont_bp: int = 8000,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """``(host, n_contained, n_containers)`` per host of the CONTAINED
    side's url — the quote-farm dashboard: hosts whose pages are mostly
    contained in other pages (scrapers / aggregators) versus hosts that
    contain many others (canonical sources).  One skinny rollup over
    the directional pair list; host-count-sized output."""
    pairs = weighted_containment_sig_pairs(
        sf_dir, shingle_k=shingle_k, min_wcont_bp=min_wcont_bp,
        num_partitions=num_partitions)
    P = num_partitions

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        ha = df["url_a"].astype(object).str.split("/").str[2].fillna("")
        hb = df["url_b"].astype(object).str.split("/").str[2].fillna("")
        out = pd.concat([
            pd.DataFrame({"host": ha, "n_contained": 1,
                          "n_containers": 0}),
            pd.DataFrame({"host": hb, "n_contained": 0,
                          "n_containers": 1}),
        ]).groupby("host", as_index=False).sum()
        h = pd.util.hash_array(out["host"].to_numpy(dtype=object))
        out["_part"] = (h % np.uint64(P)).astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("host", as_index=False)[
            ["n_contained", "n_containers"]].sum()

    return hash_exchange(
        [pairs.map_batches(partial, batch_format="pyarrow")],
        final, num_partitions=P,
        schema=pa.schema([("host", pa.string()),
                          ("n_contained", pa.int64()),
                          ("n_containers", pa.int64())]),
        in_schemas=[pa.schema([("host", pa.string()),
                               ("n_contained", pa.int64()),
                               ("n_containers", pa.int64())])],
    ).sort("host")


def host_containment_stats_sql(*, shingle_k: int = 5,
                               min_wcont_bp: int = 8000) -> str:
    """Twin: split_part hosts over the directional pair twin."""
    pairs = weighted_containment_sig_pairs_sql(
        shingle_k=shingle_k, min_wcont_bp=min_wcont_bp)
    return f"""
WITH dup AS (SELECT url_a, url_b FROM ({pairs}) p),
tal AS (SELECT split_part(url_a, '/', 3) AS host,
               1 AS n_contained, 0 AS n_containers FROM dup
        UNION ALL
        SELECT split_part(url_b, '/', 3), 0, 1 FROM dup)
SELECT host, CAST(sum(n_contained) AS BIGINT) AS n_contained,
       CAST(sum(n_containers) AS BIGINT) AS n_containers
FROM tal GROUP BY host ORDER BY host"""


# ---------------------------------------------------------------------------
# Exact weighted store rung — persist the (sv, sc, w) multiset blobs
# (24 B per distinct shingle) so a new crawl can be scored against the
# corpus with EXACT weighted Jaccard and no index-text re-read: the
# exact-tier counterpart of the fixed-ICWS sketch rung above it in the
# ladder (sketches when 16 B/sample must suffice, exact blobs when the
# index can afford ~1-2 KB/doc and the answer must be the true Σmin/Σmax).
# ---------------------------------------------------------------------------


def build_weighted_store(
    ds: ray.data.Dataset, path: str, *, shingle_k: int = 5,
    token_hash="sha", id_col: str = "url", text_col: str = "text",
    num_partitions: int = 16,
) -> None:
    """Persist ``(url, sv, sc, w)`` weighted-shingle blobs — resumable
    hash-partitioned parquet with config lineage."""
    from data_dedup_ray.state.sink import resumable_write_parquet
    th = sha256_token_hash if token_hash == "sha" else token_hash
    name = "sha" if token_hash in ("sha", sha256_token_hash) else "fast"
    resumable_write_parquet(
        weighted_blobs(ds, shingle_k=shingle_k, token_hash=th,
                       id_col=id_col, text_col=text_col),
        path, key_col=id_col, num_partitions=num_partitions,
        config={"kind": "weighted_store", "shingle_k": shingle_k,
                "token_hash": name})


def incremental_weighted_jaccard_pairs(
    new_ds: ray.data.Dataset, store_path: "str | list", *,
    shingle_k: int = 5,
    min_wjac_bp: int = 5000, token_hash="sha",
    num_partitions: int = 16, group_cap: int = 100_000,
) -> ray.data.Dataset:
    """``(new_url, index_url, wjac_bp)`` — EXACT weighted Jaccard of
    each new-crawl page against the persisted blob store (share-any
    blocking is complete, so recall 1.0 at any positive threshold, and
    the verify is the true integer Σmin/Σmax — no estimator).  Index
    text is never re-read; store config is validated.  ``store_path``
    may be a LIST of disjoint crawl-slice stores (rolling form): the
    multiset blobs of distinct urls concatenate losslessly, so slice
    stores roll up by multi-path read with no merge pass — every
    member's config must match."""
    from data_dedup_ray.pipelines.fpstore import _read_store
    from data_dedup_ray.state.sink import validate_store_config
    name = "sha" if token_hash in ("sha", sha256_token_hash) else "fast"
    validate_store_config(store_path, {
        "kind": "weighted_store", "shingle_k": shingle_k,
        "token_hash": name})
    th = sha256_token_hash if token_hash == "sha" else token_hash

    def tag(prefix):
        def fn(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            u = pc.binary_join_element_wise(
                pa.array([prefix] * t.num_rows, pa.string()),
                t["url"].combine_chunks().cast(pa.string()), "")
            return pa.table({
                "url": u,
                "sv": t["sv"].combine_chunks().cast(pa.large_binary()),
                "sc": t["sc"].combine_chunks().cast(pa.large_binary()),
                "w": t["w"].combine_chunks().cast(pa.int64()),
            })
        return fn

    new_blobs = weighted_blobs(new_ds, shingle_k=shingle_k,
                               token_hash=th) \
        .map_batches(tag("n|"), batch_format="pyarrow")
    idx_blobs = _read_store(store_path).map_batches(
        tag("i|"), batch_format="pyarrow")
    blobs = new_blobs.union(idx_blobs).materialize()
    pairs = weighted_jaccard_pairs(
        None, shingle_k=shingle_k, min_wjac_bp=min_wjac_bp,
        num_partitions=num_partitions, group_cap=group_cap,
        _blobs=blobs, _cross=("i|", "n|"))

    def strip(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "new_url": pc.utf8_slice_codeunits(
                t["url_b"].combine_chunks(), 2),
            "index_url": pc.utf8_slice_codeunits(
                t["url_a"].combine_chunks(), 2),
            "wjac_bp": t["wjac_bp"].combine_chunks(),
        })

    return pairs.map_batches(strip, batch_format="pyarrow") \
        .sort(["new_url", "index_url"])


def incremental_weighted_jaccard_pairs_web(
    sf_dir: str, *, store_dir: str | None = None, **kw
) -> ray.data.Dataset:
    """Driver query: build (or reuse) the weighted blob store from the
    sf corpus, then score snapshot2 against it."""
    import hashlib
    import os

    from data_dedup_ray.pipelines.snapshots import snapshot2
    shingle_k = kw.get("shingle_k", 5)
    if store_dir is None:
        tag = hashlib.sha256(
            f"{os.path.abspath(sf_dir)}|wstore|{shingle_k}"
            .encode()).hexdigest()[:16]
        store_dir = f"/tmp/weighted_store_{tag}"
    build_weighted_store(web_pages(sf_dir), store_dir,
                         shingle_k=shingle_k)
    return incremental_weighted_jaccard_pairs(snapshot2(sf_dir),
                                              store_dir, **kw)


def incremental_weighted_jaccard_pairs_sql(
    *, shingle_k: int = 5, min_wjac_bp: int = 5000,
) -> str:
    """Twin over the tagged web_pages ('i|') × snapshot2 ('n|') union —
    the HUGEINT multiset chain with cross-side pairs."""
    from data_dedup_ray.corpus import WEB_PAGES_CTE
    from data_dedup_ray.pipelines.snapshots import SNAPSHOT2_CTE
    k = shingle_k
    leads = ",\n         ".join(
        f"lead(h, {j - 1}) OVER w AS h{j}" for j in range(2, k + 1))
    expr = "h1"
    for j in range(2, k + 1):
        expr = (f"(({expr} * 1099511628211::HUGEINT + h{j})"
                " % 18446744073709551616::HUGEINT)")
    return f"""
WITH {WEB_PAGES_CTE},
{SNAPSHOT2_CTE},
mall AS (
  SELECT 'i|' || url AS id, text FROM web_pages
  UNION ALL SELECT 'n|' || url, text FROM snapshot2),
mtok AS (SELECT id, g.i AS pos, t[g.i] AS tok
         FROM (SELECT id, regexp_extract_all(text, '[a-z0-9]+') AS t
               FROM mall) u,
              UNNEST(generate_series(1, len(t))) AS g(i)),
mh AS (SELECT id, pos,
              CAST(('0x' || substr(sha256(tok), 1, 16)) AS UBIGINT) AS h
       FROM mtok),
mw AS (SELECT id, h AS h1,
         {leads}
       FROM mh WINDOW w AS (PARTITION BY id ORDER BY pos)),
ws AS (SELECT id, {expr} AS s FROM mw WHERE h{k} IS NOT NULL),
shc AS (SELECT id, s, CAST(count(*) AS BIGINT) AS c
        FROM ws GROUP BY 1, 2),
tot AS (SELECT id, CAST(sum(c) AS BIGINT) AS w FROM shc GROUP BY 1),
inter AS (SELECT a.id AS ia, b.id AS ib,
                 CAST(sum(least(a.c, b.c)) AS BIGINT) AS m
          FROM shc a JOIN shc b ON a.s = b.s
          WHERE substr(a.id, 1, 2) = 'i|' AND substr(b.id, 1, 2) = 'n|'
          GROUP BY 1, 2)
SELECT substr(ib, 3) AS new_url, substr(ia, 3) AS index_url,
       CAST((10000 * m) // (ta.w + tb.w - m) AS BIGINT) AS wjac_bp
FROM inter
JOIN tot ta ON ta.id = ia
JOIN tot tb ON tb.id = ib
WHERE (10000 * m) // (ta.w + tb.w - m) >= {min_wjac_bp}
ORDER BY new_url, index_url"""


def incremental_weighted_containment_pairs(
    new_ds: ray.data.Dataset, store_path: "str | list", *,
    shingle_k: int = 5,
    min_wcont_bp: int = 8000, token_hash="sha",
    num_partitions: int = 16, group_cap: int = 100_000,
) -> ray.data.Dataset:
    """``(new_url, index_url, direction, wcont_bp)`` — EXACT weighted
    containment between each new-crawl page and the persisted blob
    store, BOTH directions reported explicitly: ``direction =
    'new_in_index'`` (the new page is mostly quoted from the index —
    scraped content) or ``'index_in_new'`` (the new page absorbed an
    index page — aggregation).  Same store and blocking as
    incremental_weighted_jaccard_pairs."""
    from data_dedup_ray.pipelines.fpstore import _read_store
    from data_dedup_ray.state.sink import validate_store_config
    name = "sha" if token_hash in ("sha", sha256_token_hash) else "fast"
    validate_store_config(store_path, {
        "kind": "weighted_store", "shingle_k": shingle_k,
        "token_hash": name})
    th = sha256_token_hash if token_hash == "sha" else token_hash

    def tag(prefix):
        def fn(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            u = pc.binary_join_element_wise(
                pa.array([prefix] * t.num_rows, pa.string()),
                t["url"].combine_chunks().cast(pa.string()), "")
            return pa.table({
                "url": u,
                "sv": t["sv"].combine_chunks().cast(pa.large_binary()),
                "sc": t["sc"].combine_chunks().cast(pa.large_binary()),
                "w": t["w"].combine_chunks().cast(pa.int64()),
            })
        return fn

    new_blobs = weighted_blobs(new_ds, shingle_k=shingle_k,
                               token_hash=th) \
        .map_batches(tag("n|"), batch_format="pyarrow")
    idx_blobs = _read_store(store_path).map_batches(
        tag("i|"), batch_format="pyarrow")
    blobs = new_blobs.union(idx_blobs).materialize()
    pairs = weighted_jaccard_pairs(
        None, shingle_k=shingle_k, min_wjac_bp=min_wcont_bp,
        num_partitions=num_partitions, group_cap=group_cap,
        _metric="containment", _blobs=blobs, _cross=("i|", "n|"))

    def orient(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        # containment rows: url_a = contained side (either corpus)
        a = t["url_a"].combine_chunks()
        b = t["url_b"].combine_chunks()
        a_is_new = pc.starts_with(a, "n|")
        new_u = pc.if_else(a_is_new, a, b)
        idx_u = pc.if_else(a_is_new, b, a)
        return pa.table({
            "new_url": pc.utf8_slice_codeunits(new_u, 2),
            "index_url": pc.utf8_slice_codeunits(idx_u, 2),
            "direction": pc.if_else(
                a_is_new,
                pa.array(["new_in_index"] * t.num_rows),
                pa.array(["index_in_new"] * t.num_rows)),
            "wcont_bp": t["wcont_bp"].combine_chunks(),
        })

    return pairs.map_batches(orient, batch_format="pyarrow") \
        .sort(["new_url", "index_url", "direction"])


def incremental_weighted_containment_pairs_web(
    sf_dir: str, *, store_dir: str | None = None, **kw
) -> ray.data.Dataset:
    """Driver query: the same store as the Jaccard rung, containment
    reduction — both reuse one build."""
    import hashlib
    import os

    from data_dedup_ray.pipelines.snapshots import snapshot2
    shingle_k = kw.get("shingle_k", 5)
    if store_dir is None:
        tag = hashlib.sha256(
            f"{os.path.abspath(sf_dir)}|wstore|{shingle_k}"
            .encode()).hexdigest()[:16]
        store_dir = f"/tmp/weighted_store_{tag}"
    build_weighted_store(web_pages(sf_dir), store_dir,
                         shingle_k=shingle_k)
    return incremental_weighted_containment_pairs(
        snapshot2(sf_dir), store_dir, **kw)


def incremental_weighted_containment_pairs_sql(
    *, shingle_k: int = 5, min_wcont_bp: int = 8000,
) -> str:
    """Twin: both directions over the tagged cross join, oriented."""
    from data_dedup_ray.corpus import WEB_PAGES_CTE
    from data_dedup_ray.pipelines.snapshots import SNAPSHOT2_CTE
    k = shingle_k
    leads = ",\n         ".join(
        f"lead(h, {j - 1}) OVER w AS h{j}" for j in range(2, k + 1))
    expr = "h1"
    for j in range(2, k + 1):
        expr = (f"(({expr} * 1099511628211::HUGEINT + h{j})"
                " % 18446744073709551616::HUGEINT)")
    return f"""
WITH {WEB_PAGES_CTE},
{SNAPSHOT2_CTE},
mall AS (
  SELECT 'i|' || url AS id, text FROM web_pages
  UNION ALL SELECT 'n|' || url, text FROM snapshot2),
mtok AS (SELECT id, g.i AS pos, t[g.i] AS tok
         FROM (SELECT id, regexp_extract_all(text, '[a-z0-9]+') AS t
               FROM mall) u,
              UNNEST(generate_series(1, len(t))) AS g(i)),
mh AS (SELECT id, pos,
              CAST(('0x' || substr(sha256(tok), 1, 16)) AS UBIGINT) AS h
       FROM mtok),
mw AS (SELECT id, h AS h1,
         {leads}
       FROM mh WINDOW w AS (PARTITION BY id ORDER BY pos)),
ws AS (SELECT id, {expr} AS s FROM mw WHERE h{k} IS NOT NULL),
shc AS (SELECT id, s, CAST(count(*) AS BIGINT) AS c
        FROM ws GROUP BY 1, 2),
tot AS (SELECT id, CAST(sum(c) AS BIGINT) AS w FROM shc GROUP BY 1),
inter AS (SELECT a.id AS ia, b.id AS ib,
                 CAST(sum(least(a.c, b.c)) AS BIGINT) AS m
          FROM shc a JOIN shc b ON a.s = b.s
          WHERE substr(a.id, 1, 2) = 'i|' AND substr(b.id, 1, 2) = 'n|'
          GROUP BY 1, 2),
dirs AS (
  SELECT substr(ib, 3) AS new_url, substr(ia, 3) AS index_url,
         'index_in_new' AS direction,
         (10000 * m) // ta.w AS wcont_bp
  FROM inter JOIN tot ta ON ta.id = ia
  UNION ALL
  SELECT substr(ib, 3), substr(ia, 3), 'new_in_index',
         (10000 * m) // tb.w
  FROM inter JOIN tot tb ON tb.id = ib)
SELECT new_url, index_url, direction,
       CAST(wcont_bp AS BIGINT) AS wcont_bp
FROM dirs WHERE wcont_bp >= {min_wcont_bp}
ORDER BY new_url, index_url, direction"""
