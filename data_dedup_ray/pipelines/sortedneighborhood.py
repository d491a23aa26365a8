"""Sorted-neighborhood near-dup blocking (Hernández & Stolfo, SIGMOD'95).

The classic record-linkage alternative to LSH banding: order the corpus
by a discriminating key, then only compare records that land within a
sliding window of ``w`` consecutive positions.  Candidate volume is
LINEAR — exactly ``(w-1)·n`` ordered pairs — versus banding's
collision-driven volume, which makes it the predictable-cost blocking
tier when the sort key clusters duplicates (here: the text prefix, which
co-locates the corpus' identical-prefix families — re-captures,
suffix-appended near-dups, quote extensions — next to their bases).
Pairs are verified with the EXACT k-shingle Jaccard join the MinHash
pipeline already uses (near.verify_pairs_partitioned), so the result is
exact w.r.t. the blocking definition and fully SQL-twinned
(row_number window + jac CTE).

100 TB shape — the whole job is skinny exchanges:

- **rank without a global sort**: the repo's ordered-prefix-sum pattern
  (shuffle.deterministic_shuffle, stats.token_shards).  Range bounds
  come from a driver-side sample of composite keys (bounded: ≤ 9 keys
  per input block — the same quantile-sampling Ray's own sort planner
  uses); phase 1 reduces each range bucket to its row count (P tiny
  rows → exclusive bases), phase 2 sorts each bucket locally and adds
  its base.  Global ranks are invariant to the sampled bounds, so skewed
  samples cost balance, never correctness.  Only ``(key_prefix + url)``
  composites travel — never text.
- **window pairs by block arithmetic**: ranks are dense, so rows
  ``rank//w`` and ``rank//w + 1`` see every in-window partner; each
  unordered pair is emitted in exactly one block (the larger rank's),
  giving the exact ``(w-1)·n`` candidate multiset with no dedup pass.
- **verify**: the shared exact-Jaccard partitioned join; shingle blobs
  cross the object store once.

The composite sort key is ``key || chr(0) || url`` — chr(0) sorts below
every text character, so composite string order equals (key, url) tuple
order even when one key is a prefix of another.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from data_dedup_ray.corpus import web_pages
from data_dedup_ray.engine.exchange import bucketize, hash_exchange

_SEP = "\x00"


def _rank_rows(pages: ray.data.Dataset, *, key_len: int,
               num_partitions: int, key: str = "prefix") -> ray.data.Dataset:
    """``(url, rank)`` — dense global 0-based rank of every page in
    ``(key(text), url)`` order, via sampled range bounds + the two-phase
    ordered-prefix-sum (no global sort).  ``key``: "prefix" = first
    ``key_len`` chars, "suffix" = last ``key_len`` chars (the classic
    second multi-pass key: orders by how documents END, catching
    shared-ending duplicates a prefix key scatters)."""
    P = num_partitions

    def keyed(t: pa.Table) -> pa.Table:
        s = t["text"].to_pandas()
        txt = (s.str.slice(0, key_len) if key == "prefix"
               else s.str.slice(-key_len))
        # join on the Arrow side: pandas' object-Series `+ "\x00"` goes
        # through numpy '<U' scalar promotion, which TRUNCATES the NUL
        # (fixed-width U-strings cannot represent trailing NULs) — the
        # separator would silently vanish.  Arrow strings carry it fine,
        # and every later comparison (np.sort / searchsorted / pandas
        # sort_values on object arrays) is Python-str codepoint order,
        # which equals DuckDB's UTF-8 binary order.
        url = t["url"].combine_chunks()
        comp = pc.binary_join_element_wise(
            pa.array(txt, pa.string()), url, _SEP)
        return pa.table({"comp": comp, "url": url})

    comp_rows = pages.select_columns(["url", "text"]).map_batches(
        keyed, batch_format="pyarrow").materialize()
    return rank_by_composite(comp_rows, num_partitions=P)


def rank_by_composite(comp_rows: ray.data.Dataset, *,
                      num_partitions: int) -> ray.data.Dataset:
    """``(url, rank)`` — dense global 0-based ranks of a materialized
    ``(comp, url)`` table in composite-string order (sampled range
    bounds + two-phase ordered prefix sum; shared by the SNM windows
    and the similarity-layout operator)."""
    P = num_partitions
    # driver-side range bounds: ≤ 9 evenly-spaced composites per block.
    # Ranks are a pure function of the global (key, url) order, so the
    # bounds affect only balance — never the output (pinned by the
    # partition-invariance test).
    def sample(t: pa.Table) -> pa.Table:
        c = np.sort(t["comp"].to_numpy(zero_copy_only=False))
        idx = np.unique(np.linspace(0, len(c) - 1, num=9).astype(np.int64)) \
            if len(c) else np.empty(0, np.int64)
        return pa.table({"comp": pa.array(c[idx], pa.string())})

    samp = np.sort(
        comp_rows.map_batches(sample, batch_format="pyarrow")
        .to_pandas()["comp"].to_numpy(dtype=object))
    if len(samp) >= P:
        bounds = samp[np.linspace(0, len(samp) - 1, num=P + 1)
                      .astype(np.int64)][1:-1]
    else:
        bounds = samp[:0]

    def with_part(t: pa.Table) -> pa.Table:
        comp = t["comp"].to_numpy(zero_copy_only=False)
        part = np.searchsorted(bounds, comp, side="right").astype(np.int64)
        return t.append_column("_part", pa.array(part))

    in_schema = pa.schema([("comp", pa.string()), ("url", pa.string())])
    buckets = bucketize(
        comp_rows.map_batches(with_part, batch_format="pyarrow"),
        num_partitions=P, in_schema=in_schema)

    def bucket_count(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"part": pd.Series(dtype=np.int64),
                                 "n": pd.Series(dtype=np.int64)})
        p = int(np.searchsorted(bounds, df["comp"].iloc[0], side="right"))
        return pd.DataFrame({"part": [p], "n": [len(df)]})

    totals = hash_exchange(
        [buckets], bucket_count, num_partitions=P,
        schema=pa.schema([("part", pa.int64()), ("n", pa.int64())]),
        in_schemas=[in_schema],
    ).to_pandas()
    counts = np.zeros(P, dtype=np.int64)
    for _, r in totals.iterrows():
        counts[int(r["part"])] = int(r["n"])
    base = np.concatenate([[0], np.cumsum(counts)[:-1]])

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"url": pd.Series(dtype=object),
                                 "rank": pd.Series(dtype=np.int64)})
        p = int(np.searchsorted(bounds, df["comp"].iloc[0], side="right"))
        df = df.sort_values("comp", kind="stable")
        return pd.DataFrame({
            "url": df["url"].to_numpy(),
            "rank": base[p] + np.arange(len(df), dtype=np.int64),
        })

    return hash_exchange(
        [buckets], rank, num_partitions=P,
        schema=pa.schema([("url", pa.string()), ("rank", pa.int64())]),
        in_schemas=[in_schema],
    )


def _window_candidates(ranked: ray.data.Dataset, *, window: int,
                       num_partitions: int) -> ray.data.Dataset:
    """Exact ``0 < rank_b - rank_a < window`` pairs from dense ranks —
    each row goes to blocks ``rank//w`` and ``rank//w + 1``; a pair is
    emitted only in the LARGER rank's block, so no dedup pass."""
    w = window
    P = num_partitions

    def emit(t: pa.Table) -> pa.Table:
        r = t["rank"].to_numpy(zero_copy_only=False)
        u = t["url"].to_numpy(zero_copy_only=False)
        g = r // w
        return pa.table({
            "url": pa.array(np.concatenate([u, u]), pa.string()),
            "rank": pa.array(np.concatenate([r, r])),
            "_part": pa.array(
                (np.concatenate([g, g + 1]) % P).astype(np.int64)),
            "blk": pa.array(np.concatenate([g, g + 1])),
        })

    empty = pd.DataFrame({"url_a": pd.Series(dtype=object),
                          "url_b": pd.Series(dtype=object)})

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, grp in df.groupby("blk", sort=False):
            grp = grp.sort_values("rank", kind="stable")
            r = grp["rank"].to_numpy()
            u = grp["url"].to_numpy()
            blk = int(grp["blk"].iloc[0])
            # positions are rank-dense within the block's covered range
            lo = r.min()
            own = (r // w) == blk            # pair owner = larger rank
            j = np.nonzero(own)[0]
            start = np.maximum(r[j] - w + 1, lo) - lo
            cnt = (r[j] - lo) - start
            if not cnt.sum():
                continue
            jj = np.repeat(j, cnt)
            ii = (np.arange(len(jj))
                  - np.repeat(np.cumsum(cnt) - cnt, cnt)
                  + np.repeat(start, cnt))
            a, b = u[ii], u[jj]
            sw = a > b
            out.append(pd.DataFrame({
                "url_a": np.where(sw, b, a), "url_b": np.where(sw, a, b)}))
        return pd.concat(out, ignore_index=True) if out else empty

    return hash_exchange(
        [ranked.map_batches(emit, batch_format="pyarrow")],
        pairs, num_partitions=P,
        schema=pa.schema([("url_a", pa.string()), ("url_b", pa.string())]),
        in_schemas=[pa.schema([("url", pa.string()), ("rank", pa.int64()),
                               ("blk", pa.int64())])],
    )


def sorted_neighborhood_pairs(
    sf_dir: str, *, window: int = 10, key_len: int = 24,
    shingle_k: int = 5, threshold: float = 0.5, num_partitions: int = 16,
) -> ray.data.Dataset:
    """``(url_a, url_b, jaccard)`` for every pair within ``window``
    consecutive positions of the ``(text-prefix, url)`` order whose exact
    k-shingle Jaccard ≥ ``threshold``."""
    from data_dedup_ray.pipelines.near import verify_pairs_partitioned
    pages = web_pages(sf_dir)
    ranked = _rank_rows(pages, key_len=key_len,
                        num_partitions=num_partitions)
    cand = _window_candidates(ranked, window=window,
                              num_partitions=num_partitions)
    return verify_pairs_partitioned(
        pages, cand, shingle_k=shingle_k, threshold=threshold,
        num_partitions=num_partitions,
    ).sort(["url_a", "url_b"])


def snm_multipass_pairs(
    sf_dir: str, *, window: int = 10, key_len: int = 24,
    shingle_k: int = 5, threshold: float = 0.5, num_partitions: int = 16,
) -> ray.data.Dataset:
    """Multi-pass sorted-neighborhood (the production SNM shape —
    Hernández & Stolfo §4.2: several cheap passes under DIFFERENT keys
    beat one pass with a huge window): candidates = union of the
    text-prefix-order and text-suffix-order windows, verified once.
    The union is free of a dedup pass — verify round A's group_by
    already collapses repeated candidates (near.py:_join_a)."""
    from data_dedup_ray.pipelines.near import verify_pairs_partitioned
    pages = web_pages(sf_dir)
    cands = [
        _window_candidates(
            _rank_rows(pages, key_len=key_len,
                       num_partitions=num_partitions, key=key),
            window=window, num_partitions=num_partitions)
        for key in ("prefix", "suffix")
    ]
    return verify_pairs_partitioned(
        pages, cands[0].union(cands[1]), shingle_k=shingle_k,
        threshold=threshold, num_partitions=num_partitions,
    ).sort(["url_a", "url_b"])


def snm_clusters(
    sf_dir: str, *, window: int = 10, key_len: int = 24,
    shingle_k: int = 5, threshold: float = 0.5,
    num_partitions: int = 16, dsu_max_edges: int = 20_000_000,
) -> ray.data.Dataset:
    """Connected components over the multi-pass SNM pair graph —
    ``(url, cluster_id)`` with min-member labels for every page
    (near_dup_clusters' shape under the windowed blocking paradigm);
    count-gated DSU with the distributed label-propagation fallback."""
    from data_dedup_ray.pipelines.components import (attach_clusters,
                                                     dsu_components,
                                                     label_propagation)
    pages = web_pages(sf_dir).select_columns(["url"])
    edges = snm_multipass_pairs(
        sf_dir, window=window, key_len=key_len, shingle_k=shingle_k,
        threshold=threshold, num_partitions=num_partitions
    ).materialize()
    if edges.count() > dsu_max_edges:
        return label_propagation(
            pages, edges.select_columns(["url_a", "url_b"]),
            node_col="url")
    assignment = dsu_components(edges.to_pandas())
    return attach_clusters(pages, assignment, id_col="url")


def snm_clusters_sql(*, window: int = 10, key_len: int = 24,
                     threshold: float = 0.5) -> str:
    """Transitive closure over the multi-pass SNM pair set; singleton
    pages keep their own url (near_dup_clusters_sql's shape)."""
    pairs = snm_multipass_pairs_sql(window=window, key_len=key_len,
                                    threshold=threshold)
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


def snm_window_recall(
    sf_dir: str, *, windows: tuple = (2, 5, 10, 25), key_len: int = 24,
    shingle_k: int = 5, threshold: float = 0.5, num_partitions: int = 16,
) -> ray.data.Dataset:
    """``(win, n_truth, n_found, recall_bp)`` — the window-size planning
    curve: what fraction of the EXACT Jaccard-≥t pair set a single-pass
    sorted neighborhood of width ``win`` captures.  The blocking-tier
    eval sibling of lsh_config_recall / shingle_k_sweep.

    SNM + exact verify finds exactly the truth pairs whose rank distance
    is < win, so no per-window re-run is needed: attach ranks to the
    truth pairs once (two skinny url-keyed exchanges), then the curve is
    a cumulative histogram of rank gaps — integer-exact recall_bp =
    (n_found·10⁴) // n_truth."""
    from data_dedup_ray.pipelines.near import (_hash_str_column,
                                               ngram_jaccard_pairs)
    P = num_partitions
    pages = web_pages(sf_dir)
    truth = ngram_jaccard_pairs(pages, shingle_k=shingle_k,
                                threshold=threshold, num_partitions=P)
    ranked = _rank_rows(pages, key_len=key_len, num_partitions=P)

    def with_part(col):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t.append_column("_part",
                                       pa.array([], type=pa.int64()))
            h = _hash_str_column(t[col])
            return t.append_column(
                "_part", pa.array((h % np.uint64(P)).astype(np.int64)))
        return fn

    def join_a(pt: pd.DataFrame, rk: pd.DataFrame) -> pd.DataFrame:
        return pt[["url_a", "url_b"]].merge(
            rk.rename(columns={"url": "url_a", "rank": "ra"}), on="url_a")

    step_a = hash_exchange(
        [truth.map_batches(with_part("url_a"), batch_format="pyarrow"),
         ranked.map_batches(with_part("url"), batch_format="pyarrow")],
        join_a, num_partitions=P,
        schema=pa.schema([("url_a", pa.string()), ("url_b", pa.string()),
                          ("ra", pa.int64())]),
        in_schemas=[pa.schema([("url_a", pa.string()),
                               ("url_b", pa.string()),
                               ("jaccard", pa.float64())]),
                    pa.schema([("url", pa.string()),
                               ("rank", pa.int64())])],
    )

    def join_b(pt: pd.DataFrame, rk: pd.DataFrame) -> pd.DataFrame:
        m = pt.merge(rk.rename(columns={"url": "url_b", "rank": "rb"}),
                     on="url_b")
        return pd.DataFrame({
            "diff": np.abs(m["ra"].to_numpy() - m["rb"].to_numpy())})

    gaps = hash_exchange(
        [step_a.map_batches(with_part("url_b"), batch_format="pyarrow"),
         ranked.map_batches(with_part("url"), batch_format="pyarrow")],
        join_b, num_partitions=P,
        schema=pa.schema([("diff", pa.int64())]),
        in_schemas=[pa.schema([("url_a", pa.string()),
                               ("url_b", pa.string()),
                               ("ra", pa.int64())]),
                    pa.schema([("url", pa.string()),
                               ("rank", pa.int64())])],
    )

    # bounded partials: one (len(windows)+1)-vector per batch
    ws = sorted(windows)

    def partial(t: pa.Table) -> pa.Table:
        d = t["diff"].to_numpy(zero_copy_only=False)
        return pa.table({
            "win": pa.array(list(ws) + [-1], pa.int64()),
            "n": pa.array([int((d < w).sum()) for w in ws] + [len(d)],
                          pa.int64()),
        })

    pdf = gaps.map_batches(partial, batch_format="pyarrow").to_pandas()
    if len(pdf):
        agg = pdf.groupby("win", as_index=False)["n"].sum()
        total = int(agg.loc[agg["win"] == -1, "n"].sum())
        found = {int(r["win"]): int(r["n"]) for _, r in agg.iterrows()}
    else:
        # empty truth pair set → zero gap rows, zero partial batches:
        # still one row per window (n_found = 0, recall_bp = 0), the
        # same shape the SQL twin's wins-driven query emits
        total, found = 0, {}
    out = pd.DataFrame({
        "win": np.array(ws, np.int64),
        "n_truth": np.full(len(ws), total, np.int64),
        "n_found": np.array([found.get(w, 0) for w in ws], np.int64),
        "recall_bp": np.array(
            [(found.get(w, 0) * 10000) // total if total else 0
             for w in ws], np.int64),
    })
    return ray.data.from_pandas(out)


def snm_window_recall_sql(
    *, windows: tuple = (2, 5, 10, 25), key_len: int = 24,
    threshold: float = 0.5,
) -> str:
    from data_dedup_ray.corpus import WEB_PAGES_CTE
    from data_dedup_ray.oracles import _SHINGLE_CTES
    ws = ", ".join(str(w) for w in sorted(windows))
    return (
        f"WITH {WEB_PAGES_CTE},{_SHINGLE_CTES},\n"
        "ranked AS (SELECT url, row_number() OVER ("
        f"ORDER BY substr(text, 1, {key_len}), url) - 1 AS r"
        " FROM web_pages),\n"
        f"t AS (SELECT url_a, url_b FROM jac WHERE j >= {threshold}),\n"
        "d AS (SELECT abs(a.r - b.r) AS diff FROM t"
        " JOIN ranked a ON a.url = t.url_a"
        " JOIN ranked b ON b.url = t.url_b),\n"
        f"wins AS (SELECT unnest([{ws}]) AS win)\n"
        # wins drives (correlated scalar counts, not CROSS JOIN d): on a
        # corpus with an empty truth pair set, d has no rows and a join
        # would emit nothing, while the Ray side still reports one row
        # per window with n_found = 0 / recall_bp = 0.
        "SELECT win, (SELECT count(*) FROM t) AS n_truth,\n"
        "       (SELECT count(*) FROM d WHERE d.diff < win) AS n_found,\n"
        "       CAST(((SELECT count(*) FROM d WHERE d.diff < win)"
        " * 10000) // greatest((SELECT count(*) FROM t), 1)"
        " AS BIGINT) AS recall_bp\n"
        "FROM wins ORDER BY win"
    )


def sorted_neighborhood_pairs_sql(
    *, window: int = 10, key_len: int = 24, threshold: float = 0.5,
) -> str:
    """Exact twin: row_number window + the shared exact-Jaccard CTEs."""
    from data_dedup_ray.corpus import WEB_PAGES_CTE
    from data_dedup_ray.oracles import _SHINGLE_CTES
    return (
        f"WITH {WEB_PAGES_CTE},{_SHINGLE_CTES},\n"
        "ranked AS (SELECT url, row_number() OVER ("
        f"ORDER BY substr(text, 1, {key_len}), url) - 1 AS r"
        " FROM web_pages),\n"
        "cand AS (SELECT least(a.url, b.url) AS ua,"
        " greatest(a.url, b.url) AS ub FROM ranked a JOIN ranked b"
        f" ON b.r > a.r AND b.r - a.r < {window})\n"
        "SELECT c.ua AS url_a, c.ub AS url_b,"
        " CAST(floor(j.j * 10000) AS BIGINT) AS jaccard_bp\n"
        "FROM cand c JOIN jac j ON j.url_a = c.ua AND j.url_b = c.ub\n"
        f"WHERE j.j >= {threshold}\n"
        "ORDER BY url_a, url_b"
    )


def snm_multipass_pairs_sql(
    *, window: int = 10, key_len: int = 24, threshold: float = 0.5,
) -> str:
    """Twin of the two-pass union: prefix-order ∪ suffix-order windows."""
    from data_dedup_ray.corpus import WEB_PAGES_CTE
    from data_dedup_ray.oracles import _SHINGLE_CTES
    return (
        f"WITH {WEB_PAGES_CTE},{_SHINGLE_CTES},\n"
        "r1 AS (SELECT url, row_number() OVER ("
        f"ORDER BY substr(text, 1, {key_len}), url) - 1 AS r"
        " FROM web_pages),\n"
        "r2 AS (SELECT url, row_number() OVER ("
        f"ORDER BY substr(text, greatest(1, len(text) - {key_len} + 1)),"
        " url) - 1 AS r FROM web_pages),\n"
        "cand AS (SELECT least(a.url, b.url) AS ua,"
        " greatest(a.url, b.url) AS ub FROM r1 a JOIN r1 b"
        f" ON b.r > a.r AND b.r - a.r < {window}"
        " UNION SELECT least(a.url, b.url), greatest(a.url, b.url)"
        f" FROM r2 a JOIN r2 b ON b.r > a.r AND b.r - a.r < {window})\n"
        "SELECT c.ua AS url_a, c.ub AS url_b,"
        " CAST(floor(j.j * 10000) AS BIGINT) AS jaccard_bp\n"
        "FROM cand c JOIN jac j ON j.url_a = c.ua AND j.url_b = c.ub\n"
        f"WHERE j.j >= {threshold}\n"
        "ORDER BY url_a, url_b"
    )
