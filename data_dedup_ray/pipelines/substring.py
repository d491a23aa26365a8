"""Substring (long-span) duplication pipelines — SURVEY.md §7 M5.

The reference has no substring operator (SURVEY.md §2.6); the north_star
mandates "suffix-array-based substring dedup".  See stages/substring.py
for why fixed-minimum-length window grouping is the Ray-Data-native
equivalent of the suffix-array formulation.

Shuffle plan: window rows ``(url, whash)`` are tiny and fixed-width; they
shuffle ONCE on ``hash(whash) % P`` (coarse partitions — same co-location
guarantee as exact keys with none of the per-group overhead), where a
vectorized pandas pass finds hashes spanning ≥2 distinct documents.
Per-document rollups shuffle the (much smaller) hit set on
``hash(url) % P``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from data_dedup_ray.stages.substring import window_hash_rows, winnowed_rows


def _coarse_apply(ds: ray.data.Dataset, col: str, num_partitions: int,
                  fn, schema: pa.Schema,
                  in_schema: pa.Schema) -> ray.data.Dataset:
    """Bucket rows on ``hash(col) % P`` and apply ``fn`` per bucket —
    the sortless exchange (engine/exchange.py): equal keys co-locate
    without ordering anything."""
    from data_dedup_ray.engine.exchange import hash_exchange

    def add_part(b: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(b[col], index=False).to_numpy()
        b = b.copy()
        b["_part"] = (h % np.uint64(num_partitions)).astype(np.int64)
        return b

    return hash_exchange(
        [ds.map_batches(add_part, batch_format="pandas")],
        fn,
        num_partitions=num_partitions,
        schema=schema,
        in_schemas=[in_schema],
    )


def _dup_hits(g: pd.DataFrame, id_col: str) -> pd.DataFrame:
    """Rows of window-hash groups spanning ≥2 distinct docs (vectorized)."""
    nun = g.groupby("whash", sort=False)[id_col].transform("nunique")
    return g[nun > 1]


def substring_dup_docs(
    ds: ray.data.Dataset,
    *,
    min_tokens: int = 50,
    mode: str = "winnowed",
    winnow_w: int = 8,
    id_col: str = "url",
    text_col: str = "text",
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """``(url, n_dup_windows)`` — windows whose ``min_tokens``-token text
    occurs in at least one other document.

    ``mode="winnowed"`` (the DEFAULT — the 100 TB path): counts duplicated
    WINNOWED fingerprints (~1/winnow_w of the exact row volume; a shared
    span of ``min_tokens + winnow_w − 1`` tokens is always detected).
    ``mode="exact"`` is the oracle-parity flag: every window POSITION
    counted, group structure fully reproducible in SQL
    (``oracles.substring_dup_sql``)."""
    if mode == "exact":
        rows = ds.map_batches(
            window_hash_rows,
            fn_kwargs=dict(min_tokens=min_tokens, id_col=id_col,
                           text_col=text_col),
            batch_format="pyarrow",
            batch_size=512,
        )
    elif mode == "winnowed":
        rows = ds.map_batches(
            winnowed_rows,
            fn_kwargs=dict(min_tokens=min_tokens, winnow_w=winnow_w,
                           id_col=id_col, text_col=text_col),
            batch_format="pyarrow",
            batch_size=512,
        ).map_batches(
            lambda t: t.select([id_col, "whash"]), batch_format="pyarrow",
        )
    else:
        raise ValueError(f"unknown mode {mode!r}: use 'winnowed' | 'exact'")
    row_schema = pa.schema([(id_col, pa.string()), ("whash", pa.int64())])
    hits = _coarse_apply(
        rows, "whash", num_partitions,
        lambda g: _dup_hits(g, id_col)[[id_col]],
        schema=pa.schema([(id_col, pa.string())]),
        in_schema=row_schema,
    )
    return _coarse_apply(
        hits, id_col, num_partitions,
        lambda g: g.groupby(id_col, sort=False)
        .size()
        .rename("n_dup_windows")
        .reset_index(),
        schema=pa.schema([(id_col, pa.string()),
                          ("n_dup_windows", pa.int64())]),
        in_schema=pa.schema([(id_col, pa.string())]),
    )


def dup_span_fingerprints(
    ds: ray.data.Dataset,
    *,
    min_tokens: int = 50,
    winnow_w: int = 8,
    id_col: str = "url",
    text_col: str = "text",
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """``(url, pos, whash, n_docs)`` — winnowed fingerprints shared by ≥2
    docs: the scale path (≈1/winnow_w of the exact row volume; any shared
    span of ``min_tokens + winnow_w − 1`` tokens is still guaranteed a
    hit).  ``pos`` is the window's token offset within its document."""
    rows = ds.map_batches(
        winnowed_rows,
        fn_kwargs=dict(min_tokens=min_tokens, winnow_w=winnow_w,
                       id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
        batch_size=512,
    )

    def hits(g: pd.DataFrame) -> pd.DataFrame:
        gb = g.groupby("whash", sort=False)[id_col]
        nun = gb.transform("nunique")
        out = g[nun > 1].copy()
        out["n_docs"] = nun[nun > 1].astype(np.int64)
        return out[[id_col, "pos", "whash", "n_docs"]]

    return _coarse_apply(
        rows, "whash", num_partitions, hits,
        schema=pa.schema([(id_col, pa.string()), ("pos", pa.int32()),
                          ("whash", pa.int64()), ("n_docs", pa.int64())]),
        in_schema=pa.schema([(id_col, pa.string()), ("whash", pa.int64()),
                             ("pos", pa.int32())]),
    )


def substring_clusters(
    ds: ray.data.Dataset,
    *,
    min_tokens: int = 50,
    winnow_w: int = 8,
    mode: str = "winnowed",
    id_col: str = "url",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Docs labeled by shared-span component: two docs connect iff they
    share a duplicated window fingerprint.  Star edges per fingerprint
    (min url ↔ others) keep edge volume linear in the hit count.

    ``mode="winnowed"`` (default, the scale path) connects on winnowed
    selections; ``mode="exact"`` connects on EVERY duplicated window
    position — the oracle-parity flag whose closure DuckDB restates
    verbatim (``substring_exact_clusters_sql``)."""
    from data_dedup_ray.pipelines.components import (attach_clusters,
                                                     dsu_components)

    if mode == "exact":
        rows = ds.map_batches(
            window_hash_rows,
            fn_kwargs=dict(min_tokens=min_tokens, id_col=id_col,
                           text_col=text_col),
            batch_format="pyarrow", batch_size=512,
        )

        def hits(g: pd.DataFrame) -> pd.DataFrame:
            out = _dup_hits(g, id_col)[[id_col, "whash"]].copy()
            out["pos"] = np.int32(0)
            out["n_docs"] = np.int64(0)
            return out[[id_col, "pos", "whash", "n_docs"]]

        fp = _coarse_apply(
            rows, "whash", 64, hits,
            schema=pa.schema([(id_col, pa.string()), ("pos", pa.int32()),
                              ("whash", pa.int64()),
                              ("n_docs", pa.int64())]),
            in_schema=pa.schema([(id_col, pa.string()),
                                 ("whash", pa.int64())]),
        )
    elif mode == "winnowed":
        fp = dup_span_fingerprints(
            ds, min_tokens=min_tokens, winnow_w=winnow_w,
            id_col=id_col, text_col=text_col,
        )
    else:
        raise ValueError(f"unknown mode {mode!r}: use 'winnowed' | 'exact'")

    def star(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["whash", id_col]).sort_values(
            ["whash", id_col], kind="stable"
        )
        first = g.groupby("whash", sort=False)[id_col].transform("first")
        rest = g[g[id_col] != first]
        return pd.DataFrame(
            {"url_a": first[g[id_col] != first].to_numpy(dtype=object),
             "url_b": rest[id_col].to_numpy(dtype=object)}
        )

    edges = _coarse_apply(
        fp, "whash", 64, star,
        schema=pa.schema([("url_a", pa.string()), ("url_b", pa.string())]),
        in_schema=pa.schema([(id_col, pa.string()), ("pos", pa.int32()),
                             ("whash", pa.int64()), ("n_docs", pa.int64())]),
    ).to_pandas()
    assignment = dsu_components(edges)
    return attach_clusters(ds.select_columns([id_col]), assignment,
                           id_col=id_col)


def _token_rows(ds: ray.data.Dataset, *, id_col: str, text_col: str
                ) -> ray.data.Dataset:
    """``(url, tok:binary)`` — the doc's token-hash stream as an int64
    blob (order-preserving, unlike shingle SETS; 64-bit ids make token
    equality exact up to hash collisions, the standard trade)."""
    from data_dedup_ray.stages.minhash import tokenize_batch

    def fn(b: pa.Table) -> pa.Table:
        hashes, counts = tokenize_batch(b[text_col])
        offs = np.zeros(len(counts) + 1, dtype=np.int64)
        np.cumsum(counts, out=offs[1:])
        blobs = [hashes[offs[i]: offs[i + 1]].astype(np.int64).tobytes()
                 for i in range(len(counts))]
        return pa.table({id_col: b[id_col].combine_chunks(),
                         "tok": pa.array(blobs, type=pa.large_binary())})

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=512)


def longest_dup_spans(
    ds: ray.data.Dataset,
    *,
    min_tokens: int = 50,
    winnow_w: int = 8,
    id_col: str = "url",
    text_col: str = "text",
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """``(url_a, url_b, span_tokens, start_a, start_b)`` — the EXACT
    longest common token span per candidate pair, via a generalized
    suffix array (stages/suffixarray.py).

    Discovery stays hash-based (winnowed fingerprints → star edges);
    the suffix array runs only per candidate pair, distributed through
    the same two-round co-partitioned join as the Jaccard verify."""
    from data_dedup_ray.engine.exchange import hash_exchange
    from data_dedup_ray.pipelines.components import dsu_components  # noqa: F401
    from data_dedup_ray.stages.suffixarray import longest_common_span

    fp = dup_span_fingerprints(
        ds, min_tokens=min_tokens, winnow_w=winnow_w,
        id_col=id_col, text_col=text_col,
    )

    def star(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["whash", id_col]).sort_values(
            ["whash", id_col], kind="stable"
        )
        first = g.groupby("whash", sort=False)[id_col].transform("first")
        rest = g[g[id_col] != first]
        out = pd.DataFrame(
            {"url_a": first[g[id_col] != first].to_numpy(dtype=object),
             "url_b": rest[id_col].to_numpy(dtype=object)}
        )
        return out.drop_duplicates(["url_a", "url_b"])

    edges = _coarse_apply(
        fp, "whash", num_partitions, star,
        schema=pa.schema([("url_a", pa.string()), ("url_b", pa.string())]),
        in_schema=pa.schema([(id_col, pa.string()), ("pos", pa.int32()),
                             ("whash", pa.int64()), ("n_docs", pa.int64())]),
    )
    tok = _token_rows(ds, id_col=id_col, text_col=text_col).materialize()

    def tag(col):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            h = pd.util.hash_pandas_object(b[col], index=False).to_numpy()
            b = b.copy()
            b["_part"] = (h % np.uint64(num_partitions)).astype(np.int64)
            return b
        return fn

    tok_schema = pa.schema([(id_col, pa.string()),
                            ("tok", pa.large_binary())])
    pair_schema = pa.schema([("url_a", pa.string()), ("url_b", pa.string())])

    def join_a(pg: pd.DataFrame, tg: pd.DataFrame) -> pd.DataFrame:
        pg = pg.drop_duplicates(["url_a", "url_b"])
        m = pg.merge(tg, left_on="url_a", right_on=id_col, how="inner")
        return pd.DataFrame({"url_a": m["url_a"], "url_b": m["url_b"],
                             "tok_a": m["tok"]})

    step_a = hash_exchange(
        [edges.map_batches(tag("url_a"), batch_format="pandas"),
         tok.map_batches(tag(id_col), batch_format="pandas")],
        join_a,
        num_partitions=num_partitions,
        schema=pa.schema([("url_a", pa.string()), ("url_b", pa.string()),
                          ("tok_a", pa.large_binary())]),
        in_schemas=[pair_schema, tok_schema],
    )

    def join_b(pg: pd.DataFrame, tg: pd.DataFrame) -> pd.DataFrame:
        m = pg.merge(tg, left_on="url_b", right_on=id_col, how="inner")
        ln, sa_, sb_ = [], [], []
        for ba, bb in zip(m["tok_a"], m["tok"]):
            ta = np.frombuffer(ba, dtype=np.int64)
            tb = np.frombuffer(bb, dtype=np.int64)
            L, a0, b0 = longest_common_span(ta, tb)
            ln.append(L)
            sa_.append(a0)
            sb_.append(b0)
        return pd.DataFrame({
            "url_a": m["url_a"], "url_b": m["url_b"],
            "span_tokens": pd.Series(ln, dtype=np.int64),
            "start_a": pd.Series(sa_, dtype=np.int64),
            "start_b": pd.Series(sb_, dtype=np.int64),
        })

    return hash_exchange(
        [step_a.map_batches(tag("url_b"), batch_format="pandas"),
         tok.map_batches(tag(id_col), batch_format="pandas")],
        join_b,
        num_partitions=num_partitions,
        schema=pa.schema([("url_a", pa.string()), ("url_b", pa.string()),
                          ("span_tokens", pa.int64()),
                          ("start_a", pa.int64()), ("start_b", pa.int64())]),
        in_schemas=[pa.schema([("url_a", pa.string()),
                               ("url_b", pa.string()),
                               ("tok_a", pa.large_binary())]), tok_schema],
    )


def substring_exact_clusters_sql(min_tokens: int = 50) -> str:
    """DuckDB twin of ``substring_clusters(mode="exact")``: recursive
    closure over "docs sharing any duplicated ``min_tokens``-token
    window" (the md5 window identity of ``oracles.substring_dup_sql``),
    min-member labels, windowless/unshared docs as singletons."""
    from data_dedup_ray.corpus import WEB_PAGES_CTE

    L = int(min_tokens)
    return (
        f"WITH RECURSIVE {WEB_PAGES_CTE},\n"
        "toks AS (SELECT url, regexp_extract_all(text, '[a-z0-9]+') AS t"
        " FROM web_pages),\n"
        f"win AS (SELECT url, md5(array_to_string(t[i:i+{L - 1}], ' '))"
        " AS h\n"
        f"  FROM toks, UNNEST(generate_series(1, len(t) - {L - 1}))"
        " AS g(i)\n"
        f"  WHERE len(t) >= {L}),\n"
        "dup AS (SELECT h FROM win GROUP BY h"
        " HAVING count(DISTINCT url) > 1),\n"
        "e0 AS (SELECT DISTINCT url, h FROM win"
        " WHERE h IN (SELECT h FROM dup)),\n"
        "ep AS (SELECT a.url AS ua, b.url AS ub\n"
        "       FROM e0 a JOIN e0 b USING (h) WHERE a.url < b.url),\n"
        "edges AS (SELECT ua AS a, ub AS b FROM ep"
        " UNION SELECT ub, ua FROM ep),\n"
        "reach(a, b) AS (SELECT a, b FROM edges"
        " UNION SELECT r.a, e.b FROM reach r JOIN edges e"
        " ON r.b = e.a),\n"
        "comp AS (SELECT a AS url, least(a, min(b)) AS cluster_id"
        " FROM reach GROUP BY a)\n"
        "SELECT w.url, coalesce(c.cluster_id, w.url) AS cluster_id"
        " FROM web_pages w LEFT JOIN comp c ON c.url = w.url"
    )


def _window_pos_rows(batch: pa.Table, *, min_tokens: int,
                     id_col: str, text_col: str) -> pa.Table:
    """``(url, whash, pos)`` — every window position with its 0-based
    in-doc offset, computed IN the stage that holds the whole doc in
    one input row (per-doc positions must never be reconstructed from
    a re-batchable row stream)."""
    from data_dedup_ray.stages.substring import _rolling_window_hashes

    ids = batch[id_col].to_pylist()
    win, counts = _rolling_window_hashes(batch[text_col], min_tokens)
    nw = np.maximum(counts - min_tokens + 1, 0)
    tok_off = np.concatenate([[0], np.cumsum(counts)])[:-1]
    doc_of = np.repeat(np.arange(len(ids)), nw)
    pos = (np.arange(int(nw.sum()))
           - np.repeat(np.cumsum(nw) - nw, nw))
    idx = pos + tok_off[doc_of]
    return pa.table({
        id_col: pa.array(np.asarray(ids, dtype=object)[doc_of],
                         type=pa.string()),
        "whash": pa.array(win[idx].view(np.int64)),
        "pos": pa.array(pos.astype(np.int32)),
    })


def _exact_hit_rows(ds, *, min_tokens: int, id_col: str, text_col: str,
                    num_partitions: int = 64) -> ray.data.Dataset:
    """``(url, pos, whash)`` for every duplicated EXACT window position
    (windows whose text occurs in ≥2 docs)."""
    rows = ds.map_batches(
        _window_pos_rows,
        fn_kwargs=dict(min_tokens=min_tokens, id_col=id_col,
                       text_col=text_col),
        batch_format="pyarrow", batch_size=512,
    )

    def hits(g: pd.DataFrame) -> pd.DataFrame:
        nun = g.groupby("whash", sort=False)[id_col].transform("nunique")
        return g.loc[nun > 1, [id_col, "pos", "whash"]]

    return _coarse_apply(
        rows, "whash", num_partitions, hits,
        schema=pa.schema([(id_col, pa.string()), ("pos", pa.int32()),
                          ("whash", pa.int64())]),
        in_schema=pa.schema([(id_col, pa.string()),
                             ("whash", pa.int64()),
                             ("pos", pa.int32())]),
    )


def longest_dup_spans_exact(
    ds: ray.data.Dataset,
    *,
    min_tokens: int = 50,
    id_col: str = "url",
    text_col: str = "text",
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """``(url_a, url_b, span_tokens, start_a, start_b)`` — the exact
    longest common token span per candidate pair via DIAGONAL RUNS of
    shared exact windows: a common span of S ≥ min_tokens tokens is
    exactly a run of ``S − min_tokens + 1`` consecutive shared windows
    at a fixed alignment, so ``span = max_run + min_tokens − 1`` — no
    suffix array, and the tie rule is the clean GLOBAL minimum
    (span desc, start_a asc, start_b asc), which DuckDB restates
    verbatim (``longest_dup_spans_sql``).  The suffix-array path
    (``longest_dup_spans``) stays the production variant for winnowed
    discovery; its adjacent-candidate tie selection is
    suffix-order-dependent and intentionally not the oracle target.

    Candidates = the exact-window star pair set (min-url ↔ others per
    duplicated window, the ``substring_clusters`` edge rule); every
    shared window of a candidate pair is itself duplicated, so the hit
    rows carry ALL evidence the runs need."""
    from data_dedup_ray.engine.exchange import hash_exchange

    P = num_partitions
    L = min_tokens
    hits = _exact_hit_rows(ds, min_tokens=min_tokens, id_col=id_col,
                           text_col=text_col,
                           num_partitions=P).materialize()

    def star(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["whash", id_col]).sort_values(
            ["whash", id_col], kind="stable")
        first = g.groupby("whash", sort=False)[id_col].transform("first")
        rest = g[g[id_col] != first]
        return pd.DataFrame(
            {"url_a": first[g[id_col] != first].to_numpy(dtype=object),
             "url_b": rest[id_col].to_numpy(dtype=object)}
        ).drop_duplicates()

    edges = _coarse_apply(
        hits, "whash", P, star,
        schema=pa.schema([("url_a", pa.string()),
                          ("url_b", pa.string())]),
        in_schema=pa.schema([(id_col, pa.string()), ("pos", pa.int32()),
                             ("whash", pa.int64())]),
    )

    def tag(col):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            h = pd.util.hash_pandas_object(b[col],
                                           index=False).to_numpy()
            b = b.copy()
            b["_part"] = (h % np.uint64(P)).astype(np.int64)
            return b
        return fn

    hit_schema = pa.schema([(id_col, pa.string()), ("pos", pa.int32()),
                            ("whash", pa.int64())])
    pair_schema = pa.schema([("url_a", pa.string()),
                             ("url_b", pa.string())])

    def join_a(pg: pd.DataFrame, hg: pd.DataFrame) -> pd.DataFrame:
        pg = pg.drop_duplicates(["url_a", "url_b"])
        m = pg.merge(hg.rename(columns={id_col: "url_a",
                                        "pos": "pos_a"}), on="url_a",
                     how="inner")
        return m[["url_a", "url_b", "pos_a", "whash"]]

    step_a = hash_exchange(
        [edges.map_batches(tag("url_a"), batch_format="pandas"),
         hits.map_batches(tag(id_col), batch_format="pandas")],
        join_a, num_partitions=P,
        schema=pa.schema([("url_a", pa.string()), ("url_b", pa.string()),
                          ("pos_a", pa.int32()), ("whash", pa.int64())]),
        in_schemas=[pair_schema, hit_schema],
    )

    def join_b(pg: pd.DataFrame, hg: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "url_a": pd.Series(dtype=object),
            "url_b": pd.Series(dtype=object),
            "span_tokens": pd.Series(dtype=np.int64),
            "start_a": pd.Series(dtype=np.int64),
            "start_b": pd.Series(dtype=np.int64)})
        if not len(pg) or not len(hg):
            return empty
        m = pg.merge(hg.rename(columns={id_col: "url_b",
                                        "pos": "pos_b"}),
                     on=["url_b", "whash"], how="inner")
        if not len(m):
            return empty
        m["diag"] = m["pos_a"].astype(np.int64) - m["pos_b"]
        m = m.sort_values(["url_a", "url_b", "diag", "pos_a"],
                          kind="stable").drop_duplicates(
            ["url_a", "url_b", "pos_a", "pos_b"])
        isl = m["pos_a"].astype(np.int64) - m.groupby(
            ["url_a", "url_b", "diag"], sort=False).cumcount()
        g = m.assign(_isl=isl).groupby(
            ["url_a", "url_b", "diag", "_isl"], sort=False) \
            .agg(run=("pos_a", "size"), start_a=("pos_a", "min"),
                 start_b=("pos_b", "min")).reset_index()
        g["span_tokens"] = g["run"] + L - 1
        g = g.sort_values(["url_a", "url_b", "span_tokens",
                           "start_a", "start_b"],
                          ascending=[True, True, False, True, True],
                          kind="stable") \
            .drop_duplicates(["url_a", "url_b"], keep="first")
        return g[["url_a", "url_b", "span_tokens", "start_a",
                  "start_b"]].astype({"span_tokens": np.int64,
                                      "start_a": np.int64,
                                      "start_b": np.int64})

    return hash_exchange(
        [step_a.map_batches(tag("url_b"), batch_format="pandas"),
         hits.map_batches(tag(id_col), batch_format="pandas")],
        join_b, num_partitions=P,
        schema=pa.schema([("url_a", pa.string()), ("url_b", pa.string()),
                          ("span_tokens", pa.int64()),
                          ("start_a", pa.int64()),
                          ("start_b", pa.int64())]),
        in_schemas=[pa.schema([("url_a", pa.string()),
                               ("url_b", pa.string()),
                               ("pos_a", pa.int32()),
                               ("whash", pa.int64())]), hit_schema],
    )


def longest_dup_spans_sql(min_tokens: int = 50) -> str:
    """DuckDB twin of ``longest_dup_spans_exact``: md5 window identity,
    the same star pair set, diagonal gaps-and-islands runs, and the
    global (span desc, start_a, start_b) argmax."""
    from data_dedup_ray.corpus import WEB_PAGES_CTE

    L = int(min_tokens)
    return f"""
WITH {WEB_PAGES_CTE},
toks AS (SELECT url, regexp_extract_all(text, '[a-z0-9]+') AS t
         FROM web_pages),
win AS (SELECT url, g.i - 1 AS i0,
               md5(array_to_string(t[g.i:g.i+{L - 1}], ' ')) AS h
  FROM toks, UNNEST(generate_series(1, len(t) - {L - 1})) AS g(i)
  WHERE len(t) >= {L}),
dup AS (SELECT h FROM win GROUP BY h HAVING count(DISTINCT url) > 1),
e0 AS (SELECT DISTINCT url, h FROM win WHERE h IN (SELECT h FROM dup)),
fstar AS (SELECT h, min(url) AS ua FROM e0 GROUP BY h),
pairs AS (SELECT DISTINCT f.ua, e.url AS ub
          FROM fstar f JOIN e0 e USING (h) WHERE e.url <> f.ua),
m AS (SELECT DISTINCT p.ua, p.ub, wa.i0 AS ia, wb.i0 AS ib
      FROM pairs p
      JOIN win wa ON wa.url = p.ua
      JOIN win wb ON wb.url = p.ub AND wb.h = wa.h),
isl AS (SELECT ua, ub, ia, ib, ia - ib AS diag,
               ia - row_number() OVER (PARTITION BY ua, ub, ia - ib
                                       ORDER BY ia) AS k
        FROM m),
r AS (SELECT ua, ub, CAST(count(*) AS BIGINT) AS run,
             CAST(min(ia) AS BIGINT) AS sa, CAST(min(ib) AS BIGINT) AS sb
      FROM isl GROUP BY ua, ub, diag, k)
SELECT ua AS url_a, ub AS url_b,
       CAST(run + {L - 1} AS BIGINT) AS span_tokens,
       sa AS start_a, sb AS start_b
FROM (SELECT r.*, row_number() OVER (
        PARTITION BY ua, ub ORDER BY run DESC, sa, sb) AS rk FROM r)
WHERE rk = 1"""


def dup_window_positions(
    ds: ray.data.Dataset,
    *,
    min_tokens: int = 50,
    id_col: str = "url",
    text_col: str = "text",
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """``(url, pos, n_docs)`` — every EXACT duplicated window position
    with the number of docs sharing that window's text: the
    per-position sibling of the winnowed ``dup_span_fingerprints``
    (which stays the scale path; hash values never appear in either
    output, so this variant is fully SQL-restatable)."""
    rows = ds.map_batches(
        _window_pos_rows,
        fn_kwargs=dict(min_tokens=min_tokens, id_col=id_col,
                       text_col=text_col),
        batch_format="pyarrow", batch_size=512,
    )

    def hits(g: pd.DataFrame) -> pd.DataFrame:
        nun = g.groupby("whash", sort=False)[id_col].transform("nunique")
        out = g.loc[nun > 1, [id_col, "pos"]].copy()
        out["n_docs"] = nun[nun > 1].astype(np.int64)
        return out

    return _coarse_apply(
        rows, "whash", num_partitions, hits,
        schema=pa.schema([(id_col, pa.string()), ("pos", pa.int32()),
                          ("n_docs", pa.int64())]),
        in_schema=pa.schema([(id_col, pa.string()),
                             ("whash", pa.int64()),
                             ("pos", pa.int32())]),
    )


def dup_window_positions_sql(min_tokens: int = 50) -> str:
    """DuckDB twin of ``dup_window_positions``: md5 window identity,
    per-position rows, count(DISTINCT url) per window text."""
    from data_dedup_ray.corpus import WEB_PAGES_CTE

    L = int(min_tokens)
    return f"""
WITH {WEB_PAGES_CTE},
toks AS (SELECT url, regexp_extract_all(text, '[a-z0-9]+') AS t
         FROM web_pages),
win AS (SELECT url, g.i - 1 AS pos,
               md5(array_to_string(t[g.i:g.i+{L - 1}], ' ')) AS h
  FROM toks, UNNEST(generate_series(1, len(t) - {L - 1})) AS g(i)
  WHERE len(t) >= {L}),
nd AS (SELECT h, CAST(count(DISTINCT url) AS BIGINT) AS n_docs
       FROM win GROUP BY h)
SELECT w.url, CAST(w.pos AS INT) AS pos, nd.n_docs
FROM win w JOIN nd ON nd.h = w.h WHERE nd.n_docs > 1"""


def winnowed_positions_sha(
    ds: ray.data.Dataset,
    *,
    min_tokens: int = 50,
    winnow_w: int = 8,
    id_col: str = "url",
    text_col: str = "text",
) -> ray.data.Dataset:
    """``(url, pos)`` — the WINNOWING SELECTION itself under the sha
    token hash: which window positions the Schleimer et al. rule picks.
    This pins the selection rule bit-for-bit (leftmost minimum per
    ``winnow_w``-window, positions deduplicated) rather than only its
    guarantee laws: the sha rolling window chain is SQL-restatable, so
    DuckDB recomputes every hash VALUE and replays the argmin
    (``winnowed_positions_sql`` — ``list_reduce`` over the token slice
    instead of 50 nested ``lead``s, struct-min ``(v, pos)`` for the
    deterministic leftmost tie).  The default polars-hash winnowing
    stays the production path (same rule, cheaper hash)."""
    from data_dedup_ray.stages.minhash import sha256_token_hash

    rows = ds.map_batches(
        winnowed_rows,
        fn_kwargs=dict(min_tokens=min_tokens, winnow_w=winnow_w,
                       id_col=id_col, text_col=text_col,
                       token_hash=sha256_token_hash),
        batch_format="pyarrow", batch_size=512,
    )
    return rows.map_batches(
        lambda t: t.select([id_col, "pos"]), batch_format="pyarrow")


def winnowed_positions_sql(min_tokens: int = 50,
                           winnow_w: int = 8) -> str:
    """DuckDB twin of ``winnowed_positions_sha``: sha-token rolling
    window hashes via ``list_reduce`` (each step ``(a·C + b) mod 2⁶⁴``,
    ``a·C < 2¹⁰⁵`` HUGEINT-safe), then the winnow selection as a
    start×position join taking the struct-min ``(v, pos)`` per window
    (= numpy's leftmost argmin) and deduplicating positions."""
    from data_dedup_ray.corpus import WEB_PAGES_CTE

    L = int(min_tokens)
    w = int(winnow_w)
    C = 0x100000001B3
    M = 1 << 64
    return f"""
WITH {WEB_PAGES_CTE},
toks AS (SELECT url, regexp_extract_all(text, '[a-z0-9]+') AS t
         FROM web_pages),
win AS (
  SELECT url, g.i - 1 AS i0,
         list_reduce(
           list_transform(t[g.i:g.i+{L - 1}],
             tok -> CAST(CAST(('0x' || substr(sha256(tok), 1, 16))
                              AS UBIGINT) AS HUGEINT)),
           (a, b) -> (a * {C} + b) % {M}::HUGEINT) AS v
  FROM toks, UNNEST(generate_series(1, len(t) - {L - 1})) AS g(i)
  WHERE len(t) >= {L}),
nwin AS (SELECT url, CAST(count(*) AS BIGINT) AS nw FROM win
         GROUP BY url),
starts AS (
  SELECT url, g.s
  FROM nwin, UNNEST(generate_series(0, greatest(nw - {w}, 0))) AS g(s)),
sel AS (
  SELECT st.url, min(struct_pack(v := w2.v, i := w2.i0)) AS m
  FROM starts st JOIN win w2 ON w2.url = st.url
       AND w2.i0 BETWEEN st.s AND st.s + {w - 1}
  GROUP BY st.url, st.s)
SELECT DISTINCT url, CAST(m.i AS INT) AS pos FROM sel"""
