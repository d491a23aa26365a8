"""Duplicated-SPAN removal — the ExactSubstr *removal* step of Lee et
al., "Deduplicating Training Data Makes Language Models Better"
(arXiv:2107.06499 §4.1): every ``min_tokens``-token window whose content
occurs anywhere else in the corpus is removed from all but its globally
first occurrence, and documents are rebuilt from their surviving tokens.

Complements the flagging pipelines in pipelines/substring.py (which only
COUNT/LOCATE duplicated windows) and passage_dedup_keep_first (which
removes fixed non-overlapping k-token lines): here windows slide, so an
arbitrarily aligned shared span of length L ≥ min_tokens is excised in
one pass — no line-boundary alignment assumption.

Shuffle plan (the Lee et al. suffix array re-expressed Ray-Data-first,
same argument as stages/substring.py):

1. window rows ``(url, whash, pos)`` — 8-byte rolling hash + int32
   position, never window text — exchange ONCE on ``hash(whash) % P``;
   inside the owning partition the keep-first winner per hash is the
   ``(url, pos)`` minimum and every other occurrence emits a REMOVAL row
   (duplicate-occurrence-sized output, like passage dedup);
2. removals co-partition with the corpus on ``hash(url) % P`` for the
   rebuild; kept text is regenerated locally from the document itself
   (tokens never shuffle).  Docs without removals are re-joined
   vectorized (polars ``list.join``); only docs WITH removals run the
   per-doc range-union mask.

Keep-first order is ``(url, pos)`` lexicographic — global, deterministic,
and restated verbatim by the SQL twin's ``row_number() OVER (PARTITION BY
window-text ORDER BY url, pos)``.  Group equality between the 64-bit
rolling hash and the oracle's md5-of-window-text follows the engine-wide
collision trade (stages/substring.py docstring).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import polars as pl
import pyarrow as pa
import ray.data

from data_dedup_ray.engine.exchange import hash_exchange, key_partition
from data_dedup_ray.stages.substring import _rolling_window_hashes

_WROW = pa.schema([("url", pa.string()), ("whash", pa.int64()),
                   ("pos", pa.int64())])
_REM = pa.schema([("url", pa.string()), ("pos", pa.int64()),
                  ("_part", pa.int64())])
_REM_IN = pa.schema([("url", pa.string()), ("pos", pa.int64())])
_DOC_IN = pa.schema([("url", pa.string()), ("text", pa.string())])
_OUT = pa.schema([("url", pa.string()), ("clean_text", pa.string()),
                  ("n_removed_tokens", pa.int64())])


def _window_rows_with_pos(min_tokens: int, id_col: str, text_col: str,
                          P: int):
    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        win, counts = _rolling_window_hashes(batch[text_col], min_tokens)
        nw = np.maximum(counts - min_tokens + 1, 0)
        tok_off = np.concatenate([[0], np.cumsum(counts)])[:-1]
        doc_of = np.repeat(np.arange(len(ids)), nw)
        pos = (np.arange(int(nw.sum()), dtype=np.int64)
               - np.repeat(np.cumsum(nw) - nw, nw))
        idx = pos + tok_off[doc_of]
        wh = win[idx].view(np.int64)
        part = key_partition(wh, P)
        return pa.table({
            "url": pa.array(np.asarray(ids, dtype=object)[doc_of],
                            type=pa.string()),
            "whash": pa.array(wh),
            "pos": pa.array(pos),
            "_part": pa.array(part),
        })

    return fn


def _removals(P: int):
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"url": pd.Series([], dtype=object),
                                 "pos": pd.Series([], dtype=np.int64),
                                 "_part": pd.Series([], dtype=np.int64)})
        g = g.sort_values(["whash", "url", "pos"], kind="stable")
        dup_group = g.groupby("whash", sort=False)["url"].transform("size") >= 2
        first = ~g.duplicated("whash")
        out = g.loc[dup_group & ~first, ["url", "pos"]].copy()
        out["_part"] = key_partition(out["url"].to_numpy(dtype=object), P)
        return out

    return fn


def substring_dedup_remove(
    ds: ray.data.Dataset,
    *,
    min_tokens: int = 50,
    id_col: str = "url",
    text_col: str = "text",
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """``(url, clean_text, n_removed_tokens)`` for EVERY document:
    ``clean_text`` is the single-space join of the tokens surviving
    keep-first duplicated-window removal (the SQL twin reconstructs the
    same normalized join, so unmodified docs compare equal too)."""
    k = min_tokens
    P = num_partitions
    rows = ds.map_batches(
        _window_rows_with_pos(k, id_col, text_col, P),
        batch_format="pyarrow", batch_size=512,
    )
    removals = hash_exchange(
        [rows], _removals(P), num_partitions=P,
        schema=_REM, in_schemas=[_WROW],
    )

    def tag_docs(t: pa.Table) -> pa.Table:
        urls = t[id_col].combine_chunks().cast(pa.string())
        return pa.table({
            "url": urls, "text": t[text_col].combine_chunks(),
            "_part": pa.array(key_partition(
                urls.to_numpy(zero_copy_only=False), P)),
        })

    docs = ds.map_batches(tag_docs, batch_format="pyarrow")

    def rebuild(dg: pd.DataFrame, rg: pd.DataFrame) -> pd.DataFrame:
        if not len(dg):
            return pd.DataFrame({"url": pd.Series([], dtype=object),
                                 "clean_text": pd.Series([], dtype=object),
                                 "n_removed_tokens":
                                     pd.Series([], dtype=np.int64)})
        toks = (pl.Series(dg["text"].to_numpy(dtype=object))
                .str.to_lowercase().str.extract_all(r"[a-z0-9]+"))
        joined = toks.list.join(" ").to_list()
        n_tok = toks.list.len().to_numpy().astype(np.int64)
        n_rem = np.zeros(len(dg), dtype=np.int64)
        if len(rg):
            idx_by_url = {u: i for i, u in enumerate(dg["url"])}
            for u, ps in rg.groupby("url", sort=False)["pos"]:
                i = idx_by_url[u]
                n = int(n_tok[i])
                s = np.unique(ps.to_numpy())
                delta = np.zeros(n + 1, dtype=np.int64)
                np.add.at(delta, np.minimum(s, n), 1)
                np.add.at(delta, np.minimum(s + k, n), -1)
                mask = np.cumsum(delta[:n]) > 0
                tl = toks[i].to_list()
                joined[i] = " ".join(
                    t for t, rm in zip(tl, mask) if not rm)
                n_rem[i] = int(mask.sum())
        return pd.DataFrame({"url": dg["url"], "clean_text": joined,
                             "n_removed_tokens": n_rem})

    return hash_exchange(
        [docs, removals], rebuild, num_partitions=P,
        schema=_OUT, in_schemas=[_DOC_IN, _REM_IN],
    )


def substring_dedup_remove_sql(min_tokens: int = 50) -> str:
    """DuckDB twin over ``web_pages`` (WITH-free body; wrap with the
    corpus CTE via ``corpus.web_pages_sql``)."""
    k = min_tokens
    return f"""
SELECT p.url, coalesce(kept.clean_text, '') AS clean_text,
       CAST(coalesce(kept.n_removed_tokens, 0) AS BIGINT)
         AS n_removed_tokens
FROM (SELECT DISTINCT url FROM web_pages) p
LEFT JOIN (
  WITH toks AS (
    SELECT url, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
    FROM web_pages),
  w AS (
    SELECT url, g.i AS pos,
           md5(array_to_string(t[g.i : g.i + {k - 1}], ' ')) AS wkey
    FROM toks, UNNEST(generate_series(1, len(t) - {k} + 1)) AS g(i)
    WHERE len(t) >= {k}),
  ranked AS (
    SELECT url, pos,
           row_number() OVER (PARTITION BY wkey ORDER BY url, pos) AS rn,
           count(*) OVER (PARTITION BY wkey) AS c
    FROM w),
  rpos AS (
    SELECT DISTINCT url, pos + g.j - 1 AS tp
    FROM ranked, UNNEST(generate_series(1, {k})) AS g(j)
    WHERE c >= 2 AND rn > 1),
  tok AS (
    SELECT url, g.i AS tp, t[g.i] AS tk
    FROM toks, UNNEST(generate_series(1, len(t))) AS g(i))
  SELECT tok.url,
         coalesce(string_agg(tk, ' ' ORDER BY tok.tp)
                  FILTER (WHERE rpos.tp IS NULL), '') AS clean_text,
         count(*) FILTER (WHERE rpos.tp IS NOT NULL) AS n_removed_tokens
  FROM tok LEFT JOIN rpos ON tok.url = rpos.url AND tok.tp = rpos.tp
  GROUP BY tok.url
) kept USING (url)"""


_EXP_OUT = pa.schema([
    ("url", pa.string()), ("n_tokens", pa.int64()),
    ("n_dup_tokens", pa.int64()), ("dup_bp", pa.int64()),
])


def span_dup_exposure(
    ds: ray.data.Dataset, *, min_tokens: int = 50, id_col: str = "url",
    text_col: str = "text", num_partitions: int = 32,
) -> ray.data.Dataset:
    """Per-doc duplicated-span EXPOSURE: ``(url, n_tokens,
    n_dup_tokens, dup_bp)`` where ``n_dup_tokens`` is the size of the
    union of all ``min_tokens``-token windows whose content appears in
    ≥ 2 DISTINCT documents — the token-granular duplication profile
    (what fraction of this page is syndicated/boilerplate material),
    i.e. the input a token-level soft-dedup weighting or a
    quality-filter threshold reads.  Unlike ``substring_dedup_remove``
    this counts EVERY occurrence (the first copy is just as exposed),
    and unlike ``clean.repetition_stats`` it measures CROSS-doc
    duplication, not within-doc repetition.

    Shape: window rows (8-byte hash + int32 pos, never text) through
    ONE whash-keyed exchange; occurrences of cross-doc-duplicated
    hashes come back dup-occurrence-sized and co-partition with the
    per-doc token counts on url; the range union is one vectorized
    diff-clip per partition."""
    P = num_partitions
    k = min_tokens
    wrows = ds.map_batches(
        _window_rows_with_pos(k, id_col, text_col, P),
        batch_format="pyarrow")

    def dup_occurrences(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"url": pd.Series([], dtype=object),
                                 "pos": pd.Series([], dtype=np.int64),
                                 "_part": pd.Series([], dtype=np.int64)})
        nun = g.groupby("whash", sort=False)["url"].transform("nunique")
        out = g.loc[nun >= 2, ["url", "pos"]].copy()
        out["_part"] = key_partition(out["url"].to_numpy(dtype=object), P)
        return out

    dups = hash_exchange(
        [wrows], dup_occurrences, num_partitions=P, schema=_REM,
        in_schemas=[_WROW],
    )

    def doc_counts(t: pa.Table) -> pa.Table:
        toks = (pl.from_arrow(t[text_col].combine_chunks())
                .str.to_lowercase()
                .str.count_matches(r"[a-z0-9]+"))
        urls = t[id_col].combine_chunks().cast(pa.string())
        out = pa.table({
            "url": urls,
            "n_tokens": pa.array(toks.cast(pl.Int64).to_numpy()),
        })
        return out.append_column("_part", pa.array(key_partition(
            urls.to_numpy(zero_copy_only=False), P)))

    counts = ds.map_batches(doc_counts, batch_format="pyarrow")

    def finalize(dd: pd.DataFrame, dc: pd.DataFrame) -> pd.DataFrame:
        if not len(dc):
            return pd.DataFrame({
                "url": pd.Series([], dtype=object),
                "n_tokens": pd.Series([], dtype=np.int64),
                "n_dup_tokens": pd.Series([], dtype=np.int64),
                "dup_bp": pd.Series([], dtype=np.int64)})
        if len(dd):
            dd = dd.sort_values(["url", "pos"], kind="stable")
            urls = dd["url"].to_numpy(dtype=object)
            pos = dd["pos"].to_numpy(np.int64)
            contrib = np.full(len(dd), k, dtype=np.int64)
            same = urls[1:] == urls[:-1]
            contrib[:-1][same] = np.minimum(pos[1:] - pos[:-1], k)[same]
            cov = pd.DataFrame({"url": urls, "c": contrib}) \
                .groupby("url", sort=False)["c"].sum()
            n_dup = dc["url"].map(cov).fillna(0).to_numpy(np.int64)
        else:
            n_dup = np.zeros(len(dc), np.int64)
        nt = dc["n_tokens"].to_numpy(np.int64)
        return pd.DataFrame({
            "url": dc["url"].to_numpy(dtype=object),
            "n_tokens": nt,
            "n_dup_tokens": n_dup,
            "dup_bp": 10000 * n_dup // np.maximum(nt, 1),
        })

    return hash_exchange(
        [dups, counts], finalize, num_partitions=P, schema=_EXP_OUT,
        in_schemas=[_REM_IN,
                    pa.schema([("url", pa.string()),
                               ("n_tokens", pa.int64())])],
    )


def span_dup_exposure_web(sf_dir: str, *,
                          min_tokens: int = 50) -> ray.data.Dataset:
    """Driver query: duplicated-span exposure over web_pages."""
    from data_dedup_ray.corpus import web_pages

    return span_dup_exposure(web_pages(sf_dir), min_tokens=min_tokens)


def span_dup_exposure_sql(min_tokens: int = 50) -> str:
    """DuckDB twin (wrap with ``corpus.web_pages_sql``): md5 window
    identity (the documented rolling-hash collision trade), cross-doc
    predicate ``count(DISTINCT url) >= 2``, and the identical
    diff-clipped range union via ``lead() OVER``."""
    k = min_tokens
    return f""", toks AS (
  SELECT url, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
  FROM web_pages),
w AS (
  SELECT url, g.i AS pos,
         md5(array_to_string(t[g.i : g.i + {k - 1}], ' ')) AS wkey
  FROM toks, UNNEST(generate_series(1, len(t) - {k} + 1)) AS g(i)
  WHERE len(t) >= {k}),
d AS (SELECT wkey FROM w GROUP BY wkey
      HAVING count(DISTINCT url) >= 2),
dw AS (SELECT url, pos FROM w JOIN d USING (wkey)),
cov AS (
  SELECT url,
         CAST(sum(CASE WHEN nxt IS NULL THEN {k}
                       ELSE least(nxt - pos, {k}) END) AS BIGINT) AS nd
  FROM (SELECT url, pos,
               lead(pos) OVER (PARTITION BY url ORDER BY pos) AS nxt
        FROM dw)
  GROUP BY url),
tok AS (SELECT url, CAST(len(t) AS BIGINT) AS n_tokens FROM toks)
SELECT t.url, t.n_tokens,
       CAST(coalesce(c.nd, 0) AS BIGINT) AS n_dup_tokens,
       CAST(10000 * coalesce(c.nd, 0) // greatest(t.n_tokens, 1)
            AS BIGINT) AS dup_bp
FROM tok t LEFT JOIN cov c USING (url)"""
