"""Persisted substring-fingerprint store — the SPAN tier of the
incremental ladder: detect long copied token spans between a NEW crawl
and an already-indexed corpus WITHOUT re-reading or re-windowing the
indexed text.

The live pipelines (pipelines/substring.py) window every document on
every run.  Rolling crawls want the same economics the content-hash /
simhash / b-bit / signature / shingle / embedding stores already have
(SURVEY §8 ladder): each crawl appends its fingerprint rows once;
later crawls join against the stored rows only.

- ``build_span_store`` persists ``(url, whash)`` rows through the
  resumable sink.  ``mode="winnowed"`` (default, the 100 TB path)
  stores the winnowed selection (~1/winnow_w of the per-position
  volume, 8 B of hash per row; any shared span of ``min_tokens +
  winnow_w − 1`` tokens still yields an identical selected hash on
  both sides — the standard winnowing guarantee, Schleimer et al.
  SIGMOD'03).  ``mode="exact"`` stores every window position — the
  oracle-parity flag whose group structure DuckDB restates verbatim
  (md5 of the window text, ``oracles.substring_dup_sql`` convention).
  The window config is store LINEAGE: a query whose (mode, min_tokens,
  winnow_w) differs from the store's fails loudly
  (``validate_store_config``), since fingerprints only compare between
  identical window rules.

- ``incremental_substring_dup`` → ``(url, n_dup_windows)`` per NEW
  page: how many of its window fingerprints already exist ANYWHERE in
  the indexed corpus — the substring-granular sibling of
  ``fpstore.incremental_new_content`` (whole-doc) and
  ``novelty.incremental_novelty`` (shingle-set).  One whash-keyed
  exchange co-partitions live new-side rows with stored rows (the
  index ships per-batch-DISTINCT hashes only — its urls never travel);
  membership is one vectorized isin per partition; per-url tallies
  fold through a second url-keyed exchange.  Index text is never
  re-read, never re-windowed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from data_dedup_ray.engine.exchange import hash_exchange, key_partition
from data_dedup_ray.stages.substring import window_hash_rows, winnowed_rows

_ROW_SCHEMA = pa.schema([("url", pa.string()), ("whash", pa.int64())])
_OUT_SCHEMA = pa.schema([("url", pa.string()),
                         ("n_dup_windows", pa.int64())])


def _span_rows(ds: ray.data.Dataset, *, mode: str, min_tokens: int,
               winnow_w: int, id_col: str,
               text_col: str) -> ray.data.Dataset:
    if mode == "exact":
        return ds.map_batches(
            window_hash_rows,
            fn_kwargs=dict(min_tokens=min_tokens, id_col=id_col,
                           text_col=text_col),
            batch_format="pyarrow", batch_size=512,
        )
    if mode == "winnowed":
        return ds.map_batches(
            winnowed_rows,
            fn_kwargs=dict(min_tokens=min_tokens, winnow_w=winnow_w,
                           id_col=id_col, text_col=text_col),
            batch_format="pyarrow", batch_size=512,
        ).map_batches(lambda t: t.select([id_col, "whash"]),
                      batch_format="pyarrow")
    raise ValueError(f"unknown mode {mode!r}: use 'winnowed' | 'exact'")


def build_span_store(
    ds: ray.data.Dataset, path: str, *, min_tokens: int = 50,
    winnow_w: int = 8, mode: str = "winnowed", id_col: str = "url",
    text_col: str = "text", num_partitions: int = 32,
):
    """Persist the crawl's span fingerprints (resumable sink + window
    config lineage)."""
    from data_dedup_ray.state.sink import resumable_write_parquet

    return resumable_write_parquet(
        _span_rows(ds, mode=mode, min_tokens=min_tokens,
                   winnow_w=winnow_w, id_col=id_col, text_col=text_col),
        path, key_col=id_col, num_partitions=num_partitions,
        config={"kind": "span_store", "mode": mode,
                "min_tokens": min_tokens,
                "winnow_w": winnow_w if mode == "winnowed" else None,
                "id_col": id_col},
    )


def read_span_store(path) -> ray.data.Dataset:
    """The stored ``(url, whash)`` rows; a list reads several crawls'
    stores as one append-only index."""
    import glob
    import os

    paths = path if isinstance(path, (list, tuple)) else [path]
    files: list[str] = []
    for p in paths:
        files += sorted(glob.glob(os.path.join(p, "part=*",
                                               "*.parquet")))
    return ray.data.read_parquet(files, partitioning=None)


def incremental_substring_dup(
    new_ds: ray.data.Dataset, store_path, *, min_tokens: int = 50,
    winnow_w: int = 8, mode: str = "winnowed", id_col: str = "url",
    text_col: str = "text", num_partitions: int = 64,
) -> ray.data.Dataset:
    """``(url, n_dup_windows)`` — per new-crawl page, how many of its
    window fingerprints already exist anywhere in the indexed corpus
    (every matching new-side POSITION counts, mirroring
    ``substring_dup_docs``'s per-position semantics)."""
    from data_dedup_ray.state.sink import validate_store_config

    expect = {"mode": mode, "min_tokens": min_tokens}
    if mode == "winnowed":
        expect["winnow_w"] = winnow_w
    validate_store_config(store_path, expect)
    P = num_partitions

    def part_on(col: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column("_part", pa.array(key_partition(
                t[col].to_numpy(zero_copy_only=False), P)))
        return fn

    new_rows = _span_rows(new_ds, mode=mode, min_tokens=min_tokens,
                          winnow_w=winnow_w, id_col=id_col,
                          text_col=text_col) \
        .map_batches(part_on("whash"), batch_format="pyarrow")

    # index side: hashes only — per-batch distinct so at most one row
    # per (whash, split-group) enters the shuffle; urls never travel
    idx_rows = read_span_store(store_path).map_batches(
        lambda t: t.select(["whash"]),
        batch_format="pyarrow",
    ).map_batches(part_on("whash"), batch_format="pyarrow")

    def idx_distinct(t: pa.Table) -> pa.Table:
        return t.group_by(["whash", "_part"]).aggregate([])

    def hits(new_df: pd.DataFrame, idx_df: pd.DataFrame) -> pd.DataFrame:
        if not len(new_df) or not len(idx_df):
            return pd.DataFrame({id_col: pd.Series(dtype=object)})
        seen = new_df["whash"].isin(
            np.unique(idx_df["whash"].to_numpy()))
        return new_df.loc[seen, [id_col]]

    hit_rows = hash_exchange(
        [new_rows, idx_rows], hits, num_partitions=P,
        schema=pa.schema([(id_col, pa.string())]),
        in_schemas=[_ROW_SCHEMA, pa.schema([("whash", pa.int64())])],
        pre=[None, idx_distinct],
    )

    def tally(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({id_col: pd.Series(dtype=object),
                                 "n_dup_windows":
                                     pd.Series(dtype=np.int64)})
        return g.groupby(id_col, sort=False).size() \
            .rename("n_dup_windows").reset_index()

    return hash_exchange(
        [hit_rows.map_batches(part_on(id_col), batch_format="pyarrow")],
        tally, num_partitions=P, schema=_OUT_SCHEMA,
        in_schemas=[pa.schema([(id_col, pa.string())])],
    )


def incremental_substring_dup_web(sf_dir: str, *,
                                  mode: str = "exact") -> ray.data.Dataset:
    """Driver query: snapshot2's pages graded against a span store
    built from web_pages.  ``mode="exact"`` is the oracle-parity flag
    (every window position, md5-restatable); the library default for
    production stores is the winnowed scale path."""
    from data_dedup_ray.corpus import web_pages
    from data_dedup_ray.pipelines.snapshots import snapshot2
    from data_dedup_ray.util import scratch_dir

    store = scratch_dir(f"span_store_{mode}", sf_dir)
    build_span_store(web_pages(sf_dir).select_columns(["url", "text"]),
                     store, mode=mode)
    return incremental_substring_dup(
        snapshot2(sf_dir).select_columns(["url", "text"]), store,
        mode=mode)


def incremental_substring_dup_sql(min_tokens: int = 50) -> str:
    """DuckDB twin of ``incremental_substring_dup_web(mode="exact")``:
    the stored index restated as web_pages' window set (md5 of window
    text — ``oracles.substring_dup_sql`` convention), the new side as
    snapshot2's per-position windows, membership as a semi-join."""
    from data_dedup_ray.pipelines.snapshots import snapshots_sql

    L = int(min_tokens)
    return snapshots_sql(
        ",\nitoks AS (SELECT url, regexp_extract_all(text, '[a-z0-9]+')"
        " AS t FROM web_pages),\n"
        "ntoks AS (SELECT url, regexp_extract_all(text, '[a-z0-9]+')"
        " AS t FROM snapshot2),\n"
        "iwin AS (SELECT DISTINCT"
        f" md5(array_to_string(t[i:i+{L - 1}], ' ')) AS h\n"
        f"  FROM itoks, UNNEST(generate_series(1, len(t) - {L - 1}))"
        " AS g(i)\n"
        f"  WHERE len(t) >= {L}),\n"
        "nwin AS (SELECT url,"
        f" md5(array_to_string(t[i:i+{L - 1}], ' ')) AS h\n"
        f"  FROM ntoks, UNNEST(generate_series(1, len(t) - {L - 1}))"
        " AS g(i)\n"
        f"  WHERE len(t) >= {L})\n"
        "SELECT url, CAST(count(*) AS BIGINT) AS n_dup_windows\n"
        "FROM nwin WHERE h IN (SELECT h FROM iwin) GROUP BY url"
    )
