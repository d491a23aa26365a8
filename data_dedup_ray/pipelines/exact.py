"""Exact-duplicate pipeline — the Files/CLI layer re-expressed on Ray Data.

Maps the reference's file-level operators (/root/reference/lib/Data/Dedup/
Files.pm, Files/CLI.pm) onto the web_pages table: ``url`` plays the file
path, ``text`` the file content, ``inode_id`` the hardlink identity
(SURVEY.md §1.4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from data_dedup_ray.util import autoscale_pool

from data_dedup_ray.engine import dedup_cascade, resolve_chain


def filter_empty(ds: ray.data.Dataset, content_col: str = "text") -> ray.data.Dataset:
    """``ignore_empty``: drop zero-length content (Files.pm:104-116,223;
    without it all empty rows legitimately form one duplicate block,
    Files.t:231-271)."""
    return ds.map_batches(
        lambda t: t.filter(pc.greater(pc.binary_length(t[content_col]), 0)),
        batch_format="pyarrow",
    )


def _keep_min_url(t: pa.Table, identity_col: str) -> pa.Table:
    """One row per identity key — the row with the minimum url — as a
    pure Acero kernel (sort + ordered ``first`` aggregate, no per-group
    Python)."""
    if t.num_rows == 0:
        return t
    others = [c for c in t.column_names if c != identity_col]
    g = t.sort_by("url").group_by([identity_col], use_threads=False) \
        .aggregate([(c, "first") for c in others])
    return g.rename_columns([identity_col] + others) \
        .select(t.column_names)


def collapse_identity(
    ds: ray.data.Dataset, identity_col: str = "inode_id",
    resolve: "callable | None" = None,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Hardlink collapse: only one page per identity key enters dedup
    (Files.pm:225,167).  The reference keeps the first *seen*; execution
    order is non-deterministic here, so the default pins the CLI's
    resolution policy — the alphabetically-first url (CLI.pm:281-283,
    CLI.t:91-97).

    ``resolve``: the reference's pluggable ``resolve_hardlinks`` callback
    (Files.pm:279-318, contract tested in Files.t:133-183): it receives
    the identity group's member urls as a SORTED list and returns the one
    url that should canonically represent the group.

    Scale shape: a map-side keep-min combiner collapses each split group
    to ≤1 row per inode BEFORE the exchange, so the shuffle moves
    O(distinct inodes × split groups), not O(rows); the per-partition
    step is the same vectorized Acero kernel (no per-group Python).
    With a user callback, the combiner instead only PRUNES each group to
    its min-url row per batch — the callback needs the full member url
    list, so urls are accumulated separately and the callback runs once
    per multi-member inode in the reduce."""
    from data_dedup_ray.engine.exchange import hash_exchange, key_partition

    P = num_partitions
    ds = ds.map_batches(lambda t: t, batch_format="pyarrow")
    base = ds.schema().base_schema

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column("_part", pa.array(key_partition(
            t[identity_col].to_numpy(zero_copy_only=False), P)))

    if resolve is None:
        def pre(t: pa.Table) -> pa.Table:
            return _keep_min_url(t, identity_col)

        def fin(df: pd.DataFrame) -> pd.DataFrame:
            t = pa.Table.from_pandas(df, preserve_index=False)
            return _keep_min_url(t, identity_col).to_pandas()

        return hash_exchange(
            [ds.map_batches(add_part, batch_format="pyarrow")], fin,
            num_partitions=P, schema=base, in_schemas=[base], pre=[pre],
        )

    # user-callback path: ship every (inode, url) pair but only one
    # full candidate ROW per (inode, url) — groups are hardlink-sized,
    # so the per-inode Python callback is cheap in the reduce
    def fin_cb(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        keep_idx = []
        for _, g in df.groupby(identity_col, sort=False):
            urls = sorted(g["url"])
            choice = resolve(urls)
            if choice not in set(urls):
                raise ValueError(
                    f"resolve_hardlinks returned {choice!r}, not one of "
                    f"the group's member urls")
            keep_idx.append(g.index[g["url"] == choice][0])
        return df.loc[keep_idx]

    return hash_exchange(
        [ds.map_batches(add_part, batch_format="pyarrow")], fin_cb,
        num_partitions=P, schema=base, in_schemas=[base],
    )


def _members_rollup(df: pd.DataFrame, key: str) -> pd.DataFrame:
    """Per-partition (key, n_links, members) rollup: multi-member keys
    only, members tab-joined in url order.  Single-member keys — the
    overwhelming majority at scale — are dropped by one VECTORIZED
    transform before any per-group string work happens."""
    if not len(df):
        return pd.DataFrame({key: pd.Series(dtype=df[key].dtype),
                             "n_links": pd.Series(dtype=np.int64),
                             "members": pd.Series(dtype=object)})
    sizes = df.groupby(key, sort=False)["url"].transform("size")
    multi = df[sizes > 1].sort_values([key, "url"], kind="stable")
    g = multi.groupby(key, sort=False)["url"]
    out = g.agg("\t".join).rename("members").reset_index()
    out["n_links"] = g.size().to_numpy()
    return out[[key, "n_links", "members"]]


def hardlinks(ds: ray.data.Dataset,
              num_partitions: int = 32) -> ray.data.Dataset:
    """All urls grouped by identity key, multi-member groups only
    (Files.pm:341 `hardlinks` accessor).

    One sortless exchange keyed on the inode; the per-partition rollup
    prunes single-member inodes vectorized BEFORE the per-group string
    join, so the Python-level work is output-sized (true hardlink
    groups), not corpus-sized."""
    from data_dedup_ray.engine.exchange import hash_exchange, key_partition

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column("_part", pa.array(key_partition(
            t["inode_id"].to_numpy(zero_copy_only=False), num_partitions)))

    sel = ds.select_columns(["inode_id", "url"]).map_batches(
        add_part, batch_format="pyarrow")
    return hash_exchange(
        [sel],
        lambda df: _members_rollup(df, "inode_id"),
        num_partitions=num_partitions,
        schema=pa.schema([("inode_id", pa.int64()),
                          ("n_links", pa.int64()),
                          ("members", pa.string())]),
        in_schemas=[pa.schema([("inode_id", pa.int64()),
                               ("url", pa.string())])],
    )


def dedup_pages(
    ds: ray.data.Dataset,
    *,
    chain: list[str] | None = None,
    ignore_empty: bool = False,
    collapse: bool = True,
    resolve_hardlinks: "callable | None" = None,
    id_col: str = "url",
    concurrency: int | tuple | None = None,
    colliding_filter: str = "auto",
) -> ray.data.Dataset:
    """scan → predicates → cascade: the `Files->scan` + `Engine->add` path
    (Files.pm:215-240) as one lazy Dataset pipeline.

    ``resolve_hardlinks``: optional per-inode canonical-url callback
    (Files.pm:279-318) forwarded to ``collapse_identity``.
    ``colliding_filter``: forwarded to the cascade — ``"auto"`` (default)
    broadcasts exact collision sets on small corpora and switches itself
    to Bloom filters past ``cascade._AUTO_BLOOM_THRESHOLD`` colliding
    prefixes (extreme-scale mode, engine/cascade.py)."""
    if ignore_empty:
        ds = filter_empty(ds)
    if collapse and "inode_id" in ds.schema().names:
        ds = collapse_identity(ds, resolve=resolve_hardlinks)
    stages = resolve_chain(chain)
    return dedup_cascade(ds, stages, id_col=id_col, concurrency=concurrency,
                         colliding_filter=colliding_filter)


def duplicate_report(result: ray.data.Dataset,
                     num_partitions: int = 32) -> ray.data.Dataset:
    """The CLI duplicate report (CLI.pm:285-310): only blocks with >1 member,
    members tab-joined in lexicographic order — one row per duplicate
    cluster.  Render with ``report_text`` for the byte-exact TSV.

    Rows are pre-filtered to duplicate clusters, then one sortless
    exchange keyed on cluster_id feeds the vectorized rollup (same kernel
    as ``hardlinks``)."""
    from data_dedup_ray.engine.exchange import hash_exchange, key_partition

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["n_members"], 1))
        t = t.select(["cluster_id", "url"])
        return t.append_column("_part", pa.array(key_partition(
            t["cluster_id"].to_numpy(zero_copy_only=False),
            num_partitions)))

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        out = _members_rollup(df, "cluster_id")
        return out.rename(columns={"n_links": "n_members"})

    return hash_exchange(
        [result.map_batches(prep, batch_format="pyarrow")],
        fin,
        num_partitions=num_partitions,
        schema=pa.schema([("cluster_id", pa.string()),
                          ("n_members", pa.int64()),
                          ("members", pa.string())]),
        in_schemas=[pa.schema([("cluster_id", pa.string()),
                               ("url", pa.string())])],
    )


def cluster_report(result: ray.data.Dataset, *, key: str = "cluster_id",
                   num_partitions: int = 32) -> ray.data.Dataset:
    """``duplicate_report`` for results WITHOUT an ``n_members`` column
    (the near-dup cluster assignments): one sortless exchange keyed on
    ``key``, per-partition vectorized rollup to multi-member clusters
    only.  The shuffle carries (key, url) — never text — and the driver
    never sees per-row data, only the output-sized report."""
    from data_dedup_ray.engine.exchange import hash_exchange, key_partition

    def prep(t: pa.Table) -> pa.Table:
        t = t.select([key, "url"])
        return t.append_column("_part", pa.array(key_partition(
            t[key].to_numpy(zero_copy_only=False), num_partitions)))

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        out = _members_rollup(df, key)
        return out.rename(columns={"n_links": "n_members"})

    return hash_exchange(
        [result.map_batches(prep, batch_format="pyarrow")],
        fin,
        num_partitions=num_partitions,
        schema=pa.schema([(key, pa.string()),
                          ("n_members", pa.int64()),
                          ("members", pa.string())]),
        in_schemas=[pa.schema([(key, pa.string()),
                               ("url", pa.string())])],
    )


def report_text(result: ray.data.Dataset) -> str:
    """Byte-exact TSV conformance mode: lines sorted lexicographically, each
    line the tab-joined sorted member urls + trailing newline
    (CLI.pm:302-306; golden shape CLI.t:74-78)."""
    lines = sorted(duplicate_report(result).to_pandas()["members"])
    return "".join(line + "\n" for line in lines)


def dedup_stats(result: ray.data.Dataset) -> dict[str, int]:
    """The --verbose tallies (CLI.pm:313-321): unique objects, distinct
    objects with duplicates, and duplicate count."""
    agg = result.map_batches(
        lambda t: pa.table(
            {
                "unique": [int(pc.sum(pc.equal(t["n_members"], 1)).as_py() or 0)],
                "dup_rows": [int(pc.sum(pc.greater(t["n_members"], 1)).as_py() or 0)],
            }
        ),
        batch_format="pyarrow",
    ).to_pandas()
    clusters = duplicate_report(result).count()
    unique = int(agg["unique"].sum())
    dup_rows = int(agg["dup_rows"].sum())
    return {
        "unique": unique,
        "distinct_with_duplicates": int(clusters),
        "duplicates": dup_rows - int(clusters),
        "total": unique + dup_rows,
    }


# --------------------------------------------------------------------------
# Exact dedup over NORMALIZED text (composition with text.normalize rules)
# --------------------------------------------------------------------------


def _plant_case_ws_noise(batch: pd.DataFrame) -> pd.DataFrame:
    """Deterministic capture noise: every ``inode_id % 3 == 1`` page is
    upper-cased, every ``% 3 == 2`` page gets doubled spaces — the
    trivially-different re-captures normalization exists to collapse."""
    r = batch["inode_id"] % 3
    text = batch["text"].where(r != 1, batch["text"].str.upper())
    text = text.where(r != 2, batch["text"].str.replace(" ", "  ", regex=False))
    out = batch.copy()
    out["text"] = text
    return out


NOISY_PAGES_SELECT = (
    "SELECT url, inode_id, CASE inode_id % 3"
    " WHEN 1 THEN upper(text)"
    " WHEN 2 THEN replace(text, ' ', '  ')"
    " ELSE text END AS text FROM web_pages"
)


def dedup_pages_normalized(sf_dir: str) -> ray.data.Dataset:
    """The full reason text normalization exists in a dedup engine: the
    exact cascade over NFC/lower/whitespace-normalized text groups
    trivially-different re-captures that byte-exact dedup would miss.
    ``(url, cluster_id, n_members)`` over the noise-planted corpus.
    Normalization rule shared with text.norm_text_py (one definition)."""
    from data_dedup_ray.corpus import web_pages
    from data_dedup_ray.pipelines.text import norm_text_py

    def norm(t: pa.Table) -> pa.Table:
        texts = [norm_text_py(s) for s in t["text"].to_pylist()]
        return pa.table({
            "url": t["url"].combine_chunks(),
            "text": pa.array(texts, pa.string()),
        })

    noisy = web_pages(sf_dir).map_batches(
        _plant_case_ws_noise, batch_format="pandas"
    )
    res = dedup_pages(noisy.map_batches(norm, batch_format="pyarrow"),
                      collapse=False)
    return res.select_columns(["url", "cluster_id", "n_members"])


def dedup_pages_normalized_sql() -> str:
    from data_dedup_ray.corpus import web_pages_sql
    from data_dedup_ray.pipelines.text import norm_sql_expr

    return web_pages_sql(
        "SELECT url,"
        " min(url) OVER (PARTITION BY nt) AS cluster_id,"
        " count(*) OVER (PARTITION BY nt) AS n_members FROM ("
        f"  SELECT url, {norm_sql_expr('text')} AS nt"
        f"  FROM ({NOISY_PAGES_SELECT}))"
    )
