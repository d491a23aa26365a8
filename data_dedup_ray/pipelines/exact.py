"""Exact-duplicate pipeline — the Files/CLI layer re-expressed on Ray Data.

Maps the reference's file-level operators (/root/reference/lib/Data/Dedup/
Files.pm, Files/CLI.pm) onto the web_pages table: ``url`` plays the file
path, ``text`` the file content, ``inode_id`` the hardlink identity
(SURVEY.md §1.4).
"""

from __future__ import annotations

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


def _first_seen(g: pd.DataFrame) -> pd.DataFrame:
    return g.sort_values("url", kind="stable").head(1)


def collapse_identity(
    ds: ray.data.Dataset, identity_col: str = "inode_id"
) -> ray.data.Dataset:
    """Hardlink collapse: only one page per identity key enters dedup
    (Files.pm:225,167).  The reference keeps the first *seen*; execution
    order is non-deterministic here, so we pin the CLI's resolution policy —
    the alphabetically-first url (CLI.pm:281-283, CLI.t:91-97).

    Shuffle key: ``identity_col``.  Groups are hardlink-sized (tiny), so no
    skew handling is needed."""
    return ds.groupby(identity_col).map_groups(_first_seen, batch_format="pandas")


def _hardlink_group(g: pd.DataFrame) -> pd.DataFrame:
    urls = sorted(g["url"])
    return pd.DataFrame(
        {
            "inode_id": [g["inode_id"].iloc[0]],
            "n_links": [len(urls)],
            "members": ["\t".join(urls)],
        }
    )


def hardlinks(ds: ray.data.Dataset) -> ray.data.Dataset:
    """All urls grouped by identity key, multi-member groups only
    (Files.pm:341 `hardlinks` accessor)."""
    grouped = ds.select_columns(["inode_id", "url"]).groupby("inode_id").map_groups(
        _hardlink_group, batch_format="pandas"
    )
    return grouped.map_batches(
        lambda t: t.filter(pc.greater(t["n_links"], 1)), batch_format="pyarrow"
    )


def dedup_pages(
    ds: ray.data.Dataset,
    *,
    chain: list[str] | None = None,
    ignore_empty: bool = False,
    collapse: bool = True,
    id_col: str = "url",
    concurrency: int | tuple | None = None,
) -> ray.data.Dataset:
    """scan → predicates → cascade: the `Files->scan` + `Engine->add` path
    (Files.pm:215-240) as one lazy Dataset pipeline."""
    if ignore_empty:
        ds = filter_empty(ds)
    if collapse and "inode_id" in ds.schema().names:
        ds = collapse_identity(ds)
    stages = resolve_chain(chain)
    return dedup_cascade(ds, stages, id_col=id_col, concurrency=concurrency)


def _report_group(g: pd.DataFrame) -> pd.DataFrame:
    urls = sorted(g["url"])
    return pd.DataFrame(
        {
            "cluster_id": [g["cluster_id"].iloc[0]],
            "n_members": [len(urls)],
            "members": ["\t".join(urls)],
        }
    )


def duplicate_report(result: ray.data.Dataset) -> ray.data.Dataset:
    """The CLI duplicate report (CLI.pm:285-310): only blocks with >1 member,
    members tab-joined in lexicographic order — one row per duplicate
    cluster.  Render with ``report_text`` for the byte-exact TSV."""
    dups = result.map_batches(
        lambda t: t.filter(pc.greater(t["n_members"], 1)), batch_format="pyarrow"
    )
    return dups.select_columns(["cluster_id", "url", "n_members"]).groupby(
        "cluster_id"
    ).map_groups(_report_group, batch_format="pandas")


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
