"""Incremental TIERED dedup funnel — the per-crawl disposition job.

``pipelines/tiered.py`` funnels a STATIC corpus (exact collapse first,
MinHash only for survivors).  This is its incremental counterpart: each
new-crawl page is dispatched against the persisted index through the
state ladder cheapest-first —

1. **exact tier** (32 B/doc content-hash store, fpstore.py): pages whose
   exact content already exists in the index are resolved by ONE
   sha-keyed exchange — they never reach tokenization, LSH, or the
   verify join.  On a recurring crawl most revisits are byte-identical
   (this corpus: ~1/3 of re-captures), so the expensive tiers see only
   the changed tail;
2. **near tier** (shingle store, index.py): survivors run the standard
   incremental MinHash → band → cross-side filter → exact-Jaccard
   verify; matches are near-duplicates of the index;
3. everything else is **unique** — genuinely new content.

Output: ``(url, disposition, match_url)`` for EVERY new-crawl page,
``disposition ∈ {'exact', 'near', 'unique'}``, ``match_url`` = the
MINIMUM matching index url ('' for unique) — canonical, so the result
is deterministic and SQL-checkable end-to-end.

Scale notes: the exact tier ships (sha, url) only; the near tier
inherits every 100 TB rule from ``index.incremental_near_pairs`` (index
side = stored 8 B/shingle blobs, text never re-read); the disposition
rollup is one output-sized exchange keyed on new_url.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from data_dedup_ray.engine.exchange import hash_exchange, key_partition

_OUT = pa.schema([("url", pa.string()), ("disposition", pa.string()),
                  ("match_url", pa.string())])


def incremental_tiered_dedup(
    new_ds: ray.data.Dataset,
    hash_store: str | list[str],
    shingle_store: str | list[str],
    *,
    threshold: float = 0.7,
    id_col: str = "url",
    text_col: str = "text",
    num_partitions: int = 32,
    **lsh_kwargs,
) -> ray.data.Dataset:
    """Disposition of every new-crawl page against the persisted index.

    ``hash_store`` / ``shingle_store`` are the crawl's persisted tiers
    (fpstore.build_content_hash_store / index.build_shingle_store —
    lists read several crawls append-only)."""
    from data_dedup_ray.pipelines.fpstore import read_content_hash_store
    from data_dedup_ray.pipelines.index import incremental_near_pairs

    P = num_partitions

    # ---- tier 1: exact matches via the 32 B/doc hash store -------------
    def prep_new(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        shas = [hashlib.sha256(s.encode("utf-8")).hexdigest()
                for s in texts]
        return pa.table({
            "sha": pa.array(shas, pa.string()),
            "url": t[id_col].combine_chunks().cast(pa.string()),
            "_part": pa.array([int(s[:8], 16) % P for s in shas],
                              pa.int64()),
        })

    def prep_idx(t: pa.Table) -> pa.Table:
        shas = t["sha"].to_pylist()
        return pa.table({
            "sha": pa.array(shas, pa.string()),
            "url": t[id_col].combine_chunks().cast(pa.string()),
            "_part": pa.array([int(s[:8], 16) % P for s in shas],
                              pa.int64()),
        })

    def min_idx_url(t: pa.Table) -> pa.Table:
        # map-side combiner: one (sha, min url) row per sha per group
        g = t.group_by(["sha", "_part"]).aggregate([("url", "min")])
        return pa.table({"sha": g["sha"], "url": g["url_min"],
                         "_part": g["_part"]})

    def exact_join(new_df: pd.DataFrame, idx_df: pd.DataFrame
                   ) -> pd.DataFrame:
        if not len(new_df):
            return pd.DataFrame({"url": pd.Series([], dtype=object),
                                 "match_url": pd.Series([], dtype=object)})
        # combiner ran per split group: re-min per sha here
        idx_min = idx_df.groupby("sha", sort=False)["url"].min()
        m = new_df["sha"].map(idx_min)
        hit = m.notna()
        return pd.DataFrame({"url": new_df.loc[hit, "url"].to_numpy(),
                             "match_url": m[hit].to_numpy()})

    exact = hash_exchange(
        [new_ds.map_batches(prep_new, batch_format="pyarrow"),
         read_content_hash_store(hash_store).map_batches(
             prep_idx, batch_format="pyarrow")],
        exact_join, num_partitions=P,
        schema=pa.schema([("url", pa.string()),
                          ("match_url", pa.string())]),
        in_schemas=[pa.schema([("sha", pa.string()),
                               ("url", pa.string())])] * 2,
        pre=[None, min_idx_url],
    ).materialize()

    # ---- tier 2: survivors pay tokenize + LSH + exact verify -----------
    # broadcast the exact-url set once (output-sized: matched pages only)
    _exact_df = exact.select_columns(["url"]).to_pandas()
    exact_url_ref = ray.put(
        set(_exact_df["url"]) if "url" in _exact_df.columns else set())

    def drop_exact(t: pa.Table) -> pa.Table:
        urls = t[id_col].combine_chunks().cast(pa.string())
        keep = ~pd.Index(urls.to_pandas()).isin(ray.get(exact_url_ref))
        return t.filter(pa.array(keep))

    survivors = new_ds.map_batches(drop_exact, batch_format="pyarrow")
    near_pairs = incremental_near_pairs(
        survivors, shingle_store, threshold=threshold, id_col=id_col,
        text_col=text_col, **lsh_kwargs)

    def near_min(t: pa.Table) -> pa.Table:
        g = t.group_by("new_url").aggregate([("index_url", "min")])
        urls = g["new_url"].combine_chunks()
        return pa.table({
            "url": urls,
            "match_url": g["index_url_min"].combine_chunks(),
            "_part": pa.array(key_partition(
                urls.to_numpy(zero_copy_only=False), P)),
        })

    def near_rollup(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"url": pd.Series([], dtype=object),
                                 "match_url": pd.Series([], dtype=object)})
        g = df.groupby("url", sort=False)["match_url"].min()
        return pd.DataFrame({"url": g.index.to_numpy(dtype=object),
                             "match_url": g.to_numpy(dtype=object)})

    near = hash_exchange(
        [near_pairs.map_batches(near_min, batch_format="pyarrow")],
        near_rollup, num_partitions=P,
        schema=pa.schema([("url", pa.string()),
                          ("match_url", pa.string())]),
        in_schemas=[pa.schema([("url", pa.string()),
                               ("match_url", pa.string())])],
    )

    # ---- disposition rollup (output-sized) ------------------------------
    def tag(dispo: str):
        def fn(t: pa.Table) -> pa.Table:
            urls = t["url"].combine_chunks()
            return pa.table({
                "url": urls,
                "disposition": pa.array([dispo] * len(urls), pa.string()),
                "match_url": t["match_url"].combine_chunks(),
                "_part": pa.array(key_partition(
                    urls.to_numpy(zero_copy_only=False), P)),
            })
        return fn

    def all_urls(t: pa.Table) -> pa.Table:
        urls = t[id_col].combine_chunks().cast(pa.string())
        return pa.table({
            "url": urls,
            "disposition": pa.array(["unique"] * len(urls), pa.string()),
            "match_url": pa.array([""] * len(urls), pa.string()),
            "_part": pa.array(key_partition(
                urls.to_numpy(zero_copy_only=False), P)),
        })

    def pick(matched: pd.DataFrame, base: pd.DataFrame) -> pd.DataFrame:
        if not len(base):
            return pd.DataFrame({c: pd.Series([], dtype=object)
                                 for c in ("url", "disposition",
                                           "match_url")})
        # 'exact' sorts before 'near': keep the cheapest-tier hit
        m = matched.sort_values(["url", "disposition"]).drop_duplicates(
            "url")
        out = base[["url"]].merge(m, on="url", how="left")
        out["disposition"] = out["disposition"].fillna("unique")
        out["match_url"] = out["match_url"].fillna("")
        return out[["url", "disposition", "match_url"]]

    matched = exact.map_batches(tag("exact"), batch_format="pyarrow") \
        .union(near.map_batches(tag("near"), batch_format="pyarrow"))
    return hash_exchange(
        [matched, new_ds.map_batches(all_urls, batch_format="pyarrow")],
        pick, num_partitions=P, schema=_OUT,
        in_schemas=[_OUT, _OUT],
    )


def incremental_tiered_dedup_sql(threshold: float = 0.7) -> str:
    """Flat DuckDB truth over web_pages (index) × snapshot2 (new):
    exact = text exists in the index (match = min such url); else near =
    exact 5-shingle Jaccard ≥ threshold with some index page (match =
    min such url); else unique."""
    from data_dedup_ray.corpus import WEB_PAGES_CTE
    from data_dedup_ray.pipelines.snapshots import SNAPSHOT2_CTE

    return f"""
WITH {WEB_PAGES_CTE},
{SNAPSHOT2_CTE},
tex AS (SELECT s2.url, min(w.url) AS m
        FROM snapshot2 s2 JOIN web_pages w ON w.text = s2.text
        GROUP BY s2.url),
tnew AS (SELECT url, text FROM snapshot2
         WHERE url NOT IN (SELECT url FROM tex)),
tnt AS (SELECT url, regexp_extract_all(text, '[a-z0-9]+') AS t FROM tnew),
tns AS (SELECT DISTINCT url, array_to_string(t[i:i+4], ' ') AS s
        FROM tnt, UNNEST(generate_series(1, len(t) - 4)) AS g(i)
        WHERE len(t) >= 5),
tit AS (SELECT url, regexp_extract_all(text, '[a-z0-9]+') AS t
        FROM web_pages),
tis AS (SELECT DISTINCT url, array_to_string(t[i:i+4], ' ') AS s
        FROM tit, UNNEST(generate_series(1, len(t) - 4)) AS g(i)
        WHERE len(t) >= 5),
tnc AS (SELECT url, count(*) AS n FROM tns GROUP BY url),
tic AS (SELECT url, count(*) AS n FROM tis GROUP BY url),
tint AS (SELECT n.url AS nu, i.url AS iu, count(*) AS c
         FROM tns n JOIN tis i ON n.s = i.s GROUP BY 1, 2),
tnear AS (SELECT nu, min(iu) AS m
          FROM tint JOIN tnc ON tnc.url = nu JOIN tic ON tic.url = iu
          WHERE c * 1.0 / (tnc.n + tic.n - c) >= {threshold}
          GROUP BY nu)
SELECT s2.url,
       CASE WHEN tex.url IS NOT NULL THEN 'exact'
            WHEN tnear.nu IS NOT NULL THEN 'near'
            ELSE 'unique' END AS disposition,
       coalesce(tex.m, tnear.m, '') AS match_url
FROM snapshot2 s2
LEFT JOIN tex ON tex.url = s2.url
LEFT JOIN tnear ON tnear.nu = s2.url"""
