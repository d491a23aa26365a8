"""Per-document top-k most-similar neighbors by EXACT k-shingle Jaccard
— the text-side counterpart of search.knn_topk (embeddings): "show me
the k closest pages to this one", the primitive behind dedup-explain
views, related-content panels and manual cluster audits.

Exactness without an all-pairs scan: a neighbor with Jaccard > 0 shares
at least one shingle with the query, so candidates = (query, doc) pairs
sharing any shingle value — recall 1.0 for the top-k among
positive-similarity docs (docs with zero overlap can never rank).
Candidate volume is Σ_s df_q(s)·df(s), bounded by shingle document
frequency, generated through one coarse exchange on the shingle hash;
the exact-Jaccard verify is the shared partitioned join
(near.verify_pairs_partitioned — the corpus is tokenized once and the
blob table reused), and the final top-k is a combiner-pruned grouped
head (each batch keeps ≤ k rows per query before the shuffle).

Query set: the "every N-th base page" slice, chosen to be restatable in
SQL from the url alone (trailing path id % every == 0) so the whole
operator has an exact twin — deterministic tie-break (jaccard desc,
neighbor url asc); both engines compare the identical IEEE double.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from data_dedup_ray.corpus import web_pages
from data_dedup_ray.engine.exchange import hash_exchange

_OUT = pa.schema([("query_url", pa.string()), ("neighbor_url", pa.string()),
                  ("jaccard_bp", pa.int64()), ("rank", pa.int64())])


def _is_query(urls: pd.Series, every: int) -> np.ndarray:
    """Base pages whose trailing path id ≡ 0 (mod every) — the same
    predicate as SQL ``url LIKE 'https://site%' AND
    split_part(url,'/',5)::BIGINT % every = 0``."""
    base = urls.str.startswith("https://site")
    pid = pd.to_numeric(urls.str.rsplit("/", n=1).str[-1],
                        errors="coerce")
    return (base & (pid % every == 0)).fillna(False).to_numpy()


def similar_docs_topk(
    sf_dir: str, *, topk: int = 3, every: int = 50, shingle_k: int = 5,
    num_partitions: int = 16, max_df: int | None = None,
    _pages: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """``(query_url, neighbor_url, jaccard_bp, rank)`` — each query
    page's ``topk`` highest-Jaccard neighbors (rank 1-based; fewer rows
    when a query has fewer positive-overlap neighbors).

    ``max_df`` is the 100 TB scale guard: shingles whose document
    frequency exceeds it are dropped from CANDIDATE generation (the
    tfidf.py df-cut — a shingle's full posting list is co-located in its
    hash partition, so df is exact there), bounding candidate volume at
    Σ_s df_q(s)·min(df(s), max_df) instead of letting one boilerplate
    shingle fan out quadratically.  Default None = exact mode (recall
    1.0, the oracle contract); with a cap, a neighbor sharing ONLY
    over-cap shingles can be missed, but surviving pairs keep their
    exact Jaccard (the verify stage always scores full shingle sets).
    ``_pages`` overrides the corpus for tests."""
    from data_dedup_ray.pipelines.near import (_blob_views,
                                               _distinct_pairs,
                                               shingle_rows,
                                               verify_pairs_partitioned)
    P = num_partitions
    pages = web_pages(sf_dir) if _pages is None else _pages
    sh = shingle_rows(pages, shingle_k=shingle_k).materialize()

    def explode(t: pa.Table) -> pa.Table:
        data, offs = _blob_views(t["sh"])
        lens = np.diff(offs)
        urls = t["url"].to_pandas()
        q = _is_query(urls, every)
        return pa.table({
            "h": pa.array(data, pa.uint64()),
            "url": pa.array(np.repeat(urls.to_numpy(), lens), pa.string()),
            "q": pa.array(np.repeat(q, lens)),
            "_part": pa.array((data % np.uint64(P)).astype(np.int64)),
        })

    def cand_fn(df: pd.DataFrame) -> pd.DataFrame:
        if max_df is not None and len(df):
            # exact in-partition df (full posting list co-located here)
            dfc = df.groupby("h", sort=False)["url"].transform("size")
            df = df[dfc.to_numpy() <= max_df]
        qs = df[df["q"]][["h", "url"]].rename(columns={"url": "url_a"})
        if not len(qs):
            return pd.DataFrame({"url_a": pd.Series(dtype=object),
                                 "url_b": pd.Series(dtype=object)})
        m = qs.merge(df[["h", "url"]].rename(columns={"url": "url_b"}),
                     on="h")
        m = m[m["url_a"] != m["url_b"]]
        return m[["url_a", "url_b"]].drop_duplicates()

    cand = hash_exchange(
        [sh.map_batches(explode, batch_format="pyarrow")],
        cand_fn, num_partitions=P,
        schema=pa.schema([("url_a", pa.string()), ("url_b", pa.string())]),
        in_schemas=[pa.schema([("h", pa.uint64()), ("url", pa.string()),
                               ("q", pa.bool_())])],
    )
    cand = _distinct_pairs(cand, ["url_a", "url_b"], num_partitions=P)
    scored = verify_pairs_partitioned(
        pages, cand, shingle_k=shingle_k, threshold=0.0, sh=sh,
        num_partitions=P)

    def prune(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.sort_values(["url_a", "jaccard", "url_b"],
                            ascending=[True, False, True], kind="stable")
        df = df.groupby("url_a", sort=False).head(topk)
        h = pd.util.hash_array(df["url_a"].to_numpy(dtype=object))
        df["_part"] = (h % np.uint64(P)).astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "query_url": pd.Series(dtype=object),
                "neighbor_url": pd.Series(dtype=object),
                "jaccard_bp": pd.Series(dtype=np.int64),
                "rank": pd.Series(dtype=np.int64)})
        df = df.sort_values(["url_a", "jaccard", "url_b"],
                            ascending=[True, False, True], kind="stable")
        df = df.groupby("url_a", sort=False).head(topk)
        rank = df.groupby("url_a", sort=False).cumcount() + 1
        return pd.DataFrame({
            "query_url": df["url_a"].to_numpy(),
            "neighbor_url": df["url_b"].to_numpy(),
            "jaccard_bp": np.floor(df["jaccard"].to_numpy() * 10000)
            .astype(np.int64),
            "rank": rank.to_numpy().astype(np.int64),
        })

    return hash_exchange(
        [scored.map_batches(prune, batch_format="pyarrow")],
        final, num_partitions=P,
        schema=_OUT,
        in_schemas=[pa.schema([("url_a", pa.string()),
                               ("url_b", pa.string()),
                               ("jaccard", pa.float64())])],
    ).sort(["query_url", "rank"])


def similar_docs_topk_sql(*, topk: int = 3, every: int = 50) -> str:
    """Exact twin: symmetric jac + row_number per query (jac desc,
    neighbor asc) — both engines order the identical IEEE doubles."""
    from data_dedup_ray.corpus import WEB_PAGES_CTE
    from data_dedup_ray.oracles import _SHINGLE_CTES
    return f"""
WITH {WEB_PAGES_CTE},{_SHINGLE_CTES},
sym AS (SELECT url_a AS qu, url_b AS du, j FROM jac
        UNION ALL SELECT url_b, url_a, j FROM jac),
q AS (SELECT qu, du, j,
             row_number() OVER (PARTITION BY qu
                                ORDER BY j DESC, du) AS rnk
      FROM sym
      WHERE qu LIKE 'https://site%'
        AND CAST(split_part(qu, '/', 5) AS BIGINT) % {every} = 0)
SELECT qu AS query_url, du AS neighbor_url,
       CAST(floor(j * 10000) AS BIGINT) AS jaccard_bp,
       CAST(rnk AS BIGINT) AS rank
FROM q WHERE rnk <= {topk}
ORDER BY query_url, rank"""
