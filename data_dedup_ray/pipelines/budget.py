"""Budgeted corpus selection — the end-to-end curation capstone:
dedup to one representative per near-dup family, then pack the best
captures into a fixed TOKEN BUDGET.

Training runs are provisioned in tokens, not documents: after near-dup
collapse you still hold more text than the budget, and the standard
recipe is "dedup, rank, take the prefix".  This operator composes three
exact pieces end-to-end, each already oracle-pinned on its own:

1. **dedup** — the MEDOID representative of every near-dup cluster
   (clean.near_dup_keep_medoid: most-central member, not an arbitrary
   one), so each page family contributes exactly one capture;
2. **rank** — survivors ordered by (token count DESC, url): longest
   capture first (keep_best's quality proxy, now as a global order);
3. **cut** — keep the maximal prefix whose cumulative token count stays
   ≤ the budget (a doc is kept iff the running sum INCLUDING it fits).

Distributed shape: the global order comes from the shared
sampled-bounds composite ranks (sortedneighborhood.rank_by_composite;
the composite inverts the token count into a fixed-width decimal so
ascending string order = tokens-desc order), and the running sum is the
two-phase ordered prefix sum over the SAME buckets — per-bucket token
totals give exclusive bases, each bucket then cuts locally.  Only
survivor rows (already cluster-collapsed, output-sized relative to the
raw crawl) enter either exchange; the driver sees P partial sums.

Fully SQL-twinned: closure + argmax + window running sum."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from data_dedup_ray.corpus import web_pages
from data_dedup_ray.engine.exchange import bucketize, hash_exchange

_SEP = "\x00"
_WIDTH = 12          # fixed-width inverted token count (corpus < 10¹² tok/doc)


def budgeted_corpus(
    sf_dir: str, *, token_budget: int = 100_000, threshold: float = 0.7,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """``(url, n_tokens, cum_tokens)`` — the kept prefix, sorted by url."""
    from data_dedup_ray.pipelines.clean import near_dup_keep_medoid
    from data_dedup_ray.pipelines.near import _hash_str_column
    from data_dedup_ray.stages.minhash import token_counts
    P = num_partitions
    survivors = near_dup_keep_medoid(
        sf_dir, threshold=threshold, num_partitions=P
    ).select_columns(["url"])
    pages = web_pages(sf_dir).select_columns(["url", "text"])

    def with_upart(col):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t.append_column("_part",
                                       pa.array([], type=pa.int64()))
            h = _hash_str_column(t[col])
            return t.append_column(
                "_part", pa.array((h % np.uint64(P)).astype(np.int64)))
        return fn

    def prep_tok(t: pa.Table) -> pa.Table:
        n = token_counts(t["text"], lowercase=True)
        out = pa.table({"url": t["url"].combine_chunks(),
                        "n_tokens": pa.array(n)})
        return with_upart("url")(out)

    def join_tok(sdf: pd.DataFrame, tdf: pd.DataFrame) -> pd.DataFrame:
        return sdf.merge(tdf, on="url", how="inner")

    scored = hash_exchange(
        [survivors.map_batches(with_upart("url"), batch_format="pyarrow"),
         pages.map_batches(prep_tok, batch_format="pyarrow")],
        join_tok, num_partitions=P,
        schema=pa.schema([("url", pa.string()), ("n_tokens", pa.int64())]),
        in_schemas=[pa.schema([("url", pa.string())]),
                    pa.schema([("url", pa.string()),
                               ("n_tokens", pa.int64())])],
    )

    # composite = inverted fixed-width token count + NUL + url:
    # ascending string order == (n_tokens DESC, url ASC)
    def comp_rows(t: pa.Table) -> pa.Table:
        n = t["n_tokens"].to_numpy(zero_copy_only=False)
        inv = pa.array([f"{10**_WIDTH - 1 - v:0{_WIDTH}d}" for v in n],
                       pa.string())
        comp = pc.binary_join_element_wise(
            inv, t["url"].combine_chunks(), _SEP)
        return pa.table({"comp": comp, "url": t["url"].combine_chunks(),
                         "n_tokens": t["n_tokens"].combine_chunks()})

    comp = scored.map_batches(comp_rows,
                              batch_format="pyarrow").materialize()

    # sampled range bounds over the composites (shared recipe)
    def sample(t: pa.Table) -> pa.Table:
        c = np.sort(t["comp"].to_numpy(zero_copy_only=False))
        idx = np.unique(np.linspace(0, len(c) - 1, num=9)
                        .astype(np.int64)) if len(c) else \
            np.empty(0, np.int64)
        return pa.table({"comp": pa.array(c[idx], pa.string())})

    samp = np.sort(comp.map_batches(sample, batch_format="pyarrow")
                   .to_pandas()["comp"].to_numpy(dtype=object))
    bounds = samp[np.linspace(0, len(samp) - 1, num=P + 1)
                  .astype(np.int64)][1:-1] if len(samp) >= P else samp[:0]

    def with_rpart(t: pa.Table) -> pa.Table:
        c = t["comp"].to_numpy(zero_copy_only=False)
        return t.append_column("_part", pa.array(
            np.searchsorted(bounds, c, side="right").astype(np.int64)))

    in_schema = pa.schema([("comp", pa.string()), ("url", pa.string()),
                           ("n_tokens", pa.int64())])
    buckets = bucketize(
        comp.map_batches(with_rpart, batch_format="pyarrow"),
        num_partitions=P, in_schema=in_schema)

    def bucket_sum(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"part": pd.Series(dtype=np.int64),
                                 "tok": pd.Series(dtype=np.int64)})
        p = int(np.searchsorted(bounds, df["comp"].iloc[0],
                                side="right"))
        return pd.DataFrame({"part": [p],
                             "tok": [int(df["n_tokens"].sum())]})

    totals = hash_exchange(
        [buckets], bucket_sum, num_partitions=P,
        schema=pa.schema([("part", pa.int64()), ("tok", pa.int64())]),
        in_schemas=[in_schema],
    ).to_pandas()
    toks = np.zeros(P, np.int64)
    for _, r in totals.iterrows():
        toks[int(r["part"])] = int(r["tok"])
    base = np.concatenate([[0], np.cumsum(toks)[:-1]])

    def cut(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"url": pd.Series(dtype=object),
                                 "n_tokens": pd.Series(dtype=np.int64),
                                 "cum_tokens": pd.Series(dtype=np.int64)})
        p = int(np.searchsorted(bounds, df["comp"].iloc[0],
                                side="right"))
        df = df.sort_values("comp", kind="stable")
        cum = base[p] + df["n_tokens"].cumsum().to_numpy()
        keep = cum <= token_budget
        return pd.DataFrame({"url": df["url"].to_numpy()[keep],
                             "n_tokens":
                                 df["n_tokens"].to_numpy()[keep],
                             "cum_tokens": cum[keep]})

    return hash_exchange(
        [buckets], cut, num_partitions=P,
        schema=pa.schema([("url", pa.string()), ("n_tokens", pa.int64()),
                          ("cum_tokens", pa.int64())]),
        in_schemas=[in_schema],
    ).sort("url")


def budgeted_corpus_sql(*, token_budget: int = 100_000,
                        threshold: float = 0.7) -> str:
    from data_dedup_ray.corpus import WEB_PAGES_CTE
    from data_dedup_ray.pipelines.clean import near_dup_keep_medoid_sql
    return f"""
WITH RECURSIVE {WEB_PAGES_CTE},
medoids AS (
{near_dup_keep_medoid_sql(threshold)}
),
q AS (SELECT m.url,
             CAST(len(regexp_extract_all(lower(w.text), '[a-z0-9]+'))
                  AS BIGINT) AS n_tokens
      FROM medoids m JOIN web_pages w ON w.url = m.url),
r AS (SELECT url, n_tokens,
             CAST(sum(n_tokens) OVER (ORDER BY n_tokens DESC, url
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      FROM q)
SELECT url, n_tokens, cum_tokens FROM r
WHERE cum_tokens <= {token_budget}
ORDER BY url"""
