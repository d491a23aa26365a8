"""Per-document NOVELTY scoring against a reference corpus — the
fraction of a new page's k-shingles that exist nowhere in the reference.

``incremental_new_content`` (fpstore.py) answers the whole-doc exact
question ("is this byte string new?"); ``decontaminate`` (clean.py)
REMOVES docs overlapping a small broadcast benchmark.  This operator is
the graded middle: for every doc of a new crawl, how much of its
content is actually new relative to last crawl's corpus — the signal a
curation pass uses to prefer genuinely novel pages over shuffled
re-captures (cf. the n-gram novelty metrics used to audit generated
text against training corpora, Lee et al. 2022 / McCoy et al. 2021
"How much do language models copy...").

Definition: shingles are the repo's standing k=5 word shingles over
``[a-z0-9]+`` tokens, DISTINCT per doc (near.shingle_rows); docs with
fewer than k tokens have no shingles and emit no row (mirrors the SQL
twin exactly).  ``novelty_bp = 10^4 * |shingles \\ ref| // |shingles|``.

Scale shape: the reference corpus is NOT broadcast (it is another
crawl, not a small benchmark) — both sides meet in a gram-hash-keyed
exchange: the new side ships ``(url, gram)`` posting rows (distinct per
doc), the reference ships per-batch-deduped ``(gram)`` rows only.
Membership is one sorted-searchsorted per partition; per-(partition,
url) partials then sum in a second url-keyed exchange, so nothing
driver-sized exists anywhere.  Same two-exchange posting shape as
tfidf.sparse_cosine_pairs; SQL parity again witnesses collision-free
64-bit shingle hashing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from data_dedup_ray.engine.exchange import hash_exchange, key_partition

_OUT_SCHEMA = pa.schema([
    ("url", pa.string()), ("n_shingles", pa.int64()),
    ("n_novel", pa.int64()), ("novelty_bp", pa.int64()),
])

_POSTING = pa.schema([("url", pa.string()), ("gram", pa.int64())])
_GRAM = pa.schema([("gram", pa.int64())])
_PARTIAL = pa.schema([
    ("url", pa.string()), ("ng", pa.int64()), ("nn", pa.int64()),
])


def _explode(id_col: str, P: int, with_url: bool):
    def fn(t: pa.Table) -> pa.Table:
        blobs = t["sh"].to_pylist()
        grams = [np.frombuffer(b, dtype=np.uint64) for b in blobs]
        sizes = np.array([len(g) for g in grams], dtype=np.int64)
        cat = (np.concatenate(grams) if len(grams)
               else np.empty(0, np.uint64))
        part = (cat % np.uint64(P)).astype(np.int64)
        cols = {"gram": cat.view(np.int64), "_part": part}
        if with_url:
            urls = np.repeat(
                t[id_col].to_numpy(zero_copy_only=False), sizes)
            cols = {"url": urls, **cols}
        return pa.table(cols)
    return fn


def doc_novelty(
    new_ds: ray.data.Dataset,
    ref_ds: ray.data.Dataset,
    *,
    id_col: str = "url",
    text_col: str = "text",
    shingle_k: int = 5,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """``(url, n_shingles, n_novel, novelty_bp)`` for every doc of
    ``new_ds`` that has at least one k-shingle."""
    from data_dedup_ray.pipelines.near import shingle_rows

    P = num_partitions
    new_sh = shingle_rows(new_ds, id_col=id_col, text_col=text_col,
                          shingle_k=shingle_k)
    ref_sh = shingle_rows(ref_ds, id_col=id_col, text_col=text_col,
                          shingle_k=shingle_k)
    return _novelty_from_shingles(new_sh, ref_sh, id_col, P)


def incremental_novelty(
    new_ds: ray.data.Dataset,
    store_path: str | list[str],
    *,
    id_col: str = "url",
    text_col: str = "text",
    shingle_k: int = 5,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """``doc_novelty`` with the REFERENCE side read from a persisted
    shingle store (index.build_shingle_store) — the reference crawl's
    text is never re-read or re-tokenized; byte-identical output to the
    live pipeline (the store holds the exact shingle-hash blobs)."""
    from data_dedup_ray.pipelines.index import read_shingle_store
    from data_dedup_ray.pipelines.near import shingle_rows

    P = num_partitions
    new_sh = shingle_rows(new_ds, id_col=id_col, text_col=text_col,
                          shingle_k=shingle_k)
    ref_sh = read_shingle_store(
        store_path if isinstance(store_path, list) else [store_path])
    return _novelty_from_shingles(new_sh, ref_sh, id_col, P)


def _novelty_from_shingles(new_sh: ray.data.Dataset,
                           ref_sh: ray.data.Dataset,
                           id_col: str, P: int) -> ray.data.Dataset:
    postings = new_sh.map_batches(_explode(id_col, P, True),
                                  batch_format="pyarrow")
    ref_grams = ref_sh.map_batches(_explode(id_col, P, False),
                                   batch_format="pyarrow")

    def pre_dedup(t: pa.Table) -> pa.Table:
        g = np.unique(t["gram"].to_numpy(zero_copy_only=False))
        return pa.table({
            "gram": g,
            "_part": (g.view(np.uint64) % np.uint64(P)).astype(np.int64),
        })

    def mark(dn: pd.DataFrame, dr: pd.DataFrame) -> pd.DataFrame:
        if not len(dn):
            return pd.DataFrame({"url": pd.Series(dtype=str),
                                 "ng": pd.Series(dtype=np.int64),
                                 "nn": pd.Series(dtype=np.int64)})
        ref = np.unique(dr["gram"].to_numpy())
        grams = dn["gram"].to_numpy()
        if len(ref):
            idx = np.searchsorted(ref, grams)
            idx[idx == len(ref)] = 0
            novel = ref[idx] != grams
        else:
            novel = np.ones(len(grams), dtype=bool)
        g = (dn.assign(_novel=novel.astype(np.int64))
               .groupby("url", sort=False)
               .agg(ng=("gram", "size"), nn=("_novel", "sum"))
               .reset_index())
        return g

    partials = hash_exchange(
        [postings, ref_grams], mark, num_partitions=P,
        schema=_PARTIAL, in_schemas=[_POSTING, _GRAM],
        pre=[None, pre_dedup],
    )

    def with_url_part(t: pa.Table) -> pa.Table:
        urls = t["url"].to_numpy(zero_copy_only=False)
        return t.append_column("_part",
                               pa.array(key_partition(urls, P)))

    def rollup(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "url": pd.Series(dtype=str),
                "n_shingles": pd.Series(dtype=np.int64),
                "n_novel": pd.Series(dtype=np.int64),
                "novelty_bp": pd.Series(dtype=np.int64)})
        g = df.groupby("url", sort=False, as_index=False)[
            ["ng", "nn"]].sum()
        return pd.DataFrame({
            "url": g["url"],
            "n_shingles": g["ng"].astype(np.int64),
            "n_novel": g["nn"].astype(np.int64),
            "novelty_bp": (10000 * g["nn"] // g["ng"]).astype(np.int64),
        })

    return hash_exchange(
        [partials.map_batches(with_url_part, batch_format="pyarrow")],
        rollup, num_partitions=P,
        schema=_OUT_SCHEMA, in_schemas=[_PARTIAL],
    )


def doc_novelty_sql(shingle_k: int = 5) -> str:
    """DuckDB twin of ``doc_novelty(snapshot2, web_pages)`` — string
    shingles, same DISTINCT-per-doc definition and floor division."""
    from data_dedup_ray.pipelines.snapshots import snapshots_sql

    k = int(shingle_k)
    return snapshots_sql(f"""
, ntoks AS (SELECT url, regexp_extract_all(text, '[a-z0-9]+') AS t
            FROM snapshot2),
shn AS (
  SELECT DISTINCT url, array_to_string(t[i:i+{k - 1}], ' ') AS s
  FROM ntoks, UNNEST(generate_series(1, len(t) - {k - 1})) AS g(i)
  WHERE len(t) >= {k}),
rtoks AS (SELECT regexp_extract_all(text, '[a-z0-9]+') AS t
          FROM web_pages),
shr AS (
  SELECT DISTINCT array_to_string(t[i:i+{k - 1}], ' ') AS s
  FROM rtoks, UNNEST(generate_series(1, len(t) - {k - 1})) AS g(i)
  WHERE len(t) >= {k})
SELECT n.url, CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN r.s IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       CAST(10000 * sum(CASE WHEN r.s IS NULL THEN 1 ELSE 0 END)
            // count(*) AS BIGINT) AS novelty_bp
FROM shn n LEFT JOIN shr r ON n.s = r.s
GROUP BY n.url""")
