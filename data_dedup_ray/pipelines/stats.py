"""Corpus-statistics operators — distribution summaries and stratified
sampling over the ``documents`` table.

The reference's only aggregates are its dedup counters
(/root/reference/lib/Data/Dedup/Engine.pm:535-578; SURVEY.md §2.6 lists
general aggregations as absent).  A training-data pipeline additionally
needs corpus distribution summaries (length percentiles per language —
the numbers that drive batch-size / filter-threshold choices) and
stratified sampling (per-language rates to rebalance a crawl).

Scale shapes
------------
- ``length_quantiles``: EXACT distributed percentiles without a
  distributed sort.  Per-batch ``(lang, n_chars) -> count`` rollup (the
  combiner bounds shuffle volume by the number of DISTINCT lengths per
  language — thousands — independent of corpus size), one sortless
  ``hash_exchange`` on lang so each language's full histogram lands in
  one partition, then a cumulative-count walk picks the order statistic.
  At 10^12 docs the histogram per language is still tiny: lengths are
  bounded (~2^20 distinct values), so this stays exact where a
  sort-based percentile would be an all-to-all shuffle of every row.
- ``stratified_sample``: embarrassingly parallel; the per-language rate
  table is a plain dict captured in the task closure (bytes, not a
  shuffle).  Like snapshots.sample_pages, membership is decided by
  ``md5(url)`` so the sample is stable across runs, partitionings and
  snapshots.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from data_dedup_ray.engine.exchange import hash_exchange, key_partition

# --------------------------------------------------------------------------
# Exact length percentiles per language (histogram rollup, not a sort)
# --------------------------------------------------------------------------

#: driver-query quantiles (basis points).  The order statistic follows
#: DuckDB's quantile_disc rule — 1-based index ``ceil(q * n)`` computed in
#: IEEE double — so the oracle matches bit-for-bit.
DEFAULT_QS_BP = (2500, 5000, 7500, 9000, 9900)


def length_quantiles(
    sf_dir: str,
    *,
    qs_bp: tuple[int, ...] = DEFAULT_QS_BP,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Exact per-language character-length percentiles:
    ``(lang, q_bp, n_chars_q)`` — one row per (language, quantile)."""
    P = num_partitions
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"]
    )

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["lang", "n_chars"]).aggregate([("n_chars", "count")])
        g = g.rename_columns(["lang", "n_chars", "cnt"])
        part = key_partition(g["lang"].to_pylist(), P)
        return g.append_column("_part", pa.array(part))

    def combine(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["lang", "n_chars", "_part"])
            .aggregate([("cnt", "sum")])
            .rename_columns(["lang", "n_chars", "_part", "cnt"])
        )

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        rows: list[tuple[str, int, int]] = []
        hist = df.groupby(["lang", "n_chars"], sort=False)["cnt"].sum()
        for lang, h in hist.groupby(level=0):
            h = h.droplevel(0).sort_index()
            cum = h.cumsum()
            n = int(cum.iloc[-1])
            for q_bp in qs_bp:
                # DuckDB quantile_disc: 1-based index ceil(q*n), float math
                idx = max(math.ceil((q_bp / 10000) * n), 1)
                val = int(cum.index[int(np.searchsorted(cum.values, idx))])
                rows.append((lang, q_bp, val))
        return pd.DataFrame(rows, columns=["lang", "q_bp", "n_chars_q"])

    part_schema = pa.schema([
        ("lang", pa.string()), ("n_chars", pa.int64()), ("cnt", pa.int64()),
    ])
    return hash_exchange(
        [docs.map_batches(partial, batch_format="pyarrow")],
        per_part,
        num_partitions=P,
        schema=pa.schema([
            ("lang", pa.string()), ("q_bp", pa.int64()),
            ("n_chars_q", pa.int64()),
        ]),
        in_schemas=[part_schema],
        pre=[combine],
    )


def length_quantiles_sql(qs_bp: tuple[int, ...] = DEFAULT_QS_BP) -> str:
    qlist = ", ".join(str(q / 10000) for q in qs_bp)
    bplist = ", ".join(str(q) for q in qs_bp)
    return f"""
WITH agg AS (
  SELECT lang, quantile_disc(n_chars, [{qlist}]) AS vs
  FROM documents GROUP BY lang)
SELECT lang, [{bplist}][i] AS q_bp, vs[i] AS n_chars_q
FROM agg, UNNEST(generate_series(1, len(vs))) AS g(i)"""


# --------------------------------------------------------------------------
# Stratified per-language hash sampling
# --------------------------------------------------------------------------

#: demo rate table for the driver query (hex-threshold on md5(doc_id):
#: '8' ≈ 50%, '4' ≈ 25%, '1' ≈ 6.25%) — downsample the dominant language
DEFAULT_RATES: dict[str, str] = {"en": "4", "zh": "8"}
DEFAULT_RATE = "c"  # ≈ 75% for everything else


def stratified_sample(
    sf_dir: str,
    *,
    rates: dict[str, str] | None = None,
    default: str = DEFAULT_RATE,
) -> ray.data.Dataset:
    """Deterministic per-language sample: keep a doc iff
    ``md5(doc_id)`` sorts below its language's hex threshold.
    ``(doc_id, lang)``; stable across runs and partitionings."""
    rates = DEFAULT_RATES if rates is None else rates

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        langs = t["lang"].to_pylist()
        keep = pa.array(
            [
                hashlib.md5(str(d).encode()).hexdigest()
                < rates.get(lang, default)
                for d, lang in zip(ids, langs)
            ],
            pa.bool_(),
        )
        t = t.filter(keep)
        return pa.table({
            "doc_id": t["doc_id"].combine_chunks(),
            "lang": t["lang"].combine_chunks(),
        })

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    return docs.map_batches(fn, batch_format="pyarrow")


def stratified_sample_sql(
    rates: dict[str, str] | None = None, default: str = DEFAULT_RATE
) -> str:
    rates = DEFAULT_RATES if rates is None else rates
    cases = " ".join(
        f"WHEN lang = '{lang}' THEN '{t}'" for lang, t in sorted(rates.items())
    )
    return (
        "SELECT doc_id, lang FROM documents"
        f" WHERE md5(CAST(doc_id AS VARCHAR)) <"
        f" (CASE {cases} ELSE '{default}' END)"
    )


# --------------------------------------------------------------------------
# Disjoint train/val/test split (hash-partitioned, leak-free, stable)
# --------------------------------------------------------------------------

#: md5 hex thresholds: [0, VAL) -> val, [VAL, TEST) -> test, rest -> train
SPLIT_VAL_BELOW = "1"     # ≈ 6.25%
SPLIT_TEST_BELOW = "2"    # ≈ 6.25%


def train_val_test_split(sf_dir: str) -> ray.data.Dataset:
    """Assign every doc to exactly one of train/val/test by ``md5(doc_id)``
    range — ``(doc_id, split)``.  Disjoint by construction, stable across
    runs/partitionings (re-running a grown corpus never moves an existing
    doc between splits — the property a training pipeline needs to avoid
    test-set leakage between corpus versions)."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        split = []
        for d in ids:
            h = hashlib.md5(str(d).encode()).hexdigest()
            split.append(
                "val" if h < SPLIT_VAL_BELOW
                else "test" if h < SPLIT_TEST_BELOW else "train"
            )
        return pa.table({
            "doc_id": t["doc_id"].combine_chunks(),
            "split": pa.array(split, pa.string()),
        })

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )
    return docs.map_batches(fn, batch_format="pyarrow")


def train_val_test_split_sql() -> str:
    return (
        "SELECT doc_id, CASE"
        f" WHEN md5(CAST(doc_id AS VARCHAR)) < '{SPLIT_VAL_BELOW}' THEN 'val'"
        f" WHEN md5(CAST(doc_id AS VARCHAR)) < '{SPLIT_TEST_BELOW}' THEN 'test'"
        " ELSE 'train' END AS split FROM documents"
    )


def cluster_aware_split(
    sf_dir: str, *, threshold: float = 0.7,
) -> ray.data.Dataset:
    """Leak-FREE train/val/test split at near-dup CLUSTER granularity —
    ``(url, split)`` where the split key is ``md5(cluster_id)``, so
    every member of a near-dup component lands in the SAME split by
    construction.  ``train_val_test_split`` hashes the doc id, which
    lets two near-identical pages straddle train and test (the
    Lee et al. 2022 contamination mechanism: near-dup leakage inflates
    eval scores); hashing the component's canonical min-url closes it.

    Scale shape: the cluster assignment is the corpus-shaped output of
    the gated closure (near.minhash_dedup_clusters); the split itself is
    one stateless vectorized map over it — no extra shuffle."""
    from data_dedup_ray.corpus import web_pages
    from data_dedup_ray.pipelines import near

    pages = web_pages(sf_dir).select_columns(["url", "text"])
    labels = near.minhash_dedup_clusters(pages, threshold=threshold)

    def fn(t: pa.Table) -> pa.Table:
        cids = t["cluster_id"].to_pylist()
        split = []
        for c in cids:
            h = hashlib.md5(str(c).encode()).hexdigest()
            split.append(
                "val" if h < SPLIT_VAL_BELOW
                else "test" if h < SPLIT_TEST_BELOW else "train"
            )
        return pa.table({
            "url": t["url"].combine_chunks().cast(pa.string()),
            "split": pa.array(split, pa.string()),
        })

    return labels.map_batches(fn, batch_format="pyarrow")


def cluster_aware_split_sql(threshold: float = 0.7) -> str:
    from data_dedup_ray.oracles import near_dup_clusters_sql

    return (
        "SELECT url, CASE"
        f" WHEN md5(cluster_id) < '{SPLIT_VAL_BELOW}' THEN 'val'"
        f" WHEN md5(cluster_id) < '{SPLIT_TEST_BELOW}' THEN 'test'"
        " ELSE 'train' END AS split FROM ("
        + near_dup_clusters_sql(threshold) + ") q"
    )


# --------------------------------------------------------------------------
# Near-dup cluster-size histogram (dedup analytics)
# --------------------------------------------------------------------------


def cluster_size_histogram(
    sf_dir: str, *, threshold: float = 0.7
) -> ray.data.Dataset:
    """Distribution of near-dup family sizes: ``(cluster_size,
    n_clusters)`` — the near-dup analog of the reference CLI's statistics
    report (unique / distinct-with-dups tallies, CLI.pm:313-321).

    Two tiny aggregations over the cluster assignment: size per cluster
    (combiner: per-batch counts per cluster_id), then clusters per size —
    both shuffle O(#clusters) and O(#distinct sizes) rows."""
    from ray.data.aggregate import Count, Sum

    from data_dedup_ray.corpus import web_pages
    from data_dedup_ray.pipelines import near

    clusters = near.minhash_dedup_clusters(
        web_pages(sf_dir), threshold=threshold
    )

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["cluster_id"]).aggregate([("cluster_id", "count")])
        return g.rename_columns(["cluster_id", "n"])

    sizes = (
        clusters.map_batches(partial, batch_format="pyarrow")
        .groupby("cluster_id")
        .aggregate(Sum(on="n", alias_name="cluster_size"))
    )
    return (
        sizes.groupby("cluster_size")
        .aggregate(Count(alias_name="n_clusters"))
    )


def cluster_size_histogram_sql(threshold: float = 0.7) -> str:
    from data_dedup_ray.oracles import near_dup_clusters_sql

    return f"""
WITH assign AS (
{near_dup_clusters_sql(threshold)}
),
sizes AS (SELECT cluster_id, count(*) AS cluster_size
          FROM assign GROUP BY cluster_id)
SELECT cluster_size, count(*) AS n_clusters
FROM sizes GROUP BY cluster_size"""


# --------------------------------------------------------------------------
# Token-budget shard assignment — a distributed ORDERED PREFIX SUM
# (LLM sequence-packing prep: place every doc at its global token offset
# in doc_id order and cut shards every `budget` tokens)
# --------------------------------------------------------------------------


def token_shards(sf_dir: str, *, budget: int = 50_000,
                 num_partitions: int = 16) -> ray.data.Dataset:
    """``(doc_id, n_tokens, tok_offset, shard_id)``: ``tok_offset`` is the
    exclusive prefix sum of token counts in global ``doc_id`` order, and
    ``shard_id = tok_offset // budget`` — the token-offset sharding a
    training pipeline uses to pack a corpus into fixed-budget shards.

    Distributed prefix-sum shape (ordered aggregates need RANGE, not
    hash, partitioning): doc_ids range-partition into contiguous blocks;
    one bucketized split serves BOTH phases — phase 1 reduces each block
    to its token total (P tiny rows to the driver), phase 2 adds the
    exclusive per-block base to each block's local cumsum.  Shuffle
    volume is two int64 columns; nothing else moves."""
    from data_dedup_ray.engine.exchange import bucketize

    P = num_partitions
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    max_id = docs.max("doc_id")
    if max_id is None:  # empty corpus: the shard table is empty too
        return ray.data.from_arrow(pa.table({
            c: pa.array([], pa.int64())
            for c in ["doc_id", "n_tokens", "tok_offset", "shard_id"]
        }))
    max_id = int(max_id)

    def counts(t: pa.Table) -> pa.Table:
        from data_dedup_ray.stages.minhash import token_counts

        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        n = token_counts(t["text"])
        part = np.minimum(ids * P // (max_id + 1), P - 1)
        return pa.table({
            "doc_id": pa.array(ids),
            "n_tokens": pa.array(n),
            "_part": pa.array(part.astype(np.int64)),
        })

    in_schema = pa.schema([("doc_id", pa.int64()), ("n_tokens", pa.int64()),
                           ("_part", pa.int64())])
    buckets = bucketize(docs.map_batches(counts, batch_format="pyarrow"),
                        num_partitions=P, in_schema=in_schema)

    def block_total(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"part": pd.Series(dtype=np.int64),
                                 "total": pd.Series(dtype=np.int64)})
        p = int(min(df["doc_id"].iloc[0] * P // (max_id + 1), P - 1))
        return pd.DataFrame({"part": [p],
                             "total": [int(df["n_tokens"].sum())]})

    totals = hash_exchange(
        [buckets], block_total, num_partitions=P,
        schema=pa.schema([("part", pa.int64()), ("total", pa.int64())]),
        in_schemas=[in_schema.remove(2)],
    ).to_pandas()
    base = np.zeros(P, dtype=np.int64)
    for _, r in totals.iterrows():
        base[int(r["part"])] = int(r["total"])
    base = np.concatenate([[0], np.cumsum(base)[:-1]])  # exclusive bases

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({c: pd.Series(dtype=np.int64) for c in
                                 ["doc_id", "n_tokens", "tok_offset",
                                  "shard_id"]})
        df = df.sort_values("doc_id", kind="stable")
        p = int(min(df["doc_id"].iloc[0] * P // (max_id + 1), P - 1))
        n = df["n_tokens"].to_numpy()
        off = base[p] + np.cumsum(n) - n
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "n_tokens": n,
            "tok_offset": off,
            "shard_id": off // budget,
        })

    return hash_exchange(
        [buckets], assign, num_partitions=P,
        schema=pa.schema([("doc_id", pa.int64()), ("n_tokens", pa.int64()),
                          ("tok_offset", pa.int64()),
                          ("shard_id", pa.int64())]),
        in_schemas=[in_schema.remove(2)],
    )


def token_shards_sql(budget: int = 50_000) -> str:
    return f"""
SELECT doc_id,
       len(regexp_extract_all(text, '[a-z0-9]+')) AS n_tokens,
       CAST(sum(len(regexp_extract_all(text, '[a-z0-9]+')))
              OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
            - len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT)
         AS tok_offset,
       CAST((sum(len(regexp_extract_all(text, '[a-z0-9]+')))
               OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
             - len(regexp_extract_all(text, '[a-z0-9]+'))) // {budget}
            AS BIGINT) AS shard_id
FROM documents"""
