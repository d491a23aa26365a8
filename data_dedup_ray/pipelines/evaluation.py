"""Dedup-tier QUALITY evaluation — precision / recall / F1 of each cheap
similarity tier against exact-Jaccard ground truth.

A production dedup funnel (pipelines/tiered.py, incrfunnel.py) stacks
cheap detectors in front of expensive verification; whether a tier is
worth its slot is an empirical question: what fraction of its predicted
pairs are real near-dups (precision), and what fraction of the real
near-dups does it surface (recall)?  This module answers it with the
same integer-exact discipline as the rest of the repo:

- ground truth = the exact shingle-Jaccard >= threshold pair set, i.e.
  the OUTPUT of ``near.minhash_dedup_pairs`` (LSH candidates + exact
  verify — recall 1.0 vs brute force by the repo's standing oracle);
- tiers under test = ``near.simhash_pairs(hash_fn='sha')`` (Hamming <=
  3 fingerprint matching) and ``tfidf.sparse_cosine_pairs`` in exact
  integer TF mode — both fully SQL-restatable, so the whole eval has a
  DuckDB twin (``oracles.dedup_tier_eval_sql``);
- metrics are integer basis points: ``precision_bp = 10^4*hit//pred``,
  ``recall_bp = 10^4*hit//true``, and F1 via the Dice identity
  ``f1 = 2*hit/(pred+true)`` so no float division ever happens.

Scale shape: pair sets are OUTPUT-sized (two string columns); matching
is one co-partitioned hash exchange keyed on ``url_a`` (identical pairs
share ``url_a``, so an inner merge per partition is exact), emitting
one 3-integer partial per partition.  Only the P-row partial table ever
reaches the driver.  The corpus itself is read only by the detectors,
which already ship their own partitioned pipelines.

The reference engine has no similarity tiers to grade (its digest chain
is exact by construction, SURVEY §2.2); this is north_rule extension
surface — the measurement harness a 100 TB dedup deployment tunes its
funnel with (cf. the precision/recall framing of Gyawali et al. 2024 and
the SimHash/MinHash comparisons in Henzinger 2006).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from data_dedup_ray.engine.exchange import hash_exchange, key_partition

_METRIC_SCHEMA = pa.schema([
    ("tier", pa.string()), ("n_pred", pa.int64()), ("n_true", pa.int64()),
    ("n_hit", pa.int64()), ("precision_bp", pa.int64()),
    ("recall_bp", pa.int64()), ("f1_bp", pa.int64()),
])

_PAIR_SCHEMA = pa.schema([("url_a", pa.string()), ("url_b", pa.string())])

_PARTIAL_SCHEMA = pa.schema([
    ("n_pred", pa.int64()), ("n_true", pa.int64()), ("n_hit", pa.int64()),
])


def dedup_pair_metrics(
    pred: ray.data.Dataset,
    true: ray.data.Dataset,
    *,
    tier: str,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """One ``(tier, n_pred, n_true, n_hit, precision_bp, recall_bp,
    f1_bp)`` row grading ``pred`` against ``true``.

    Both inputs are ``(url_a, url_b)`` pair Datasets with ``url_a <
    url_b`` (every detector in this repo emits that orientation).
    Duplicate pair rows on either side are collapsed before counting.
    """
    P = num_partitions

    def tag(t: pa.Table) -> pa.Table:
        ua = t["url_a"].combine_chunks().cast(pa.string())
        return pa.table({
            "url_a": ua,
            "url_b": t["url_b"].combine_chunks().cast(pa.string()),
            "_part": pa.array(key_partition(
                ua.to_numpy(zero_copy_only=False), P)),
        })

    def pre_dedup(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates(["url_a", "url_b"])
        return pa.Table.from_pandas(df, preserve_index=False)

    def partials(dp: pd.DataFrame, dt: pd.DataFrame) -> pd.DataFrame:
        dp = dp.drop_duplicates(["url_a", "url_b"])
        dt = dt.drop_duplicates(["url_a", "url_b"])
        n_hit = len(dp.merge(dt, on=["url_a", "url_b"], how="inner"))
        return pd.DataFrame({"n_pred": [len(dp)], "n_true": [len(dt)],
                             "n_hit": [n_hit]})

    parts = hash_exchange(
        [pred.select_columns(["url_a", "url_b"])
             .map_batches(tag, batch_format="pyarrow"),
         true.select_columns(["url_a", "url_b"])
             .map_batches(tag, batch_format="pyarrow")],
        partials,
        num_partitions=P,
        schema=_PARTIAL_SCHEMA,
        in_schemas=[_PAIR_SCHEMA, _PAIR_SCHEMA],
        pre=[pre_dedup, pre_dedup],
    )
    # P rows of 3 ints — partition-count-sized, never data-sized
    df = parts.to_pandas()
    n_pred = int(df["n_pred"].sum())
    n_true = int(df["n_true"].sum())
    n_hit = int(df["n_hit"].sum())
    return ray.data.from_arrow(pa.table({
        "tier": [tier],
        "n_pred": [n_pred], "n_true": [n_true], "n_hit": [n_hit],
        "precision_bp": [10000 * n_hit // max(n_pred, 1)],
        "recall_bp": [10000 * n_hit // max(n_true, 1)],
        "f1_bp": [20000 * n_hit // max(n_pred + n_true, 1)],
    }, schema=_METRIC_SCHEMA))


def estimator_pair_eval(
    pred_pairs: ray.data.Dataset,
    true_pairs: ray.data.Dataset,
    *,
    tier: str,
    pair_cols: tuple[str, str] = ("new_url", "index_url"),
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """``dedup_pair_metrics`` over pair tables with arbitrary column
    names (e.g. the cross-corpus ``(new_url, index_url)`` orientation
    of the incremental pipelines)."""
    a, b = pair_cols
    ren = {a: "url_a", b: "url_b"}
    return dedup_pair_metrics(
        pred_pairs.select_columns([a, b]).rename_columns(ren),
        true_pairs.select_columns([a, b]).rename_columns(ren),
        tier=tier, num_partitions=num_partitions)


def simhash_threshold_sweep(
    ds: ray.data.Dataset,
    *,
    id_col: str = "url",
    text_col: str = "text",
    threshold: float = 0.7,
    max_hamming: int = 3,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Precision/recall CURVE over the SimHash Hamming cutoff — one
    metric row per ``h in 0..max_hamming`` (tier ``'h<h>'``), all graded
    against the same exact Jaccard >= ``threshold`` truth set.

    This is the tuning view: the fingerprint pair set is computed ONCE
    at the loosest cutoff (pairs carry their Hamming distance), each
    tighter cutoff is a vectorized filter over that output-sized list,
    and the truth set is materialized once.  Monotone by construction:
    ``n_pred`` and ``n_hit`` are non-decreasing in h."""
    from data_dedup_ray.pipelines import near

    truth = near.minhash_dedup_pairs(
        ds, threshold=threshold, id_col=id_col, text_col=text_col,
    ).select_columns(["url_a", "url_b"]).materialize()
    pairs = near.simhash_pairs(
        ds, id_col=id_col, text_col=text_col, hash_fn="sha",
        max_hamming=max_hamming,
    ).materialize()

    out = None
    for h in range(max_hamming + 1):
        pred = pairs.filter(expr=f"hamming <= {h}")
        row = dedup_pair_metrics(pred, truth, tier=f"h{h}",
                                 num_partitions=num_partitions)
        out = row if out is None else out.union(row)
    return out


_SAVINGS_SCHEMA = pa.schema([
    ("n_docs", pa.int64()), ("n_removed", pa.int64()),
    ("tokens_total", pa.int64()), ("tokens_removed", pa.int64()),
    ("tokens_removed_bp", pa.int64()),
    ("chars_total", pa.int64()), ("chars_removed", pa.int64()),
    ("chars_removed_bp", pa.int64()),
])


def dedup_savings(
    ds: ray.data.Dataset,
    *,
    id_col: str = "url",
    text_col: str = "text",
    threshold: float = 0.7,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """What keep-first near-dup dedup actually SAVES: one row of doc /
    token / char totals and removed amounts (removed = every non-min
    member of a near-dup component — exactly the rows
    ``clean.near_dup_keep_first`` drops), with integer basis-point
    ratios.  This is the number a training-cost planner reads:
    ``tokens_removed_bp`` is compute not spent re-training on dups.

    Scale shape: cluster labels and per-doc (token, char) counts meet
    in one url-keyed exchange; everything after is a handful of integer
    partials per partition."""
    from data_dedup_ray.pipelines import near

    labels = near.minhash_dedup_clusters(
        ds, threshold=threshold, id_col=id_col, text_col=text_col)

    def counts(t: pa.Table) -> pa.Table:
        from data_dedup_ray.stages.minhash import tokenize_batch

        texts = t[text_col].combine_chunks()
        _, nt = tokenize_batch(texts)
        nb = pa.compute.utf8_length(texts)
        urls = t[id_col].combine_chunks().cast(pa.string())
        return pa.table({
            "url": urls, "nt": nt, "nb": nb.cast(pa.int64()),
            "_part": pa.array(key_partition(
                urls.to_numpy(zero_copy_only=False), num_partitions)),
        })

    def with_part(t: pa.Table) -> pa.Table:
        urls = t["url"].to_numpy(zero_copy_only=False)
        return t.append_column("_part", pa.array(
            key_partition(urls, num_partitions)))

    def partials(dl: pd.DataFrame, dc: pd.DataFrame) -> pd.DataFrame:
        m = dl.merge(dc, on="url", how="inner")
        rm = m["url"] != m["cluster_id"]
        return pd.DataFrame({
            "n_docs": [len(m)], "n_removed": [int(rm.sum())],
            "tokens_total": [int(m["nt"].sum())],
            "tokens_removed": [int(m.loc[rm, "nt"].sum())],
            "chars_total": [int(m["nb"].sum())],
            "chars_removed": [int(m.loc[rm, "nb"].sum())],
        })

    p = hash_exchange(
        [labels.map_batches(with_part, batch_format="pyarrow"),
         ds.map_batches(counts, batch_format="pyarrow")],
        partials, num_partitions=num_partitions,
        schema=pa.schema([
            ("n_docs", pa.int64()), ("n_removed", pa.int64()),
            ("tokens_total", pa.int64()), ("tokens_removed", pa.int64()),
            ("chars_total", pa.int64()), ("chars_removed", pa.int64())]),
        in_schemas=[
            pa.schema([("url", pa.string()),
                       ("cluster_id", pa.string())]),
            pa.schema([("url", pa.string()), ("nt", pa.int64()),
                       ("nb", pa.int64())])],
    ).to_pandas()  # P rows of integers
    tt, tr = int(p["tokens_total"].sum()), int(p["tokens_removed"].sum())
    ct, cr = int(p["chars_total"].sum()), int(p["chars_removed"].sum())
    return ray.data.from_arrow(pa.table({
        "n_docs": [int(p["n_docs"].sum())],
        "n_removed": [int(p["n_removed"].sum())],
        "tokens_total": [tt], "tokens_removed": [tr],
        "tokens_removed_bp": [10000 * tr // max(tt, 1)],
        "chars_total": [ct], "chars_removed": [cr],
        "chars_removed_bp": [10000 * cr // max(ct, 1)],
    }, schema=_SAVINGS_SCHEMA))


def dedup_tier_eval(
    ds: ray.data.Dataset,
    *,
    id_col: str = "url",
    text_col: str = "text",
    threshold: float = 0.7,
    max_df: int = 256,
    min_cos2_bp: int = 8100,
    max_hamming: int = 3,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Grade the sha-simhash and integer TF-cosine tiers against the
    exact Jaccard >= ``threshold`` truth set: one metric row per tier.

    Truth is materialized once (output-sized pair list) and co-reads
    against both tiers; the corpus is read once per detector exactly as
    in ``ensemble.ensemble_dup_edges`` (persist ``ds`` up front to share
    the scan at scale)."""
    from data_dedup_ray.pipelines import near, tfidf

    truth = near.minhash_dedup_pairs(
        ds, threshold=threshold, id_col=id_col, text_col=text_col,
    ).select_columns(["url_a", "url_b"]).materialize()

    p_sim = near.simhash_pairs(
        ds, id_col=id_col, text_col=text_col, hash_fn="sha",
        max_hamming=max_hamming,
    ).select_columns(["url_a", "url_b"])
    p_cos = tfidf.sparse_cosine_pairs(
        ds, id_col=id_col, text_col=text_col, weighting="tf",
        max_df=max_df, min_cos2_bp=min_cos2_bp,
    ).select_columns(["id_a", "id_b"]).rename_columns(
        {"id_a": "url_a", "id_b": "url_b"})

    out = None
    for tier, p in (("simhash_sha", p_sim), ("tf_cosine", p_cos)):
        row = dedup_pair_metrics(p, truth, tier=tier,
                                 num_partitions=num_partitions)
        out = row if out is None else out.union(row)
    return out
