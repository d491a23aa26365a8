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


_AGREE_SCHEMA = pa.schema([
    ("n_docs", pa.int64()),
    ("s_a", pa.string()), ("s_b", pa.string()), ("s_ab", pa.string()),
    ("rand_bp", pa.int64()), ("ari_bp", pa.int64()),
])

_CT_SCHEMA = pa.schema([
    ("la", pa.string()), ("lb", pa.string()), ("c", pa.int64()),
])

_SUM_SCHEMA = pa.schema([("s", pa.string()), ("n", pa.int64())])


def _comb2_sum(counts) -> int:
    """Σ C(c, 2) in arbitrary precision (object dtype keeps Python
    ints elementwise — 10¹²-doc clusters can't overflow int64)."""
    o = np.asarray(counts, dtype=object)
    return int((o * (o - 1) // 2).sum()) if len(o) else 0


def _trunc_div(num: int, den: int) -> int:
    """Integer division truncating toward ZERO — DuckDB ``//``
    semantics, so negative ARI numerators agree bit-for-bit with the
    SQL twin (Python ``//`` floors instead)."""
    q = abs(num) // abs(den)
    return -q if (num < 0) != (den < 0) else q


def clustering_rand_index(
    assign_a: ray.data.Dataset, assign_b: ray.data.Dataset, *,
    id_col: str = "url", label_col: str = "cluster_id",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Exact Rand index + Adjusted Rand Index between two clusterings of
    the same corpus, in integer basis points — the PARTITION-level
    agreement measure complementing ``detector_agreement``'s pair-set
    overlap view (Hubert & Arabie 1985; pair-counting via the
    contingency-table identity, never by materializing pairs).

    One row: ``(n_docs, s_a, s_b, s_ab, rand_bp, ari_bp)`` where
    ``s_a = Σ_i C(a_i,2)`` (co-clustered pairs in A), ``s_b`` likewise,
    ``s_ab = Σ_ij C(n_ij,2)`` (co-clustered in BOTH), and with
    ``C = C(n,2)``: ``RI = (C − s_a − s_b + 2·s_ab) / C``,
    ``ARI = 2·(C·s_ab − s_a·s_b) / (C·(s_a+s_b) − 2·s_a·s_b)``
    (truncated toward zero at 10⁴ — DuckDB ``//`` parity; the
    degenerate 0-denominator means both partitions are trivial and
    identical, reported as 10000).  ``s_*`` are decimal STRINGS: at
    10¹² docs the pair counts pass int64 (the drift.py convention).

    Scale shape: one ``id``-keyed exchange co-partitions the two
    corpus-sized ``(url, label)`` assignments and reduces each
    partition to contingency partials ``(la, lb, c)``; one pair-keyed
    exchange totals them (map-side combine); marginals re-key the
    CONTINGENCY table (≤ one row per co-cluster combination, never the
    corpus) on each side's label.  Every driver collect is a P-row
    partial-sum table."""
    P = num_partitions

    def prep(label_out: str):
        def fn(t: pa.Table) -> pa.Table:
            ids = t[id_col].combine_chunks().cast(pa.string())
            out = pa.table({
                "url": ids,
                label_out: t[label_col].combine_chunks()
                .cast(pa.string()),
            })
            return out.append_column("_part", pa.array(key_partition(
                ids.to_numpy(zero_copy_only=False), P)))
        return fn

    def join_ct(da: pd.DataFrame, db: pd.DataFrame) -> pd.DataFrame:
        if not len(da) or not len(db):
            return pd.DataFrame({"la": pd.Series(dtype=object),
                                 "lb": pd.Series(dtype=object),
                                 "c": pd.Series(dtype=np.int64)})
        m = da.merge(db, on="url")
        return m.groupby(["la", "lb"], sort=False, as_index=False) \
            .size().rename(columns={"size": "c"})

    ct_partials = hash_exchange(
        [
            assign_a.map_batches(prep("la"), batch_format="pyarrow"),
            assign_b.map_batches(prep("lb"), batch_format="pyarrow"),
        ],
        join_ct, num_partitions=P, schema=_CT_SCHEMA,
        in_schemas=[
            pa.schema([("url", pa.string()), ("la", pa.string())]),
            pa.schema([("url", pa.string()), ("lb", pa.string())]),
        ],
    )

    def ct_part(t: pa.Table) -> pa.Table:
        key = np.array(
            [f"{a}|{b}" for a, b in zip(
                t["la"].to_numpy(zero_copy_only=False),
                t["lb"].to_numpy(zero_copy_only=False))], dtype=object)
        return t.append_column("_part", pa.array(key_partition(key, P)))

    def ct_pre(t: pa.Table) -> pa.Table:
        return t.group_by(["la", "lb", "_part"]) \
            .aggregate([("c", "sum")]).rename_columns(
            ["la", "lb", "_part", "c"])

    def ct_total(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"la": pd.Series(dtype=object),
                                 "lb": pd.Series(dtype=object),
                                 "c": pd.Series(dtype=np.int64)})
        return df.groupby(["la", "lb"], sort=False, as_index=False)["c"] \
            .sum()

    ct = hash_exchange(
        [ct_partials.map_batches(ct_part, batch_format="pyarrow")],
        ct_total, num_partitions=P, schema=_CT_SCHEMA,
        in_schemas=[_CT_SCHEMA],
        pre=[ct_pre],
    ).materialize()

    def sab_partial(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy()
        return pa.table({"s": [str(_comb2_sum(c))],
                         "n": [int(c.sum())]})

    sab = ct.map_batches(sab_partial, batch_format="pyarrow").to_pandas()
    s_ab = sum(int(x) for x in sab["s"]) if len(sab) else 0
    n = int(sab["n"].sum()) if len(sab) else 0

    def marginal_sum(side: str):
        def with_part(t: pa.Table) -> pa.Table:
            t = t.select([side, "c"])
            return t.append_column("_part", pa.array(key_partition(
                t[side].to_numpy(zero_copy_only=False), P)))

        def reduce_m(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                return pd.DataFrame({"s": pd.Series(dtype=object),
                                     "n": pd.Series(dtype=np.int64)})
            m = df.groupby(side, sort=False)["c"].sum()
            return pd.DataFrame({"s": [str(_comb2_sum(m.to_numpy()))],
                                 "n": [int(m.sum())]})

        p = hash_exchange(
            [ct.map_batches(with_part, batch_format="pyarrow")],
            reduce_m, num_partitions=P, schema=_SUM_SCHEMA,
            in_schemas=[pa.schema([(side, pa.string()),
                                   ("c", pa.int64())])],
        ).to_pandas()
        return sum(int(x) for x in p["s"]) if len(p) else 0

    s_a = marginal_sum("la")
    s_b = marginal_sum("lb")

    big_c = n * (n - 1) // 2
    if big_c == 0:
        rand_bp = 10000
    else:
        rand_bp = 10000 * (big_c - s_a - s_b + 2 * s_ab) // big_c
    ari_den = big_c * (s_a + s_b) - 2 * s_a * s_b
    if ari_den == 0:
        ari_bp = 10000
    else:
        ari_bp = _trunc_div(
            10000 * 2 * (big_c * s_ab - s_a * s_b), ari_den)
    return ray.data.from_arrow(pa.table({
        "n_docs": [n], "s_a": [str(s_a)], "s_b": [str(s_b)],
        "s_ab": [str(s_ab)], "rand_bp": [rand_bp], "ari_bp": [ari_bp],
    }, schema=_AGREE_SCHEMA))


def clustering_agreement(
    sf_dir: str, *, t_loose: float = 0.7, t_tight: float = 0.85,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Driver query: how much does tightening the Jaccard knob reshuffle
    the near-dup PARTITION?  Rand/ARI between the minhash clusterings at
    ``t_loose`` and ``t_tight`` over web_pages — the partition-level
    companion to ``policy.dedup_threshold_sweep``'s count curve."""
    from data_dedup_ray.corpus import web_pages
    from data_dedup_ray.pipelines import near

    pages = web_pages(sf_dir)
    a = near.minhash_dedup_clusters(pages, threshold=t_loose)
    b = near.minhash_dedup_clusters(pages, threshold=t_tight)
    return clustering_rand_index(a, b, num_partitions=num_partitions)


def clustering_agreement_sql(t_loose: float = 0.7,
                             t_tight: float = 0.85) -> str:
    """DuckDB twin: both threshold closures verbatim, the contingency
    identity in HUGEINT (test-scale-bounded; the engine side carries
    arbitrary-precision partials), ``//`` truncation shared exactly."""
    from data_dedup_ray.oracles import near_dup_clusters_sql

    return (
        "WITH la AS (" + near_dup_clusters_sql(t_loose) + "),\n"
        "lb AS (" + near_dup_clusters_sql(t_tight) + "),\n"
        "ct AS (SELECT la.cluster_id AS a, lb.cluster_id AS b,\n"
        "  CAST(count(*) AS HUGEINT) AS c\n"
        "  FROM la JOIN lb USING (url) GROUP BY 1, 2),\n"
        "ma AS (SELECT a, sum(c) AS c FROM ct GROUP BY 1),\n"
        "mb AS (SELECT b, sum(c) AS c FROM ct GROUP BY 1),\n"
        "t AS (SELECT\n"
        "  (SELECT CAST(coalesce(sum(c), 0) AS HUGEINT) FROM ct) AS n,\n"
        "  (SELECT CAST(coalesce(sum(c*(c-1)//2), 0) AS HUGEINT)"
        " FROM ma) AS s_a,\n"
        "  (SELECT CAST(coalesce(sum(c*(c-1)//2), 0) AS HUGEINT)"
        " FROM mb) AS s_b,\n"
        "  (SELECT CAST(coalesce(sum(c*(c-1)//2), 0) AS HUGEINT)"
        " FROM ct) AS s_ab)\n"
        "SELECT CAST(n AS BIGINT) AS n_docs,\n"
        "  CAST(s_a AS VARCHAR) AS s_a, CAST(s_b AS VARCHAR) AS s_b,\n"
        "  CAST(s_ab AS VARCHAR) AS s_ab,\n"
        "  CASE WHEN n*(n-1)//2 = 0 THEN CAST(10000 AS BIGINT)\n"
        "    ELSE CAST(10000*(n*(n-1)//2 - s_a - s_b + 2*s_ab)\n"
        "      // (n*(n-1)//2) AS BIGINT) END AS rand_bp,\n"
        "  CASE WHEN (n*(n-1)//2)*(s_a+s_b) - 2*s_a*s_b = 0\n"
        "    THEN CAST(10000 AS BIGINT)\n"
        "    ELSE CAST(10000*2*((n*(n-1)//2)*s_ab - s_a*s_b)\n"
        "      // ((n*(n-1)//2)*(s_a+s_b) - 2*s_a*s_b) AS BIGINT)\n"
        "    END AS ari_bp\n"
        "FROM t"
    )


def lsh_config_recall(
    sf_dir: str, *, band_rs: tuple = (2, 3, 6), threshold: float = 0.7,
    n_perm: int = 126, num_partitions: int = 32,
) -> ray.data.Dataset:
    """The (b, r) TUNING TABLE for the LSH banding config: one
    ``dedup_pair_metrics`` row per candidate ``band_r`` (tier
    ``bandr_<r>``), grading that config's CANDIDATE pair set against
    the exact Jaccard ≥ ``threshold`` truth — ``recall_bp`` is the
    banding miss rate made visible (rows-per-band up ⇒ fewer, more
    precise candidates), ``precision_bp`` is the verify-stage workload
    efficiency (how many candidates survive exact verification).  THE
    table read before fixing ``band_r`` on a new corpus, complementing
    ``lsh_band_stats``' skew view and ``simhash_threshold_sweep``'s
    Hamming curve.

    The 126-permutation signature table is computed ONCE (sha chain —
    the SQL twin recomputes it bit-for-bit) and re-banded per config;
    candidates here are UNCAPPED full-band-agreement pairs (the oracle
    definition; production paths apply group_cap / skew splitting on
    top).  Truth is the exact AllPairs prefix-filter join, computed
    once."""
    import math

    from data_dedup_ray.corpus import web_pages
    from data_dedup_ray.engine.exchange import hash_exchange
    from data_dedup_ray.pipelines import near
    from data_dedup_ray.pipelines.near import _pairs_in_partition
    from data_dedup_ray.pipelines.sigstore import (
        SignatureBands,
        signature_rows,
    )
    from data_dedup_ray.util import stage_task

    P = num_partitions
    pages = web_pages(sf_dir).select_columns(["url", "text"])
    sig = signature_rows(pages, token_hash="sha",
                         n_perm=n_perm).materialize()
    truth = near.ngram_jaccard_pairs(
        pages, threshold=threshold,
    ).select_columns(["url_a", "url_b"]).materialize()

    outs = []
    for r in band_rs:
        assert n_perm % r == 0, (n_perm, r)
        bands = sig.map_batches(
            stage_task(SignatureBands, n_perm=n_perm, band_r=r,
                       id_col="url", num_partitions=P),
            batch_format="pyarrow", batch_size=1024,
        )

        def emit(g: pd.DataFrame) -> pd.DataFrame:
            # uncapped: the candidate set IS the metric here
            return _pairs_in_partition(
                g, key_cols=["band_id", "band_hash"], id_col="url",
                group_cap=1 << 30)

        cand = hash_exchange(
            [bands], emit, num_partitions=P,
            schema=pa.schema([("url_a", pa.string()),
                              ("url_b", pa.string())]),
            in_schemas=[pa.schema([("url", pa.string()),
                                   ("band_id", pa.int32()),
                                   ("band_hash", pa.int64())])],
        )
        outs.append(dedup_pair_metrics(cand, truth, tier=f"bandr_{r}",
                                       num_partitions=P))
    res = outs[0]
    for o in outs[1:]:
        res = res.union(o)
    return res


def lsh_config_recall_sql(band_rs: tuple = (2, 3, 6),
                          threshold: float = 0.7, *,
                          n_perm: int = 126, shingle_k: int = 5,
                          seed: int = 42) -> str:
    """DuckDB twin of ``lsh_config_recall``: the shared sha signature
    chain (``sigstore.sig_chain_ctes``, single-corpus) re-banded per
    config — a candidate pair shares a band iff ALL ``r`` of the
    band's minima agree (``GROUP BY p // r HAVING count(*) = r``; the
    Ray side keys on the band-hash combine, identical up to the
    engine-wide 2⁻⁶⁴ collision trade) — each config folded to the
    standard metric row against the exact string-shingle Jaccard
    truth."""
    from data_dedup_ray.oracles import _SHINGLE_CTES
    from data_dedup_ray.pipelines.sigstore import sig_chain_ctes

    chain = sig_chain_ctes(n_perm=n_perm, shingle_k=shingle_k,
                           seed=seed, single_corpus=True)
    frags = []
    selects = []
    for r in band_rs:
        frags.append(f"""cand{r} AS MATERIALIZED (
  SELECT DISTINCT url_a, url_b FROM (
    SELECT a.id AS url_a, b.id AS url_b
    FROM msig a JOIN msig b ON a.p = b.p AND a.v = b.v AND a.id < b.id
    GROUP BY a.id, b.id, a.p // {r} HAVING count(*) = {r})),
m{r} AS (SELECT
  (SELECT count(*) FROM cand{r}) AS n_pred,
  (SELECT count(*) FROM tru) AS n_true,
  (SELECT count(*) FROM cand{r} c JOIN tru t
     ON c.url_a = t.url_a AND c.url_b = t.url_b) AS n_hit)""")
        selects.append(f"""SELECT 'bandr_{r}' AS tier,
       CAST(n_pred AS BIGINT) AS n_pred,
       CAST(n_true AS BIGINT) AS n_true, CAST(n_hit AS BIGINT) AS n_hit,
       CAST(10000 * n_hit // greatest(n_pred, 1) AS BIGINT)
           AS precision_bp,
       CAST(10000 * n_hit // greatest(n_true, 1) AS BIGINT) AS recall_bp,
       CAST(20000 * n_hit // greatest(n_pred + n_true, 1) AS BIGINT)
           AS f1_bp
FROM m{r}""")
    return (f"WITH {chain},{_SHINGLE_CTES},\n"
            "tru AS MATERIALIZED (SELECT url_a, url_b FROM jac"
            f" WHERE j >= {threshold}),\n"
            + ",\n".join(frags) + "\n"
            + "\nUNION ALL\n".join(selects))


def shingle_k_sweep(
    sf_dir: str, *, ks: tuple = (3, 5, 7), threshold: float = 0.7,
    base_k: int = 5, num_partitions: int = 32,
) -> ray.data.Dataset:
    """``(shingle_k, n_pairs, n_shared_with_base, jaccard_to_base_bp)``
    — how the exact Jaccard ≥ ``threshold`` pair set MOVES with the
    shingle size: the k-sensitivity table completing the tuning family
    (threshold sweep, Hamming sweep, (b, r) table).  Larger k demands
    longer verbatim runs (pair sets shrink toward exact copies);
    smaller k admits looser paraphrase.  Each k's pair set is the
    exact AllPairs prefix-filter join at that k; overlap with the
    ``base_k`` set is one pair-keyed exchange per k
    (``dedup_pair_metrics`` machinery, output-sized)."""
    from data_dedup_ray.corpus import web_pages
    from data_dedup_ray.pipelines import near

    pages = web_pages(sf_dir).select_columns(["url", "text"])
    base = near.ngram_jaccard_pairs(
        pages, threshold=threshold, shingle_k=base_k,
    ).select_columns(["url_a", "url_b"]).materialize()

    outs = []
    for k in ks:
        pk = near.ngram_jaccard_pairs(
            pages, threshold=threshold, shingle_k=k,
        ).select_columns(["url_a", "url_b"]).materialize() \
            if k != base_k else base
        m = dedup_pair_metrics(pk, base, tier=f"k_{k}",
                               num_partitions=num_partitions)

        def relabel(t: pa.Table, k=k) -> pa.Table:
            d = t.to_pandas()
            n_pairs = d["n_pred"].astype(np.int64)
            n_sh = d["n_hit"].astype(np.int64)
            union = d["n_pred"] + d["n_true"] - d["n_hit"]
            return pa.table({
                "shingle_k": pa.array([k] * len(d), pa.int64()),
                "n_pairs": pa.array(n_pairs),
                "n_shared_with_base": pa.array(n_sh),
                "jaccard_to_base_bp": pa.array(
                    (10000 * n_sh // union.clip(lower=1))
                    .astype(np.int64)),
            })

        outs.append(m.map_batches(relabel, batch_format="pyarrow"))
    res = outs[0]
    for o in outs[1:]:
        res = res.union(o)
    return res


def shingle_k_sweep_sql(ks: tuple = (3, 5, 7), threshold: float = 0.7,
                        base_k: int = 5) -> str:
    """DuckDB twin: the exact string-shingle Jaccard pair set per k
    (the ``_SHINGLE_CTES`` machinery parameterized by k), base-set
    overlap and the pair-set Jaccard in integer basis points."""
    from data_dedup_ray.corpus import WEB_PAGES_CTE

    # simpler direct per-k pair CTE
    def pair_cte(k: int, name: str) -> str:
        return f"""sh{name} AS (
  SELECT DISTINCT url, array_to_string(t[i:i+{k - 1}], ' ') AS s
  FROM toks, UNNEST(generate_series(1, len(t) - {k - 1})) AS g(i)
  WHERE len(t) >= {k}),
cnt{name} AS (SELECT url, count(*) AS n FROM sh{name} GROUP BY url),
p{name} AS MATERIALIZED (
  SELECT i.url_a, i.url_b
  FROM (SELECT a.url AS url_a, b.url AS url_b, count(*) AS i
        FROM sh{name} a JOIN sh{name} b
          ON a.s = b.s AND a.url < b.url
        GROUP BY 1, 2) i
  JOIN cnt{name} ca ON ca.url = i.url_a
  JOIN cnt{name} cb ON cb.url = i.url_b
  WHERE i.i * 1.0 / (ca.n + cb.n - i.i) >= {threshold})"""

    names = {k: f"k{k}" for k in sorted(set(list(ks) + [base_k]))}
    frags = [pair_cte(k, n) for k, n in names.items()]
    b = names[base_k]
    selects = []
    for k in ks:
        n = names[k]
        selects.append(f"""SELECT CAST({k} AS BIGINT) AS shingle_k,
       (SELECT CAST(count(*) AS BIGINT) FROM p{n}) AS n_pairs,
       (SELECT CAST(count(*) AS BIGINT) FROM p{n} x JOIN p{b} y
          ON x.url_a = y.url_a AND x.url_b = y.url_b)
         AS n_shared_with_base,
       CAST(10000 * (SELECT count(*) FROM p{n} x JOIN p{b} y
                     ON x.url_a = y.url_a AND x.url_b = y.url_b)
            // greatest((SELECT count(*) FROM p{n})
                        + (SELECT count(*) FROM p{b})
                        - (SELECT count(*) FROM p{n} x JOIN p{b} y
                           ON x.url_a = y.url_a AND x.url_b = y.url_b),
                        1) AS BIGINT) AS jaccard_to_base_bp""")
    return (f"WITH {WEB_PAGES_CTE},\n"
            "toks AS (SELECT url, regexp_extract_all(text,"
            " '[a-z0-9]+') AS t FROM web_pages),\n"
            + ",\n".join(frags) + "\n"
            + "\nUNION ALL\n".join(selects))
