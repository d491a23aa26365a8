"""Dedup POLICY planners — deciding what to DO about duplicates.

Finding near-duplicates is half the job; the deployment decisions sit
downstream, and both of these are knobs the reference exposes in spirit
through its blocking-chain config (``--alg``, CLI.pm:67-80 — how
aggressive should grouping be?) re-expressed for a training corpus:

1. ``soft_dedup_weights`` — down-WEIGHT duplicates instead of deleting
   them (the SoftDedup / duplicate-aware-sampling policy, arXiv
   2407.06014; also the D4 paper's reweighting baseline): every member
   of a near-dup cluster of size ``m`` gets sampling weight ``1/m`` so
   the whole family contributes ~one document of expected training
   mass, preserving coverage while killing over-representation.
   Exact-integer: ``weight_bp = 10000 // m`` so the output is
   order-independent and SQL-twin-checkable.  Shape: the corpus-sized
   cluster assignment moves through ONE ``cluster_id``-keyed exchange
   (two short string columns, no text); sizes resolve locally because
   members co-locate.

2. ``dedup_threshold_sweep`` — the Jaccard-threshold tuning CURVE: one
   row per candidate cutoff with the pair / dup-doc / component /
   keep-first-removal counts, so the knob that costs real money
   (too low = over-deletion of legitimate variants, too high = dup
   bloat survives) is chosen from measured counts.  Pairs are verified
   ONCE at the loosest cutoff (the compute-once-filter-many shape of
   ``evaluation.simhash_threshold_sweep``); tighter cutoffs are
   vectorized filters over the OUTPUT-sized pair list.  Components per
   cutoff reuse the ``count()``-gated driver-DSU / distributed
   label-propagation decision that ``near.minhash_dedup_clusters``
   makes — nothing corpus-sized ever reaches the driver.

   LSH-recall footnote: the sweep's loosest cutoff must stay inside the
   band config's certified range (default 42 bands × 3 rows ⇒ analytic
   miss probability < 2e-8 at J ≥ 0.7, the documented BASELINE.md
   bound); sweeping below that calls for the exact
   ``near.ngram_jaccard_pairs`` path instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from data_dedup_ray.engine.exchange import hash_exchange, key_partition

_WEIGHTS_SCHEMA = pa.schema([
    ("url", pa.string()), ("cluster_id", pa.string()),
    ("n_copies", pa.int64()), ("weight_bp", pa.int64()),
])

_SWEEP_SCHEMA = pa.schema([
    ("t_bp", pa.int64()), ("n_dup_pairs", pa.int64()),
    ("n_dup_docs", pa.int64()), ("n_clusters", pa.int64()),
    ("n_removed", pa.int64()), ("docs_kept", pa.int64()),
])


def soft_dedup_weights(
    ds: ray.data.Dataset, *, threshold: float = 0.7,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """``(url, cluster_id, n_copies, weight_bp)`` — duplicate-aware
    sampling weights: every page weighted ``10000 // cluster_size``.

    One ``cluster_id``-keyed exchange over the (url, cluster_id)
    assignment; all members of a cluster land in one partition, so
    ``n_copies`` is a local groupby-size — no second shuffle, no
    driver-side state."""
    from data_dedup_ray.pipelines import near

    P = num_partitions
    clusters = near.minhash_dedup_clusters(ds, threshold=threshold)

    def prep(t: pa.Table) -> pa.Table:
        cid = t["cluster_id"].combine_chunks()
        return pa.table({
            "url": t["url"].combine_chunks(),
            "cluster_id": cid,
            "_part": pa.array(key_partition(
                cid.to_numpy(zero_copy_only=False), P)),
        })

    def weigh(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "url": pd.Series([], dtype=object),
                "cluster_id": pd.Series([], dtype=object),
                "n_copies": pd.Series([], dtype=np.int64),
                "weight_bp": pd.Series([], dtype=np.int64),
            })
        n = df.groupby("cluster_id")["url"].transform("size") \
              .to_numpy(np.int64)
        out = df[["url", "cluster_id"]].copy()
        out["n_copies"] = n
        out["weight_bp"] = 10000 // n
        return out

    return hash_exchange(
        [clusters.map_batches(prep, batch_format="pyarrow")],
        weigh, num_partitions=P, schema=_WEIGHTS_SCHEMA,
    )


def soft_dedup_weights_sql(threshold: float = 0.7) -> str:
    """Closure labels (near_dup_clusters_sql verbatim) + per-cluster
    count + the identical integer weight arithmetic."""
    from data_dedup_ray.oracles import near_dup_clusters_sql

    return (
        "WITH labels AS (" + near_dup_clusters_sql(threshold) + "),\n"
        "sz AS (SELECT cluster_id, count(*) AS n_copies FROM labels"
        " GROUP BY cluster_id)\n"
        "SELECT l.url, l.cluster_id, CAST(s.n_copies AS BIGINT)"
        " AS n_copies,"
        " CAST(10000 // s.n_copies AS BIGINT) AS weight_bp\n"
        "FROM labels l JOIN sz s USING (cluster_id)"
    )


DEFAULT_SWEEP_BP = (7000, 7500, 8000, 8500, 9000)


def dedup_threshold_sweep(
    ds: ray.data.Dataset, *, thresholds_bp=DEFAULT_SWEEP_BP,
    dsu_max_edges: int = 20_000_000, num_partitions: int = 32,
) -> ray.data.Dataset:
    """One planner row per Jaccard cutoff: ``(t_bp, n_dup_pairs,
    n_dup_docs, n_clusters, n_removed, docs_kept)``.

    ``n_dup_docs`` counts pages in ≥1 qualifying pair, ``n_clusters``
    their connected components, ``n_removed = n_dup_docs - n_clusters``
    (keep-first deletes everything but one representative per
    component), ``docs_kept = n_pages - n_removed``."""
    from data_dedup_ray.pipelines import near
    from data_dedup_ray.pipelines.components import dsu_components

    cuts = sorted(int(t) for t in thresholds_bp)
    t_lo = cuts[0] / 10000.0
    n_pages = ds.count()
    edges = near.minhash_dedup_pairs(ds, threshold=t_lo).materialize()

    rows: list[dict] = []
    if edges.count() <= dsu_max_edges:
        df = edges.to_pandas()
        jac = df["jaccard"].to_numpy() if len(df) else np.zeros(0)
        for t_bp in cuts:
            # the identical IEEE-double predicate the verify stage and
            # the SQL twin apply: j >= t with t = t_bp/10000 as a double
            sub = df[jac >= t_bp / 10000.0] if len(df) else df
            assignment = dsu_components(sub, max_edges=dsu_max_edges)
            n_dup_docs = len(assignment)
            n_clusters = len(set(assignment.values()))
            rows.append(_sweep_row(
                t_bp, len(sub), n_dup_docs, n_clusters, n_pages))
    else:
        for t_bp in cuts:
            rows.append(_sweep_cutoff_distributed(
                edges, t_bp, n_pages, num_partitions))
    out = pd.DataFrame(rows, columns=[f.name for f in _SWEEP_SCHEMA])
    return ray.data.from_arrow(
        pa.Table.from_pandas(out, schema=_SWEEP_SCHEMA,
                             preserve_index=False))


def _sweep_row(t_bp: int, n_pairs: int, n_dup_docs: int,
               n_clusters: int, n_pages: int) -> dict:
    n_removed = n_dup_docs - n_clusters
    return {
        "t_bp": t_bp, "n_dup_pairs": n_pairs, "n_dup_docs": n_dup_docs,
        "n_clusters": n_clusters, "n_removed": n_removed,
        "docs_kept": n_pages - n_removed,
    }


def _sweep_cutoff_distributed(
    edges: ray.data.Dataset, t_bp: int, n_pages: int, P: int,
) -> dict:
    """Past the driver guard: filter the (output-sized) edge Dataset,
    derive the endpoint node set with one url-keyed distinct exchange,
    and count components via distributed label propagation — the same
    fallback ladder as ``minhash_dedup_clusters``."""
    from data_dedup_ray.pipelines.components import label_propagation

    e = edges.filter(expr=f"jaccard >= {t_bp / 10000.0!r}").materialize()
    n_pairs = e.count()
    if not n_pairs:
        return _sweep_row(t_bp, 0, 0, 0, n_pages)

    def endpoints(t: pa.Table) -> pa.Table:
        u = pa.concat_arrays([
            t["url_a"].combine_chunks(), t["url_b"].combine_chunks(),
        ])
        out = pa.table({"url": u})
        return out.append_column("_part", pa.array(key_partition(
            u.to_numpy(zero_copy_only=False), P)))

    nodes = hash_exchange(
        [e.map_batches(endpoints, batch_format="pyarrow")],
        lambda df: df.drop_duplicates("url"),
        num_partitions=P, schema=pa.schema([("url", pa.string())]),
    )
    lp = label_propagation(
        nodes, e.select_columns(["url_a", "url_b"]), num_partitions=P,
    ).materialize()
    n_dup_docs = lp.count()
    n_clusters = lp.groupby("cluster_id").count().count()
    return _sweep_row(t_bp, n_pairs, n_dup_docs, n_clusters, n_pages)


def dedup_threshold_sweep_sql(thresholds_bp=DEFAULT_SWEEP_BP) -> str:
    """Per-cutoff recursive closures over the exact all-pairs shingle
    Jaccard truth, restating the identical component/removal counts."""
    from data_dedup_ray.corpus import WEB_PAGES_CTE
    from data_dedup_ray.oracles import _SHINGLE_CTES

    cuts = sorted(int(t) for t in thresholds_bp)
    t_lo = cuts[0] / 10000.0
    parts = [
        f"WITH RECURSIVE {WEB_PAGES_CTE},{_SHINGLE_CTES},",
        f"dup AS (SELECT url_a, url_b, j FROM jac WHERE j >= {t_lo!r}),",
        "np AS (SELECT count(*) AS n FROM web_pages),",
    ]
    selects = []
    for i, t_bp in enumerate(cuts):
        t = repr(t_bp / 10000.0)
        parts.append(
            f"e{i} AS (SELECT url_a AS a, url_b AS b FROM dup"
            f" WHERE j >= {t}"
            f" UNION SELECT url_b, url_a FROM dup WHERE j >= {t}),"
        )
        parts.append(
            f"r{i}(a, b) AS (SELECT a, b FROM e{i}"
            f" UNION SELECT r.a, e.b FROM r{i} r JOIN e{i} e"
            f" ON r.b = e.a),"
        )
        parts.append(
            f"c{i} AS (SELECT a AS url, least(a, min(b)) AS cluster_id"
            f" FROM r{i} GROUP BY a),"
        )
        selects.append(
            f"SELECT {t_bp} AS t_bp,"
            f" (SELECT count(*) FROM dup WHERE j >= {t}) AS n_dup_pairs,"
            f" (SELECT count(*) FROM c{i}) AS n_dup_docs,"
            f" (SELECT count(DISTINCT cluster_id) FROM c{i})"
            f" AS n_clusters,"
            f" (SELECT count(*) FROM c{i})"
            f" - (SELECT count(DISTINCT cluster_id) FROM c{i})"
            f" AS n_removed,"
            f" (SELECT n FROM np)"
            f" - ((SELECT count(*) FROM c{i})"
            f" - (SELECT count(DISTINCT cluster_id) FROM c{i}))"
            f" AS docs_kept"
        )
    body = "\n".join(parts)
    # strip the trailing comma of the final CTE
    body = body[:-1] if body.endswith(",") else body
    union = "\nUNION ALL\n".join(selects)
    return (
        f"{body}\n"
        f"SELECT CAST(t_bp AS BIGINT) AS t_bp,"
        f" CAST(n_dup_pairs AS BIGINT) AS n_dup_pairs,"
        f" CAST(n_dup_docs AS BIGINT) AS n_dup_docs,"
        f" CAST(n_clusters AS BIGINT) AS n_clusters,"
        f" CAST(n_removed AS BIGINT) AS n_removed,"
        f" CAST(docs_kept AS BIGINT) AS docs_kept"
        f" FROM ({union}) q"
    )
