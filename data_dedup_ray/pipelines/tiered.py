"""Tiered (funnel) dedup: exact identity collapse → MinHash/LSH on survivors.

The production shape for web-scale corpora (reference: Data-Dedup runs the
cheap digest cascade BEFORE any expensive comparison — Engine.pm's lazy
cascade, SURVEY.md §3.4 — and real Common-Crawl pipelines dedupe exact
copies before fuzzy matching for the same reason): tier 1 collapses rows
with byte-identical k-shingle sets to one representative with a single
hash-keyed exchange, tier 2 runs the full MinHash/LSH + exact-Jaccard
verify pipeline over the representatives only, and a final output-sized
join rewrites every original row with its representative's cluster label.

Semantics are EXACTLY ``near.minhash_dedup_clusters``: two rows with an
identical shingle set have Jaccard 1 ≥ threshold (they would share a
cluster anyway) and identical neighbor sets (collapsing them cannot create
or break connectivity), so the funnel is a pure cost optimization —
pinned by an equality test in tests/test_tiered.py and by reusing the
``near_dup_clusters`` SQL closure oracle verbatim.

Scale shape: the corpus is read and tokenized ONCE (``shingle_rows``);
the exact tier ships (id, blob) through one sortless exchange — the same
payload the flat pipeline ships into its verify splits — and every stage
after tier 1 sees only the deduplicated representative table, which on
template-heavy web corpora is a large constant factor smaller.  Docs with
EMPTY shingle sets are never grouped (Jaccard over two empty sets is no
pair in the flat pipeline either): each stays its own representative.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from data_dedup_ray.engine.exchange import hash_exchange, key_partition
from data_dedup_ray.pipelines.near import minhash_dedup_pairs, shingle_rows


def exact_shingle_groups(
    sh: ray.data.Dataset, *, id_col: str = "url", num_partitions: int = 64
) -> ray.data.Dataset:
    """``(id, rep, sh)`` — rep = min id over rows with byte-identical
    (canonical: np.unique-sorted) shingle blobs; the blob is carried ONLY
    on each group's representative row (null elsewhere), so the output
    doubles as (assignment table) + (tier-2 input) without a second pass.

    Empty blobs are singleton groups by definition (see module docstring),
    so every empty-set row keeps its (empty, non-null) blob and rep = id.
    """
    P = num_partitions

    def prep(t: pa.Table) -> pa.Table:
        t = t.select([id_col, "sh"])
        blobs = t["sh"].to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(blobs.astype(object))
        return t.append_column(
            "_part", pa.array((h % np.uint64(P)).astype(np.int64))
        ).append_column(
            "_empty", pc.equal(pc.binary_length(t["sh"]), 0)
        )

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({id_col: [], "rep": [], "sh": []})
        ids = df[id_col].to_numpy()
        rep = ids.copy()
        ne = ~df["_empty"].to_numpy(dtype=bool)
        if ne.any():
            rep[ne] = (df.loc[ne].groupby("sh", sort=False)[id_col]
                       .transform("min").to_numpy())
        keep = rep == ids
        return pd.DataFrame({
            id_col: ids,
            "rep": rep,
            "sh": np.where(keep, df["sh"].to_numpy(), None),
        })

    return hash_exchange(
        [sh.map_batches(prep, batch_format="pyarrow")],
        fin,
        num_partitions=P,
        schema=pa.schema([(id_col, pa.string()), ("rep", pa.string()),
                          ("sh", pa.large_binary())]),
        in_schemas=[pa.schema([(id_col, pa.string()),
                               ("sh", pa.large_binary()),
                               ("_empty", pa.bool_())])],
    )


def _rep_labels(
    sh_reps: ray.data.Dataset, edges: ray.data.Dataset, *, id_col: str,
    dsu_max_edges: int,
) -> ray.data.Dataset:
    """(rep, cluster_id) with the repo-standard count()-gated DSU /
    label-propagation decision (near.minhash_dedup_clusters pattern)."""
    if edges.count() > dsu_max_edges:
        from data_dedup_ray.pipelines.components import label_propagation

        return label_propagation(
            sh_reps.select_columns([id_col]),
            edges.select_columns(["url_a", "url_b"]),
            node_col=id_col,
        )
    from data_dedup_ray.pipelines.components import (attach_clusters,
                                                     dsu_components)

    assignment = dsu_components(edges.to_pandas())
    return attach_clusters(
        sh_reps.select_columns([id_col]), assignment, id_col=id_col
    )


def tiered_dedup_clusters(
    ds: ray.data.Dataset, *, threshold: float = 0.7,
    dsu_max_edges: int = 20_000_000, num_partitions: int = 64,
    **lsh_kwargs,
) -> ray.data.Dataset:
    """``(url, cluster_id)`` for every corpus row — identical output to
    ``near.minhash_dedup_clusters`` at the same config, computed through
    the exact-collapse funnel.  The final attach is one output-sized join
    keyed on the representative (never on text)."""
    id_col = lsh_kwargs.get("id_col", "url")
    text_col = lsh_kwargs.get("text_col", "text")
    shingle_k = lsh_kwargs.get("shingle_k", 5)
    P = num_partitions

    sh = shingle_rows(ds, id_col=id_col, text_col=text_col,
                      shingle_k=shingle_k)
    groups = exact_shingle_groups(
        sh, id_col=id_col, num_partitions=P
    ).materialize()

    sh_reps = groups.map_batches(
        lambda t: t.filter(pc.is_valid(t["sh"])).select([id_col, "sh"]),
        batch_format="pyarrow",
    ).materialize()
    edges = minhash_dedup_pairs(
        ds, threshold=threshold, sh=sh_reps, **lsh_kwargs
    ).materialize()
    rep_labels = _rep_labels(sh_reps, edges, id_col=id_col,
                             dsu_max_edges=dsu_max_edges)

    def prep_assign(t: pa.Table) -> pa.Table:
        t = t.select([id_col, "rep"])
        return t.append_column("_part", pa.array(key_partition(
            t["rep"].to_numpy(zero_copy_only=False), P)))

    def prep_labels(t: pa.Table) -> pa.Table:
        t = t.select([id_col, "cluster_id"]).rename_columns(
            ["rep", "cluster_id"])
        return t.append_column("_part", pa.array(key_partition(
            t["rep"].to_numpy(zero_copy_only=False), P)))

    def fin(a: pd.DataFrame, b: pd.DataFrame) -> pd.DataFrame:
        return a.merge(b, on="rep")[[id_col, "cluster_id"]]

    return hash_exchange(
        [groups.map_batches(prep_assign, batch_format="pyarrow"),
         rep_labels.map_batches(prep_labels, batch_format="pyarrow")],
        fin,
        num_partitions=P,
        schema=pa.schema([(id_col, pa.string()),
                          ("cluster_id", pa.string())]),
        in_schemas=[
            pa.schema([(id_col, pa.string()), ("rep", pa.string())]),
            pa.schema([("rep", pa.string()), ("cluster_id", pa.string())]),
        ],
    )


def tiered_dedup_stats(
    ds: ray.data.Dataset, *, threshold: float = 0.7, **kwargs
) -> pd.DataFrame:
    """One row of funnel telemetry: ``(n_pages, n_exact_groups,
    n_clusters)`` — corpus rows in, tier-1 survivors, final components.

    Every number is a ``count()`` over an intermediate the funnel already
    builds (group reps carry the only non-null blobs; a component's label
    is its min member, so exactly one row per cluster has url ==
    cluster_id) — no extra shuffle, no distinct aggregation, no driver
    collection beyond three scalars."""
    id_col = kwargs.get("id_col", "url")
    text_col = kwargs.get("text_col", "text")
    shingle_k = kwargs.get("shingle_k", 5)
    P = kwargs.get("num_partitions", 64)

    sh = shingle_rows(ds, id_col=id_col, text_col=text_col,
                      shingle_k=shingle_k)
    groups = exact_shingle_groups(
        sh, id_col=id_col, num_partitions=P
    ).materialize()
    n_pages = groups.count()
    sh_reps = groups.map_batches(
        lambda t: t.filter(pc.is_valid(t["sh"])).select([id_col, "sh"]),
        batch_format="pyarrow",
    ).materialize()
    n_groups = sh_reps.count()
    edges = minhash_dedup_pairs(
        ds, threshold=threshold, sh=sh_reps,
        **{k: v for k, v in kwargs.items() if k != "num_partitions"}
    ).materialize()
    rep_labels = _rep_labels(
        sh_reps, edges, id_col=id_col,
        dsu_max_edges=kwargs.get("dsu_max_edges", 20_000_000))
    n_clusters = rep_labels.map_batches(
        lambda t: t.filter(pc.equal(t[id_col], t["cluster_id"])),
        batch_format="pyarrow",
    ).count()
    return pd.DataFrame({
        "n_pages": [n_pages],
        "n_exact_groups": [n_groups],
        "n_clusters": [n_clusters],
    }).astype("int64")
