"""Multi-signal ensemble near-dup clustering: union the edge sets of
several INDEPENDENT similarity detectors, then take connected components
once over the union.

Production web-dedup stacks run more than one detector because each
misses a different dup class: shingle Jaccard is order-sensitive (misses
paragraph shuffles that keep the bag), bag-of-words cosine is
order-blind but df-pruned, simhash catches low-edit-distance captures at
fingerprint cost.  Unioning the PAIR sets and clustering once (instead
of clustering per signal and trying to merge labelings) is the only
composition that is associative and deterministic — components of the
union graph.

Scale shape: each detector already ships its own partitioned pipeline
(``near.minhash_dedup_pairs``, ``tfidf.sparse_cosine_pairs``,
``near.simhash_pairs``); this module just unions their OUTPUT-SIZED edge
lists (two string columns each) and reuses the count()-gated DSU /
distributed label-propagation closure of ``minhash_dedup_clusters``
(near.py) — the union never touches corpus bytes.  The three detectors
do re-read the corpus independently (different token structures:
shingles vs tf vectors vs per-bit votes); at 100 TB you would persist
the corpus once up front and hand the same materialized Dataset to all
three, which is exactly what the ``ds`` argument allows.

All three default signals have exact SQL twins (``oracles``:
``_SHINGLE_CTES`` Jaccard, ``tf_cosine_pairs_sql`` integer cos², and
``near.simhash_sha_pairs_sql``'s bit-majority restatement), so the
ensemble clustering has a full recursive-closure oracle
(``oracles.ensemble_clusters_sql``) — rare for a multi-stage composed
operator.

The reference engine's analogue is the digest CHAIN (equality signals
composed by refinement, SURVEY §2.2/§3.4); this is the similarity-side
counterpart where signals compose by union instead, part of the
north_rule extension surface (SURVEY §8).
"""

from __future__ import annotations

import ray
import ray.data


def ensemble_dup_edges(
    ds: ray.data.Dataset,
    *,
    id_col: str = "url",
    text_col: str = "text",
    threshold: float = 0.7,
    max_df: int = 256,
    min_cos2_bp: int = 8100,
    max_hamming: int = 3,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Union of the three detectors' pair sets as ``(url_a, url_b,
    signals)`` — ``signals`` is the count of detectors that fired for
    the pair (1-3), useful as an edge-confidence weight downstream."""
    from data_dedup_ray.pipelines import near, tfidf

    e_jac = near.minhash_dedup_pairs(
        ds, threshold=threshold, id_col=id_col, text_col=text_col,
        num_partitions=num_partitions,
    ).select_columns(["url_a", "url_b"])
    e_cos = tfidf.sparse_cosine_pairs(
        ds, id_col=id_col, text_col=text_col, weighting="tf",
        max_df=max_df, min_cos2_bp=min_cos2_bp,
        num_partitions=num_partitions,
    ).select_columns(["id_a", "id_b"]).rename_columns(
        {"id_a": "url_a", "id_b": "url_b"})
    e_sim = near.simhash_pairs(
        ds, id_col=id_col, text_col=text_col, hash_fn="sha",
        max_hamming=max_hamming,
    ).select_columns(["url_a", "url_b"])

    import pyarrow as pa

    from data_dedup_ray.engine.exchange import hash_exchange, key_partition

    P = num_partitions
    pair_schema = pa.schema(
        [("url_a", pa.string()), ("url_b", pa.string())])

    def with_part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_part",
            pa.array(key_partition(
                t["url_a"].to_numpy(zero_copy_only=False), P)),
        )

    import pandas as pd

    def dedup_count(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"url_a": [], "url_b": [], "signals": []})
        out = df.groupby(["url_a", "url_b"], sort=False,
                         as_index=False).size()
        return out.rename(columns={"size": "signals"})

    union = e_jac.union(e_cos).union(e_sim).map_batches(
        with_part, batch_format="pyarrow")
    return hash_exchange(
        [union],
        dedup_count,
        num_partitions=P,
        schema=pa.schema([("url_a", pa.string()), ("url_b", pa.string()),
                          ("signals", pa.int64())]),
        in_schemas=[pair_schema],
    )


def ensemble_dedup_clusters(
    ds: ray.data.Dataset,
    *,
    id_col: str = "url",
    text_col: str = "text",
    threshold: float = 0.7,
    max_df: int = 256,
    min_cos2_bp: int = 8100,
    max_hamming: int = 3,
    dsu_max_edges: int = 20_000_000,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Every row labeled with its ensemble component's min-member id:
    ``(url, cluster_id)`` — the multi-signal counterpart of
    ``near.minhash_dedup_clusters`` with the identical gated closure."""
    from data_dedup_ray.pipelines.components import (
        attach_clusters,
        dsu_components,
        label_propagation,
    )

    edges = ensemble_dup_edges(
        ds, id_col=id_col, text_col=text_col, threshold=threshold,
        max_df=max_df, min_cos2_bp=min_cos2_bp, max_hamming=max_hamming,
        num_partitions=num_partitions,
    ).materialize()
    nodes = ds.select_columns([id_col])
    if edges.count() > dsu_max_edges:
        return label_propagation(
            nodes, edges.select_columns(["url_a", "url_b"]),
            node_col=id_col,
        )
    assignment = dsu_components(edges.to_pandas())
    return attach_clusters(nodes, assignment, id_col=id_col)


def detector_agreement(
    ds: ray.data.Dataset,
    *,
    id_col: str = "url",
    text_col: str = "text",
    threshold: float = 0.7,
    max_df: int = 256,
    min_cos2_bp: int = 8100,
    max_hamming: int = 3,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """The tier-agreement matrix: for every unordered detector combo,
    how many verified pairs BOTH found — ``(detector_a, detector_b,
    n_pairs)`` with ``detector_a <= detector_b`` (diagonal rows are each
    detector's own pair count).  This is the calibration table a tiered
    dedup deployment reads before dropping a detector: high off-diagonal
    overlap means the cheaper tier already covers the expensive one.

    Each detector's OUTPUT-SIZED pair list is tagged with its name; one
    pair-keyed exchange gathers each pair's detector set and emits the
    per-partition partial matrix (≤6 rows each), which the driver sums —
    the corpus itself is touched only inside the three detectors."""
    import pandas as pd
    import pyarrow as pa

    from data_dedup_ray.engine.exchange import hash_exchange, key_partition
    from data_dedup_ray.pipelines import near, tfidf

    P = num_partitions
    dets = {
        "jaccard": near.minhash_dedup_pairs(
            ds, threshold=threshold, id_col=id_col, text_col=text_col,
            num_partitions=num_partitions,
        ).select_columns(["url_a", "url_b"]),
        "tfcos": tfidf.sparse_cosine_pairs(
            ds, id_col=id_col, text_col=text_col, weighting="tf",
            max_df=max_df, min_cos2_bp=min_cos2_bp,
            num_partitions=num_partitions,
        ).select_columns(["id_a", "id_b"]).rename_columns(
            {"id_a": "url_a", "id_b": "url_b"}),
        "simhash": near.simhash_pairs(
            ds, id_col=id_col, text_col=text_col, hash_fn="sha",
            max_hamming=max_hamming,
        ).select_columns(["url_a", "url_b"]),
    }

    def tagger(name):
        def tag(t: pa.Table) -> pa.Table:
            det = pa.array([name] * t.num_rows, pa.string())
            return t.append_column("det", det).append_column(
                "_part", pa.array(key_partition(
                    t["url_a"].to_numpy(zero_copy_only=False), P)))
        return tag

    tagged = None
    for name, e in dets.items():
        part = e.map_batches(tagger(name), batch_format="pyarrow")
        tagged = part if tagged is None else tagged.union(part)

    def partial_matrix(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"detector_a": pd.Series([], dtype=object),
                                 "detector_b": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64")})
        m = df.merge(df, on=["url_a", "url_b"])
        m = m[m["det_x"] <= m["det_y"]]
        g = (m.groupby(["det_x", "det_y"], sort=False)
             .size().rename("n").reset_index())
        return g.rename(columns={"det_x": "detector_a",
                                 "det_y": "detector_b"})

    parts = hash_exchange(
        [tagged], partial_matrix, num_partitions=P,
        schema=pa.schema([("detector_a", pa.string()),
                          ("detector_b", pa.string()),
                          ("n", pa.int64())]),
        in_schemas=[pa.schema([("url_a", pa.string()),
                               ("url_b", pa.string()),
                               ("det", pa.string())])],
    ).to_pandas()  # ≤ 6·P partial rows — trivially output-sized
    if not len(parts):
        out = pd.DataFrame({"detector_a": [], "detector_b": [], "n": []})
    else:
        out = (parts.groupby(["detector_a", "detector_b"], sort=False)
               ["n"].sum().reset_index())
    return ray.data.from_arrow(pa.table({
        "detector_a": pa.array(out["detector_a"].astype(object),
                               pa.string()),
        "detector_b": pa.array(out["detector_b"].astype(object),
                               pa.string()),
        "n_pairs": pa.array(out["n"].astype("int64")),
    }))


def ensemble_clusters(sf_dir: str) -> ray.data.Dataset:
    """Driver query: 3-signal ensemble clusters over web_pages — full
    recursive-closure SQL twin in ``oracles.ensemble_clusters_sql``."""
    from data_dedup_ray.corpus import web_pages

    pages = web_pages(sf_dir).select_columns(["url", "text"])
    return ensemble_dedup_clusters(pages)
