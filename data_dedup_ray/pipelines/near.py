"""Near-duplicate pipelines: MinHash+LSH candidates → Jaccard verify →
connected components (north_rule; not present in the reference, SURVEY.md
§2.6 / §7 M2-M4).

Shuffle plan (all exchanges are the sortless ``hash_exchange`` of
engine/exchange.py — co-location without ordering)
------------
0. The corpus is tokenized EXACTLY ONCE: ``shingle_rows`` materializes a
   compact ``(url, uint64-blob)`` table feeding band generation, the
   Jaccard verify join, and the final cluster attach.  html/text never
   enter any shuffle.
1. ``ShingleMinHashLSH`` (task pool + per-worker cached permutations,
   util.stage_task) emits ``(url, band_id, band_hash, _part)`` rows,
   ``_part = hash(band_id, band_hash) % P``: P≈cpu-count coarse buckets
   give the same co-location guarantee as exact band keys with none of
   the per-group overhead; pair emission is ONE vectorized self-merge per
   bucket.  Skew guard: a band group larger than ``group_cap``
   (boilerplate bands) emits a star (min-member ↔ others) instead of all
   O(g²) pairs — connectivity for clustering is preserved.
2. Verify: exact hashed-shingle Jaccard as TWO multi-input exchange
   rounds co-partitioning pairs with the shingle table (round A on url_a
   — where equal pairs co-locate, so cross-band dedup is free — round B
   on url_b).  Both rounds key on ``hash(url) % P``, so ONE bucketized
   split of the shingle table serves both; the payload crosses the object
   store once.  Joins/lookups run on Arrow (apply_format="pyarrow"),
   pinned to one thread per task.
3. Components: driver DSU over the verified (output-sized) edge list, or
   ``components.label_propagation`` when even edges are too large.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

# import polars at MODULE level, not inside the hot functions: a worker
# process then imports it exactly once (serially, when the UDF closure is
# deserialized), which removes the half-initialized-module failure mode a
# lazy in-function import can leave behind in a long-lived reused worker
# ("polars._reexport has no attribute 'Series'", observed once in a
# 101-query replay poisoning every later minhash query on that worker)
try:
    import polars as _pl
except ImportError:  # pragma: no cover - polars is baked in
    _pl = None

from data_dedup_ray.util import autoscale_pool, stage_task
from ray.data.aggregate import Count, Min

from data_dedup_ray.engine.exchange import (bucketize, hash_exchange,
                                            key_partition)
from data_dedup_ray.pipelines.components import (
    attach_clusters, dsu_components, map_roots_int64)
from data_dedup_ray.stages.minhash import (MinHashLSH, ShingleMinHashLSH,
                                           shingle_sets)


def _hash_str_column(col: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    """Vectorized uint64 hash of a string column with NO per-value
    PyObject materialization: polars' native hash runs over the arrow
    buffers zero-copy (the old ``to_pylist()`` + object-array hashing
    dominated the hottest exchange's map side).  Only WITHIN-RUN
    consistency matters — every exchange round that must co-partition on
    the same ids calls this one function — not cross-version stability."""
    if _pl is not None:
        return _pl.from_arrow(col).hash(seed=0).to_numpy()
    vals = np.asarray(col.to_pylist(), dtype=object)  # pragma: no cover
    return pd.util.hash_array(vals)  # pragma: no cover


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
    concurrency: int | tuple | None = None,
    num_partitions: int = 64,
    distinct: bool = True,
    sh: ray.data.Dataset | None = None,
    method: str = "perm",
) -> ray.data.Dataset:
    """Candidate pairs ``(url_a < url_b)`` from LSH band collisions.

    ``distinct=False`` skips the cross-band dedup shuffle — callers that
    feed the pairs into ``verify_pairs_partitioned`` get dedup for free
    there (equal pairs co-locate in its url_a-keyed join step).

    ``sh``: optional precomputed ``shingle_rows`` table; passing it skips
    re-tokenizing the corpus (the dominant per-doc compute) and the band
    stage reads the compact blobs instead of text.

    ``method="oph"`` swaps the permutation signature kernel for the
    densified one-permutation reduction (pipelines/oph.ShingleOPHLSH,
    ~13× cheaper signatures); candidates only — callers that verify
    exactly lose nothing but a ~1e-19 banding miss.  n_perm must then be
    a power of two (128/band_r=2 is the tuned default the verified
    pipelines pass)."""
    if method not in ("perm", "oph"):
        raise ValueError(f"method must be 'perm' or 'oph', got {method!r}")
    if method == "oph":
        from data_dedup_ray.pipelines.oph import ShingleOPHLSH
        if sh is None:
            sh = shingle_rows(ds, id_col=id_col, text_col=text_col,
                              shingle_k=shingle_k).materialize()
        bands = sh.map_batches(
            stage_task(
                ShingleOPHLSH, n_perm=n_perm, band_r=band_r, seed=seed,
                id_col=id_col, num_partitions=num_partitions,
            ),
            batch_format="pyarrow",
            batch_size=1024,
        )
    # task pool + per-worker cached stage: the permutation state builds in
    # microseconds, so an actor pool would only add spawn latency (util.py
    # stage_task docstring)
    elif sh is not None:
        bands = sh.map_batches(
            stage_task(
                ShingleMinHashLSH, n_perm=n_perm, band_r=band_r, seed=seed,
                id_col=id_col, num_partitions=num_partitions,
            ),
            batch_format="pyarrow",
            batch_size=1024,
        )
    else:
        bands = ds.map_batches(
            stage_task(
                MinHashLSH, n_perm=n_perm, band_r=band_r, shingle_k=shingle_k,
                seed=seed, id_col=id_col, text_col=text_col,
                num_partitions=num_partitions,
            ),
            batch_format="pyarrow",
            batch_size=1024,
        )

    def emit_partition(g: pd.DataFrame) -> pd.DataFrame:
        return _pairs_in_partition(
            g, key_cols=["band_id", "band_hash"], id_col=id_col,
            group_cap=group_cap,
        )

    # sortless bucketing exchange (engine/exchange.py) — groupby would
    # sample-sort every band row just to co-locate equal keys
    pairs = hash_exchange(
        [bands], emit_partition, num_partitions=num_partitions,
        schema=pa.schema([(f"{id_col}_a", pa.string()),
                          (f"{id_col}_b", pa.string())]),
    )
    if not distinct:
        return pairs
    # distinct across bands / partitions
    return _distinct_pairs(pairs, ["url_a", "url_b"],
                           num_partitions=num_partitions)


def _distinct_pairs(
    ds: ray.data.Dataset,
    key_cols: list[str],
    *,
    num_partitions: int = 64,
    keep_cols: list[str] | None = None,
) -> ray.data.Dataset:
    """Distinct rows by ``key_cols`` via the coarse sortless exchange.

    ``groupby(key_cols).aggregate`` pays per-group overhead on millions of
    tiny groups; bucketing on ``hash(key) % P`` followed by ONE vectorized
    ``drop_duplicates`` per partition is semantically identical (equal keys
    co-locate) and orders of magnitude faster.
    """
    keep = keep_cols or key_cols
    base = ds.schema().base_schema
    if not isinstance(base, pa.Schema):
        base = pa.schema([(n, pa.string()) for n in keep])
    out_schema = pa.schema([base.field(n) for n in keep])

    def add_part(b: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(b[key_cols], index=False).to_numpy()
        b = b.copy()
        b["_part"] = (h % np.uint64(num_partitions)).astype(np.int64)
        return b

    def dd(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(key_cols, kind="stable").drop_duplicates(
            key_cols
        )[keep]

    return hash_exchange(
        [ds.map_batches(add_part, batch_format="pandas")],
        dd,
        num_partitions=num_partitions,
        schema=out_schema,
        in_schemas=[base],
    )


def _pairs_in_partition(
    g: pd.DataFrame,
    *,
    key_cols: list[str],
    id_col: str,
    group_cap: int,
    carry: list[str] | None = None,
    on_cap: str = "star",
) -> pd.DataFrame:
    """All intra-group pairs of one coarse partition — vectorized.

    One pandas self-merge on the factorized group code replaces per-group
    Python; groups larger than ``group_cap`` fall back to a star on the
    lexicographic min member (SURVEY.md §7.4 skew guard).  ``carry``
    columns (e.g. simhash fingerprints) ride along as ``<col>_a/<col>_b``.

    ``on_cap="error"`` raises instead of star-degrading — for callers
    whose contract is EXACT pair recall (weighted_jaccard_pairs, the
    bottom-k candidate joins): silently dropping pairs on a hot key
    would diverge from their SQL oracles, so a too-common blocking
    value must fail loudly and send the operator's user to a bigger
    cap / max_df pre-filter rather than quietly lose recall.
    """
    carry = carry or []
    cols = [id_col, *carry]
    empty = pd.DataFrame(
        {f"{c}{s}": pd.Series(dtype=g[c].dtype)
         for c in cols for s in ("_a", "_b")}
    )
    g = g.drop_duplicates([*key_cols, id_col])
    code = g.groupby(key_cols, sort=False).ngroup().to_numpy()
    sz = np.bincount(code)[code]
    g = g.assign(_code=code)[sz > 1]
    if not len(g):
        return empty
    sz = sz[sz > 1]
    small, big = g[sz <= group_cap], g[sz > group_cap]
    if len(big) and on_cap == "error":
        raise ValueError(
            f"blocking group of {int(sz.max())} members exceeds "
            f"group_cap={group_cap} on an exactness-claimed path; "
            "raise group_cap or pre-filter ubiquitous keys (max_df)"
        )
    out = []
    if len(small):
        s = small[["_code", *cols]]
        m = s.merge(s, on="_code", suffixes=("_a", "_b"))
        out.append(m[m[f"{id_col}_a"] < m[f"{id_col}_b"]])
    if len(big):
        big = big.sort_values(["_code", id_col], kind="stable")
        first = big.groupby("_code", sort=False).head(1)
        rest = big.merge(
            first[["_code", id_col]], on="_code", suffixes=("", "_min")
        )
        rest = rest[rest[id_col] != rest[f"{id_col}_min"]]
        star = rest.merge(first[["_code", *cols]], on="_code",
                          suffixes=("_b", "_a"))
        out.append(star)
    res = pd.concat(out, ignore_index=True) if out else empty
    keep = [f"{c}{s}" for c in cols for s in ("_a", "_b")]
    return res[keep].drop_duplicates([f"{id_col}_a", f"{id_col}_b"])


def _blob_views(col: pa.ChunkedArray):
    """Zero-copy per-row uint64 views of a (large_)binary column:
    ``(values, offsets)`` where row i's array is
    ``values[offsets[i]:offsets[i+1]]`` — no per-row Python objects."""
    arr = col.combine_chunks()
    if pa.types.is_binary(arr.type):
        arr = arr.cast(pa.large_binary())
    off = np.frombuffer(arr.buffers()[1], dtype=np.int64,
                        count=len(arr) + 1)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint64)
    base = arr.offset  # slice offset into the offsets buffer
    return data, off[base: base + len(arr) + 1] // 8


def _seg_gather(starts: np.ndarray, lens: np.ndarray
                ) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized multi-range gather indices: for segment i at
    ``starts[i]`` with ``lens[i]`` elements, returns ``(seg_of, idx)``
    where ``idx`` concatenates every segment's index range and
    ``seg_of`` labels each position with its segment number."""
    tot = int(lens.sum())
    seg_of = np.repeat(np.arange(len(lens)), lens)
    idx = (np.arange(tot) - np.repeat(np.cumsum(lens) - lens, lens)
           + starts[seg_of])
    return seg_of, idx


def shingle_rows(
    ds: ray.data.Dataset,
    *,
    id_col: str = "url",
    text_col: str = "text",
    shingle_k: int = 5,
) -> ray.data.Dataset:
    """``(id, sh:binary)`` — each row's distinct k-shingle hash set as a
    little-endian uint64 byte blob.  Bytes (not list/tensor columns) keep
    the schema trivially stable across unions and shuffles.

    Docs with no shingles keep a row with an EMPTY blob: the table then
    covers every corpus id, so downstream stages (cluster attach) can use
    it as the id universe without re-reading the corpus.  Band/prefix
    emission and the verify join all skip empty sets naturally."""

    def fn(batch: pa.Table) -> pa.Table:
        cat, sizes = shingle_sets(batch[text_col], shingle_k)
        offs = np.zeros(len(sizes) + 1, dtype=np.int64)
        np.cumsum(sizes, out=offs[1:])
        blobs = [cat[offs[i]: offs[i + 1]].tobytes() for i in range(len(sizes))]
        return pa.table({id_col: batch[id_col].combine_chunks(),
                         "sh": pa.array(blobs, type=pa.large_binary())})

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=1024)


def verify_pairs_partitioned(
    ds: ray.data.Dataset,
    pairs: ray.data.Dataset,
    *,
    id_col: str = "url",
    text_col: str = "text",
    shingle_k: int = 5,
    threshold: float = 0.7,
    num_partitions: int = 64,
    sh: ray.data.Dataset | None = None,
    metric: str = "jaccard",
) -> ray.data.Dataset:
    """Exact-Jaccard verification as a partitioned join — the 100 TB path.

    ``metric="containment"`` scores DIRECTIONAL pairs by
    ``|A∩B| / |A|`` (A = url_a side) instead of symmetric Jaccard —
    the asymmetric measure that catches a short document quoted inside
    a long one, where Jaccard stays small.

    Nothing is collected to the driver: two multi-input ``hash_exchange``
    rounds co-partition the candidate pairs with the shingle table on
    ``hash(endpoint) % P`` (round A keyed on url_a, round B on url_b).
    Both rounds share ONE bucketized split of the shingle table (the
    partition fn is identical), so the shingle payload moves through the
    object store exactly once, as binary columns, and nothing is sorted;
    round A joins via Acero, round B resolves pairs through a hash
    indexer into the bucket's unique blob buffer and computes Jaccard in
    place.

    ``sh``: optional precomputed+materialized ``shingle_rows`` table.
    """
    P = num_partitions
    if sh is None:
        sh = shingle_rows(ds, id_col=id_col, text_col=text_col,
                          shingle_k=shingle_k).materialize()

    def _with_part_pa(col: str):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t.append_column("_part",
                                       pa.array([], type=pa.int64()))
            h = _hash_str_column(t[col])
            return t.append_column(
                "_part", pa.array((h % np.uint64(P)).astype(np.int64))
            )
        return fn

    sh_p = sh.map_batches(_with_part_pa(id_col), batch_format="pyarrow")
    sh_schema = pa.schema([(id_col, pa.string()),
                           ("sh", pa.large_binary())])
    pair_schema = pa.schema([("url_a", pa.string()),
                             ("url_b", pa.string())])
    # split the shingle table ONCE; both verify rounds key on
    # hash(url) % P, so the same buckets serve round A (url_a side) and
    # round B (url_b side).  The payload crosses the object store a single
    # time and the round-B re-shuffle (plus its driver-side endpoint
    # collect) disappears.
    sh_buckets = bucketize(sh_p, num_partitions=P, in_schema=sh_schema)

    def _join_a(pt: pa.Table, sht: pa.Table) -> pa.Table:
        # equal (url_a, url_b) pairs co-locate here (partition key is
        # url_a), so cross-band candidate dedup is free in this round;
        # both the distinct and the join are Acero (no Python objects)
        pt = pt.group_by(["url_a", "url_b"]).aggregate([])
        m = pt.join(sht, keys=["url_a"], right_keys=[id_col],
                    join_type="inner")
        return m.select(["url_a", "url_b", "sh"]).rename_columns(
            ["url_a", "url_b", "sh_a"]
        )

    def _dedup_pairs_pre(t: pa.Table) -> pa.Table:
        # map-side combiner: the same pair arrives once per colliding band
        # (up to n_bands copies for true near-dups); collapsing inside the
        # split group shrinks the round-A shuffle by that factor.  _part is
        # a function of url_a, so group_by carries it through unchanged.
        return t.group_by(["url_a", "url_b", "_part"]).aggregate([])

    step_a = hash_exchange(
        [pairs.map_batches(_with_part_pa("url_a"), batch_format="pyarrow"),
         sh_buckets],
        _join_a,
        num_partitions=P,
        schema=pa.schema([("url_a", pa.string()), ("url_b", pa.string()),
                          ("sh_a", pa.large_binary())]),
        in_schemas=[pair_schema, sh_schema],
        apply_format="pyarrow",
        pre=[_dedup_pairs_pre, None],
    )

    # round B reads the SAME shingle buckets (keyed on hash(url) % P, the
    # identical partition fn) — no second shuffle of the shingle payload
    # and no driver-side endpoint collect.  The per-partition lookup
    # (pandas indexer into the full bucket) handles "only some urls appear
    # as url_b" naturally; the cost is one in-memory concat of the bucket
    # (combine_chunks) instead of re-shipping a filtered copy through the
    # object store.
    def _join_b(pt: pa.Table, sht: pa.Table) -> pa.Table:
        # hash-indexer lookup instead of an Acero join: the join would
        # materialize a per-pair COPY of every url_b blob (≈ the whole
        # partition's shingle payload again), and that write+read of
        # redundant bytes is what stopped round B from scaling with cpus.
        # The indexer resolves each pair to an offset into the UNIQUE
        # blob buffer and the intersect reads zero-copy views.
        if pt.num_rows == 0 or sht.num_rows == 0:
            score = "containment" if metric == "containment" else "jaccard"
            return pa.table({"url_a": pa.array([], type=pa.string()),
                             "url_b": pa.array([], type=pa.string()),
                             score: pa.array([], type=pa.float64())})
        idx = pd.Index(sht[id_col].to_pandas()).get_indexer(
            pd.Series(pt["url_b"].to_pandas())
        )
        found = idx >= 0  # inner-join semantics
        if not found.all():
            pt = pt.filter(pa.array(found))
            idx = idx[found]
        da, oa = _blob_views(pt["sh_a"])
        db, ob = _blob_views(sht["sh"])
        n = pt.num_rows
        containment = metric == "containment"
        # fully vectorized set intersection over ALL pairs at once
        # (this is the inner loop of the most expensive pipeline):
        # gather each pair's smaller side as the probe stream and its
        # larger side as the target stream, remap values to dense ranks,
        # pack (pair_id << 32 | rank) — both streams stay sorted because
        # each segment is a sorted np.unique output and pair ids are
        # nondecreasing — then ONE searchsorted membership test + ONE
        # bincount yields every pair's |A∩B|.  Pairs are processed in
        # slices so the gathered buffers stay bounded.
        starts_a = oa[:-1]
        na_all = np.diff(oa)
        starts_b = ob[idx]
        nb_all = ob[idx + 1] - starts_b
        inter = np.zeros(n, dtype=np.int64)
        PAIR_CHUNK = 1 << 16
        for s in range(0, n, PAIR_CHUNK):
            e = min(s + PAIR_CHUNK, n)
            na, nb = na_all[s:e], nb_all[s:e]
            sa, sb = starts_a[s:e], starts_b[s:e]
            swap = na > nb
            plen = np.where(swap, nb, na)
            tlen = np.where(swap, na, nb)
            pstart = np.where(swap, sb, sa)
            tstart = np.where(swap, sa, sb)
            p_from_b = swap  # probe gathers from db where swapped
            t_from_b = ~swap

            def _gather(starts, lens, from_b):
                pair_of, gidx = _seg_gather(starts, lens)
                fb = from_b[pair_of]
                vals = np.empty(len(gidx), dtype=np.uint64)
                vals[~fb] = da[gidx[~fb]]
                vals[fb] = db[gidx[fb]]
                return pair_of, vals

            pair_p, val_p = _gather(pstart, plen, p_from_b)
            pair_t, val_t = _gather(tstart, tlen, t_from_b)
            if len(val_p) == 0 or len(val_t) == 0:
                continue
            u = np.unique(np.concatenate([val_p, val_t]))
            kp = (pair_p.astype(np.uint64) << np.uint64(32)) \
                | np.searchsorted(u, val_p).astype(np.uint64)
            kt = (pair_t.astype(np.uint64) << np.uint64(32)) \
                | np.searchsorted(u, val_t).astype(np.uint64)
            pos = np.searchsorted(kt, kp)
            pos[pos == len(kt)] = len(kt) - 1
            member = kt[pos] == kp
            inter[s:e] = np.bincount(pair_p[member], minlength=e - s)
        with np.errstate(divide="ignore", invalid="ignore"):
            denom = (na_all if containment
                     else na_all + nb_all - inter).astype(np.float64)
            jac = np.where(denom > 0, inter / denom, 0.0)
        keep = pa.array(jac >= threshold)
        score_col = "containment" if containment else "jaccard"
        return pa.table({
            "url_a": pt["url_a"].combine_chunks().filter(keep),
            "url_b": pt["url_b"].combine_chunks().filter(keep),
            score_col: pa.array(jac[jac >= threshold]),
        })

    out_score = "containment" if metric == "containment" else "jaccard"
    return hash_exchange(
        [step_a.map_batches(_with_part_pa("url_b"), batch_format="pyarrow"),
         sh_buckets],
        _join_b,
        num_partitions=P,
        schema=pa.schema([("url_a", pa.string()), ("url_b", pa.string()),
                          (out_score, pa.float64())]),
        in_schemas=[pair_schema.append(pa.field("sh_a", pa.large_binary())),
                    sh_schema],
        apply_format="pyarrow",
    )


def minhash_dedup_pairs(
    ds: ray.data.Dataset, *, threshold: float = 0.7,
    sh: ray.data.Dataset | None = None, **lsh_kwargs
) -> ray.data.Dataset:
    """LSH candidates → verified near-duplicate pairs (url_a < url_b).

    Fully pipeline-to-pipeline: candidates stay a Dataset, verification
    is the partitioned join, and the RESULT stays a Dataset too — nothing
    is ever collected on the driver (callers that need a DataFrame call
    ``.to_pandas()`` on the output-sized pair list themselves).  The
    corpus is tokenized exactly ONCE: the materialized shingle table
    feeds both the band stage and the verify join (compact uint64 blobs,
    no text/html in any shuffle)."""
    shingle_k = lsh_kwargs.get("shingle_k", 5)
    id_col = lsh_kwargs.get("id_col", "url")
    text_col = lsh_kwargs.get("text_col", "text")
    lsh_kwargs.setdefault("distinct", False)  # verify dedups in its join
    # OPH candidates by default: the exact verify below restores
    # precision/recall, and the signature kernel is ~13× cheaper than
    # the 126-permutation loop.  256 bins / band_r=4 (64 bands) puts the
    # s-curve threshold at (1/64)^(1/4)=0.35 — as selective as the perm
    # path's 42×3 (0.29), so the verifier sees no candidate flood (the
    # 128/2 config's 0.125 threshold tripled the verify leg, measured) —
    # with banding miss (1−0.7⁴)^64 ≈ 2e-8 at the 0.7 threshold, equal
    # to perm's.  Callers needing the classic kernel pass method="perm".
    lsh_kwargs.setdefault("method", "oph")
    if lsh_kwargs["method"] == "oph":
        lsh_kwargs.setdefault("n_perm", 256)
        lsh_kwargs.setdefault("band_r", 4)
    if sh is None:
        sh = shingle_rows(ds, id_col=id_col, text_col=text_col,
                          shingle_k=shingle_k).materialize()
    cand = lsh_candidate_pairs(ds, sh=sh, **lsh_kwargs)
    return verify_pairs_partitioned(
        ds,
        cand,
        id_col=id_col,
        text_col=text_col,
        shingle_k=shingle_k,
        threshold=threshold,
        sh=sh,
    )


def simhash_pairs(
    ds: ray.data.Dataset,
    *,
    id_col: str = "url",
    text_col: str = "text",
    max_hamming: int = 3,
    group_cap: int = 1024,
    hash_fn: str = "fast",
    concurrency: int | tuple | None = None,
) -> ray.data.Dataset:
    """SimHash near-dup pairs with Hamming distance ≤ ``max_hamming``.

    Fingerprints travel with the exploded chunk rows, so verification
    (XOR popcount) happens inside the group — no second lookup pass.
    Recall is 1.0 by the pigeonhole construction for ``max_hamming ≤ 3``
    (stages/simhash.py); the only shuffle moves three fixed-width columns
    per row, keyed coarsely (``hash(chunk_id, chunk_val) % P``) so pair
    emission is one vectorized self-merge per partition, with fingerprints
    carried through the merge so Hamming verification happens in place.
    """
    from data_dedup_ray.stages.simhash import SimHashStage, popcount64

    chunks = ds.map_batches(
        stage_task(SimHashStage, id_col=id_col, text_col=text_col,
                   hash_fn=hash_fn),
        batch_format="pyarrow",
        batch_size=1024,
    )

    num_partitions = 64

    def add_part(t: pa.Table) -> pa.Table:
        with np.errstate(over="ignore"):
            h = (
                t["chunk_val"].to_numpy().view(np.uint64)
                * np.uint64(0x100000001B3)
                + t["chunk_id"].to_numpy().astype(np.uint64)
            )
        return t.append_column(
            "_part", pa.array((h % np.uint64(num_partitions)).astype(np.int64))
        )

    def emit_partition(g: pd.DataFrame) -> pd.DataFrame:
        return _pairs_in_partition(
            g, key_cols=["chunk_id", "chunk_val"], id_col=id_col,
            group_cap=group_cap, carry=["fp"],
        )

    def hamming_filter(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({"url_a": [], "url_b": [], "hamming": []})
        fa = b["fp_a"].to_numpy(dtype=np.int64).view(np.uint64)
        fb = b["fp_b"].to_numpy(dtype=np.int64).view(np.uint64)
        hd = popcount64(fa ^ fb)
        out = pd.DataFrame(
            {"url_a": b[f"{id_col}_a"], "url_b": b[f"{id_col}_b"],
             "hamming": hd}
        )
        return out[out["hamming"] <= max_hamming]

    def emit_and_verify(g: pd.DataFrame) -> pd.DataFrame:
        return hamming_filter(emit_partition(g))

    pairs = hash_exchange(
        [chunks.map_batches(add_part, batch_format="pyarrow")],
        emit_and_verify,
        num_partitions=num_partitions,
        schema=pa.schema([("url_a", pa.string()), ("url_b", pa.string()),
                          ("hamming", pa.int64())]),
    )
    # distinct across the 16 key tables (hamming identical per pair)
    return _distinct_pairs(pairs, ["url_a", "url_b"],
                           keep_cols=["url_a", "url_b", "hamming"])


def simhash_sha_pairs_sql(max_hamming: int = 3) -> str:
    """Exact brute-force SQL twin of ``simhash_pairs(hash_fn='sha')``:
    DuckDB recomputes the per-token 64-bit hash as the first 16 hex
    chars of sha256 (the definition of ``stages.minhash.sha256_token_hash``),
    takes the per-bit majority vote over every token OCCURRENCE (frequency
    weighting, ties → 0 — exactly ``simhash_batch``), and XOR-popcounts
    every doc pair via a per-bit join.  Token-less docs emit no pairs,
    mirroring the pipeline."""
    from data_dedup_ray.corpus import web_pages_sql

    return web_pages_sql(f"""
, toks AS (
  SELECT url, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS tok
  FROM web_pages
), th AS (
  SELECT url, substr(sha256(tok), 1, 16) AS h FROM toks
), bits AS (
  -- bit j of the 64-bit token hash lives in hex nibble 16 - j//4
  -- (1-based from the most significant); majority vote per (url, bit)
  SELECT url, g.j,
         CASE WHEN 2 * sum(
           (strpos('0123456789abcdef', substr(h, 16 - (g.j // 4), 1)) - 1)
             // (1 << (g.j % 4)) % 2
         ) > count(*) THEN 1 ELSE 0 END AS fpbit
  FROM th CROSS JOIN generate_series(0, 63) AS g(j)
  GROUP BY url, g.j
), ham AS (
  SELECT a.url AS url_a, b.url AS url_b,
         sum(CASE WHEN a.fpbit <> b.fpbit THEN 1 ELSE 0 END) AS d
  FROM bits a JOIN bits b ON a.j = b.j AND a.url < b.url
  GROUP BY 1, 2)
SELECT url_a, url_b, CAST(d AS BIGINT) AS hamming
FROM ham WHERE d <= {max_hamming}""")


def _distinct_fps(fp_rows: ray.data.Dataset, *,
                  num_partitions: int = 64) -> ray.data.Dataset:
    """Distinct fingerprints: map-side drop_duplicates, then one exchange
    keyed on the fp — the node set of the fp-level candidate graph."""

    def dedupe_part(b: pd.DataFrame) -> pd.DataFrame:
        b = b.drop_duplicates("fp")[["fp"]].copy()
        b["_part"] = (
            b["fp"].to_numpy().view(np.uint64) % np.uint64(num_partitions)
        ).astype(np.int64)
        return b

    return hash_exchange(
        [fp_rows.map_batches(dedupe_part, batch_format="pandas")],
        lambda g: g.drop_duplicates("fp")[["fp"]],
        num_partitions=num_partitions,
        schema=pa.schema([("fp", pa.int64())]),
        in_schemas=[pa.schema([("fp", pa.int64())])],
    )


def simhash_fp_pairs(
    fp_rows: ray.data.Dataset,
    *,
    max_hamming: int = 3,
    group_cap: int = 4096,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """``(fp_a, fp_b)`` pairs of DISTINCT fingerprints within Hamming ≤ d.

    Nodes are fingerprints, not documents: on templated corpora thousands
    of documents share one fingerprint, so the candidate graph over
    distinct fps is orders of magnitude smaller than over documents while
    inducing the identical document clustering (docs with equal fps are
    trivially one component)."""
    from data_dedup_ray.stages.simhash import key_values, popcount64

    distinct = _distinct_fps(fp_rows, num_partitions=num_partitions)

    def explode(t: pa.Table) -> pa.Table:
        fp = t["fp"].to_numpy().view(np.uint64)
        kv = key_values(fp)
        n = len(fp)
        n_keys = kv.shape[1]
        out = pa.table(
            {
                "fp": pa.array(np.repeat(fp.view(np.int64), n_keys)),
                "chunk_id": pa.array(
                    np.tile(np.arange(n_keys, dtype=np.int32), n)
                ),
                "chunk_val": pa.array(kv.reshape(-1)),
            }
        )
        with np.errstate(over="ignore"):
            h = (
                out["chunk_val"].to_numpy().view(np.uint64)
                * np.uint64(0x100000001B3)
                + out["chunk_id"].to_numpy().astype(np.uint64)
            )
        return out.append_column(
            "_part", pa.array((h % np.uint64(num_partitions)).astype(np.int64))
        )

    def emit_partition(g: pd.DataFrame) -> pd.DataFrame:
        return _pairs_in_partition(
            g, key_cols=["chunk_id", "chunk_val"], id_col="fp",
            group_cap=group_cap,
        )

    def hamming_filter(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({"fp_a": pd.Series(dtype=np.int64),
                                 "fp_b": pd.Series(dtype=np.int64)})
        fa = b["fp_a"].to_numpy(dtype=np.int64).view(np.uint64)
        fb = b["fp_b"].to_numpy(dtype=np.int64).view(np.uint64)
        keep = popcount64(fa ^ fb) <= max_hamming
        return b.loc[keep, ["fp_a", "fp_b"]]

    pairs = hash_exchange(
        [distinct.map_batches(explode, batch_format="pyarrow")],
        lambda g: hamming_filter(emit_partition(g)),
        num_partitions=num_partitions,
        schema=pa.schema([("fp_a", pa.int64()), ("fp_b", pa.int64())]),
    )
    return _distinct_pairs(pairs, ["fp_a", "fp_b"],
                           num_partitions=num_partitions)


def _pad_fp(fp_i64: np.ndarray) -> np.ndarray:
    """int64-view fingerprints → zero-filled 20-char decimal strings of
    the uint64 value: width-stable, so lexicographic order == uint64
    order and min-label propagation keeps min-fp semantics."""
    return np.char.zfill(fp_i64.view(np.uint64).astype("U20"), 20)


def _simhash_clusters_lp(
    fp_rows: ray.data.Dataset, edges: ray.data.Dataset, *,
    id_col: str = "url", num_partitions: int = 64,
) -> ray.data.Dataset:
    """BIG-GRAPH path for ``simhash_clusters``: the fp edge list is past
    the driver DSU guard, so components are labeled by distributed
    min-label propagation over PADDED fp strings (``_pad_fp``), then two
    exchanges map each doc to its component's min url — (1) join docs to
    fp labels keyed on the fp, (2) keyed on the root, where a whole
    component is co-located, a per-partition groupby-transform(min) over
    urls attaches the cluster id.  Nothing lands on the driver and no
    component-sized dict is broadcast."""
    from data_dedup_ray.pipelines.components import label_propagation

    P = num_partitions

    sedges = edges.map_batches(
        lambda t: pa.table({
            "url_a": pa.array(_pad_fp(t["fp_a"].to_numpy())),
            "url_b": pa.array(_pad_fp(t["fp_b"].to_numpy())),
        }),
        batch_format="pyarrow",
    )
    nodes = _distinct_fps(fp_rows, num_partitions=P).map_batches(
        lambda t: pa.table({"url": pa.array(_pad_fp(t["fp"].to_numpy()))}),
        batch_format="pyarrow",
    )
    lp = label_propagation(nodes, sedges)  # (url=fp_str, cluster_id=root)

    def doc_key(t: pa.Table) -> pa.Table:
        fps = _pad_fp(t["fp"].to_numpy())
        return pa.table({
            id_col: t[id_col].combine_chunks(),
            "fp_s": pa.array(fps),
            "_part": pa.array(key_partition(fps, P)),
        })

    def lp_key(t: pa.Table) -> pa.Table:
        fp_s = t["url"].to_numpy(zero_copy_only=False)
        return pa.table({
            "fp_s": t["url"].combine_chunks(),
            "root": t["cluster_id"].combine_chunks(),
            "_part": pa.array(key_partition(fp_s, P)),
        })

    def join_root(docs: pd.DataFrame, labs: pd.DataFrame) -> pd.DataFrame:
        labs = labs.drop_duplicates("fp_s")
        m = docs.merge(labs, on="fp_s", how="left")
        root = m["root"].where(m["root"].notna(), m["fp_s"])
        return pd.DataFrame({id_col: m[id_col], "root": root})

    tagged = hash_exchange(
        [fp_rows.map_batches(doc_key, batch_format="pyarrow"),
         lp.map_batches(lp_key, batch_format="pyarrow")],
        join_root,
        num_partitions=P,
        schema=pa.schema([(id_col, pa.string()), ("root", pa.string())]),
        in_schemas=[pa.schema([(id_col, pa.string()),
                               ("fp_s", pa.string())]),
                    pa.schema([("fp_s", pa.string()),
                               ("root", pa.string())])],
    )

    def root_key(t: pa.Table) -> pa.Table:
        r = t["root"].to_numpy(zero_copy_only=False)
        return t.append_column("_part", pa.array(key_partition(r, P)))

    def attach_min(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({id_col: pd.Series(dtype=object),
                                 "cluster_id": pd.Series(dtype=object)})
        mins = df.groupby("root", sort=False)[id_col].transform("min")
        return pd.DataFrame({id_col: df[id_col], "cluster_id": mins})

    return hash_exchange(
        [tagged.map_batches(root_key, batch_format="pyarrow")],
        attach_min,
        num_partitions=P,
        schema=pa.schema([(id_col, pa.string()),
                          ("cluster_id", pa.string())]),
        in_schemas=[pa.schema([(id_col, pa.string()),
                               ("root", pa.string())])],
    )


def simhash_clusters(
    ds: ray.data.Dataset, *, max_hamming: int = 3, id_col: str = "url",
    text_col: str = "text", concurrency: int | tuple | None = None,
    group_cap: int = 4096, dsu_max_edges: int = 20_000_000,
    hash_fn: str = "fast",
) -> ray.data.Dataset:
    """Rows labeled by SimHash near-dup component (min-member url).

    Pipeline: fingerprints → fp-level candidate graph (``simhash_fp_pairs``)
    → count()-GATED components over DISTINCT-fp edges: driver DSU while
    the edge list is under ``dsu_max_edges`` (bounded by the distinct-fp
    count, not the document count), fully distributed label propagation
    past it (``_simhash_clusters_lp`` — no driver collect, no
    component-sized broadcast) → per-component min url → attach.  Docs
    with < 1 token keep their own url as a singleton cluster id."""
    from data_dedup_ray.stages.simhash import SimHashFingerprints

    # one corpus scan: fingerprints for tokenful docs AND the empty-doc
    # mask ride in the same materialized table (keep_empty), so singleton
    # handling needs no second tokenize pass
    fp_all = ds.map_batches(
        stage_task(SimHashFingerprints, id_col=id_col, text_col=text_col,
                   keep_empty=True, hash_fn=hash_fn),
        batch_format="pyarrow",
        batch_size=1024,
    ).materialize()
    fp_rows = fp_all.map_batches(
        lambda t: t.filter(t["has"]).drop_columns(["has"]),
        batch_format="pyarrow",
    )

    # materialize once: count() reads block metadata; the DSU collect (or
    # the label-propagation input) reuses the same blocks
    edges_ds = simhash_fp_pairs(
        fp_rows, max_hamming=max_hamming, group_cap=group_cap
    ).materialize()
    if edges_ds.count() > dsu_max_edges:
        clustered = _simhash_clusters_lp(fp_rows, edges_ds, id_col=id_col)

        def singletons_lp(t: pa.Table) -> pa.Table:
            ids = t.filter(pc.invert(t["has"]))[id_col].combine_chunks()
            return pa.table({id_col: ids, "cluster_id": ids})

        empty_lp = fp_all.map_batches(singletons_lp, batch_format="pyarrow")
        return clustered.union(empty_lp)

    edges = edges_ds.to_pandas()
    fp2root = dsu_components(edges, a="fp_a", b="fp_b")
    ref = ray.put(fp2root)

    def attach_root(b: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        # int-domain map (components.map_roots_int64): fps absent from
        # the DSU dict — docs with no candidate edges, the common case —
        # must NOT round-trip through float64, which corrupts |fp| > 2^53
        root = map_roots_int64(b["fp"].to_numpy(), m)
        return pd.DataFrame({id_col: b[id_col], "root": root})

    tagged = fp_rows.map_batches(attach_root, batch_format="pandas")

    def min_part(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_part"] = (
            b["root"].to_numpy().view(np.uint64) % np.uint64(64)
        ).astype(np.int64)
        return b

    min_urls = hash_exchange(
        [tagged.map_batches(min_part, batch_format="pandas")],
        lambda g: g.groupby("root", sort=False, as_index=False)[id_col]
        .min(),
        num_partitions=64,
        schema=pa.schema([("root", pa.int64()), (id_col, pa.string())]),
        in_schemas=[pa.schema([(id_col, pa.string()),
                               ("root", pa.int64())])],
    ).to_pandas()
    root2min = dict(zip(min_urls["root"], min_urls[id_col]))
    ref_min = ray.put(root2min)

    # distributed attach: map each fingerprinted doc's root to the
    # component's min url (broadcast dict is component-count-sized, NOT
    # corpus-sized — no full-corpus driver collect on this path); plain
    # task map — the state is one zero-copy ray.get per task
    def attach_min(b: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref_min)
        return pd.DataFrame({id_col: b[id_col],
                             "cluster_id": b["root"].map(m)})

    clustered = tagged.map_batches(attach_min, batch_format="pandas")

    # docs with zero tokens are singletons — read straight off the
    # materialized fingerprint table's mask (no second corpus scan)
    def singletons(t: pa.Table) -> pa.Table:
        ids = t.filter(pc.invert(t["has"]))[id_col].combine_chunks()
        return pa.table({id_col: ids, "cluster_id": ids})

    empty = fp_all.map_batches(singletons, batch_format="pyarrow")
    return clustered.union(empty)


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    *,
    id_col: str = "url",
    text_col: str = "text",
    shingle_k: int = 5,
    threshold: float = 0.8,
    num_partitions: int = 64,
    group_cap: int = 100_000,
) -> ray.data.Dataset:
    """EXACT all-pairs n-gram Jaccard ≥ ``threshold`` via prefix filtering.

    Deterministic recall 1.0 — unlike the probabilistic MinHash/LSH path
    (``minhash_dedup_pairs``), no signature can miss a qualifying pair.
    Prefix-filtering principle (AllPairs/PPJoin family): under any global
    total order on set elements, two sets with ``J(A,B) ≥ t`` must share
    at least one element within each set's first ``n − ceil(t·n) + 1``
    elements.  Our shingle sets are sorted uint64 hash arrays (np.unique
    output), so the hash order is the global order for free.

    Shuffle plan: only the (short) prefix hashes enter the candidate
    shuffle — ``(shingle, url)`` rows keyed coarsely on ``shingle % P`` —
    then one vectorized self-merge per partition emits candidates, and the
    exact partitioned Jaccard join verifies.  At 100 TB, re-ordering
    elements by ascending document frequency (a cheap pre-count) shrinks
    prefixes' candidate fan-out further without changing semantics.

    ``group_cap`` is a safety valve for pathological hot shingles; its
    default is high enough that results stay exact on realistic corpora
    (a star fallback beyond it preserves connectivity, not pair recall).
    """
    t = threshold
    # exact-rational threshold for the prefix bound: float ceil(t*n) can
    # overshoot (t=0.8, n=5 → ceil(4.0000000000001)=5) and under-size the
    # prefix, dropping pairs sitting exactly at the threshold
    _T_DENOM = 10**6
    t_scaled = round(t * _T_DENOM)
    sh = shingle_rows(ds, id_col=id_col, text_col=text_col,
                      shingle_k=shingle_k).materialize()

    def emit_prefix(b: pa.Table) -> pa.Table:
        # vectorized prefix emission: zero-copy blob views + one
        # multi-range gather (no per-doc Python loop)
        data, off = _blob_views(b["sh"])
        n = np.diff(off)
        need = -((-t_scaled * n) // _T_DENOM)
        # a threshold above 1.0 makes the prefix length negative —
        # clamp to 0 (no pair can qualify, emit no candidates) instead
        # of crashing np.repeat in _seg_gather
        p = np.maximum(np.where(n > 0, n - need + 1, 0), 0)
        doc_of, gidx = _seg_gather(off[:-1], p)
        cat = data[gidx]
        return pa.table({
            "shingle": pa.array(cat),
            id_col: b[id_col].combine_chunks().take(pa.array(doc_of)),
            "_part": pa.array(
                (cat % np.uint64(num_partitions)).astype(np.int64)
            ),
        })

    def emit_partition(g: pd.DataFrame) -> pd.DataFrame:
        return _pairs_in_partition(
            g, key_cols=["shingle"], id_col=id_col, group_cap=group_cap,
        )

    cand = hash_exchange(
        [sh.map_batches(emit_prefix, batch_format="pyarrow")],
        emit_partition,
        num_partitions=num_partitions,
        schema=pa.schema([(f"{id_col}_a", pa.string()),
                          (f"{id_col}_b", pa.string())]),
    )
    # no explicit distinct round: the verify join dedups equal pairs in
    # its url_a-keyed step; tokenization happened exactly once (sh)
    return verify_pairs_partitioned(
        ds, cand, id_col=id_col, text_col=text_col,
        shingle_k=shingle_k, threshold=threshold, sh=sh,
    )


def minhash_dedup_clusters(
    ds: ray.data.Dataset, *, threshold: float = 0.7,
    dsu_max_edges: int = 20_000_000, method: str = "auto", **lsh_kwargs
) -> ray.data.Dataset:
    """Every row labeled with its near-dup component's min-member url.

    The DSU-vs-label-propagation decision is made from a cheap
    ``count()`` aggregate over the verified-pair Dataset — when the edge
    list is past the driver guard it is handed to the distributed
    ``label_propagation`` as a Dataset and NEVER collected.

    ``method``: "auto" (count-gated DSU / label propagation), or force
    "largestar" — the O(log²n)-round alternating star algorithm
    (pipelines/cc.py), preferable when components may be chain-shaped
    (label propagation pays diameter rounds)."""
    id_col = lsh_kwargs.get("id_col", "url")
    text_col = lsh_kwargs.get("text_col", "text")
    shingle_k = lsh_kwargs.get("shingle_k", 5)
    # tokenize once; the shingle table covers every corpus id (empty blobs
    # included), so it doubles as the id universe for the final attach —
    # the corpus itself is read exactly once end-to-end
    sh = shingle_rows(ds, id_col=id_col, text_col=text_col,
                      shingle_k=shingle_k).materialize()
    # materialize once: count() reads block metadata and the DSU collect
    # (or the label-propagation input) reuses the same blocks — the verify
    # exchange never re-executes
    edges = minhash_dedup_pairs(ds, threshold=threshold, sh=sh,
                                **lsh_kwargs).materialize()
    if method == "largestar":
        from data_dedup_ray.pipelines.cc import largestar_components

        return largestar_components(
            sh.select_columns([id_col]),
            edges.select_columns(["url_a", "url_b"]),
            node_col=id_col,
        )
    if edges.count() > dsu_max_edges:
        # edge list beyond the driver DSU guard: distributed min-label
        # propagation (components.py) — same deterministic min-member ids
        from data_dedup_ray.pipelines.components import label_propagation

        return label_propagation(
            sh.select_columns([id_col]),
            edges.select_columns(["url_a", "url_b"]),
            node_col=id_col,
        )
    assignment = dsu_components(edges.to_pandas())
    return attach_clusters(
        sh.select_columns([id_col]), assignment, id_col=id_col
    )


# --------------------------------------------------------------------------
# Cross-corpus near-dup: new crawl vs existing index
# --------------------------------------------------------------------------


def cross_corpus_near_pairs(
    new_ds: ray.data.Dataset,
    index_ds: ray.data.Dataset,
    *,
    threshold: float = 0.7,
    **lsh_kwargs,
) -> ray.data.Dataset:
    """Near-duplicate pairs BETWEEN two corpora: ``(new_url, index_url,
    jaccard)`` for every new-crawl page whose k-shingle Jaccard with some
    existing-index page is ≥ ``threshold``.  Returns a Dataset — nothing
    is collected on the driver.

    This is the near-dup counterpart of snapshots.new_content — "which
    newly crawled pages are (close to) something we already have" — run
    as ONE LSH job over the tagged union: each side's ids get a 1-byte
    side prefix (the same url can legitimately appear in both corpora),
    bands/shingles are computed once per page exactly as in the
    single-corpus pipeline, and same-side candidate pairs are dropped
    before the Jaccard verify join, so the verify exchange only carries
    cross-corpus candidates.  (A production variant would also suppress
    same-side pairs at band-emission; the emission is vectorized and
    same-side candidates are bounded by the single-corpus pair count, so
    the saving is second-order next to the verify join it already
    skips.)
    """
    id_col = lsh_kwargs.get("id_col", "url")
    text_col = lsh_kwargs.get("text_col", "text")
    shingle_k = lsh_kwargs.get("shingle_k", 5)

    def _tag(prefix: str):
        def fn(t: pa.Table) -> pa.Table:
            tagged = pc.binary_join_element_wise(
                pa.scalar(prefix), t[id_col].combine_chunks().cast(pa.string()),
                "",
            )
            return pa.table({id_col: tagged,
                             text_col: t[text_col].combine_chunks()})
        return fn

    union = (
        index_ds.map_batches(_tag("i|"), batch_format="pyarrow")
        .union(new_ds.map_batches(_tag("n|"), batch_format="pyarrow"))
    )
    sh = shingle_rows(union, id_col=id_col, text_col=text_col,
                      shingle_k=shingle_k).materialize()
    lsh_kwargs.setdefault("distinct", False)
    cand = lsh_candidate_pairs(union, sh=sh, **lsh_kwargs)
    # cross-side only: 'i|' < 'n|', so url_a is always the index side
    cross = cand.map_batches(
        lambda t: t.filter(pc.not_equal(
            pc.utf8_slice_codeunits(t[f"{id_col}_a"], 0, 1),
            pc.utf8_slice_codeunits(t[f"{id_col}_b"], 0, 1),
        )),
        batch_format="pyarrow",
    )
    ver = verify_pairs_partitioned(
        union, cross, id_col=id_col, text_col=text_col,
        shingle_k=shingle_k, threshold=threshold, sh=sh,
    )

    def untag(t: pa.Table) -> pa.Table:
        # 'i|' < 'n|' sorts the index side into url_a deterministically
        return pa.table({
            "new_url": pc.utf8_slice_codeunits(
                t[f"{id_col}_b"].combine_chunks(), 2),
            "index_url": pc.utf8_slice_codeunits(
                t[f"{id_col}_a"].combine_chunks(), 2),
            "jaccard": t["jaccard"].combine_chunks(),
        })

    return ver.map_batches(untag, batch_format="pyarrow")


def cross_corpus_near_pairs_sql(threshold: float = 0.7) -> str:
    """Exact all-cross-pairs shingle-Jaccard ground truth over
    web_pages (index) × snapshot2 (new)."""
    from data_dedup_ray.pipelines.snapshots import snapshots_sql

    return snapshots_sql(f"""
SELECT new_url, index_url, CAST(floor(j * 10000) AS BIGINT) AS jaccard_bp
FROM (
  SELECT inter.new_url, inter.index_url,
         inter.i * 1.0 / (ci.n + cn.n - inter.i) AS j
  FROM (
    SELECT a.url AS index_url, b.url AS new_url, count(*) AS i
    FROM (
      SELECT DISTINCT url, array_to_string(t[i:i+4], ' ') AS s
      FROM (SELECT url, regexp_extract_all(text, '[a-z0-9]+') AS t
            FROM web_pages) toks,
           UNNEST(generate_series(1, len(t) - 4)) AS g(i)
      WHERE len(t) >= 5) a
    JOIN (
      SELECT DISTINCT url, array_to_string(t[i:i+4], ' ') AS s
      FROM (SELECT url, regexp_extract_all(text, '[a-z0-9]+') AS t
            FROM snapshot2) toks,
           UNNEST(generate_series(1, len(t) - 4)) AS g(i)
      WHERE len(t) >= 5) b
    ON a.s = b.s GROUP BY 1, 2) inter
  JOIN (SELECT url, count(*) AS n FROM (
          SELECT DISTINCT url, array_to_string(t[i:i+4], ' ') AS s
          FROM (SELECT url, regexp_extract_all(text, '[a-z0-9]+') AS t
                FROM web_pages) toks,
               UNNEST(generate_series(1, len(t) - 4)) AS g(i)
          WHERE len(t) >= 5) GROUP BY url) ci
    ON ci.url = inter.index_url
  JOIN (SELECT url, count(*) AS n FROM (
          SELECT DISTINCT url, array_to_string(t[i:i+4], ' ') AS s
          FROM (SELECT url, regexp_extract_all(text, '[a-z0-9]+') AS t
                FROM snapshot2) toks,
               UNNEST(generate_series(1, len(t) - 4)) AS g(i)
          WHERE len(t) >= 5) GROUP BY url) cn
    ON cn.url = inter.new_url)
WHERE j >= {threshold}""")


# --------------------------------------------------------------------------
# Nearest-duplicate attribution: per new page, the argmax-Jaccard match
# --------------------------------------------------------------------------

_ATTR_SCHEMA = pa.schema([
    ("new_url", pa.string()), ("best_index_url", pa.string()),
    ("jaccard_bp", pa.int64()), ("n_matches", pa.int64()),
])

_ATTR_IN = pa.schema([
    ("new_url", pa.string()), ("index_url", pa.string()),
    ("jaccard_bp", pa.int64()), ("n", pa.int64()),
])


def nearest_dup_attribution(pairs: ray.data.Dataset, *,
                            num_partitions: int = 16) -> ray.data.Dataset:
    """Provenance view over ``cross_corpus_near_pairs`` output: for each
    new-crawl page with at least one verified match, the single BEST
    existing-index page — ``(new_url, best_index_url, jaccard_bp,
    n_matches)`` with deterministic ties (jaccard_bp desc, index_url
    asc).  This is what an audit UI or a "near-dup of X" dedup log line
    shows, and what incremental ingest uses to pick the canonical
    ancestor of an edited re-capture.

    Scale shape: input is the OUTPUT-sized verified pair list, never the
    corpus.  Per-batch combiner keeps one best row + a match count per
    new_url before the one new_url-keyed exchange; the partition fn
    re-aggregates partials (split groups may divide a url's rows), so
    counts stay exact.  Jaccard is compared in floor-basis-points — the
    exact representation the SQL twin uses — so tie order is identical
    on both sides."""
    P = num_partitions

    def prep(t: pa.Table) -> pa.Table:
        bp = np.floor(
            t["jaccard"].to_numpy(zero_copy_only=False) * 10000
        ).astype(np.int64)
        df = pd.DataFrame({
            "new_url": t["new_url"].to_pandas().astype(object),
            "index_url": t["index_url"].to_pandas().astype(object),
            "jaccard_bp": bp,
        }).sort_values(["new_url", "jaccard_bp", "index_url"],
                       ascending=[True, False, True])
        g = df.groupby("new_url", sort=False)
        out = g.first().reset_index()
        out["n"] = g.size().to_numpy(np.int64)
        return pa.table({
            "new_url": pa.array(out["new_url"], pa.string()),
            "index_url": pa.array(out["index_url"], pa.string()),
            "jaccard_bp": pa.array(out["jaccard_bp"].to_numpy(np.int64)),
            "n": pa.array(out["n"].to_numpy(np.int64)),
            "_part": pa.array(key_partition(
                out["new_url"].to_numpy(object), P)),
        })

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "new_url": pd.Series([], dtype=object),
                "best_index_url": pd.Series([], dtype=object),
                "jaccard_bp": pd.Series([], dtype=np.int64),
                "n_matches": pd.Series([], dtype=np.int64)})
        df = df.sort_values(["new_url", "jaccard_bp", "index_url"],
                            ascending=[True, False, True])
        g = df.groupby("new_url", sort=False)
        out = g.agg(best_index_url=("index_url", "first"),
                    jaccard_bp=("jaccard_bp", "first"),
                    n_matches=("n", "sum")).reset_index()
        return out

    return hash_exchange(
        [pairs.map_batches(prep, batch_format="pyarrow")], agg,
        num_partitions=P, schema=_ATTR_SCHEMA, in_schemas=[_ATTR_IN])


def nearest_dup_attribution_sql(threshold: float = 0.7) -> str:
    """The full cross-corpus statement nested as a subquery, argmax via
    row_number with the same (bp desc, url asc) tie order."""
    inner = cross_corpus_near_pairs_sql(threshold)
    return f"""SELECT new_url, index_url AS best_index_url, jaccard_bp,
       CAST(n_matches AS BIGINT) AS n_matches
FROM (
  SELECT new_url, index_url, jaccard_bp,
         row_number() OVER (PARTITION BY new_url
                            ORDER BY jaccard_bp DESC, index_url) AS rn,
         count(*) OVER (PARTITION BY new_url) AS n_matches
  FROM ({inner}) pairs)
WHERE rn = 1"""


# --------------------------------------------------------------------------
# Skew-split candidate generation: hot bands never enter the shuffle
# --------------------------------------------------------------------------


def lsh_candidate_pairs_skew_split(
    ds: ray.data.Dataset | None,
    *,
    id_col: str = "url",
    text_col: str = "text",
    n_perm: int = 126,
    band_r: int = 3,
    shingle_k: int = 5,
    seed: int = 42,
    group_cap: int = 256,
    num_partitions: int = 64,
    distinct: bool = True,
    sh: ray.data.Dataset | None = None,
    method: str = "perm",
) -> ray.data.Dataset:
    """``lsh_candidate_pairs`` with EXPLICIT heavy-hitter splitting
    (north_rule: "salted groupby … with explicit skew splitting for hot
    bands"), for corpora where boilerplate bands are so hot that even
    co-locating one band's rows in one partition is a straggler.

    The plain path salts only the pair-generation cost (star fallback
    inside the owning partition) — the hot band's rows still all land on
    one reducer.  Here the band table takes one extra tiny aggregation:

    1. pre-count per ``(band_id, band_hash)`` with a per-batch combiner
       (shuffle volume = distinct bands per batch, not rows) and keep
       groups ``> group_cap`` — the hot set, with each band's global
       min member (the star center).  Output is heavy-hitters only, so
       it is broadcast-sized by construction.
    2. hot-band rows SKIP the exchange entirely: each row pairs with its
       band's broadcast star center map-side — perfectly parallel, no
       reducer sees the whole band (stronger than salting the key, which
       still ships every row somewhere).
    3. the remaining (cold) rows flow through the normal exchange and
       vectorized all-pairs emission.

    The emitted pair set is IDENTICAL to the plain path's (both produce
    star(min, others) for over-cap groups — the plain path's groups are
    whole within one partition, so its per-partition decision is already
    global), hence the same verified pairs and clusters.
    """
    from ray.data.aggregate import Min, Sum

    if method not in ("perm", "oph"):
        raise ValueError(f"method must be 'perm' or 'oph', got {method!r}")
    if method == "oph":
        # the OPH band stage (the verified pipelines' default kernel)
        # composes with the skew split unchanged — band rows are band
        # rows; hot-band handling is agnostic to the signature kernel
        from data_dedup_ray.pipelines.oph import ShingleOPHLSH
        if sh is None:
            sh = shingle_rows(ds, id_col=id_col, text_col=text_col,
                              shingle_k=shingle_k).materialize()
        bands = sh.map_batches(
            stage_task(
                ShingleOPHLSH, n_perm=n_perm, band_r=band_r, seed=seed,
                id_col=id_col, num_partitions=num_partitions,
            ),
            batch_format="pyarrow", batch_size=1024,
        )
    elif sh is not None:
        bands = sh.map_batches(
            stage_task(
                ShingleMinHashLSH, n_perm=n_perm, band_r=band_r, seed=seed,
                id_col=id_col, num_partitions=num_partitions,
            ),
            batch_format="pyarrow", batch_size=1024,
        )
    else:
        bands = ds.map_batches(
            stage_task(
                MinHashLSH, n_perm=n_perm, band_r=band_r, shingle_k=shingle_k,
                seed=seed, id_col=id_col, text_col=text_col,
                num_partitions=num_partitions,
            ),
            batch_format="pyarrow", batch_size=1024,
        )
    bands = bands.materialize()  # two passes: pre-count + emission

    def pcount(t: pa.Table) -> pa.Table:
        g = t.group_by(["band_id", "band_hash"]).aggregate(
            [(id_col, "count"), (id_col, "min")]
        )
        return g.rename_columns(["band_id", "band_hash", "n", "min_id"])

    heavy = (
        bands.map_batches(pcount, batch_format="pyarrow")
        .groupby(["band_id", "band_hash"])
        .aggregate(Sum(on="n", alias_name="n"),
                   Min(on="min_id", alias_name="min_id"))
        .filter(expr=f"n > {int(group_cap)}")
        .to_pandas()  # heavy hitters only — broadcast-sized by definition
    )
    heavy_map = (
        {
            (int(b), int(h)): m
            for b, h, m in zip(heavy["band_id"], heavy["band_hash"],
                               heavy["min_id"])
        }
        if len(heavy) and "band_id" in heavy.columns else {}
    )
    heavy_ref = ray.put(heavy_map)

    class _SplitEmit:
        """Map-side star pairs for hot bands; pass-through for cold rows."""

        def __init__(self, ref, emit_stars: bool):
            heavy = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            # heavy-hitter frame built ONCE per actor: the per-batch hot
            # test and center lookup are then a single vectorized merge
            # (this path exists because hot bands are huge — a per-row
            # Python loop here defeated its own purpose)
            self.heavy_df = pd.DataFrame({
                "band_id": np.fromiter((k[0] for k in heavy), np.int64,
                                       len(heavy)),
                "band_hash": np.fromiter((k[1] for k in heavy), np.int64,
                                         len(heavy)),
                "center": list(heavy.values()),
            })
            self.emit_stars = emit_stars

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = pd.DataFrame({
                "band_id": t["band_id"].to_numpy(zero_copy_only=False),
                "band_hash": t["band_hash"].to_numpy(zero_copy_only=False),
            })
            m = keys.merge(self.heavy_df, on=["band_id", "band_hash"],
                           how="left")
            hot = m["center"].notna().to_numpy()
            if self.emit_stars:
                if not hot.any():  # all-cold batch: avoid the NaN-typed
                    return pa.table({  # empty center column
                        f"{id_col}_a": pa.array([], pa.string()),
                        f"{id_col}_b": pa.array([], pa.string()),
                    })
                sub = t.filter(pa.array(hot))
                centers = m["center"].to_numpy()[hot]
                members = sub[id_col].to_pandas().to_numpy()
                keep = members != centers
                return pa.table({
                    f"{id_col}_a": pa.array(centers[keep], pa.string()),
                    f"{id_col}_b": pa.array(members[keep], pa.string()),
                })
            return t.filter(pa.array(~hot))

    stars = bands.map_batches(
        stage_task(_SplitEmit, ref=heavy_ref, emit_stars=True),
        batch_format="pyarrow",
    )
    cold = bands.map_batches(
        stage_task(_SplitEmit, ref=heavy_ref, emit_stars=False),
        batch_format="pyarrow",
    )

    def emit_partition(g: pd.DataFrame) -> pd.DataFrame:
        return _pairs_in_partition(
            g, key_cols=["band_id", "band_hash"], id_col=id_col,
            group_cap=group_cap,
        )

    cold_pairs = hash_exchange(
        [cold], emit_partition, num_partitions=num_partitions,
        schema=pa.schema([(f"{id_col}_a", pa.string()),
                          (f"{id_col}_b", pa.string())]),
    )
    pairs = cold_pairs.union(stars)
    if not distinct:
        return pairs
    return _distinct_pairs(pairs, [f"{id_col}_a", f"{id_col}_b"],
                           num_partitions=num_partitions)


# --------------------------------------------------------------------------
# Directional containment join (quote / subset detection)
# --------------------------------------------------------------------------


def containment_pairs(
    ds: ray.data.Dataset,
    *,
    id_col: str = "url",
    text_col: str = "text",
    shingle_k: int = 5,
    threshold: float = 0.8,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """EXACT directional containment join: pairs ``(url_a, url_b)`` with
    ``|A∩B| / |A| ≥ threshold`` (A = url_a's shingle set, a ≠ b) — the
    asymmetric near-dup measure that catches a short page quoted inside a
    long one, where symmetric Jaccard stays below any useful threshold.

    Candidate generation is the asymmetric prefix filter: a probe set A
    with containment ≥ t must share an element within its FIRST
    ``n_A − ceil(t·n_A) + 1`` sorted elements with B — but B may match A
    anywhere, so the probe side ships prefixes while the index side ships
    full sets.  At 100 TB the index side is the big stream: reorder
    elements by ascending document frequency (cheap pre-count) and cap
    per-shingle index postings — the classic AllPairs refinement; at test
    scale the unfiltered form keeps the oracle exact.  The verify join is
    the shared partitioned machinery with ``metric="containment"``.
    """
    t = threshold
    # threshold as an exact rational t_scaled/_T_DENOM (thresholds are
    # human-written decimals, exact to 6 places)
    _T_DENOM = 10**6
    t_scaled = round(t * _T_DENOM)
    P = num_partitions
    sh = shingle_rows(ds, id_col=id_col, text_col=text_col,
                      shingle_k=shingle_k).materialize()

    def emit(role_probe: bool):
        def fn(b: pa.Table) -> pa.Table:
            # vectorized: zero-copy blob views + one multi-range gather.
            # Probe side ships only its first n − ceil(t·n) + 1 sorted
            # elements; ceil(t·n) is EXACT integer arithmetic (float
            # ceil can overshoot — t=0.8, n=5 → ceil(4.0000000000001)=5
            # — under-sizing the prefix and dropping pairs that sit
            # exactly at the threshold)
            data, off = _blob_views(b["sh"])
            n = np.diff(off)
            if role_probe:
                need = -((-t_scaled * n) // _T_DENOM)
                lens = np.where(n > 0, n - need + 1, 0)
            else:
                lens = n
            doc_of, gidx = _seg_gather(off[:-1], lens)
            cat = data[gidx]
            return pa.table({
                "shingle": pa.array(cat),
                id_col: b[id_col].combine_chunks().take(pa.array(doc_of)),
                "_part": pa.array((cat % np.uint64(P)).astype(np.int64)),
            })
        return fn

    def cands(probe: pd.DataFrame, index: pd.DataFrame) -> pd.DataFrame:
        m = probe.merge(index, on="shingle", suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] != m[f"{id_col}_b"]]
        return (
            m[[f"{id_col}_a", f"{id_col}_b"]]
            .drop_duplicates().reset_index(drop=True)
        )

    side_schema = pa.schema([
        ("shingle", pa.uint64()), (id_col, pa.string()),
    ])
    cand = hash_exchange(
        [
            sh.map_batches(emit(True), batch_format="pyarrow"),
            sh.map_batches(emit(False), batch_format="pyarrow"),
        ],
        cands,
        num_partitions=P,
        schema=pa.schema([(f"{id_col}_a", pa.string()),
                          (f"{id_col}_b", pa.string())]),
        in_schemas=[side_schema, side_schema],
    )
    return verify_pairs_partitioned(
        ds, cand, id_col=id_col, text_col=text_col, shingle_k=shingle_k,
        threshold=threshold, sh=sh, metric="containment",
    )


def containment_pairs_sql(threshold: float = 0.8) -> str:
    """Exact all-directional-pairs shingle containment ground truth."""
    from data_dedup_ray.corpus import WEB_PAGES_CTE

    return f"""
WITH {WEB_PAGES_CTE},
toks AS (SELECT url, regexp_extract_all(text, '[a-z0-9]+') AS t
         FROM web_pages),
sh AS (
  SELECT DISTINCT url, array_to_string(t[i:i+4], ' ') AS s
  FROM toks, UNNEST(generate_series(1, len(t) - 4)) AS g(i)
  WHERE len(t) >= 5
),
cnt AS (SELECT url, count(*) AS n FROM sh GROUP BY url),
inter AS (
  SELECT a.url AS url_a, b.url AS url_b, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.url <> b.url
  GROUP BY 1, 2
)
SELECT url_a, url_b,
       -- two-step (ratio, then x10000) to mirror the pipeline's rounding
       -- order exactly: double(i/n) first, floor(c*10000) second
       CAST(floor((i * 1.0 / ca.n) * 10000) AS BIGINT) AS containment_bp
FROM inter JOIN cnt ca ON ca.url = inter.url_a
WHERE i * 1.0 / ca.n >= {threshold}"""
