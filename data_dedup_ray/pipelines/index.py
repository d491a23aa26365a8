"""Persisted MinHash/shingle SIGNATURE STORE + incremental near-dup.

The state a 100 TB dedup pipeline keeps between crawls: instead of
re-reading and re-tokenizing the ENTIRE existing index every time a new
crawl arrives (what ``near.cross_corpus_near_pairs`` does over two live
corpora), the index side's canonical k-shingle hash sets are written ONCE
as a hash-partitioned, resumable parquet store (8 bytes per shingle — no
text, no html), and each incremental run:

1. tokenizes ONLY the new crawl,
2. reads the store's blobs straight off parquet (column-pruned, zero
   re-tokenization, and the store is already the verify join's wire
   format),
3. runs the same band → cross-side filter → exact-Jaccard verify
   pipeline as the live-pair path.

Result schema and semantics are IDENTICAL to
``cross_corpus_near_pairs(new, index)`` when the store was built from
``index`` at the same shingle_k — pinned by an equality test and by
sharing its SQL oracle.  Store writes go through the per-partition
resumable sink, so a crashed build resumes without recomputing finished
partitions, and `_META.json` records the shingle_k it was built with.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from data_dedup_ray.pipelines.near import (lsh_candidate_pairs, shingle_rows,
                                           verify_pairs_partitioned)


def build_shingle_store(
    ds: ray.data.Dataset, path: str, *, id_col: str = "url",
    text_col: str = "text", shingle_k: int = 5, num_partitions: int = 32,
):
    """Tokenize ``ds`` once and persist its ``(id, sh)`` shingle-set table
    under ``path`` (resumable hash-partitioned parquet).  Returns the
    sink's per-partition status frame."""
    from data_dedup_ray.state.sink import resumable_write_parquet

    sh = shingle_rows(ds, id_col=id_col, text_col=text_col,
                      shingle_k=shingle_k)
    return resumable_write_parquet(
        sh, path, key_col=id_col, num_partitions=num_partitions,
        config={"kind": "shingle_store", "shingle_k": shingle_k,
                "id_col": id_col},
    )


def read_shingle_store(path: str | list[str]) -> ray.data.Dataset:
    """The stored ``(id, sh)`` table as a streaming Dataset.  A list of
    paths reads several crawls' stores as one index — the rolling-update
    form: each crawl appends its own store directory, nothing is
    rewritten.  (read_parquet rejects directory LISTS, so expand each
    store to its part files.)"""
    if isinstance(path, (list, tuple)):
        import glob
        import os

        files: list[str] = []
        for p in path:
            files += sorted(glob.glob(os.path.join(p, "part=*",
                                                   "*.parquet")))
        # partitioning=None: the hive part= directory key is a sink
        # sharding detail, never a payload column of the store
        return ray.data.read_parquet(files, partitioning=None)
    return ray.data.read_parquet(path, partitioning=None)


def incremental_near_pairs(
    new_ds: ray.data.Dataset, store_path: str, *, threshold: float = 0.7,
    **lsh_kwargs,
) -> ray.data.Dataset:
    """``(new_url, index_url, jaccard)`` — near-dup pairs between the new
    crawl and the persisted index, tokenizing only the new side.

    The index side contributes ONLY its stored blobs (8 B/shingle) to the
    band emission and the verify join; its text is never read."""
    from data_dedup_ray.state.sink import validate_store_config

    id_col = lsh_kwargs.get("id_col", "url")
    text_col = lsh_kwargs.get("text_col", "text")
    shingle_k = lsh_kwargs.get("shingle_k", 5)
    validate_store_config(store_path, {"shingle_k": shingle_k,
                                       "id_col": id_col})

    def _tag(prefix: str):
        def fn(t: pa.Table) -> pa.Table:
            tagged = pc.binary_join_element_wise(
                pa.scalar(prefix),
                t[id_col].combine_chunks().cast(pa.string()), "")
            # parquet round-trips large_binary to binary; cast back so the
            # union's schema matches the live shingle table (no-op on the
            # fresh side)
            return pa.table({id_col: tagged,
                             "sh": t["sh"].combine_chunks().cast(
                                 pa.large_binary())})
        return fn

    sh_new = shingle_rows(new_ds, id_col=id_col, text_col=text_col,
                          shingle_k=shingle_k)
    sh = (
        read_shingle_store(store_path)
        .map_batches(_tag("i|"), batch_format="pyarrow")
        .union(sh_new.map_batches(_tag("n|"), batch_format="pyarrow"))
        .materialize()
    )
    lsh_kwargs.setdefault("distinct", False)
    cand = lsh_candidate_pairs(None, sh=sh, **lsh_kwargs)
    # cross-side only: 'i|' < 'n|', so url_a is always the index side
    cross = cand.map_batches(
        lambda t: t.filter(pc.not_equal(
            pc.utf8_slice_codeunits(t[f"{id_col}_a"], 0, 1),
            pc.utf8_slice_codeunits(t[f"{id_col}_b"], 0, 1),
        )),
        batch_format="pyarrow",
    )
    ver = verify_pairs_partitioned(
        None, cross, id_col=id_col, text_col=text_col,
        shingle_k=shingle_k, threshold=threshold, sh=sh,
    )

    def untag(t: pa.Table) -> pa.Table:
        return pa.table({
            "new_url": pc.utf8_slice_codeunits(
                t[f"{id_col}_b"].combine_chunks(), 2),
            "index_url": pc.utf8_slice_codeunits(
                t[f"{id_col}_a"].combine_chunks(), 2),
            "jaccard": t["jaccard"].combine_chunks(),
        })

    return ver.map_batches(untag, batch_format="pyarrow")
