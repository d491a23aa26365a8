"""Tiny-fingerprint stores — the cheapest tiers of the incremental
state-size ladder a rolling 100 TB dedup picks from:

====================  =========  ===============================  ==========
tier                  state/doc  detects                          module
====================  =========  ===============================  ==========
content SHA-256       32 B       byte-identical re-captures       here
SimHash fingerprint   8 B        Hamming ≤ 3 near-duplicates      here
MinHash signature     ~1 KB      Jaccard ESTIMATE ≥ t             sigstore.py
shingle blobs         O(text)    EXACT Jaccard re-verification    index.py
====================  =========  ===============================  ==========

Every tier shares the same operational contract: build once per crawl
(resumable hash-partitioned parquet with config lineage, append-only —
a new crawl adds a directory, never rewrites an old one), then the next
crawl's incremental job reads ONLY stored fingerprints for the index
side — index text is never re-read, re-tokenized, or re-hashed.

Reference anchor: this generalizes Data-Dedup's lazy digest cascade
(cheap digests first, expensive only for survivors —
lib/Data/Dedup/Engine.pm blocking) from a single run's working set to
state persisted BETWEEN runs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from data_dedup_ray.engine.exchange import hash_exchange
from data_dedup_ray.stages.simhash import (
    N_KEYS,
    SimHashFingerprints,
    key_values,
    popcount64,
)
from data_dedup_ray.util import stage_task


# --------------------------------------------------------------------------
# Tier 1: content SHA-256 store (32 B/doc) — exact re-capture dedup
# --------------------------------------------------------------------------


def sha256_hex(texts) -> list[str]:
    """THE 32 B content identity of the store ladder — hex sha256 of
    the exact utf-8 text bytes.  One definition so the hash stores,
    audits, and timelines can never drift apart."""
    return [hashlib.sha256(s.encode("utf-8")).hexdigest()
            for s in texts]


def content_hash_rows(ds: ray.data.Dataset, *, id_col: str = "url",
                      text_col: str = "text") -> ray.data.Dataset:
    """``(id, sha)`` — hex sha256 of the exact text bytes."""

    def fn(t: pa.Table) -> pa.Table:
        shas = sha256_hex(t[text_col].to_pylist())
        return pa.table({
            id_col: t[id_col].combine_chunks().cast(pa.string()),
            "sha": pa.array(shas, pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def build_content_hash_store(
    ds: ray.data.Dataset, path: str, *, id_col: str = "url",
    text_col: str = "text", num_partitions: int = 32,
):
    """Persist the crawl's content hashes (resumable sink + lineage)."""
    from data_dedup_ray.state.sink import resumable_write_parquet

    return resumable_write_parquet(
        content_hash_rows(ds, id_col=id_col, text_col=text_col),
        path, key_col=id_col, num_partitions=num_partitions,
        config={"kind": "content_hash_store", "algo": "sha256",
                "id_col": id_col},
    )


def _read_store(path: str | list[str]) -> ray.data.Dataset:
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


read_content_hash_store = _read_store
read_simhash_store = _read_store


def incremental_new_content(
    new_ds: ray.data.Dataset, store_path: str | list[str], *,
    id_col: str = "url", text_col: str = "text", num_partitions: int = 32,
) -> ray.data.Dataset:
    """``(url, text_len)`` — pages of the new crawl whose exact content
    exists NOWHERE in the persisted index.  The snapshots.new_content
    anti-join with its index side read from the 32 B/doc store: both
    sides co-partition on the sha prefix, the index ships only distinct
    hashes (map-side ``pre`` combiner)."""
    P = num_partitions

    def prep_new(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        shas = [hashlib.sha256(s.encode("utf-8")).hexdigest()
                for s in texts]
        return pa.table({
            "sha": pa.array(shas, pa.string()),
            "url": t[id_col].combine_chunks().cast(pa.string()),
            "text_len": pc.utf8_length(t[text_col]).cast(pa.int64()),
            "_part": pa.array([int(s[:8], 16) % P for s in shas],
                              pa.int64()),
        })

    def prep_idx(t: pa.Table) -> pa.Table:
        shas = t["sha"].to_pylist()
        return pa.table({
            "sha": pa.array(shas, pa.string()),
            "_part": pa.array([int(s[:8], 16) % P for s in shas],
                              pa.int64()),
        })

    def anti(new_df: pd.DataFrame, idx_df: pd.DataFrame) -> pd.DataFrame:
        keep = ~new_df["sha"].isin(set(idx_df["sha"]))
        return new_df.loc[keep, ["url", "text_len"]].reset_index(drop=True)

    def distinct_sha(t: pa.Table) -> pa.Table:
        return t.group_by(["sha", "_part"]).aggregate([])

    return hash_exchange(
        [new_ds.map_batches(prep_new, batch_format="pyarrow"),
         _read_store(store_path).map_batches(prep_idx,
                                             batch_format="pyarrow")],
        anti, num_partitions=P,
        schema=pa.schema([("url", pa.string()), ("text_len", pa.int64())]),
        in_schemas=[pa.schema([("sha", pa.string()), ("url", pa.string()),
                               ("text_len", pa.int64())]),
                    pa.schema([("sha", pa.string())])],
        pre=[None, distinct_sha],
    )


# --------------------------------------------------------------------------
# Tier 2: SimHash fingerprint store (8 B/doc) — Hamming ≤ 3 near-dups
# --------------------------------------------------------------------------


def build_simhash_store(
    ds: ray.data.Dataset, path: str, *, id_col: str = "url",
    text_col: str = "text", hash_fn: str = "fast",
    num_partitions: int = 32,
):
    """Persist ``(id, fp:int64)`` — 8 bytes of similarity state per doc.
    ``hash_fn`` is lineage: fingerprints only compare between stores
    built with the same token hash."""
    from data_dedup_ray.state.sink import resumable_write_parquet

    rows = ds.map_batches(
        stage_task(SimHashFingerprints, id_col=id_col, text_col=text_col,
                   hash_fn=hash_fn),
        batch_format="pyarrow", batch_size=1024,
    )
    return resumable_write_parquet(
        rows, path, key_col=id_col, num_partitions=num_partitions,
        config={"kind": "simhash_store", "hash_fn": hash_fn,
                "id_col": id_col},
    )


def incremental_simhash_pairs(
    new_ds: ray.data.Dataset, store_path: str | list[str], *,
    id_col: str = "url", text_col: str = "text", max_hamming: int = 3,
    group_cap: int = 1024, hash_fn: str = "fast",
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """``(new_url, index_url, hamming)`` — SimHash near-dup pairs between
    the new crawl and the persisted 8 B/doc index.

    Recall 1.0 at ``max_hamming ≤ 3`` by the two-level pigeonhole
    (stages/simhash.py); only fixed-width (id, key, fp) rows shuffle.
    Index-vs-index candidates are dropped BEFORE the exchange's pair
    emission by the cross-side filter on the tag byte."""
    from data_dedup_ray.pipelines.near import (_distinct_pairs,
                                               _pairs_in_partition)
    from data_dedup_ray.state.sink import validate_store_config

    validate_store_config(store_path, {"hash_fn": hash_fn})
    P = num_partitions

    def _tag(prefix: str):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({
                id_col: pc.binary_join_element_wise(
                    pa.scalar(prefix),
                    t[id_col].combine_chunks().cast(pa.string()), ""),
                "fp": t["fp"].combine_chunks().cast(pa.int64()),
            })
        return fn

    fp_new = new_ds.map_batches(
        stage_task(SimHashFingerprints, id_col=id_col, text_col=text_col,
                   hash_fn=hash_fn),
        batch_format="pyarrow", batch_size=1024,
    )
    fps = (_read_store(store_path)
           .map_batches(_tag("i|"), batch_format="pyarrow")
           .union(fp_new.map_batches(_tag("n|"), batch_format="pyarrow")))

    def explode(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col].to_pylist(), dtype=object)
        fp = t["fp"].to_numpy(zero_copy_only=False).view(np.uint64)
        kv = key_values(fp)
        n = len(ids)
        chunk_id = np.tile(np.arange(N_KEYS, dtype=np.int32), n)
        chunk_val = kv.reshape(-1)
        with np.errstate(over="ignore"):
            h = (chunk_val.view(np.uint64) * np.uint64(0x100000001B3)
                 + chunk_id.astype(np.uint64))
        return pa.table({
            id_col: pa.array(np.repeat(ids, N_KEYS)),
            "chunk_id": pa.array(chunk_id),
            "chunk_val": pa.array(chunk_val),
            "fp": pa.array(np.repeat(fp.view(np.int64), N_KEYS)),
            "_part": pa.array((h % np.uint64(P)).astype(np.int64)),
        })

    def emit_and_verify(g: pd.DataFrame) -> pd.DataFrame:
        pairs = _pairs_in_partition(
            g, key_cols=["chunk_id", "chunk_val"], id_col=id_col,
            group_cap=group_cap, carry=["fp"])
        if not len(pairs):
            return pd.DataFrame({"new_url": [], "index_url": [],
                                 "hamming": []})
        a = pairs[f"{id_col}_a"].str[:1].to_numpy()
        b = pairs[f"{id_col}_b"].str[:1].to_numpy()
        pairs = pairs[a != b]  # cross-side only ('i|' < 'n|' ⇒ a=index)
        fa = pairs["fp_a"].to_numpy(dtype=np.int64).view(np.uint64)
        fb = pairs["fp_b"].to_numpy(dtype=np.int64).view(np.uint64)
        hd = popcount64(fa ^ fb)
        out = pd.DataFrame({
            "new_url": pairs[f"{id_col}_b"].str[2:].to_numpy(),
            "index_url": pairs[f"{id_col}_a"].str[2:].to_numpy(),
            "hamming": hd.astype(np.int64),
        })
        return out[out["hamming"] <= max_hamming]

    pairs = hash_exchange(
        [fps.map_batches(explode, batch_format="pyarrow")],
        emit_and_verify, num_partitions=P,
        schema=pa.schema([("new_url", pa.string()),
                          ("index_url", pa.string()),
                          ("hamming", pa.int64())]),
    )
    return _distinct_pairs(pairs, ["new_url", "index_url"],
                           keep_cols=["new_url", "index_url", "hamming"])


def incremental_new_content_sql() -> str:
    """DuckDB twin of ``incremental_new_content`` over web_pages (the
    persisted index) × snapshot2 — identical to snapshots.new_content_sql
    by construction (the store holds exactly the index corpus' hashes)."""
    from data_dedup_ray.pipelines.snapshots import new_content_sql

    return new_content_sql()


def incremental_simhash_pairs_sql(max_hamming: int = 3) -> str:
    """Brute-force DuckDB twin of
    ``incremental_simhash_pairs(hash_fn='sha')``: per-side sha256 token
    hashes, frequency-weighted per-bit majority vote, XOR popcount over
    every CROSS pair (near.simhash_sha_pairs_sql restated over the
    web_pages × snapshot2 union)."""
    from data_dedup_ray.corpus import WEB_PAGES_CTE
    from data_dedup_ray.pipelines.snapshots import SNAPSHOT2_CTE

    return f"""
WITH {WEB_PAGES_CTE},
{SNAPSHOT2_CTE},
fall AS (
  SELECT 'i|' || url AS id, text FROM web_pages
  UNION ALL SELECT 'n|' || url, text FROM snapshot2),
ftoks AS (
  SELECT id, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS tok
  FROM fall),
fth AS (SELECT id, substr(sha256(tok), 1, 16) AS h FROM ftoks),
fbits AS (
  SELECT id, g.j,
         CASE WHEN 2 * sum(
           (strpos('0123456789abcdef', substr(h, 16 - (g.j // 4), 1)) - 1)
             // (1 << (g.j % 4)) % 2
         ) > count(*) THEN 1 ELSE 0 END AS fpbit
  FROM fth CROSS JOIN generate_series(0, 63) AS g(j)
  GROUP BY id, g.j
), fham AS (
  SELECT a.id AS id_a, b.id AS id_b,
         sum(CASE WHEN a.fpbit <> b.fpbit THEN 1 ELSE 0 END) AS d
  FROM fbits a JOIN fbits b ON a.j = b.j AND a.id < b.id
  GROUP BY 1, 2)
SELECT substr(id_b, 3) AS new_url, substr(id_a, 3) AS index_url,
       CAST(d AS BIGINT) AS hamming
FROM fham
WHERE substr(id_a, 1, 1) = 'i' AND substr(id_b, 1, 1) = 'n'
  AND d <= {max_hamming}"""
