"""Deterministic global training shuffle — seed-keyed placement ranks.

Training pipelines need the corpus in a random but REPRODUCIBLE order
(same seed ⇒ same epoch order, across runs, partitionings and cluster
sizes — ``ds.random_shuffle`` gives none of that).  The standard trick is
an order-by-hash: position(doc) = rank of ``md5(seed|doc_id)`` among all
docs.  Composes with the rest of the training-prep trio: shuffle ranks →
``packing.pack_training_sequences`` layout → ``stats.token_shards``.

Distributed rank WITHOUT a global sort: md5 is uniform, so its first
byte range-partitions the keyspace into P contiguous buckets; one
bucketized split serves both phases (the ``stats.token_shards`` ordered-
prefix pattern) — phase 1 reduces each bucket to its row count (P tiny
rows to the driver for exclusive bases), phase 2 sorts each bucket
locally by (key, doc_id) and adds its base.  Only (doc_id, 32-byte hex
key) rows move; ranks are globally dense, 0-based, and collision-proof
(doc_id tie-break)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from data_dedup_ray.engine.exchange import bucketize, hash_exchange


def deterministic_shuffle(
    sf_dir: str, *, seed: int = 0, num_partitions: int = 16,
) -> ray.data.Dataset:
    """``(doc_id, position)`` — the seed's global shuffle placement."""
    P = num_partitions
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )

    def keyed(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        keys = [hashlib.md5(f"{seed}|{i}".encode()).hexdigest()
                for i in ids]
        part = np.fromiter(
            (int(k[:2], 16) * P // 256 for k in keys), np.int64, len(keys))
        return pa.table({
            "doc_id": pa.array(ids),
            "key": pa.array(keys, pa.string()),
            "_part": pa.array(part),
        })

    in_schema = pa.schema([("doc_id", pa.int64()), ("key", pa.string()),
                           ("_part", pa.int64())])
    buckets = bucketize(docs.map_batches(keyed, batch_format="pyarrow"),
                        num_partitions=P, in_schema=in_schema)

    def bucket_count(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"part": pd.Series(dtype=np.int64),
                                 "n": pd.Series(dtype=np.int64)})
        p = int(df["key"].iloc[0][:2], 16) * P // 256
        return pd.DataFrame({"part": [p], "n": [len(df)]})

    totals = hash_exchange(
        [buckets], bucket_count, num_partitions=P,
        schema=pa.schema([("part", pa.int64()), ("n", pa.int64())]),
        in_schemas=[in_schema.remove(2)],
    ).to_pandas()
    base = np.zeros(P, dtype=np.int64)
    for _, r in totals.iterrows():
        base[int(r["part"])] = int(r["n"])
    base = np.concatenate([[0], np.cumsum(base)[:-1]])  # exclusive bases

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                                 "position": pd.Series(dtype=np.int64)})
        p = int(df["key"].iloc[0][:2], 16) * P // 256
        df = df.sort_values(["key", "doc_id"], kind="stable")
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "position": base[p] + np.arange(len(df), dtype=np.int64),
        })

    return hash_exchange(
        [buckets], rank, num_partitions=P,
        schema=pa.schema([("doc_id", pa.int64()),
                          ("position", pa.int64())]),
        in_schemas=[in_schema.remove(2)],
    )


def deterministic_shuffle_sql(seed: int = 0) -> str:
    return f"""
SELECT doc_id,
       CAST(row_number() OVER (
           ORDER BY md5('{seed}' || '|' || CAST(doc_id AS VARCHAR)),
                    doc_id) - 1 AS BIGINT) AS position
FROM documents"""
