"""Deterministic weighted bottom-k sampling (priority sampling).

The weighted complement of the engine's uniform hash samplers
(snapshots.sample_pages, stats.stratified_sample): pick ``k`` documents
with inclusion probability increasing in a weight column — the
Duffield-Lund-Thorup priority-sampling shape (JACM 2007), made
integer-deterministic: ``priority = H // w`` where ``H`` is the 60-bit
md5 of the key and ``w`` the weight; the sample is the global bottom-k by
``(priority, key)``.  Doubling a document's weight halves its priority,
so heavier rows win ties into the sample at exactly the rate the
classical ``u^(1/w)`` scheme gives in rank order, but every quantity is
an integer — stable across runs, partitionings and cluster sizes, and
restated verbatim in SQL (``'0x'||substr(md5(..)) // w`` + ORDER BY +
LIMIT).

Scale shape: a global top-k, so the standard two-phase prune applies —
every batch reduces to its local bottom-k before anything leaves the
task; the final sort orders ``#batches × k`` rows, never the corpus
(the events.top_k_per_user / relational.top_revenue_orders pattern).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

_HEX = 15  # 60-bit priorities fit BIGINT for the DuckDB twin

_OUT = pa.schema([("doc_id", pa.int64()), ("priority", pa.int64())])


def weighted_sample_docs(sf_dir: str, *, k: int = 100,
                         weight_col: str = "n_chars") -> ray.data.Dataset:
    """``(doc_id, priority)`` — the k documents with the smallest
    ``md5(doc_id) // max(weight, 1)``, ties by doc_id."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", weight_col]
    )

    def local_bottom_k(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(ids):
            return _OUT.empty_table()
        w = np.maximum(
            t[weight_col].to_numpy(zero_copy_only=False).astype(np.int64), 1)
        h = np.array(
            [int(hashlib.md5(str(i).encode()).hexdigest()[:_HEX], 16)
             for i in ids], dtype=np.int64)
        pri = h // w
        order = np.lexsort((ids, pri))[:k]
        return pa.table({"doc_id": pa.array(ids[order]),
                         "priority": pa.array(pri[order])})

    pruned = docs.map_batches(local_bottom_k, batch_format="pyarrow")
    # the global phase orders #batches × k rows — sample-sized, not corpus
    return pruned.sort(["priority", "doc_id"]).limit(k)


def weighted_sample_docs_sql(k: int = 100,
                             weight_col: str = "n_chars") -> str:
    return f"""
SELECT doc_id, priority FROM (
  SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, {_HEX}))
              AS BIGINT) // GREATEST({weight_col}, 1) AS priority
  FROM documents)
ORDER BY priority, doc_id LIMIT {k}"""
