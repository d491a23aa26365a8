"""Training-sequence PACKING by concatenation (GPT-style pack-and-split).

The standard LLM pretraining layout: concatenate every document's tokens
in global doc_id order and cut fixed-length sequences of ``max_len``
tokens; a document that straddles a cut contributes one FRAGMENT to each
sequence it spans.  Output is the fragment manifest a loader needs:

    (doc_id, seq_id, seq_pos, doc_pos, n_tokens)

— fragment of ``doc_id`` starting at token ``doc_pos`` within the doc,
placed at ``seq_pos`` within sequence ``seq_id``, length ``n_tokens``.

Scale shape: everything derives from the distributed ORDERED prefix sum
that ``stats.token_shards`` already computes (range partitioning, one
bucketized split, per-block bases — token counts are the only thing
shuffled); fragment expansion is pure vectorized arithmetic on
``(tok_offset, n_tokens)`` via np.repeat — no further exchange, no text
movement, and a doc's fragments are emitted by the partition that owns
the doc."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def pack_training_sequences(
    sf_dir: str, *, max_len: int = 512, num_partitions: int = 16,
) -> ray.data.Dataset:
    """The fragment manifest for packing the corpus into ``max_len``-token
    training sequences (empty docs contribute nothing)."""
    from data_dedup_ray.pipelines.stats import token_shards

    L = max_len
    shards = token_shards(sf_dir, budget=L, num_partitions=num_partitions)

    def frags(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        off = t["tok_offset"].to_numpy(zero_copy_only=False)
        n = t["n_tokens"].to_numpy(zero_copy_only=False)
        keep = n > 0
        ids, off, n = ids[keep], off[keep], n[keep]
        if not len(ids):
            return pa.table({c: pa.array([], pa.int64()) for c in
                             ["doc_id", "seq_id", "seq_pos", "doc_pos",
                              "n_tokens"]})
        first = off // L
        reps = (off + n - 1) // L - first + 1
        doc_idx = np.repeat(np.arange(len(ids), dtype=np.int64), reps)
        # fragment ordinal within its doc: global position minus the
        # repeated exclusive cumsum of reps
        ordinal = (np.arange(reps.sum(), dtype=np.int64)
                   - np.repeat(np.cumsum(reps) - reps, reps))
        seq = first[doc_idx] + ordinal
        start_in_doc = np.maximum(0, seq * L - off[doc_idx])
        end_in_doc = np.minimum(n[doc_idx], (seq + 1) * L - off[doc_idx])
        return pa.table({
            "doc_id": pa.array(ids[doc_idx]),
            "seq_id": pa.array(seq),
            "seq_pos": pa.array(off[doc_idx] + start_in_doc - seq * L),
            "doc_pos": pa.array(start_in_doc),
            "n_tokens": pa.array(end_in_doc - start_in_doc),
        })

    return shards.map_batches(frags, batch_format="pyarrow")


def pack_training_sequences_sql(max_len: int = 512) -> str:
    L = max_len
    toks = "len(regexp_extract_all(text, '[a-z0-9]+'))"
    return f"""
WITH c AS (
  SELECT doc_id, {toks} AS n,
         CAST(sum({toks}) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
              - {toks} AS BIGINT) AS o
  FROM documents),
f AS (
  SELECT doc_id, n, o, g.s AS seq_id
  FROM c, UNNEST(generate_series(o // {L}, (o + n - 1) // {L})) AS g(s)
  WHERE n > 0)
SELECT doc_id, seq_id,
       CAST(o + greatest(0, seq_id * {L} - o) - seq_id * {L} AS BIGINT)
         AS seq_pos,
       CAST(greatest(0, seq_id * {L} - o) AS BIGINT) AS doc_pos,
       CAST(least(n, (seq_id + 1) * {L} - o)
            - greatest(0, seq_id * {L} - o) AS BIGINT) AS n_tokens
FROM f"""
