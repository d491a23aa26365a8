"""SimHash 64-bit fingerprints + Hamming-distance candidate generation.

north_rule extension (SURVEY.md §7 M3).  Fingerprint: token-frequency
weighted Charikar SimHash over the same deterministic tokenizer as MinHash
(stages/minhash.py); fully vectorized — one ``pd.util.hash_array`` per
batch, one ``np.add.reduceat`` for the per-document bit sums.

Candidate search for Hamming distance ≤ 3 uses the pigeonhole split: 64
bits → 4 disjoint 16-bit chunks; any pair within distance 3 agrees exactly
on at least one chunk, so grouping by ``(chunk_id, chunk_value)`` has
recall 1.0 by construction.  Verification XOR-popcounts the full
fingerprints.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from data_dedup_ray.stages.minhash import tokenize_batch

N_CHUNKS = 4
CHUNK_BITS = 16


def simhash_batch(texts) -> tuple[np.ndarray, np.ndarray]:
    """→ (uint64 fingerprints for docs with ≥1 token, bool has-token mask)."""
    hashes, counts = tokenize_batch(texts)
    has = counts > 0
    if not has.any():
        return np.empty(0, dtype=np.uint64), has
    shifts = np.arange(64, dtype=np.uint64)
    bits = (((hashes[:, None] >> shifts) & np.uint64(1)).astype(np.int32) * 2) - 1
    starts = np.concatenate([[0], np.cumsum(counts[has])])[:-1]
    sums = np.add.reduceat(bits, starts, axis=0)  # (docs_with_tokens, 64)
    fp_bits = (sums > 0).astype(np.uint64)
    fp = np.zeros(fp_bits.shape[0], dtype=np.uint64)
    for j in range(64):
        fp |= fp_bits[:, j] << np.uint64(j)
    return fp, has


def chunk_values(fp: np.ndarray) -> np.ndarray:
    """(n,) uint64 → (n, N_CHUNKS) int64 chunk values."""
    out = np.empty((len(fp), N_CHUNKS), dtype=np.int64)
    mask = np.uint64((1 << CHUNK_BITS) - 1)
    for c in range(N_CHUNKS):
        out[:, c] = ((fp >> np.uint64(c * CHUNK_BITS)) & mask).astype(np.int64)
    return out


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR)."""
    x = x.astype(np.uint64).copy()
    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    h01 = np.uint64(0x0101010101010101)
    with np.errstate(over="ignore"):
        x -= (x >> np.uint64(1)) & m1
        x = (x & m2) + ((x >> np.uint64(2)) & m2)
        x = (x + (x >> np.uint64(4))) & m4
        x = (x * h01) >> np.uint64(56)
    return x.astype(np.int64)


class SimHashStage:
    """Actor stage: text → exploded ``(url, chunk_id, chunk_val, fp)`` rows."""

    def __init__(self, *, id_col: str = "url", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        ids = np.asarray(batch[self.id_col].to_pylist(), dtype=object)
        fp, has = simhash_batch(texts)
        ids = ids[has]
        cv = chunk_values(fp)
        n = len(ids)
        return pa.table(
            {
                self.id_col: pa.array(np.repeat(ids, N_CHUNKS)),
                "chunk_id": pa.array(np.tile(np.arange(N_CHUNKS, dtype=np.int32), n)),
                "chunk_val": pa.array(cv.reshape(-1)),
                "fp": pa.array(np.repeat(fp.view(np.int64), N_CHUNKS)),
            }
        )
