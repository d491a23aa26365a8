"""SimHash 64-bit fingerprints + Hamming-distance candidate generation.

north_rule extension (SURVEY.md §7 M3).  Fingerprint: token-frequency
weighted Charikar SimHash over the same deterministic tokenizer as MinHash
(stages/minhash.py); fully vectorized — one ``tokenize_batch`` call per
batch, one ``np.add.reduceat`` for the per-document bit sums.

Candidate search for Hamming distance ≤ 3 uses a TWO-level pigeonhole: 64
bits → 4 disjoint 16-bit chunks (≤3 errors ⇒ some chunk i is exact), and
given a matching chunk i the ≤3 remaining errors live in the other 48
bits → 4 sub-chunks of 12 bits ⇒ some sub-chunk j is exact.  Keying on
``(i*4+j, chunk_i ∥ sub_j)`` — 16 keys/doc over a 28-bit value space —
keeps recall 1.0 by construction while shrinking candidate groups by
~2^12 versus the single-level 16-bit split (topically-similar corpora
collide heavily at 16 bits; the measured sum-of-group² dropped ~40×).
Verification XOR-popcounts the full fingerprints.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from data_dedup_ray.stages.minhash import sha256_token_hash, tokenize_batch

N_CHUNKS = 4
CHUNK_BITS = 16

#: named token-hash functions for the stages below; "sha" is the
#: SQL-twin-able variant (oracles can restate it with DuckDB sha256())
HASH_FNS = {"fast": None, "sha": sha256_token_hash}


def simhash_batch(texts, token_hash=None) -> tuple[np.ndarray, np.ndarray]:
    """→ (uint64 fingerprints for docs with ≥1 token, bool has-token mask)."""
    hashes, counts = tokenize_batch(texts, token_hash=token_hash)
    has = counts > 0
    if not has.any():
        return np.empty(0, dtype=np.uint64), has
    starts = np.concatenate([[0], np.cumsum(counts[has])])[:-1]
    ndocs = int(has.sum())
    n = len(hashes)
    # per-bit loop with one reusable n-token buffer: the one-shot
    # (n_tokens × 64) bit matrix costs ~64× the token array in bandwidth
    # and made concurrent tasks anti-scale (see minhash.signatures_from_sets)
    fp = np.zeros(ndocs, dtype=np.uint64)
    bit = np.empty(n, dtype=np.int32)
    ntok = counts[has].astype(np.int64)  # majority: 2·ones > n_tokens
    for j in range(64):
        np.right_shift(hashes, np.uint64(j), out=bit, casting="unsafe")
        bit &= 1
        ones = np.add.reduceat(bit, starts)
        fp |= (2 * ones > ntok).astype(np.uint64) << np.uint64(j)
    return fp, has


def chunk_values(fp: np.ndarray) -> np.ndarray:
    """(n,) uint64 → (n, N_CHUNKS) int64 chunk values."""
    out = np.empty((len(fp), N_CHUNKS), dtype=np.int64)
    mask = np.uint64((1 << CHUNK_BITS) - 1)
    for c in range(N_CHUNKS):
        out[:, c] = ((fp >> np.uint64(c * CHUNK_BITS)) & mask).astype(np.int64)
    return out


N_SUB = 4
SUB_BITS = 12
N_KEYS = N_CHUNKS * N_SUB


def key_values(fp: np.ndarray) -> np.ndarray:
    """(n,) uint64 → (n, 16) int64 two-level pigeonhole keys.

    Key (i, j) = 16-bit chunk i concatenated with 12-bit sub-chunk j of the
    remaining 48 bits; any pair with Hamming ≤ 3 shares ≥1 of the 16 keys.
    """
    cv = chunk_values(fp)  # (n, 4) int64
    n = len(fp)
    out = np.empty((n, N_KEYS), dtype=np.int64)
    sub_mask = np.int64((1 << SUB_BITS) - 1)
    for i in range(N_CHUNKS):
        others = [c for c in range(N_CHUNKS) if c != i]
        rem = (cv[:, others[0]]
               | (cv[:, others[1]] << np.int64(16))
               | (cv[:, others[2]] << np.int64(32)))  # 48 bits
        for j in range(N_SUB):
            sub = (rem >> np.int64(j * SUB_BITS)) & sub_mask
            out[:, i * N_SUB + j] = (cv[:, i] << np.int64(SUB_BITS)) | sub
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


class SimHashFingerprints:
    """Actor stage: text → one ``(url, fp)`` row per doc with ≥1 token.

    ``keep_empty=True`` instead emits EVERY doc plus a ``has`` bool column
    (``fp=0`` for token-less docs) — one corpus scan then serves both the
    candidate graph (``has``) and the singleton handling (``!has``),
    instead of a second full tokenize pass just to find empty docs."""

    def __init__(self, *, id_col: str = "url", text_col: str = "text",
                 keep_empty: bool = False, hash_fn: str = "fast"):
        self.id_col, self.text_col = id_col, text_col
        self.keep_empty = keep_empty
        self.token_hash = HASH_FNS[hash_fn]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[self.id_col].to_pylist(), dtype=object)
        fp, has = simhash_batch(batch[self.text_col],
                                token_hash=self.token_hash)
        if not self.keep_empty:
            return pa.table(
                {
                    self.id_col: pa.array(ids[has], type=pa.string()),
                    "fp": pa.array(fp.view(np.int64)),
                }
            )
        full = np.zeros(len(ids), dtype=np.uint64)
        full[has] = fp
        return pa.table(
            {
                self.id_col: pa.array(ids, type=pa.string()),
                "fp": pa.array(full.view(np.int64)),
                "has": pa.array(has),
            }
        )


class SimHashStage:
    """Actor stage: text → exploded ``(url, chunk_id, chunk_val, fp)`` rows."""

    def __init__(self, *, id_col: str = "url", text_col: str = "text",
                 hash_fn: str = "fast"):
        self.id_col, self.text_col = id_col, text_col
        self.token_hash = HASH_FNS[hash_fn]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[self.id_col].to_pylist(), dtype=object)
        fp, has = simhash_batch(batch[self.text_col],
                                token_hash=self.token_hash)
        ids = ids[has]
        kv = key_values(fp)
        n = len(ids)
        return pa.table(
            {
                self.id_col: pa.array(np.repeat(ids, N_KEYS)),
                "chunk_id": pa.array(np.tile(np.arange(N_KEYS, dtype=np.int32), n)),
                "chunk_val": pa.array(kv.reshape(-1)),
                "fp": pa.array(np.repeat(fp.view(np.int64), N_KEYS)),
            }
        )
