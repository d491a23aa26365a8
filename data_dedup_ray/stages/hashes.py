"""Vectorized content-digest functions — the transform library.

Re-expresses the reference's 13 blocking (digest) functions
(/root/reference/lib/Data/Dedup/Files/DigestFactory.pm:41-228) as Arrow
batch kernels over a content column.  The reference reads byte ranges of a
file on disk; here the content already sits in an Arrow column, so "read a
sample" becomes a zero-copy ``pc.binary_slice``.

"cluster" in the reference is ``min(filesize, st_blksize || 4096)`` bytes
(DigestFactory.pm:63-64); with no filesystem in play we use the 4096
constant.

Hash choices (the reference uses xxHash + SHA-1, DigestFactory.pm:132-228):
``xxhash`` is not installed in this environment, so the fast 64-bit rolling
digest is pandas' deterministic SipHash-based ``hash_array`` (C speed,
stable across processes/machines for a fixed hash key — used only as an
internal grouping key, never as a user-facing value), and the
cryptographic full-content digest is SHA-256 hex (upgraded from SHA-1 per
the north_star; hex so it matches DuckDB's ``sha256()`` oracle).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

CLUSTER = 4096  # DigestFactory.pm:63-64 cluster-size analogue
SAMPLE = 128  # sample width, DigestFactory.pm:58-69


def _content(batch: pa.Table, col: str) -> pa.ChunkedArray:
    """Content column as binary (zero-copy cast for string columns)."""
    arr = batch[col]
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        arr = pc.cast(arr, pa.binary())
    return arr


def size(batch: pa.Table, col: str = "text") -> pa.Array:
    """Content size in bytes — the ``filesize`` digest (DigestFactory.pm:41-46)."""
    return pc.cast(pc.binary_length(batch[col]), pa.int64())


def _sample_bounds(n: int) -> tuple[int, int]:
    """``sample`` byte range (DigestFactory.pm:56-68): 128 bytes around
    the first cluster's midpoint, offset = max(0, cluster/2 − 128) with
    the reference's float-then-truncate arithmetic done exactly in ints
    (floor((c−256)/2) — truncation equals floor for the non-negative
    post-max value)."""
    c = min(n, CLUSTER)
    if c <= 0:
        return 0, 0
    return max(0, (c - 2 * SAMPLE) // 2), SAMPLE


def _end_sample_bounds(n: int) -> tuple[int, int]:
    """``end_sample`` byte range (DigestFactory.pm:70-87): 128 bytes
    around the LAST cluster's midpoint; when the tail cluster is shorter
    than the sample the reference backs up one full cluster."""
    c = min(n, CLUSTER)
    if c <= 0:
        return 0, 0
    lco = ((n - 1) // c) * c
    lcs = n - lco
    if lcs < SAMPLE:
        lco -= c
        lcs = c
    return max(0, lco + (lcs - 2 * SAMPLE) // 2), SAMPLE


def _mid_sample_bounds(n: int) -> tuple[int, int]:
    """``mid_sample`` byte range (DigestFactory.pm:89-102): 128 bytes
    around the midpoint of the cluster containing byte size/2 − 1 (the
    reference's int() truncates toward zero, which only differs from
    floor at n == 1 where the cluster index clamps to 0)."""
    c = min(n, CLUSTER)
    if c <= 0:
        return 0, 0
    mco = ((n - 2) // (2 * c)) * c if n >= 2 else 0
    return max(0, mco + (c - 2 * SAMPLE) // 2), SAMPLE


def _final_bounds(n: int) -> tuple[int, int]:
    """``final_*`` byte range (DigestFactory.pm:154-172,199-217): the last
    cluster — but when the tail is shorter than HALF a cluster, back up
    one cluster and hash a full cluster ENDING before the short tail
    (the reference reads exactly cluster_size bytes from the backed-up
    offset, so the tail bytes are excluded)."""
    c = min(n, CLUSTER)
    if c <= 0:
        return 0, 0
    lco = ((n - 1) // c) * c
    lcs = n - lco
    if 2 * lcs < c:
        lco -= c
    return lco, min(c, n - lco)


def _per_row_slices(batch: pa.Table, col: str, bounds) -> list:
    """Per-row byte slices by the reference's size-dependent arithmetic
    (offsets depend on each value's length, so no scalar binary_slice)."""
    vals = _content(batch, col).to_pylist()
    out = []
    for v in vals:
        if v is None:
            out.append(None)
            continue
        b = bytes(v)
        off, ln = bounds(len(b))
        out.append(b[off: off + ln])
    return out


def head_sample(batch: pa.Table, col: str = "text", n: int = SAMPLE) -> pa.Array:
    """``sample`` (DigestFactory.pm:56-68) with the reference's exact
    size-dependent offset: 128 bytes at max(0, cluster/2 − 128)."""
    return pa.array(_per_row_slices(batch, col, _sample_bounds),
                    type=pa.binary())


def tail_sample(batch: pa.Table, col: str = "text", n: int = SAMPLE) -> pa.Array:
    """``end_sample`` (DigestFactory.pm:70-87): 128 bytes around the last
    cluster's midpoint, short-tail backoff included."""
    return pa.array(_per_row_slices(batch, col, _end_sample_bounds),
                    type=pa.binary())


def mid_sample(batch: pa.Table, col: str = "text", n: int = SAMPLE) -> pa.Array:
    """``mid_sample`` (DigestFactory.pm:89-102): 128 bytes around the
    mid-file cluster's midpoint."""
    return pa.array(_per_row_slices(batch, col, _mid_sample_bounds),
                    type=pa.binary())


def head_1k(batch: pa.Table, col: str = "text") -> pa.Array:
    """``file_head``: first min(size, 1024) raw bytes (DigestFactory.pm:105-116)."""
    return pc.binary_slice(_content(batch, col), 0, 1024)


def tail_1k(batch: pa.Table, col: str = "text") -> pa.Array:
    """``file_tail``: last min(size, 1024) raw bytes (DigestFactory.pm:118-129)."""
    return pc.binary_slice(_content(batch, col), -1024, None)


def _hash64_of_slice(batch: pa.Table, col: str, start, stop) -> pa.Array:
    sliced = pc.binary_slice(_content(batch, col), start, stop)
    h = pd.util.hash_array(np.asarray(sliced.to_pylist(), dtype=object))
    return pa.array(h.astype(np.int64), type=pa.int64())


def fast_prefix_hash(batch: pa.Table, col: str = "text") -> pa.Array:
    """``fast_initial_xxhash``: 64-bit hash of the first half-cluster
    (DigestFactory.pm:132-141)."""
    return _hash64_of_slice(batch, col, 0, CLUSTER // 2)


def prefix_hash(batch: pa.Table, col: str = "text") -> pa.Array:
    """``initial_xxhash``: 64-bit hash of the first cluster
    (DigestFactory.pm:143-152)."""
    return _hash64_of_slice(batch, col, 0, CLUSTER)


def suffix_hash(batch: pa.Table, col: str = "text") -> pa.Array:
    """``final_xxhash``: 64-bit hash of the last cluster with the
    reference's short-tail backoff (DigestFactory.pm:154-172): a tail
    shorter than half a cluster is skipped in favor of the preceding
    FULL cluster."""
    sliced = _per_row_slices(batch, col, _final_bounds)
    h = pd.util.hash_array(np.asarray(sliced, dtype=object))
    return pa.array(h.astype(np.int64), type=pa.int64())


def _sha_of_slices(vals, prefix: int | None = None, suffix: bool = False) -> pa.Array:
    out = np.empty(len(vals), dtype=object)
    for i, v in enumerate(vals):
        if v is None:
            out[i] = None
            continue
        b = bytes(v)
        if prefix is not None:
            b = b[-prefix:] if suffix else b[:prefix]
        out[i] = hashlib.sha256(b).hexdigest()
    return pa.array(out, type=pa.string())


def fast_prefix_sha(batch: pa.Table, col: str = "text") -> pa.Array:
    """``fast_initial_sha`` analogue: SHA-256 hex of the first half-cluster
    (DigestFactory.pm:177-186)."""
    return _sha_of_slices(_content(batch, col).to_pylist(), prefix=CLUSTER // 2)


def prefix_sha(batch: pa.Table, col: str = "text") -> pa.Array:
    """``initial_sha`` analogue: SHA-256 hex of the first cluster
    (DigestFactory.pm:188-197)."""
    return _sha_of_slices(_content(batch, col).to_pylist(), prefix=CLUSTER)


def suffix_sha(batch: pa.Table, col: str = "text") -> pa.Array:
    """``final_sha`` analogue: SHA-256 hex of the last cluster with the
    reference's short-tail backoff (DigestFactory.pm:199-217)."""
    return _sha_of_slices(_per_row_slices(batch, col, _final_bounds))


def sha(batch: pa.Table, col: str = "text") -> pa.Array:
    """``sha``: digest of the ENTIRE content (DigestFactory.pm:219-228),
    SHA-256 hex to match DuckDB's ``sha256()``."""
    return _sha_of_slices(_content(batch, col).to_pylist())


def sha256_hex_series(texts: pd.Series) -> pd.Series:
    """Pandas helper: SHA-256 hex of each string's UTF-8 bytes."""
    return texts.map(lambda t: hashlib.sha256(t.encode("utf-8")).hexdigest())
