"""MinHash signatures + LSH banding — stateful actor-pool stage.

north_rule extension (the reference implements exact dedup only —
SURVEY.md §2.6): k-shingle MinHash signatures with band hashing, as one
vectorized ``map_batches`` actor stage (permutation parameters built once
per actor in ``__init__``).

Vectorization strategy (no per-shingle Python):
- tokenize + hash ALL tokens of a batch in one vectorized polars pass
  (``str.extract_all`` + seeded 64-bit hash — no per-token Python
  objects; the regex-findall path remains as the no-polars fallback and
  the ``token_hash``-override path);
- shingle hashes = polynomial rolling combine of k consecutive token hashes
  over the whole concatenated array (numpy, mod 2^64), masking windows that
  cross document boundaries;
- MinHash = multiply-shift permutations ``a*h + b (mod 2^64)`` applied to
  the concatenated distinct-shingle array, then ``np.minimum.reduceat``
  per-document segment minima — one numpy reduction for the whole batch;
- band digests = polynomial combine over each band's signature rows.

Shingle *identity* is the 64-bit rolling hash, not the joined string; two
shingles collide with p≈2⁻⁶⁴, which is the standard MinHash trade
(exactness is restored downstream by the Jaccard verify stage operating on
the same hashed-shingle sets).

Documents with fewer than ``shingle_k`` tokens have no shingle set and emit
no bands: shingle-based near-dup is undefined for them (exact dedup already
handles empty/near-empty rows).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

# module-level import: workers import polars exactly once when the UDF
# deserializes, never lazily inside a running task (a lazy import can
# leave a half-initialized module behind in a reused worker — observed
# once as "polars._reexport has no attribute 'Series'")
try:
    import polars as _pl
except ImportError:  # pragma: no cover - polars is baked in
    _pl = None

TOKEN_RE = re.compile(r"[a-z0-9]+")

_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _rng_odd(rng: np.random.Generator, n: int) -> np.ndarray:
    a = rng.integers(0, 1 << 63, size=n, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    return a


def sha256_token_hash(flat: list) -> np.ndarray:
    """uint64 per token = the first 16 hex chars of sha256(token) — the
    SQL-twin-able token hash (DuckDB: ``substr(sha256(tok), 1, 16)``),
    used by the oracle-checked simhash variant.  Distinct tokens are
    hashed once per batch (natural-language token reuse is heavy)."""
    cache: dict = {}
    out = np.empty(len(flat), dtype=np.uint64)
    for i, w in enumerate(flat):
        v = cache.get(w)
        if v is None:
            v = np.uint64(
                int(hashlib.sha256(w.encode("utf-8")).hexdigest()[:16], 16))
            cache[w] = v
        out[i] = v
    return out


def tokenize_batch(texts, token_hash=None) -> tuple[np.ndarray, np.ndarray]:
    """→ (concatenated token hash array, per-doc token counts).

    ``texts`` may be a Python list OR a pyarrow (Chunked)Array — the hot
    callers hand the Arrow column straight through so the default path
    never builds per-token Python strings.

    ``token_hash``: optional replacement for the default deterministic
    token hash (e.g. ``sha256_token_hash`` for SQL parity).  Named
    overrides take a list of token strings, so that path tokenizes in
    Python.  The DEFAULT identity hash is polars' seeded 64-bit string
    hash — deterministic across processes for a fixed polars version,
    which is all shingle identity needs (within-run cross-worker
    consistency; exactness is restored by the Jaccard verify stage, and
    hash collisions cost p≈2⁻⁶⁴ like any hashed-shingle scheme)."""
    if token_hash is None and _pl is not None:
        s = (_pl.from_arrow(texts) if isinstance(
                 texts, (pa.Array, pa.ChunkedArray))
             else _pl.Series(texts, dtype=_pl.Utf8))
        lst = s.str.extract_all(r"[a-z0-9]+")
        counts = (lst.list.len().fill_null(0)
                  .to_numpy().astype(np.int64))
        if counts.sum():
            hashes = (lst.explode(empty_as_null=False).drop_nulls()
                      .hash(seed=0).to_numpy().astype(np.uint64))
        else:
            hashes = np.empty(0, dtype=np.uint64)
        return hashes, counts
    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = texts.to_pylist()
    toks = [TOKEN_RE.findall(t) if t else [] for t in texts]
    counts = np.fromiter((len(t) for t in toks), dtype=np.int64, count=len(toks))
    flat = [w for doc in toks for w in doc]
    if flat:
        if token_hash is not None:
            hashes = token_hash(flat)
        else:  # pragma: no cover - reached only without polars
            hashes = pd.util.hash_array(np.asarray(flat, dtype=object))
    else:
        hashes = np.empty(0, dtype=np.uint64)
    return hashes, counts


def token_counts(texts, lowercase: bool = False) -> np.ndarray:
    """Per-doc count of ``TOKEN_RE`` matches, vectorized (one polars
    ``count_matches`` pass over the column — no per-token or per-doc
    Python objects).  ``texts`` may be a list or a pyarrow
    (Chunked)Array.  ``lowercase`` folds case first, matching the
    ``len(TOKEN_RE.findall(s.lower()))`` convention of the text-quality
    operators (the pattern is ASCII-only, so folding changes counts only
    via full-unicode expansions, which both engines apply)."""
    if _pl is not None:
        s = (_pl.from_arrow(texts) if isinstance(
                 texts, (pa.Array, pa.ChunkedArray))
             else _pl.Series(texts, dtype=_pl.Utf8))
        if lowercase:
            s = s.str.to_lowercase()
        return (s.str.count_matches(r"[a-z0-9]+").fill_null(0)
                .to_numpy().astype(np.int64))
    if isinstance(texts, (pa.Array, pa.ChunkedArray)):  # pragma: no cover
        texts = texts.to_pylist()
    return np.fromiter(  # pragma: no cover - polars is baked in
        (len(TOKEN_RE.findall(t.lower() if lowercase else t))
         if t else 0 for t in texts),
        dtype=np.int64, count=len(texts))


def shingle_sets(texts, k: int, token_hash=None
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Distinct k-shingle hash sets for each text.

    → (concatenated distinct-shingle array, per-doc set sizes).

    ``token_hash``: optional token-hash override (see tokenize_batch) —
    ``sha256_token_hash`` makes the whole shingle/MinHash chain
    SQL-restatable (the rolling combine below is plain mod-2⁶⁴
    arithmetic DuckDB can do in HUGEINT)."""
    hashes, counts = tokenize_batch(texts, token_hash=token_hash)
    with np.errstate(over="ignore"):
        # polynomial rolling combine over the concatenated token hashes
        c = np.uint64(0x100000001B3)  # FNV-ish odd multiplier
        n = len(hashes)
        if n >= k:
            win = hashes[: n - k + 1].copy()
            for j in range(1, k):
                win = win * c + hashes[j: n - k + 1 + j]
        else:
            win = np.empty(0, dtype=np.uint64)
    starts = np.concatenate([[0], np.cumsum(counts)])
    out_sets, sizes = [], np.zeros(len(counts), dtype=np.int64)
    for i in range(len(counts)):
        s, e = starts[i], starts[i + 1]
        if e - s >= k:
            u = np.unique(win[s: e - k + 1])
            out_sets.append(u)
            sizes[i] = len(u)
    cat = np.concatenate(out_sets) if out_sets else np.empty(0, dtype=np.uint64)
    return cat, sizes


def band_partition(band_hash: np.ndarray, band_id: np.ndarray,
                   num_partitions: int) -> np.ndarray:
    """THE coarse shuffle key for exploded band rows:
    ``(band_hash · FNV + band_id) % P`` as int64.  One definition shared
    by ``MinHashLSH.band_table``'s in-stage path and every consumer that
    re-keys band rows read back from parquet (e.g. the b-bit index
    tier), so co-partitioned band streams can never drift apart."""
    with np.errstate(over="ignore"):
        h = (band_hash.astype(np.uint64, copy=False)
             * np.uint64(0x100000001B3)
             + band_id.astype(np.uint64, copy=False))
    return (h % np.uint64(num_partitions)).astype(np.int64)


class MinHashLSH:
    """Actor stage: text → exploded ``(url, band_id, band_hash)`` rows.

    Defaults (n_perm=126 = 42 bands × 3 rows) put the LSH s-curve threshold
    near J≈0.42 with miss probability < 1e-8 at J≥0.7 — deterministic
    given ``seed``, so results are run-order independent.
    """

    def __init__(self, *, n_perm: int = 126, band_r: int = 3, shingle_k: int = 5,
                 seed: int = 42, id_col: str = "url", text_col: str = "text",
                 num_partitions: int | None = None,
                 token_hash: str | None = None):
        assert n_perm % band_r == 0
        self.n_perm, self.band_r, self.k = n_perm, band_r, shingle_k
        self.n_bands = n_perm // band_r
        self.id_col, self.text_col = id_col, text_col
        # "sha" = sha256-derived token hash (SQL-restatable oracle
        # variant, slower); None = the default polars seeded hash.
        # Passed by NAME so stage_task's repr cache key stays stable.
        self.token_hash = (sha256_token_hash if token_hash == "sha"
                           else None)
        # when set, emit the coarse shuffle key in-stage (saves one full
        # object-store pass over the exploded band rows — an actor stage
        # can't fuse with a downstream task stage)
        self.num_partitions = num_partitions
        rng = np.random.default_rng(seed)
        self.A = _rng_odd(rng, n_perm)[:, None]
        self.B = rng.integers(0, 1 << 63, size=n_perm, dtype=np.uint64)[:, None]
        self.BC = _rng_odd(rng, band_r)

    def signatures(self, texts) -> tuple[np.ndarray, np.ndarray]:
        """→ (uint64 signature matrix [n_docs_with_shingles, n_perm],
        bool mask of docs that have shingles)."""
        cat, sizes = shingle_sets(texts, self.k,
                                  token_hash=self.token_hash)
        has = sizes > 0
        if not has.any():
            return np.empty((0, self.n_perm), dtype=np.uint64), has
        return self.signatures_from_sets(cat, sizes[has]), has

    def band_table(self, sig: np.ndarray, ids: np.ndarray) -> pa.Table:
        n = sig.shape[0]
        with np.errstate(over="ignore"):
            bands = sig.reshape(n, self.n_bands, self.band_r)
            bh = (bands * self.BC[None, None, :]).sum(axis=2, dtype=np.uint64)
        band_id = np.tile(np.arange(self.n_bands, dtype=np.int32), n)
        band_hash = bh.reshape(-1)
        cols = {
            self.id_col: pa.array(np.repeat(ids, self.n_bands)),
            "band_id": pa.array(band_id),
            "band_hash": pa.array(band_hash.view(np.int64)),
        }
        if self.num_partitions is not None:
            cols["_part"] = pa.array(
                band_partition(band_hash, band_id, self.num_partitions)
            )
        return pa.table(cols)

    def signatures_from_sets(self, cat: np.ndarray, sizes: np.ndarray) -> np.ndarray:
        """Signature matrix from precomputed concatenated shingle sets.

        Loops over permutations with ONE reusable n-shingle buffer: the
        one-shot broadcast ``A * cat + B`` builds a (n_perm × n_shingles)
        matrix — hundreds of MB per batch — whose bandwidth demand made
        concurrent map tasks slower at 32 cpus than at 8 (measured).  The
        per-permutation working set fits in L2/L3, so tasks scale."""
        starts = np.concatenate([[0], np.cumsum(sizes)])[:-1]
        ndocs = len(sizes)
        sig = np.empty((ndocs, self.n_perm), dtype=np.uint64)
        tmp = np.empty_like(cat)
        with np.errstate(over="ignore"):
            for p in range(self.n_perm):
                np.multiply(cat, self.A[p, 0], out=tmp)
                tmp += self.B[p, 0]
                sig[:, p] = np.minimum.reduceat(tmp, starts)
        return sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[self.id_col].to_pylist(), dtype=object)
        sig, has = self.signatures(batch[self.text_col])
        return self.band_table(sig, ids[has])


class ShingleMinHashLSH(MinHashLSH):
    """MinHashLSH over PRECOMPUTED shingle rows ``(id, sh:binary)``.

    Tokenization/shingling is the dominant per-doc compute; pipelines that
    need both LSH bands AND exact-Jaccard verification (near.py) compute
    the shingle sets ONCE (``shingle_rows``), materialize the compact
    ``(id, uint64-blob)`` table, and feed both stages from it.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:  # input: (id, sh)
        ids = np.asarray(batch[self.id_col].to_pylist(), dtype=object)
        blobs = batch["sh"].to_pylist()
        sizes = np.fromiter((len(b) // 8 for b in blobs), dtype=np.int64,
                            count=len(blobs))
        has = sizes > 0
        if not has.any():
            return self.band_table(
                np.empty((0, self.n_perm), dtype=np.uint64), ids[:0]
            )
        cat = np.frombuffer(b"".join(blobs), dtype=np.uint64)
        sig = self.signatures_from_sets(cat, sizes[has])
        return self.band_table(sig, ids[has])
