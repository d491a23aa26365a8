"""Substring-duplication kernels: exact token-window hashing + winnowing.

north_rule extension (SURVEY.md §7 M5): the reference deduplicates whole
files only; the north_star adds "suffix-array-based substring dedup" for
long spans duplicated ACROSS documents.  A distributed suffix array over a
concatenated 100 TB corpus is equivalent — for fixed minimum span length L
— to grouping every L-token window by content: two documents share an
L-token span iff they share a window (this is how suffix-array dedup is
applied in practice, cf. Lee et al., "Deduplicating Training Data Makes
Language Models Better", arXiv:2107.06499, §4.1).  Window grouping
shuffles fixed-width rows and needs no global sort, so it is the
Ray-Data-native formulation.

Two granularities:

- ``window_hash_rows``: EXACT — one 64-bit rolling hash per window
  position.  The SQL oracle (DuckDB ``md5`` groups over
  ``regexp_extract_all`` token lists) checks the GROUP structure, which
  is hash-choice-independent, so the pipeline stays oracle-checkable
  end to end while shuffling 8-byte rows.
- ``winnowed_rows``: SCALE (the library default) — the same rolling
  hashes winnowed to the per-window minimum (Schleimer et al.,
  SIGMOD'03 "Winnowing: Local Algorithms for Document Fingerprinting"):
  any shared span of ``min_tokens + w − 1`` tokens is guaranteed to
  share a selected fingerprint, at ~1/w of the row volume.

Tokenizer = stages/minhash.TOKEN_RE (one compiled regex, shared across the
near-dup family so "token" means one thing engine-wide).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_POLY = np.uint64(0x100000001B3)


def window_hash_rows(
    batch: pa.Table, *, min_tokens: int = 50,
    id_col: str = "url", text_col: str = "text",
) -> pa.Table:
    """→ ``(id, whash:int64)`` — one row per token-window position, the
    64-bit polynomial rolling hash of the window (fully vectorized — no
    per-window Python, 8 bytes/row through the shuffle instead of the
    32-hex-char MD5 strings the first version shipped).

    Grouping by the rolling hash equals grouping by window TEXT up to the
    standard 2⁻⁶⁴ collision trade (accepted engine-wide, see MinHash
    shingles), so the SQL twin — DuckDB ``md5(array_to_string(...))``
    groups, ``oracles.substring_dup_sql`` — is unchanged: neither side's
    hash VALUES appear in the output, only the group structure."""
    ids = batch[id_col].to_pylist()
    win, counts = _rolling_window_hashes(batch[text_col], min_tokens)
    nw = np.maximum(counts - min_tokens + 1, 0)
    # doc d's (non-boundary-crossing) windows: win[tok_off_d : +nw_d]
    tok_off = np.concatenate([[0], np.cumsum(counts)])[:-1]
    doc_of = np.repeat(np.arange(len(ids)), nw)
    idx = (np.arange(int(nw.sum()))
           - np.repeat(np.cumsum(nw) - nw, nw)
           + tok_off[doc_of])
    return pa.table(
        {id_col: pa.array(np.asarray(ids, dtype=object)[doc_of],
                          type=pa.string()),
         "whash": pa.array(win[idx].view(np.int64))}
    )


def _rolling_window_hashes(texts, min_tokens: int, token_hash=None
                           ) -> tuple[np.ndarray, np.ndarray]:
    """→ (concatenated per-position window hashes, per-doc window counts).

    Polynomial combine of ``min_tokens`` consecutive token hashes
    (token hash = the engine-wide ``minhash.tokenize_batch`` identity),
    computed over the whole batch's concatenated token-hash array with
    boundary masking — ``min_tokens`` numpy ops total, no per-window
    Python."""
    from data_dedup_ray.stages.minhash import tokenize_batch

    hashes, counts = tokenize_batch(texts, token_hash=token_hash)
    k = min_tokens
    n = len(hashes)
    with np.errstate(over="ignore"):
        if n >= k:
            win = hashes[: n - k + 1].copy()
            for j in range(1, k):
                win = win * _POLY + hashes[j: n - k + 1 + j]
        else:
            win = np.empty(0, dtype=np.uint64)
    return win, counts


def winnowed_rows(
    batch: pa.Table, *, min_tokens: int = 50, winnow_w: int = 8,
    id_col: str = "url", text_col: str = "text", token_hash=None,
) -> pa.Table:
    """→ ``(id, whash:int64, pos:int32)`` — winnowed window fingerprints.

    In each run of ``winnow_w`` consecutive window hashes the LEFTMOST
    minimum is selected (``np.argmin`` tie order — ties are ~impossible
    at 64-bit hashes but the rule is pinned by the SQL twin);
    selections are deduplicated by position.  Any span
    of ``min_tokens + winnow_w − 1`` tokens shared between two documents
    yields at least one identical selected (hash, aligned-content) pair."""
    ids = batch[id_col].to_pylist()
    win, counts = _rolling_window_hashes(batch[text_col], min_tokens,
                                         token_hash=token_hash)
    # window hashes were computed over the CONCATENATED token-hash array;
    # doc d's valid (non-boundary-crossing) windows are the slice
    # win[tok_off_d : tok_off_d + n_windows_d].
    n_windows = np.maximum(counts - min_tokens + 1, 0)
    ids_out, h_out, p_out = [], [], []
    tok_off = 0
    for d, nw in enumerate(n_windows):
        if nw > 0:
            doc_win = win[tok_off: tok_off + nw]
            if nw <= winnow_w:
                sel = np.array([int(np.argmin(doc_win))])
            else:
                sw = np.lib.stride_tricks.sliding_window_view(doc_win, winnow_w)
                sel = np.unique(np.argmin(sw, axis=1)
                                + np.arange(sw.shape[0]))
            ids_out.extend([ids[d]] * len(sel))
            h_out.append(doc_win[sel].view(np.int64))
            p_out.append(sel.astype(np.int32))
        tok_off += counts[d]
    return pa.table(
        {
            id_col: pa.array(ids_out, type=pa.string()),
            "whash": pa.array(
                np.concatenate(h_out) if h_out else np.empty(0, np.int64)
            ),
            "pos": pa.array(
                np.concatenate(p_out) if p_out else np.empty(0, np.int32)
            ),
        }
    )
