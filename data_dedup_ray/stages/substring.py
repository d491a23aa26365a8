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

- ``window_md5_rows``: EXACT — one MD5 per window position over the joined
  token text.  Reproducible in ANSI SQL (DuckDB ``md5`` over
  ``regexp_extract_all`` token lists), which makes the pipeline
  oracle-checkable end to end.
- ``winnowed_rows``: SCALE — 64-bit polynomial rolling hashes winnowed to
  the per-window minimum (Schleimer et al., SIGMOD'03 "Winnowing: Local
  Algorithms for Document Fingerprinting"): any shared span of
  ``min_tokens + w − 1`` tokens is guaranteed to share a selected
  fingerprint, at ~1/w of the row volume.

Tokenizer = stages/minhash.TOKEN_RE (one compiled regex, shared across the
near-dup family so "token" means one thing engine-wide).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from data_dedup_ray.stages.minhash import TOKEN_RE

_POLY = np.uint64(0x100000001B3)


def window_md5_rows(
    batch: pa.Table, *, min_tokens: int = 50,
    id_col: str = "url", text_col: str = "text",
) -> pa.Table:
    """→ ``(id, whash:string)`` — one MD5 hex row per token-window position.

    ``whash = md5(" ".join(tokens[i : i + min_tokens]))``, matching DuckDB's
    ``md5(array_to_string(w[i : i+L-1], ' '))`` byte for byte."""
    ids_out, hashes_out = [], []
    ids = batch[id_col].to_pylist()
    for uid, text in zip(ids, batch[text_col].to_pylist()):
        toks = TOKEN_RE.findall(text) if text else []
        n = len(toks)
        if n < min_tokens:
            continue
        for i in range(n - min_tokens + 1):
            win = " ".join(toks[i: i + min_tokens])
            ids_out.append(uid)
            hashes_out.append(hashlib.md5(win.encode()).hexdigest())
    return pa.table(
        {id_col: pa.array(ids_out, type=pa.string()),
         "whash": pa.array(hashes_out, type=pa.string())}
    )


def _rolling_window_hashes(texts: list, min_tokens: int) -> tuple[np.ndarray, np.ndarray]:
    """→ (concatenated per-position window hashes, per-doc window counts).

    Polynomial combine of ``min_tokens`` consecutive token hashes, computed
    over the whole batch's concatenated token-hash array with boundary
    masking — ``min_tokens`` numpy ops total, no per-window Python."""
    toks = [TOKEN_RE.findall(t) if t else [] for t in texts]
    counts = np.fromiter((len(t) for t in toks), dtype=np.int64, count=len(toks))
    flat = [w for doc in toks for w in doc]
    hashes = (
        pd.util.hash_array(np.asarray(flat, dtype=object))
        if flat else np.empty(0, dtype=np.uint64)
    )
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
    id_col: str = "url", text_col: str = "text",
) -> pa.Table:
    """→ ``(id, whash:int64, pos:int32)`` — winnowed window fingerprints.

    In each run of ``winnow_w`` consecutive window hashes the (rightmost)
    minimum is selected; selections are deduplicated by position.  Any span
    of ``min_tokens + winnow_w − 1`` tokens shared between two documents
    yields at least one identical selected (hash, aligned-content) pair."""
    texts = batch[text_col].to_pylist()
    ids = batch[id_col].to_pylist()
    win, counts = _rolling_window_hashes(texts, min_tokens)
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
