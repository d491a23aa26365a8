"""Suffix-array kernels — exact longest-duplicated-span extraction.

north_star: "suffix-array-based substring dedup".  The discovery side
(which docs share ≥min_tokens-token spans) runs on window/winnowed hashes
(stages/substring.py — linear, shuffle-friendly); THIS module is the
exact-span side: given a candidate pair, a generalized suffix array over
the two token streams yields the exact longest common token span.

All construction is numpy (prefix-doubling with ``np.lexsort``,
O(n log² n)); the Kasai LCP loop is plain Python but runs on
document-sized inputs (hundreds to thousands of tokens) inside
distributed per-pair tasks, far from any hot loop.
"""

from __future__ import annotations

import numpy as np


def suffix_array(t: np.ndarray) -> np.ndarray:
    """Suffix array of an integer token sequence (prefix doubling)."""
    n = len(t)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    # initial ranks = dense token ranks
    order = np.argsort(t, kind="stable")
    rank = np.empty(n, dtype=np.int64)
    sorted_t = t[order]
    r = np.concatenate([[0], np.cumsum(sorted_t[1:] != sorted_t[:-1])])
    rank[order] = r
    k = 1
    while k < n:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        r = np.zeros(n, dtype=np.int64)
        prev_pairs = np.stack([rank[order], key2[order]])
        diff = (prev_pairs[:, 1:] != prev_pairs[:, :-1]).any(axis=0)
        r[1:] = np.cumsum(diff)
        new_rank = np.empty(n, dtype=np.int64)
        new_rank[order] = r
        rank = new_rank
        if rank[order[-1]] == n - 1:
            break
        k *= 2
    return order.astype(np.int64)


def lcp_array(t: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai LCP: ``lcp[i] = |common prefix of suffixes sa[i-1], sa[i]|``."""
    n = len(t)
    lcp = np.zeros(n, dtype=np.int64)
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    h = 0
    for i in range(n):
        if rank[i] > 0:
            j = sa[rank[i] - 1]
            while i + h < n and j + h < n and t[i + h] == t[j + h]:
                h += 1
            lcp[rank[i]] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def longest_common_span(ta: np.ndarray, tb: np.ndarray
                        ) -> tuple[int, int, int]:
    """→ (length, start_a, start_b) of the longest common token span,
    via a generalized suffix array over ``ta ++ [SEP] ++ tb``.

    Token ids must be ≥ 0; the separator is chosen below both streams so
    no match can cross it.  Deterministic tie-break: smallest start_a,
    then smallest start_b."""
    na, nb = len(ta), len(tb)
    if na == 0 or nb == 0:
        return 0, 0, 0
    sep = np.int64(-1)
    t = np.concatenate([ta.astype(np.int64), [sep], tb.astype(np.int64)])
    # shift so all values ≥ 0 for the doubling ranks (sep lowest)
    t = t - t.min()
    sa = suffix_array(t)
    lcp = lcp_array(t, sa)
    best = (0, na, nb)
    for i in range(1, len(t)):
        a, b = sa[i - 1], sa[i]
        if (a < na) == (b < na):
            continue  # same side
        # the separator is unique, so a cross-side common prefix can never
        # contain it — lcp[i] is already clamped to the a-side tail
        length = int(lcp[i])
        if length == 0:
            continue
        pa_, pb_ = (a, b - na - 1) if a < na else (b, a - na - 1)
        cand = (length, int(pa_), int(pb_))
        if (cand[0], -cand[1], -cand[2]) > (best[0], -best[1], -best[2]):
            best = cand
    if best[0] == 0:
        return 0, 0, 0
    return best
