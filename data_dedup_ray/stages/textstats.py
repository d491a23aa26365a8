"""Text-analysis stages: token counts, quality scores, language id,
document fingerprints.

Training-data-pipeline operators (task brief: "text analysis" family; not
in the reference, which treats content as opaque bytes — SURVEY.md §2.6).
All are stateless vectorized ``map_batches`` kernels except ``LangId``
(compiled marker tables → actor pool).  Integer outputs only (counts /
basis points) so every operator is DuckDB-oracle-checkable without float
noise.

Tokenizer: the same ``[a-z0-9]+`` (case-folded) regex as stages/minhash.py
so all text operators agree on what a token is.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

TOKEN_RE = re.compile(r"[a-z0-9]+")
PUNCT_RE = re.compile(r"[^a-z0-9 ]")

#: marker words per language for the n-gram-free heuristic language id.
#: Deterministic argmax over marker counts; ties and all-zero scores
#: resolve by this fixed order then 'und'.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "is", "in", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "dans", "pour"),
    "es": ("el", "la", "los", "las", "es", "un", "una", "en", "por"),
}
LANG_ORDER = ("en", "de", "fr", "es")


def token_stats(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Append n_tokens / n_token_chars / n_punct to each row."""
    texts = batch[text_col].to_pylist()
    n_tok = np.zeros(len(texts), dtype=np.int64)
    n_chars = np.zeros(len(texts), dtype=np.int64)
    n_punct = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        low = t.lower()
        toks = TOKEN_RE.findall(low)
        n_tok[i] = len(toks)
        n_chars[i] = sum(len(w) for w in toks)
        n_punct[i] = len(PUNCT_RE.findall(low))
    return (
        batch.append_column("n_tokens", pa.array(n_tok))
        .append_column("n_token_chars", pa.array(n_chars))
        .append_column("n_punct", pa.array(n_punct))
    )


def quality_scores(batch: pa.Table, *, text_col: str = "text",
                   stopwords: tuple[str, ...] = LANG_MARKERS["en"],
                   min_tokens: int = 10) -> pa.Table:
    """Length / punctuation / stopword quality signals + keep flag.

    Ratios are integer basis points (floor(x·10000)) for oracle parity.
    ``keep`` mirrors C4-style filters: enough tokens and not
    punctuation-dominated.
    """
    out = token_stats(batch, text_col=text_col)
    texts = batch[text_col].to_pylist()
    stop = set(stopwords)
    n_stop = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        n_stop[i] = sum(1 for w in TOKEN_RE.findall(t.lower()) if w in stop)
    n_tok = out["n_tokens"].to_numpy()
    n_punct = out["n_punct"].to_numpy()
    n_len = np.asarray([len(t) for t in texts], dtype=np.int64)
    denom = np.maximum(n_tok, 1)
    stop_bp = np.floor(n_stop * 10000.0 / denom).astype(np.int64)
    punct_bp = np.floor(n_punct * 10000.0 / np.maximum(n_len, 1)).astype(np.int64)
    keep = (n_tok >= min_tokens) & (punct_bp < 2000)
    return (
        out.append_column("n_stopwords", pa.array(n_stop))
        .append_column("stop_ratio_bp", pa.array(stop_bp))
        .append_column("punct_ratio_bp", pa.array(punct_bp))
        .append_column("keep", pa.array(keep))
    )


class LangId:
    """Actor stage: heuristic language id from marker-word counts.

    Marker regexes compiled once per actor.  Output column ``lang_pred``:
    argmax language by marker hits (fixed LANG_ORDER tie-break), 'und'
    when no marker hits at all.
    """

    def __init__(self):
        self.stops = {k: set(v) for k, v in LANG_MARKERS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        preds = []
        for t in texts:
            toks = TOKEN_RE.findall(t.lower())
            best, best_n = "und", 0
            for lang in LANG_ORDER:
                n = sum(1 for w in toks if w in self.stops[lang])
                if n > best_n:
                    best, best_n = lang, n
            preds.append(best)
        return batch.append_column("lang_pred", pa.array(preds, type=pa.string()))


def doc_fingerprint_sha(batch: pa.Table, *, text_col: str = "text",
                        shingle_k: int = 5) -> pa.Table:
    """SQL-twin-able document fingerprint: the minimum over all k-shingles
    of the first 16 hex chars of sha256(space-joined shingle) — DuckDB
    restates it verbatim with a list comprehension over
    ``regexp_extract_all(lower(text), '[a-z0-9]+')``.  Docs with fewer
    than k tokens emit '' (the SQL NULL→'' coalesce).  The default
    ``doc_fingerprint`` (vectorized rolling hash) stays the production
    kernel; this variant trades speed for an exact oracle, the same
    pattern as the sha-token simhash."""
    import hashlib

    texts = batch[text_col].to_pylist()
    fps = []
    for t in texts:
        toks = TOKEN_RE.findall((t or "").lower())
        if len(toks) < shingle_k:
            fps.append("")
            continue
        fps.append(min(
            hashlib.sha256(
                " ".join(toks[i:i + shingle_k]).encode()
            ).hexdigest()[:16]
            for i in range(len(toks) - shingle_k + 1)
        ))
    return batch.append_column("fingerprint_sha",
                               pa.array(fps, type=pa.string()))


def doc_fingerprint(batch: pa.Table, *, text_col: str = "text",
                    shingle_k: int = 5) -> pa.Table:
    """64-bit document fingerprint: the minimum k-shingle rolling hash —
    one MinHash permutation's worth of signature, usable as a cheap
    near-identity key (rows-only check; hash not SQL-expressible)."""
    from data_dedup_ray.stages.minhash import shingle_sets

    cat, sizes = shingle_sets(batch[text_col], shingle_k)
    offs = np.concatenate([[0], np.cumsum(sizes)])
    fp = np.zeros(len(batch), dtype=np.int64)
    has = sizes > 0
    if has.any():
        fp[has] = np.minimum.reduceat(cat, offs[:-1][has]).view(np.int64)
    return batch.append_column("fingerprint", pa.array(fp))
