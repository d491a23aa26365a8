"""ICWS — Ioffe's Consistent Weighted Sampling (ICDM 2010): the SKETCH
path for weighted Jaccard, standing to pipelines/weighted.py exactly as
MinHash stands to the exact n-gram Jaccard join.

For a weighted set S (here: k-shingle window counts), each of K
independent samples draws, per element s with weight w_s:

    r_s, c_s ~ Gamma(2, 1),  β_s ~ Uniform(0, 1)
    t_s = ⌊ln(w_s)/r_s + β_s⌋,   y_s = exp(r_s·(t_s − β_s))
    a_s = c_s / (y_s · exp(r_s))

and keeps ``argmin_s a_s`` with its ``t``; the classic CWS theorem gives
``Pr[sample_k(A) = sample_k(B)] = WJ(A, B)`` exactly, so the match
fraction over K samples is an unbiased weighted-Jaccard estimator with
variance WJ(1−WJ)/K.

Determinism without RNG state: every draw is a pure function of
``(element value, sample index)`` — five uniforms come from splitmix64
mixing of the element hash with the sample index, Gamma(2,1) variates
as −ln(u·u′) (sum of two exponentials).  Signatures are therefore
reproducible across batch splits, partitionings and runs (pinned by
tests), but NOT restatable in SQL (transcendental per-element math) —
the float tier is rows-only; its oracle-backed siblings are
``weighted_jaccard_pairs`` (the exact measure it estimates, used as
ground truth by the estimator test) and, since round 5, the
integer-exact FIXED mode below (``icws_fixed_pairs`` /
``icws_fixed_estimator_eval``), whose quantized-table draws make the
whole family bit-restatable in DuckDB.

State: K·16 B per doc (sample value + t).  Candidates: band the
signature like MinHash LSH (bands of r samples) through the coarse
exchange; the estimator needs only the two signatures, compared
in-partition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from data_dedup_ray.corpus import web_pages
from data_dedup_ray.engine.exchange import hash_exchange
from data_dedup_ray.stages.minhash import sha256_token_hash

_PAIR_OUT = pa.schema([("url_a", pa.string()), ("url_b", pa.string()),
                       ("est_bp", pa.int64())])

_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def _mix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — uint64 → uint64, vectorized."""
    with np.errstate(over="ignore"):
        x = x ^ (x >> np.uint64(30))
        x = x * _M1
        x = x ^ (x >> np.uint64(27))
        x = x * _M2
        return x ^ (x >> np.uint64(31))


def _uniform(vals: np.ndarray, k: int, slot: int) -> np.ndarray:
    """Deterministic U(0,1) per element for (sample k, slot) — strictly
    inside (0,1) so every log below is finite."""
    with np.errstate(over="ignore"):
        h = _mix(vals ^ _mix(np.uint64(k * 1315423911 + slot * 2654435761
                                       + 0x9E3779B97F4A7C15)))
    return (h.astype(np.float64) + 1.0) / 18446744073709551618.0


def icws_signatures_flat(vals: np.ndarray, cnts: np.ndarray,
                         sizes: np.ndarray, *, n_samples: int = 64
                         ) -> np.ndarray:
    """ICWS signatures for per-doc weighted sets given flat
    ``(vals, cnts)`` arrays and per-doc ``sizes`` — returns an
    (n_docs, n_samples) uint64 matrix where each entry encodes the
    chosen (element, t) pair (mixed to 64 bits).  Docs with empty sets
    get all-zero rows."""
    n_docs = len(sizes)
    sig = np.zeros((n_docs, n_samples), np.uint64)
    if not len(vals):
        return sig
    starts = np.concatenate([[0], np.cumsum(sizes)])[:-1].astype(np.int64)
    nonempty = sizes > 0
    ne_starts = starts[nonempty]
    ne_sizes = sizes[nonempty]
    owner = np.repeat(np.arange(len(ne_sizes)), ne_sizes)
    logw = np.log(cnts.astype(np.float64))
    for k in range(n_samples):
        u1 = _uniform(vals, k, 1)
        u2 = _uniform(vals, k, 2)
        u3 = _uniform(vals, k, 3)
        u4 = _uniform(vals, k, 4)
        u5 = _uniform(vals, k, 5)
        r = -np.log(u1 * u2)                 # Gamma(2,1)
        c = -np.log(u4 * u5)                 # Gamma(2,1)
        beta = u3
        t = np.floor(logw / r + beta)
        lny = r * (t - beta)
        # ln a = ln c − ln y − r  (compare in log space: monotone)
        lna = np.log(c) - lny - r
        # per-doc argmin over segments
        mins = np.minimum.reduceat(lna, ne_starts)
        m_rep = np.repeat(mins, ne_sizes)
        is_min = lna == m_rep
        # first minimal element per doc (reduceat over masked indices)
        idx_all = np.arange(len(lna))
        big = np.full(len(lna), len(lna), np.int64)
        big[is_min] = idx_all[is_min]
        first = np.minimum.reduceat(big, ne_starts)
        sel_val = vals[first]
        sel_t = t[first].astype(np.int64).astype(np.uint64)
        with np.errstate(over="ignore"):
            enc = _mix(sel_val ^ _mix(sel_t + np.uint64(k)))
        enc = np.where(enc == 0, np.uint64(1), enc)  # 0 = empty marker
        sig[nonempty, k] = enc
    return sig


def icws_signatures(
    ds: ray.data.Dataset, *, n_samples: int = 64, shingle_k: int = 5,
    token_hash=None, id_col: str = "url", text_col: str = "text",
) -> ray.data.Dataset:
    """``(url, sig)`` — K·8 B ICWS signature blob per doc."""
    from data_dedup_ray.pipelines.weighted import _weighted_shingles

    def fn(t: pa.Table) -> pa.Table:
        vals, cnts, sizes, _ = _weighted_shingles(
            t[text_col], shingle_k, token_hash=token_hash)
        sig = icws_signatures_flat(vals, cnts, sizes,
                                   n_samples=n_samples)
        return pa.table({
            id_col: t[id_col].combine_chunks(),
            "sig": pa.array([row.tobytes() for row in sig],
                            pa.large_binary()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow")


def icws_pairs(
    ds: ray.data.Dataset, *, n_samples: int = 64, band_r: int = 2,
    shingle_k: int = 5, min_est_bp: int = 5000, token_hash=None,
    id_col: str = "url", text_col: str = "text",
    num_partitions: int = 16, group_cap: int = 100_000,
) -> ray.data.Dataset:
    """``(url_a, url_b, est_bp)`` — ICWS-estimated weighted-Jaccard
    pairs: LSH banding over the signature (bands of ``band_r``
    samples), match-fraction estimator in-partition.  Probabilistic
    recall (the MinHash tradeoff), unbiased estimates; rows-only by
    design — weighted_jaccard_pairs is the exact oracle-backed
    sibling."""
    from data_dedup_ray.pipelines.near import (_distinct_pairs,
                                               _pairs_in_partition)
    assert n_samples % band_r == 0
    P = num_partitions
    n_bands = n_samples // band_r
    sigs = icws_signatures(ds, n_samples=n_samples, shingle_k=shingle_k,
                           token_hash=token_hash, id_col=id_col,
                           text_col=text_col)

    def band_rows(t: pa.Table) -> pa.Table:
        raw = t["sig"].to_pandas().to_numpy()
        n = len(raw)
        W = np.frombuffer(b"".join(raw), np.uint64).reshape(n, n_samples)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        nonempty = (W != 0).any(axis=1)
        out_b, out_h = [], []
        for band in range(n_bands):
            seg = W[:, band * band_r:(band + 1) * band_r]
            with np.errstate(over="ignore"):
                h = np.zeros(n, np.uint64)
                for c in range(band_r):
                    h = _mix(h ^ seg[:, c])
            out_b.append(np.full(n, band, np.int64))
            out_h.append(h)
        bands = np.concatenate([b[nonempty] for b in out_b])
        hs = np.concatenate([h[nonempty] for h in out_h])
        with np.errstate(over="ignore"):
            part = ((hs * np.uint64(0x100000001B3)
                     + bands.astype(np.uint64))
                    % np.uint64(P)).astype(np.int64)
        return pa.table({
            "bk": pa.array(hs ^ _mix(bands.astype(np.uint64)),
                           pa.uint64()),
            "id": pa.array(np.tile(ids[nonempty], n_bands), pa.string()),
            "sig": pa.array(np.tile(raw[nonempty], n_bands),
                            pa.large_binary()),
            "_part": pa.array(part),
        })

    def pairs_fn(g: pd.DataFrame) -> pd.DataFrame:
        p = _pairs_in_partition(g, key_cols=["bk"], id_col="id",
                                group_cap=group_cap, carry=["sig"])
        if not len(p):
            return pd.DataFrame({"url_a": pd.Series(dtype=object),
                                 "url_b": pd.Series(dtype=object),
                                 "est_bp": pd.Series(dtype=np.int64)})
        sa = np.frombuffer(b"".join(p["sig_a"]), np.uint64) \
            .reshape(len(p), n_samples)
        sb = np.frombuffer(b"".join(p["sig_b"]), np.uint64) \
            .reshape(len(p), n_samples)
        est = ((10000 * (sa == sb).sum(axis=1)) // n_samples) \
            .astype(np.int64)
        keep = est >= min_est_bp
        out = pd.DataFrame({
            "url_a": p["id_a"].to_numpy()[keep],
            "url_b": p["id_b"].to_numpy()[keep],
            "est_bp": est[keep],
        })
        return out

    cand = hash_exchange(
        [sigs.map_batches(band_rows, batch_format="pyarrow")],
        pairs_fn, num_partitions=P,
        schema=_PAIR_OUT,
        in_schemas=[pa.schema([("bk", pa.uint64()), ("id", pa.string()),
                               ("sig", pa.large_binary())])],
    )
    return _distinct_pairs(
        cand, ["url_a", "url_b"],
        keep_cols=["url_a", "url_b", "est_bp"],
        num_partitions=P).sort(["url_a", "url_b"])


def icws_sig_pairs(sf_dir: str, **kw) -> ray.data.Dataset:
    """Driver query: sha-token ICWS pairs over web_pages (rows-only —
    see icws_pairs; exact sibling = weighted_jaccard_pairs)."""
    return icws_pairs(web_pages(sf_dir),
                      token_hash=sha256_token_hash, **kw)


def icws_estimator_eval(
    sf_dir: str, *, threshold_bp: int = 7000, n_samples: int = 64,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Grade the K·8 B/doc ICWS tier against the EXACT weighted-Jaccard
    truth at the same threshold (the sketch-ladder metrics row;
    measured at K=64: recall 1.0, mean |est−true| ≈ 1.6e-2).  Rows-only
    (the pred side is not SQL-expressible); the truth side's oracle is
    weighted_jaccard_pairs."""
    from data_dedup_ray.pipelines.evaluation import dedup_pair_metrics
    from data_dedup_ray.pipelines.weighted import weighted_jaccard_pairs
    pages = web_pages(sf_dir)
    pred = icws_pairs(pages, token_hash=sha256_token_hash,
                      n_samples=n_samples, min_est_bp=threshold_bp,
                      num_partitions=num_partitions
                      ).select_columns(["url_a", "url_b"])
    truth = weighted_jaccard_pairs(
        pages, token_hash=sha256_token_hash,
        min_wjac_bp=threshold_bp, num_partitions=num_partitions
    ).select_columns(["url_a", "url_b"])
    return dedup_pair_metrics(pred, truth, tier=f"icws{n_samples}",
                              num_partitions=num_partitions)


# ---------------------------------------------------------------------------
# ICWS "fixed" mode — the integer-exact, SQL-restatable member of the family.
#
# The float path above draws Gamma(2,1)/Uniform variates with transcendental
# math per element, which no SQL engine can restate bit-for-bit (the reason
# icws_pairs is rows-only).  The fixed mode replaces every draw with a
# QUANTIZED inverse-CDF table lookup:
#
#   * one 64-bit xorshift hash per (shingle value, sample k) supplies four
#     12-bit indexes (pure shift/xor — wrap-exact in both numpy uint64 and
#     DuckDB UBIGINT, no 64-bit multiply needed);
#   * r ~ Gamma(2,1) as -(LN_Q[i1] + LN_Q[i2]) where LN_Q[i] =
#     floor(ln((i+.5)/4096)·2^20) — sum of two quantized exponentials;
#   * beta = i3/4096;  ln c ~ logGamma(2,1) as LGC_Q[i4], the quantized
#     inverse CDF of Gamma(2,1) in log space;
#   * ln w from LNW_Q[min(count,4096)] = floor(ln(w)·2^20).
#
# The tables are built ONCE here with math.log/bisection and embedded as
# integer literals in the SQL twin, so no float is ever evaluated by two
# engines: t and the argmin score are plain int64 arithmetic
# (t = (4096·Lw + b·R) // (4096·R);
#  score = 4096·(LC − R) − R·(4096·t − b) ∝ ln a, Ioffe ICDM'10 eq. 7),
# tie-broken by (score, shingle value).  Distribution-wise this is ICWS with
# 12-bit-discretized draws; the estimator-eval below grades the loss against
# the exact weighted-Jaccard truth.
# ---------------------------------------------------------------------------

_FX_FP = 1 << 20          # fixed-point scale for all log quantities
_FX_TBITS = 12
_FX_TSIZE = 1 << _FX_TBITS


def _gamma2_inv_cdf(p: float) -> float:
    """Inverse CDF of Gamma(2,1): solve 1 − (1+x)e^−x = p by bisection
    (deterministic; used only at table-build time)."""
    import math
    lo, hi = 0.0, 60.0
    for _ in range(200):
        mid = (lo + hi) / 2
        if 1.0 - (1.0 + mid) * math.exp(-mid) < p:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2


_FX_CACHE: dict = {}


def _fixed_tables():
    """(LN_Q, LNW_Q, LGC_Q) int64 arrays — see module comment."""
    if "tabs" not in _FX_CACHE:
        import math
        n = _FX_TSIZE
        lnq = np.array([math.floor(math.log((i + 0.5) / n) * _FX_FP)
                        for i in range(n)], np.int64)
        lnw = np.zeros(n + 1, np.int64)   # index by capped count 1..n
        for w in range(1, n + 1):
            lnw[w] = math.floor(math.log(w) * _FX_FP)
        lgc = np.array(
            [math.floor(math.log(_gamma2_inv_cdf((i + 0.5) / n)) * _FX_FP)
             for i in range(n)], np.int64)
        _FX_CACHE["tabs"] = (lnq, lnw, lgc)
    return _FX_CACHE["tabs"]


def _fixed_seeds(n_samples: int) -> np.ndarray:
    """One splitmix-derived 64-bit seed per sample index (embedded as
    literals in the SQL twin)."""
    k = np.arange(1, n_samples + 1, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return _mix(_mix(k * np.uint64(0x9E3779B97F4A7C15)))


def _xorshift2(x: np.ndarray) -> np.ndarray:
    """Two xorshift64 (13,7,17) rounds — wrap-exact in DuckDB UBIGINT
    (left shift restated as mod-then-multiply)."""
    for _ in range(2):
        x = x ^ (x << np.uint64(13))
        x = x ^ (x >> np.uint64(7))
        x = x ^ (x << np.uint64(17))
    return x


def icws_fixed_signatures_flat(
    vals: np.ndarray, cnts: np.ndarray, sizes: np.ndarray,
    *, n_samples: int = 64,
) -> tuple[np.ndarray, np.ndarray]:
    """Integer-exact ICWS signatures → ``(sel_v, sel_t)`` uint64/int64
    matrices of shape (n_docs, n_samples); empty docs get v=0, t=-1."""
    lnq, lnw, lgc = _fixed_tables()
    seeds = _fixed_seeds(n_samples)
    n_docs = len(sizes)
    sel_v = np.zeros((n_docs, n_samples), np.uint64)
    sel_t = np.full((n_docs, n_samples), -1, np.int64)
    if not len(vals):
        return sel_v, sel_t
    starts = np.concatenate([[0], np.cumsum(sizes)])[:-1].astype(np.int64)
    nonempty = sizes > 0
    ne_starts = starts[nonempty]
    ne_sizes = sizes[nonempty]
    lw = lnw[np.minimum(cnts, _FX_TSIZE)]
    idx_all = np.arange(len(vals))
    m12 = np.uint64(_FX_TSIZE - 1)
    for k in range(n_samples):
        x = _xorshift2(vals ^ seeds[k])
        i1 = (x >> np.uint64(52)).astype(np.int64)
        i2 = ((x >> np.uint64(40)) & m12).astype(np.int64)
        i3 = ((x >> np.uint64(28)) & m12).astype(np.int64)
        i4 = ((x >> np.uint64(16)) & m12).astype(np.int64)
        r = -(lnq[i1] + lnq[i2])            # > 0 always
        b = i3
        t = (_FX_TSIZE * lw + b * r) // (_FX_TSIZE * r)
        score = (_FX_TSIZE * (lgc[i4] - r)
                 - r * (_FX_TSIZE * t - b))
        # per-doc argmin by (score, shingle value) — same tie-break as
        # the SQL twin's ORDER BY score, s
        mins = np.minimum.reduceat(score, ne_starts)
        is_min = score == np.repeat(mins, ne_sizes)
        vbig = np.full(len(vals), np.uint64(0xFFFFFFFFFFFFFFFF),
                       np.uint64)
        vbig[is_min] = vals[is_min]
        vmin = np.minimum.reduceat(vbig, ne_starts)
        chosen = is_min & (vals == np.repeat(vmin, ne_sizes))
        big = np.full(len(vals), len(vals), np.int64)
        big[chosen] = idx_all[chosen]
        first = np.minimum.reduceat(big, ne_starts)
        sel_v[nonempty, k] = vals[first]
        sel_t[nonempty, k] = t[first]
    return sel_v, sel_t


def icws_fixed_signatures(
    ds: ray.data.Dataset, *, n_samples: int = 64, shingle_k: int = 5,
    token_hash=None, id_col: str = "url", text_col: str = "text",
) -> ray.data.Dataset:
    """``(url, sig)`` — K·16 B blob: per sample the (v, t) pair as two
    little-endian uint64 words (t ≥ 0 for non-empty docs)."""
    from data_dedup_ray.pipelines.weighted import _weighted_shingles

    def fn(t: pa.Table) -> pa.Table:
        vals, cnts, sizes, _ = _weighted_shingles(
            t[text_col], shingle_k, token_hash=token_hash)
        sv, st = icws_fixed_signatures_flat(vals, cnts, sizes,
                                            n_samples=n_samples)
        inter = np.empty((len(sizes), 2 * n_samples), np.uint64)
        inter[:, 0::2] = sv
        inter[:, 1::2] = st.astype(np.uint64)
        return pa.table({
            id_col: t[id_col].combine_chunks(),
            "sig": pa.array([row.tobytes() for row in inter],
                            pa.large_binary()),
            "n_set": pa.array(sizes, pa.int64()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow")


def icws_fixed_pairs(
    ds: ray.data.Dataset, *, n_samples: int = 64, band_r: int = 2,
    shingle_k: int = 5, min_est_bp: int = 5000, token_hash=None,
    id_col: str = "url", text_col: str = "text",
    num_partitions: int = 16, group_cap: int = 100_000,
) -> ray.data.Dataset:
    """``(url_a, url_b, est_bp)`` — fixed-mode ICWS pairs: LSH banding
    over the (v, t) signature, match-fraction estimator in-partition.
    Bit-exact SQL twin = ``icws_fixed_pairs_sql`` (integer-only math;
    bands group on the raw signature bytes, so candidates are exact
    band-equality, no hash collisions)."""
    sigs = icws_fixed_signatures(
        ds, n_samples=n_samples, shingle_k=shingle_k,
        token_hash=token_hash, id_col=id_col, text_col=text_col)
    return _fixed_pairs_from_sigs(
        sigs, n_samples=n_samples, band_r=band_r,
        min_est_bp=min_est_bp, id_col=id_col,
        num_partitions=num_partitions, group_cap=group_cap)


def _fixed_pairs_from_sigs(
    sigs: ray.data.Dataset, *, n_samples: int, band_r: int,
    min_est_bp: int, id_col: str = "url", num_partitions: int = 16,
    group_cap: int = 100_000, cross_prefixes: tuple | None = None,
) -> ray.data.Dataset:
    """Shared banding + estimator over a ``(id, sig, n_set)`` signature
    Dataset.  ``cross_prefixes=(idx, new)`` keeps only cross-side pairs
    of a tagged union (idx < new lexicographically ⇒ url_a is the index
    side) — the incremental-store path."""
    from data_dedup_ray.pipelines.near import (_distinct_pairs,
                                               _pairs_in_partition)
    assert n_samples % band_r == 0
    P = num_partitions
    n_bands = n_samples // band_r
    band_bytes = 16 * band_r

    def band_rows(t: pa.Table) -> pa.Table:
        keep = pc.greater(t["n_set"], 0)
        t = t.filter(keep)
        raw = t["sig"].to_pandas().to_numpy()
        n = len(raw)
        if not n:
            return pa.table({
                "band": pa.array([], pa.int64()),
                "bk": pa.array([], pa.large_binary()),
                "id": pa.array([], pa.string()),
                "sig": pa.array([], pa.large_binary()),
                "_part": pa.array([], pa.int64()),
            })
        W = np.frombuffer(b"".join(raw), np.uint64) \
            .reshape(n, 2 * n_samples)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        out_band, out_key, fold = [], [], []
        for band in range(n_bands):
            # the key is an exact byte slice of the blob — band
            # equality is exact, never a hash
            lo = band * band_bytes
            out_band.append(np.full(n, band, np.int64))
            out_key.append([bytes(s[lo:lo + band_bytes]) for s in raw])
            with np.errstate(over="ignore"):
                f = np.zeros(n, np.uint64)
                for c in range(2 * band_r):
                    f = _mix(f ^ W[:, band * 2 * band_r + c])
                fold.append(f + np.uint64(band))
        bands = np.concatenate(out_band)
        keys = [k for chunk in out_key for k in chunk]
        folds = np.concatenate(fold)
        return pa.table({
            "band": pa.array(bands),
            "bk": pa.array(keys, pa.large_binary()),
            "id": pa.array(np.tile(ids, n_bands), pa.string()),
            "sig": pa.array(np.tile(raw, n_bands), pa.large_binary()),
            "_part": pa.array((folds % np.uint64(P)).astype(np.int64)),
        })

    def pairs_fn(g: pd.DataFrame) -> pd.DataFrame:
        p = _pairs_in_partition(g, key_cols=["band", "bk"], id_col="id",
                                group_cap=group_cap, carry=["sig"])
        if len(p) and cross_prefixes is not None:
            # 'i|' < 'n|' ⇒ the index side is always id_a
            pidx, pnew = cross_prefixes
            p = p[p["id_a"].str.startswith(pidx)
                  & p["id_b"].str.startswith(pnew)]
        if not len(p):
            return pd.DataFrame({"url_a": pd.Series(dtype=object),
                                 "url_b": pd.Series(dtype=object),
                                 "est_bp": pd.Series(dtype=np.int64)})
        sa = np.frombuffer(b"".join(p["sig_a"]), np.uint64) \
            .reshape(len(p), 2 * n_samples)
        sb = np.frombuffer(b"".join(p["sig_b"]), np.uint64) \
            .reshape(len(p), 2 * n_samples)
        eq = (sa == sb)
        m = (eq[:, 0::2] & eq[:, 1::2]).sum(axis=1)
        est = ((10000 * m) // n_samples).astype(np.int64)
        keep = est >= min_est_bp
        return pd.DataFrame({
            "url_a": p["id_a"].to_numpy()[keep],
            "url_b": p["id_b"].to_numpy()[keep],
            "est_bp": est[keep],
        })

    cand = hash_exchange(
        [sigs.map_batches(band_rows, batch_format="pyarrow")],
        pairs_fn, num_partitions=P,
        schema=_PAIR_OUT,
        in_schemas=[pa.schema([("band", pa.int64()),
                               ("bk", pa.large_binary()),
                               ("id", pa.string()),
                               ("sig", pa.large_binary())])],
    )
    return _distinct_pairs(
        cand, ["url_a", "url_b"],
        keep_cols=["url_a", "url_b", "est_bp"],
        num_partitions=P).sort(["url_a", "url_b"])


def _fixed_tables_values_sql() -> tuple[str, str]:
    """The quantized tables as VALUES literals: ``tq(i, lnq, lgc)`` and
    ``wq(w, lnw)`` — the SAME integers the Python path indexes, so the
    two engines never evaluate a float in common."""
    lnq, lnw, lgc = _fixed_tables()
    tq = ", ".join(f"({i},{int(lnq[i])},{int(lgc[i])})"
                   for i in range(_FX_TSIZE))
    wq = ", ".join(f"({w},{int(lnw[w])})"
                   for w in range(1, _FX_TSIZE + 1))
    return tq, wq


def _fixed_chain_ctes(*, corpus: str = "", n_samples: int = 64,
                      shingle_k: int = 5,
                      shc_sql: str | None = None) -> str:
    """CTE fragment from a ``mall(id, text)``-producing ``corpus`` CTE
    block through ``sel(id, k, v, t)`` — the full integer-exact fixed
    ICWS chain (sha/FNV weighted shingles, xorshift64 draw hash with
    wrap-exact left shifts, quantized-table lookups, integer t/score,
    argmin by (score, s)).  Shared by the flat-pairs, estimator-eval
    and incremental-store oracles.

    ``shc_sql``: optional replacement for the corpus→shc derivation —
    a full "WITH …" block defining ``shc(id, s UBIGINT, c)`` directly
    (property tests inject arbitrary multisets this way)."""
    k = shingle_k
    K = n_samples
    leads = ",\n         ".join(
        f"lead(h, {j - 1}) OVER w AS h{j}" for j in range(2, k + 1))
    expr = "h1"
    for j in range(2, k + 1):
        expr = (f"(({expr} * 1099511628211::HUGEINT + h{j})"
                " % 18446744073709551616::HUGEINT)")
    seeds = _fixed_seeds(K)
    sd = ", ".join(f"({i},{int(seeds[i])})" for i in range(K))
    tq, wq = _fixed_tables_values_sql()
    # xorshift64 (13,7,17) ×2 with wrap-exact left shifts
    xs_steps = []
    cur = "x0"
    for rnd in range(2):
        for nm, sh in (("a", 13), ("b", 7), ("c", 17)):
            nxt = f"x{rnd}{nm}"
            if sh == 7:
                step = f"xor({cur}, {cur} >> 7) AS {nxt}"
            else:
                mod = 1 << (64 - sh)
                step = (f"xor({cur}, ({cur} % {mod}::UBIGINT)"
                        f" * {1 << sh}::UBIGINT) AS {nxt}")
            xs_steps.append(step)
            cur = nxt
    xs_chain = ""
    prev = "d0"
    for n_, step in enumerate(xs_steps):
        nm = f"d{n_ + 1}"
        xs_chain += (f"{nm} AS (SELECT id, s, c, k, {step}"
                     f" FROM {prev}),\n")
        prev = nm
    if shc_sql is not None:
        head = shc_sql.rstrip().rstrip(",") + ","
    else:
        head = f"""{corpus}
mtok AS (SELECT id, g.i AS pos, t[g.i] AS tok
         FROM (SELECT id, regexp_extract_all(text, '[a-z0-9]+') AS t
               FROM mall) u,
              UNNEST(generate_series(1, len(t))) AS g(i)),
mh AS (SELECT id, pos,
              CAST(('0x' || substr(sha256(tok), 1, 16)) AS UBIGINT) AS h
       FROM mtok),
mw AS (SELECT id, h AS h1,
         {leads}
       FROM mh WINDOW w AS (PARTITION BY id ORDER BY pos)),
ws AS (SELECT id, CAST({expr} AS UBIGINT) AS s FROM mw
       WHERE h{k} IS NOT NULL),
shc AS (SELECT id, s, least(CAST(count(*) AS BIGINT), {_FX_TSIZE}) AS c
        FROM ws GROUP BY 1, 2),"""
    return f"""{head}
sd AS (SELECT * FROM (VALUES {sd}) AS t(k, seed)),
tq AS (SELECT * FROM (VALUES {tq}) AS t(i, lnq, lgc)),
wq AS (SELECT * FROM (VALUES {wq}) AS t(w, lnw)),
d0 AS (SELECT shc.id, shc.s, shc.c, sd.k,
              xor(shc.s, CAST(sd.seed AS UBIGINT)) AS x0
       FROM shc CROSS JOIN sd),
{xs_chain}dx AS (SELECT id, s, c, k,
         CAST({prev}.{cur} >> 52 AS BIGINT) AS i1,
         CAST(({prev}.{cur} >> 40) & 4095 AS BIGINT) AS i2,
         CAST(({prev}.{cur} >> 28) & 4095 AS BIGINT) AS i3,
         CAST(({prev}.{cur} >> 16) & 4095 AS BIGINT) AS i4
       FROM {prev}),
sc AS (SELECT d.id, d.k, d.s,
              -(CAST(t1.lnq AS BIGINT) + t2.lnq) AS r,
              CAST(d.i3 AS BIGINT) AS b,
              CAST(w.lnw AS BIGINT) AS lw,
              CAST(t4.lgc AS BIGINT) AS lc
       FROM dx d
       JOIN tq t1 ON t1.i = d.i1
       JOIN tq t2 ON t2.i = d.i2
       JOIN tq t4 ON t4.i = d.i4
       JOIN wq w ON w.w = d.c),
tv AS (SELECT id, k, s,
              ({_FX_TSIZE}::BIGINT * lw + b * r)
               // ({_FX_TSIZE}::BIGINT * r) AS t,
              {_FX_TSIZE}::BIGINT * (lc - r)
               - r * ({_FX_TSIZE}::BIGINT
                      * (({_FX_TSIZE}::BIGINT * lw + b * r)
                         // ({_FX_TSIZE}::BIGINT * r)) - b) AS score
       FROM sc),
sel AS (SELECT id, k, s AS v, t FROM (
          SELECT id, k, s, t,
                 row_number() OVER (PARTITION BY id, k
                                    ORDER BY score, s) AS rn
          FROM tv) q WHERE rn = 1)"""


def icws_fixed_pairs_sql(
    *, n_samples: int = 64, band_r: int = 2, shingle_k: int = 5,
    min_est_bp: int = 5000,
) -> str:
    """Bit-exact DuckDB twin of ``icws_fixed_pairs`` (sha token hash)
    over web_pages: the fixed chain + band join on the per-band (v, t)
    lists + match-count estimator."""
    from data_dedup_ray.corpus import WEB_PAGES_CTE
    K = n_samples
    corpus = (f"\nWITH {WEB_PAGES_CTE},\n"
              "mall AS (SELECT url AS id, text FROM web_pages),")
    chain = _fixed_chain_ctes(corpus=corpus, n_samples=n_samples,
                              shingle_k=shingle_k)
    return f"""{chain},
bnd AS (SELECT id, k // {band_r} AS band,
               string_agg(v::VARCHAR || ':' || t::VARCHAR, ','
                          ORDER BY k) AS key
        FROM sel GROUP BY 1, 2),
cand AS (SELECT DISTINCT a.id AS ia, b.id AS ib
         FROM bnd a JOIN bnd b
           ON a.band = b.band AND a.key = b.key AND a.id < b.id),
mm AS (SELECT c.ia, c.ib, CAST(count(*) AS BIGINT) AS m
       FROM cand c
       JOIN sel x ON x.id = c.ia
       JOIN sel y ON y.id = c.ib AND y.k = x.k
                 AND y.v = x.v AND y.t = x.t
       GROUP BY 1, 2)
SELECT ia AS url_a, ib AS url_b,
       CAST((10000 * m) // {K} AS BIGINT) AS est_bp
FROM mm WHERE (10000 * m) // {K} >= {min_est_bp}
ORDER BY url_a, url_b"""


def icws_fixed_sig_pairs(sf_dir: str, **kw) -> ray.data.Dataset:
    """Driver query: sha-token fixed-mode ICWS pairs over web_pages —
    the oracle-backed member of the ICWS family (twin =
    icws_fixed_pairs_sql)."""
    return icws_fixed_pairs(web_pages(sf_dir),
                            token_hash=sha256_token_hash, **kw)


def icws_fixed_estimator_eval(
    sf_dir: str, *, threshold_bp: int = 7000, n_samples: int = 64,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Grade the fixed-mode ICWS tier against the EXACT
    weighted-Jaccard truth at the same threshold — unlike the float
    tier this row is fully SQL-twinned (both pred and truth are
    integer-exact)."""
    from data_dedup_ray.pipelines.evaluation import dedup_pair_metrics
    from data_dedup_ray.pipelines.weighted import weighted_jaccard_pairs
    pages = web_pages(sf_dir)
    pred = icws_fixed_pairs(
        pages, token_hash=sha256_token_hash, n_samples=n_samples,
        min_est_bp=threshold_bp, num_partitions=num_partitions
    ).select_columns(["url_a", "url_b"])
    truth = weighted_jaccard_pairs(
        pages, token_hash=sha256_token_hash,
        min_wjac_bp=threshold_bp, num_partitions=num_partitions
    ).select_columns(["url_a", "url_b"])
    return dedup_pair_metrics(pred, truth, tier=f"icwsfx{n_samples}",
                              num_partitions=num_partitions)


def icws_fixed_estimator_eval_sql(
    *, threshold_bp: int = 7000, n_samples: int = 64,
    shingle_k: int = 5,
) -> str:
    """SQL twin of the fixed-tier grade (the bottomk/sig eval shape)."""
    from data_dedup_ray.pipelines.weighted import (
        weighted_jaccard_sig_pairs_sql)
    pred = icws_fixed_pairs_sql(n_samples=n_samples,
                                shingle_k=shingle_k,
                                min_est_bp=threshold_bp)
    tru = weighted_jaccard_sig_pairs_sql(shingle_k=shingle_k,
                                         min_wjac_bp=threshold_bp)
    return f"""
WITH pred AS MATERIALIZED (
  SELECT url_a, url_b FROM ({pred}) p),
tru AS MATERIALIZED (
  SELECT url_a, url_b FROM ({tru}) t),
m AS (SELECT
  (SELECT count(*) FROM pred) AS n_pred,
  (SELECT count(*) FROM tru) AS n_true,
  (SELECT count(*) FROM pred p JOIN tru t
     ON p.url_a = t.url_a AND p.url_b = t.url_b) AS n_hit)
SELECT 'icwsfx{n_samples}' AS tier,
       CAST(n_pred AS BIGINT) AS n_pred,
       CAST(n_true AS BIGINT) AS n_true, CAST(n_hit AS BIGINT) AS n_hit,
       CAST(10000 * n_hit // greatest(n_pred, 1) AS BIGINT) AS precision_bp,
       CAST(10000 * n_hit // greatest(n_true, 1) AS BIGINT) AS recall_bp,
       CAST(20000 * n_hit // greatest(n_pred + n_true, 1) AS BIGINT) AS f1_bp
FROM m"""


# ---------------------------------------------------------------------------
# Fixed-ICWS incremental store rung — the weighted-Jaccard member of the
# fingerprint-store ladder (fpstore sha / bbit / sigstore / bottomk /
# spanstore / embstore siblings).  K·16 B/doc of persisted (v, t) samples;
# a new crawl's pages band against the store WITHOUT re-reading any index
# text, and because the fixed chain is integer-exact the whole incremental
# query has a bit-exact DuckDB twin.
# ---------------------------------------------------------------------------


def _token_hash_name(token_hash) -> str:
    return "sha" if token_hash in ("sha", sha256_token_hash) else "fast"


def build_icws_fixed_store(
    ds: ray.data.Dataset, path: str, *, n_samples: int = 64,
    shingle_k: int = 5, token_hash="sha", id_col: str = "url",
    text_col: str = "text", num_partitions: int = 16,
) -> None:
    """Persist ``(url, sig, n_set)`` fixed-ICWS sketches — resumable
    hash-partitioned parquet with config lineage (mismatched query
    parameters fail loudly at read time)."""
    from data_dedup_ray.state.sink import resumable_write_parquet
    th = sha256_token_hash if token_hash == "sha" else token_hash
    resumable_write_parquet(
        icws_fixed_signatures(ds, n_samples=n_samples,
                              shingle_k=shingle_k, token_hash=th,
                              id_col=id_col, text_col=text_col),
        path, key_col=id_col, num_partitions=num_partitions,
        config={"kind": "icws_fixed_store", "n_samples": n_samples,
                "shingle_k": shingle_k,
                "token_hash": _token_hash_name(token_hash)})


def incremental_icws_fixed_pairs(
    new_ds: ray.data.Dataset, store_path: "str | list", *,
    n_samples: int = 64,
    band_r: int = 2, shingle_k: int = 5, min_est_bp: int = 5000,
    token_hash="sha", num_partitions: int = 16,
    group_cap: int = 100_000,
) -> ray.data.Dataset:
    """``(new_url, index_url, est_bp)`` — each new-crawl page's
    fixed-ICWS weighted-Jaccard estimate against the persisted sketch
    store; index text is never re-read.  Store config is validated
    against the query's parameters.  ``store_path`` may be a LIST of
    disjoint crawl-slice stores (rolling form — distinct urls' sketch
    rows concatenate losslessly; NOT a per-url sketch merge, which CWS
    argmin state cannot support)."""
    from data_dedup_ray.pipelines.fpstore import _read_store
    from data_dedup_ray.state.sink import validate_store_config
    validate_store_config(store_path, {
        "kind": "icws_fixed_store", "n_samples": n_samples,
        "shingle_k": shingle_k,
        "token_hash": _token_hash_name(token_hash)})
    th = sha256_token_hash if token_hash == "sha" else token_hash

    def tag(prefix):
        def fn(t: pa.Table) -> pa.Table:
            u = pc.binary_join_element_wise(
                pa.array([prefix] * t.num_rows, pa.string()),
                t["url"].combine_chunks().cast(pa.string()), "")
            return pa.table({
                "url": u,
                "sig": t["sig"].combine_chunks().cast(pa.large_binary()),
                "n_set": t["n_set"].combine_chunks().cast(pa.int64()),
            })
        return fn

    new_sigs = icws_fixed_signatures(
        new_ds, n_samples=n_samples, shingle_k=shingle_k, token_hash=th
    ).map_batches(tag("n|"), batch_format="pyarrow")
    idx_sigs = _read_store(store_path).map_batches(
        tag("i|"), batch_format="pyarrow")
    pairs = _fixed_pairs_from_sigs(
        new_sigs.union(idx_sigs), n_samples=n_samples, band_r=band_r,
        min_est_bp=min_est_bp, num_partitions=num_partitions,
        group_cap=group_cap, cross_prefixes=("i|", "n|"))

    def strip(t: pa.Table) -> pa.Table:
        return pa.table({
            "new_url": pc.utf8_slice_codeunits(
                t["url_b"].combine_chunks(), 2),
            "index_url": pc.utf8_slice_codeunits(
                t["url_a"].combine_chunks(), 2),
            "est_bp": t["est_bp"].combine_chunks(),
        })

    return pairs.map_batches(strip, batch_format="pyarrow") \
        .sort(["new_url", "index_url"])


def incremental_icws_fixed_pairs_web(
    sf_dir: str, *, store_dir: str | None = None, **kw
) -> ray.data.Dataset:
    """Driver query: build (or reuse) the fixed-ICWS store from the
    sf corpus, then run snapshot2 against it — store under /tmp keyed
    by corpus + config so repeat runs resume instead of rebuilding."""
    import hashlib
    import os

    from data_dedup_ray.pipelines.snapshots import snapshot2
    n_samples = kw.get("n_samples", 64)
    shingle_k = kw.get("shingle_k", 5)
    if store_dir is None:
        tag = hashlib.sha256(
            f"{os.path.abspath(sf_dir)}|icwsfx|{n_samples}|{shingle_k}"
            .encode()).hexdigest()[:16]
        store_dir = f"/tmp/icws_fixed_store_{tag}"
    build_icws_fixed_store(web_pages(sf_dir), store_dir,
                           n_samples=n_samples, shingle_k=shingle_k)
    return incremental_icws_fixed_pairs(snapshot2(sf_dir), store_dir,
                                        **kw)


def incremental_icws_fixed_pairs_sql(
    *, n_samples: int = 64, band_r: int = 2, shingle_k: int = 5,
    min_est_bp: int = 5000,
) -> str:
    """Twin over the tagged web_pages ('i|') × snapshot2 ('n|') union —
    the fixed chain with cross-side band candidates."""
    from data_dedup_ray.corpus import WEB_PAGES_CTE
    from data_dedup_ray.pipelines.snapshots import SNAPSHOT2_CTE
    K = n_samples
    corpus = (f"\nWITH {WEB_PAGES_CTE},\n{SNAPSHOT2_CTE},\n"
              "mall AS (\n"
              "  SELECT 'i|' || url AS id, text FROM web_pages\n"
              "  UNION ALL SELECT 'n|' || url, text FROM snapshot2),")
    chain = _fixed_chain_ctes(corpus=corpus, n_samples=n_samples,
                              shingle_k=shingle_k)
    return f"""{chain},
bnd AS (SELECT id, k // {band_r} AS band,
               string_agg(v::VARCHAR || ':' || t::VARCHAR, ','
                          ORDER BY k) AS key
        FROM sel GROUP BY 1, 2),
cand AS (SELECT DISTINCT a.id AS ia, b.id AS ib
         FROM bnd a JOIN bnd b
           ON a.band = b.band AND a.key = b.key AND a.id < b.id
         WHERE substr(a.id, 1, 2) = 'i|' AND substr(b.id, 1, 2) = 'n|'),
mm AS (SELECT c.ia, c.ib, CAST(count(*) AS BIGINT) AS m
       FROM cand c
       JOIN sel x ON x.id = c.ia
       JOIN sel y ON y.id = c.ib AND y.k = x.k
                 AND y.v = x.v AND y.t = x.t
       GROUP BY 1, 2)
SELECT substr(ib, 3) AS new_url, substr(ia, 3) AS index_url,
       CAST((10000 * m) // {K} AS BIGINT) AS est_bp
FROM mm WHERE (10000 * m) // {K} >= {min_est_bp}
ORDER BY new_url, index_url"""


def icws_fixed_clusters(
    sf_dir: str, *, n_samples: int = 64, band_r: int = 2,
    shingle_k: int = 5, min_est_bp: int = 7000,
    num_partitions: int = 16, dsu_max_edges: int = 20_000_000,
) -> ray.data.Dataset:
    """Connected components over the fixed-ICWS pair graph —
    ``(url, cluster_id)`` min-member labels: the sketch-only weighted
    cluster view (assignments from K·16 B/doc of signature state, no
    exact Σmin pass), with a full RECURSIVE closure twin because the
    pair set itself is bit-restatable.  Count-gated DSU with the
    distributed label-propagation fallback."""
    from data_dedup_ray.pipelines.components import (attach_clusters,
                                                     dsu_components,
                                                     label_propagation)
    pages = web_pages(sf_dir).select_columns(["url"])
    edges = icws_fixed_sig_pairs(
        sf_dir, n_samples=n_samples, band_r=band_r,
        shingle_k=shingle_k, min_est_bp=min_est_bp,
        num_partitions=num_partitions).materialize()
    if edges.count() > dsu_max_edges:
        return label_propagation(
            pages, edges.select_columns(["url_a", "url_b"]),
            node_col="url")
    assignment = dsu_components(edges.to_pandas())
    return attach_clusters(pages, assignment, id_col="url")


def icws_fixed_clusters_sql(
    *, n_samples: int = 64, band_r: int = 2, shingle_k: int = 5,
    min_est_bp: int = 7000,
) -> str:
    """RECURSIVE closure over the fixed-pair twin, min-member labels."""
    from data_dedup_ray.corpus import WEB_PAGES_CTE
    pairs = icws_fixed_pairs_sql(n_samples=n_samples, band_r=band_r,
                                 shingle_k=shingle_k,
                                 min_est_bp=min_est_bp)
    return f"""
WITH RECURSIVE {WEB_PAGES_CTE},
dup AS (SELECT url_a, url_b FROM ({pairs}) p),
edges AS (SELECT url_a AS a, url_b AS b FROM dup
          UNION SELECT url_b, url_a FROM dup),
reach(a, b) AS (SELECT a, b FROM edges
                UNION SELECT r.a, e.b FROM reach r
                JOIN edges e ON r.b = e.a),
comp AS (SELECT a AS url, least(a, min(b)) AS cluster_id
         FROM reach GROUP BY a)
SELECT w.url, coalesce(c.cluster_id, w.url) AS cluster_id
FROM web_pages w LEFT JOIN comp c ON c.url = w.url"""
