"""Sparse-vector (bag-of-words) document similarity — the inverted-index
/ term-partitioned pairwise-cosine pattern of the MapReduce literature
(Elsayed, Lin & Oard, "Pairwise Document Similarity in Large Collections
with MapReduce", ACL 2008).

Third similarity family beside the sketch-based (``near.py`` MinHash /
SimHash) and dense-embedding (``search.py``) paths: documents are exact
term-frequency vectors over the ``[a-z0-9]+`` token space and pairwise
cosine is accumulated TERM-AT-A-TIME — each term's posting list meets in
one hash partition, emits its pairwise weight products there, and the
per-pair partial dots are reduced by a hash exchange.  No all-pairs
block structure, no driver materialization.

Scale shape
-----------
* Tokens are 64-bit polars string hashes from the moment of
  tokenization (``stages/minhash.tokenize_batch``) — no token STRINGS in
  any shuffle, 8 bytes per posting.  Hash collisions merge two terms
  with p≈2⁻⁶⁴ per vocab pair — the same accepted trade the shingle
  pipeline documents (``near.py``), except here there is no verify
  stage, so the oracle-parity claim is probabilistic with vocab-sized
  n²·2⁻⁶⁵ error odds.
* The classic quadratic blow-up of posting-list self-joins is bounded
  the standard way: terms with document frequency above ``max_df`` are
  dropped from the VECTOR SPACE itself (the df-cut is a documented
  semantic, identical in the SQL twin), so per-term pair work is
  ≤ max_df² and stopword-like heavy hitters never generate pairs.
  Terms with df=1 are skipped in the pair stage only (they cannot form
  a pair; they still count toward norms).
* Every post-tokenize table is fixed-width (ids + ints/floats); the
  per-pair partial streams are combined map-side (groupby inside the
  emitting partition) before the reduce exchange.
* Pair partials are keyed by ``id_a`` — pair identity contains it, so
  partials of one pair always co-locate, and the same partitioning is
  reused to attach ``n2_a`` (then one more exchange on ``id_b`` attaches
  ``n2_b``).  Norm partials ride the SAME exchanges, so the whole
  operator is: tokenize → 1 bucketize + 4 small exchanges.

Exactness
---------
``weighting="tf"`` keeps every quantity in the integer domain: dot
products are int64 sums, and the threshold test ``cos² ≥ t`` is the
all-integer predicate ``dot²·10⁴ ≥ min_cos2_bp·n2a·n2b`` (no float ever
decides membership — a float prefilter narrows candidates, then exact
Python-int arithmetic settles the boundary band).  The reported
``cos2_bp`` = ⌊dot²·10⁴ / (n2a·n2b)⌋ is exactly restatable in DuckDB
HUGEINT arithmetic (``oracles.tf_cosine_pairs_sql``).

``weighting="tfidf"`` weights by the smoothed inverse document
frequency ``idf = ln((1+N)/(1+df)) + 1`` (the sklearn convention) —
float math, so it ships as a rows-only driver query whose oracle-backed
sibling is the tf mode (same exchanges, same pair universe); the float
kernel is pinned by a numpy brute-force test (tests/test_tfidf.py).

The reference engine has no similarity operator at all (its blocking
functions are equality-only digests, SURVEY §2.2); this module is part
of the north_rule training-data extension surface (SURVEY §8).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import polars as pl  # module-level: workers import it once, serially
import pyarrow as pa
import ray
import ray.data

from data_dedup_ray.engine.exchange import (
    Bucketed,
    bucketize,
    hash_exchange,
    key_partition,
)
from data_dedup_ray.stages.minhash import tokenize_batch


def tf_rows(
    ds: ray.data.Dataset,
    *,
    id_col: str = "url",
    text_col: str = "text",
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """``(id, tok, tf, _part)`` term-frequency rows, one per distinct
    (document, term); ``tok`` is the 64-bit token hash and ``_part`` is
    its partition, so the table is exchange-ready.  Exact because every
    document is wholly contained in one input row (one batch)."""
    P = num_partitions

    def expand(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = t[id_col]
        # case-fold BEFORE tokenizing (the tf-idf convention, and what
        # the SQL twin's lower(text) does); the shingle pipelines
        # deliberately do not fold — don't unify them
        hashes, counts = tokenize_batch(pc.utf8_lower(t[text_col]))
        empty = pa.table({
            "id": pa.array([], pa.string()),
            "tok": pa.array([], pa.uint64()),
            "tf": pa.array([], pa.int64()),
            "_part": pa.array([], pa.int64()),
        })
        if not len(hashes):
            return empty
        rep = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        g = (
            pl.DataFrame({"i": rep, "tok": hashes})
            .group_by(["i", "tok"])
            .len()
        )
        idx = g["i"].to_numpy()
        tok = g["tok"].to_numpy().astype(np.uint64)
        tf = g["len"].to_numpy().astype(np.int64)
        return pa.table({
            "id": ids.take(pa.array(idx)),
            "tok": pa.array(tok, pa.uint64()),
            "tf": pa.array(tf, pa.int64()),
            "_part": pa.array((tok % np.uint64(P)).astype(np.int64)),
        })

    return ds.map_batches(expand, batch_format="pyarrow")


_TF_SCHEMA = pa.schema([
    ("id", pa.string()),
    ("tok", pa.uint64()),
    ("tf", pa.int64()),
])


def _idf(df: np.ndarray, n_docs: int) -> np.ndarray:
    return np.log((1.0 + n_docs) / (1.0 + df.astype(np.float64))) + 1.0


def sparse_cosine_pairs(
    ds: ray.data.Dataset,
    *,
    id_col: str = "url",
    text_col: str = "text",
    weighting: str = "tf",
    max_df: int = 256,
    min_cos2_bp: int = 8100,
    min_cos: float = 0.9,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """All unordered document pairs whose bag-of-words cosine clears the
    threshold, over the df-pruned vocabulary (terms with df ≤
    ``max_df``).

    Output (``weighting="tf"``): ``(id_a, id_b, dot, cos2_bp)`` with
    ``id_a < id_b``, ``dot`` the exact integer TF dot product and
    ``cos2_bp`` = ⌊cos²·10⁴⌋ exactly; membership = ``cos2_bp`` math ≥
    ``min_cos2_bp`` decided in exact integer arithmetic.

    Output (``weighting="tfidf"``): ``(id_a, id_b, dot, cos_bp)`` with
    float tf-idf dot and ``cos_bp`` = round(cos·10⁴); membership =
    ``cos ≥ min_cos`` (float).
    """
    if weighting not in ("tf", "tfidf"):
        raise ValueError(f"unknown weighting {weighting!r}")
    P = num_partitions
    is_tf = weighting == "tf"
    n_docs = 0 if is_tf else ds.count()
    wdtype = np.int64 if is_tf else np.float64
    wfield = pa.int64() if is_tf else pa.float64()

    rows = tf_rows(ds, id_col=id_col, text_col=text_col,
                   num_partitions=P)
    buckets: Bucketed = bucketize(rows, num_partitions=P,
                                  in_schema=_TF_SCHEMA)

    def _weights(g: pd.DataFrame) -> tuple[pd.DataFrame, np.ndarray]:
        """Vocab-filter one token partition and attach weights.

        A term's FULL posting list lives in this partition (rows are
        partitioned by token hash), so its df is exact here."""
        df_t = g.groupby("tok", sort=False)["id"].transform("size").to_numpy()
        mask = df_t <= max_df
        g = g[mask]
        if is_tf:
            w = g["tf"].to_numpy()
        else:
            w = g["tf"].to_numpy() * _idf(df_t[mask], n_docs)
        return g, w.astype(wdtype)

    norm_schema = pa.schema([
        ("id", pa.string()), ("n2", wfield), ("_part", pa.int64()),
    ])

    def norm_partial(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"id": [], "n2": [], "_part": []})
        g, w = _weights(g)
        if not len(g):
            return pd.DataFrame({"id": [], "n2": [], "_part": []})
        out = (
            g.assign(n2=w * w)
            .groupby("id", sort=False, as_index=False)["n2"].sum()
        )
        out["_part"] = key_partition(out["id"].to_numpy(object), P)
        return out

    pair_schema = pa.schema([
        ("id_a", pa.string()), ("id_b", pa.string()),
        ("dot", wfield), ("_part", pa.int64()),
    ])

    def pair_partial(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": [], "id_b": [], "dot": [],
                              "_part": []})
        if not len(g):
            return empty
        g, w = _weights(g)
        if not len(g):
            return empty
        g = g.assign(w=w)
        # pair stage only: df=1 terms cannot form a pair (norms above
        # already counted them)
        sz = g.groupby("tok", sort=False)["id"].transform("size")
        g = g[sz.to_numpy() >= 2]
        if not len(g):
            return empty
        m = g[["tok", "id", "w"]].merge(
            g[["tok", "id", "w"]], on="tok", suffixes=("_x", "_y"))
        m = m[m["id_x"] < m["id_y"]]
        if not len(m):
            return empty
        out = (
            m.assign(dot=m["w_x"].to_numpy() * m["w_y"].to_numpy())
            .groupby(["id_x", "id_y"], sort=False, as_index=False)["dot"]
            .sum()
            .rename(columns={"id_x": "id_a", "id_y": "id_b"})
        )
        # key by id_a: pair identity contains it, so all of one pair's
        # partials (and later its n2_a row) co-locate
        out["_part"] = key_partition(out["id_a"].to_numpy(object), P)
        return out

    normp = hash_exchange(
        [buckets], norm_partial, num_partitions=P, schema=norm_schema,
        apply_format="pandas",
    ).materialize()  # consumed by BOTH attach exchanges
    pairp = hash_exchange(
        [buckets], pair_partial, num_partitions=P, schema=pair_schema,
        apply_format="pandas",
    )

    stage_a_schema = pa.schema([
        ("id_a", pa.string()), ("id_b", pa.string()),
        ("dot", wfield), ("n2_a", wfield), ("_part", pa.int64()),
    ])

    def attach_a(pairs: pd.DataFrame, norms: pd.DataFrame) -> pd.DataFrame:
        if not len(pairs):
            return pd.DataFrame(
                {"id_a": [], "id_b": [], "dot": [], "n2_a": [],
                 "_part": []})
        dots = pairs.groupby(["id_a", "id_b"], sort=False,
                             as_index=False)["dot"].sum()
        n2 = norms.groupby("id", sort=False, as_index=False)["n2"].sum()
        m = dots.merge(n2.rename(columns={"id": "id_a", "n2": "n2_a"}),
                       on="id_a", how="inner")
        m["_part"] = key_partition(m["id_b"].to_numpy(object), P)
        return m

    stage_a = hash_exchange(
        [pairp, normp], attach_a, num_partitions=P,
        schema=stage_a_schema,
        in_schemas=[pair_schema.remove(3), norm_schema.remove(2)],
        apply_format="pandas",
    )

    if is_tf:
        out_schema = pa.schema([
            ("id_a", pa.string()), ("id_b", pa.string()),
            ("dot", pa.int64()), ("cos2_bp", pa.int64()),
        ])
    else:
        out_schema = pa.schema([
            ("id_a", pa.string()), ("id_b", pa.string()),
            ("dot", pa.float64()), ("cos_bp", pa.int64()),
        ])

    def attach_b(pairs: pd.DataFrame, norms: pd.DataFrame) -> pd.DataFrame:
        cols = ["id_a", "id_b", "dot",
                "cos2_bp" if is_tf else "cos_bp"]
        if not len(pairs):
            return pd.DataFrame({c: [] for c in cols})
        n2 = norms.groupby("id", sort=False, as_index=False)["n2"].sum()
        m = pairs.merge(n2.rename(columns={"id": "id_b", "n2": "n2_b"}),
                        on="id_b", how="inner")
        dot = m["dot"].to_numpy()
        n2a = m["n2_a"].to_numpy()
        n2b = m["n2_b"].to_numpy()
        if not is_tf:
            cos = dot / np.sqrt(n2a * n2b)
            keep = cos >= min_cos
            out = m.loc[keep, ["id_a", "id_b", "dot"]].copy()
            out["cos_bp"] = np.rint(cos[keep] * 10_000).astype(np.int64)
            return out
        # exact integer membership: float prefilter with a relative
        # margin, then Python-int arithmetic settles the (tiny) band
        lhs = dot.astype(np.float64) ** 2 * 10_000.0
        rhs = float(min_cos2_bp) * n2a.astype(np.float64) * n2b.astype(
            np.float64)
        cand = lhs >= rhs * (1.0 - 1e-9)
        if not cand.any():
            return pd.DataFrame({c: [] for c in cols})
        ci = np.flatnonzero(cand)
        keep_i, cos2 = [], []
        for i, d, a, b in zip(ci.tolist(), dot[ci].tolist(),
                              n2a[ci].tolist(), n2b[ci].tolist()):
            v = d * d * 10_000
            if v >= min_cos2_bp * a * b:
                keep_i.append(i)
                cos2.append(v // (a * b))
        out = m.iloc[keep_i][["id_a", "id_b", "dot"]].copy()
        out["cos2_bp"] = np.asarray(cos2, dtype=np.int64)
        return out

    return hash_exchange(
        [stage_a, normp], attach_b, num_partitions=P,
        schema=out_schema,
        in_schemas=[stage_a_schema.remove(4), norm_schema.remove(2)],
        apply_format="pandas",
    )


# --------------------------------------------------------------------------
# Driver queries
# --------------------------------------------------------------------------


def tf_cosine_pairs(
    sf_dir: str, *, max_df: int = 256, min_cos2_bp: int = 8100,
) -> ray.data.Dataset:
    """Driver query: exact integer TF-cosine near-dup pairs over
    web_pages — full SQL twin in ``oracles.tf_cosine_pairs_sql`` (same
    df-cut, same HUGEINT threshold predicate, same ⌊cos²·10⁴⌋)."""
    from data_dedup_ray.corpus import web_pages

    pages = web_pages(sf_dir).select_columns(["url", "text"])
    out = sparse_cosine_pairs(
        pages, id_col="url", text_col="text", weighting="tf",
        max_df=max_df, min_cos2_bp=min_cos2_bp,
    )
    return out.rename_columns(["url_a", "url_b", "dot", "cos2_bp"])


def tfidf_cosine_pairs(
    sf_dir: str, *, max_df: int = 256, min_cos: float = 0.9,
) -> ray.data.Dataset:
    """Driver query (rows-only): smoothed-idf-weighted cosine pairs.
    Float idf weighting is not exactly restatable in SQL under
    partial-sum reordering; the oracle-backed sibling is
    ``tf_cosine_pairs`` (identical exchanges and pair universe), and the
    float kernel is pinned by the numpy brute-force parity test in
    tests/test_tfidf.py."""
    from data_dedup_ray.corpus import web_pages

    pages = web_pages(sf_dir).select_columns(["url", "text"])
    out = sparse_cosine_pairs(
        pages, id_col="url", text_col="text", weighting="tfidf",
        max_df=max_df, min_cos=min_cos,
    )
    return out.rename_columns(["url_a", "url_b", "dot", "cos_bp"])
