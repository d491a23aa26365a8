"""Exact distributed heavy-hitter tokens via mergeable Misra-Gries sketches.

Finds every token whose occurrence count exceeds a phi = 1/inv_phi
fraction of the corpus' total token count, with EXACT counts — without
ever shuffling the full vocabulary (the thing ``text.top_terms`` must do,
which at web scale means shipping billions of distinct terms).

Two streaming passes over the corpus:

1. **Sketch pass** — each batch builds a Misra-Gries summary of capacity
   m = inv_phi by taking its exact token counts and trimming: subtract
   the (m+1)-th largest count from all, keep positives (the `trim`
   operation of Agarwal et al., "Mergeable Summaries", PODS 2012, §3).
   Summed across batches (a hash exchange over ≤ m rows per batch), a
   token with true count > W/m keeps a positive estimate, and its
   estimate exceeds W/(m(m+1)) — so pruning the merged summary at that
   bound yields a CANDIDATE SET of at most m(m+1) tokens regardless of
   corpus size (Markov bound on total summary weight).  Recall is 1.0
   by construction.
2. **Verify pass** — the bounded candidate set is broadcast once via
   ``ray.put``; each batch counts exact occurrences of candidates only,
   a second tiny exchange sums them, and the exact integer predicate
   ``count · inv_phi > W`` keeps the true heavy hitters.

Tokenizer parity with ``text.top_terms`` / the SQL oracle:
``[a-z0-9]+`` over lowercased text."""

from __future__ import annotations

import numpy as np
import pandas as pd
import polars as pl  # module-level: workers import it once, serially
import pyarrow as pa
import pyarrow.compute as pc
import ray

from data_dedup_ray.engine.exchange import hash_exchange

#: sentinel row carrying each batch's total token count through the same
#: exchange as the summaries (the tokenizer can never emit an empty term)
_W_KEY = ""


def _batch_counts(texts: pa.ChunkedArray):
    """(terms object-array, counts int64-array, total tokens) — exact,
    vectorized through polars (no per-token Python objects)."""
    s = (pl.from_arrow(texts) if isinstance(
             texts, (pa.Array, pa.ChunkedArray))
         else pl.Series(texts, dtype=pl.Utf8)).str.to_lowercase()
    toks = s.str.extract_all(r"[a-z0-9]+").explode().drop_nulls()
    w = len(toks)
    if not w:
        return np.empty(0, dtype=object), np.empty(0, np.int64), 0
    vc = toks.value_counts()
    cols = vc.columns  # [value_col, "count"]
    return (vc[cols[0]].to_numpy().astype(object),
            vc["count"].to_numpy().astype(np.int64), w)


def heavy_hitter_tokens(
    sf_dir: str, *, inv_phi: int = 2000, num_partitions: int = 16,
) -> ray.data.Dataset:
    """``(term, n_occurrences)`` for every token with
    ``n_occurrences * inv_phi > total_token_count`` — exact counts,
    exact membership, candidate state bounded by m(m+1) tokens."""
    m = inv_phi
    P = num_partitions
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )

    def sketch(t: pa.Table) -> pa.Table:
        terms, counts, w = _batch_counts(t["text"])
        if len(terms) > m:
            # Misra-Gries trim: estimates undercount by ≤ the (m+1)-th
            # largest batch count; at most m survive
            thr = np.partition(counts, len(counts) - (m + 1))[-(m + 1)]
            keep = counts > thr
            terms, counts = terms[keep], counts[keep] - thr
        terms = np.concatenate([terms, np.asarray([_W_KEY], dtype=object)])
        counts = np.concatenate([counts, np.asarray([w], dtype=np.int64)])
        part = (pd.util.hash_array(terms) % np.uint64(P)).astype(np.int64)
        return pa.table({
            "term": pa.array(terms, pa.string()),
            "est": pa.array(counts),
            "_part": pa.array(part),
        })

    def combine(t: pa.Table) -> pa.Table:
        return (t.group_by(["term", "_part"]).aggregate([("est", "sum")])
                .rename_columns(["term", "_part", "est"]))

    def merge_part(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("term", sort=False, as_index=False)["est"].sum()

    merged = hash_exchange(
        [docs.map_batches(sketch, batch_format="pyarrow")],
        merge_part,
        num_partitions=P,
        schema=pa.schema([("term", pa.string()), ("est", pa.int64())]),
        in_schemas=[pa.schema([("term", pa.string()), ("est", pa.int64())])],
        pre=[combine],
    ).materialize()

    wrow = merged.map_batches(
        lambda t: t.filter(pc.equal(t["term"], _W_KEY)),
        batch_format="pyarrow",
    ).to_pandas()
    if not len(wrow):
        return ray.data.from_arrow(pa.table({
            "term": pa.array([], pa.string()),
            "n_occurrences": pa.array([], pa.int64()),
        }))
    w_total = int(wrow["est"].iloc[0])

    # candidate prune: a true heavy hitter's merged estimate exceeds
    # W/(m(m+1)) — integer-exact as est > W // (m(m+1)) (floor-division
    # form avoids the est·m·(m+1) int64 overflow at 100 TB token counts
    # and keeps strictly MORE candidates, so recall is unaffected).
    # ≤ ~m(m+1) rows pass (Markov bound on total summary weight).
    cand_floor = w_total // (m * (m + 1))
    cand = merged.map_batches(
        lambda t: t.filter(pc.and_(
            pc.not_equal(t["term"], _W_KEY),
            pc.greater(t["est"], cand_floor))),
        batch_format="pyarrow",
    ).to_pandas()
    # an all-empty exchange can round-trip to a column-less DataFrame
    cand_set = frozenset(cand["term"].tolist()) if len(cand) else frozenset()
    ref = ray.put(cand_set)

    def exact(t: pa.Table) -> pa.Table:
        cs = ray.get(ref)
        terms, counts, _ = _batch_counts(t["text"])
        if len(terms):
            keep = pd.Index(terms).isin(cs)
            terms, counts = terms[keep], counts[keep]
        part = (pd.util.hash_array(terms) % np.uint64(P)).astype(np.int64)
        return pa.table({
            "term": pa.array(terms, pa.string()),
            "n": pa.array(counts),
            "_part": pa.array(part),
        })

    def combine2(t: pa.Table) -> pa.Table:
        return (t.group_by(["term", "_part"]).aggregate([("n", "sum")])
                .rename_columns(["term", "_part", "n"]))

    # n·inv_phi > W ⟺ n > W // inv_phi for integers (exact, overflow-free)
    hh_floor = w_total // inv_phi

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("term", sort=False, as_index=False)["n"].sum()
        out = out.loc[out["n"] > hh_floor]
        return out.rename(columns={"n": "n_occurrences"})

    return hash_exchange(
        [docs.map_batches(exact, batch_format="pyarrow")],
        fin,
        num_partitions=P,
        schema=pa.schema([("term", pa.string()),
                          ("n_occurrences", pa.int64())]),
        in_schemas=[pa.schema([("term", pa.string()), ("n", pa.int64())])],
        pre=[combine2],
    )


def heavy_hitter_tokens_sql(inv_phi: int = 2000) -> str:
    return f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents),
tot AS (SELECT count(*) AS w FROM toks)
SELECT term, count(*) AS n_occurrences
FROM toks, tot
GROUP BY term, tot.w
HAVING count(*) * {inv_phi} > tot.w"""
