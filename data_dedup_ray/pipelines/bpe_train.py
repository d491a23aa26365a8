"""Distributed BPE merge LEARNING (Sennrich et al. 2016, §3.2) on Ray Data.

Completes the repo's tokenizer story: ``learn_bpe_merges`` fits a ranked
merges table on the corpus, ``text.bpe_merged_token_counts`` applies it
(the two share the same pretokenizer and the same (left, right) merge
convention, so learned output plugs straight into ``_BPEMergeCounter``).

Scale shape — the classic trick is that BPE learns over the DISTINCT
pretoken (word) table weighted by frequency, which is vocabulary-sized,
not corpus-sized:

1. ONE corpus pass builds the word-frequency table through a hash
   exchange (polars pretokenizer, per-batch value_counts combiner — the
   corpus text never enters the loop).
2. Each merge round is ONE tiny exchange over the word table: per-batch
   weighted adjacent-pair counts (Python loop bounded by DISTINCT words
   per batch — the standard learner shape), per-partition top-1, P rows
   to the driver for the global argmax (deterministic tie-break: max
   count, then lexicographically smallest pair), then a broadcast
   re-segmentation touching only words that contain the winning pair.

Iterative (n_merges driver-coordinated rounds, like curation's Lloyd
iterations) — not SQL-expressible, so the driver record is rows-only and
correctness is pinned by an exact golden test against a pure-Python
Sennrich reference in tests/test_bpe_train.py."""

from __future__ import annotations

import numpy as np
import pandas as pd
import polars as pl  # module-level: workers import it once, serially
import pyarrow as pa
import ray

from data_dedup_ray.engine.exchange import hash_exchange

#: same pretokenizer as text.bpe_token_counts / bpe_merged_token_counts
from data_dedup_ray.pipelines.text import BPE_PATTERN


def _word_counts(sf_dir: str, num_partitions: int) -> ray.data.Dataset:
    """(word, count) over the corpus' pretokenizer pieces — the only
    corpus-sized pass in the learner."""
    P = num_partitions
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )

    def partial(t: pa.Table) -> pa.Table:
        s = pl.from_arrow(t["text"].combine_chunks())
        toks = s.str.extract_all(BPE_PATTERN).explode().drop_nulls()
        if not len(toks):
            return pa.table({
                "word": pa.array([], pa.string()),
                "count": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64()),
            })
        vc = toks.value_counts()
        words = vc[vc.columns[0]].to_numpy().astype(object)
        n = vc["count"].to_numpy().astype(np.int64)
        part = (pd.util.hash_array(words) % np.uint64(P)).astype(np.int64)
        return pa.table({"word": pa.array(words, pa.string()),
                         "count": pa.array(n),
                         "_part": pa.array(part)})

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("word", sort=False, as_index=False)["count"].sum()

    return hash_exchange(
        [docs.map_batches(partial, batch_format="pyarrow")],
        fin,
        num_partitions=P,
        schema=pa.schema([("word", pa.string()), ("count", pa.int64())]),
        in_schemas=[pa.schema([("word", pa.string()),
                               ("count", pa.int64())])],
    )


def _merge_word(seg: list, a: str, b: str) -> list:
    """Merge every (a, b) adjacency, leftmost first — the exact step
    text._BPEMergeCounter applies, so learn and apply agree."""
    out, i = [], 0
    while i < len(seg):
        if i < len(seg) - 1 and seg[i] == a and seg[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(seg[i])
            i += 1
    return out


def learn_bpe_merges(
    sf_dir: str, *, n_merges: int = 16, min_count: int = 2,
    num_partitions: int = 16,
) -> pd.DataFrame:
    """``(rank, left, right, pair_count)`` — the learned ranked merges.

    Stops early when no pair reaches ``min_count``.  The returned frame
    is merges-table-sized (the model, not data) — the only thing the
    driver ever holds besides each round's P partial-argmax rows."""
    P = num_partitions
    words = _word_counts(sf_dir, P).map_batches(
        lambda t: t.append_column(
            "seg", pa.array([list(w) for w in t["word"].to_pylist()],
                            pa.list_(pa.string()))),
        batch_format="pyarrow",
    ).materialize()

    merges: list[dict] = []
    for rank in range(n_merges):
        def pair_partial(t: pa.Table) -> pa.Table:
            counts = t["count"].to_numpy(zero_copy_only=False)
            agg: dict = {}
            for c, seg in zip(counts, t["seg"].to_pylist()):
                for i in range(len(seg) - 1):
                    k = (seg[i], seg[i + 1])
                    agg[k] = agg.get(k, 0) + c
            if not agg:
                return pa.table({
                    "left": pa.array([], pa.string()),
                    "right": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "_part": pa.array([], pa.int64()),
                })
            left = np.asarray([k[0] for k in agg], dtype=object)
            right = np.asarray([k[1] for k in agg], dtype=object)
            n = np.fromiter(agg.values(), np.int64, len(agg))
            h = pd.util.hash_array(
                np.asarray([a + "\x1f" + b for a, b in agg], dtype=object))
            return pa.table({
                "left": pa.array(left, pa.string()),
                "right": pa.array(right, pa.string()),
                "n": pa.array(n),
                "_part": pa.array((h % np.uint64(P)).astype(np.int64)),
            })

        def top1(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby(["left", "right"], sort=False,
                           as_index=False)["n"].sum()
            if not len(g):
                return g
            # deterministic partition champion: max n, then lexicographic
            g = g.sort_values(["n", "left", "right"],
                              ascending=[False, True, True])
            return g.head(1)

        champs = hash_exchange(
            [words.map_batches(pair_partial, batch_format="pyarrow")],
            top1,
            num_partitions=P,
            schema=pa.schema([("left", pa.string()), ("right", pa.string()),
                              ("n", pa.int64())]),
            in_schemas=[pa.schema([("left", pa.string()),
                                   ("right", pa.string()),
                                   ("n", pa.int64())])],
        ).to_pandas()  # exactly ≤ P rows
        if not len(champs):
            break
        champs = champs.sort_values(["n", "left", "right"],
                                    ascending=[False, True, True])
        best = champs.iloc[0]
        if int(best["n"]) < min_count:
            break
        a, b = str(best["left"]), str(best["right"])
        merges.append({"rank": rank, "left": a, "right": b,
                       "pair_count": int(best["n"])})

        def reseg(t: pa.Table) -> pa.Table:
            segs = t["seg"].to_pylist()
            out = [
                _merge_word(s, a, b)
                if any(s[i] == a and s[i + 1] == b
                       for i in range(len(s) - 1)) else s
                for s in segs
            ]
            return pa.table({
                "word": t["word"].combine_chunks(),
                "count": t["count"].combine_chunks(),
                "seg": pa.array(out, pa.list_(pa.string())),
            })

        words = words.map_batches(reseg,
                                  batch_format="pyarrow").materialize()

    return pd.DataFrame(
        merges, columns=["rank", "left", "right", "pair_count"]
    ).astype({"rank": "int64", "pair_count": "int64"})


def learned_bpe_token_counts(
    sf_dir: str, *, n_merges: int = 16, min_count: int = 2,
) -> ray.data.Dataset:
    """End-to-end tokenizer pipeline: learn the merges on the corpus,
    then apply them with the serving tokenizer (text._BPEMergeCounter)."""
    from data_dedup_ray.pipelines import text

    m = learn_bpe_merges(sf_dir, n_merges=n_merges, min_count=min_count)
    table = list(zip(m["left"], m["right"]))
    return text.bpe_merged_token_counts(sf_dir, merges=table)
