"""Distributed BPE merge learning: exact golden parity with a pure-Python
Sennrich reference, learn→apply integration, and determinism."""

import re
from collections import Counter

import duckdb
import pandas as pd
import pytest

from data_dedup_ray.pipelines import bpe_train
from data_dedup_ray.pipelines.text import BPE_PATTERN

SF = "/root/testdata/sf0.001"


def _reference_learn(texts, n_merges, min_count):
    """Sennrich et al. 2016 §3.2, tie-break (max count, lexicographic)."""
    pre = re.compile(BPE_PATTERN)
    vocab = Counter()
    for s in texts:
        vocab.update(pre.findall(s))
    segs = {w: list(w) for w in vocab}
    merges = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for w, c in vocab.items():
            seg = segs[w]
            for i in range(len(seg) - 1):
                pairs[(seg[i], seg[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        if n < min_count:
            break
        merges.append((rank, a, b, n))
        for w, seg in segs.items():
            out, i = [], 0
            while i < len(seg):
                if i < len(seg) - 1 and seg[i] == a and seg[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(seg[i])
                    i += 1
            segs[w] = out
    return merges


@pytest.fixture(scope="module")
def corpus_texts():
    return duckdb.sql(
        f"SELECT text FROM '{SF}/documents.parquet'"
    ).fetchdf()["text"].tolist()


def test_learn_matches_reference(corpus_texts):
    got = bpe_train.learn_bpe_merges(SF, n_merges=12)
    want = _reference_learn(corpus_texts, 12, 2)
    assert list(map(tuple, got.to_records(index=False))) == want
    assert len(want) == 12  # non-vacuous: the corpus supports 12 merges


def test_learn_partition_invariance():
    a = bpe_train.learn_bpe_merges(SF, n_merges=6, num_partitions=4)
    b = bpe_train.learn_bpe_merges(SF, n_merges=6, num_partitions=32)
    pd.testing.assert_frame_equal(a, b)


def test_learned_merges_apply(corpus_texts):
    """learn → apply: merged counts are strictly below the char count and
    equal a direct reference tokenization with the same merges."""
    got = bpe_train.learned_bpe_token_counts(SF, n_merges=8).to_pandas()
    merges = [(m[1], m[2])
              for m in _reference_learn(corpus_texts, 8, 2)]
    pre = re.compile(BPE_PATTERN)

    ranks = {p: i for i, p in enumerate(merges)}

    def ref_count(s):
        # mirrors text._BPEMergeCounter._merged_len exactly: repeatedly
        # merge the lowest-ranked pair present (an early merge can
        # re-apply if a later one recreates its context)
        total = 0
        for piece in pre.findall(s):
            seg = list(piece)
            while len(seg) > 1:
                cand = [(ranks[(seg[i], seg[i + 1])], i)
                        for i in range(len(seg) - 1)
                        if (seg[i], seg[i + 1]) in ranks]
                if not cand:
                    break
                r = min(cand)[0]
                a, b = merges[r]
                out, i = [], 0
                while i < len(seg):
                    if i < len(seg) - 1 and seg[i] == a and seg[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(seg[i])
                        i += 1
                seg = out
            total += len(seg)
        return total

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'").fetchdf()
    want = {d: ref_count(t) for d, t in zip(docs["doc_id"], docs["text"])}
    got_d = dict(zip(got["doc_id"], got["n_merged_tokens"]))
    assert got_d == want
