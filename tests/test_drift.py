"""Cross-crawl token-distribution drift: exact integer TV distance,
OOV mass, vocabulary overlap — HUGEINT SQL twin."""

import duckdb
import pandas as pd
import pyarrow as pa
import ray.data

from data_dedup_ray.corpus import web_pages
from data_dedup_ray.pipelines import drift, snapshots

SF = "/root/testdata/sf0.001"


def _docs(texts):
    return ray.data.from_arrow(pa.table({"text": texts}))


def _drift(a, b, P=4):
    return drift.crawl_drift(_docs(a), _docs(b),
                             num_partitions=P).to_pandas().iloc[0]


def _brute(a_texts, b_texts):
    import re
    from collections import Counter
    ca = Counter(t for s in a_texts for t in re.findall("[a-z0-9]+", s))
    cb = Counter(t for s in b_texts for t in re.findall("[a-z0-9]+", s))
    na, nb = sum(ca.values()), sum(cb.values())
    toks = set(ca) | set(cb)
    tv = sum(abs(ca[t] * nb - cb[t] * na) for t in toks)
    oov = sum(cb[t] for t in toks if t not in ca)
    return {
        "n_tokens_a": na, "n_tokens_b": nb,
        "vocab_a": len(ca), "vocab_b": len(cb),
        "vocab_shared": len(set(ca) & set(cb)),
        "new_vocab_b": len(set(cb) - set(ca)),
        "oov_mass_b_bp": 10000 * oov // max(nb, 1),
        "tv_bp": 10000 * tv // max(2 * na * nb, 1),
    }


def test_identical_crawls_zero_drift():
    texts = ["the cat sat", "on the mat", "a dog ran"]
    m = _drift(texts, texts)
    assert m.tv_bp == 0 and m.oov_mass_b_bp == 0 and m.new_vocab_b == 0
    assert m.vocab_a == m.vocab_b == m.vocab_shared


def test_disjoint_vocabulary_max_drift():
    m = _drift(["alpha beta gamma"], ["delta epsilon zeta"])
    assert m.tv_bp == 10000 and m.oov_mass_b_bp == 10000
    assert m.vocab_shared == 0 and m.new_vocab_b == 3


def test_brute_force_parity():
    a = ["the cat sat on the mat", "dogs chase cats", "x1 y2 z3"]
    b = ["the cat sat", "birds chase worms worms", "x1 x1 new tokens"]
    m = _drift(a, b)
    exp = _brute(a, b)
    for k, want in exp.items():
        assert m[k] == want, (k, m[k], want)


def test_empty_b_side():
    m = _drift(["some tokens here"], [""])
    assert (m.n_tokens_b, m.vocab_b, m.oov_mass_b_bp) == (0, 0, 0)
    # TV against an empty side degenerates: every |c_a*0 - 0*na| = 0,
    # so the integer definition reports 0 rather than dividing by zero
    assert m.tv_bp == 0 and m.vocab_a == 3


def test_corpus_matches_sql_oracle():
    got = drift.crawl_drift(
        web_pages(SF), snapshots.snapshot2(SF)).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    exp = con.execute(drift.crawl_drift_sql()).df()
    pd.testing.assert_frame_equal(
        got.sort_index(axis=1).astype(str),
        exp.sort_index(axis=1).astype(str))
    # re-crawl of a subset with trailing edits: low but nonzero drift
    m = got.iloc[0]
    assert 0 < m.tv_bp < 5000 and m.vocab_shared > 0


def test_partition_invariance():
    a, b = web_pages(SF), snapshots.snapshot2(SF)
    x = drift.crawl_drift(a, b, num_partitions=1).to_pandas()
    y = drift.crawl_drift(a, b, num_partitions=16).to_pandas()
    pd.testing.assert_frame_equal(x, y)


def _ldocs(rows):
    return ray.data.from_arrow(pa.table({
        "lang": [l for l, _ in rows], "text": [t for _, t in rows]}))


def test_by_lang_matches_sql_oracle():
    got = drift.crawl_drift_by_lang(
        web_pages(SF), snapshots.snapshot2(SF)
    ).to_pandas().sort_values("lang").reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    exp = con.execute(drift.crawl_drift_by_lang_sql()).df(
    ).sort_values("lang").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.sort_index(axis=1).astype(str),
        exp.sort_index(axis=1).astype(str))
    assert len(got) >= 2  # multilingual corpus: several shards graded


def test_by_lang_one_sided_language():
    a = _ldocs([("en", "the cat"), ("de", "der hund")])
    b = _ldocs([("en", "the cat"), ("fr", "le chat")])
    m = drift.crawl_drift_by_lang(a, b, num_partitions=4).to_pandas(
    ).set_index("lang")
    assert m.loc["en"].tv_bp == 0 and m.loc["en"].oov_mass_b_bp == 0
    # de vanished: nb=0 -> degenerate TV 0, vocab_b 0
    assert m.loc["de"].n_tokens_b == 0 and m.loc["de"].vocab_b == 0
    # fr is brand new: all of b's mass is OOV
    assert m.loc["fr"].oov_mass_b_bp == 10000
    assert m.loc["fr"].n_tokens_a == 0


def test_by_lang_totals_sum_to_aggregate():
    a, b = web_pages(SF), snapshots.snapshot2(SF)
    per = drift.crawl_drift_by_lang(a, b).to_pandas()
    agg = drift.crawl_drift(a, b).to_pandas().iloc[0]
    assert per.n_tokens_a.sum() == agg.n_tokens_a
    assert per.n_tokens_b.sum() == agg.n_tokens_b


def test_freq_table_is_usable_standalone():
    v = drift.token_freq_table(
        _docs(["a b b"]), _docs(["b c"]), num_partitions=4).to_pandas()
    assert len(v) == 3
    assert set(v.columns) == {"tok", "c_a", "c_b"}
    assert v["c_a"].sum() == 3 and v["c_b"].sum() == 2


def test_incremental_drift_equals_live_and_store_layout():
    import json
    import os
    import shutil

    vs = "/tmp/test_vocab_store"
    shutil.rmtree(vs, ignore_errors=True)
    drift.build_vocab_store(web_pages(SF), vs)
    got = drift.incremental_drift(snapshots.snapshot2(SF), vs
                                  ).to_pandas()
    live = drift.crawl_drift(web_pages(SF), snapshots.snapshot2(SF)
                             ).to_pandas()
    pd.testing.assert_frame_equal(got, live)
    # store lineage records the tier kind
    part = [d for d in os.listdir(vs) if d.startswith("part=")][0]
    meta = json.load(open(os.path.join(vs, part, "_META.json")))
    assert meta["config"]["kind"] == "vocab_store"
    # the store is vocabulary-sized: distinct token hashes, exact counts
    from data_dedup_ray.pipelines.fpstore import _read_store
    v = _read_store([vs]).to_pandas()
    assert v["tok"].is_unique
    assert v["c"].sum() == live.iloc[0].n_tokens_a


def test_by_lang_null_lang_becomes_und():
    """NULL langs must not be silently dropped (pandas groupby dropna);
    both sides normalize to 'und'."""
    a = ray.data.from_arrow(pa.table({
        "lang": pa.array(["en", None], pa.string()),
        "text": ["the cat", "mystery words here"]}))
    b = ray.data.from_arrow(pa.table({
        "lang": pa.array([None], pa.string()),
        "text": ["mystery words here"]}))
    m = drift.crawl_drift_by_lang(a, b, num_partitions=2).to_pandas(
    ).set_index("lang")
    assert "und" in m.index
    assert m.loc["und"].n_tokens_a == 3 and m.loc["und"].n_tokens_b == 3
    assert m.loc["und"].tv_bp == 0


def test_dedup_drift_matches_sql_and_laws():
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    got = drift.dedup_drift(SF).to_pandas()
    want = con.execute(drift.dedup_drift_sql()).fetchdf()
    pd.testing.assert_frame_equal(got.sort_index(axis=1),
                                  want.sort_index(axis=1),
                                  check_dtype=False)
    r = got.iloc[0]
    # survivors ⊆ corpus: nothing new can appear, and dedup removed
    # real token mass on this planted-duplicate corpus
    assert r["new_vocab_b"] == 0 and r["oov_mass_b_bp"] == 0
    assert r["vocab_b"] <= r["vocab_a"]
    assert 0 < r["n_tokens_b"] < r["n_tokens_a"]
    assert r["tv_bp"] > 0


def test_dedup_drift_partition_invariance():
    outs = [drift.dedup_drift(SF, num_partitions=p).to_pandas()
            for p in (3, 8)]
    pd.testing.assert_frame_equal(outs[0], outs[1])
