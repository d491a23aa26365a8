"""Per-doc shingle novelty vs a reference corpus: exact integer rate,
posting-exchange scale shape, string-shingle SQL twin."""

import duckdb
import pandas as pd
import pyarrow as pa
import ray.data

from data_dedup_ray.corpus import web_pages
from data_dedup_ray.pipelines import novelty, snapshots

SF = "/root/testdata/sf0.001"


def _docs(rows):
    return ray.data.from_arrow(pa.table({
        "url": [u for u, _ in rows], "text": [t for _, t in rows]}))


def _brute(new, ref, k=5):
    import re

    def sh(text):
        t = re.findall("[a-z0-9]+", text)
        return {" ".join(t[i:i + k]) for i in range(len(t) - k + 1)}

    rset = set()
    for _, t in ref:
        rset |= sh(t)
    out = {}
    for u, t in new:
        s = sh(t)
        if s:
            nn = len(s - rset)
            out[u] = (len(s), nn, 10000 * nn // len(s))
    return out


def test_micro_brute_force_parity():
    new = [("n1", "a b c d e f g"),          # shares a prefix with ref
           ("n2", "z1 z2 z3 z4 z5 z6"),      # fully novel
           ("n3", "a b c d e"),              # exactly one shingle, seen
           ("n4", "too short")]              # no shingles -> no row
    ref = [("r1", "a b c d e x y")]
    got = novelty.doc_novelty(_docs(new), _docs(ref),
                              num_partitions=4).to_pandas()
    exp = _brute(new, ref)
    assert set(got.url) == set(exp)
    for _, r in got.iterrows():
        assert (r.n_shingles, r.n_novel, r.novelty_bp) == exp[r.url]
    assert "n4" not in set(got.url)


def test_fully_novel_and_fully_seen():
    ref = [("r", "the quick brown fox jumps over the lazy dog")]
    got = novelty.doc_novelty(
        _docs([("same", "the quick brown fox jumps"),
               ("new", "completely different words appear here now")]),
        _docs(ref), num_partitions=2).to_pandas().set_index("url")
    assert got.loc["same"].novelty_bp == 0
    assert got.loc["new"].novelty_bp == 10000


def test_corpus_matches_sql_oracle():
    got = novelty.doc_novelty(
        snapshots.snapshot2(SF), web_pages(SF)
    ).to_pandas().sort_values("url").reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    exp = con.execute(novelty.doc_novelty_sql()).df(
    ).sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.sort_index(axis=1).astype(str),
        exp.sort_index(axis=1).astype(str))
    # re-crawl semantics: byte-identical captures score 0, trailing-edit
    # captures score low-but-nonzero
    assert (got.novelty_bp == 0).any() and (got.novelty_bp > 0).any()
    assert got.novelty_bp.max() < 5000


def test_partition_invariance():
    a, b = snapshots.snapshot2(SF), web_pages(SF)
    x = novelty.doc_novelty(a, b, num_partitions=1).to_pandas(
    ).sort_values("url").reset_index(drop=True)
    y = novelty.doc_novelty(a, b, num_partitions=16).to_pandas(
    ).sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(x, y)


def test_empty_reference_everything_novel():
    got = novelty.doc_novelty(
        _docs([("u", "one two three four five six")]),
        _docs([]), num_partitions=2).to_pandas()
    assert len(got) == 1 and got.iloc[0].novelty_bp == 10000


def test_incremental_novelty_equals_live():
    import shutil

    from data_dedup_ray.pipelines import index

    ss = "/tmp/test_novelty_shstore"
    shutil.rmtree(ss, ignore_errors=True)
    index.build_shingle_store(web_pages(SF), ss)
    got = novelty.incremental_novelty(snapshots.snapshot2(SF), ss
                                      ).to_pandas().sort_values("url"
                                      ).reset_index(drop=True)
    live = novelty.doc_novelty(snapshots.snapshot2(SF), web_pages(SF)
                               ).to_pandas().sort_values("url"
                               ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, live)
