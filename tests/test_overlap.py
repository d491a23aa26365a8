"""Corpus overlap matrix: pairwise exact-content Jaccard/containment
between sources, additive per-partition set counts, SQL twin."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from data_dedup_ray.corpus import web_pages
from data_dedup_ray.pipelines import overlap, snapshots

SF = "/root/testdata/sf0.001"


def _src(name, texts):
    return (name, ray.data.from_arrow(pa.table({
        "url": [f"{name}/{i}" for i in range(len(texts))],
        "text": texts})))


def test_micro_exact_counts():
    a = _src("a", ["x", "y", "z", "z"])          # 3 distinct
    b = _src("b", ["y", "z", "w"])               # 3 distinct, 2 shared
    m = overlap.corpus_overlap([a, b], num_partitions=4
                               ).to_pandas().iloc[0]
    assert (m.n_a, m.n_b, m.n_inter, m.n_union) == (3, 3, 2, 4)
    assert m.jaccard_bp == 10000 * 2 // 4
    assert m.containment_a_bp == 10000 * 2 // 3


def test_disjoint_and_identical():
    a = _src("a", ["p", "q"])
    b = _src("b", ["r", "s"])
    c = _src("c", ["p", "q"])
    df = overlap.corpus_overlap([a, b, c], num_partitions=2
                                ).to_pandas().set_index(
        ["source_a", "source_b"])
    assert df.loc[("a", "b")].jaccard_bp == 0
    assert df.loc[("a", "c")].jaccard_bp == 10000
    assert df.loc[("a", "c")].containment_a_bp == 10000


def test_single_source_rejected():
    with pytest.raises(ValueError):
        overlap.corpus_overlap([_src("a", ["x"])])


def test_corpus_matches_sql_oracle():
    got = overlap.corpus_overlap(
        [("s1", web_pages(SF)), ("s2", snapshots.snapshot2(SF)),
         ("s3", snapshots.snapshot3(SF))]
    ).to_pandas().sort_values(["source_a", "source_b"]
                              ).reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    exp = con.execute(overlap.corpus_overlap_sql()).df(
    ).sort_values(["source_a", "source_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.sort_index(axis=1).astype(str),
        exp.sort_index(axis=1).astype(str))
    # snapshot2 is a re-crawl subset: half its captures byte-identical
    # to s1 (doc_id%6 of the %3 revisits)
    m = got.set_index(["source_a", "source_b"]).loc[("s1", "s2")]
    assert 4500 < m.containment_b_bp < 5500


def test_partition_invariance():
    srcs = [("s1", web_pages(SF)), ("s2", snapshots.snapshot2(SF))]
    x = overlap.corpus_overlap(srcs, num_partitions=1).to_pandas()
    y = overlap.corpus_overlap(srcs, num_partitions=16).to_pandas()
    pd.testing.assert_frame_equal(x, y)
