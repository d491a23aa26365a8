"""Sequence packing: SQL-oracle parity and the tiling invariants a
training loader depends on."""

import duckdb
import numpy as np
import pandas as pd

from data_dedup_ray.pipelines import packing

SF = "/root/testdata/sf0.001"


def _got(max_len=128, **kw):
    return (packing.pack_training_sequences(SF, max_len=max_len, **kw)
            .to_pandas()
            .sort_values(["doc_id", "doc_pos"]).reset_index(drop=True))


def test_oracle_parity():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    got = _got(128)
    want = (con.execute(packing.pack_training_sequences_sql(128)).fetchdf()
            .sort_values(["doc_id", "doc_pos"]).reset_index(drop=True)
            .astype("int64"))
    pd.testing.assert_frame_equal(got, want)


def test_tiling_invariants():
    L = 128
    got = _got(L)
    # every fragment is non-empty and inside [0, L)
    assert (got["n_tokens"] > 0).all()
    assert ((got["seq_pos"] >= 0) & (got["seq_pos"] < L)).all()
    # per doc: fragments tile [0, doc token count) contiguously
    for _, g in got.groupby("doc_id"):
        g = g.sort_values("doc_pos")
        assert g["doc_pos"].iloc[0] == 0
        assert (g["doc_pos"].to_numpy()[1:] ==
                (g["doc_pos"] + g["n_tokens"]).to_numpy()[:-1]).all()
    # per sequence: fragments tile [0, L) exactly (except the last seq)
    per_seq = got.groupby("seq_id")["n_tokens"].sum()
    last = got["seq_id"].max()
    assert (per_seq.drop(index=last) == L).all()
    assert per_seq[last] <= L
    # straddling happens at this L (docs are longer than 128 tokens)
    assert (got.groupby("doc_id").size() > 1).any()


def test_partition_invariance():
    a = _got(96, num_partitions=4)
    b = _got(96, num_partitions=32)
    pd.testing.assert_frame_equal(a, b)
