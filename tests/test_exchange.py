"""Unit tests for the sortless coarse hash exchange (engine/exchange.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from data_dedup_ray.engine.exchange import bucketize, hash_exchange


def _tagged(df: pd.DataFrame, P: int, key: str) -> ray.data.Dataset:
    df = df.copy()
    df["_part"] = (
        pd.util.hash_pandas_object(df[key], index=False).to_numpy()
        % np.uint64(P)
    ).astype(np.int64)
    return ray.data.from_pandas(df).repartition(3)


def test_exchange_colocates_equal_keys(ray_session):
    P = 8
    df = pd.DataFrame({"k": [f"k{i % 5}" for i in range(100)],
                       "v": np.arange(100, dtype=np.int64)})
    out = hash_exchange(
        [_tagged(df, P, "k")],
        lambda g: g.groupby("k", sort=False, as_index=False)["v"].sum(),
        num_partitions=P,
        schema=pa.schema([("k", pa.string()), ("v", pa.int64())]),
        in_schemas=[pa.schema([("k", pa.string()), ("v", pa.int64())])],
    ).to_pandas().sort_values("k").reset_index(drop=True)
    want = df.groupby("k", as_index=False)["v"].sum().sort_values(
        "k").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, want)


def test_exchange_multi_input_alignment(ray_session):
    P = 4
    left = pd.DataFrame({"k": ["a", "b", "c"], "x": [1, 2, 3]})
    right = pd.DataFrame({"k": ["b", "c", "d"], "y": [20, 30, 40]})

    def join(lg, rg):
        return lg.merge(rg, on="k", how="inner")

    out = hash_exchange(
        [_tagged(left, P, "k"), _tagged(right, P, "k")],
        join,
        num_partitions=P,
        schema=pa.schema([("k", pa.string()), ("x", pa.int64()),
                          ("y", pa.int64())]),
        in_schemas=[pa.schema([("k", pa.string()), ("x", pa.int64())]),
                    pa.schema([("k", pa.string()), ("y", pa.int64())])],
    ).to_pandas().sort_values("k").reset_index(drop=True)
    assert out["k"].tolist() == ["b", "c"]
    assert out["x"].tolist() == [2, 3] and out["y"].tolist() == [20, 30]


def test_exchange_empty_input_keeps_schema(ray_session):
    P = 4
    empty = pd.DataFrame({"k": pd.Series(dtype=object),
                          "x": pd.Series(dtype=np.int64)})
    full = pd.DataFrame({"k": ["a"], "y": [np.int64(7)]})

    def join(lg, rg):
        # the empty side must still expose its columns
        assert list(lg.columns) == ["k", "x"]
        return rg

    out = hash_exchange(
        [_tagged(empty, P, "k") if len(empty) else
         ray.data.from_arrow(pa.table({"k": pa.array([], type=pa.string()),
                                       "x": pa.array([], type=pa.int64()),
                                       "_part": pa.array([], type=pa.int64())})),
         _tagged(full, P, "k")],
        join,
        num_partitions=P,
        schema=pa.schema([("k", pa.string()), ("y", pa.int64())]),
        in_schemas=[pa.schema([("k", pa.string()), ("x", pa.int64())]),
                    pa.schema([("k", pa.string()), ("y", pa.int64())])],
    ).to_pandas()
    assert out["k"].tolist() == ["a"] and out["y"].tolist() == [7]


def test_exchange_arrow_apply_format(ray_session):
    P = 4
    df = pd.DataFrame({"k": ["a", "a", "b"], "v": [1, 2, 3]})

    def distinct_k(t: pa.Table) -> pa.Table:
        return t.group_by(["k"]).aggregate([("v", "sum")]).rename_columns(
            ["k", "v"]
        )

    out = hash_exchange(
        [_tagged(df, P, "k")],
        distinct_k,
        num_partitions=P,
        schema=pa.schema([("k", pa.string()), ("v", pa.int64())]),
        in_schemas=[pa.schema([("k", pa.string()), ("v", pa.int64())])],
        apply_format="pyarrow",
    ).to_pandas().sort_values("k").reset_index(drop=True)
    assert out["k"].tolist() == ["a", "b"]
    assert out["v"].tolist() == [3, 3]


def test_bucketed_reuse_across_rounds(ray_session):
    """One bucketize split serves two exchanges keyed on the same hash
    (the verify-join pattern: shingle table read by rounds A and B)."""
    P = 4
    right = pd.DataFrame({"k": ["a", "b", "c", "d"],
                          "y": np.array([10, 20, 30, 40], dtype=np.int64)})
    right_schema = pa.schema([("k", pa.string()), ("y", pa.int64())])
    buckets = bucketize(
        _tagged(right, P, "k"), num_partitions=P, in_schema=right_schema
    )
    assert buckets.P == P

    def run(left: pd.DataFrame) -> pd.DataFrame:
        return hash_exchange(
            [_tagged(left, P, "k"), buckets],
            lambda lg, rg: lg.merge(rg, on="k", how="inner"),
            num_partitions=P,
            schema=pa.schema([("k", pa.string()), ("x", pa.int64()),
                              ("y", pa.int64())]),
            in_schemas=[pa.schema([("k", pa.string()), ("x", pa.int64())]),
                        right_schema],
        ).to_pandas().sort_values("k").reset_index(drop=True)

    out1 = run(pd.DataFrame({"k": ["a", "c"], "x": [1, 3]}))
    out2 = run(pd.DataFrame({"k": ["b", "d", "e"], "x": [2, 4, 5]}))
    assert out1["k"].tolist() == ["a", "c"] and out1["y"].tolist() == [10, 30]
    assert out2["k"].tolist() == ["b", "d"] and out2["y"].tolist() == [20, 40]


def test_bucketize_partition_count_mismatch(ray_session):
    P = 4
    right = pd.DataFrame({"k": ["a"], "y": [np.int64(1)]})
    right_schema = pa.schema([("k", pa.string()), ("y", pa.int64())])
    buckets = bucketize(
        _tagged(right, P, "k"), num_partitions=P, in_schema=right_schema
    )
    with pytest.raises(ValueError, match="P=4"):
        hash_exchange(
            [buckets],
            lambda g: g,
            num_partitions=8,
            schema=right_schema,
            in_schemas=[right_schema],
        )


def test_exchange_map_side_combiner(ray_session):
    """``pre`` collapses duplicate rows inside the split task; the result
    matches a plain distinct over the raw input."""
    P = 4
    df = pd.DataFrame({"k": ["a", "a", "a", "b", "b", "c"] * 10})
    df = df.reset_index(drop=True)

    def pre(t: pa.Table) -> pa.Table:
        return t.group_by(["k", "_part"]).aggregate([])

    out = hash_exchange(
        [_tagged(df, P, "k")],
        lambda g: g.drop_duplicates("k"),
        num_partitions=P,
        schema=pa.schema([("k", pa.string())]),
        in_schemas=[pa.schema([("k", pa.string())])],
        pre=[pre],
    ).to_pandas().sort_values("k").reset_index(drop=True)
    assert out["k"].tolist() == ["a", "b", "c"]


def test_exchange_determinism(ray_session):
    P = 8
    df = pd.DataFrame({"k": [f"k{i % 7}" for i in range(200)],
                       "v": np.arange(200, dtype=np.int64)})
    run = lambda: hash_exchange(
        [_tagged(df, P, "k")],
        lambda g: g.groupby("k", sort=False, as_index=False)["v"].max(),
        num_partitions=P,
        schema=pa.schema([("k", pa.string()), ("v", pa.int64())]),
        in_schemas=[pa.schema([("k", pa.string()), ("v", pa.int64())])],
    ).to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(run(), run())
