"""Relational operators (pipelines/relational.py) vs DuckDB oracles over
the TPC-H-style tables, plus partition invariance."""

import duckdb
import pandas as pd
import pytest

from data_dedup_ray.pipelines import relational as rel


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in ["customer", "orders", "lineitem", "nation", "region"]:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return c


def _cmp(got, want, keys):
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    g = got.sort_index(axis=1).sort_values(keys).reset_index(drop=True)
    w = want.sort_index(axis=1).sort_values(keys).reset_index(drop=True)
    assert list(g.columns) == list(w.columns)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_pricing_summary_oracle(sf_dir, con):
    got = rel.pricing_summary(sf_dir)
    _cmp(got, con.execute(rel.pricing_summary_sql()).fetchdf(),
         ["l_returnflag", "l_linestatus"])


def test_pricing_summary_cutoff_filters(sf_dir, con):
    early = rel.pricing_summary(sf_dir, cutoff="1996-01-01").to_pandas()
    want = con.execute(rel.pricing_summary_sql("1996-01-01")).fetchdf()
    _cmp(early, want, ["l_returnflag", "l_linestatus"])
    full = rel.pricing_summary(sf_dir).to_pandas()
    assert early["count_order"].sum() < full["count_order"].sum()


def test_revenue_by_nation_oracle(sf_dir, con):
    got = rel.revenue_by_nation(sf_dir)
    _cmp(got, con.execute(rel.revenue_by_nation_sql()).fetchdf(), ["n_name"])


def test_revenue_by_nation_partition_invariance(sf_dir, con):
    want = con.execute(rel.revenue_by_nation_sql()).fetchdf()
    got = rel.revenue_by_nation(sf_dir, num_partitions=3)
    _cmp(got, want, ["n_name"])


def test_late_order_counts_oracle(sf_dir, con):
    got = rel.late_order_counts(sf_dir)
    _cmp(got, con.execute(rel.late_order_counts_sql()).fetchdf(),
         ["o_orderpriority"])


def test_late_order_counts_partition_invariance(sf_dir, con):
    want = con.execute(rel.late_order_counts_sql()).fetchdf()
    got = rel.late_order_counts(sf_dir, num_partitions=5)
    _cmp(got, want, ["o_orderpriority"])


def test_top_revenue_orders_oracle(sf_dir, con):
    got = rel.top_revenue_orders(sf_dir)
    _cmp(got, con.execute(rel.top_revenue_orders_sql()).fetchdf(),
         ["o_orderkey"])


def test_top_revenue_orders_k_and_order(sf_dir):
    got = rel.top_revenue_orders(sf_dir, k=5).to_pandas()
    assert len(got) == 5
    revs = got["revenue_c100"].tolist()
    assert revs == sorted(revs, reverse=True)
