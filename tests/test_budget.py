"""Budgeted corpus selection (pipelines/budget.py): oracle parity at
several budgets, prefix/budget laws, partition invariance."""

import duckdb
import pandas as pd
import pytest

from data_dedup_ray.pipelines import budget

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    return c


@pytest.mark.parametrize("tb", [1_000, 10_000, 10_000_000])
def test_oracle_parity(con, tb):
    got = budget.budgeted_corpus(SF, token_budget=tb).to_pandas() \
        .reset_index(drop=True)
    want = con.execute(budget.budgeted_corpus_sql(token_budget=tb)) \
        .fetchdf().astype({"n_tokens": "int64", "cum_tokens": "int64"})
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))


def test_budget_and_prefix_laws():
    tb = 10_000
    got = budget.budgeted_corpus(SF, token_budget=tb).to_pandas()
    assert int(got["cum_tokens"].max()) <= tb
    # the selection is a PREFIX of the tokens-desc order: every kept doc
    # has n_tokens >= any doc that would come later; with a huge budget
    # the kept set must be a superset
    full = budget.budgeted_corpus(SF, token_budget=10_000_000).to_pandas()
    assert set(got["url"]) <= set(full["url"])
    kept_min = int(got["n_tokens"].min())
    dropped = full[~full["url"].isin(set(got["url"]))]
    # allow the boundary doc (budget cut, not rank cut) to be large
    assert (dropped["n_tokens"] <= kept_min).sum() >= len(dropped) - 1


def test_partition_invariance():
    a = budget.budgeted_corpus(SF, token_budget=10_000,
                               num_partitions=3).to_pandas()
    b = budget.budgeted_corpus(SF, token_budget=10_000,
                               num_partitions=16).to_pandas()
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))
