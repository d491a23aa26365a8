"""LSH band skew dashboard (pipelines/bandstats.py) vs the DuckDB
restatement of the band combine, plus structural laws."""

import duckdb
import pandas as pd
import pytest
import ray.data

from data_dedup_ray.corpus import web_pages
from data_dedup_ray.pipelines import bandstats

SF = "/root/testdata/sf0.001"


def _stats(**kw):
    return bandstats.lsh_band_stats(
        web_pages(SF).select_columns(["url", "text"]),
        token_hash="sha", **kw).to_pandas() \
        .sort_values("band_id").reset_index(drop=True)


@pytest.fixture(scope="module")
def got(ray_session):
    return _stats()


def test_matches_sql(got):
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute(bandstats.lsh_band_stats_sql()).fetchdf() \
        .sort_values("band_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.sort_index(axis=1), want.sort_index(axis=1),
        check_dtype=False)


def test_structural_laws(got):
    # one band row per band; every doc-with-shingles appears in every
    # band, so n_rows is constant across bands
    assert len(got) == 42
    assert got["n_rows"].nunique() == 1
    assert (got["n_buckets"] <= got["n_rows"]).all()
    assert (got["max_bucket"] >= 1).all()
    # pre-cap candidate volume at least the hottest bucket's pairs
    mb = got["max_bucket"]
    assert (got["n_cand_pairs"] >= mb * (mb - 1) // 2).all()
    assert (got["n_dup_buckets"] <= got["n_buckets"]).all()


def test_partition_invariance(ray_session, got):
    alt = _stats(num_partitions=7)
    pd.testing.assert_frame_equal(got, alt)


def test_exact_dups_heat_every_band(ray_session):
    """Identical docs share ALL band hashes: planting one duplicated
    page pushes max_bucket ≥ 2 in every band."""
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    ds = ray.data.from_items(
        [{"url": f"u{i}", "text": base + f" unique{i} filler{i}"}
         for i in range(6)]
        + [{"url": "dupA", "text": base + " unique0 filler0"}])
    out = bandstats.lsh_band_stats(ds, num_partitions=4).to_pandas()
    assert len(out) == 42
    assert (out["max_bucket"] >= 2).all()
    assert (out["n_dup_buckets"] >= 1).all()
