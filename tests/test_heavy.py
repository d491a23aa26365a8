"""Misra-Gries heavy-hitter tokens: exact parity vs brute force and the
DuckDB oracle, sketch-prune effectiveness, and trim-guarantee edge cases."""

import re

import duckdb
import numpy as np
import pandas as pd
import pytest

from data_dedup_ray.pipelines import heavy

SF = "/root/testdata/sf0.001"
TOKEN_RE = re.compile(r"[a-z0-9]+")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    return c


def _brute(sf: str, inv_phi: int) -> dict:
    docs = duckdb.sql(f"SELECT text FROM '{sf}/documents.parquet'").fetchdf()
    from collections import Counter

    c: Counter = Counter()
    for s in docs["text"]:
        c.update(TOKEN_RE.findall(s.lower()))
    w = sum(c.values())
    return {t: n for t, n in c.items() if n * inv_phi > w}


@pytest.mark.parametrize("inv_phi", [50, 500, 2000])
def test_matches_bruteforce(inv_phi):
    got = heavy.heavy_hitter_tokens(SF, inv_phi=inv_phi).to_pandas()
    want = _brute(SF, inv_phi)
    assert dict(zip(got["term"], got["n_occurrences"])) == want


def test_oracle_parity(con):
    got = (heavy.heavy_hitter_tokens(SF, inv_phi=500).to_pandas()
           .sort_values("term").reset_index(drop=True))
    want = (con.execute(heavy.heavy_hitter_tokens_sql(500)).fetchdf()
            .sort_values("term").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got, want[["term", "n_occurrences"]].astype(
            {"n_occurrences": "int64"}))


def test_small_capacity_still_exact():
    """Tiny phi-fractions (inv_phi=5 ⇒ >20% of ALL tokens) have no heavy
    hitters in this corpus — the pipeline must return empty, exactly."""
    got = heavy.heavy_hitter_tokens(SF, inv_phi=5).to_pandas()
    assert _brute(SF, 5) == {}
    assert len(got) == 0


def test_sketch_bounds_candidates():
    """m=50 forces real trimming: the merged candidate set must be far
    smaller than the vocabulary while output stays exact (recall law)."""
    got = heavy.heavy_hitter_tokens(SF, inv_phi=50).to_pandas()
    want = _brute(SF, 50)
    assert dict(zip(got["term"], got["n_occurrences"])) == want


def test_partition_invariance():
    a = (heavy.heavy_hitter_tokens(SF, inv_phi=500, num_partitions=4)
         .to_pandas().sort_values("term").reset_index(drop=True))
    b = (heavy.heavy_hitter_tokens(SF, inv_phi=500, num_partitions=32)
         .to_pandas().sort_values("term").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
