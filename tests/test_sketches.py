"""HLL / Count-Min sketches: brute-force register parity, merge laws,
estimator error bounds."""

import hashlib
import re
from collections import Counter

import pandas as pd
import ray.data

from data_dedup_ray.corpus import web_pages
from data_dedup_ray.pipelines import sketches


def _hll_bruteforce(values, b=8):
    rest_bits = 60 - b
    regs = {}
    for v in values:
        h = int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
        bk, rest = h >> rest_bits, h & ((1 << rest_bits) - 1)
        rho = rest_bits + 1 if rest == 0 else rest_bits - rest.bit_length() + 1
        regs[bk] = max(regs.get(bk, 0), rho)
    return pd.DataFrame(sorted(regs.items()), columns=["bucket", "max_rho"])


def test_hll_registers_match_bruteforce(sf_dir):
    wp = web_pages(sf_dir)
    got = (sketches.hll_registers(wp, col="text", b=8).to_pandas()
           .sort_values("bucket").reset_index(drop=True))
    want = _hll_bruteforce(wp.select_columns(["text"]).to_pandas()["text"])
    assert got.equals(want)


def test_hll_merge_law(sf_dir):
    wp = web_pages(sf_dir).to_pandas()
    half_a, half_b = wp.iloc[::2], wp.iloc[1::2]
    ra = sketches.hll_registers(
        ray.data.from_pandas(half_a), col="text").to_pandas()
    rb = sketches.hll_registers(
        ray.data.from_pandas(half_b), col="text").to_pandas()
    whole = (sketches.hll_registers(
        ray.data.from_pandas(wp), col="text").to_pandas()
        .sort_values("bucket").reset_index(drop=True))
    assert sketches.merge_hll(ra, rb).equals(whole)


def test_hll_estimate_within_bound(sf_dir):
    # deterministic input + deterministic hash: the observed error is a
    # fixed number; assert it sits inside ~2 sigma for m=256 (13%)
    wp = web_pages(sf_dir)
    regs = sketches.hll_registers(wp, col="text", b=8).to_pandas()
    est = sketches.hll_estimate(regs, b=8)
    true = wp.select_columns(["text"]).to_pandas()["text"].nunique()
    assert abs(est / true - 1) < 0.13


def test_hll_small_range_correction():
    vals = [f"value-{i}" for i in range(40)]
    ds = ray.data.from_pandas(pd.DataFrame({"text": vals}))
    regs = sketches.hll_registers(ds, col="text").to_pandas()
    est = sketches.hll_estimate(regs)
    assert abs(est - 40) < 6  # linear-counting regime is near-exact here


def _token_counts(sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    cnt = Counter()
    for t in docs["text"]:
        cnt.update(re.findall(r"[a-z0-9]+", t.lower()))
    return cnt


def test_cms_cells_match_bruteforce(sf_dir):
    got = (sketches.cms_token_counts(sf_dir).to_pandas()
           .sort_values(["depth", "col"]).reset_index(drop=True))
    cnt = _token_counts(sf_dir)
    cells = {}
    for term, c in cnt.items():
        for d in range(4):
            col = int(hashlib.md5(f"{d}|{term}".encode())
                      .hexdigest()[:8], 16) % 64
            cells[(d, col)] = cells.get((d, col), 0) + c
    want = pd.DataFrame(
        [(d, c, n) for (d, c), n in sorted(cells.items())],
        columns=["depth", "col", "cnt"])
    assert got.equals(want)


def test_cms_point_estimate_never_underestimates(sf_dir):
    cells = sketches.cms_token_counts(sf_dir).to_pandas()
    cnt = _token_counts(sf_dir)
    for term, c in cnt.items():
        assert sketches.cms_point_estimate(cells, term) >= c
    assert sketches.cms_point_estimate(cells, "never-a-token-xyz") >= 0


def test_cms_merge_linearity(sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    import tempfile, os
    with tempfile.TemporaryDirectory() as tmp:
        for name, part in (("a", docs.iloc[::2]), ("b", docs.iloc[1::2])):
            os.makedirs(f"{tmp}/{name}")
            part.to_parquet(f"{tmp}/{name}/documents.parquet", index=False)
        ca = sketches.cms_token_counts(f"{tmp}/a").to_pandas()
        cb = sketches.cms_token_counts(f"{tmp}/b").to_pandas()
    whole = (sketches.cms_token_counts(sf_dir).to_pandas()
             .sort_values(["depth", "col"]).reset_index(drop=True))
    assert sketches.merge_cms(ca, cb).equals(whole)


def test_hll_raw_estimate_matches_sql(ray_session):
    """The raw integer HLL estimator (rational alpha, power-of-two
    harmonic sum) pinned bit-for-bit by its SQL twin, and within the
    standard ~1.04/sqrt(m) error band of the true distinct count."""
    import duckdb

    from data_dedup_ray.corpus import WEB_PAGES_CTE, web_pages

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    got = sketches.hll_raw_estimate(web_pages(sf)).to_pandas()
    want = con.execute("WITH " + WEB_PAGES_CTE + ",\n"
                       + sketches.hll_raw_estimate_sql()).fetchdf()
    pd.testing.assert_frame_equal(got.sort_index(axis=1),
                                  want.sort_index(axis=1),
                                  check_dtype=False)
    true = con.execute("WITH " + WEB_PAGES_CTE
                       + " SELECT count(DISTINCT text) FROM web_pages"
                       ).fetchone()[0]
    est = int(got["estimate"].iloc[0])
    # 4 sigma at sigma ~ 1.04/sqrt(256)
    assert abs(est - true) <= 4 * 1.04 / 16 * true
