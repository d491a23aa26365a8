"""web_pages corpus: the Ray derivation and the SQL CTE must be twins, and
extract_text(html) must reproduce text byte-identically (BASELINE.json:16)."""

import duckdb
import pandas as pd
import pytest

from data_dedup_ray.corpus import web_pages, web_pages_sql
from data_dedup_ray.stages.extract import extract_text


@pytest.fixture(scope="module")
def ray_pages(sf_dir):
    return web_pages(sf_dir).to_pandas().sort_values("url").reset_index(drop=True)


@pytest.fixture(scope="module")
def sql_pages(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    df = con.execute(
        web_pages_sql("SELECT * FROM web_pages ORDER BY url")
    ).fetchdf()
    return df.reset_index(drop=True)


def test_same_rows(ray_pages, sql_pages):
    assert len(ray_pages) == len(sql_pages)
    assert list(ray_pages["url"]) == list(sql_pages["url"])
    assert list(ray_pages["text"]) == list(sql_pages["text"])
    assert list(ray_pages["lang"]) == list(sql_pages["lang"])
    assert list(ray_pages["inode_id"]) == list(sql_pages["inode_id"])
    ray_html = [bytes(h) for h in ray_pages["html"]]
    sql_html = [bytes(h) for h in sql_pages["html"]]
    assert ray_html == sql_html
    assert list(pd.to_datetime(ray_pages["warc_ts"])) == list(
        pd.to_datetime(sql_pages["warc_ts"])
    )


def test_families_planted(ray_pages):
    fams = ray_pages["url"].str.extract(r"https://(\w+)[.\d]").iloc[:, 0]
    counts = ray_pages.groupby(ray_pages["url"].str.split(".").str[0]).size()
    assert any(u.startswith("https://mirror.") for u in ray_pages["url"])
    assert any(u.startswith("https://empty.") for u in ray_pages["url"])
    empty = ray_pages[ray_pages["url"].str.startswith("https://empty.")]
    assert (empty["text"] == "").all()
    # exact duplicates really are byte-identical to their base page
    mirrors = ray_pages[ray_pages["url"].str.startswith("https://mirror.")]
    base = ray_pages[ray_pages["url"].str.startswith("https://site")]
    base_by_id = dict(zip(base["url"].str.rsplit("/", n=1).str[1], base["text"]))
    for _, row in mirrors.iterrows():
        doc = row["url"].rsplit("/", 1)[1]
        assert row["text"] == base_by_id[doc]


def test_extract_text_invariant(sf_dir):
    ds = web_pages(sf_dir).map_batches(extract_text, batch_format="pyarrow")
    df = ds.to_pandas()
    assert (df["extracted_text"] == df["text"]).all()


def test_amplify_family_size_constant_across_factors():
    """Near-dup family size must NOT grow with the amplification factor
    (pair counts scale linearly — the scale-invariance of a real crawl)."""
    import numpy as np
    import pandas as pd

    from data_dedup_ray.corpus import _Amplify
    from data_dedup_ray.stages.minhash import shingle_sets

    base = pd.DataFrame({
        "url": ["https://x.example/p/1"],
        "text": [" ".join(f"word{i} token{i} fill{i}" for i in range(60))],
    })
    out = _Amplify(32)(base)
    assert len(out) == 32

    def jac(a, b):
        inter = len(np.intersect1d(a, b, assume_unique=True))
        return inter / (len(a) + len(b) - inter)

    sets = {}
    for _, row in out.iterrows():
        cat, sizes = shingle_sets([row["text"]], 5)
        sets[row["url"]] = cat
    urls = list(sets)
    near = [
        (ua, ub) for i, ua in enumerate(urls) for ub in urls[i + 1:]
        if jac(sets[ua], sets[ub]) >= 0.7
    ]
    fam = {}
    for ua, ub in near:
        fam.setdefault(ua, set()).update([ua, ub])
        fam.setdefault(ub, set()).update([ua, ub])
    sizes = {frozenset(v) for v in fam.values()}
    # two disjoint 4-member families (blocks 0 and 1), nothing larger
    assert all(len(s) == 4 for s in sizes), sizes
    assert len(set().union(*sizes)) == 8 if sizes else True


def test_extract_text_query_matches_sql_twin(sf_dir):
    """The driver-facing extract_text query (html bytes only in, text
    out) must equal the corpus CTE's text column bit-for-bit."""
    import duckdb
    from data_dedup_ray.pipelines import text as tpl

    got = (tpl.extract_text_pages(sf_dir).to_pandas()
           .sort_values("url").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    want = con.execute(
        tpl.extract_text_sql() + " ORDER BY url").fetchdf()
    pd.testing.assert_frame_equal(got, want)
    assert len(got) > 0
