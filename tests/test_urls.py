"""URL canonicalization (pipelines/urls.py) vs DuckDB oracles + unit rules."""

import duckdb
import pandas as pd
import pytest

from data_dedup_ray.pipelines import urls


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    return c


def _cmp(got, want, keys):
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    g = got.sort_index(axis=1).sort_values(keys).reset_index(drop=True)
    w = want.sort_index(axis=1).sort_values(keys).reset_index(drop=True)
    assert list(g.columns) == list(w.columns)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


@pytest.mark.parametrize("raw,canon", [
    ("HTTPS://WWW.Site1.EXAMPLE:443/P/9#x", "https://site1.example/p/9"),
    ("http://a.example:80/x/?utm_source=1&b=2&a=3",
     "http://a.example/x/?a=3&b=2"),
    ("https://a.example/p?utm_source=1&fbclid=2&gclid=3",
     "https://a.example/p"),
    ("https://a.example/", "https://a.example/"),  # root slash kept
    ("https://a.example/p/", "https://a.example/p"),
    ("https://a.example:8080/p", "https://a.example:8080/p"),  # non-default
    ("https://wwwx.example/p", "https://wwwx.example/p"),  # not a www. prefix
])
def test_canonicalize_rules(raw, canon):
    assert urls.canonicalize_url(raw) == canon


def test_canonicalize_idempotent():
    for raw in [
        "HTTPS://WWW.Site1.EXAMPLE:443/P/9#x",
        "http://a.example:80/x/?utm_source=1&b=2&a=3",
    ]:
        once = urls.canonicalize_url(raw)
        assert urls.canonicalize_url(once) == once


def test_canonical_urls_oracle(sf_dir, con):
    got = urls.canonical_urls(sf_dir)
    _cmp(got, con.execute(urls.canonical_urls_sql()).fetchdf(),
         ["doc_id", "url"])


def test_canonical_collapse_oracle(sf_dir, con):
    got = urls.canonical_collapse(sf_dir)
    _cmp(got, con.execute(urls.canonical_collapse_sql()).fetchdf(),
         ["canonical_url"])


def test_canonical_collapse_partition_invariance(sf_dir, con):
    want = con.execute(urls.canonical_collapse_sql()).fetchdf()
    got = urls.canonical_collapse(sf_dir, num_partitions=3)
    _cmp(got, want, ["canonical_url"])


def test_collapse_groups_aliases(sf_dir):
    got = urls.canonical_collapse(sf_dir).to_pandas()
    # port/case, www and fragment aliases (r in 1..3) collapse onto the
    # clean url (n_aliases == 2); r==4 keeps ref=home and stays separate
    assert (got["n_aliases"] <= 2).all()
    n_docs = pd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).shape[0]
    merged = (got["n_aliases"] == 2).sum()
    assert merged == sum(
        1 for i in range(n_docs) if i % 5 in (1, 2, 3)
    )
    # representative is the lexicographic min alias per canonical form
    aliases = urls.canonical_urls(sf_dir).to_pandas()
    want_min = aliases.groupby("canonical_url")["url"].min()
    by_canon = got.set_index("canonical_url")["url"]
    assert (by_canon == want_min.loc[by_canon.index]).all()


def test_url_template_stats_matches_sql():
    import duckdb

    from data_dedup_ray.corpus import web_pages
    from data_dedup_ray.pipelines import urls as u

    sf = "/root/testdata/sf0.001"
    got = u.url_template_stats(web_pages(sf)).to_pandas(
    ).sort_values(["domain", "template"]).reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    exp = con.execute(u.url_template_stats_sql()).df(
    ).sort_values(["domain", "template"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.sort_index(axis=1).astype(str),
        exp.sort_index(axis=1).astype(str))
    # every url in the corpus is digit-templated -> template rows
    # aggregate whole id families; total page count is conserved
    assert got.n_pages.sum() == web_pages(sf).count()
    assert (got.dup_rate_bp >= 0).all() and (got.dup_rate_bp < 10000).all()


def test_url_template_stats_flags_trap():
    import pyarrow as pa
    import ray.data

    from data_dedup_ray.pipelines import urls as u

    # a calendar-shaped trap: 6 urls, one identical page
    docs = ray.data.from_arrow(pa.table({
        "url": [f"https://trap.example/cal/2024/{i}" for i in range(6)]
        + ["https://real.example/a", "https://real.example/b"],
        "text": ["same shell"] * 6 + ["page a", "page b"]}))
    got = u.url_template_stats(docs, num_partitions=4).to_pandas(
    ).set_index("template")
    trap = got.loc["https://trap.example/cal/N/N"]
    assert trap.n_pages == 6 and trap.n_distinct_content == 1
    assert trap.dup_rate_bp == 10000 * 5 // 6


def test_markup_stats_matches_sql():
    import duckdb

    from data_dedup_ray.corpus import web_pages
    from data_dedup_ray.pipelines import urls as u

    sf = "/root/testdata/sf0.001"
    got = u.markup_stats(web_pages(sf)).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = con.execute(u.markup_stats_sql()).fetchdf()
    con.close()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    g = got[cols].sort_values("host").reset_index(drop=True)
    w = want[cols].sort_values("host").reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)
    # empty.example pages are ALL markup (zero-byte text)
    assert g.set_index("host").loc["empty.example", "markup_bp"] == 10000
    assert (g.text_bytes <= g.html_bytes).all()
