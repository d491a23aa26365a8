"""Exact-dedup pipeline vs a DuckDB oracle on the same derived corpus."""

import duckdb
import pandas as pd
import pytest

from data_dedup_ray.corpus import web_pages, web_pages_sql
from data_dedup_ray.pipelines import exact


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    return c


@pytest.fixture(scope="module")
def result(sf_dir):
    # no identity collapse here: every page participates, like scanning a
    # tree with hardlinks disabled
    return exact.dedup_pages(web_pages(sf_dir), collapse=False)


def test_clusters_match_oracle(result, con, sf_dir):
    got = (
        result.to_pandas()[["url", "cluster_id", "n_members"]]
        .sort_values("url")
        .reset_index(drop=True)
    )
    want = con.execute(
        web_pages_sql(
            "SELECT url, min(url) OVER (PARTITION BY text) AS cluster_id,"
            " count(*) OVER (PARTITION BY text) AS n_members"
            " FROM web_pages ORDER BY url"
        )
    ).fetchdf()
    assert list(got["url"]) == list(want["url"])
    assert list(got["cluster_id"]) == list(want["cluster_id"])
    assert list(got["n_members"]) == list(want["n_members"])


def test_report_tsv(result, con):
    text = exact.report_text(result)
    want_lines = con.execute(
        web_pages_sql(
            "SELECT string_agg(url, chr(9) ORDER BY url) AS line FROM web_pages"
            " GROUP BY text HAVING count(*) > 1 ORDER BY line"
        )
    ).fetchdf()["line"]
    assert text == "".join(l + "\n" for l in want_lines)


def test_ignore_empty(sf_dir, con):
    res = exact.dedup_pages(web_pages(sf_dir), collapse=False, ignore_empty=True)
    urls = set(res.to_pandas()["url"])
    assert not any(u.startswith("https://empty.") for u in urls)


def test_identity_collapse(sf_dir, con):
    kept = exact.collapse_identity(web_pages(sf_dir)).to_pandas()
    want = con.execute(
        web_pages_sql(
            "SELECT inode_id, min(url) AS url FROM web_pages GROUP BY inode_id"
            " ORDER BY inode_id"
        )
    ).fetchdf()
    got = kept[["inode_id", "url"]].sort_values("inode_id").reset_index(drop=True)
    assert list(got["url"]) == list(want["url"])


def test_hardlinks(sf_dir, con):
    hl = exact.hardlinks(web_pages(sf_dir)).to_pandas().sort_values("inode_id")
    want = con.execute(
        web_pages_sql(
            "SELECT inode_id, count(*) AS n_links,"
            " string_agg(url, chr(9) ORDER BY url) AS members"
            " FROM web_pages GROUP BY inode_id HAVING count(*) > 1 ORDER BY inode_id"
        )
    ).fetchdf()
    assert list(hl["inode_id"]) == list(want["inode_id"])
    assert list(hl["members"]) == list(want["members"])


def test_stats(result):
    stats = exact.dedup_stats(result)
    assert stats["total"] == stats["unique"] + stats["distinct_with_duplicates"] + stats["duplicates"]
    assert stats["distinct_with_duplicates"] > 0


def test_report_bytes_identical_across_partitioning(sf_dir):
    """The TSV report is byte-identical at any physical partitioning —
    the input_hint run-order invariant, reference report determinism
    (CLI.pm:302-306)."""
    from data_dedup_ray.corpus import web_pages
    from data_dedup_ray.pipelines import exact

    r1 = exact.report_text(
        exact.dedup_pages(web_pages(sf_dir, override_num_blocks=2),
                          collapse=False))
    r2 = exact.report_text(
        exact.dedup_pages(web_pages(sf_dir, override_num_blocks=11),
                          collapse=False))
    assert r1 == r2 and len(r1) > 0


def test_dedup_pages_normalized_oracle(sf_dir, con):
    got = exact.dedup_pages_normalized(sf_dir).to_pandas()
    want = con.execute(exact.dedup_pages_normalized_sql()).fetchdf()
    g = got.sort_index(axis=1).sort_values("url").reset_index(drop=True)
    w = want.sort_index(axis=1).sort_values("url").reset_index(drop=True)
    assert list(g.columns) == list(w.columns)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_dedup_pages_normalized_undoes_noise(sf_dir):
    # normalization must recover exactly the clean corpus's exact clusters
    noisy = exact.dedup_pages_normalized(sf_dir).to_pandas().sort_values(
        "url").reset_index(drop=True)
    clean = exact.dedup_pages(
        web_pages(sf_dir), collapse=False
    ).to_pandas().sort_values(
        "url").reset_index(drop=True)
    assert (noisy["cluster_id"].values == clean["cluster_id"].values).all()
    # while byte-exact dedup on the noisy corpus finds FEWER duplicates
    raw_noisy = web_pages(sf_dir).map_batches(
        exact._plant_case_ws_noise, batch_format="pandas")
    raw = exact.dedup_pages(raw_noisy, collapse=False).to_pandas()
    assert (raw["n_members"] > 1).sum() < (noisy["n_members"] > 1).sum()


def test_dedup_size_only_chain(sf_dir, con):
    got = exact.dedup_pages(
        web_pages(sf_dir), collapse=False, chain=["size"]
    ).to_pandas()[["url", "cluster_id", "n_members"]]
    want = con.execute(web_pages_sql(
        "SELECT url,"
        " min(url) OVER (PARTITION BY strlen(text)) AS cluster_id,"
        " count(*) OVER (PARTITION BY strlen(text)) AS n_members"
        " FROM web_pages"
    )).fetchdf()
    g = got.sort_index(axis=1).sort_values("url").reset_index(drop=True)
    w = want.sort_index(axis=1).sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)
    # a single-stage weak chain merges MORE than the full cascade
    full = exact.dedup_pages(web_pages(sf_dir), collapse=False).to_pandas()
    assert got["cluster_id"].nunique() <= full["cluster_id"].nunique()
