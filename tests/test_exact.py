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


# --------------------------------------------------------------------------
# Reference digest-edge semantics (DigestFactory.pm:154-172) + the
# resolve_hardlinks callback surface (Files.pm:279-318, Files.t:133-183)
# --------------------------------------------------------------------------


def test_final_digest_bounds_reference_semantics():
    from data_dedup_ray.stages.hashes import (
        _end_sample_bounds, _final_bounds, _mid_sample_bounds,
        _sample_bounds)

    # final_*: last cluster, short-tail (< cluster/2) backs up ONE full
    # cluster and EXCLUDES the tail bytes
    assert _final_bounds(6143) == (0, 4096)      # tail 2047 < 2048 → backoff
    assert _final_bounds(6144) == (4096, 2048)   # tail == half: no backoff
    assert _final_bounds(4097) == (0, 4096)      # tail 1 → backoff
    assert _final_bounds(4096) == (0, 4096)
    assert _final_bounds(100) == (0, 100)
    assert _final_bounds(0) == (0, 0)
    # sample: offset max(0, cluster/2 - 128) with float-truncate parity
    assert _sample_bounds(301) == (22, 128)      # trunc(150.5-128) == 22
    assert _sample_bounds(4096) == (1920, 128)
    assert _sample_bounds(0) == (0, 0)
    # end_sample: tail < 128 backs up one full cluster
    assert _end_sample_bounds(4096 + 100) == (1920, 128)
    assert _end_sample_bounds(4096 + 200) == (4096 + 100 - 128, 128)
    assert _end_sample_bounds(100) == (0, 128)
    # mid_sample: cluster containing byte size/2 - 1
    assert _mid_sample_bounds(8192) == (1920, 128)   # mid cluster = 0
    assert _mid_sample_bounds(16384) == (4096 + 1920, 128)
    assert _mid_sample_bounds(1) == (0, 128)


def test_final_sha_short_tail_backoff_groups(ray_session):
    """Twins differing ONLY in a sub-half-cluster tail must group together
    under a final_sha-only chain (the reference hashes the preceding full
    cluster, not the short tail); a half-cluster tail must NOT back off."""
    import ray.data

    from data_dedup_ray.pipelines.exact import dedup_pages

    # ASCII-only so the string→binary cast (UTF-8) is byte-for-byte
    X = b"0123456789abcdef" * 256       # 4096 bytes
    Y = b"fedcba9876543210" * 256
    rows = pd.DataFrame({
        "url": ["a", "b", "c", "d"],
        "text": [
            (X + b"a" * 2047).decode("latin-1"),   # backoff → hashes X
            (X + b"b" * 2047).decode("latin-1"),   # backoff → hashes X
            (X + b"c" * 2048).decode("latin-1"),   # no backoff → tail only
            (Y + b"a" * 2047).decode("latin-1"),   # backoff → hashes Y
        ],
    })
    res = dedup_pages(ray.data.from_pandas(rows), chain=["final_sha"],
                      collapse=False).to_pandas().set_index("url")
    assert res.loc["a", "cluster_id"] == res.loc["b", "cluster_id"]
    assert res.loc["c", "cluster_id"] != res.loc["a", "cluster_id"]
    assert res.loc["d", "cluster_id"] != res.loc["a", "cluster_id"]


def test_resolve_hardlinks_callback_contract(ray_session):
    """Files.t:133-183: the callback receives each multi-member inode's
    sorted url list and its returned url becomes the group's canonical
    representative."""
    import ray.data

    from data_dedup_ray.pipelines.exact import collapse_identity

    rows = pd.DataFrame({
        "url": ["a1", "a2", "a3", "b1", "solo"],
        "inode_id": [7, 7, 7, 8, 9],
        "text": ["t7", "t7", "t7", "t8", "t9"],
    })
    seen = []

    def resolve(urls):
        seen.append(list(urls))
        return urls[-1]  # alphabetically-LAST member

    got = collapse_identity(ray.data.from_pandas(rows), resolve=resolve) \
        .to_pandas().sort_values("url").reset_index(drop=True)
    assert got["url"].tolist() == ["a3", "b1", "solo"]
    assert got["text"].tolist() == ["t7", "t8", "t9"]
    # default (no callback) pins the alphabetically-FIRST url
    dflt = collapse_identity(ray.data.from_pandas(rows)).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert dflt["url"].tolist() == ["a1", "b1", "solo"]


def test_resolve_hardlinks_rejects_foreign_url(ray_session):
    import ray.data

    from data_dedup_ray.pipelines.exact import collapse_identity

    rows = pd.DataFrame({
        "url": ["a1", "a2"], "inode_id": [7, 7], "text": ["t", "t"],
    })
    with pytest.raises(Exception):
        collapse_identity(
            ray.data.from_pandas(rows), resolve=lambda urls: "nope"
        ).to_pandas()
