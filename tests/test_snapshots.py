"""Cross-snapshot operators (pipelines/snapshots.py) vs DuckDB oracles,
plus hand-built edge cases and determinism under partition counts."""

import duckdb
import pandas as pd
import pytest
import ray.data

from data_dedup_ray.corpus import web_pages
from data_dedup_ray.pipelines import snapshots


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


def test_snapshot2_matches_cte(sf_dir, con):
    got = snapshots.snapshot2(sf_dir).to_pandas()
    want = con.execute(
        snapshots.snapshots_sql(
            "SELECT url, warc_ts, text, lang, inode_id FROM snapshot2"
        )
    ).fetchdf()
    _cmp(got[["url", "warc_ts", "text", "lang", "inode_id"]], want, ["url"])


def test_latest_by_url_oracle(sf_dir, con):
    got = snapshots.latest_by_url(
        [web_pages(sf_dir), snapshots.snapshot2(sf_dir)]
    )
    _cmp(got, con.execute(snapshots.latest_by_url_sql()).fetchdf(), ["url"])


def test_latest_by_url_prefers_recrawl(sf_dir):
    got = snapshots.latest_by_url(
        [web_pages(sf_dir), snapshots.snapshot2(sf_dir)]
    ).to_pandas().set_index("url")
    snap2 = snapshots.snapshot2(sf_dir).to_pandas()
    # every re-crawled url must surface the snapshot-2 capture (ts + 30 d)
    for _, row in snap2.head(20).iterrows():
        assert got.loc[row["url"], "warc_ts_us"] == row["warc_ts"].value // 1000
    # urls never re-crawled keep their snapshot-1 timestamp
    base = web_pages(sf_dir).to_pandas()
    only1 = base[~base["url"].isin(set(snap2["url"]))].head(20)
    for _, row in only1.iterrows():
        assert got.loc[row["url"], "warc_ts_us"] == row["warc_ts"].value // 1000


def test_new_content_oracle(sf_dir, con):
    got = snapshots.new_content(snapshots.snapshot2(sf_dir), web_pages(sf_dir))
    _cmp(got, con.execute(snapshots.new_content_sql()).fetchdf(), ["url"])


def test_new_content_only_changed_captures(sf_dir):
    got = snapshots.new_content(
        snapshots.snapshot2(sf_dir), web_pages(sf_dir)
    ).to_pandas()
    # unchanged captures (doc_id % 6 == 0) are already in the index
    ids = got["url"].str.rsplit("/", n=1).str[1].astype(int)
    assert (ids % 3 == 0).all() and (ids % 6 != 0).all()
    # and every changed capture is reported
    snap2 = snapshots.snapshot2(sf_dir).to_pandas()
    sids = snap2["url"].str.rsplit("/", n=1).str[1].astype(int)
    assert len(got) == int((sids % 6 != 0).sum())


def test_sample_pages_oracle(sf_dir, con):
    got = snapshots.sample_pages(web_pages(sf_dir))
    _cmp(got, con.execute(snapshots.sample_pages_sql()).fetchdf(), ["url"])


def test_sample_pages_stable_and_proportional(sf_dir):
    a = snapshots.sample_pages(web_pages(sf_dir)).to_pandas()
    b = snapshots.sample_pages(
        web_pages(sf_dir, override_num_blocks=7)
    ).to_pandas()
    assert sorted(a["url"]) == sorted(b["url"])
    n_total = web_pages(sf_dir).count()
    assert 0.15 < len(a) / n_total < 0.35  # ~25% at threshold '4'


def test_domain_stats_oracle(sf_dir, con):
    got = snapshots.domain_stats(web_pages(sf_dir))
    _cmp(got, con.execute(snapshots.domain_stats_sql()).fetchdf(), ["domain"])


def test_domain_stats_partition_invariance(sf_dir, con):
    want = con.execute(snapshots.domain_stats_sql()).fetchdf()
    got = snapshots.domain_stats(web_pages(sf_dir), num_partitions=3)
    _cmp(got, want, ["domain"])


def test_latest_by_url_partition_invariance(sf_dir, con):
    want = con.execute(snapshots.latest_by_url_sql()).fetchdf()
    got = snapshots.latest_by_url(
        [web_pages(sf_dir), snapshots.snapshot2(sf_dir)], num_partitions=5
    )
    _cmp(got, want, ["url"])


def test_latest_by_url_tiebreak():
    # equal timestamps → the longer text wins, under any partitioning
    t = pd.Timestamp("2020-01-01")
    ds1 = ray.data.from_pandas(pd.DataFrame({
        "url": ["u1", "u2"], "warc_ts": [t, t],
        "text": ["short", "aa"], "lang": ["en", "en"],
    }))
    ds2 = ray.data.from_pandas(pd.DataFrame({
        "url": ["u1", "u2"], "warc_ts": [t, t],
        "text": ["the longer capture", "b"], "lang": ["en", "en"],
    }))
    out = (
        snapshots.latest_by_url([ds1, ds2], num_partitions=2)
        .to_pandas().set_index("url")["text_len"]
    )
    assert out["u1"] == len("the longer capture")
    assert out["u2"] == 2


def test_filter_blocked_domains_oracle(sf_dir, con):
    got = snapshots.filter_blocked_domains(web_pages(sf_dir))
    _cmp(got, con.execute(snapshots.filter_blocked_domains_sql()).fetchdf(),
         ["url"])


def test_filter_blocked_domains_drops_only_blocked(sf_dir):
    kept = snapshots.filter_blocked_domains(
        web_pages(sf_dir), blocked=("mirror.example",)
    ).to_pandas()
    hosts = kept["url"].str.split("//").str[1].str.split("/").str[0]
    assert "mirror.example" not in set(hosts)
    n_all = web_pages(sf_dir).count()
    n_mirror = int(
        web_pages(sf_dir).to_pandas()["url"]
        .str.startswith("https://mirror.example/").sum()
    )
    assert len(kept) == n_all - n_mirror


def test_domain_dup_stats_oracle(sf_dir, con):
    got = snapshots.domain_dup_stats(web_pages(sf_dir))
    _cmp(got, con.execute(snapshots.domain_dup_stats_sql()).fetchdf(),
         ["domain"])


def test_domain_dup_stats_partition_invariance(sf_dir, con):
    want = con.execute(snapshots.domain_dup_stats_sql()).fetchdf()
    got = snapshots.domain_dup_stats(web_pages(sf_dir), num_partitions=3)
    _cmp(got, want, ["domain"])


def test_domain_dup_stats_mirror_is_all_dup(sf_dir):
    got = snapshots.domain_dup_stats(web_pages(sf_dir)).to_pandas()
    got = got.set_index("domain")
    # the planted mirror domain duplicates existing content wholesale
    assert got.loc["mirror.example", "dup_rate_bp"] >= 0
    assert (got["n_distinct"] <= got["n_pages"]).all()
    assert ((got["dup_rate_bp"] >= 0) & (got["dup_rate_bp"] < 10000)).all()


def test_crawl_dup_timeline_matches_sql():
    import duckdb
    import pandas as pd

    from data_dedup_ray.corpus import web_pages
    from data_dedup_ray.pipelines import snapshots as sn

    sf = "/root/testdata/sf0.001"
    got = sn.crawl_dup_timeline(
        [web_pages(sf), sn.snapshot2(sf), sn.snapshot3(sf)]
    ).to_pandas().sort_values("epoch_day").reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    exp = con.execute(sn.crawl_dup_timeline_sql()).df(
    ).sort_values("epoch_day").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.sort_index(axis=1).astype(str),
        exp.sort_index(axis=1).astype(str))
    # the first capture day can contain no dups of EARLIER captures
    # beyond same-day repeats; the re-crawl days (+30d, +60d) sit at
    # ~50% by construction (doc_id%6 / %10 byte-identical re-captures)
    last2 = got.tail(2)
    assert ((last2.dup_bp - 5000).abs() < 500).all()
    # totals: every capture counted exactly once
    assert got.n_captures.sum() == (
        web_pages(sf).count() + sn.snapshot2(sf).count()
        + sn.snapshot3(sf).count())


def test_crawl_dup_timeline_partition_invariance():
    import pandas as pd

    from data_dedup_ray.corpus import web_pages
    from data_dedup_ray.pipelines import snapshots as sn

    sf = "/root/testdata/sf0.001"
    crawls = [web_pages(sf), sn.snapshot2(sf)]
    a = sn.crawl_dup_timeline(crawls, num_partitions=1).to_pandas()
    b = sn.crawl_dup_timeline(crawls, num_partitions=16).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_host_change_rates_matches_sql(sf_dir, con):
    got = snapshots.host_change_rates(
        web_pages(sf_dir), snapshots.snapshot2(sf_dir)).to_pandas()
    want = con.execute(snapshots.host_change_rates_sql()).fetchdf()
    _cmp(got, want, ["host"])
    # derivation law: revisits are doc_id%3==0, unchanged iff doc_id%6==0;
    # ids on site<h> share h's parity, so EVEN hosts never change
    # (every multiple of 3 there is a multiple of 6) and ODD hosts
    # always do
    idx = got.host.str.extract(r"site(\d+)")[0].astype(int)
    assert (got.change_bp[idx % 2 == 0] == 0).all()
    assert (got.change_bp[idx % 2 == 1] == 10000).all()
    assert (got.n_changed <= got.n_revisited).all()


def test_host_url_churn_matches_sql(sf_dir, con):
    got = snapshots.host_url_churn(
        web_pages(sf_dir), snapshots.snapshot2(sf_dir)).to_pandas()
    want = con.execute(snapshots.host_url_churn_sql()).fetchdf()
    _cmp(got, want, ["host"])
    # snapshot2 revisits a subset of crawl-1 base urls and adds nothing
    assert got.n_new.sum() == 0
    # family hosts are gone entirely in the re-crawl
    fam = got[~got.host.str.startswith("site")]
    assert len(fam) and (fam.n_common == 0).all()
