"""Corpus statistics (pipelines/stats.py) + Bloom-prefiltered incremental
dedup vs DuckDB oracles, plus invariance checks."""

import duckdb
import pandas as pd
import pytest

from data_dedup_ray.corpus import web_pages
from data_dedup_ray.pipelines import snapshots, stats


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


def test_length_quantiles_oracle(sf_dir, con):
    got = stats.length_quantiles(sf_dir)
    _cmp(got, con.execute(stats.length_quantiles_sql()).fetchdf(),
         ["lang", "q_bp"])


def test_length_quantiles_partition_invariance(sf_dir, con):
    want = con.execute(stats.length_quantiles_sql()).fetchdf()
    got = stats.length_quantiles(sf_dir, num_partitions=3)
    _cmp(got, want, ["lang", "q_bp"])


def test_length_quantiles_monotone(sf_dir):
    got = stats.length_quantiles(sf_dir).to_pandas()
    for _, g in got.groupby("lang"):
        vals = g.sort_values("q_bp")["n_chars_q"].tolist()
        assert vals == sorted(vals)  # higher quantile, higher length


def test_stratified_sample_oracle(sf_dir, con):
    got = stats.stratified_sample(sf_dir)
    _cmp(got, con.execute(stats.stratified_sample_sql()).fetchdf(),
         ["doc_id"])


def test_stratified_sample_rates(sf_dir):
    got = stats.stratified_sample(sf_dir).to_pandas()
    all_docs = pd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    n_en = (all_docs["lang"] == "en").sum()
    got_en = (got["lang"] == "en").sum()
    # 'en' threshold '4' ≈ 25%; default 'c' ≈ 75%
    assert 0.10 < got_en / n_en < 0.45
    rest = all_docs[~all_docs["lang"].isin(["en", "zh"])]
    got_rest = got[~got["lang"].isin(["en", "zh"])]
    assert 0.60 < len(got_rest) / len(rest) < 0.90


def test_stratified_sample_stability(sf_dir):
    a = stats.stratified_sample(sf_dir).to_pandas()
    b = stats.stratified_sample(sf_dir).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])


def test_new_content_bloom_equals_exact(sf_dir, con):
    got = snapshots.new_content_bloom(
        snapshots.snapshot2(sf_dir), web_pages(sf_dir)
    )
    want = con.execute(snapshots.new_content_sql()).fetchdf()
    _cmp(got, want, ["url"])


def test_new_content_bloom_partition_invariance(sf_dir, con):
    want = con.execute(snapshots.new_content_sql()).fetchdf()
    got = snapshots.new_content_bloom(
        snapshots.snapshot2(sf_dir), web_pages(sf_dir), num_partitions=5
    )
    _cmp(got, want, ["url"])


def test_bloom_no_false_negatives_tiny_filter(sf_dir, con):
    # with a deliberately tiny, collision-heavy bitmap the verify join
    # must still remove every false positive — result unchanged
    want = con.execute(snapshots.new_content_sql()).fetchdf()
    got = snapshots.new_content_bloom(
        snapshots.snapshot2(sf_dir), web_pages(sf_dir), bloom_bits=1 << 10
    )
    _cmp(got, want, ["url"])


def test_train_val_test_split_oracle(sf_dir, con):
    got = stats.train_val_test_split(sf_dir)
    _cmp(got, con.execute(stats.train_val_test_split_sql()).fetchdf(),
         ["doc_id"])


def test_train_val_test_split_disjoint_and_total(sf_dir):
    got = stats.train_val_test_split(sf_dir).to_pandas()
    n_docs = pd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).shape[0]
    assert len(got) == n_docs  # every doc assigned exactly once
    assert set(got["split"]) <= {"train", "val", "test"}
    frac_train = (got["split"] == "train").mean()
    assert 0.80 < frac_train < 0.95  # ~87.5% at the default thresholds


def test_cluster_size_histogram_oracle(sf_dir, con):
    got = stats.cluster_size_histogram(sf_dir)
    _cmp(got, con.execute(stats.cluster_size_histogram_sql()).fetchdf(),
         ["cluster_size"])


def test_cluster_size_histogram_mass_conserved(sf_dir):
    got = stats.cluster_size_histogram(sf_dir).to_pandas()
    total = (got["cluster_size"] * got["n_clusters"]).sum()
    assert total == web_pages(sf_dir).count()  # every page in one cluster


def test_token_shards_oracle(sf_dir, con):
    from data_dedup_ray.pipelines import stats as stats_pipe

    got = stats_pipe.token_shards(sf_dir, budget=2000).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = con.execute(stats_pipe.token_shards_sql(2000)).fetchdf() \
        .sort_values("doc_id").reset_index(drop=True)
    for c in ["doc_id", "n_tokens", "tok_offset", "shard_id"]:
        assert got[c].astype(int).tolist() == want[c].astype(int).tolist()
    assert got["shard_id"].max() > 0  # budget forces multiple shards


def test_token_shards_partition_invariance(sf_dir):
    """The distributed ordered prefix sum must be exact under ANY range
    partitioning — the defining property that separates it from the
    engine's unordered aggregates."""
    from data_dedup_ray.pipelines import stats as stats_pipe

    a = stats_pipe.token_shards(sf_dir, budget=3000, num_partitions=2) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = stats_pipe.token_shards(sf_dir, budget=3000, num_partitions=13) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
    # offsets are a true prefix sum: consecutive docs tile the token line
    assert (a["tok_offset"].to_numpy()[1:]
            == (a["tok_offset"] + a["n_tokens"]).to_numpy()[:-1]).all()


def test_cluster_aware_split_matches_sql_and_never_straddles():
    import duckdb
    import pandas as pd

    from data_dedup_ray.pipelines import near, stats
    from data_dedup_ray.corpus import web_pages

    sf = "/root/testdata/sf0.001"
    got = stats.cluster_aware_split(sf).to_pandas(
    ).sort_values("url").reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    exp = con.execute(stats.cluster_aware_split_sql()).df(
    ).sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype(str), exp.astype(str))
    # the leak-free law: NO verified near-dup pair straddles splits
    pages = web_pages(sf).select_columns(["url", "text"])
    pairs = near.minhash_dedup_pairs(pages).to_pandas()
    s = got.set_index("url")["split"]
    assert (s[pairs.url_a].to_numpy() == s[pairs.url_b].to_numpy()).all()
    # all three splits are populated at this scale
    assert set(got.split.unique()) == {"train", "val", "test"}
