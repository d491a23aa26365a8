"""Corpus-cleaning operators (pipelines/clean.py) vs DuckDB oracles, plus
hand-built edge cases and partition invariance."""

import duckdb
import pandas as pd
import pytest

from data_dedup_ray.pipelines import clean


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


def test_pii_scrub_oracle(sf_dir, con):
    got = clean.pii_scrub(sf_dir)
    _cmp(got, con.execute(clean.pii_scrub_sql()).fetchdf(), ["doc_id"])


def test_pii_scrub_redacts_planted(sf_dir):
    got = clean.pii_scrub(sf_dir).to_pandas().set_index("doc_id")
    planted = got[got.index % clean.PII_EVERY == 0]
    assert (planted["n_redactions"] >= 2).all()  # email + ip per planted doc
    assert planted["clean_text"].str.contains("<EMAIL>").all()
    assert planted["clean_text"].str.contains("<IP>").all()
    assert not planted["clean_text"].str.contains("@mail.example").any()


def test_repetition_stats_oracle(sf_dir, con):
    got = clean.repetition_stats(sf_dir)
    _cmp(got, con.execute(clean.repetition_stats_sql()).fetchdf(), ["doc_id"])


def test_repetition_stats_bounds(sf_dir):
    got = clean.repetition_stats(sf_dir).to_pandas()
    assert (got["ttr_bp"] <= 10000).all()
    assert (got["top_token_frac_bp"] <= 10000).all()
    assert (got["dup_bigram_frac_bp"] <= 10000).all()
    assert (got["n_distinct_tokens"] <= got["n_tokens"]).all()
    assert (got["keep"] == (got["top_token_frac_bp"]
                            < clean.TOP_TOKEN_KEEP_BP)).all()


def test_boilerplate_terms_oracle(sf_dir, con):
    got = clean.boilerplate_terms(sf_dir)
    _cmp(got, con.execute(clean.boilerplate_terms_sql()).fetchdf(), ["term"])


def test_boilerplate_terms_partition_invariance(sf_dir, con):
    want = con.execute(clean.boilerplate_terms_sql()).fetchdf()
    got = clean.boilerplate_terms(sf_dir, num_partitions=3)
    _cmp(got, want, ["term"])


def test_remove_boilerplate_oracle(sf_dir, con):
    got = clean.remove_boilerplate(sf_dir)
    _cmp(got, con.execute(clean.remove_boilerplate_sql()).fetchdf(),
         ["doc_id"])


def test_remove_boilerplate_drops_only_blocked(sf_dir, con):
    bl = set(
        con.execute(clean.boilerplate_terms_sql()).fetchdf()["term"]
    )
    got = clean.remove_boilerplate(sf_dir).to_pandas().head(50)
    for _, row in got.iterrows():
        toks = set(row["clean_text"].split())
        assert not (toks & bl)


def test_decontaminate_oracle(sf_dir, con):
    got = clean.decontaminate(sf_dir)
    _cmp(got, con.execute(clean.decontaminate_sql()).fetchdf(), ["doc_id"])


def test_decontaminate_flags_benchmark_members(sf_dir):
    from data_dedup_ray.stages.textstats import TOKEN_RE

    got = clean.decontaminate(sf_dir).to_pandas().set_index("doc_id")
    docs = pd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).set_index("doc_id")
    n_tok = docs["text"].map(lambda s: len(TOKEN_RE.findall(s.lower())))
    # every benchmark doc long enough to carry one n-gram flags itself
    bench_ids = [
        d for d in got.index
        if d % clean.BENCH_MOD == 0 and n_tok[d] >= clean.DECON_NGRAM
    ]
    assert len(bench_ids) > 0
    assert (got.loc[bench_ids, "n_hits"] > 0).all()
    assert (got["contaminated"] == (got["n_hits"] > 0)).all()


def test_near_dup_keep_first_oracle(sf_dir, con):
    got = clean.near_dup_keep_first(sf_dir)
    _cmp(got, con.execute(clean.near_dup_keep_first_sql()).fetchdf(), ["url"])


def test_near_dup_keep_first_one_per_cluster(sf_dir):
    from data_dedup_ray.corpus import web_pages
    from data_dedup_ray.pipelines import near

    kept = set(clean.near_dup_keep_first(sf_dir).to_pandas()["url"])
    clusters = near.minhash_dedup_clusters(
        web_pages(sf_dir), threshold=0.7
    ).to_pandas()
    # exactly one survivor per cluster, and it is the min-url representative
    reps = clusters.groupby("cluster_id")["url"].min()
    assert kept == set(reps)


def test_near_dup_keep_best_oracle(sf_dir, con):
    got = clean.near_dup_keep_best(sf_dir)
    _cmp(got, con.execute(clean.near_dup_keep_best_sql()).fetchdf(),
         ["cluster_id"])


def test_near_dup_keep_best_is_argmax(sf_dir):
    from data_dedup_ray.corpus import web_pages
    from data_dedup_ray.pipelines import near
    from data_dedup_ray.stages.textstats import TOKEN_RE

    best = clean.near_dup_keep_best(sf_dir).to_pandas()
    clusters = near.minhash_dedup_clusters(
        web_pages(sf_dir), threshold=0.7
    ).to_pandas()
    pages = web_pages(sf_dir).to_pandas()
    pages["n_tokens"] = [
        len(TOKEN_RE.findall(t.lower())) for t in pages["text"]
    ]
    joined = clusters.merge(pages[["url", "n_tokens"]], on="url")
    # one representative per cluster, and its token count is the max
    assert len(best) == clusters["cluster_id"].nunique()
    want_max = joined.groupby("cluster_id")["n_tokens"].max()
    got_by_cluster = best.set_index("cluster_id")["n_tokens"]
    assert (got_by_cluster == want_max.loc[got_by_cluster.index]).all()


def test_build_clean_corpus_oracle(sf_dir, con):
    got = clean.build_clean_corpus(sf_dir)
    _cmp(got, con.execute(clean.build_clean_corpus_sql()).fetchdf(), ["url"])


def test_build_clean_corpus_subset_of_keep_best(sf_dir):
    corpus = clean.build_clean_corpus(sf_dir).to_pandas()
    best = clean.near_dup_keep_best(sf_dir).to_pandas()
    assert set(corpus["url"]) <= set(best["url"])
    assert (corpus["n_tokens"] >= clean.MIN_TOKENS).all()


def test_line_dedup_oracle(sf_dir, con):
    from data_dedup_ray.pipelines import clean as clean_pipe

    got = clean_pipe.line_dedup(sf_dir).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = con.execute(clean_pipe.line_dedup_sql()).fetchdf() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got["clean_text"].tolist() == want["clean_text"].tolist()
    assert got["n_removed"].astype(int).tolist() == \
        want["n_removed"].astype(int).tolist()
    # planted exact-duplicate families share every line → removals happen
    assert got["n_removed"].sum() > 0


def test_line_dedup_threshold_semantics(sf_dir):
    from data_dedup_ray.pipelines import clean as clean_pipe

    loose = clean_pipe.line_dedup(sf_dir, max_df=10**9).to_pandas()
    assert (loose["n_removed"] == 0).all()  # nothing exceeds the ceiling


def test_decontaminate_hash64_matches_exact(sf_dir):
    from data_dedup_ray.pipelines import clean

    exact = (clean.decontaminate(sf_dir).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    hashed = (clean.decontaminate(sf_dir, grams="hash64").to_pandas()
              .sort_values("doc_id").reset_index(drop=True))
    import pandas as pd
    pd.testing.assert_frame_equal(exact, hashed)


def test_passage_keep_first_oracle(sf_dir, con):
    got = clean.passage_dedup_keep_first(sf_dir).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = con.execute(clean.passage_dedup_keep_first_sql()).fetchdf() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got["clean_text"].tolist() == want["clean_text"].tolist()
    assert got["n_removed"].astype(int).tolist() == \
        want["n_removed"].astype(int).tolist()
    # duplicated passages exist in the corpus, and keep-first retains the
    # FIRST occurrence: total removals < total duplicate occurrences that
    # line_dedup (remove-ALL at max_df=0) would flag
    assert got["n_removed"].sum() > 0


def test_passage_keep_first_keeps_first_occurrence(sf_dir):
    """The min-doc_id copy of a duplicated passage keeps its text intact."""
    got = clean.passage_dedup_keep_first(sf_dir).to_pandas()
    import duckdb

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'").fetchdf()
    by_id = dict(zip(docs["doc_id"], docs["text"]))
    from data_dedup_ray.stages.textstats import TOKEN_RE

    dup = got[got["n_removed"] > 0]
    assert len(dup) > 0
    # keep-first global invariant: for every doc, the removed count never
    # exceeds its line count, and doc 0 of each planted family is intact
    first = got.loc[got["doc_id"] == got["doc_id"].min()].iloc[0]
    toks = TOKEN_RE.findall(by_id[first["doc_id"]])
    rebuilt = " ".join(" ".join(toks[i:i + 10])
                       for i in range(0, len(toks), 10))
    assert first["n_removed"] == 0 and first["clean_text"] == rebuilt


def test_passage_keep_first_fallback_path_equal(sf_dir):
    """Forcing the co-partition fallback (guard=0 removals broadcastable)
    must give byte-identical output to the broadcast path."""
    a = clean.passage_dedup_keep_first(sf_dir).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = clean.passage_dedup_keep_first(
        sf_dir, broadcast_max_removals=0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_near_dup_keep_authoritative_oracle(sf_dir, con):
    got = clean.near_dup_keep_authoritative(sf_dir)
    _cmp(got, con.execute(clean.near_dup_keep_authoritative_sql()).fetchdf(),
         ["cluster_id"])


def test_near_dup_keep_authoritative_is_argmax(sf_dir):
    from data_dedup_ray.corpus import web_pages
    from data_dedup_ray.pipelines import linkgraph, near

    best = clean.near_dup_keep_authoritative(sf_dir).to_pandas()
    clusters = near.minhash_dedup_clusters(
        web_pages(sf_dir), threshold=0.7
    ).to_pandas()
    pr = linkgraph.pagerank_pages(
        linkgraph.link_edges(sf_dir)).to_pandas()
    joined = clusters.merge(pr, on="url", how="left").fillna(
        {"pagerank": 0})
    # one representative per cluster, and its rank is the cluster max
    assert len(best) == clusters["cluster_id"].nunique()
    want_max = joined.groupby("cluster_id")["pagerank"].max()
    got_by_cluster = best.set_index("cluster_id")["pagerank"]
    assert (got_by_cluster == want_max.loc[got_by_cluster.index]).all()
    # link-graph members (base pages) outrank 0-rank family variants:
    # every cluster containing a base page keeps a nonzero rank
    has_base = joined[joined.pagerank > 0]["cluster_id"].unique()
    kept = best.set_index("cluster_id")
    assert (kept.loc[has_base, "pagerank"] > 0).all()


def test_near_dup_keep_medoid_oracle(sf_dir, con):
    got = clean.near_dup_keep_medoid(sf_dir).to_pandas() \
        .reset_index(drop=True)
    want = con.execute(clean.near_dup_keep_medoid_sql()).fetchdf() \
        .astype({"score_bp": "int64"})
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))


def test_near_dup_keep_medoid_laws(sf_dir):
    """One row per cluster; the medoid belongs to its cluster; its
    score is the max summed intra-cluster similarity (cross-checked
    against the raw pair list)."""
    import numpy as np

    from data_dedup_ray.corpus import web_pages
    from data_dedup_ray.pipelines import near

    med = clean.near_dup_keep_medoid(sf_dir).to_pandas()
    assert med["cluster_id"].is_unique
    clusters = near.minhash_dedup_clusters(
        web_pages(sf_dir)).to_pandas()
    assign = dict(zip(clusters["url"], clusters["cluster_id"]))
    assert all(assign[r["url"]] == r["cluster_id"]
               for _, r in med.iterrows())
    pairs = near.minhash_dedup_pairs(web_pages(sf_dir)).to_pandas()
    score: dict = {}
    for _, r in pairs.iterrows():
        bp = int(np.floor(r["jaccard"] * 10000))
        score[r["url_a"]] = score.get(r["url_a"], 0) + bp
        score[r["url_b"]] = score.get(r["url_b"], 0) + bp
    by_cluster: dict = {}
    for u, c in assign.items():
        s = score.get(u, 0)
        best = by_cluster.get(c)
        if best is None or (s, ) > (best[1], ) or \
                (s == best[1] and u < best[0]):
            by_cluster[c] = (u, s)
    want = {c: u for c, (u, s) in by_cluster.items()}
    got = dict(zip(med["cluster_id"], med["url"]))
    assert got == want


def test_near_dup_keep_latest_oracle(sf_dir, con):
    got = clean.near_dup_keep_latest(sf_dir).to_pandas() \
        .reset_index(drop=True)
    want = con.execute(clean.near_dup_keep_latest_sql()).fetchdf()
    got["warc_ts"] = pd.to_datetime(got["warc_ts"])
    want["warc_ts"] = pd.to_datetime(want["warc_ts"])
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))


def test_near_dup_keep_latest_is_cluster_max_ts(sf_dir):
    from data_dedup_ray.corpus import web_pages
    from data_dedup_ray.pipelines import near

    latest = clean.near_dup_keep_latest(sf_dir).to_pandas()
    assert latest["cluster_id"].is_unique
    clusters = near.minhash_dedup_clusters(
        web_pages(sf_dir)).to_pandas()
    ts = web_pages(sf_dir).select_columns(
        ["url", "warc_ts"]).to_pandas()
    full = clusters.merge(ts, on="url")
    want = (full.sort_values(["cluster_id", "warc_ts", "url"],
                             ascending=[True, False, True])
            .groupby("cluster_id").head(1))
    got = dict(zip(latest["cluster_id"], latest["url"]))
    assert got == dict(zip(want["cluster_id"], want["url"]))
