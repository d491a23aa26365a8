"""Substring (long-span) dedup vs a brute-force window oracle."""

import hashlib

import pandas as pd
import pytest

from data_dedup_ray.corpus import web_pages
from data_dedup_ray.pipelines import substring
from data_dedup_ray.stages.minhash import TOKEN_RE

SF = "/root/testdata/sf0.001"
L = 50


@pytest.fixture(scope="module")
def corpus(ray_session):
    return web_pages(SF).to_pandas()


def brute_dup_windows(df: pd.DataFrame, min_tokens: int = L) -> dict:
    """url → count of window positions whose window text occurs in ≥1
    other doc (the reference oracle for substring_dup_docs)."""
    wins: dict[str, list[str]] = {}
    for url, text in zip(df["url"], df["text"]):
        toks = TOKEN_RE.findall(text) if text else []
        wins[url] = [
            " ".join(toks[i: i + min_tokens])
            for i in range(len(toks) - min_tokens + 1)
        ]
    owners: dict[str, set] = {}
    for url, ws in wins.items():
        for w in set(ws):
            owners.setdefault(w, set()).add(url)
    out = {}
    for url, ws in wins.items():
        n = sum(1 for w in ws if len(owners[w]) > 1)
        if n:
            out[url] = n
    return out


def test_exact_matches_brute_force(ray_session, corpus):
    got = substring.substring_dup_docs(web_pages(SF), mode="exact").to_pandas()
    want = brute_dup_windows(corpus)
    assert dict(zip(got["url"], got["n_dup_windows"])) == want


def test_quote_family_flagged(ray_session, corpus):
    """Every quote page shares SHARED_SPAN (60 tokens ≥ L) with the other
    quote pages → must be flagged."""
    got = set(substring.substring_dup_docs(web_pages(SF), mode="exact").to_pandas()["url"])
    quotes = [u for u in corpus["url"] if u.startswith("https://quote.")]
    assert quotes and set(quotes) <= got


def test_winnowed_covers_long_spans(ray_session, corpus):
    """Winnowing guarantee: spans ≥ L + w − 1 tokens still fingerprint.
    SHARED_SPAN is 60 tokens = 50 + 8 + 2, so every quote page must emit
    ≥1 duplicated fingerprint."""
    fp = substring.dup_span_fingerprints(web_pages(SF)).to_pandas()
    quotes = {u for u in corpus["url"] if u.startswith("https://quote.")}
    assert quotes <= set(fp["url"])
    assert (fp["n_docs"] >= 2).all()


def test_substring_clusters_group_quotes(ray_session, corpus):
    res = substring.substring_clusters(web_pages(SF)).to_pandas()
    assert len(res) == len(corpus)
    cl = dict(zip(res["url"], res["cluster_id"]))
    quotes = sorted(u for u in corpus["url"] if u.startswith("https://quote."))
    assert len({cl[u] for u in quotes}) == 1  # all quote pages together


def test_suffix_array_kernels():
    import numpy as np

    from data_dedup_ray.stages.suffixarray import (lcp_array,
                                                   longest_common_span,
                                                   suffix_array)

    t = np.array([1, 2, 1, 2, 3], dtype=np.int64)  # suffixes sorted manually
    sa = suffix_array(t)
    # brute-force check
    suf = sorted(range(len(t)), key=lambda i: list(t[i:]))
    assert sa.tolist() == suf
    lcp = lcp_array(t, sa)
    for i in range(1, len(t)):
        a, b = t[sa[i - 1]:], t[sa[i]:]
        k = 0
        while k < len(a) and k < len(b) and a[k] == b[k]:
            k += 1
        assert lcp[i] == k

    ta = np.array([5, 6, 7, 8, 9, 1], dtype=np.int64)
    tb = np.array([2, 6, 7, 8, 9, 3], dtype=np.int64)
    L, a0, b0 = longest_common_span(ta, tb)
    assert (L, a0, b0) == (4, 1, 1)
    assert longest_common_span(ta, np.array([99], dtype=np.int64))[0] == 0


def test_longest_dup_spans_matches_bruteforce(ray_session, corpus):
    from data_dedup_ray.corpus import web_pages
    pages = web_pages(SF)
    import numpy as np

    from data_dedup_ray.pipelines.substring import longest_dup_spans
    from data_dedup_ray.stages.minhash import tokenize_batch
    from data_dedup_ray.stages.suffixarray import longest_common_span

    res = longest_dup_spans(pages, min_tokens=20).to_pandas()
    assert len(res) > 0
    # every reported span must be >= the discovery guarantee... the star
    # edges guarantee a shared winnowed fingerprint => shared window, so
    # span >= min_tokens
    assert (res["span_tokens"] >= 20).all()

    # spot-check 5 pairs against a direct per-pair suffix-array run
    df = corpus
    toks = {}
    for u, t in zip(df["url"], df["text"]):
        h, _ = tokenize_batch([t])
        toks[u] = h.astype(np.int64)
    for _, row in res.head(5).iterrows():
        L, a0, b0 = longest_common_span(toks[row["url_a"]], toks[row["url_b"]])
        assert L == row["span_tokens"]


def test_winnowed_default_mode(ray_session, corpus):
    """The library DEFAULT is the winnowed scale path: every doc holding a
    shared span of ≥ L + w − 1 tokens is still flagged, and flagged docs
    are a subset of the exact mode's."""
    wn = set(substring.substring_dup_docs(web_pages(SF)).to_pandas()["url"])
    ex = set(substring.substring_dup_docs(web_pages(SF), mode="exact")
             .to_pandas()["url"])
    assert wn <= ex
    quotes = {u for u in corpus["url"] if u.startswith("https://quote.")}
    assert quotes and quotes <= wn  # SHARED_SPAN is 60 ≥ 50 + 8 - 1 tokens


def test_exact_clusters_match_closure_oracle(ray_session):
    """mode='exact' shared-window components pinned bit-for-bit by the
    recursive closure over the md5 window identity."""
    import duckdb
    import pandas as pd

    from data_dedup_ray.corpus import web_pages

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    got = substring.substring_clusters(web_pages(sf), mode="exact") \
        .to_pandas().sort_values("url").reset_index(drop=True)
    want = con.execute(substring.substring_exact_clusters_sql()) \
        .fetchdf().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.sort_index(axis=1),
                                  want.sort_index(axis=1),
                                  check_dtype=False)
    assert got["cluster_id"].nunique() < len(got)


def test_longest_dup_spans_exact_matches_sql_and_sa(ray_session):
    """Runs-based exact spans match the closure SQL twin bit-for-bit,
    and span LENGTHS agree with the suffix-array kernel (the tie RULE
    differs by design: global min vs adjacent-candidate)."""
    import duckdb

    import ray.data
    from data_dedup_ray.stages.minhash import tokenize_batch
    from data_dedup_ray.stages.suffixarray import longest_common_span

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    got = substring.longest_dup_spans_exact(web_pages(sf)).to_pandas() \
        .sort_values(["url_a", "url_b"]).reset_index(drop=True)
    want = con.execute(substring.longest_dup_spans_sql()).fetchdf() \
        .sort_values(["url_a", "url_b"]).reset_index(drop=True)
    assert len(got) > 0
    pd.testing.assert_frame_equal(got.sort_index(axis=1),
                                  want.sort_index(axis=1),
                                  check_dtype=False)
    # cross-check span lengths against the suffix-array kernel on a
    # sample of pairs
    pages = web_pages(sf).select_columns(["url", "text"]).to_pandas() \
        .set_index("url")["text"]
    import pyarrow as pa

    def toks(u):
        h, c = tokenize_batch(pa.chunked_array([pa.array([pages[u]])]))
        return h.astype("int64")

    for _, r in got.head(8).iterrows():
        ln, _, _ = longest_common_span(toks(r["url_a"]),
                                       toks(r["url_b"]))
        assert ln == r["span_tokens"]


def test_longest_dup_spans_exact_micro(ray_session):
    import ray.data
    """Hand-built: a 60-token copied block yields span 60 at the
    planted offsets; ties break to the smallest start pair."""
    words = [f"w{i}" for i in range(200)]
    block = " ".join(words[:60])
    docs = ray.data.from_items([
        {"url": "a", "text": block + " " + " ".join(words[100:160])},
        {"url": "b", "text": " ".join(words[160:180]) + " " + block},
    ])
    out = substring.longest_dup_spans_exact(docs).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["url_a"], r["url_b"]) == ("a", "b")
    assert r["span_tokens"] == 60
    assert r["start_a"] == 0 and r["start_b"] == 20


def test_dup_window_positions_matches_sql(ray_session):
    import duckdb

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    got = substring.dup_window_positions(web_pages(sf)).to_pandas() \
        .sort_values(["url", "pos"]).reset_index(drop=True)
    want = con.execute(substring.dup_window_positions_sql()).fetchdf() \
        .sort_values(["url", "pos"]).reset_index(drop=True)
    assert len(got) > 0
    pd.testing.assert_frame_equal(got.sort_index(axis=1),
                                  want.sort_index(axis=1),
                                  check_dtype=False)
    assert (got["n_docs"] >= 2).all()


def test_winnowed_positions_sha_matches_sql(ray_session):
    """The winnowing selection rule replayed bit-for-bit in DuckDB
    (list_reduce rolling hashes + struct-min leftmost argmin)."""
    import duckdb

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    got = substring.winnowed_positions_sha(web_pages(sf)).to_pandas() \
        .sort_values(["url", "pos"]).reset_index(drop=True)
    want = con.execute(substring.winnowed_positions_sql()).fetchdf() \
        .sort_values(["url", "pos"]).reset_index(drop=True)
    assert len(got) > 0
    pd.testing.assert_frame_equal(got.sort_index(axis=1),
                                  want.sort_index(axis=1),
                                  check_dtype=False)
