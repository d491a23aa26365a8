"""Keep-first duplicated-SPAN removal vs a pure-Python reference."""

import re

import pandas as pd
import ray.data

from data_dedup_ray.pipelines import spandedup


def _reference(docs: dict, k: int):
    toks = {u: re.findall(r"[a-z0-9]+", t.lower()) for u, t in docs.items()}
    occ = {}
    for u in sorted(toks):
        tl = toks[u]
        for p in range(len(tl) - k + 1):
            occ.setdefault(tuple(tl[p:p + k]), []).append((u, p))
    removed = {u: set() for u in toks}
    for w, os_ in occ.items():
        if len(os_) >= 2:
            for (u, p) in sorted(os_)[1:]:
                removed[u].update(range(p, p + k))
    return {
        u: (" ".join(t for i, t in enumerate(tl) if i not in removed[u]),
            len(removed[u]))
        for u, tl in toks.items()
    }


def _run(docs: dict, k: int, **kw):
    ds = ray.data.from_pandas(pd.DataFrame(
        {"url": list(docs), "text": list(docs.values())}))
    out = spandedup.substring_dedup_remove(ds, min_tokens=k, **kw).to_pandas()
    return {u: (t, int(n)) for u, t, n in
            zip(out["url"], out["clean_text"], out["n_removed_tokens"])}


def test_keep_first_across_docs():
    span = " ".join(f"w{i}" for i in range(6))
    docs = {
        "a": f"start one two {span} tail alpha",
        "b": f"other prefix {span} different ending",
        "c": "unrelated words only here nothing shared at all",
    }
    got = _run(docs, 5)
    want = _reference(docs, 5)
    assert got == want
    # the lexicographically-first occurrence (doc a) keeps the span
    assert "w0 w1 w2 w3 w4 w5" in got["a"][0]
    assert "w0" not in got["b"][0] and got["b"][1] >= 6


def test_within_doc_repetition_removed():
    span = " ".join(f"r{i}" for i in range(5))
    docs = {"solo": f"{span} middle filler words {span} end"}
    got = _run(docs, 5)
    want = _reference(docs, 5)
    assert got == want
    assert got["solo"][0].count("r0") == 1  # second occurrence excised


def test_untouched_docs_pass_through_normalized():
    docs = {"x": "Mixed CASE Words here", "y": "totally different content"}
    got = _run(docs, 3)
    assert got["x"] == ("mixed case words here", 0)
    assert got["y"] == ("totally different content", 0)


def test_partition_invariance_and_short_docs():
    span = " ".join(f"s{i}" for i in range(7))
    docs = {
        "a": f"{span} plus trailing words here",
        "b": f"lead in {span} and more",
        "tiny": "too short",
        "empty": "",
    }
    want = _reference(docs, 6)
    for P in (2, 4, 32):
        assert _run(docs, 6, num_partitions=P) == want
    assert want["tiny"][1] == 0 and want["empty"] == ("", 0)


def test_corpus_e2e_matches_reference(sf_dir):
    from data_dedup_ray.corpus import web_pages

    wp = web_pages(sf_dir)
    docs = dict(zip(*[wp.to_pandas()[c] for c in ("url", "text")]))
    got = _run(docs, 50)
    want = _reference(docs, 50)
    assert got == want
    assert sum(n for _, n in got.values()) > 0  # quote family planted dups


def _exposure_reference(docs: dict, k: int):
    """Brute-force: per doc, union of k-windows whose content occurs in
    >= 2 DISTINCT docs (every occurrence counts, first included)."""
    toks = {u: re.findall(r"[a-z0-9]+", t.lower()) for u, t in docs.items()}
    occ = {}
    for u, tl in toks.items():
        for p in range(len(tl) - k + 1):
            occ.setdefault(tuple(tl[p:p + k]), set()).add(u)
    out = {}
    for u, tl in toks.items():
        cov = set()
        for p in range(len(tl) - k + 1):
            if len(occ[tuple(tl[p:p + k])]) >= 2:
                cov.update(range(p, p + k))
        out[u] = (len(tl), len(cov))
    return out


def _run_exposure(docs: dict, k: int, **kw):
    ds = ray.data.from_pandas(pd.DataFrame(
        {"url": list(docs), "text": list(docs.values())}))
    out = spandedup.span_dup_exposure(ds, min_tokens=k, **kw).to_pandas()
    return {u: (int(n), int(d)) for u, n, d in
            zip(out["url"], out["n_tokens"], out["n_dup_tokens"])}


def test_exposure_matches_reference_and_counts_first_copy():
    w = " ".join(f"w{i}" for i in range(8))
    docs = {
        "a": w + " tail one extra",            # shares the 8-window with b
        "b": "lead words here " + w,
        "c": "totally different text with no shared span at all ok",
        "d": w,                                 # exact window only
    }
    got = _run_exposure(docs, 8, num_partitions=4)
    assert got == _exposure_reference(docs, 8)
    # EVERY copy is exposed — including the keep-first winner
    assert got["a"][1] == 8 and got["b"][1] == 8 and got["d"][1] == 8
    assert got["c"][1] == 0


def test_exposure_within_doc_repeat_not_cross_doc():
    w = " ".join(f"x{i}" for i in range(6))
    docs = {"solo": w + " break " + w,   # repeats only within one doc
            "other": "nothing shared here at all with six words pad"}
    got = _run_exposure(docs, 6, num_partitions=3)
    assert got["solo"][1] == 0  # cross-doc metric ignores self-repeats
    assert got["other"][1] == 0


def test_exposure_corpus_oracle_parity(sf_dir):
    import duckdb

    from data_dedup_ray.corpus import web_pages_sql

    got = (spandedup.span_dup_exposure_web(sf_dir).to_pandas()
           .sort_values("url").reset_index(drop=True))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    want = (con.execute(web_pages_sql(spandedup.span_dup_exposure_sql()))
            .fetchdf().sort_values("url").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["n_dup_tokens"] > 0).sum() > 100  # non-vacuous


def test_exposure_partition_invariance():
    w = " ".join(f"z{i}" for i in range(10))
    docs = {f"u{i}": (w if i % 2 else w + f" unique tail {i} pad pad")
            for i in range(8)}
    a = _run_exposure(docs, 10, num_partitions=1)
    b = _run_exposure(docs, 10, num_partitions=7)
    assert a == b
