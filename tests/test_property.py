"""Property-based tests (hypothesis) for the pure kernels — coverage the
reference's example-based suite never had (SURVEY.md §5: no property
framework in the reference).  All tests here are Ray-free."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from data_dedup_ray.engine.exchange import key_partition
from data_dedup_ray.pipelines.near import _pairs_in_partition
from data_dedup_ray.pipelines.urls import canonicalize_url
from data_dedup_ray.stages.minhash import shingle_sets
from data_dedup_ray.stages.simhash import popcount64

# ---------------------------------------------------------------- urls

_host = st.from_regex(r"[A-Za-z0-9][A-Za-z0-9.-]{0,20}", fullmatch=True)
_path = st.from_regex(r"(/[A-Za-z0-9_.~-]{0,8}){0,4}/?", fullmatch=True)
_query = st.lists(
    st.from_regex(r"[A-Za-z0-9_]{1,8}=[A-Za-z0-9_]{0,8}", fullmatch=True),
    max_size=4,
).map("&".join)
_frag = st.from_regex(r"(#[A-Za-z0-9_-]{0,8})?", fullmatch=True)
_url = st.builds(
    lambda s, h, p, q, f: f"{s}://{h}{p}" + (f"?{q}" if q else "") + f,
    st.sampled_from(["http", "https", "HTTP", "HTTPS"]),
    _host, _path, _query, _frag,
)


@given(_url)
@settings(max_examples=300, deadline=None)
def test_canonicalize_idempotent(u):
    once = canonicalize_url(u)
    assert canonicalize_url(once) == once


@given(_url)
@settings(max_examples=300, deadline=None)
def test_canonicalize_invariants(u):
    c = canonicalize_url(u)
    assert "#" not in c
    scheme, rest = c.split("://", 1)
    assert scheme == scheme.lower()
    host = rest.split("/", 1)[0].split("?", 1)[0]
    assert host == host.lower()
    assert not host.startswith("www.")
    assert not host.endswith(":443") if scheme == "https" else True
    # no tracking params survive
    if "?" in c:
        for p in c.split("?", 1)[1].split("&"):
            assert not p.startswith(("utm_", "fbclid", "gclid"))


@given(st.sampled_from(["http", "https"]), _host, _path, _query)
@settings(max_examples=200, deadline=None)
def test_canonicalize_alias_invariance(scheme, host, path, q):
    """Known alias transforms must map to the same canonical form."""
    base = f"{scheme}://{host}{path}" + (f"?{q}" if q else "")
    c = canonicalize_url(base)
    default = "443" if scheme == "https" else "80"
    aliases = [
        base + "#frag",
        f"{scheme.upper()}://{host.upper()}{path}" + (f"?{q}" if q else ""),
        f"{scheme}://www.{host}{path}" + (f"?{q}" if q else ""),
        f"{scheme}://{host}:{default}{path}" + (f"?{q}" if q else ""),
    ]
    for a in aliases:
        assert canonicalize_url(a) == c, a


# ------------------------------------------------------------- exchange


@given(
    st.lists(st.text(min_size=0, max_size=12), min_size=0, max_size=50),
    st.integers(min_value=1, max_value=64),
)
@settings(max_examples=200, deadline=None)
def test_key_partition_range_and_determinism(keys, P):
    a = key_partition(keys, P)
    b = key_partition(keys, P)
    assert (a == b).all()
    assert ((a >= 0) & (a < P)).all()
    # equal keys get equal partitions regardless of position
    m = {}
    for k, p in zip(keys, a):
        assert m.setdefault(k, p) == p


# ---------------------------------------------------------- pair kernel


@given(
    st.lists(st.integers(min_value=0, max_value=5), min_size=2, max_size=120),
    st.integers(min_value=2, max_value=30),
)
@settings(max_examples=100, deadline=None)
def test_pairs_in_partition_connectivity(groups, cap):
    """Every multi-member group must come out connected (all-pairs below
    the cap, star above it) with url_a < url_b and no duplicates."""
    g = pd.DataFrame({
        "band_id": np.zeros(len(groups), np.int32),
        "band_hash": np.asarray(groups, np.int64),
        "url": [f"u{i:03d}" for i in range(len(groups))],
    })
    out = _pairs_in_partition(
        g, key_cols=["band_id", "band_hash"], id_col="url", group_cap=cap
    )
    assert (out["url_a"] < out["url_b"]).all()
    assert not out.duplicated(["url_a", "url_b"]).any()
    # connectivity per group
    from data_dedup_ray.pipelines.components import dsu_components

    comp = dsu_components(out) if len(out) else {}
    for gv in set(groups):
        members = sorted(g.loc[g["band_hash"] == gv, "url"])
        if len(members) > 1:
            roots = {comp.get(m, m) for m in members}
            assert len(roots) == 1
    # edge-count law: all-pairs below cap, star above
    sizes = g.groupby("band_hash").size()
    want = sum(
        (s * (s - 1) // 2 if s <= cap else s - 1) for s in sizes if s > 1
    )
    assert len(out) == want


# ------------------------------------------------------------- kernels


@given(st.lists(st.text(alphabet="ab ", min_size=0, max_size=60),
                min_size=0, max_size=20))
@settings(max_examples=100, deadline=None)
def test_shingle_sets_counts(texts):
    cat, sizes = shingle_sets(texts, 3)
    assert len(sizes) == len(texts)
    assert sizes.sum() == len(cat)
    for s, t in zip(sizes, texts):
        toks = [w for w in t.split() if w]
        n_windows = max(len(toks) - 2, 0)
        assert s <= n_windows  # distinct shingles ≤ windows
        assert (s == 0) == (n_windows == 0)


@given(st.lists(st.text(min_size=0, max_size=40), min_size=0, max_size=15))
@settings(max_examples=100, deadline=None)
def test_tokenize_polars_matches_regex_fallback(texts):
    """The polars fast path and the regex-findall fallback must agree on
    token COUNTS for arbitrary unicode input (hash values differ by
    design — identity only needs within-run consistency), and arrow-column
    input must equal list input bit-for-bit."""
    import pyarrow as pa

    from data_dedup_ray.stages.minhash import TOKEN_RE, tokenize_batch

    h_list, c_list = tokenize_batch(texts)
    h_arrow, c_arrow = tokenize_batch(pa.chunked_array([pa.array(
        texts, pa.string())]))
    assert c_list.tolist() == c_arrow.tolist()
    assert h_list.tolist() == h_arrow.tolist()
    want = [len(TOKEN_RE.findall(t)) if t else 0 for t in texts]
    assert c_list.tolist() == want
    assert len(h_list) == sum(want)


@given(st.lists(st.text(min_size=0, max_size=40), min_size=0, max_size=15),
       st.booleans())
@settings(max_examples=100, deadline=None)
def test_token_counts_matches_findall(texts, lowercase):
    """The vectorized count path must agree with the per-row
    regex-findall convention for arbitrary unicode, in both case
    modes, for list and arrow-column input."""
    import pyarrow as pa

    from data_dedup_ray.stages.minhash import TOKEN_RE, token_counts

    got = token_counts(texts, lowercase=lowercase)
    got_arrow = token_counts(
        pa.chunked_array([pa.array(texts, pa.string())]),
        lowercase=lowercase)
    want = [len(TOKEN_RE.findall(t.lower() if lowercase else t))
            if t else 0 for t in texts]
    assert got.tolist() == want
    assert got_arrow.tolist() == want


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1),
                min_size=0, max_size=50))
@settings(max_examples=100, deadline=None)
def test_popcount64_matches_python(vals):
    arr = np.asarray(vals, dtype=np.uint64)
    got = popcount64(arr)
    assert [int(x) for x in got] == [bin(v).count("1") for v in vals]


@given(
    st.integers(1, 24), st.integers(1, 24),
    st.sampled_from([1, 2, 3, 4]),
    st.lists(st.integers(0, 4), min_size=24, max_size=24),
    st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_property(w, h, ch, filters, seed):
    """decode(encode(px)) == px for arbitrary dims, channel counts, and
    per-row filter choices — the PNG codec is lossless by definition."""
    from data_dedup_ray.stages.multimodal import (decode_png_pixels,
                                                  encode_png_from_pixels)

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
    blob = encode_png_from_pixels(px, filters=filters[:h])
    assert np.array_equal(decode_png_pixels(blob), px)


@given(
    st.integers(1, 6), st.integers(1, 6),
    st.lists(st.integers(-32, 32), min_size=36, max_size=36),
)
@settings(max_examples=30, deadline=None)
def test_jpeg_dc_only_property(bw, bh, offsets):
    """Any grayscale image of constant 8x8 blocks with EVEN offsets from
    128 survives the full JPEG encode/decode cycle bit-exactly (DC-only,
    quantization divides evenly) — the invariant the driver oracle uses."""
    from data_dedup_ray.stages.jpeg import (decode_jpeg_pixels,
                                            encode_jpeg_from_pixels)

    vals = 128 + 2 * np.array(offsets[: bw * bh], dtype=np.int64)
    px = np.repeat(np.repeat(vals.reshape(bh, bw), 8, 0), 8, 1) \
        .astype(np.uint8)
    dec = decode_jpeg_pixels(encode_jpeg_from_pixels(px, quality=50))
    assert np.array_equal(dec[:, :, 0], px)


# ------------------------------------------------- passage rebuild kernel


@given(
    st.lists(  # (doc_id, n_lines) per doc
        st.tuples(st.integers(0, 50), st.integers(0, 12)),
        min_size=1, max_size=8, unique_by=lambda t: t[0]),
    st.data(),
)
@settings(max_examples=150, deadline=None)
def test_rebuild_from_removals_matches_set_semantics(docs, data):
    """The searchsorted membership in clean._rebuild_from_removals equals
    naive per-passage set membership for arbitrary removal sets."""
    import pyarrow as pa

    from data_dedup_ray.pipelines.clean import _rebuild_from_removals

    k = 3
    ids, texts, all_packs = [], [], []
    for did, n_lines in docs:
        toks = [f"w{did}x{i}" for i in range(n_lines * k)]
        ids.append(did)
        texts.append(" ".join(toks))
        all_packs += [(np.int64(did) << np.int64(32)) | np.int64(p)
                      for p in range(n_lines)]
    removed = sorted(data.draw(st.sets(st.sampled_from(all_packs + [0]))))
    removed_arr = np.asarray(removed, dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = _rebuild_from_removals(t, removed_arr, k).to_pandas()
    rem_set = set(removed)
    for row, (did, n_lines) in zip(out.itertuples(), docs):
        toks = [f"w{did}x{i}" for i in range(n_lines * k)]
        lines = [" ".join(toks[i:i + k]) for i in range(0, len(toks), k)]
        keep = [ln for p, ln in enumerate(lines)
                if ((did << 32) | p) not in rem_set]
        assert row.clean_text == " ".join(keep)
        assert row.n_removed == len(lines) - len(keep)


# ------------------------------------------------- Misra-Gries batch trim


@given(st.lists(st.text(alphabet="abc", min_size=1, max_size=2),
                min_size=0, max_size=60),
       st.integers(1, 6))
@settings(max_examples=200, deadline=None)
def test_heavy_batch_counts_and_trim_guarantee(tokens, m):
    """pipelines/heavy's trim step: ≤ m survivors, every survivor's
    estimate undercounts its true count by exactly the trim threshold,
    and any token with true count > W/(m+1) survives."""
    from collections import Counter

    true = Counter(tokens)
    w = sum(true.values())
    counts = np.asarray(sorted(true.values(), reverse=True), dtype=np.int64)
    terms = np.asarray(
        sorted(true, key=lambda t: (-true[t], t)), dtype=object)
    if len(terms) > m:
        thr = np.partition(counts, len(counts) - (m + 1))[-(m + 1)]
        keep = counts > thr
        terms_o, counts_o = terms[keep], counts[keep] - thr
    else:
        thr = 0
        terms_o, counts_o = terms, counts
    assert len(terms_o) <= m
    est = dict(zip(terms_o, counts_o))
    for tok, c in true.items():
        if c > w / (m + 1):
            assert est.get(tok, 0) >= c - thr > 0
        if tok in est:
            assert est[tok] == c - thr


# ------------------------------------------------- session-16 kernels

_short = st.text(alphabet="ab0/x.", min_size=0, max_size=12)


@given(st.lists(st.tuples(_short, _short), min_size=1, max_size=60),
       st.integers(min_value=1, max_value=3))
@settings(max_examples=150, deadline=None)
def test_lev_banded_metric_laws(pairs, k):
    """Symmetry, identity, and parity with a reference DP (saturated)."""
    from data_dedup_ray.pipelines.editdist import lev_banded

    a = np.array([p[0] for p in pairs], dtype=object)
    b = np.array([p[1] for p in pairs], dtype=object)
    d_ab = lev_banded(a, b, k)
    d_ba = lev_banded(b, a, k)
    assert (d_ab == d_ba).all()
    d_aa = lev_banded(a, a, k)
    assert (d_aa == 0).all()

    def ref(x, y):
        prev = list(range(len(y) + 1))
        for i in range(1, len(x) + 1):
            cur = [i] + [0] * len(y)
            for j in range(1, len(y) + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (x[i - 1] != y[j - 1]))
            prev = cur
        return prev[-1]

    want = np.array([min(ref(x, y), k + 1) for x, y in pairs])
    assert (d_ab == want).all()


@given(st.lists(_short, min_size=1, max_size=40),
       st.integers(min_value=1, max_value=2))
@settings(max_examples=100, deadline=None)
def test_fastss_variant_hash_completeness(strs, k):
    """Any two strings within edit distance k share a variant hash."""
    from data_dedup_ray.pipelines.editdist import (
        deletion_variant_hashes, lev_banded)

    arr = np.array(sorted(set(strs)), dtype=object)
    if len(arr) < 2:
        return
    vh, ridx = deletion_variant_hashes(arr, k=k)
    byrow = {}
    for h, r in zip(vh, ridx):
        byrow.setdefault(int(r), set()).add(int(h))
    n = len(arr)
    d = lev_banded(np.repeat(arr, n), np.tile(arr, n), k).reshape(n, n)
    for i in range(n):
        for j in range(i + 1, n):
            if d[i, j] <= k:
                assert byrow[i] & byrow[j], (arr[i], arr[j])


@given(st.lists(
    st.tuples(st.sets(st.integers(0, 40), min_size=1, max_size=20),
              st.sets(st.integers(0, 40), min_size=1, max_size=20)),
    min_size=1, max_size=40),
    st.integers(min_value=1, max_value=8))
@settings(max_examples=100, deadline=None)
def test_bottomk_estimate_bounds(setpairs, k):
    """0 ≤ num ≤ den ≤ k and num/den = 1 ⟺ equal bottom-k sketches."""
    from data_dedup_ray.pipelines.bottomk import _estimate

    pids, vals = [], []
    sk = []
    for p, (A, B) in enumerate(setpairs):
        a = np.array(sorted(A), np.uint64)[:k]
        b = np.array(sorted(B), np.uint64)[:k]
        sk.append((a, b))
        pids.append(np.full(len(a) + len(b), p, np.int64))
        vals.append(np.concatenate([a, b]))
    num, den = _estimate(np.concatenate(pids), np.concatenate(vals),
                         k, len(setpairs))
    assert (num >= 0).all() and (num <= den).all() and (den <= k).all()
    for p, (a, b) in enumerate(sk):
        if num[p] == den[p] and den[p] > 0:
            # full agreement on U implies the sketches were equal on U
            u = np.unique(np.concatenate([a, b]))[:k]
            assert set(u) <= (set(a.tolist()) & set(b.tolist()))


@given(st.integers(min_value=0, max_value=2**64 - 1),
       st.integers(min_value=0, max_value=200),
       st.integers(min_value=1, max_value=5))
@settings(max_examples=200, deadline=None)
def test_icws_uniform_open_interval(v, k, slot):
    """Derived uniforms are strictly inside (0,1) — every log finite."""
    from data_dedup_ray.pipelines.icws import _uniform

    u = _uniform(np.array([v], np.uint64), k, slot)
    assert 0.0 < u[0] < 1.0


@given(st.lists(st.tuples(st.integers(0, 10**6),
                          st.text(alphabet="abc/0", min_size=1,
                                  max_size=8)),
                min_size=1, max_size=50))
@settings(max_examples=150, deadline=None)
def test_inverted_fixed_width_composite_order(pairs):
    """budget.py's composite rule: ascending string order of
    (10^W-1-n zero-padded) + NUL + url  ==  (n DESC, url ASC)."""
    W = 12
    comps = [f"{10**W - 1 - n:0{W}d}\x00{u}" for n, u in pairs]
    by_comp = [pairs[i] for i in np.argsort(np.array(comps, dtype=object),
                                            kind="stable")]
    by_rule = sorted(pairs, key=lambda p: (-p[0], p[1]))
    assert by_comp == by_rule


@given(st.lists(st.text(alphabet="ab ", min_size=0, max_size=40),
                min_size=1, max_size=20),
       st.integers(min_value=1, max_value=4))
@settings(max_examples=100, deadline=None)
def test_weighted_shingles_mass_law(texts, k):
    """Per-doc total window count = max(0, n_tokens - k + 1), and the
    per-value counts sum to it (no mass lost to the dedup)."""
    import re

    from data_dedup_ray.pipelines.weighted import _weighted_shingles

    vals, cnts, sizes, totals = _weighted_shingles(texts, k)
    starts = np.concatenate([[0], np.cumsum(sizes)])
    for i, t in enumerate(texts):
        ntok = len(re.findall(r"[a-z0-9]+", t))
        want = max(0, ntok - k + 1)
        assert totals[i] == want
        assert cnts[starts[i]:starts[i + 1]].sum() == want


# ---------------------------------------------------- fixed ICWS chain

_wsets = st.lists(
    st.dictionaries(
        st.integers(min_value=0, max_value=(1 << 64) - 1),
        st.integers(min_value=1, max_value=10_000),  # exercises the 4096 cap
        min_size=1, max_size=12),
    min_size=1, max_size=5)


@given(_wsets)
@settings(max_examples=25, deadline=None)
def test_fixed_icws_chain_matches_duckdb_on_arbitrary_multisets(sets):
    """The ENTIRE integer fixed-ICWS chain (xorshift draw hash, table
    lookups, t, score, argmin with (score, s) tie-break, count cap) is
    bit-identical between numpy and DuckDB for arbitrary multisets —
    not just the synthetic corpus."""
    import duckdb

    from data_dedup_ray.pipelines import icws

    K = 8
    vals = np.concatenate(
        [np.array(sorted(d), np.uint64) for d in sets])
    cnts = np.concatenate(
        [np.array([d[k] for k in sorted(d)], np.int64) for d in sets])
    sizes = np.array([len(d) for d in sets], np.int64)
    sv, stt = icws.icws_fixed_signatures_flat(vals, cnts, sizes,
                                              n_samples=K)

    rows = []
    for i, d in enumerate(sets):
        for k in sorted(d):
            rows.append(f"('d{i}', {k}::UBIGINT, {d[k]})")
    shc = ("\nWITH raw(id, s, c) AS (SELECT * FROM (VALUES "
           + ", ".join(rows) + ")),\n"
           "shc AS (SELECT id, s, least(CAST(c AS BIGINT), 4096) AS c"
           " FROM raw)")
    sql = (icws._fixed_chain_ctes(shc_sql=shc, n_samples=K)
           + "\nSELECT id, k, v, t FROM sel ORDER BY id, k")
    got = duckdb.connect().execute(sql).fetchdf()
    for i in range(len(sets)):
        sub = got[got["id"] == f"d{i}"].sort_values("k")
        assert len(sub) == K
        assert (sub["v"].to_numpy().astype(np.uint64) == sv[i]).all()
        assert (sub["t"].to_numpy().astype(np.int64) == stt[i]).all()


# ------------------------------------------------ weighted verify laws


@given(_wsets)
@settings(max_examples=25, deadline=None)
def test_weighted_reductions_match_bruteforce(sets):
    """The vectorized Σmin verify (rank-packed searchsorted +
    weights-bincount) must equal the dict brute force for BOTH
    reductions — Jaccard Σmin/Σmax and directional containment
    Σmin/|A| — on arbitrary multisets."""
    import pyarrow as pa

    from data_dedup_ray.pipelines.weighted import _wjac_verify

    docs = [dict(d) for d in sets]
    ids = [f"d{i}" for i in range(len(docs))]
    blobs = {
        "sv": [np.array(sorted(d), np.uint64).tobytes() for d in docs],
        "sc": [np.array([d[k] for k in sorted(d)],
                        np.int64).tobytes() for d in docs],
        "w": [int(sum(d.values())) for d in docs],
    }
    bt = pa.table({"url": ids, **blobs})
    pairs = [(i, j) for i in range(len(docs))
             for j in range(i + 1, len(docs))]
    if not pairs:
        return
    pt = pa.table({
        "url_a": [ids[i] for i, _ in pairs],
        "url_b": [ids[j] for _, j in pairs],
        "sv_a": pa.array([blobs["sv"][i] for i, _ in pairs],
                         pa.large_binary()),
        "sc_a": pa.array([blobs["sc"][i] for i, _ in pairs],
                         pa.large_binary()),
        "w_a": [blobs["w"][i] for i, _ in pairs],
    })

    def smin(a, b):
        return sum(min(a.get(k, 0), b.get(k, 0)) for k in a)

    jac = _wjac_verify(pt, bt, id_col="url", min_wjac_bp=0).to_pandas()
    got_j = {(r.url_a, r.url_b): r.wjac_bp for r in jac.itertuples()}
    cont = _wjac_verify(pt, bt, id_col="url", min_wjac_bp=0,
                        metric="containment").to_pandas()
    got_c = {(r.url_a, r.url_b): r.wcont_bp for r in cont.itertuples()}
    for i, j in pairs:
        a, b = docs[i], docs[j]
        m = smin(a, b)
        wa, wb = sum(a.values()), sum(b.values())
        assert got_j[(ids[i], ids[j])] == (10000 * m) // max(wa + wb - m, 1)
        assert got_c[(ids[i], ids[j])] == (10000 * m) // max(wa, 1)
        assert got_c[(ids[j], ids[i])] == (10000 * m) // max(wb, 1)


# ------------------------------------------------------ extract_text


@given(st.lists(
    st.text(alphabet=st.characters(blacklist_characters="<>",
                                   blacklist_categories=("Cs",)),
            max_size=120),
    min_size=1, max_size=8))
@settings(max_examples=100, deadline=None)
def test_extract_text_inverts_corpus_html(texts):
    """extract_text(html) == text for ANY tag-free payload wrapped in
    the corpus html skeleton (the input_hint invariant as a law, not
    just over the synthetic corpus), and the polars fast path agrees
    with the pure-Python fallback."""
    import pyarrow as pa

    from data_dedup_ray.corpus import HTML_POST, HTML_PRE_A, HTML_PRE_B
    from data_dedup_ray.stages.extract import _extract_one, extract_text

    html = [(HTML_PRE_A + str(i) + HTML_PRE_B + t + HTML_POST)
            .encode("utf-8") for i, t in enumerate(texts)]
    batch = pa.table({"html": pa.array(html, pa.binary())})
    out = extract_text(batch)["extracted_text"].to_pylist()
    assert out == texts
    assert [_extract_one(h) for h in html] == texts
