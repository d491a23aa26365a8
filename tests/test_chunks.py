"""Chunk-level dedup: fixed-size SQL-oracle parity + CDC properties."""

import hashlib

import duckdb
import numpy as np
import pytest

from data_dedup_ray.pipelines import chunks

SF = "/root/testdata/sf0.001"


def _hash(b: bytes) -> str:
    return hashlib.sha256(b.hex().encode()).hexdigest()


def _cdc_chunks_of(data: bytes, **kw) -> list:
    arr = np.frombuffer(data, dtype=np.uint8)
    starts, ends = chunks.cdc_boundaries(
        arr, np.array([0, len(arr)], np.int64), **kw)
    return [data[s:e] for s, e in zip(starts, ends)]


@pytest.fixture(scope="module")
def blob():
    rng = np.random.default_rng(7)
    return rng.integers(0, 256, size=20_000, dtype=np.uint8).tobytes()


def test_fixed_chunk_oracle_parity(ray_session):
    from data_dedup_ray.oracles import chunk_dedup_fixed_sql

    got = (chunks.chunk_dedup_fixed(SF).to_pandas()
           .sort_values("chunk_hash").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = (con.execute(chunk_dedup_fixed_sql()).fetchdf()
            .sort_values("chunk_hash").reset_index(drop=True))
    assert list(got.columns) == ["chunk_hash", "n_copies", "chunk_len",
                                 "canonical_url"]
    assert len(got) == len(want) > 0
    for c in got.columns:
        assert (got[c].astype(str).values == want[c].astype(str).values).all()


def test_cdc_reconstruction_and_bounds(blob):
    cs = _cdc_chunks_of(blob, min_size=64, avg_size=256, max_size=1024)
    assert b"".join(cs) == blob
    lens = [len(c) for c in cs]
    assert all(length <= 1024 for length in lens)
    # every chunk except possibly the last respects min_size
    assert all(length >= 64 for length in lens[:-1])
    # avg in the right ballpark (gear mask = avg-1 plus the clamp)
    assert 128 <= len(blob) / len(cs) <= 1024


def test_cdc_deterministic(blob):
    a = [_hash(c) for c in _cdc_chunks_of(blob)]
    b = [_hash(c) for c in _cdc_chunks_of(blob)]
    assert a == b


def test_cdc_shift_resilience_vs_fixed(blob):
    """Prepending bytes re-syncs CDC within ~one chunk; fixed-offset
    chunking loses (almost) everything — the reason CDC exists."""
    prefix = b"\x00" * 137  # not a multiple of the fixed chunk size
    shifted = prefix + blob

    base_cdc = {_hash(c) for c in _cdc_chunks_of(blob)}
    shift_cdc = {_hash(c) for c in _cdc_chunks_of(shifted)}
    cdc_kept = len(base_cdc & shift_cdc) / len(base_cdc)

    def fixed_hashes(data: bytes, L: int = 512) -> set:
        return {_hash(data[i: i + L]) for i in range(0, len(data), L)}

    fixed_kept = (len(fixed_hashes(blob) & fixed_hashes(shifted))
                  / len(fixed_hashes(blob)))
    assert cdc_kept >= 0.8
    assert fixed_kept <= 0.1
    assert cdc_kept > fixed_kept


def test_cdc_boundaries_doc_independent(blob):
    """Chunking two docs in one batch equals chunking each alone —
    boundaries never leak across doc segments."""
    arr = np.frombuffer(blob, dtype=np.uint8)
    half = len(arr) // 2
    joint_s, joint_e = chunks.cdc_boundaries(
        arr, np.array([0, half, len(arr)], np.int64))
    a_s, a_e = chunks.cdc_boundaries(arr[:half], np.array([0, half], np.int64))
    b_s, b_e = chunks.cdc_boundaries(arr[half:],
                                     np.array([0, len(arr) - half], np.int64))
    assert joint_s.tolist() == a_s.tolist() + (b_s + half).tolist()
    assert joint_e.tolist() == a_e.tolist() + (b_e + half).tolist()


def test_cdc_stats_find_mirror_dups(ray_session):
    """mirror pages are byte-identical to their base page, so every one of
    their CDC chunks must appear in a multi-copy group."""
    got = chunks.cdc_chunk_stats(SF).to_pandas()
    assert len(got) > 0
    assert (got["n_copies"] >= 2).all()
    rows = chunks.cdc_chunk_rows(
        chunks.web_pages(SF).select_columns(["url", "html"])).to_pandas()
    mirror = rows[rows["url"].str.startswith("https://mirror.")]
    assert len(mirror) > 0
    assert set(mirror["chunk_hash"]).issubset(set(got["chunk_hash"]))


def test_fixed_rows_cover_blob(ray_session):
    rows = chunks.fixed_chunk_rows(
        chunks.web_pages(SF).select_columns(["url", "html"]),
        chunk_size=512).to_pandas()
    pages = chunks.web_pages(SF).select_columns(["url", "html"]).to_pandas()
    per_url = rows.groupby("url")["chunk_len"].sum()
    for url, html in zip(pages["url"], pages["html"]):
        assert per_url.get(url, 0) == len(html)


def test_chunk_delta_fixed_oracle_parity(ray_session):
    from data_dedup_ray.oracles import chunk_delta_snap2_sql

    got = (chunks.chunk_delta_snap2(SF).to_pandas()
           .sort_values("url").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = (con.execute(chunk_delta_snap2_sql()).fetchdf()
            .sort_values("url").reset_index(drop=True))
    assert len(got) == len(want) > 0
    g = got.sort_index(axis=1)
    w = want.sort_index(axis=1)
    assert list(g.columns) == list(w.columns)
    for c in g.columns:
        assert (g[c].astype(str).values == w[c].astype(str).values).all()
    # semantics: the re-crawl revisits doc_id % 3 == 0; the % 6 == 0
    # captures are byte-identical to snapshot 1, so their delta is zero
    unchanged = got[got["url"].str.rsplit("/", n=1).str[-1]
                    .astype(int) % 6 == 0]
    assert len(unchanged) > 0
    assert (unchanged["n_new_chunks"] == 0).all()
    edited = got[got["url"].str.rsplit("/", n=1).str[-1]
                 .astype(int) % 6 != 0]
    assert (edited["n_new_chunks"] > 0).all()


def test_chunk_delta_cdc_resync(ray_session):
    """CDC's reason to exist: an edit's delta is O(edit ± one chunk),
    not O(page) — and byte-identical re-crawls ship nothing."""
    got = chunks.chunk_delta_snap2_cdc(SF).to_pandas()
    assert len(got) > 0
    ids = got["url"].str.rsplit("/", n=1).str[-1].astype(int)
    unchanged = got[ids % 6 == 0]
    assert len(unchanged) > 0 and (unchanged["n_new_chunks"] == 0).all()
    # the trailing edit touches at most the final chunk plus the suffix:
    # bounded by max_size + edit bytes, far below whole-page re-ingest
    edited = got[ids % 6 != 0]
    assert len(edited) > 0
    assert (edited["new_bytes"] <= 1024 + 64).all()


def _pages(items):
    import ray.data

    return ray.data.from_items(
        [{"url": u, "html": h} for u, h in items])


def test_chunk_store_build_and_gc_micro(ray_session, tmp_path):
    """Hand-checked mark-and-sweep: store = chunks of {A, B}, live
    corpus keeps A's bytes and drops B → B's chunks are the orphans."""
    a = b"x" * 512 + b"y" * 512           # 2 chunks
    b_ = b"z" * 512 + b"w" * 100          # 2 chunks (one short tail)
    store = str(tmp_path / "store")
    chunks.build_chunk_store(
        _pages([("a", a), ("b", b_)]), store, chunk_size=512)
    got = (chunks.chunk_store_gc(store, _pages([("a2", a)]),
                                 chunk_size=512)
           .to_pandas().sort_values("chunk_hash").reset_index(drop=True))
    want = sorted([_hash(b"z" * 512), _hash(b"w" * 100)])
    assert list(got["chunk_hash"]) == want
    assert sorted(got["chunk_len"]) == [100, 512]


def test_chunk_store_layout_and_lineage(ray_session, tmp_path):
    import json
    import os

    store = str(tmp_path / "store")
    chunks.build_chunk_store(
        _pages([("a", b"q" * 700)]), store, chunk_size=512,
        num_partitions=4)
    parts = [d for d in os.listdir(store) if d.startswith("part=")]
    assert parts, "hash-partitioned part= dirs expected"
    meta = json.load(open(os.path.join(store, parts[0], "_META.json")))
    assert meta["config"]["kind"] == "chunk_store"
    assert meta["config"]["chunk_size"] == 512
    # the store holds each chunk identity exactly once
    import ray.data

    rows = ray.data.read_parquet(
        [os.path.join(store, p, "data.parquet") for p in parts],
        partitioning=None).to_pandas()
    assert rows["chunk_hash"].is_unique
    assert set(rows["chunk_hash"]) == {_hash(b"q" * 512),
                                       _hash(b"q" * 188)}


def test_chunk_gc_laws(ray_session, tmp_path):
    """Identical live corpus → zero orphans; empty live corpus → the
    whole store is orphaned; orphans never intersect live chunks."""
    pages = [("a", b"m" * 1000), ("b", b"n" * 300)]
    store = str(tmp_path / "store")
    chunks.build_chunk_store(_pages(pages), store, chunk_size=512)
    same = chunks.chunk_store_gc(store, _pages(pages), chunk_size=512)
    assert same.count() == 0
    all_gone = (chunks.chunk_store_gc(store, _pages([("z", b"")]),
                                      chunk_size=512).to_pandas())
    assert len(all_gone) == 3  # m×512, m×488, n×300
    assert int(all_gone["chunk_len"].sum()) == 1300


def test_chunk_gc_snap2_oracle_parity(ray_session, tmp_path):
    from data_dedup_ray.oracles import chunk_gc_snap2_sql

    got = (chunks.chunk_gc_snap2(
        SF, store_path=str(tmp_path / "store")).to_pandas()
        .sort_values("chunk_hash").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = (con.execute(chunk_gc_snap2_sql()).fetchdf()
            .sort_values("chunk_hash").reset_index(drop=True))
    assert len(got) == len(want) > 0
    for c in ["chunk_hash", "chunk_len"]:
        assert (got[c].astype(str).values == want[c].astype(str).values).all()


def test_chunk_gc_partition_invariance(ray_session, tmp_path):
    pages = [("a", b"x" * 900), ("b", b"y" * 512), ("c", b"x" * 900)]
    live = [("k", b"y" * 512)]
    outs = []
    for p in (1, 5):
        store = str(tmp_path / f"store{p}")
        chunks.build_chunk_store(_pages(pages), store, chunk_size=512,
                                 num_partitions=p)
        outs.append(chunks.chunk_store_gc(
            store, _pages(live), chunk_size=512, num_partitions=p)
            .to_pandas().sort_values("chunk_hash")
            .reset_index(drop=True))
    assert outs[0].equals(outs[1])


def test_chunk_overlap_oracle_parity(ray_session):
    import pandas as pd

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    got = chunks.chunk_overlap_web(SF).to_pandas() \
        .sort_values(["url_a", "url_b"]).reset_index(drop=True)
    want = con.execute(chunks.chunk_overlap_pairs_sql()).fetchdf() \
        .sort_values(["url_a", "url_b"]).reset_index(drop=True)
    assert len(got) > 0
    pd.testing.assert_frame_equal(got.sort_index(axis=1),
                                  want.sort_index(axis=1),
                                  check_dtype=False)


def test_chunk_overlap_micro_and_laws(ray_session):
    """Hand-built overlap: B embeds both of A's chunks (containment
    10000); C shares one chunk with A/B — below min_shared=2 it
    vanishes, at min_shared=1 it appears."""
    ca, cb, cc = b"x" * 512, b"y" * 512, b"z" * 512
    pages = [("a", ca + cb), ("b", ca + cb + cc), ("c", ca + b"w" * 512)]
    out = chunks.chunk_overlap_pairs(
        _pages(pages), chunk_size=512).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["url_a"], r["url_b"]) == ("a", "b")
    assert r["n_shared"] == 2 and r["n_a"] == 2 and r["n_b"] == 3
    assert r["containment_bp"] == 10000
    loose = chunks.chunk_overlap_pairs(
        _pages(pages), chunk_size=512, min_shared=1).to_pandas()
    assert set(zip(loose["url_a"], loose["url_b"])) == {
        ("a", "b"), ("a", "c"), ("b", "c")}
    # hot-cap: the shared chunk sits on all 3 pages; cap 2 removes
    # every pair that relied on it
    capped = chunks.chunk_overlap_pairs(
        _pages(pages), chunk_size=512, min_shared=1,
        hot_cap=2).to_pandas()
    assert set(zip(capped["url_a"], capped["url_b"])) == {("a", "b")}


def test_chunk_overlap_partition_invariance(ray_session):
    import pandas as pd

    outs = [chunks.chunk_overlap_web(SF)
            if p is None else
            chunks.chunk_overlap_pairs(
                chunks.web_pages(SF).select_columns(["url", "html"]),
                num_partitions=p)
            for p in (None, 5)]
    dfs = [o.to_pandas().sort_values(["url_a", "url_b"])
           .reset_index(drop=True) for o in outs]
    pd.testing.assert_frame_equal(dfs[0], dfs[1])


def test_host_template_oracle_parity(ray_session):
    import pandas as pd

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    got = chunks.host_template_web(SF).to_pandas() \
        .sort_values(["host", "chunk_hash"]).reset_index(drop=True)
    want = con.execute(
        chunks.host_template_chunks_sql(min_coverage_bp=200)).fetchdf() \
        .sort_values(["host", "chunk_hash"]).reset_index(drop=True)
    assert len(got) > 0
    pd.testing.assert_frame_equal(got.sort_index(axis=1),
                                  want.sort_index(axis=1),
                                  check_dtype=False)


def test_host_template_micro(ray_session):
    """Hand-built host: a shared 512 B chunk on 3 of 4 pages is a
    template (7500 bp); a chunk on 1 page never appears; a repeated
    chunk WITHIN one page counts that page once."""
    t, u = b"T" * 512, b"U" * 512
    pages = [(f"https://a.example/p/{i}", t + bytes([65 + i]) * 512)
             for i in range(3)]
    pages.append(("https://a.example/p/3", u + u))  # within-page repeat
    out = chunks.host_template_chunks(
        _pages(pages), chunk_size=512, min_coverage_bp=5000,
        min_pages=2).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["host"] == "a.example"
    assert r["n_pages"] == 3 and r["host_pages"] == 4
    assert r["coverage_bp"] == 7500
    # dropping the coverage bar does NOT resurrect the within-page
    # repeat (distinct-per-page) or singleton chunks (min_pages)
    loose = chunks.host_template_chunks(
        _pages(pages), chunk_size=512, min_coverage_bp=0,
        min_pages=2).to_pandas()
    assert len(loose) == 1


def test_incremental_chunk_overlap_oracle_parity(ray_session):
    import pandas as pd

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    got = chunks.incremental_chunk_overlap_snap2(SF).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    want = con.execute(chunks.incremental_chunk_overlap_sql()).fetchdf() \
        .sort_values("url").reset_index(drop=True)
    assert len(got) > 0
    pd.testing.assert_frame_equal(got.sort_index(axis=1),
                                  want.sort_index(axis=1),
                                  check_dtype=False)
    # one attribution row per new page; unchanged re-captures
    # attribute to their base self at full byte reuse
    assert got["url"].is_unique
    self_rows = got[got["url"] == got["index_url"]]
    assert len(self_rows) > 0
    assert (self_rows["reuse_bp"] <= 10000).all()


def test_incremental_chunk_overlap_micro(ray_session):
    """Hand-built attribution: a new page of chunks (X, Y) attributes
    to base page bXY (2 shared) over bX (1 shared); an all-novel new
    page is absent; ties break to the min index_url."""
    X, Y, Z = b"x" * 512, b"y" * 512, b"z" * 512
    base = [("bX", X + b"0" * 512), ("bXY", X + Y), ("bZ", Z)]
    new = [("n0", X + Y + b"n" * 512), ("n1", b"q" * 700)]
    out = chunks.incremental_chunk_overlap(
        _pages(new), _pages(base), chunk_size=512).to_pandas()
    assert set(out["url"]) == {"n0"}
    r = out.iloc[0]
    assert r["index_url"] == "bXY"
    assert r["n_shared"] == 2 and r["n_chunks"] == 3
    assert r["reuse_bp"] == 6666
    # tie: a new page sharing exactly one chunk with bX and bXY picks
    # the lexicographically smaller base url
    tie = chunks.incremental_chunk_overlap(
        _pages([("t0", X + b"t" * 512)]), _pages(base),
        chunk_size=512).to_pandas()
    assert tie.iloc[0]["index_url"] == "bX"


def test_cdc_oracle_parity(ray_session):
    """The gear-CDC boundary rule restated in SQL (low-bits reduction
    + recursive clamp walk) — multi-copy groups AND the cross-snapshot
    delta both match bit-for-bit."""
    import pandas as pd

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    got = chunks.cdc_chunk_stats(SF).to_pandas() \
        .sort_values("chunk_hash").reset_index(drop=True)
    want = con.execute(chunks.cdc_chunk_stats_sql()).fetchdf() \
        .sort_values("chunk_hash").reset_index(drop=True)
    assert len(got) > 0
    pd.testing.assert_frame_equal(got.sort_index(axis=1),
                                  want.sort_index(axis=1),
                                  check_dtype=False)
    gd = chunks.chunk_delta_snap2_cdc(SF).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    wd = con.execute(chunks.chunk_delta_cdc_sql()).fetchdf() \
        .sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(gd.sort_index(axis=1),
                                  wd.sort_index(axis=1),
                                  check_dtype=False)


def test_cdc_low_bits_reduction_law():
    """The mathematical claim the CDC SQL twin rests on: the gear
    hash's low 8 bits (the avg=256 boundary mask) equal the 8-term
    reduced sum Σ_{j<8} (GEAR[b(i−j)] mod 2^(8−j))·2^j mod 256 at
    every position i ≥ 63 — the other 56 window terms are shifted past
    the mask and cannot contribute."""
    rng = np.random.default_rng(11)
    data = rng.integers(0, 256, size=5000, dtype=np.uint8)
    h = chunks._gear_hashes(data)
    g = chunks._GEAR[data]
    want = np.zeros(len(data), dtype=np.int64)
    for j in range(8):
        term = (g[: len(data) - j if j else None] % (1 << (8 - j))) \
            * (1 << j)
        want[j:] = (want[j:] + term[: len(data) - j]) % 256
    got = (h & np.uint64(255)).astype(np.int64)
    assert (got[63:] == want[63:]).all()
