"""b-bit MinHash tier (Li & König 2010): 16 B/doc packed lowest bits.
The sha variant is pinned bit-for-bit against the DuckDB restatement
(shared signature chain + v%2 projection); the estimator is pinned
against exact Jaccard (2c−1 law, planted-copy recall, error bound)."""

import json
import os
import shutil

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from data_dedup_ray.corpus import web_pages
from data_dedup_ray.pipelines import bbit, snapshots
from data_dedup_ray.stages.minhash import MinHashLSH

SF = "/root/testdata/sf0.001"
IDX = "/tmp/test_bbit_idx"
IDX_SHA = "/tmp/test_bbit_idx_sha"


def _ensure_idx(path, token_hash=None, ray_session=None):
    if not os.path.isdir(path):
        bbit.build_bbit_index(web_pages(SF), path, token_hash=token_hash)


def test_bbit_packing_matches_signature_bits(ray_session):
    """bit p of the blob == (per-perm minimum & 1), little-endian."""
    texts = ["the quick brown fox jumps over the lazy dog today",
             "a completely different document about ray data engines",
             "xy"]  # < k tokens → no shingles → empty blob
    m = MinHashLSH()
    sig, has = m.signatures(pa.chunked_array([pa.array(texts)]))
    t = pa.table({
        "url": pa.array([f"u{i}" for i in range(len(texts))]),
        "sig": pa.array(
            [sig[list(np.flatnonzero(has)).index(i)].tobytes()
             if has[i] else b"" for i in range(len(texts))],
            pa.large_binary()),
    })
    out = bbit.bbit_from_signatures(t)
    blobs = out["bsig"].to_pylist()
    assert blobs[2] == b""
    for row, blob in ((0, blobs[0]), (1, blobs[1])):
        k = list(np.flatnonzero(has)).index(row)
        want_bits = (sig[k] & np.uint64(1)).astype(np.uint8)
        got_bits = np.unpackbits(
            np.frombuffer(blob, np.uint8), bitorder="little")[:126]
        assert (got_bits == want_bits).all()
    # the whole tier is 16 bytes per doc
    assert {len(b) for b in blobs[:2]} == {16}


def test_match_counts_identical_and_padding():
    a = bytes([0b10101010] * 15 + [0b00101010])  # 126 bits + 2 pad 0s
    assert bbit.bbit_match_counts([a], [a], 126)[0] == 126
    flip = bytearray(a)
    flip[0] ^= 0b11  # 2 disagreements
    assert bbit.bbit_match_counts([a], [bytes(flip)], 126)[0] == 124


def test_sha_variant_matches_sql_bit_for_bit(ray_session):
    shutil.rmtree(IDX_SHA, ignore_errors=True)
    _ensure_idx(IDX_SHA, token_hash="sha")
    got = bbit.incremental_bbit_pairs(
        snapshots.snapshot2(SF), IDX_SHA, threshold=0.7,
        token_hash="sha",
    ).to_pandas().sort_values(["new_url", "index_url"]
                              ).reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    exp = con.execute(bbit.incremental_bbit_pairs_sql(0.7)).df(
    ).sort_values(["new_url", "index_url"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype(str), exp.astype(str))
    assert len(got) > 0


def test_index_layout_two_tiers(ray_session):
    shutil.rmtree(IDX, ignore_errors=True)
    _ensure_idx(IDX)
    for sub, kind, cols in (("bands", "bbit_band_store",
                             {"url", "band_id", "band_hash"}),
                            ("bsig", "bbit_store", {"url", "bsig"})):
        parts = [d for d in os.listdir(os.path.join(IDX, sub))
                 if d.startswith("part=")]
        assert parts, sub
        meta = json.load(open(os.path.join(IDX, sub, parts[0],
                                           "_META.json")))
        assert meta["config"]["kind"] == kind
        assert meta["config"]["n_perm"] == 126
        assert meta["config"]["b"] == 1
        t = pq.read_table(os.path.join(IDX, sub, parts[0],
                                       "data.parquet"))
        assert set(t.column_names) == cols
    # estimation tier really is 16 B (or empty) per doc
    widths = set()
    for d in os.listdir(os.path.join(IDX, "bsig")):
        t = pq.read_table(os.path.join(IDX, "bsig", d, "data.parquet"))
        widths |= {len(b) for b in t["bsig"].to_pylist()}
    assert widths <= {0, 16}


def test_query_config_mismatch_fails_loudly(ray_session, tmp_path):
    """A query whose signature parameters differ from the store's
    _META lineage config would silently produce garbage estimates —
    _read_tier validates and raises instead (ADVICE r3)."""
    import pytest

    docs = ray.data.from_items(
        [{"url": f"u{i}",
          "text": "alpha beta gamma delta epsilon zeta eta theta "
                  f"iota kappa lambda mu number {i}"}
         for i in range(3)])
    path = str(tmp_path / "idx")
    bbit.build_bbit_index(docs, path, n_perm=126, shingle_k=5)
    for kw in ({"shingle_k": 4}, {"seed": 7}, {"token_hash": "sha"}):
        with pytest.raises(ValueError, match="different configuration"):
            bbit.incremental_bbit_pairs(docs, path, **kw)
    # matching parameters still run
    assert bbit.incremental_bbit_pairs(
        docs, path, threshold=0.7).count() > 0


def test_scratch_dir_isolation():
    """Scratch stores key on the FULL input path + pid: same-basename
    corpora and concurrent sessions can't collide (ADVICE r3)."""
    from data_dedup_ray.util import scratch_dir

    a = scratch_dir("t", "/tmp/corpA/sf0.01", wipe=False)
    b = scratch_dir("t", "/tmp/corpB/sf0.01", wipe=False)
    assert a != b
    assert a == scratch_dir("t", "/tmp/corpA/sf0.01", wipe=False)
    assert str(os.getpid()) in a
    # wipe clears stale content
    os.makedirs(os.path.join(a, "stale"), exist_ok=True)
    assert not os.path.isdir(scratch_dir("t", "/tmp/corpA/sf0.01"))


def test_planted_exact_copies_and_estimator(ray_session, tmp_path):
    """Unchanged re-crawl pages agree on every bit (est 10000, recall
    1.0); near-identical pages estimate within the binomial bound of
    exact Jaccard transformed through c = (1+J)/2."""
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi "
            "psi omega one two three four five six seven eight nine")
    idx_docs = ray.data.from_items(
        [{"url": f"i{j}", "text": base + f" tail{j}"} for j in range(4)])
    new_docs = ray.data.from_items(
        [{"url": "n0", "text": base + " tail0"},      # exact copy of i0
         {"url": "n1", "text": "unrelated words entirely distinct "
                               "corpus page about something else "
                               "with many novel tokens here today"}])
    path = str(tmp_path / "idx")
    bbit.build_bbit_index(idx_docs, path)
    got = bbit.incremental_bbit_pairs(new_docs, path, threshold=0.7) \
        .to_pandas()
    exact = got[(got["new_url"] == "n0") & (got["index_url"] == "i0")]
    assert len(exact) == 1
    assert exact["n_match"].iloc[0] == 126
    assert exact["est_bp"].iloc[0] == 10000
    # the unrelated page never crosses the 0.7 estimate bar
    assert (got["new_url"] == "n1").sum() == 0


def test_partition_invariance(ray_session, tmp_path):
    docs = web_pages(SF)
    outs = []
    for p in (4, 16):
        path = str(tmp_path / f"idx{p}")
        bbit.build_bbit_index(docs, path, num_partitions=p)
        outs.append(bbit.incremental_bbit_pairs(
            snapshots.snapshot2(SF), path, num_partitions=p)
            .to_pandas().sort_values(["new_url", "index_url"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
