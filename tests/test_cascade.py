"""Engine-level conformance tests — ports of the reference Engine unit tests
(/root/reference/t/unit/Data/Dedup/Engine.t) onto the level-wise Ray Data
cascade: synthetic (letter, num) rows with toy digest stages, asserting exact
block membership, key-prefix lengths, and the [6,3,3,0] collision counters.
"""

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from data_dedup_ray.engine import DigestStage, dedup_cascade, count_collisions, count_keys_computed


def _col_stage(sid, fn, dtype=pa.int64(), expensive=False):
    return DigestStage(id=sid, compute=fn, dtype=dtype, expensive=expensive)


LETTER = _col_stage("letter", lambda t: pc.cast(t["letter"], pa.string()), pa.string())
MOD2 = _col_stage("mod2", lambda t: pc.cast(pc.bit_wise_and(t["num"], 1), pa.int64()))


def _mod(m):
    return _col_stage(
        f"mod{m}",
        lambda t, m=m: pa.array([v % m for v in t["num"].to_pylist()], type=pa.int64()),
    )


def _ds(rows):
    return ray.data.from_pandas(
        pd.DataFrame(rows, columns=["id", "letter", "num"])
    )


NINE = [
    ("A1", "A", 1), ("B2", "B", 2), ("C3", "C", 3),
    ("A4", "A", 4), ("B5", "B", 5), ("C6", "C", 6),
    ("A7", "A", 7), ("B8", "B", 8), ("C9", "C", 9),
]


def _clusters(result_df):
    out = {}
    for cid, g in result_df.groupby("cluster_id"):
        out[frozenset(g["id"])] = int(g["n_keys"].iloc[0])
    return out


def test_single_object_block():
    # Engine.t "one object in a block": a lone object's block has NO keys.
    res = dedup_cascade(_ds(NINE[:1]), [LETTER], id_col="id").to_pandas()
    assert len(res) == 1
    assert int(res["n_keys"].iloc[0]) == 0
    assert res["cluster_id"].iloc[0] == "A1"


def test_single_level_blocking():
    # Engine.t:86-124: A1+A4 collide on letter → one block; B2, C3 singletons.
    rows = [("A1", "A", 1), ("B2", "B", 2), ("A4", "A", 4), ("C3", "C", 3)]
    res = dedup_cascade(_ds(rows), [LETTER], id_col="id").to_pandas()
    assert _clusters(res) == {
        frozenset({"A1", "A4"}): 1,
        frozenset({"B2"}): 1,
        frozenset({"C3"}): 1,
    }


def test_multi_level_blocking():
    # Engine.t:126-142: stages [letter, num % 2] on A1 B2 C3 A4.
    rows = [("A1", "A", 1), ("B2", "B", 2), ("C3", "C", 3), ("A4", "A", 4)]
    res = dedup_cascade(_ds(rows), [LETTER, MOD2], id_col="id").to_pandas()
    assert _clusters(res) == {
        frozenset({"A4"}): 2,   # block A0
        frozenset({"A1"}): 2,   # block A1
        frozenset({"B2"}): 1,   # block B
        frozenset({"C3"}): 1,   # block C
    }


@pytest.mark.parametrize("lazy", [False, True])
def test_count_collisions_6330(lazy):
    # Engine.t:235-271: 9 objects, 4 levels ⇒ collisions [6,3,3,0]; with the
    # last two stages marked expensive the lazy path must agree exactly.
    stages = [LETTER, MOD2, _mod(3), _mod(5)]
    if lazy:
        stages = [
            stages[0],
            stages[1],
            _col_stage("mod3", stages[2].compute, expensive=True),
            _col_stage("mod5", stages[3].compute, expensive=True),
        ]
    res = dedup_cascade(_ds(NINE), stages, id_col="id").to_pandas()
    assert _clusters(res) == {
        frozenset({"A1"}): 4, frozenset({"A4"}): 2, frozenset({"A7"}): 4,
        frozenset({"B2"}): 4, frozenset({"B5"}): 2, frozenset({"B8"}): 4,
        frozenset({"C3"}): 4, frozenset({"C6"}): 2, frozenset({"C9"}): 4,
    }
    assert count_collisions(res, stages) == [6, 3, 3, 0]
    assert count_keys_computed(res, stages) == [9, 9, 6, 6]


def test_degenerate_no_blocking():
    # Engine.pm:138-139 / Engine.t:65-84: empty blocking ⇒ one all-dup block.
    res = dedup_cascade(_ds(NINE), [], id_col="id").to_pandas()
    assert len(res) == 9
    assert set(res["cluster_id"]) == {"A1"}
    assert set(res["n_keys"]) == {0}
    assert set(res["n_members"]) == {9}


def test_true_duplicates_cluster_together():
    # Two rows agreeing on every digest are one block with all keys.
    rows = [("A1", "A", 6), ("A2", "A", 6), ("B1", "B", 3)]
    stages = [LETTER, MOD2, _mod(3)]
    res = dedup_cascade(_ds(rows), stages, id_col="id").to_pandas()
    assert _clusters(res) == {frozenset({"A1", "A2"}): 3, frozenset({"B1"}): 1}


def test_registry_covers_all_13_reference_digests():
    """Every DigestFactory blocking function (DigestFactory.pm:41-228) is
    resolvable by its reference name (SURVEY.md §2.2)."""
    from data_dedup_ray.engine import resolve_chain

    ref_names = [
        "filesize", "sample", "end_sample", "mid_sample", "file_head",
        "file_tail", "fast_initial_xxhash", "initial_xxhash", "final_xxhash",
        "fast_initial_sha", "initial_sha", "final_sha", "sha",
    ]
    stages = resolve_chain(ref_names)
    assert len(stages) == 13
    assert len({s.id for s in stages}) == 13


def test_mid_sample_and_fast_sha_kernels():
    import pyarrow as pa

    from data_dedup_ray.stages import hashes

    t = pa.table({"text": ["", "ab", "x" * 10_000, None]})
    mid = hashes.mid_sample(t).to_pylist()
    assert mid[0] == b"" and mid[1] == b"ab" and mid[3] is None
    assert len(mid[2]) == 128 and mid[2] == b"x" * 128

    import hashlib

    fast = hashes.fast_prefix_sha(t).to_pylist()
    assert fast[2] == hashlib.sha256(b"x" * 2048).hexdigest()
    assert fast[0] == hashlib.sha256(b"").hexdigest()


def test_bloom_collision_filter_identical_blocks():
    """colliding_filter='bloom' must reproduce the exact mode's blocks
    (membership, n_keys, n_members) bit-for-bit — false positives only
    cost extra expensive-digest work, never structure."""
    rows = NINE + [("A1dup", "A", 1), ("C9dup", "C", 9)]
    stages = [LETTER, _mod(3),
              _col_stage("num", lambda t: t["num"], expensive=True)]
    exact = dedup_cascade(_ds(rows), stages, id_col="id").to_pandas()
    bloom = dedup_cascade(_ds(rows), stages, id_col="id",
                          colliding_filter="bloom").to_pandas()
    assert _clusters(exact) == _clusters(bloom)
    e = exact.sort_values("id").reset_index(drop=True)
    b = bloom.sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        e[["id", "cluster_id", "n_keys", "n_members"]],
        b[["id", "cluster_id", "n_keys", "n_members"]],
    )


def test_bloom_filter_lossy_still_identical(monkeypatch):
    """Force heavy false positives (1 bit/key, 1 hash) — blocks must
    STILL be identical: level-0 closure is FP-proof and the candidate
    trie keys on real digest values."""
    from data_dedup_ray.engine import cascade as _c

    monkeypatch.setattr(_c, "_BLOOM_BITS_PER_KEY", 1)
    monkeypatch.setattr(_c, "_BLOOM_N_HASHES", 1)
    rows = NINE + [("A1dup", "A", 1), ("B5dup", "B", 5)]
    stages = [LETTER, MOD2,
              _col_stage("num", lambda t: t["num"], expensive=True)]
    exact = dedup_cascade(_ds(rows), stages, id_col="id").to_pandas()
    bloom = dedup_cascade(_ds(rows), stages, id_col="id",
                          colliding_filter="bloom").to_pandas()
    assert _clusters(exact) == _clusters(bloom)


def test_bloom_no_false_negatives_unit():
    from data_dedup_ray.engine.cascade import _bloom_build, _bloom_contains
    import numpy as np

    arr = np.array([5, -3, 2**62, -2**60, 0], dtype=np.int64)
    bits, m, k = _bloom_build(arr)
    assert _bloom_contains(bits, m, arr, k).all()
    # empty set → nothing matches (m floors at 64, all bits zero)
    ebits, em, ek = _bloom_build(np.array([], dtype=np.int64))
    assert not _bloom_contains(ebits, em, arr, ek).any()


def test_auto_filter_picks_exact_small_and_bloom_past_threshold(monkeypatch):
    """'auto' (the default) resolves from the measured colliding-prefix
    count: exact below _AUTO_BLOOM_THRESHOLD, bloom above — block
    structure identical either way."""
    from data_dedup_ray.engine import cascade as casc

    rows = NINE + [("A1dup", "A", 1), ("C9dup", "C", 9)]
    stages = [LETTER, _mod(3),
              _col_stage("num", lambda t: t["num"], expensive=True)]
    exact = dedup_cascade(_ds(rows), stages, id_col="id",
                          colliding_filter="exact").to_pandas()
    auto_small = dedup_cascade(_ds(rows), stages, id_col="id",
                               colliding_filter="auto").to_pandas()
    assert _clusters(exact) == _clusters(auto_small)
    # force the switch: every colliding set is now "too big"
    monkeypatch.setattr(casc, "_AUTO_BLOOM_THRESHOLD", 0)
    auto_bloom = dedup_cascade(_ds(rows), stages, id_col="id",
                               colliding_filter="auto").to_pandas()
    assert _clusters(exact) == _clusters(auto_bloom)
    with pytest.raises(ValueError, match="colliding_filter"):
        dedup_cascade(_ds(rows), stages, id_col="id",
                      colliding_filter="nope")
