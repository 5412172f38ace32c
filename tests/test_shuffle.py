"""all_to_all shuffle repartitioning tests (SURVEY.md §5.8: the TPU-native
exchange; the reference has no in-process shuffle at all)."""

import numpy as np
import pytest

from frostdb_tpu.columnbatch import (
    Column,
    ColumnBatch,
    Dictionary,
    KIND_DICT,
    KIND_INT64,
)
from frostdb_tpu.parallel import (
    PartitionedTable,
    ShuffleOverflow,
    make_mesh,
    shuffle_by_key,
)
from frostdb_tpu.parallel.mesh import _hash_int64


def _table(n=5000, n_keys=40, seed=5, skew_key=None):
    rng = np.random.default_rng(seed)
    d = Dictionary()
    for i in range(n_keys):
        d.code(f"k{i}")
    if skew_key is None:
        codes = rng.integers(0, n_keys, n).astype(np.int32)
    else:
        codes = np.full(n, skew_key, dtype=np.int32)
    vals = rng.integers(0, 1000, n).astype(np.int64)
    ones = np.ones(n, dtype=bool)
    b = ColumnBatch(
        [
            Column("key", KIND_DICT, codes, ones, d),
            Column("v", KIND_INT64, vals, ones),
        ],
        n,
    )
    mesh = make_mesh()
    return b, PartitionedTable.from_batch(b, mesh)


def test_shuffle_preserves_rows_and_colocates():
    b, t = _table()
    t2 = shuffle_by_key(t, "key")
    k = np.asarray(t2.column("key").data)
    kv = np.asarray(t2.column("key").validity)
    v = np.asarray(t2.column("v").data)
    vv = np.asarray(t2.column("v").validity)
    np.testing.assert_array_equal(kv, vv)
    got = sorted(zip(k[kv].tolist(), v[vv].tolist()))
    expect = sorted(
        zip(
            b.column("key").values.tolist(),
            b.column("v").values.tolist(),
        )
    )
    assert got == expect
    n_shards = t2.n_shards
    per_shard = t2.n_pad // n_shards
    for s in range(n_shards):
        sl = slice(s * per_shard, (s + 1) * per_shard)
        ks = k[sl][kv[sl]]
        if len(ks):
            dests = _hash_int64(ks.astype(np.int64)) % n_shards
            assert (dests == s).all()


def test_shuffle_overflow_detected_and_retry():
    # every row has the same key -> one destination receives everything
    _b, t = _table(n=4000, skew_key=3)
    with pytest.raises(ShuffleOverflow):
        shuffle_by_key(t, "key", oversub=2.0)
    # a capacity covering the full skew succeeds
    t2 = shuffle_by_key(t, "key", oversub=8 * 8.0)
    kv = np.asarray(t2.column("key").validity)
    assert int(kv.sum()) == 4000


def test_skewed_shuffle_auto_salts():
    """A single heavy key overflows the plain exchange at any reasonable
    oversub; the skew-aware entry salts instead, spreading the key over
    multiple shards with balanced load, and per-key partial sums across
    sub-shards still combine to the exact totals."""
    from frostdb_tpu.parallel import shuffle_by_key_auto

    b, t = _table(n=4000, skew_key=3)
    t2, salt = shuffle_by_key_auto(t, "key", oversub=2.0)
    assert salt > 1, "skew should be resolved by salting, not capacity"
    k = np.asarray(t2.column("key").data)
    kv = np.asarray(t2.column("key").validity)
    v = np.asarray(t2.column("v").data)
    assert int(kv.sum()) == 4000
    # balanced: the heavy key's rows spread over >= salt shards
    n_shards = t2.n_shards
    per_shard = t2.n_pad // n_shards
    shards_with_rows = sum(
        1
        for s in range(n_shards)
        if kv[s * per_shard : (s + 1) * per_shard].any()
    )
    assert shards_with_rows >= min(salt, n_shards)
    # exact per-key totals after combining sub-shard partials
    sums: dict[int, int] = {}
    for s in range(n_shards):
        sl = slice(s * per_shard, (s + 1) * per_shard)
        ks, vs = k[sl][kv[sl]], v[sl][kv[sl]]
        for code in np.unique(ks):
            sums[int(code)] = sums.get(int(code), 0) + int(vs[ks == code].sum())
    codes_np = b.column("key").values
    vals_np = b.column("v").values
    for code in np.unique(codes_np):
        assert sums[int(code)] == int(vals_np[codes_np == code].sum())


def test_salted_shuffle_uniform_keys_unaffected():
    """Salting a uniform table still preserves all rows exactly."""
    b, t = _table(seed=21)
    t2 = shuffle_by_key(t, "key", oversub=4.0, salt=4)
    k = np.asarray(t2.column("key").data)
    kv = np.asarray(t2.column("key").validity)
    v = np.asarray(t2.column("v").data)
    vv = np.asarray(t2.column("v").validity)
    got = sorted(zip(k[kv].tolist(), v[vv].tolist()))
    expect = sorted(
        zip(b.column("key").values.tolist(), b.column("v").values.tolist())
    )
    assert got == expect


def test_shuffled_local_aggregate_matches():
    """After the shuffle each shard owns disjoint keys: local exact grouping
    needs no cross-shard combine (the large-K aggregation strategy)."""
    b, t = _table(seed=11)
    t2 = shuffle_by_key(t, "key", oversub=6.0)
    k = np.asarray(t2.column("key").data)
    kv = np.asarray(t2.column("key").validity)
    v = np.asarray(t2.column("v").data)
    sums: dict[int, int] = {}
    n_shards = t2.n_shards
    per_shard = t2.n_pad // n_shards
    for s in range(n_shards):
        sl = slice(s * per_shard, (s + 1) * per_shard)
        ks, vs = k[sl][kv[sl]], v[sl][kv[sl]]
        for code in np.unique(ks):
            assert int(code) not in sums, "key appeared on two shards"
            sums[int(code)] = int(vs[ks == code].sum())
    codes_np = b.column("key").values
    vals_np = b.column("v").values
    for code in np.unique(codes_np):
        assert sums[int(code)] == int(vals_np[codes_np == code].sum())
