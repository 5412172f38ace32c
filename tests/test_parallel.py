"""Multi-chip tests on an 8-virtual-device CPU mesh: distributed two-phase
aggregation and hash join must match the single-stream engine bit-exactly."""

import numpy as np
import pytest

import jax

from frostdb_tpu.columnbatch import Column, ColumnBatch, Dictionary, KIND_DICT, KIND_INT64
from frostdb_tpu.ops import kernels as K
from frostdb_tpu.parallel import (
    PartitionedTable,
    distributed_filter_aggregate,
    distributed_distinct,
    distributed_hash_join,
    make_mesh,
)


def _batch(n=5000, n_groups=17, seed=0):
    rng = np.random.default_rng(seed)
    d = Dictionary()
    names = [f"group_{i}" for i in range(n_groups)]
    for s in names:
        d.code(s)
    codes = rng.integers(0, n_groups, n).astype(np.int32)
    vals = rng.integers(0, 1000, n).astype(np.int64)
    ts = rng.integers(0, 100, n).astype(np.int64)
    ones = np.ones(n, dtype=bool)
    return ColumnBatch(
        [
            Column("labels.g", KIND_DICT, codes, ones, d),
            Column("value", KIND_INT64, vals, ones),
            Column("timestamp", KIND_INT64, ts, ones),
        ],
        n,
    )


def test_devices_available():
    assert len(jax.devices()) == 8


def test_distributed_filter_aggregate_matches_numpy():
    b = _batch()
    mesh = make_mesh()
    t = PartitionedTable.from_batch(b, mesh)
    n_codes = len(b.column("labels.g").dictionary)
    run = distributed_filter_aggregate(
        t,
        group_col="labels.g",
        num_codes=n_codes,
        agg_specs=[("sum", "value"), ("count", "value"), ("min", "value"), ("max", "value")],
        filter_col="timestamp",
        filter_op=">=",
        filter_literal=50,
    )
    (sums, counts, mins, maxs), group_counts = run()

    codes = b.column("labels.g").values
    vals = b.column("value").values
    sel = b.column("timestamp").values >= 50
    for g in range(n_codes):
        m = sel & (codes == g)
        assert int(sums[g]) == int(vals[m].sum())
        assert int(counts[g]) == int(m.sum())
        if m.any():
            assert int(mins[g]) == int(vals[m].min())
            assert int(maxs[g]) == int(vals[m].max())


def test_distributed_agg_hash_partitioned():
    """Hash-partitioned load: same results, keys co-located."""
    b = _batch(seed=3)
    mesh = make_mesh()
    t = PartitionedTable.from_batch(b, mesh, hash_key="labels.g")
    n_codes = len(b.column("labels.g").dictionary)
    run = distributed_filter_aggregate(
        t, "labels.g", n_codes, [("sum", "value")]
    )
    (sums,), _ = run()
    codes = b.column("labels.g").values
    vals = b.column("value").values
    for g in range(n_codes):
        assert int(sums[g]) == int(vals[codes == g].sum())


def test_distributed_distinct():
    b = _batch(n=2000, n_groups=9, seed=1)
    mesh = make_mesh()
    t = PartitionedTable.from_batch(b, mesh)
    n_codes = len(b.column("labels.g").dictionary)
    present = distributed_distinct(t, "labels.g", n_codes)
    expected = np.zeros(n_codes, dtype=bool)
    expected[np.unique(b.column("labels.g").values)] = True
    np.testing.assert_array_equal(np.asarray(present), expected)


def test_distributed_hash_join():
    rng = np.random.default_rng(7)
    d = Dictionary()
    n_keys = 40
    for i in range(n_keys):
        d.code(f"k{i}")

    nl = 3000
    l_codes = rng.integers(0, n_keys, nl).astype(np.int32)
    l_vals = rng.integers(0, 100, nl).astype(np.int64)
    ones_l = np.ones(nl, dtype=bool)
    left = ColumnBatch(
        [
            Column("key", KIND_DICT, l_codes, ones_l, d),
            Column("lval", KIND_INT64, l_vals, ones_l),
        ],
        nl,
    )

    # unique build side with only 30 of 40 keys present
    present_keys = np.arange(0, 30, dtype=np.int32)
    r_vals = (present_keys.astype(np.int64) * 10 + 5)
    ones_r = np.ones(len(present_keys), dtype=bool)
    right = ColumnBatch(
        [
            Column("key", KIND_DICT, present_keys, ones_r, d),
            Column("rval", KIND_INT64, r_vals, ones_r),
        ],
        len(present_keys),
    )

    mesh = make_mesh()
    lt = PartitionedTable.from_batch(left, mesh, hash_key="key")
    rt = PartitionedTable.from_batch(right, mesh, hash_key="key")
    run = distributed_hash_join(lt, rt, "key", n_keys, ["rval"])
    matched, (rv,) = run()

    matched = np.asarray(matched)
    rv = np.asarray(rv)
    # reconstruct per-shard-order left codes for verification
    lk = np.asarray(lt.column("key").data)
    lvalid = np.asarray(lt.column("key").validity)
    for i in range(len(lk)):
        if not lvalid[i]:
            assert not matched[i]
            continue
        k = lk[i]
        if k < 30:
            assert matched[i], (i, k)
            assert rv[i] == k * 10 + 5
        else:
            assert not matched[i]


def test_scaling_partition_shapes():
    b = _batch(n=1234)
    mesh = make_mesh()
    t = PartitionedTable.from_batch(b, mesh)
    assert t.n_pad % 8 == 0
    sc = t.column("value")
    assert sc.data.shape[0] == t.n_pad


def test_distributed_join_duplicate_keys_inner_outer_semi_anti():
    """Duplicate-key build sides (CSR buckets + searchsorted expansion,
    static capacity with exact overflow escalation) across all join modes,
    verified against a numpy reference join."""
    from frostdb_tpu.parallel.join import (
        distributed_hash_join_multi,
        distributed_join_auto,
    )

    rng = np.random.default_rng(11)
    d = Dictionary()
    n_keys = 16
    for i in range(n_keys):
        d.code(f"k{i}")

    nl = 600
    l_codes = rng.integers(0, n_keys, nl).astype(np.int32)
    l_vals = np.arange(nl, dtype=np.int64)
    ones_l = np.ones(nl, dtype=bool)
    left = ColumnBatch(
        [
            Column("key", KIND_DICT, l_codes, ones_l, d),
            Column("lval", KIND_INT64, l_vals, ones_l),
        ],
        nl,
    )

    # duplicate-key build side: keys 0..11 with 1..4 rows each; 12..15 absent
    r_codes, r_vals = [], []
    for k in range(12):
        for j in range(1 + k % 4):
            r_codes.append(k)
            r_vals.append(k * 100 + j)
    r_codes = np.asarray(r_codes, dtype=np.int32)
    r_vals = np.asarray(r_vals, dtype=np.int64)
    ones_r = np.ones(len(r_codes), dtype=bool)
    right = ColumnBatch(
        [
            Column("key", KIND_DICT, r_codes, ones_r, d),
            Column("rval", KIND_INT64, r_vals, ones_r),
        ],
        len(r_codes),
    )

    mesh = make_mesh()
    lt = PartitionedTable.from_batch(left, mesh, hash_key="key")
    rt = PartitionedTable.from_batch(right, mesh, hash_key="key")

    # numpy reference inner join multiset over (l_key, l_val, r_val)
    expect = []
    for i in range(nl):
        for j in range(len(r_codes)):
            if l_codes[i] == r_codes[j]:
                expect.append((int(l_codes[i]), int(l_vals[i]), int(r_vals[j])))
    expect.sort()

    totals, li, rvalid, rvs, cap = distributed_join_auto(
        lt, rt, "key", n_keys, ["rval"], mode="inner", initial_capacity=64
    )
    li = np.asarray(li)
    rvalid_np = np.asarray(rvalid)
    rv = np.asarray(rvs[0])
    rv_valid = np.asarray(rvs[1])
    lk = np.asarray(lt.column("key").data)
    lv = np.asarray(lt.column("lval").data)
    lvalid = np.asarray(lt.column("key").validity)
    n_shards = mesh.devices.size
    per_shard = len(lk) // n_shards
    got = []
    for s in range(n_shards):
        t = int(totals[s])
        assert t <= cap
        for o in range(t):
            g = s * cap + o
            assert rvalid_np[g] and rv_valid[g]
            row = s * per_shard + int(li[g])
            assert lvalid[row]
            got.append((int(lk[row]), int(lv[row]), int(rv[g])))
    assert sorted(got) == expect

    # left_outer: every valid left row appears; unmatched exactly once with
    # right_valid False.
    totals, li, rvalid, rvs, cap = distributed_join_auto(
        lt, rt, "key", n_keys, ["rval"], mode="left_outer", initial_capacity=64
    )
    li = np.asarray(li); rvalid_np = np.asarray(rvalid); rv = np.asarray(rvs[0])
    outer_got = []
    for s in range(n_shards):
        for o in range(int(totals[s])):
            g = s * cap + o
            row = s * per_shard + int(li[g])
            if not lvalid[row]:
                continue  # padding rows emit one left_outer slot each
            if rvalid_np[g]:
                outer_got.append((int(lk[row]), int(lv[row]), int(rv[g])))
            else:
                outer_got.append((int(lk[row]), int(lv[row]), None))
    matched_left = {e[1] for e in expect}
    expect_outer = expect + [
        (int(l_codes[i]), int(l_vals[i]), None)
        for i in range(nl)
        if int(l_vals[i]) not in matched_left
    ]
    assert sorted(outer_got, key=str) == sorted(expect_outer, key=str)

    # semi/anti masks
    semi = np.asarray(
        distributed_join_auto(lt, rt, "key", n_keys, [], mode="semi")
    )
    anti = np.asarray(
        distributed_join_auto(lt, rt, "key", n_keys, [], mode="anti")
    )
    for i in range(len(lk)):
        if not lvalid[i]:
            assert not semi[i] and not anti[i]
            continue
        has = int(lk[i]) < 12
        assert semi[i] == has
        assert anti[i] == (not has)
