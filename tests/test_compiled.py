"""Compiled serving layer: results must match the generic engine exactly."""

import numpy as np
import pytest

from frostdb_tpu.columnbatch import Column, ColumnBatch, KIND_DICT, KIND_INT64
from frostdb_tpu.compiled import NotCompilable, compile_filter_aggregate
from frostdb_tpu.db import ColumnStore
from frostdb_tpu.query import expr as E
from frostdb_tpu.query.engine import LocalEngine
from frostdb_tpu.schema import sample_definition
from frostdb_tpu.table import TableConfig


def _setup(n_parts=3, rows=4000, seed=1):
    store = ColumnStore()
    db = store.db("c")
    table = db.table("t", TableConfig(schema=sample_definition()))
    rng = np.random.default_rng(seed)
    d_et = table.dictionary("example_type")
    d_l = table.dictionary("labels")
    d_st = table.dictionary("stacktrace")
    for _p in range(n_parts):
        n = rows
        et, etv = d_et.encode(
            [f"type{int(x)}" for x in rng.integers(0, 7, n)]
        )
        st, stv = d_st.encode(["s"] * n)
        batch = ColumnBatch(
            [
                Column("example_type", KIND_DICT, et, etv, d_et),
                Column("stacktrace", KIND_DICT, st, stv, d_st),
                Column(
                    "timestamp",
                    KIND_INT64,
                    rng.integers(0, 100, n).astype(np.int64),
                    np.ones(n, dtype=bool),
                ),
                Column(
                    "value",
                    KIND_INT64,
                    rng.integers(0, 100000, n).astype(np.int64),
                    np.ones(n, dtype=bool),
                ),
            ],
            n,
        )
        table.insert_record(batch, sort=True)
    return store, db, table


def _engine_result(db, filter_expr):
    engine = LocalEngine(db.table_provider())
    q = engine.scan_table("t")
    if filter_expr is not None:
        q = q.filter(filter_expr)
    out = []
    q.aggregate(
        [E.Sum(E.Col("value")), E.Count(E.Col("value"))],
        [E.Col("example_type")],
    ).execute(out.append)
    res = {}
    for b in out:
        for i in range(b.num_rows):
            res[b.column("example_type").py_value(i)] = (
                int(b.column("sum(value)").values[i]),
                int(b.column("count(value)").values[i]),
            )
    return res


def test_compiled_matches_engine_filtered():
    _s, db, table = _setup()
    q = compile_filter_aggregate(
        table,
        "example_type",
        [("sum", "value"), ("count", "value")],
        filter=("timestamp", ">=", 50),
    )
    got_batch = q.execute()
    got = {
        got_batch.column("example_type").py_value(i): (
            int(got_batch.column("sum(value)").values[i]),
            int(got_batch.column("count(value)").values[i]),
        )
        for i in range(got_batch.num_rows)
    }
    expect = _engine_result(db, E.Col("timestamp").gt_eq(50))
    assert got == expect


def test_compiled_matches_engine_unfiltered():
    _s, db, table = _setup(seed=9)
    q = compile_filter_aggregate(
        table, "example_type", [("sum", "value"), ("count", "value")]
    )
    got_batch = q.execute()
    got = {
        got_batch.column("example_type").py_value(i): (
            int(got_batch.column("sum(value)").values[i]),
            int(got_batch.column("count(value)").values[i]),
        )
        for i in range(got_batch.num_rows)
    }
    expect = _engine_result(db, None)
    assert got == expect


def test_not_compilable_patterns():
    _s, _db, table = _setup(n_parts=1, rows=100)
    # int64 group keys (timestamp) compile since round 4; unknown columns
    # and uncompiled agg functions still fall back.
    with pytest.raises(NotCompilable):
        compile_filter_aggregate(table, "nosuch", [("sum", "value")])
    with pytest.raises(NotCompilable):
        # unique()/and() compile since round 5; a made-up function doesn't
        compile_filter_aggregate(table, "example_type", [("median", "value")])


# ---------------------------------------------------------------------------
# Engine integration (LocalQueryBuilder.execute lowers onto the compiled
# path automatically; output must be byte-identical to the generic DAG,
# including group emission order).


def _batch_tuples(batches):
    rows = []
    for b in batches:
        for i in range(b.num_rows):
            rows.append(
                tuple(
                    (c.name, c.py_value(i)) for c in b.columns
                )
            )
    return rows


def _run_engine(db, compiled: bool, filter_expr, aggs=None, tracer=None):
    from frostdb_tpu.query.physical import ExecOptions

    engine = LocalEngine(
        db.table_provider(),
        ExecOptions(compiled_serving=compiled, tracer=tracer),
    )
    q = engine.scan_table("t")
    if filter_expr is not None:
        q = q.filter(filter_expr)
    out = []
    q.aggregate(
        aggs or [E.Sum(E.Col("value")), E.Count(E.Col("value"))],
        [E.Col("example_type")],
    ).execute(out.append)
    return out


@pytest.mark.parametrize("seed", [1, 7, 21])
def test_engine_lowering_matches_generic_exactly(seed):
    _s, db, _t = _setup(seed=seed)
    for filt in (None, E.Col("timestamp").gt_eq(50), E.Col("timestamp").lt(3)):
        fast = _run_engine(db, True, filt)
        slow = _run_engine(db, False, filt)
        assert _batch_tuples(fast) == _batch_tuples(slow)


def test_engine_lowering_order_parity_filtered_first_occurrence():
    """A group whose first stream occurrence is filtered out must be emitted
    at its first *selected* occurrence (the generic engine's order)."""
    store = ColumnStore()
    db = store.db("o")
    table = db.table("t", TableConfig(schema=sample_definition()))
    d_et = table.dictionary("example_type")

    def part(types, tss):
        n = len(types)
        et, etv = d_et.encode(types)
        return ColumnBatch(
            [
                Column("example_type", KIND_DICT, et, etv, d_et),
                Column(
                    "timestamp",
                    KIND_INT64,
                    np.asarray(tss, dtype=np.int64),
                    np.ones(n, dtype=bool),
                ),
                Column(
                    "value",
                    KIND_INT64,
                    np.arange(1, n + 1, dtype=np.int64),
                    np.ones(n, dtype=bool),
                ),
            ],
            n,
        )

    # Single part: 'a' appears first in the stream but below the filter
    # threshold, so its first *selected* occurrence is after 'b' and 'c' —
    # unfiltered first-occurrence ordering would emit ['a','b','c'].
    table.insert_record(part(["a", "b", "a", "c", "a"], [10, 90, 20, 95, 80]))

    filt = E.Col("timestamp").gt_eq(50)
    fast = _run_engine(db, True, filt)
    slow = _run_engine(db, False, filt)
    assert _batch_tuples(fast) == _batch_tuples(slow)
    order = [
        fast[0].column("example_type").py_value(i)
        for i in range(fast[0].num_rows)
    ]
    assert order == ["b", "c", "a"]

    # Cross-part seen-set: a newer part (scanned first — LSM scan order is
    # newest-first) introduces 'd' and re-hits 'a'; 'a' keeps its earlier
    # position from the newer part.
    table.insert_record(part(["d", "a"], [99, 70]))
    fast = _run_engine(db, True, filt)
    slow = _run_engine(db, False, filt)
    assert _batch_tuples(fast) == _batch_tuples(slow)
    order = [
        fast[0].column("example_type").py_value(i)
        for i in range(fast[0].num_rows)
    ]
    assert order == ["d", "a", "b", "c"]


def _run_engine_opts(db, compiled, filter_expr, aggs, ordered):
    from frostdb_tpu.query.physical import ExecOptions

    engine = LocalEngine(
        db.table_provider(),
        ExecOptions(compiled_serving=compiled, ordered_aggregations=ordered),
    )
    q = engine.scan_table("t")
    if filter_expr is not None:
        q = q.filter(filter_expr)
    out = []
    q.aggregate(aggs, [E.Col("example_type")]).execute(out.append)
    return out


def test_engine_lowering_ordered_aggregations_parity():
    """With ExecOptions(ordered_aggregations=True) the generic planner picks
    OrderedAggregate (key-order emission) for a single-agg group-by on the
    schema's primary sorting column; the compiled path must match that order,
    not first-occurrence (round-1 advisor finding: engine.py gate)."""
    store = ColumnStore()
    db = store.db("ord")
    table = db.table("t", TableConfig(schema=sample_definition()))
    d_et = table.dictionary("example_type")

    def part(types, vals):
        n = len(types)
        et, etv = d_et.encode(types)
        return ColumnBatch(
            [
                Column("example_type", KIND_DICT, et, etv, d_et),
                Column(
                    "value",
                    KIND_INT64,
                    np.asarray(vals, dtype=np.int64),
                    np.ones(n, dtype=bool),
                ),
            ],
            n,
        )

    # LSM scan order is newest part first, so first-occurrence order across
    # the part stream is zzz, aaa — the ordered path must emit aaa first.
    table.insert_record(part(["aaa", "zzz"], [3, 4]))
    table.insert_record(part(["zzz", "zzz"], [1, 2]))

    aggs = [E.Sum(E.Col("value"))]
    fast = _run_engine_opts(db, True, None, aggs, ordered=True)
    slow = _run_engine_opts(db, False, None, aggs, ordered=True)
    assert _batch_tuples(fast) == _batch_tuples(slow)
    order = [
        fast[0].column("example_type").py_value(i)
        for i in range(fast[0].num_rows)
    ]
    assert order == ["aaa", "zzz"]

    # Two agg exprs: shouldPlanOrderedAggregate rejects (>1 agg), so the
    # generic engine hash-aggregates in first-occurrence order — the
    # compiled path must NOT sort in that case.
    aggs2 = [E.Sum(E.Col("value")), E.Count(E.Col("value"))]
    fast2 = _run_engine_opts(db, True, None, aggs2, ordered=True)
    slow2 = _run_engine_opts(db, False, None, aggs2, ordered=True)
    assert _batch_tuples(fast2) == _batch_tuples(slow2)


def test_engine_lowering_null_group_keys_fall_back():
    """Null group keys take the generic path (which emits a null-key
    group); lowering must not change results."""
    store = ColumnStore()
    db = store.db("n")
    table = db.table("t", TableConfig(schema=sample_definition()))
    d_et = table.dictionary("example_type")
    et, _ = d_et.encode(["a", "a", "b"])
    valid = np.array([True, False, True])
    table.insert_record(
        ColumnBatch(
            [
                Column("example_type", KIND_DICT, et, valid, d_et),
                Column(
                    "value",
                    KIND_INT64,
                    np.array([1, 2, 4], dtype=np.int64),
                    np.ones(3, dtype=bool),
                ),
            ],
            3,
        )
    )
    fast = _run_engine(db, True, None)
    slow = _run_engine(db, False, None)
    assert _batch_tuples(fast) == _batch_tuples(slow)
    # the null-key group must be present (generic-engine semantics)
    total = sum(b.num_rows for b in fast)
    assert total == 3


def _setup_values(values, types=None, tss=None, name="v"):
    store = ColumnStore()
    db = store.db(name)
    table = db.table("t", TableConfig(schema=sample_definition()))
    d_et = table.dictionary("example_type")
    n = len(values)
    types = types or [f"type{i % 5}" for i in range(n)]
    et, etv = d_et.encode(types)
    table.insert_record(
        ColumnBatch(
            [
                Column("example_type", KIND_DICT, et, etv, d_et),
                Column(
                    "timestamp",
                    KIND_INT64,
                    np.asarray(tss if tss is not None else range(n), np.int64),
                    np.ones(n, dtype=bool),
                ),
                Column(
                    "value",
                    KIND_INT64,
                    np.asarray(values, dtype=np.int64),
                    np.ones(n, dtype=bool),
                ),
            ],
            n,
        )
    )
    return db, table


def test_compiled_negative_and_large_values_bias_shift():
    """Negative and large-magnitude (nanosecond-timestamp-like) int64
    columns compile via the global-min bias shift; sums are exact."""
    rng = np.random.default_rng(3)
    base = 1_755_000_000_000_000_000  # ~2025 in ns: far outside int32
    for values in (
        rng.integers(-50_000, 50_000, 3000),  # negatives
        base + rng.integers(0, 2**31 - 1, 3000),  # huge bias, 31-bit span
        np.asarray([-5, -5, -5, -5]),  # all-negative constant
    ):
        db, table = _setup_values(list(values))
        q = compile_filter_aggregate(
            table,
            "example_type",
            [("sum", "value"), ("count", "value")],
            filter=("timestamp", ">=", 100),
        )
        got = q.execute()
        fast = _run_engine(db, True, E.Col("timestamp").gt_eq(100))
        slow = _run_engine(db, False, E.Col("timestamp").gt_eq(100))
        assert _batch_tuples(fast) == _batch_tuples(slow)
        assert _batch_tuples([got]) == _batch_tuples(slow)


def test_compiled_wide_span_two_plane_sums():
    """Spans past one int32 plane (up to 59 bits) compile via the two-plane
    (lo 28-bit / hi) decomposition with exact sums."""
    rng = np.random.default_rng(9)
    for values in (
        [-(2**33), 2**33],  # 34-bit span straddling zero
        list(rng.integers(-(2**52), 2**52, 500)),  # 53-bit span
        list(rng.integers(0, 2**58, 500)),  # 58-bit span
    ):
        db, table = _setup_values(list(values))
        q = compile_filter_aggregate(table, "example_type", [("sum", "value")])
        got = q.execute()
        aggs = [E.Sum(E.Col("value"))]
        slow = _run_engine(db, False, None, aggs=aggs)
        assert _batch_tuples([got]) == _batch_tuples(slow)
        fast = _run_engine(db, True, None, aggs=aggs)
        assert _batch_tuples(fast) == _batch_tuples(slow)


def test_compiled_span_past_59_bits_falls_back():
    db, table = _setup_values([-(2**62), 2**62])
    q = compile_filter_aggregate(table, "example_type", [("sum", "value")])
    with pytest.raises(NotCompilable):
        q.execute()  # span check reads part metadata at execute time
    # engine still answers via the generic path
    fast = _run_engine(db, True, None)
    slow = _run_engine(db, False, None)
    assert _batch_tuples(fast) == _batch_tuples(slow)


def test_compiled_minmax_wide_span_two_plane():
    """min/max over >32-bit spans compile via the two-plane lexicographic
    (hi, lo) reduction — max(timestamp) over nanosecond ranges stays on the
    fast path (VERDICT r2 item 7)."""
    rng = np.random.default_rng(11)
    base = 1_755_000_000_000_000_000  # ~2025 in ns
    for values in (
        [-(2**33), 2**33],  # 34-bit span straddling zero
        list(base + rng.integers(0, 2**40, 700)),  # ns timestamps, 40-bit span
        list(rng.integers(-(2**52), 2**52, 700)),  # 53-bit span
        [2**58, 0, 2**58 - 1, 5],  # hi-plane ties broken by lo
    ):
        db, table = _setup_values(list(values))
        q = compile_filter_aggregate(
            table,
            "example_type",
            [("min", "value"), ("max", "value"), ("sum", "value")],
        )
        got = q.execute()
        aggs = [E.Min(E.Col("value")), E.Max(E.Col("value")), E.Sum(E.Col("value"))]
        slow = _run_engine(db, False, None, aggs=aggs)
        assert _batch_tuples([got]) == _batch_tuples(slow)
        fast = _run_engine(db, True, None, aggs=aggs)
        assert _batch_tuples(fast) == _batch_tuples(slow)


def test_compiled_minmax_wide_span_multi_part_lexicographic():
    """The (hi, lo) extreme must combine lexicographically ACROSS parts:
    one part holding the global min-hi with a large lo, another the same
    hi with a smaller lo."""
    from frostdb_tpu.columnbatch import Column, ColumnBatch, KIND_DICT, KIND_INT64

    db, table = _setup_values([(5 << 28) + 100, (9 << 28) + 1], types=["a", "a"])
    d = table.dictionary("example_type")
    et, etv = d.encode(["a", "a"])
    n = 2
    table.insert_record(
        ColumnBatch(
            [
                Column("example_type", KIND_DICT, et, etv, d),
                Column(
                    "timestamp", KIND_INT64,
                    np.asarray([1000, 1000], np.int64), np.ones(n, bool),
                ),
                Column(
                    "value", KIND_INT64,
                    np.asarray([(5 << 28) + 7, (9 << 28) + 2**20], np.int64),
                    np.ones(n, bool),
                ),
            ],
            n,
        )
    )
    aggs = [E.Min(E.Col("value")), E.Max(E.Col("value"))]
    fast = _run_engine(db, True, None, aggs=aggs)
    slow = _run_engine(db, False, None, aggs=aggs)
    assert _batch_tuples(fast) == _batch_tuples(slow)
    row = _batch_tuples(slow)[0]
    assert ("min(value)", (5 << 28) + 7) in row
    assert ("max(value)", (9 << 28) + 2**20) in row


def test_compiled_large_code_space_lane_tiled():
    """Code spaces past one 128-lane tile (<=2048) still compile."""
    n = 4000
    types = [f"t{i % 300}" for i in range(n)]
    db, table = _setup_values(list(range(n)), types=types)
    q = compile_filter_aggregate(
        table, "example_type", [("sum", "value"), ("count", "value")]
    )
    assert len(q.dictionary) == 300
    fast = _run_engine(db, True, None)
    slow = _run_engine(db, False, None)
    assert _batch_tuples(fast) == _batch_tuples(slow)


@pytest.mark.parametrize("k", [2600, 6000])
def test_large_code_space_dense_tier(k):
    """Group columns past the 2048 one-hot ceiling no longer fall to the
    host engine: the dense tier (mesh_exec.DenseLocalAggregate) runs int64
    reductions over the cached device parts — segment ops below 4096 codes,
    sort + prefix sums above — parity incl. filters and emission order
    (VERDICT r2 weak 3 / item 2)."""
    from frostdb_tpu.tracing import Tracer

    types = [f"u{i % k}" for i in range(2 * k)]
    db, table = _setup_values(
        list(range(2 * k)), types=types, tss=list(range(2 * k))
    )
    # direct pallas-path compile still refuses at execute time
    q = compile_filter_aggregate(table, "example_type", [("sum", "value")])
    with pytest.raises(NotCompilable):
        q.execute()
    # ...but the engine serves it from the dense tier, byte-identically
    tracer = Tracer()
    fast = _run_engine(db, True, E.Col("timestamp").gt_eq(100), tracer=tracer)
    slow = _run_engine(db, False, E.Col("timestamp").gt_eq(100))
    assert _batch_tuples(fast) == _batch_tuples(slow)
    assert len(_batch_tuples(slow)) > 2048
    assert tracer.roots[0].attributes["path"] == "dense"


def test_family_dict_cliff_compact_remap():
    """A small group column inside a HUGE family dictionary stays on the
    Pallas fast path via the compact per-column code remap — the round-2
    '2048-dictionary serving cliff' (forty node names in a 5000-value
    label family must not lose the fast path forever)."""
    from frostdb_tpu.tracing import Tracer

    n = 3000
    # blow the example_type FAMILY dictionary past 2048 with values the
    # group column never uses
    db, table = _setup_values(
        list(range(n)), types=[f"node{i % 40}" for i in range(n)]
    )
    d = table.dictionary("example_type")
    d.encode([f"pod{i}" for i in range(2500)])
    assert len(d) > 2048
    q = compile_filter_aggregate(
        table, "example_type", [("sum", "value"), ("count", "value")]
    )
    out = q.execute()  # pallas path, remapped: no NotCompilable
    tracer = Tracer()
    fast = _run_engine(db, True, E.Col("timestamp").gt_eq(10), tracer=tracer)
    slow = _run_engine(db, False, E.Col("timestamp").gt_eq(10))
    assert _batch_tuples(fast) == _batch_tuples(slow)
    assert tracer.roots[0].attributes["path"] == "compiled"
    assert out.num_rows == 40


def test_compiled_min_max():
    """min/max lower onto the dense kernels (VPU masked min/max on TPU,
    segment reductions elsewhere); parity incl. the bias-shifted case."""
    rng = np.random.default_rng(5)
    for values in (
        rng.integers(0, 100000, 3000),
        rng.integers(-80000, 80000, 3000),  # bias path
    ):
        db, table = _setup_values(list(values))
        aggs = [
            E.Min(E.Col("value")),
            E.Max(E.Col("value")),
            E.Sum(E.Col("value")),
            E.Count(E.Col("value")),
        ]
        for filt in (None, E.Col("timestamp").gt_eq(1500)):
            from frostdb_tpu.compiled import lower_plan
            from frostdb_tpu.query.logical import Builder
            from frostdb_tpu.query.optimize import optimize

            b = Builder().scan(db.table_provider(), "t")
            if filt is not None:
                b = b.filter(filt)
            plan = optimize(
                b.aggregate(aggs, [E.Col("example_type")]).build()
            )
            lower_plan(plan)  # proves the shape compiles
            fast = _run_engine(db, True, filt, aggs=aggs)
            slow = _run_engine(db, False, filt, aggs=aggs)
            assert _batch_tuples(fast) == _batch_tuples(slow)


def test_engine_lowering_avg_projection():
    """avg(x) rewrites to sum/count + a post-projection division
    (builder.go:152-238); the compiled path evaluates the division on the
    [K]-sized host partials and must match the generic engine exactly."""
    from frostdb_tpu.compiled import lower_plan
    from frostdb_tpu.query.logical import Builder
    from frostdb_tpu.query.optimize import optimize

    _s, db, _t = _setup(seed=4)
    aggs = [E.Avg(E.Col("value")), E.Sum(E.Col("value"))]
    for filt in (None, E.Col("timestamp").lt(40)):
        # prove the plan actually lowers (projection shape recognized)
        b = Builder().scan(db.table_provider(), "t")
        if filt is not None:
            b = b.filter(filt)
        plan = optimize(b.aggregate(aggs, [E.Col("example_type")]).build())
        q = lower_plan(plan)
        assert q.output_projection is not None
        assert any(item[0] == "div" for item in q.output_projection)
        fast = _run_engine(db, True, filt, aggs=aggs)
        slow = _run_engine(db, False, filt, aggs=aggs)
        assert _batch_tuples(fast) == _batch_tuples(slow)
        cols = [c.name for c in fast[0].columns]
        assert "avg(value)" in cols and "sum(value)" in cols


def test_emission_order_tie_refinement_superblocks():
    """The TPU order path ranks codes by first selected superblock and
    refines ties host-side; exercise the host logic directly."""
    from frostdb_tpu.ops.pallas_agg import ROWS_PER_SUPER

    store = ColumnStore()
    db = store.db("tr")
    table = db.table("t", TableConfig(schema=sample_definition()))
    d_et = table.dictionary("example_type")

    n = 2 * ROWS_PER_SUPER
    types = ["z"] * n
    # superblock 1 contains first occurrences of b then a (same superblock
    # -> tie); superblock 0 contains c.
    types[5] = "c"
    types[ROWS_PER_SUPER + 3] = "b"
    types[ROWS_PER_SUPER + 9] = "a"
    et, etv = d_et.encode(types)
    batch = ColumnBatch(
        [
            Column("example_type", KIND_DICT, et, etv, d_et),
            Column(
                "timestamp",
                KIND_INT64,
                np.full(n, 60, dtype=np.int64),
                np.ones(n, dtype=bool),
            ),
            Column(
                "value",
                KIND_INT64,
                np.ones(n, dtype=np.int64),
                np.ones(n, dtype=bool),
            ),
        ],
        n,
    )
    table.insert_record(batch)

    q = compile_filter_aggregate(
        table,
        "example_type",
        [("sum", "value"), ("count", "value")],
        filter=("timestamp", ">=", 50),
    )
    parts = table.collect_parts(2**63)
    assert len(parts) == 1
    K = len(d_et)
    # synthesize the kernel's outputs host-side: counts + first superblock
    codes = parts[0].batch.column("example_type").values
    pc = np.zeros((1, K), dtype=np.int64)
    pf = np.zeros((1, K), dtype=np.int32)
    for k in range(K):
        rows = np.nonzero(codes == k)[0]
        pc[0, k] = len(rows)
        pf[0, k] = rows[0] // ROWS_PER_SUPER if len(rows) else 0
    q.on_tpu = True  # force the superblock + tie-refinement order path
    order = q._emission_order(parts, pc, pf)
    names = [d_et.values[int(k)] for k in order]
    assert names == ["z", "c", "b", "a"]


def test_compiled_multiple_value_columns():
    """Several value columns (with distinct digit plans) compile into one
    query: each column gets its own kernel passes, counts/emission order are
    shared."""
    _s, db, table = _setup(seed=4)
    aggs = [
        E.Sum(E.Col("value")),
        E.Count(E.Col("value")),
        E.Sum(E.Col("timestamp")),
        E.Min(E.Col("timestamp")),
        E.Max(E.Col("value")),
    ]
    # Direct compile proves the pattern is admitted (no silent fallback).
    q = compile_filter_aggregate(
        table,
        "example_type",
        [
            ("sum", "value"),
            ("count", "value"),
            ("sum", "timestamp"),
            ("min", "timestamp"),
            ("max", "value"),
        ],
        filter=("timestamp", ">=", 50),
    )
    got = q.execute()
    slow = _run_engine(db, False, E.Col("timestamp").gt_eq(50), aggs=aggs)
    assert _batch_tuples([got]) == _batch_tuples(slow)
    fast = _run_engine(db, True, E.Col("timestamp").gt_eq(50), aggs=aggs)
    assert _batch_tuples(fast) == _batch_tuples(slow)


def _setup_float(values, name="f"):
    from frostdb_tpu.schema import sample_definition_with_float

    store = ColumnStore()
    db = store.db(name)
    table = db.table("t", TableConfig(schema=sample_definition_with_float()))
    d_et = table.dictionary("example_type")
    n = len(values)
    et, etv = d_et.encode([f"type{i % 5}" for i in range(n)])
    table.insert_record(
        ColumnBatch(
            [
                Column("example_type", KIND_DICT, et, etv, d_et),
                Column(
                    "timestamp",
                    KIND_INT64,
                    np.arange(n, dtype=np.int64),
                    np.ones(n, dtype=bool),
                ),
                Column(
                    "floatvalue",
                    "float64",
                    np.asarray(values, dtype=np.float64),
                    np.ones(n, dtype=bool),
                ),
            ],
            n,
        )
    )
    return db, table


def test_compiled_integral_float_sums():
    """float64 columns whose visible values are all integral ride the exact
    integer kernel path; results match the generic float path exactly."""
    rng = np.random.default_rng(11)
    db, table = _setup_float(list(rng.integers(-1000, 1000, 2000).astype(float)))
    q = compile_filter_aggregate(
        table,
        "example_type",
        [
            ("sum", "floatvalue"),
            ("count", "floatvalue"),
            ("min", "floatvalue"),
            ("max", "floatvalue"),
        ],
    )
    got = q.execute()
    assert got.column("sum(floatvalue)").values.dtype == np.float64
    aggs = [
        E.Sum(E.Col("floatvalue")),
        E.Count(E.Col("floatvalue")),
        E.Min(E.Col("floatvalue")),
        E.Max(E.Col("floatvalue")),
    ]
    slow = _run_engine(db, False, None, aggs=aggs)
    assert _batch_tuples([got]) == _batch_tuples(slow)
    fast = _run_engine(db, True, None, aggs=aggs)
    assert _batch_tuples(fast) == _batch_tuples(slow)


def test_compiled_fractional_float_sums_stay_compiled():
    """Round 4: non-integral float64 sums ride the exact-decomposition
    fast path (floatsum.py) instead of falling back."""
    db, table = _setup_float([1.5, 2.0, 3.25])
    aggs = [E.Sum(E.Col("floatvalue"))]
    from frostdb_tpu.tracing import Tracer

    tracer = Tracer()
    fast = _run_engine(db, True, None, aggs=aggs, tracer=tracer)
    slow = _run_engine(db, False, None, aggs=aggs)
    assert _batch_tuples(fast) == _batch_tuples(slow)
    assert tracer.roots[0].attributes["path"] == "compiled"
    # fractional min/max still declines (ordering needs the int planes)
    q = compile_filter_aggregate(
        table, "example_type", [("min", "floatvalue")]
    )
    with pytest.raises(NotCompilable):
        q.execute()
