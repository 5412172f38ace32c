"""Pallas fused filter + group-by aggregation kernel.

The XLA one-hot formulation (ops/fused.py) materializes the [N, K] one-hot
matrix through HBM; this kernel generates it in VMEM per 128-row slab and
contracts on the MXU's native int8 path, so HBM traffic is just the input
columns plus a tiny per-superblock partial.

Layout contract (TPU-native storage decision): the group-code column is
stored **sublane-major** — shape [128, n_slabs], column s holding rows
[s*128, (s+1)*128) — so the kernel builds each slab's one-hot
``(codes_col == lane_iota)`` without any in-kernel transpose (Mosaic
transposes of 1-bit/8-bit vectors are unsupported/slow). Value and
timestamp columns stay row-major [n_slabs, 128].

Selection is folded into the LHS digit rows (``d * sel``), never into the
one-hot, so only one side of the matmul depends on the filter:

    sums[k]   = (d0*sel, d1*sel) rows . onehot   (recombined base-128)
    counts[k] = sel row . onehot

Per slab: one [8,128] x [128,128] int8 matmul with int32 accumulation —
exact; int64 recombination happens on the [K]-sized partials outside.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 128-row slabs per superblock (fully unrolled in the kernel).
# int32 accumulator headroom: 65536 * 127 = 2^23 per digit cell.
SUB = 64
ROWS_PER_SUPER = SUB * 128


def _make_agg_kernel(
    num_digits: int,
    fused_compare: bool = False,
    num_code_tiles: int = 1,
    cmp_op: str = ">=",
    with_base: bool = False,
):
    """Kernel factory: LHS rows are num_digits base-128 digit rows + the
    selection row, padded to the 8-sublane tile. With ``fused_compare`` the
    third input is a timestamp block compared against an SMEM literal inside
    the kernel (saves materializing the selection vector through HBM —
    ~12B/row of traffic on the serving hot shape); ``with_base``
    additionally ANDs a precomputed int8 base-validity plane (padding + leaf
    validity, 1B/row, cached across queries). Otherwise the third input is
    a precomputed 0/1 int32 selection block.

    ``num_code_tiles`` tiles code spaces larger than one 128-lane
    accumulator: each slab's LHS is built once and contracted against one
    one-hot per code tile (``codes == iota + t*128``), so input HBM traffic
    is unchanged and compute scales with ceil(K/128) — the dense one-hot
    formulation's inherent N*K term."""
    pad = 8 - num_digits - 1
    assert pad >= 0, "at most 7 digits fit one accumulator tile"

    def _agg_kernel(c_ref, v_ref, sel_ref, *rest):
        # code values along SUBLANES: onehot_T[k, r] = (codes[r] == k)
        iota_sub = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)

        # Whole-block elementwise precompute (full VPU tiles instead of
        # [1,128] row slices): masked base-128 digits + selection row.
        v = v_ref[:]
        if fused_compare and isinstance(cmp_op, tuple):
            # conjunction of sentinel-masked range predicates: one compare
            # plane + literal per clause, AND-folded in VMEM
            n_cl = len(cmp_op)
            planes = (sel_ref,) + rest[: n_cl - 1]
            lit_ref = rest[n_cl - 1]
            out_ref = rest[n_cl]
            sel32 = None
            for ci, op_i in enumerate(cmp_op):
                ts = planes[ci][:]
                lit = lit_ref[ci]
                cmp = {
                    "<": ts < lit,
                    "<=": ts <= lit,
                    ">": ts > lit,
                    ">=": ts >= lit,
                    "==": ts == lit,  # dict-equality code compares
                }[op_i]
                m = cmp.astype(jnp.int32)
                sel32 = m if sel32 is None else sel32 * m
        elif fused_compare and with_base:
            base_ref, lit_ref, out_ref = rest
            ts = sel_ref[:]
            lit = lit_ref[0]
            cmp = {
                "<": ts < lit,
                "<=": ts <= lit,
                ">": ts > lit,
                ">=": ts >= lit,
                "==": ts == lit,
                "!=": ts != lit,
            }[cmp_op]
            # int8 compares don't legalize on Mosaic: widen base to i32
            sel32 = cmp.astype(jnp.int32) * base_ref[:].astype(jnp.int32)
        elif fused_compare:
            lit_ref, out_ref = rest
            sel32 = (sel_ref[:] >= lit_ref[0]).astype(jnp.int32)
        else:
            (out_ref,) = rest
            sel32 = sel_ref[:]
        digit_blocks = []
        for d in range(num_digits):
            digit_blocks.append(
                (
                    jax.lax.bitwise_and(
                        jax.lax.shift_right_logical(v, jnp.int32(7 * d)),
                        jnp.int32(127),
                    )
                    * sel32
                ).astype(jnp.int8)
            )
        selb = sel32.astype(jnp.int8)
        zeros_pad = jnp.zeros((pad, 128), jnp.int8) if pad else None

        c = c_ref[:]
        accs = [
            jnp.zeros((8, 128), dtype=jnp.int32) for _ in range(num_code_tiles)
        ]
        # statically unrolled over slabs: all slices are compile-time
        # constant (int8/bf16 compares don't legalize; int32 it is)
        for s in range(SUB):
            row_c = c[s : s + 1, :]  # [1, 128] rows on lanes
            bc = jnp.broadcast_to(row_c, (128, 128))
            rows = [db[s : s + 1] for db in digit_blocks] + [selb[s : s + 1]]
            if zeros_pad is not None:
                rows.append(zeros_pad)
            lhs = jnp.concatenate(rows, axis=0)  # [8, 128]
            for t in range(num_code_tiles):
                onehot_t = (bc == iota_sub + jnp.int32(t * 128)).astype(
                    jnp.int8
                )  # [k, r] for codes in [t*128, (t+1)*128)
                # contract rows on both minor dims (transposed-RHS orientation)
                accs[t] = accs[t] + jax.lax.dot_general(
                    lhs,
                    onehot_t,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
        for t in range(num_code_tiles):
            out_ref[0, :, t * 128 : (t + 1) * 128] = accs[t]

    return _agg_kernel


@functools.partial(jax.jit, static_argnames=("num_codes", "num_digits"))
def pallas_group_sum_count(codes, values, sel, num_codes: int, num_digits: int = 2):
    """Exact (sums[num_codes] int64, counts[num_codes] int64,
    first_super[num_codes] int32) grouped over pre-filtered rows.

    ``first_super[k]`` is the index of the first superblock containing a
    selected row of code k (0 when the code never occurs — disambiguate with
    counts[k] > 0). It falls out of the kernel's per-superblock count
    partials for free and gives the engine's first-occurrence group emission
    order to within one superblock; the compiled layer refines ties on the
    host over just that superblock's rows.

    codes/values: [n_slabs, 128] int32 row-major slabs; sel: [n_slabs, 128]
    int32 0/1 selection (any predicate, evaluated upstream in XLA — it fuses
    into the kernel's input pipeline). values must be non-negative and
    < 128**num_digits (num_digits <= 7); negative/large-magnitude int64
    columns are handled by the caller's bias shift (compiled.py). num_codes
    tiles over the lane dim: ceil(num_codes/128) accumulator tiles.
    """
    n_slabs = codes.shape[0]
    n_super = n_slabs // SUB
    assert n_super * SUB == n_slabs, (n_slabs, SUB)
    tiles = -(-num_codes // 128)
    k_pad = tiles * 128

    # NB: index-map constants must be int32 — with jax_enable_x64 a bare
    # python 0 traces as i64 and Mosaic fails to legalize the kernel's
    # func.return.
    out = pl.pallas_call(
        _make_agg_kernel(num_digits, num_code_tiles=tiles),
        grid=(n_super,),
        in_specs=[
            pl.BlockSpec(
                (SUB, 128), lambda i: (i, jnp.int32(0)), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (SUB, 128), lambda i: (i, jnp.int32(0)), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (SUB, 128), lambda i: (i, jnp.int32(0)), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, k_pad),
            lambda i: (i, jnp.int32(0), jnp.int32(0)),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_super, 8, k_pad), jnp.int32),
    )(codes, values, sel)

    parts = out[:, : num_digits + 1, :num_codes].astype(jnp.int64).sum(axis=0)
    sums = parts[0]
    for d in range(1, num_digits):
        sums = sums + (parts[d] << (7 * d))
    counts = parts[num_digits]
    super_counts = out[:, num_digits, :num_codes]
    first_super = jnp.argmax(super_counts > 0, axis=0).astype(jnp.int32)
    return sums, counts, first_super


@functools.partial(jax.jit, static_argnames=("num_codes", "num_digits"))
def pallas_filter_group_sum_count(
    codes, values, ts, literal, num_codes: int, num_digits: int = 2
):
    """``where ts >= literal group by codes`` with the comparison fused into
    the kernel (no selection vector round-trips HBM) — the bench entry
    point and the compiled layer's comparison-predicate fast path."""
    n_slabs = codes.shape[0]
    n_super = n_slabs // SUB
    assert n_super * SUB == n_slabs, (n_slabs, SUB)
    tiles = -(-num_codes // 128)
    k_pad = tiles * 128
    lit = jnp.asarray([literal], dtype=jnp.int32)
    out = pl.pallas_call(
        _make_agg_kernel(num_digits, fused_compare=True, num_code_tiles=tiles),
        grid=(n_super,),
        in_specs=[
            pl.BlockSpec(
                (SUB, 128), lambda i: (i, jnp.int32(0)), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (SUB, 128), lambda i: (i, jnp.int32(0)), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (SUB, 128), lambda i: (i, jnp.int32(0)), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1,), lambda i: (jnp.int32(0),), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, k_pad),
            lambda i: (i, jnp.int32(0), jnp.int32(0)),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_super, 8, k_pad), jnp.int32),
    )(codes, values, ts.astype(jnp.int32), lit)

    parts = out[:, : num_digits + 1, :num_codes].astype(jnp.int64).sum(axis=0)
    sums = parts[0]
    for d in range(1, num_digits):
        sums = sums + (parts[d] << (7 * d))
    counts = parts[num_digits]
    return sums, counts


@functools.partial(
    jax.jit, static_argnames=("num_codes", "num_digits", "cmp_ops")
)
def pallas_fused_band_group_sum_count(
    codes, values, planes, literals, num_codes: int, num_digits: int,
    cmp_ops: tuple,
):
    """Conjunction of sentinel-masked range predicates fused into the
    kernel (``lo <= ts < hi`` bands, multi-column AND chains): one cached
    4B compare plane per clause, literals in SMEM — no selection plane in
    HBM. Returns (sums, counts, first_super)."""
    n_slabs = codes.shape[0]
    n_super = n_slabs // SUB
    assert n_super * SUB == n_slabs, (n_slabs, SUB)
    tiles = -(-num_codes // 128)
    k_pad = tiles * 128
    lits = jnp.stack([l.astype(jnp.int32) for l in literals]).reshape(-1)
    n_cl = len(cmp_ops)
    in_specs = [
        pl.BlockSpec(
            (SUB, 128), lambda i: (i, jnp.int32(0)), memory_space=pltpu.VMEM
        )
        for _ in range(2 + n_cl)
    ] + [
        pl.BlockSpec(
            (n_cl,), lambda i: (jnp.int32(0),), memory_space=pltpu.SMEM
        )
    ]
    out = pl.pallas_call(
        _make_agg_kernel(
            num_digits,
            fused_compare=True,
            num_code_tiles=tiles,
            cmp_op=tuple(cmp_ops),
        ),
        grid=(n_super,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 8, k_pad),
            lambda i: (i, jnp.int32(0), jnp.int32(0)),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_super, 8, k_pad), jnp.int32),
    )(codes, values, *planes, lits)

    parts = out[:, : num_digits + 1, :num_codes].astype(jnp.int64).sum(axis=0)
    sums = parts[0]
    for d in range(1, num_digits):
        sums = sums + (parts[d] << (7 * d))
    counts = parts[num_digits]
    super_counts = out[:, num_digits, :num_codes]
    first_super = jnp.argmax(super_counts > 0, axis=0).astype(jnp.int32)
    return sums, counts, first_super


@functools.partial(
    jax.jit, static_argnames=("num_codes", "num_digits", "cmp_op")
)
def pallas_fused_cmp_group_sum_count(
    codes, values, ts, base8, literal, num_codes: int, num_digits: int,
    cmp_op: str,
):
    """The serving hot shape with the filter fused INTO the kernel:
    ``where ts <op> literal group by codes`` with an int8 base-validity
    plane (padding x leaf validity, cached across queries). Returns
    (sums, counts, first_super) like pallas_group_sum_count; saves the
    selection plane's HBM write+read (the compiled engine path measured
    ~2x slower than the raw kernel purely from that traffic)."""
    n_slabs = codes.shape[0]
    n_super = n_slabs // SUB
    assert n_super * SUB == n_slabs, (n_slabs, SUB)
    tiles = -(-num_codes // 128)
    k_pad = tiles * 128
    lit = literal.reshape(1).astype(jnp.int32)
    out = pl.pallas_call(
        _make_agg_kernel(
            num_digits,
            fused_compare=True,
            num_code_tiles=tiles,
            cmp_op=cmp_op,
            with_base=True,
        ),
        grid=(n_super,),
        in_specs=[
            pl.BlockSpec(
                (SUB, 128), lambda i: (i, jnp.int32(0)), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (SUB, 128), lambda i: (i, jnp.int32(0)), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (SUB, 128), lambda i: (i, jnp.int32(0)), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (SUB, 128), lambda i: (i, jnp.int32(0)), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1,), lambda i: (jnp.int32(0),), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, k_pad),
            lambda i: (i, jnp.int32(0), jnp.int32(0)),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_super, 8, k_pad), jnp.int32),
    )(codes, values, ts, base8, lit)

    parts = out[:, : num_digits + 1, :num_codes].astype(jnp.int64).sum(axis=0)
    sums = parts[0]
    for d in range(1, num_digits):
        sums = sums + (parts[d] << (7 * d))
    counts = parts[num_digits]
    super_counts = out[:, num_digits, :num_codes]
    first_super = jnp.argmax(super_counts > 0, axis=0).astype(jnp.int32)
    return sums, counts, first_super


_I32_MAX = 2**31 - 1
_I32_MIN = -(2**31)


def _make_minmax_kernel(num_code_tiles: int):
    """Grouped min/max kernel: per slab, mask the broadcast value tile with
    the one-hot (code k on sublanes, row r on lanes) and fold elementwise
    minimum/maximum into per-tile accumulators — pure VPU work, no matmul.
    The output blocks use a CONSTANT index map, so they stay resident in
    VMEM across the whole grid (the standard revisited-accumulator pattern):
    HBM output traffic is one [tiles*128, 128] tile total, and the final
    lane reduction happens outside in XLA on that tiny buffer."""

    def _kernel(c_ref, v_ref, sel_ref, min_ref, max_ref):
        i = pl.program_id(0)
        iota_sub = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        c = c_ref[:]
        v = v_ref[:]
        sel32 = sel_ref[:]
        mins = [
            jnp.full((128, 128), _I32_MAX, jnp.int32)
            for _ in range(num_code_tiles)
        ]
        maxs = [
            jnp.full((128, 128), _I32_MIN, jnp.int32)
            for _ in range(num_code_tiles)
        ]
        for s in range(SUB):
            bc = jnp.broadcast_to(c[s : s + 1, :], (128, 128))
            bv = jnp.broadcast_to(v[s : s + 1, :], (128, 128))
            bsel = jnp.broadcast_to(sel32[s : s + 1, :], (128, 128)) > 0
            for t in range(num_code_tiles):
                m = (bc == iota_sub + jnp.int32(t * 128)) & bsel
                mins[t] = jnp.minimum(
                    mins[t], jnp.where(m, bv, jnp.int32(_I32_MAX))
                )
                maxs[t] = jnp.maximum(
                    maxs[t], jnp.where(m, bv, jnp.int32(_I32_MIN))
                )
        for t in range(num_code_tiles):
            lo, hi = t * 128, (t + 1) * 128

            @pl.when(i == 0)
            def _(t=t, lo=lo, hi=hi):
                min_ref[lo:hi, :] = mins[t]
                max_ref[lo:hi, :] = maxs[t]

            @pl.when(i > 0)
            def _(t=t, lo=lo, hi=hi):
                min_ref[lo:hi, :] = jnp.minimum(min_ref[lo:hi, :], mins[t])
                max_ref[lo:hi, :] = jnp.maximum(max_ref[lo:hi, :], maxs[t])

    return _kernel


@functools.partial(jax.jit, static_argnames=("num_codes",))
def pallas_group_min_max(codes, values, sel, num_codes: int):
    """Exact (mins[num_codes] int32, maxs[num_codes] int32) over selected
    rows, with _I32_MAX/_I32_MIN sentinels for codes with no selected rows
    (disambiguate with the sum/count kernel's counts). Same layout contract
    as pallas_group_sum_count; values must fit int32 (compiled.py's bias
    shift handles the general int64 case)."""
    n_slabs = codes.shape[0]
    n_super = n_slabs // SUB
    assert n_super * SUB == n_slabs, (n_slabs, SUB)
    tiles = -(-num_codes // 128)
    k_pad = tiles * 128

    out_min, out_max = pl.pallas_call(
        _make_minmax_kernel(tiles),
        grid=(n_super,),
        in_specs=[
            pl.BlockSpec(
                (SUB, 128), lambda i: (i, jnp.int32(0)), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (SUB, 128), lambda i: (i, jnp.int32(0)), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (SUB, 128), lambda i: (i, jnp.int32(0)), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (k_pad, 128),
                lambda i: (jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (k_pad, 128),
                lambda i: (jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k_pad, 128), jnp.int32),
            jax.ShapeDtypeStruct((k_pad, 128), jnp.int32),
        ],
    )(codes, values, sel)

    mins = out_min.min(axis=1)[:num_codes]
    maxs = out_max.max(axis=1)[:num_codes]
    return mins, maxs


def _make_compact_kernel(capb_tiles: int):
    """Per-superblock selected-row compaction (the scan serving path's
    bitmap -> row-position materialization, reference filter.go:276-354).

    For one 8192-row block: exclusive prefix sums assign each selected row
    its block-local output position in row-major (stream) order —
    lane-prefix via a strictly-lower-triangular f32 matmul, sublane-prefix
    via a [SUB, SUB] triangular matmul (counts <= 8192 are exact in f32) —
    then the j-th selected row id is extracted with the same
    broadcast-vs-sublane-iota one-hot matmul pattern as the aggregation
    kernel (no transposes, no scatters: XLA-level compaction
    (jnp.nonzero / cumsum+scatter / top_k) measures 12-1500 ms for 16.7M
    rows on this TPU; this kernel is bandwidth-bound)."""

    def _kernel(sel_ref, idx_ref):
        self32 = sel_ref[:].astype(jnp.float32)  # [SUB, 128]
        # exclusive lane prefix: p_lane[s, l] = sum_{l' < l} sel[s, l']
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        tri_l = (iota_r < iota_c).astype(jnp.float32)  # [l', l]
        p_lane = jax.lax.dot_general(
            self32,
            tri_l,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # per-slab totals + exclusive sublane prefix
        row_tot = p_lane[:, 127:128] + self32[:, 127:128]  # [SUB, 1]
        iota_sr = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 0)
        iota_sc = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 1)
        tri_s = (iota_sr < iota_sc).astype(jnp.float32)  # [s', s]
        P = jax.lax.dot_general(
            tri_s,
            row_tot,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [SUB, 1]: P[s] = sum_{s' < s} row_tot[s']
        pos = p_lane + P  # [SUB, 128] block-local output position
        total = P[SUB - 1 : SUB, 0:1] + row_tot[SUB - 1 : SUB, 0:1]

        # Extraction on the MXU int8 path (the agg kernel's fast pattern;
        # f32 matmuls decompose into multiple bf16 passes and rounded row
        # ids past 256): positions of unselected rows fold to -1 so the
        # one-hot needs a single int32 compare, and the row id splits
        # bf16-free as lane (<= 127) + slab (<= 63) int8 LHS rows,
        # recombined as 128*slab + lane on the [K]-sized output.
        pos_m = jnp.where(
            self32 > 0.5, pos, jnp.float32(-1)
        ).astype(jnp.int32)  # [SUB, 128]
        iota_sub = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        accs = [
            jnp.zeros((8, 128), dtype=jnp.int32) for _ in range(capb_tiles)
        ]
        zeros_pad = jnp.zeros((6, 128), jnp.int8)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1).astype(
            jnp.int8
        )
        for s in range(SUB):
            slab_row = jnp.full((1, 128), jnp.int8(s))
            lhs = jnp.concatenate(
                [lane_iota, slab_row, zeros_pad], axis=0
            )  # [8, 128] int8
            bpos = jnp.broadcast_to(pos_m[s : s + 1, :], (128, 128))
            for t in range(capb_tiles):
                onehot = (bpos == iota_sub + jnp.int32(t * 128)).astype(
                    jnp.int8
                )  # [j, l]
                accs[t] = accs[t] + jax.lax.dot_general(
                    lhs,
                    onehot,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
        for t in range(capb_tiles):
            idx_ref[0, :, t * 128 : (t + 1) * 128] = accs[t]
        # the block count rides in output row 2 (row 0 = lane parts,
        # row 1 = slab parts; rows 3-7 are matmul padding) — written
        # AFTER the acc tiles.
        idx_ref[0, 2:3, 0:128] = jnp.broadcast_to(
            total.astype(jnp.int32), (1, 128)
        )

    return _kernel


@functools.partial(jax.jit, static_argnames=("capb",))
def pallas_block_compact(sel, capb: int):
    """(bc [n_super] int32, idx [n_super, capb] int32): per-8192-row-block
    selected counts and the first ``capb`` selected row offsets per block
    in ascending (stream) order; slots past a block's count are undefined
    (the caller slices by bc). sel: [n_slabs, 128] int32 0/1."""
    n_slabs = sel.shape[0]
    n_super = n_slabs // SUB
    assert n_super * SUB == n_slabs, (n_slabs, SUB)
    tiles = -(-capb // 128)
    cap_pad = tiles * 128

    out = pl.pallas_call(
        _make_compact_kernel(tiles),
        grid=(n_super,),
        in_specs=[
            pl.BlockSpec(
                (SUB, 128), lambda i: (i, jnp.int32(0)), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, cap_pad),
            lambda i: (i, jnp.int32(0), jnp.int32(0)),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_super, 8, cap_pad), jnp.int32),
    )(sel)

    idx = out[:, 0, :capb] + 128 * out[:, 1, :capb]
    return (out[:, 2, 0], idx)


def to_row_major(col):
    """[N] -> [N/128, 128] row-major slabs."""
    n = col.shape[0]
    return col.reshape(n // 128, 128)
