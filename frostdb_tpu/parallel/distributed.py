"""Distributed filter + two-phase aggregation over a device mesh.

The per-chip stage is the reference's non-final HashAggregate
(aggregate.go:124); the cross-chip combine is a ``psum`` over the mesh axis
instead of the Synchronizer barrier (synchronize.go:16). Group keys are
dense dictionary codes (table-global dictionaries make codes comparable
across shards, columnbatch.py), so the partial state is a dense [K] table
per aggregation — the TPU-native open-addressing table with no collisions.

For group spaces too large for a dense table the plan is hash-partitioned
all_to_all repartitioning (SURVEY.md §5.8); that path lands with the
shuffle engine (see join.py for the co-partitioned case).
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops import kernels as K
from .mesh import PartitionedTable


def _shard_map(f, mesh, in_specs, out_specs):
    return jax.shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


def combine_codes(codes_and_sizes: Sequence[tuple[jax.Array, int]]):
    """Combine multiple small code spaces into one dense code:
    code = c1*K2*K3... + c2*K3 + ... Returns (codes, K_total)."""
    code = None
    k_total = 1
    for c, k in codes_and_sizes:
        c = c.astype(jnp.int32)
        if code is None:
            code = c
        else:
            code = code * k + c
        k_total *= k
    return code, k_total


def distributed_filter_aggregate(
    table: PartitionedTable,
    group_col: str,
    num_codes: int,
    agg_specs: Sequence[tuple[str, str]],  # (op, value column)
    filter_col: str | None = None,
    filter_op: str = ">=",
    filter_literal=0,
):
    """Compiled distributed query step: filter + group-by-aggregate.

    Returns a jitted zero-arg callable producing replicated dense [num_codes]
    arrays (one per agg spec) plus the per-code row counts. Re-running after
    table updates reuses the compiled executable.
    """
    mesh = table.mesh
    axis = table.axis

    gcol = table.column(group_col)
    args = [gcol.data, gcol.validity]
    arg_idx = {"group": (0, 1)}
    i = 2
    if filter_col is not None:
        fcol = table.column(filter_col)
        args += [fcol.data, fcol.validity]
        arg_idx["filter"] = (i, i + 1)
        i += 2
    for _op, vc in agg_specs:
        c = table.column(vc)
        args += [c.data, c.validity]
        arg_idx.setdefault("aggs", []).append((i, i + 1))
        i += 2

    ops = tuple(op for op, _vc in agg_specs)

    def step(*xs):
        g = xs[arg_idx["group"][0]]
        gvalid = xs[arg_idx["group"][1]]
        sel = gvalid | True  # include null group rows; padding filtered below
        # Padding rows have validity False on every column; use the group
        # column's validity as the padding indicator for non-nullable keys,
        # and an explicit row-valid companion otherwise.
        sel = gvalid
        if filter_col is not None:
            fv = xs[arg_idx["filter"][0]]
            fvalid = xs[arg_idx["filter"][1]]
            sel = sel & fvalid & K.compare_scalar_mask(
                fv, fvalid, filter_literal, filter_op
            )
        outs = []
        codes = g.astype(jnp.int32)
        for (op, _vc), (vi, vvi) in zip(agg_specs, arg_idx["aggs"]):
            v = xs[vi]
            partial = K.dense_group_reduce(codes, v, sel, num_codes, op)
            if op in (K.AGG_SUM, K.AGG_COUNT):
                total = jax.lax.psum(partial, axis)
            elif op == K.AGG_MIN:
                total = jax.lax.pmin(partial, axis)
            else:
                total = jax.lax.pmax(partial, axis)
            outs.append(total)
        counts = jax.lax.psum(
            K.dense_group_reduce(codes, jnp.ones_like(codes, dtype=jnp.int64), sel, num_codes, K.AGG_COUNT),
            axis,
        )
        return tuple(outs) + (counts,)

    in_specs = tuple(P(axis) for _ in args)
    out_specs = tuple(P() for _ in range(len(agg_specs) + 1))
    f = _shard_map(step, mesh, in_specs, out_specs)
    jf = jax.jit(f)

    def run():
        res = jf(*args)
        return res[:-1], res[-1]

    return run


def distributed_distinct(table: PartitionedTable, col: str, num_codes: int):
    """Distinct codes present in a column across all shards (reference:
    distinct.go; here a dense presence bitmap + pmax)."""
    mesh = table.mesh
    axis = table.axis
    c = table.column(col)

    def step(codes, valid):
        present = K.dense_group_reduce(
            codes.astype(jnp.int32),
            jnp.ones_like(codes, dtype=jnp.int64),
            valid,
            num_codes,
            K.AGG_COUNT,
        )
        return jax.lax.psum(present, axis) > 0

    f = _shard_map(step, mesh, (P(axis), P(axis)), P())
    return jax.jit(f)(c.data, c.validity)
