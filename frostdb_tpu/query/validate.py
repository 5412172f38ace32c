"""Plan validation (reference: query/logicalplan/validate.go).

Checks that each node carries exactly one field and that aggregations /
filter comparisons are well-typed for the scanned schema.
"""

from __future__ import annotations

from . import expr as E
from ..columnbatch import KIND_DICT, KIND_FLOAT64, KIND_INT64
from .logical import LogicalPlan


class PlanValidationError(Exception):
    pass


def validate(plan: LogicalPlan) -> None:
    node = plan
    while node is not None:
        _validate_node(node)
        node = node.input


def _validate_node(node: LogicalPlan) -> None:
    fields = [
        f
        for f in (
            node.table_scan,
            node.schema_scan,
            node.filter,
            node.projection,
            node.distinct,
            node.aggregation,
            node.limit,
            node.sample,
            node.join,
        )
        if f is not None
    ]
    if len(fields) != 1:
        raise PlanValidationError(
            f"plan node must have exactly one field, found {len(fields)}"
        )
    if node.aggregation is not None:
        _validate_aggregation(node)
    if node.join is not None:
        _validate_join(node)


def _validate_join(node: LogicalPlan) -> None:
    from .logical import JOIN_MODES

    join = node.join
    if join.how not in JOIN_MODES:
        raise PlanValidationError(f"unknown join mode {join.how!r}")
    if not join.on:
        raise PlanValidationError("join needs at least one key column")
    if join.right is None:
        raise PlanValidationError("join needs a right-side plan")
    validate(join.right)


def _validate_aggregation(node: LogicalPlan) -> None:
    # No sum/max/min of string columns (reference: validate.go aggregation
    # type checks).
    for agg in node.aggregation.agg_exprs:
        if agg.func in (E.AGG_SUM, E.AGG_MIN, E.AGG_MAX, E.AGG_AVG):
            kind = node.data_type_for_expr(agg.expr)
            if kind == KIND_DICT:
                raise PlanValidationError(
                    f"cannot {agg.func} over string column {agg.expr.name()}"
                )
