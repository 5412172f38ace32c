"""Remote-plan protocol tests (reference: query/exprpb/proto.go round-trips,
engine.go ProtoEngine, and the gRPC FrostDBService)."""

import numpy as np

from frostdb_tpu.db import ColumnStore
from frostdb_tpu.exprpb import (
    ProtoEngine,
    RemoteClient,
    expr_from_proto,
    expr_to_proto,
    make_grpc_server,
    plan_from_proto,
    plan_to_proto,
)
from frostdb_tpu.query import expr as E
from frostdb_tpu.query.logical import Builder
from frostdb_tpu.schema import sample_definition
from frostdb_tpu.table import TableConfig
from tests.test_db import _make_batch


def test_expr_roundtrip():
    exprs = [
        E.Col("timestamp").gt_eq(2),
        E.And(E.Col("a").eq("x"), E.Col("b").regex_match("v.*")),
        E.Sum(E.BinaryExpr(E.Col("value"), E.OP_MUL, E.Col("timestamp"))),
        E.DynCol("labels"),
        E.Literal(None),
        E.Literal(True),
        E.Literal(3.5),
        E.Convert(E.Count(E.Col("v")), "float64"),
        E.Col("x").alias("y"),
        E.IsNullExpr(E.Col("x")),
        E.Duration(5000),
        E.AllExpr(),
    ]
    for e in exprs:
        p = expr_to_proto(e)
        back = expr_from_proto(p)
        assert back.name() == e.name(), (e.name(), back.name())


def test_plan_roundtrip_and_proto_engine():
    store = ColumnStore()
    db = store.db("test")
    table = db.table("t", TableConfig(schema=sample_definition()))
    table.insert_record(_make_batch(table))

    plan = (
        Builder()
        .scan(db.table_provider(), "t")
        .filter(E.Col("timestamp").gt_eq(2))
        .aggregate([E.Sum(E.Col("value"))], [E.Col("example_type")])
        .build()
    )
    node = plan_to_proto(plan)
    rebuilt = plan_from_proto(node, db.table_provider())
    assert rebuilt.aggregation is not None

    results = []
    ProtoEngine(db.table_provider()).execute(node, lambda b: results.append(b))
    assert results
    c = results[0].column("sum(value)")
    assert int(c.values[0]) == 5  # rows ts>=2 have values 2,3


def test_grpc_query_stream():
    store = ColumnStore()
    db = store.db("grpcdb")
    table = db.table("t", TableConfig(schema=sample_definition()))
    table.insert_record(_make_batch(table))

    server, port = make_grpc_server(store)
    server.start()
    try:
        client = RemoteClient(f"127.0.0.1:{port}")
        plan = (
            Builder()
            .scan(db.table_provider(), "t")
            .aggregate([E.Sum(E.Col("value"))], [E.Col("example_type")])
            .build()
        )
        batches = list(client.query(plan, database="grpcdb"))
        assert batches
        c = batches[0].column("sum(value)")
        assert int(c.values[0]) == 6
    finally:
        server.stop(0)


def test_order_by_round_trip():
    """OrderBy survives the serialized-plan protocol (north-star remote
    surface: a sorted query executes identically via gRPC)."""
    from frostdb_tpu.exprpb import plan_from_proto, plan_to_proto
    from frostdb_tpu.query.logical import Builder

    plan = (
        Builder()
        .scan(None, "t")
        .project(E.Col("value"), E.Col("timestamp"))
        .order_by(("value", "desc"), "timestamp")
        .limit(E.Literal(5))
        .build()
    )
    msg = plan_to_proto(plan)
    rebuilt = plan_from_proto(msg, None)
    assert rebuilt.limit is not None
    ob = rebuilt.input.order_by
    assert ob.keys == [("value", "desc"), ("timestamp", "asc")]
