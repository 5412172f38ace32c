"""Nested/struct schemas (VERDICT round-2 item 8; reference:
dynparquet/schema.go:259 SchemaFromDefinition accepts nested v1alpha2
definitions; internal/records/record_builder.go struct fields). Groups
flatten to dotted leaf columns for storage/query; struct arrays round-trip
at the Arrow edges; the nested config survives WAL recovery."""

import numpy as np
import pyarrow as pa

from frostdb_tpu.columnbatch import Column, ColumnBatch, KIND_DICT, KIND_INT64
from frostdb_tpu.db import ColumnStore
from frostdb_tpu.query import expr as E
from frostdb_tpu.query.engine import LocalEngine
from frostdb_tpu.schema import (
    ColumnDef,
    ENCODING_RLE_DICTIONARY,
    GroupDef,
    Schema,
    SchemaDef,
    SortingColumnDef,
    StorageLayout,
    TYPE_INT64,
    TYPE_STRING,
)
from frostdb_tpu.table import TableConfig

_DICT_STR = StorageLayout(
    TYPE_STRING, nullable=True, encoding=ENCODING_RLE_DICTIONARY
)


def _nested_def():
    return SchemaDef(
        name="nested",
        columns=(
            GroupDef(
                "attributes",
                nodes=(
                    ColumnDef("region", _DICT_STR),
                    ColumnDef("zone", _DICT_STR),
                    GroupDef(
                        "owner",
                        nodes=(ColumnDef("team", _DICT_STR),),
                    ),
                ),
                nullable=True,
            ),
            ColumnDef("name", _DICT_STR),
            ColumnDef("timestamp", StorageLayout(TYPE_INT64)),
            ColumnDef("value", StorageLayout(TYPE_INT64)),
        ),
        sorting_columns=(
            SortingColumnDef("name", "asc"),
            SortingColumnDef("timestamp", "asc"),
        ),
    )


def test_schema_flattening_and_roundtrip():
    s = Schema(_nested_def())
    names = [c.name for c in s.columns()]
    assert names == [
        "attributes.region",
        "attributes.zone",
        "attributes.owner.team",
        "name",
        "timestamp",
        "value",
    ]
    assert s.column_by_name("attributes.region").layout.dict_encoded
    assert [g.name for g in s.groups()] == ["attributes"]
    # nested definition survives dict serialization (WAL TableConfig)
    d = _nested_def().to_dict()
    back = SchemaDef.from_dict(d)
    assert back == _nested_def()


def _struct_batch(n=6):
    regions = ["us", "eu", "us", None, "ap", "eu"]
    zones = ["a", "b", "a", "c", "b", "a"]
    teams = ["red", "blue", "red", "red", None, "blue"]
    struct = pa.StructArray.from_arrays(
        [
            pa.array(regions[:n], type=pa.string()),
            pa.array(zones[:n], type=pa.string()),
            pa.StructArray.from_arrays(
                [pa.array(teams[:n], type=pa.string())], names=["team"]
            ),
        ],
        names=["region", "zone", "owner"],
    )
    return pa.RecordBatch.from_arrays(
        [
            struct,
            pa.array(["x"] * n, type=pa.string()),
            pa.array(np.arange(n, dtype=np.int64)),
            pa.array(np.arange(n, dtype=np.int64) * 10),
        ],
        names=["attributes", "name", "timestamp", "value"],
    )


def test_struct_ingest_query_rotate_recover(tmp_path):
    store = ColumnStore(storage_path=str(tmp_path / "db"), enable_wal=True)
    db = store.db("test")
    table = db.table("t", TableConfig(schema=_nested_def()))
    table.insert_record(_struct_batch())

    engine = LocalEngine(db.table_provider())
    out = []
    engine.scan_table("t").aggregate(
        [E.Sum(E.Col("value"))], [E.Col("attributes.region")]
    ).execute(out.append)
    b = out[0]
    got = {
        b.column("attributes.region").py_value(i): b.column(
            "sum(value)"
        ).py_value(i)
        for i in range(b.num_rows)
    }
    assert got == {"us": 0 + 20, "eu": 10 + 50, None: 30, "ap": 40}

    # nested leaf filter
    out2 = []
    engine.scan_table("t").filter(
        E.Col("attributes.owner.team").eq("red")
    ).aggregate([E.Sum(E.Col("value"))], []).execute(out2.append)
    assert out2[0].column("sum(value)").py_value(0) == 0 + 20 + 30

    store.close()

    # recovery: nested config + data survive the WAL round-trip
    store2 = ColumnStore(storage_path=str(tmp_path / "db"), enable_wal=True)
    db2 = store2.db("test")
    t2 = db2.get_table("t")
    assert [g.name for g in t2.schema().groups()] == ["attributes"]
    out3 = []
    LocalEngine(db2.table_provider()).scan_table("t").aggregate(
        [E.Sum(E.Col("value"))], [E.Col("attributes.region")]
    ).execute(out3.append)
    b3 = out3[0]
    got3 = {
        b3.column("attributes.region").py_value(i): b3.column(
            "sum(value)"
        ).py_value(i)
        for i in range(b3.num_rows)
    }
    assert got3 == got
    store2.close()


def test_struct_arrow_roundtrip():
    store = ColumnStore()
    db = store.db("test")
    table = db.table("t", TableConfig(schema=_nested_def()))
    table.insert_record(_struct_batch())

    engine = LocalEngine(db.table_provider())
    out = []
    engine.scan_table("t").project(
        E.Col("attributes.region"),
        E.Col("attributes.zone"),
        E.Col("attributes.owner.team"),
        E.Col("value"),
    ).execute(out.append)
    rb = out[0].to_arrow(schema=table.schema())
    # dotted leaves re-nested into one struct field
    assert rb.schema.names == ["attributes", "value"]
    assert pa.types.is_struct(rb.schema.field("attributes").type)
    flat = rb.column(0).flatten()
    regions = flat[0].to_pylist()
    assert sorted(r for r in regions if r is not None) == sorted(
        ["us", "eu", "us", "ap", "eu"]
    )
    store.close()


def test_null_struct_row_nulls_children():
    struct = pa.StructArray.from_arrays(
        [pa.array(["us", "eu"]), pa.array(["a", "b"])],
        names=["region", "zone"],
    )
    # make row 1 a null struct
    struct = pa.StructArray.from_buffers(
        struct.type,
        2,
        [pa.array([True, False]).buffers()[1]],
        children=[struct.field(0), struct.field(1)],
    )
    rb = pa.RecordBatch.from_arrays(
        [struct, pa.array(np.array([1, 2], dtype=np.int64))],
        names=["attributes", "value"],
    )
    cb = ColumnBatch.from_arrow(rb)
    region = cb.column("attributes.region")
    assert bool(region.validity[0]) and not bool(region.validity[1])
