"""dbtool — inspect parquet blocks, WAL segments and snapshots.

Reference: cmd/parquet-tool (dump/stats/rowgroup/row/find on parquet files,
WAL inspect, snapshot inspect; cmd/parquet-tool/cmd/*.go).

Usage:
    python -m frostdb_tpu.tools.dbtool parquet-stats  <file.parquet>
    python -m frostdb_tpu.tools.dbtool parquet-dump   <file.parquet> [--rows N]
    python -m frostdb_tpu.tools.dbtool parquet-rowgroups <file.parquet>
    python -m frostdb_tpu.tools.dbtool wal <wal-dir> [--verbose]
    python -m frostdb_tpu.tools.dbtool snapshot <file.fdbt>
"""

from __future__ import annotations

import argparse
import json
import sys


def parquet_stats(path: str) -> None:
    import pyarrow.parquet as pq

    f = pq.ParquetFile(path)
    md = f.metadata
    print(f"file: {path}")
    print(f"rows: {md.num_rows}  row_groups: {md.num_row_groups}  columns: {md.num_columns}")
    print(f"created_by: {md.created_by}")
    kv = md.metadata or {}
    for k, v in kv.items():
        if k != b"ARROW:schema":
            print(f"meta {k.decode()}: {v[:200].decode(errors='replace')}")
    print("schema:")
    print(f.schema_arrow)


def parquet_rowgroups(path: str) -> None:
    import pyarrow.parquet as pq

    f = pq.ParquetFile(path)
    md = f.metadata
    for g in range(md.num_row_groups):
        rg = md.row_group(g)
        print(f"row group {g}: rows={rg.num_rows} bytes={rg.total_byte_size}")
        for c in range(rg.num_columns):
            col = rg.column(c)
            s = col.statistics
            mm = (
                f" min={s.min!r} max={s.max!r} nulls={s.null_count}"
                if s is not None and s.has_min_max
                else ""
            )
            print(
                f"  {col.path_in_schema}: {col.physical_type}"
                f" {col.compression} bytes={col.total_compressed_size}{mm}"
            )


def parquet_dump(path: str, rows: int) -> None:
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    print(t.slice(0, rows).to_pandas().to_string())


def wal_inspect(path: str, verbose: bool) -> None:
    from ..wal import FileWAL

    w = FileWAL(path)
    counts: dict[str, int] = {}
    txs: list[int] = []

    def h(header, body):
        counts[header["kind"]] = counts.get(header["kind"], 0) + 1
        txs.append(header["tx"])
        if verbose:
            print(json.dumps({k: v for k, v in header.items() if k != "bl"}))

    w.replay(h, from_tx=0, repair=False)
    print(f"entries: {sum(counts.values())}  kinds: {counts}")
    if txs:
        print(f"tx range: {min(txs)}..{max(txs)}")
    if w.repairs:
        print(f"repairs: {w.repairs} lost_records: {w.repairs_lost_records}")


def snapshot_inspect(path: str) -> None:
    from ..snapshot import read_footer

    footer = read_footer(path)
    if footer is None:
        print("INVALID snapshot (bad magic or checksum)")
        sys.exit(1)
    print(f"snapshot tx: {footer['tx']}")
    for t in footer["tables"]:
        nrows = "?"
        print(
            f"table {t['name']}: block={t.get('active_block_id', '?')[:8]}"
            f" parts={len(t['parts'])}"
        )
        for p in t["parts"]:
            print(
                f"  part tx={p['tx']} level={p['level']}"
                f" offset={p['offset']} length={p['length']}"
            )


def parquet_reencode(path: str, schema_file: str, out_path: str) -> None:
    """Re-encode a parquet file through a frostdb schema definition
    (reference: cmd/parquet-reencode/main.go — open the file, re-sort rows
    by the new schema's sorting columns, rewrite through its writer)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..columnbatch import ColumnBatch, Dictionary
    from ..schema import Schema, SchemaDef

    with open(schema_file) as f:
        sdef = SchemaDef.from_dict(json.load(f))
    schema = Schema(sdef)

    dicts: dict[str, Dictionary] = {}

    def get_dictionary(fam: str) -> Dictionary:
        return dicts.setdefault(fam.split(".", 1)[0], Dictionary())

    t = pq.read_table(path)
    batch = ColumnBatch.from_arrow(t, get_dictionary=get_dictionary)
    sorting = schema.sorting_key_columns(batch.dynamic_columns())
    batch = batch.sort_by(sorting)
    out = pa.Table.from_batches([batch.to_arrow()])
    out = out.replace_schema_metadata(
        {b"frostdb_tpu.schema": json.dumps(sdef.to_dict()).encode()}
    )
    pq.write_table(out, out_path, compression="zstd")
    print(
        f"reencoded {batch.num_rows} rows -> {out_path} "
        f"(sorted by {[n for n, _s in sorting]})"
    )


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="dbtool")
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("parquet-stats")
    p.add_argument("file")
    p = sub.add_parser("parquet-rowgroups")
    p.add_argument("file")
    p = sub.add_parser("parquet-dump")
    p.add_argument("file")
    p.add_argument("--rows", type=int, default=20)
    p = sub.add_parser("wal")
    p.add_argument("dir")
    p.add_argument("--verbose", action="store_true")
    p = sub.add_parser("snapshot")
    p.add_argument("file")
    p = sub.add_parser("reencode")
    p.add_argument("file")
    p.add_argument("schema")
    p.add_argument("out")
    args = ap.parse_args(argv)

    if args.cmd == "parquet-stats":
        parquet_stats(args.file)
    elif args.cmd == "parquet-rowgroups":
        parquet_rowgroups(args.file)
    elif args.cmd == "parquet-dump":
        parquet_dump(args.file, args.rows)
    elif args.cmd == "wal":
        wal_inspect(args.dir, args.verbose)
    elif args.cmd == "snapshot":
        snapshot_inspect(args.file)
    elif args.cmd == "reencode":
        parquet_reencode(args.file, args.schema, args.out)


if __name__ == "__main__":
    main()
