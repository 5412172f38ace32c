"""Iceberg data source (reference: storage/iceberg.go — DataSource over
iceberg-go tables in a bucket).

Real Iceberg manifests are Avro; this image ships no Avro or pyiceberg
library, so the full reader cannot be built from the stdlib honestly. This
module provides the DataSource API surface and activates automatically if
``pyiceberg`` becomes available; until then construction raises with a
clear message. (Tracked as a known gap; the reference marks its own Iceberg
support experimental.)
"""

from __future__ import annotations

from typing import Iterable, Optional


class IcebergUnavailable(ImportError):
    pass


class IcebergDataSource:
    """DataSource over an Iceberg catalog (reference: storage/iceberg.go:65
    Iceberg; scan path iceberg.go:230 filters data files with the same
    TrueNegativeFilter contract as the bucket source)."""

    def __init__(self, catalog_uri: str, namespace: str = "default"):
        try:
            import pyiceberg  # noqa: F401
        except ImportError as e:
            raise IcebergUnavailable(
                "Iceberg support requires the 'pyiceberg' package (Avro "
                "manifest parsing); it is not installed in this environment."
            ) from e
        from pyiceberg.catalog import load_catalog

        self.catalog = load_catalog("default", uri=catalog_uri)
        self.namespace = namespace

    def prefixes(self, db: str) -> list[str]:
        return [
            t[-1] for t in self.catalog.list_tables((self.namespace,))
        ]

    def scan(
        self,
        db: str,
        table: str,
        schema,
        filter,
        get_dictionary,
        exclude_block_ids: Iterable[str] = (),
    ):
        from .columnbatch import ColumnBatch

        tbl = self.catalog.load_table((self.namespace, table))
        scan = tbl.scan()
        out = []
        for batch in scan.to_arrow().to_batches():
            out.append(ColumnBatch.from_arrow(batch, get_dictionary=get_dictionary))
        return out
