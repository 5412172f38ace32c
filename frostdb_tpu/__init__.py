"""frostdb_tpu — a TPU-native embeddable wide-column columnar database.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
polarsignals/frostdb (reference: /root/reference, pure Go):

- Parquet is the storage format, an SoA device-resident column-chunk layout is
  the in-memory query format (reference: README.md:60 uses Arrow in memory).
- Dynamic columns: schema columns created at runtime such as ``labels.<name>``
  (reference: README.md:62-84, dynparquet/schema.go:112).
- Snapshot isolation via a watermark-based transaction scheme
  (reference: README.md:106-112, tx_list.go).
- Queries execute as jit-compiled vectorized kernels over static-shape device
  column batches, planned from a logical plan with pushdown optimizers
  (reference: query/logicalplan, query/physicalplan).

The compute path is TPU-first: string columns are table-global dictionary
codes (int32) on device; predicates over strings are evaluated host-side on
the small dictionary and become code-membership masks on device; grouping is
exact multi-key sort + segment reduction (with a dense-code fast path that
maps onto segment_sum / MXU one-hot matmul); multi-chip execution shards rows
over a jax.sharding.Mesh with psum/all_to_all collectives instead of the
reference's goroutine fan-out (reference: physicalplan.go:22).
"""

from . import config as _config  # noqa: F401  (must run before any jax use)

from .schema import (  # noqa: E402
    SchemaDef,
    ColumnDef,
    StorageLayout,
    SortingColumnDef,
    Schema,
    sample_definition,
    sample_definition_with_float,
    prehashed_sample_definition,
)
from .columnbatch import ColumnBatch, Dictionary  # noqa: E402

try:  # runtime layers land as they are built
    from .db import ColumnStore, DB  # noqa: E402
    from .table import Table, TableConfig  # noqa: E402
    from .store import FileSystemBucket  # noqa: E402
    from .iceberg import IcebergCatalog  # noqa: E402
except ImportError:  # pragma: no cover - during bootstrap only
    ColumnStore = DB = Table = TableConfig = None
    FileSystemBucket = IcebergCatalog = None

__all__ = [
    "SchemaDef",
    "ColumnDef",
    "StorageLayout",
    "SortingColumnDef",
    "Schema",
    "sample_definition",
    "sample_definition_with_float",
    "prehashed_sample_definition",
    "ColumnBatch",
    "Dictionary",
    "ColumnStore",
    "DB",
    "Table",
    "TableConfig",
    "FileSystemBucket",
    "IcebergCatalog",
]

__version__ = "0.1.0"
