"""Multi-chip execution over a jax.sharding.Mesh.

The reference's concurrency story is goroutine fan-out over a row-group
channel with synchronizer fan-in (SURVEY.md §2.8; physicalplan.go:22
GOMAXPROCS). On TPU the equivalent first-class design is SPMD over a device
mesh:

- tables hash- or range-partitioned by row across chips (``PartitionedTable``)
- per-chip filter + partial aggregation (the reference's per-goroutine
  HashAggregate stage, aggregate.go:124 finalStage=false)
- the Synchronizer barrier becomes an ICI collective: ``psum`` for dense
  group tables, ``all_to_all`` hash repartitioning for large key spaces
- distributed hash join (absent in the reference — north-star extension)
"""

from .mesh import make_mesh, PartitionedTable  # noqa: F401
from .distributed import (  # noqa: F401
    distributed_filter_aggregate,
    distributed_distinct,
)
from .join import distributed_hash_join  # noqa: F401
from .shuffle import (  # noqa: F401
    ShuffleOverflow,
    shuffle_by_key,
    shuffle_by_key_auto,
)
