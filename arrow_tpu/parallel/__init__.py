"""Multi-device / multi-host execution (mesh + collectives)."""

from .distributed import (  # noqa: F401
    DistAggSpec, distributed_groupby, distributed_join_tables, make_mesh,
    partition_ids, shard_table,
)
