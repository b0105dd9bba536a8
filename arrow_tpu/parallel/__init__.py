"""Multi-device / multi-host execution (mesh + collectives)."""

from .distributed import (  # noqa: F401
    DistAggSpec, broadcast_join_tables, distributed_groupby,
    distributed_join_tables, distributed_sort_table, make_mesh,
    partition_ids, salted_join_tables, shard_table,
)
