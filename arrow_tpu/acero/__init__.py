"""Acero-style declarative query engine, TPU-native execution."""

from .exec import Declaration, execute_declaration  # noqa: F401
from .query_context import (  # noqa: F401
    ArrowMemoryError, QueryContext, QueryOptions)
from .expression import Expression, field, scalar  # noqa: F401
from .options import (  # noqa: F401
    AggregateNodeOptions, AsofJoinNodeOptions, ConsumingSinkNodeOptions,
    ExecNodeOptions,
    FetchNodeOptions, FilterNodeOptions, HashJoinNodeOptions,
    OrderByNodeOptions, OrderBySinkNodeOptions, PivotLongerNodeOptions,
    PivotLongerRowTemplate,
    ProjectNodeOptions, RecordBatchReaderSourceNodeOptions,
    ScanNodeOptions, SelectKSinkNodeOptions, SinkNodeOptions,
    SortedMergeNodeOptions, TableSinkNodeOptions, TableSourceNodeOptions,
    UnionNodeOptions,
)

# pyarrow.acero re-exports these container types
from ..table import RecordBatch, Table  # noqa: F401,E402
from ..array.array import array  # noqa: F401,E402
